"""r13 maintenance/sketch wave (operators/maintjobs.py): pin the
compaction-bin packing and the space-saving bound guarantees with
independent plain-Python implementations over the real sf0.001
parquet, plus the structural guarantees the bounds must satisfy at
any scale (containment of the exact counts, exactness when a key is
kept in every block summary)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from ex_hivent_spark.operators.maintjobs import (
    _BIN_BYTES,
    _ROW_BYTES,
    _SS_BLOCK,
    _SS_M,
    _SS_TOPK,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def test_compaction_bins_match_python_offset_packing(spark):
    rows = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["ts", "event_type"]
    ).to_pylist()
    sizes: dict = Counter()
    for r in rows:
        sizes[(r["ts"].date(), r["event_type"])] += 1
    plan: dict = defaultdict(lambda: [0, 0, 0])  # n_files, n_rows, bytes
    for day in sorted({d for d, _ in sizes}):
        off = 0
        for et in sorted(et for d, et in sizes if d == day):
            n = sizes[(day, et)]
            b = plan[(day, off // _BIN_BYTES)]
            b[0] += 1
            b[1] += n
            b[2] += n * _ROW_BYTES
            off += n * _ROW_BYTES
    out = SPECS["q_maint_compaction_bins"].spark(spark, SF_DIR).collect()
    got = {
        (r["day"], r["bin_id"]): [r["n_files"], r["n_rows"], r["bin_bytes"]]
        for r in out
    }
    assert got == dict(plan)
    # every day's bins must cover its full file listing
    assert sum(v[1] for v in got.values()) == len(rows)


def _exact_and_summary_counts():
    rows = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    exact: Counter = Counter(r["l_partkey"] for r in rows)
    per_block: dict = defaultdict(Counter)
    for r in rows:
        per_block[r["l_orderkey"] // _SS_BLOCK][r["l_partkey"]] += 1
    return exact, per_block


def test_spacesaving_bounds_contain_exact_counts(spark):
    exact, per_block = _exact_and_summary_counts()
    # python replay of the summary merge
    kept: dict = {}
    thr: dict = {}
    for b, cnts in per_block.items():
        order = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))
        top = order[:_SS_M]
        kept[b] = dict(top)
        thr[b] = top[-1][1] if len(cnts) > _SS_M else 0
    t_all = sum(thr.values())
    out = SPECS["q_agg_spacesaving_topk"].spark(spark, SF_DIR).collect()
    assert 0 < len(out) <= _SS_TOPK
    seen_rn = sorted(r["rn"] for r in out)
    assert seen_rn == list(range(1, len(out) + 1))
    for r in out:
        k = r["l_partkey"]
        lb = sum(c[k] for c in kept.values() if k in c)
        covered = sum(thr[b] for b, c in kept.items() if k in c)
        assert r["n_min"] == lb
        assert r["n_max"] == lb + (t_all - covered)
        # the defining sketch guarantee: the true count is inside
        assert r["n_min"] <= exact[k] <= r["n_max"]
        # a key kept in EVERY block summary is exact from the sketch
        if r["n_blocks_kept"] == len(per_block):
            assert covered == t_all and r["n_min"] == r["n_max"] == exact[k]


def test_spacesaving_rank_is_lower_bound_ordered(spark):
    out = sorted(
        SPECS["q_agg_spacesaving_topk"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["rn"],
    )
    for a, b in zip(out, out[1:]):
        assert (a["n_min"], -a["l_partkey"]) >= (b["n_min"], -b["l_partkey"])


def test_spacesaving_summaries_merge_across_micro_batches():
    """The mergeable-summary property that makes the sketch
    streaming-compatible (Agarwal et al. 2013): split the stream into
    micro-batches that deliberately do NOT align with the DIV blocks,
    summarize each batch independently (per-block top-M + kept-min
    threshold), merge with the Misra-Gries bound arithmetic — the
    merged [lower, upper] interval must still contain every
    candidate's exact global count. Pure-python replay; no Spark."""
    rows = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    exact: Counter = Counter(r["l_partkey"] for r in rows)

    n_batches = 3
    summaries = []  # per batch: {blk: (kept: dict[key,count], t_b)}
    for b in range(n_batches):
        per_block: dict = defaultdict(Counter)
        for i, r in enumerate(rows):
            if i % n_batches == b:
                per_block[r["l_orderkey"] // _SS_BLOCK][r["l_partkey"]] += 1
        summ = {}
        for blk, cnts in per_block.items():
            order = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))
            kept = dict(order[:_SS_M])
            t_b = order[:_SS_M][-1][1] if len(cnts) > _SS_M else 0
            summ[blk] = (kept, t_b)
        summaries.append(summ)

    candidates = {
        k for summ in summaries for kept, _ in summ.values() for k in kept
    }
    assert candidates  # non-vacuous merge
    t_total = sum(t for summ in summaries for _, t in summ.values())
    contained = 0
    for k in candidates:
        lb = sum(
            kept.get(k, 0) for summ in summaries for kept, _ in summ.values()
        )
        covered = sum(
            t
            for summ in summaries
            for kept, t in summ.values()
            if k in kept
        )
        ub = lb + (t_total - covered)
        assert lb <= exact[k] <= ub, (k, lb, exact[k], ub)
        contained += 1
    assert contained == len(candidates)
