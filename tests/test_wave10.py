"""Ansari–Bradley scale test (operators/nonparam.py), Cox–Stuart trend
test (operators/tsdiag.py), dwell-time transition matrix (operators/
convert.py), embedding-norm/length correlation (llm/embaudit.py) and
the order-size profile (operators/market.py): pin the SEMANTICS with
independent plain-Python implementations over the real sf0.001
parquet."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.nonparam import _AB_G1, _AB_G2
from ex_hivent_spark.operators.tsdiag import _CS_HALF, _EPOCH_H, _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_ansari_bradley_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    hv: dict = defaultdict(float)
    for r in rows:
        if r["event_type"] in (_AB_G1, _AB_G2):
            h = int(r["ts"].timestamp() // 3600)
            hv[(r["event_type"], h)] += r["value"]
    pooled = sorted(hv.values())
    n = len(pooled)
    scores = {}
    for t_h, m in hv.items():
        lo = sum(1 for v in pooled if v < m)
        ties = sum(1 for v in pooled if v == m)
        r = lo + 1 + (ties - 1) / 2.0
        scores[t_h] = min(r, n + 1 - r)
    m1 = sum(1 for (t, _h) in hv if t == _AB_G1)
    n2 = n - m1
    w = sum(a for (t, _h), a in scores.items() if t == _AB_G1)
    sa = sum(scores.values())
    saa = sum(a * a for a in scores.values())
    e_w = m1 * sa / n
    var_w = m1 * n2 * (n * saa - sa * sa) / (n * n * (n - 1))
    row = SPECS["q_stats_ansari_bradley"].spark(spark, SF_DIR).collect()[0]
    assert row["n_g1"] == m1 and row["n_g2"] == n2
    assert row["w_stat"] == pytest.approx(w, abs=2e-6)
    assert row["e_w"] == pytest.approx(e_w, abs=2e-6)
    assert row["var_w"] == pytest.approx(var_w, abs=2e-5)
    assert row["z"] == pytest.approx(
        _e6((w - e_w) / _e6(math.sqrt(var_w))), abs=4e-6
    )


def test_cox_stuart_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(int(r["ts"].timestamp() // 3600) for r in rows)
    y = [cnt.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]
    pos = sum(1 for i in range(_CS_HALF) if y[i + _CS_HALF] > y[i])
    neg = sum(1 for i in range(_CS_HALF) if y[i + _CS_HALF] < y[i])
    tie = _CS_HALF - pos - neg
    row = SPECS["q_ts_cox_stuart"].spark(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] == _CS_HALF
    assert row["n_pos"] == pos
    assert row["n_neg"] == neg
    assert row["n_tie"] == tie
    eff = pos + neg
    assert row["z"] == pytest.approx(
        _e6((pos - eff / 2.0) / _e6(math.sqrt(eff / 4.0))), abs=4e-6
    )


def test_dwell_matrix_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byu: dict = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append(r)
    agg: dict = defaultdict(lambda: [0, 0, 0])  # n, sum_us, max_us
    for evs in byu.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for prev, nxt in zip(evs, evs[1:]):
            d = round(nxt["ts"].timestamp() * 1e6) - round(
                prev["ts"].timestamp() * 1e6
            )
            a = agg[(prev["event_type"], nxt["event_type"])]
            a[0] += 1
            a[1] += d
            a[2] = max(a[2], d)
    got = {
        (r["prev_type"], r["next_type"]): r
        for r in SPECS["q_seq_dwell_matrix"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for key, (n, s, mx) in agg.items():
        row = got[key]
        assert row["n_trans"] == n
        assert row["mean_dwell_sec"] == pytest.approx(
            _e6(s / n / 1e6), abs=2e-6
        )
        assert row["max_dwell_sec"] == pytest.approx(_e6(mx / 1e6), abs=2e-6)


def test_norm_length_corr_matches_python(spark):
    em = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    docs = {
        d["doc_id"]: d["n_chars"]
        for d in pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    }
    x2s, x1s, ys = [], [], []
    for e in em:
        if e["vec_id"] in docs:
            acc2 = acc1 = 0.0
            for v in e["embedding"]:
                acc2 += float(v) * float(v)
                acc1 += abs(float(v))
            x2s.append(_e6(math.sqrt(acc2)))
            x1s.append(_e6(acc1))
            ys.append(docs[e["vec_id"]])
    n = len(ys)
    sy = sum(ys)
    cyy = n * sum(y * y for y in ys) - sy * sy
    row = SPECS["q_emb_norm_length_corr"].spark(spark, SF_DIR).collect()[0]
    assert row["n_vecs"] == n
    assert row["mean_chars"] == pytest.approx(_e6(sy / n), abs=2e-6)

    def ref_corr(xs):
        sx = math.fsum(xs)
        cxy = n * math.fsum(x * y for x, y in zip(xs, ys)) - sx * sy
        cxx = n * math.fsum(x * x for x in xs) - sx * sx
        if cxx <= 0 or cyy <= 0:
            return None
        return cxy / math.sqrt(cxx) / math.sqrt(cyy)

    assert row["mean_l2"] == pytest.approx(
        _e6(math.fsum(x2s) / n), abs=2e-6
    )
    assert row["mean_l1"] == pytest.approx(
        _e6(math.fsum(x1s) / n), abs=2e-6
    )
    # the testdata embeddings are unit-normalized: every e6 L2 norm is
    # identical, so the audit's documented degenerate branch fires...
    assert ref_corr(x2s) is None and row["corr_l2"] is None
    # ...while the L1 spread still varies on the unit sphere
    assert row["corr_l1"] == pytest.approx(ref_corr(x1s), abs=1e-5)
    assert -1.000001 <= row["corr_l1"] <= 1.000001


def test_order_size_profile_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    per_order: dict = defaultdict(lambda: [0, 0])
    for r in li:
        a = per_order[r["l_orderkey"]]
        a[0] += 1
        a[1] += math.floor(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100.0 + 0.5
        )
    buckets: dict = defaultdict(lambda: [0, 0])
    for n_lines, cents in per_order.values():
        b = buckets[n_lines]
        b[0] += 1
        b[1] += cents
    total = sum(c for _n, c in buckets.values())
    got = {
        r["n_lines"]: r
        for r in SPECS["q_agg_order_size_profile"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(buckets)
    share_sum = 0.0
    for n_lines, (n_orders, cents) in buckets.items():
        row = got[n_lines]
        assert row["n_orders"] == n_orders
        assert row["revenue"] == pytest.approx(_e6(cents / 100.0), abs=2e-6)
        assert row["revenue_share"] == pytest.approx(
            _e6(cents / total), abs=2e-6
        )
        assert row["avg_order_value"] == pytest.approx(
            _e6(cents / 100.0 / n_orders), abs=2e-6
        )
        share_sum += row["revenue_share"]
    assert share_sum == pytest.approx(1.0, abs=1e-4)
