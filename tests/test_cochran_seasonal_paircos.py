"""Cochran's Q (operators/nonparam.py), seasonal index
(operators/tsdiag.py) and the pairwise-cosine histogram
(llm/embaudit.py): pin the SEMANTICS with independent plain-Python
implementations over the real sf0.001 parquet — including the
degenerate all-users-did-everything NULL branch Cochran's Q hits at
this SF."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.llm.embaudit import _HUB_Q, _PAIR_BINS
from ex_hivent_spark.operators.tsdiag import _EPOCH_H, _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_cochran_q_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    x = {(r["user_id"], r["event_type"]) for r in rows}
    ri = Counter(u for u, _ in x)
    cj = Counter(t for _, t in x)
    k = len(cj)
    sr = sum(ri.values())
    sr2 = sum(v * v for v in ri.values())
    sc = sum(cj.values())
    sc2 = sum(v * v for v in cj.values())
    row = SPECS["q_stats_cochran_q"].spark(spark, SF_DIR).collect()[0]
    assert row["k"] == k and row["n_users"] == len(ri)
    denom = k * sr - sr2
    if denom == 0:
        # All users did everything — the documented degenerate branch.
        assert row["q_stat"] is None
    else:
        q = (k - 1) * (k * sc2 - sc * sc) / denom
        assert row["q_stat"] == pytest.approx(_e6(q), abs=2e-6)


def test_seasonal_index_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(int(r["ts"].timestamp() // 3600) for r in rows)
    ys = {h: cnt.get(_EPOCH_H + h, 0) for h in range(_N_HOURS)}
    per_hod: dict = defaultdict(list)
    for h, y in ys.items():
        per_hod[(_EPOCH_H + h) % 24].append(y)
    grand = sum(ys.values()) / len(ys)
    got = {
        r["hour_of_day"]: r
        for r in SPECS["q_ts_seasonal_index"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(range(24))
    idx_sum = 0.0
    for hod, vals in per_hod.items():
        m = sum(vals) / len(vals)
        row = got[hod]
        assert row["n_hours"] == len(vals)
        assert row["hod_mean"] == pytest.approx(_e6(m), abs=2e-6)
        assert row["seasonal_index"] == pytest.approx(
            _e6(m / grand), abs=2e-6
        )
        idx_sum += row["seasonal_index"]
    # Multiplicative indices average to ~1 over the cycle.
    assert idx_sum / 24 == pytest.approx(1.0, abs=1e-3)


def test_pair_cosine_hist_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def unit(v):
        s = 0.0
        for x in v:
            s = s + x * x
        nm = math.sqrt(s)
        return [x / nm for x in v]

    units = {i: unit(v) for i, v in vecs.items()}
    probes = sorted(i for i in vecs if i % 5 == 0)[:_HUB_Q]
    bins = Counter()
    for qid in probes:
        qu = units[qid]
        for nid, u in units.items():
            if nid == qid:
                continue
            s = 0.0
            for a, b in zip(qu, u):
                s = s + a * b
            c = _e6(s)
            bins[min(int(math.floor((c + 1.0) * 5.0)), _PAIR_BINS - 1)] += 1
    total = sum(bins.values())
    got = {
        r["bin"]: r
        for r in SPECS["q_emb_pair_cosine_hist"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == {b for b, c in bins.items() if c > 0}
    for b, c in bins.items():
        row = got[b]
        assert row["n_pairs"] == c
        assert row["bin_lo"] == pytest.approx(_e6(b / 5.0 - 1.0), abs=2e-6)
        assert row["share"] == pytest.approx(_e6(c / total), abs=2e-6)
    assert sum(r["n_pairs"] for r in got.values()) == total
