"""AR(1) backtest (operators/tsdiag.py), transition reciprocity
(operators/markov.py) and vocabulary coverage (llm/coverage.py): pin
the SEMANTICS with independent plain-Python implementations over the
real sf0.001 parquet."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.llm.coverage import _COV_KS
from ex_hivent_spark.operators.tsdiag import _BT_SPLIT, _EPOCH_H, _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _e12(x: float) -> float:
    return math.floor(x * 1e12 + 0.5) / 1e12


def test_ar1_backtest_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(int(r["ts"].timestamp() // 3600) for r in rows)
    ys = [cnt.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]
    split = _BT_SPLIT - _EPOCH_H
    b = math.floor(sum(ys[:split]) / split)
    d = [_e6((y - b) / b) for y in ys]
    mu = math.fsum(d[:split]) / split
    num = math.fsum(
        _e12((d[t] - mu) * (d[t - 1] - mu)) for t in range(1, split)
    )
    den = math.fsum(
        _e12((d[t - 1] - mu) * (d[t - 1] - mu)) for t in range(1, split)
    )
    phi = _e6(num / den)
    e_ar1 = [
        _e6(d[t] - (mu + phi * (d[t - 1] - mu)))
        for t in range(split, _N_HOURS)
    ]
    e_naive = [_e6(d[t] - d[t - 1]) for t in range(split, _N_HOURS)]
    n = len(e_ar1)
    mae = math.fsum(abs(e) for e in e_ar1) / n
    rmse = math.sqrt(math.fsum(e * e for e in e_ar1) / n)
    mae_n = math.fsum(abs(e) for e in e_naive) / n
    row = SPECS["q_ts_ar1_backtest"].spark(spark, SF_DIR).collect()[0]
    assert row["n_test"] == n
    assert row["phi"] == pytest.approx(phi, abs=2e-6)
    assert row["mae_ar1"] == pytest.approx(_e6(mae), abs=2e-6)
    assert row["rmse_ar1"] == pytest.approx(_e6(rmse), abs=2e-6)
    assert row["mae_naive"] == pytest.approx(_e6(mae_n), abs=2e-6)
    assert row["skill"] == pytest.approx(_e6(1 - mae / mae_n), abs=4e-6)
    # Mean reversion in hourly traffic: AR(1) should beat persistence.
    assert row["skill"] > 0


def test_reciprocity_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    by_u: dict = defaultdict(list)
    for r in rows:
        by_u[r["user_id"]].append(r)
    c = Counter()
    for evs in by_u.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, bb in zip(evs, evs[1:]):
            if a["event_type"] != bb["event_type"]:
                c[(a["event_type"], bb["event_type"])] += 1
    n_dir = sum(c.values())
    n_rec = sum(min(v, c.get((j, i), 0)) for (i, j), v in c.items())
    row = SPECS["q_graph_reciprocity"].spark(spark, SF_DIR).collect()[0]
    assert row["n_directed"] == n_dir
    assert row["n_reciprocated"] == n_rec
    assert row["reciprocity"] == pytest.approx(
        _e6(n_rec / n_dir), abs=2e-6
    )
    assert 0.0 <= row["reciprocity"] <= 1.0


def test_vocab_coverage_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    tc = Counter()
    for d in docs:
        for t in d["text"].split(" "):
            if t:
                tc[t] += 1
    n_total = sum(tc.values())
    ranked = sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {
        r["k"]: r
        for r in SPECS["q_llm_vocab_coverage"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(_COV_KS)
    prev = 0.0
    for k in _COV_KS:
        covered = sum(n for _, n in ranked[:k])
        row = got[k]
        assert row["n_total"] == n_total
        assert row["n_vocab"] == len(tc)
        assert row["covered"] == covered
        assert row["coverage"] == pytest.approx(
            _e6(covered / n_total), abs=2e-6
        )
        # Coverage is monotone in k.
        assert row["coverage"] >= prev
        prev = row["coverage"]
