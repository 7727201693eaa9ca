"""Candlestick census (operators/finance.py), dimension-coverage audit
(operators/quality.py) and diurnal entropy (operators/tsdiag.py): pin
the SEMANTICS with independent plain-Python implementations over the
real sf0.001 parquet."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.finance import _DOJI_FRAC, _SHADOW_MULT
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_candle_census_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        byk[(r["event_type"], int(r["ts"].timestamp() // 3600))].append(r)
    agg: dict = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for (t, _h), evs in byk.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        o, c, hi, lo = vals[0], vals[-1], max(vals), min(vals)
        rng, body = hi - lo, abs(c - o)
        lsh = min(o, c) - lo
        ush = hi - max(o, c)
        a = agg[t]
        a[0] += 1
        a[1] += int(c > o)
        a[2] += int(c < o)
        a[3] += int(rng > 0.0 and body <= _DOJI_FRAC * rng)
        a[4] += int(lsh >= _SHADOW_MULT * body and ush <= body and body > 0)
        a[5] += int(ush >= _SHADOW_MULT * body and lsh <= body and body > 0)
    got = {
        r["event_type"]: r
        for r in SPECS["q_win_candle_census"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for t, (n, bull, bear, doji, ham, shoot) in agg.items():
        row = got[t]
        assert row["n_bars"] == n
        assert row["n_bull"] == bull and row["n_bear"] == bear
        assert row["n_doji"] == doji
        assert row["n_hammer"] == ham and row["n_shooting"] == shoot


def test_dim_coverage_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    used_parts = {r["l_partkey"] for r in li}
    used_sups = {r["l_suppkey"] for r in li}
    ordering = {
        o["o_custkey"]
        for o in pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    }
    parts = [
        p["p_partkey"]
        for p in pq.read_table(f"{SF_DIR}/part.parquet").to_pylist()
    ]
    sups = [
        s["s_suppkey"]
        for s in pq.read_table(f"{SF_DIR}/supplier.parquet").to_pylist()
    ]
    custs = [
        c["c_custkey"]
        for c in pq.read_table(f"{SF_DIR}/customer.parquet").to_pylist()
    ]
    expected = {
        "part": (len(parts), sum(1 for k in parts if k not in used_parts)),
        "supplier": (len(sups), sum(1 for k in sups if k not in used_sups)),
        "customer": (len(custs), sum(1 for k in custs if k not in ordering)),
    }
    got = {
        r["entity"]: r
        for r in SPECS["q_quality_dim_coverage"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for entity, (tot, unref) in expected.items():
        row = got[entity]
        assert row["n_total"] == tot
        assert row["n_unreferenced"] == unref
        assert row["unref_rate"] == pytest.approx(
            _e6(unref / tot), abs=2e-6
        )


def test_diurnal_entropy_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(
        (r["event_type"], int(r["ts"].timestamp() // 3600) % 24)
        for r in rows
    )
    per_type: dict = defaultdict(dict)
    for (t, hh), n in cnt.items():
        per_type[t][hh] = n
    got = {
        r["event_type"]: r
        for r in SPECS["q_ts_diurnal_entropy"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_type)
    for t, bins in per_type.items():
        n = sum(bins.values())
        h = sum(
            _e6(-(y / n) * math.log(y / n)) for y in bins.values()
        )
        row = got[t]
        assert row["n_events"] == n
        assert row["n_active_hours"] == len(bins)
        assert row["entropy"] == pytest.approx(_e6(h), abs=4e-6)
        assert row["uniformity"] == pytest.approx(
            _e6(h / _e6(math.log(24.0))), abs=4e-6
        )
        assert 0.0 <= row["uniformity"] <= 1.000001
