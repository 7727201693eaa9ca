"""Nation×brand lift (operators/market.py), id/ts monotonicity audit
(operators/quality.py) and opening-range breakout census (operators/
finance.py): pin the SEMANTICS with independent plain-Python
implementations over the real sf0.001 parquet."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.finance import _OR_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_nation_brand_lift_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    orders = {
        o["o_orderkey"]: o["o_custkey"]
        for o in pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    }
    cust = {
        c["c_custkey"]: c["c_nationkey"]
        for c in pq.read_table(f"{SF_DIR}/customer.parquet").to_pylist()
    }
    nat = {
        n["n_nationkey"]: n["n_name"]
        for n in pq.read_table(f"{SF_DIR}/nation.parquet").to_pylist()
    }
    part = {
        p["p_partkey"]: p["p_brand"]
        for p in pq.read_table(f"{SF_DIR}/part.parquet").to_pylist()
    }
    cell = Counter()
    for r in li:
        cents = math.floor(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100.0 + 0.5
        )
        n = nat[cust[orders[r["l_orderkey"]]]]
        b = part[r["l_partkey"]]
        cell[(n, b)] += cents
    nm = Counter()
    bm = Counter()
    for (n, b), c in cell.items():
        nm[n] += c
        bm[b] += c
    total = sum(cell.values())
    got = {
        (r["nation"], r["brand"]): r
        for r in SPECS["q_agg_nation_brand_lift"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(cell)
    for (n, b), c in cell.items():
        row = got[(n, b)]
        assert row["cents"] == c
        assert row["lift"] == pytest.approx(
            _e6(c * total / (nm[n] * bm[b])), abs=2e-6
        )


def test_id_ts_monotonicity_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byu: dict = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append(r)
    steps = inv = affected = 0
    for evs in byu.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        user_inv = sum(
            1
            for a, b in zip(evs, evs[1:])
            if b["event_id"] < a["event_id"]
        )
        steps += len(evs) - 1
        inv += user_inv
        affected += int(user_inv > 0)
    row = SPECS["q_quality_id_ts_monotonicity"].spark(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(byu)
    assert row["n_steps"] == steps
    assert row["n_inversions"] == inv
    assert row["n_users_affected"] == affected
    assert row["inversion_rate"] == pytest.approx(
        _e6(inv / steps) if steps else 0.0, abs=2e-6
    )


def test_opening_range_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    bars = {}
    # closes need the (ts, event_id) event order, not value order
    byk2: dict = defaultdict(list)
    for r in rows:
        byk2[(r["event_type"], int(r["ts"].timestamp() // 3600))].append(r)
    for (t, h), evs in byk2.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        bars[(t, h)] = (vals[-1], max(vals), min(vals))
    days: dict = defaultdict(list)
    for (t, h), (close, high, low) in bars.items():
        days[(t, h // 24)].append((h % 24, close, high, low))
    expected = {}
    for (t, d), hrs in days.items():
        opening = [x for x in hrs if x[0] < _OR_HOURS]
        if not opening:
            continue
        or_high = max(x[2] for x in opening)
        or_low = min(x[3] for x in opening)
        n_above = sum(
            1 for x in hrs if x[0] >= _OR_HOURS and x[1] > or_high
        )
        n_below = sum(
            1 for x in hrs if x[0] >= _OR_HOURS and x[1] < or_low
        )
        expected[(t, d)] = (or_high, or_low, n_above, n_below)
    got = {
        (r["event_type"], r["day_id"]): (
            r["or_high"],
            r["or_low"],
            r["n_above"],
            r["n_below"],
        )
        for r in SPECS["q_win_opening_range"].spark(spark, SF_DIR).collect()
    }
    assert got == expected and len(got) > 0
