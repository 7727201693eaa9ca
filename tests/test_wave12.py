"""Session-quality panel (operators/windows.py), DBSCAN core census
(operators/geo.py), SMA crossover census (operators/finance.py),
ship-lag integrity audit (operators/quality.py) and nation trade
balance (operators/market.py): pin the SEMANTICS with independent
plain-Python implementations over the real sf0.001 parquet."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.finance import _XO_FAST, _XO_SLOW
from ex_hivent_spark.operators.geo import _AX, _AY, _MINPTS, _MOD, _RADIUS
from ex_hivent_spark.operators.windows import _SESS_GAP_US
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_session_stats_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byu: dict = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append(r)
    sessions = []
    for evs in byu.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        cur = []
        prev_us = None
        for r in evs:
            us = round(r["ts"].timestamp() * 1e6)
            if prev_us is not None and us - prev_us > _SESS_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(us)
            prev_us = us
        sessions.append(cur)
    n = len(sessions)
    bounce = sum(1 for s in sessions if len(s) == 1)
    durs = [max(s) - min(s) for s in sessions]
    row = SPECS["q_seq_session_stats"].spark(spark, SF_DIR).collect()[0]
    assert row["n_sessions"] == n
    assert row["n_bounce"] == bounce
    assert row["bounce_rate"] == pytest.approx(_e6(bounce / n), abs=2e-6)
    assert row["mean_events"] == pytest.approx(
        _e6(sum(len(s) for s in sessions) / n), abs=2e-6
    )
    assert row["max_events"] == max(len(s) for s in sessions)
    assert row["mean_duration_sec"] == pytest.approx(
        _e6(sum(durs) / n / 1e6), abs=2e-6
    )


def test_dbscan_core_matches_python(spark):
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pylist()
    pts = [
        (
            (c["c_custkey"] * _AX) % _MOD / 1000.0,
            (c["c_custkey"] * _AY) % _MOD / 1000.0,
        )
        for c in cust
    ]
    r2 = _RADIUS * _RADIUS
    hist: dict = defaultdict(int)
    for i, (xi, yi) in enumerate(pts):
        nbrs = sum(
            1
            for j, (xj, yj) in enumerate(pts)
            if j != i
            and (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= r2
        )
        hist[nbrs] += 1
    got = {
        r["n_neighbors"]: r
        for r in SPECS["q_geo_dbscan_core"].spark(spark, SF_DIR).collect()
    }
    assert {k: v["n_points"] for k, v in got.items()} == dict(hist)
    for k, v in got.items():
        assert v["is_core"] == int(k + 1 >= _MINPTS)


def _closes_by_type():
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        byk[(r["event_type"], int(r["ts"].timestamp() // 3600))].append(r)
    closes: dict = defaultdict(list)
    hours: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        closes[t].append(evs[-1]["value"])
        hours[t].append(h)
    return closes, hours


def test_sma_crossover_matches_python(spark):
    closes, hours = _closes_by_type()
    got = {
        r["event_type"]: r
        for r in SPECS["q_win_sma_crossover"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(closes)
    for t, cs in closes.items():
        signs = []
        shour = []
        for i in range(_XO_SLOW - 1, len(cs)):
            fast = math.fsum(cs[i - _XO_FAST + 1 : i + 1]) / _XO_FAST
            slow = math.fsum(cs[i - _XO_SLOW + 1 : i + 1]) / _XO_SLOW
            signs.append(1 if fast > slow else (-1 if fast < slow else 0))
            shour.append(hours[t][i])
        golden = [
            shour[i]
            for i in range(1, len(signs))
            if signs[i - 1] < 0 and signs[i] > 0
        ]
        death = [
            shour[i]
            for i in range(1, len(signs))
            if signs[i - 1] > 0 and signs[i] < 0
        ]
        row = got[t]
        assert row["n_golden"] == len(golden)
        assert row["n_death"] == len(death)
        assert row["last_golden_hour"] == (max(golden) if golden else None)
        assert row["last_death_hour"] == (max(death) if death else None)


def test_ship_lag_audit_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    orders = {
        o["o_orderkey"]: o
        for o in pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    }
    agg: dict = defaultdict(list)
    for r in li:
        o = orders[r["l_orderkey"]]
        lag = math.floor(
            (
                round(r["l_shipdate"].timestamp() * 1e6)
                - round(o["o_orderdate"].timestamp() * 1e6)
            )
            / 86400000000.0
        )
        agg[o["o_orderpriority"]].append(lag)
    got = {
        r["o_orderpriority"]: r
        for r in SPECS["q_quality_ship_lag_audit"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for pri, lags in agg.items():
        row = got[pri]
        assert row["n_lines"] == len(lags)
        assert row["n_ship_before_order"] == sum(1 for x in lags if x < 0)
        assert row["min_lag_days"] == min(lags)
        assert row["max_lag_days"] == max(lags)
        assert row["mean_lag_days"] == pytest.approx(
            _e6(sum(lags) / len(lags)), abs=2e-6
        )


def test_nation_trade_balance_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    sup = {
        s["s_suppkey"]: s["s_nationkey"]
        for s in pq.read_table(f"{SF_DIR}/supplier.parquet").to_pylist()
    }
    cust = {
        c["c_custkey"]: c["c_nationkey"]
        for c in pq.read_table(f"{SF_DIR}/customer.parquet").to_pylist()
    }
    orders = {
        o["o_orderkey"]: o["o_custkey"]
        for o in pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    }
    nat = {
        n["n_nationkey"]: n["n_name"]
        for n in pq.read_table(f"{SF_DIR}/nation.parquet").to_pylist()
    }
    exp: dict = defaultdict(int)
    imp: dict = defaultdict(int)
    for r in li:
        cents = math.floor(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100.0 + 0.5
        )
        exp[nat[sup[r["l_suppkey"]]]] += cents
        imp[nat[cust[orders[r["l_orderkey"]]]]] += cents
    got = {
        r["nation"]: r
        for r in SPECS["q_agg_nation_trade_balance"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(exp) | set(imp)
    total_net = 0
    for nation, row in got.items():
        e, i = exp.get(nation, 0), imp.get(nation, 0)
        assert row["exp_cents"] == e
        assert row["imp_cents"] == i
        assert row["net_cents"] == e - i
        assert row["balance_ratio"] == pytest.approx(
            _e6((e - i) / (e + i)), abs=2e-6
        )
        total_net += e - i
    # every cent exported by one nation is imported by another
    assert total_net == 0
