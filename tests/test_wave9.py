"""Yule's K richness battery (llm/lexsignals.py), order-header
reconciliation (operators/quality.py), Durbin–Watson (operators/
tsdiag.py), Page's trend test (operators/inference.py) and the Hull
moving average (operators/finance.py): pin the SEMANTICS with
independent plain-Python implementations over the real sf0.001
parquet — the Durbin–Watson check in particular recomputes DW from
EXPLICIT residuals, validating the operator's closed-form moment
expansion against the textbook definition."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.finance import _HMA_HALF, _HMA_N, _HMA_ROOT
from ex_hivent_spark.operators.tsdiag import _EPOCH_H, _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_yule_k_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    tf: dict = defaultdict(Counter)
    for d in docs:
        tf[d["source"]].update(d["text"].split(" "))
    got = {
        r["source"]: r
        for r in SPECS["q_llm_yule_k"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(tf)
    for src, c in tf.items():
        n = sum(c.values())
        v = len(c)
        smm = sum(m * m for m in c.values())
        row = got[src]
        assert row["n_tokens"] == n
        assert row["vocab"] == v
        assert row["yule_k"] == pytest.approx(
            _e6(10000.0 * (smm - n) / (n * n)), abs=2e-6
        )
        assert row["guiraud_r"] == pytest.approx(
            _e6(v / math.sqrt(n)), abs=2e-6
        )
        assert row["herdan_c"] == pytest.approx(
            _e6(math.log(v) / math.log(n)), abs=4e-6
        )
        # richness sanity: a vocabulary can't exceed the token count
        assert v <= n and row["yule_k"] >= 0.0


def test_order_recon_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    per_order: dict = defaultdict(list)
    for r in li:
        per_order[r["l_orderkey"]].append(
            _e6(
                r["l_extendedprice"]
                * (1.0 - r["l_discount"])
                * (1.0 + r["l_tax"])
            )
        )
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])  # n, orphan, within, sum_ri
    for o in orders:
        a = agg[o["o_orderpriority"]]
        a[0] += 1
        lines = per_order.get(o["o_orderkey"])
        if lines is None:
            a[1] += 1
            continue
        computed = math.fsum(lines)
        ri = math.floor(
            abs(o["o_totalprice"] - computed) / o["o_totalprice"] * 1e6
            + 0.5
        )
        if ri <= 10000:
            a[2] += 1
        a[3] += ri
    got = {
        r["o_orderpriority"]: r
        for r in SPECS["q_quality_order_recon"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for pri, (n, orphan, within, sri) in agg.items():
        row = got[pri]
        assert row["n_orders"] == n
        assert row["n_no_lines"] == orphan
        assert row["n_within_1pct"] == within
        assert row["mean_rel_diff"] == pytest.approx(
            _e6(sri / 1e6 / (n - orphan)), abs=2e-6
        )


def test_durbin_watson_matches_explicit_residuals(spark):
    """The operator closes DW from integer moments; this recomputes it
    from EXPLICIT per-hour residuals — the closed-form expansion
    Σ(Δy−β)² / Σ(y−α−βt)² must agree with the definition."""
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(
        int(r["ts"].timestamp() // 3600)
        for r in rows
        if r["event_type"] == "purchase"
    )
    y = [cnt.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]
    t = list(range(_N_HOURS))
    n = len(y)
    st, sy = sum(t), sum(y)
    b = (n * sum(a * c for a, c in zip(t, y)) - st * sy) / (
        n * sum(a * a for a in t) - st * st
    )
    b = _e6(b)
    a = _e6((sy - b * st) / n)
    e = [yi - a - b * ti for ti, yi in zip(t, y)]
    num = math.fsum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    den = math.fsum(ei * ei for ei in e)
    row = SPECS["q_ts_durbin_watson"].spark(spark, SF_DIR).collect()[0]
    assert row["n_obs"] == n
    assert row["beta"] == pytest.approx(b, abs=2e-6)
    assert row["alpha"] == pytest.approx(a, abs=2e-6)
    assert row["dw"] == pytest.approx(num / den, abs=1e-4)
    assert row["rho_implied"] == pytest.approx(
        1.0 - num / den / 2.0, abs=1e-4
    )
    assert 0.0 <= row["dw"] <= 4.000001


def test_page_trend_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    daily: dict = defaultdict(float)
    for r in rows:
        d = int(r["ts"].timestamp() // 86400)
        daily[(d, r["event_type"])] += r["value"]
    days = {d for d, _ in daily}
    types = sorted(
        t
        for t in {t for _, t in daily}
        if all((d, t) in daily for d in days)
    )
    n, k = len(days), len(types)
    rsum = Counter()
    for d in days:
        vals = sorted(daily[(d, t)] for t in types)
        for t in types:
            m = daily[(d, t)]
            lo = sum(1 for v in vals if v < m)
            ties = sum(1 for v in vals if v == m)
            rsum[t] += lo + 1 + (ties - 1) / 2.0
    l_stat = sum((j + 1) * rsum[t] for j, t in enumerate(types))
    e_l = n * k * (k + 1) ** 2 / 4.0
    var_l = n * k * k * (k + 1) * (k * k - 1) / 144.0
    row = SPECS["q_stats_page_trend"].spark(spark, SF_DIR).collect()[0]
    assert row["n_days"] == n and row["k"] == k
    assert row["l_stat"] == pytest.approx(l_stat, abs=2e-6)
    assert row["e_l"] == pytest.approx(e_l, abs=2e-6)
    assert row["var_l"] == pytest.approx(var_l, abs=2e-6)
    assert row["z"] == pytest.approx(
        _e6((l_stat - e_l) / _e6(math.sqrt(var_l))), abs=4e-6
    )


def _wma(xs):
    """Linear-weight MA of xs (most recent LAST)."""
    kk = len(xs)
    return sum((i + 1) * x for i, x in enumerate(xs)) / (kk * (kk + 1) / 2)


def test_hull_ma_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    closes: dict = defaultdict(list)
    hours: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        closes[t].append(evs[-1]["value"])
        hours[t].append(h)
    got = {
        (r["event_type"], r["hour_id"]): r["hma9"]
        for r in SPECS["q_win_hull_ma"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, cs in closes.items():
        h = [
            2.0 * _wma(cs[i - _HMA_HALF + 1 : i + 1])
            - _wma(cs[i - _HMA_N + 1 : i + 1])
            if i >= _HMA_N - 1
            else None
            for i in range(len(cs))
        ]
        for i in range(_HMA_N + _HMA_ROOT - 2, len(cs)):
            hma = _wma(h[i - _HMA_ROOT + 1 : i + 1])
            assert got[(t, hours[t][i])] == pytest.approx(
                _e6(hma), abs=4e-6
            )
            n += 1
    assert n == len(got) and n > 0
