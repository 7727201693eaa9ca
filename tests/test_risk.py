"""Risk battery (operators/risk.py): pin the SEMANTICS with
independent plain-Python implementations over the real sf0.001
parquet — daily log returns by explicit sort, tail picks by list
slicing, range estimators from first-principles bar construction."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.risk import (
    _FOUR_LN2,
    _GK_C,
    _RANGE_WIN,
    _VAR_ALPHA,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _flag_returns() -> dict[str, list[tuple[object, float]]]:
    """Per flag: [(day, e6 log return)] over the flag's day sequence."""
    rows = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    rev: dict = defaultdict(float)
    for r in rows:
        rev[(r["l_returnflag"], r["l_shipdate"].date())] += r[
            "l_extendedprice"
        ]
    out: dict = defaultdict(list)
    for (rf, day) in sorted(rev):
        out[rf].append((day, rev[(rf, day)]))
    rets: dict = {}
    for rf, series in out.items():
        rets[rf] = [
            (day, _e6(math.log(rev_t / series[i - 1][1])))
            for i, (day, rev_t) in enumerate(series)
            if i > 0
        ]
    return rets


def _market_returns() -> dict[object, float]:
    rows = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    rev: dict = defaultdict(float)
    for r in rows:
        rev[r["l_shipdate"].date()] += r["l_extendedprice"]
    days = sorted(rev)
    return {
        d: _e6(math.log(rev[d] / rev[days[i - 1]]))
        for i, d in enumerate(days)
        if i > 0
    }


def test_sharpe_sortino_matches_python(spark):
    rets = _flag_returns()
    got = {
        r["l_returnflag"]: r
        for r in SPECS["q_agg_sharpe_sortino"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(rets)
    for rf, series in rets.items():
        xs = [x for _, x in series]
        n = len(xs)
        mean = math.fsum(xs) / n
        var = (math.fsum(x * x for x in xs) - math.fsum(xs) ** 2 / n) / (
            n - 1
        )
        dd = math.sqrt(math.fsum(x * x for x in xs if x < 0) / n)
        row = got[rf]
        assert row["n_rets"] == n
        assert row["mean_ret"] == pytest.approx(mean, rel=1e-9)
        assert row["vol"] == pytest.approx(_e6(math.sqrt(var)), abs=2e-6)
        assert row["downside_dev"] == pytest.approx(_e6(dd), abs=2e-6)
        assert row["sharpe"] == pytest.approx(
            _e6(mean / math.sqrt(var)), abs=2e-6
        )
        assert row["sortino"] == pytest.approx(_e6(mean / dd), abs=2e-6)


def test_var_es_matches_python(spark):
    rets = _flag_returns()
    got = {
        r["l_returnflag"]: r
        for r in SPECS["q_agg_var_es"].spark(spark, SF_DIR).collect()
    }
    for rf, series in rets.items():
        xs = sorted(x for _, x in series)
        n = len(xs)
        k = math.ceil(_VAR_ALPHA * n)
        tail = xs[:k]
        row = got[rf]
        assert row["n_rets"] == n and row["k_tail"] == k
        assert row["var95"] == pytest.approx(_e6(-tail[-1]), abs=2e-6)
        assert row["es95"] == pytest.approx(
            _e6(-math.fsum(tail) / k), abs=2e-6
        )
        # VaR is the tail's best case, ES its mean: ES >= VaR.
        assert row["es95"] >= row["var95"]


def test_beta_capm_matches_python(spark):
    rets = _flag_returns()
    mkt = _market_returns()
    got = {
        r["l_returnflag"]: r
        for r in SPECS["q_agg_beta_capm"].spark(spark, SF_DIR).collect()
    }
    for rf, series in rets.items():
        pairs = [(x, mkt[d]) for d, x in series if d in mkt]
        n = len(pairs)
        si = math.fsum(p[0] for p in pairs)
        sm = math.fsum(p[1] for p in pairs)
        sim = math.fsum(p[0] * p[1] for p in pairs)
        sii = math.fsum(p[0] * p[0] for p in pairs)
        smm = math.fsum(p[1] * p[1] for p in pairs)
        cov = sim - si * sm / n
        varm = smm - sm * sm / n
        vari = sii - si * si / n
        row = got[rf]
        assert row["n_days"] == n
        assert row["beta"] == pytest.approx(_e6(cov / varm), abs=2e-6)
        assert row["alpha"] == pytest.approx(
            _e6(si / n - cov / varm * (sm / n)), abs=2e-6
        )
        assert row["corr"] == pytest.approx(
            _e6(cov / math.sqrt(vari * varm)), abs=2e-6
        )
        assert -1.000001 <= row["corr"] <= 1.000001


def _obars() -> dict[str, list[tuple[int, float, float, float, float]]]:
    """(hour_id, close, open, high, low) per type, hour ascending."""
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    out: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        out[t].append(
            (h, evs[-1]["value"], evs[0]["value"], max(vals), min(vals))
        )
    return out


def test_parkinson_matches_python(spark):
    bars = _obars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_parkinson_vol"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        u2 = [
            0.0 if lo <= 0 else _e6(math.log(h / lo)) ** 2
            for _, _, _, h, lo in series
        ]
        for i in range(_RANGE_WIN - 1, len(series)):
            ssq = math.fsum(u2[i - (_RANGE_WIN - 1) : i + 1])
            row = got[(t, series[i][0])]
            assert row["ssq"] == pytest.approx(ssq, rel=1e-9, abs=1e-11)
            assert row["parkinson24"] == pytest.approx(
                _e6(math.sqrt(ssq / (_FOUR_LN2 * _RANGE_WIN))), abs=2e-6
            )
            n += 1
    assert n == len(got) and n > 0


def test_garman_klass_matches_python(spark):
    bars = _obars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_garman_klass"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        terms = [
            (0.0 if lo <= 0 else 0.5 * _e6(math.log(h / lo)) ** 2)
            - (
                0.0
                if o <= 0 or c <= 0
                else _GK_C * _e6(math.log(c / o)) ** 2
            )
            for _, c, o, h, lo in series
        ]
        for i in range(_RANGE_WIN - 1, len(series)):
            st = math.fsum(terms[i - (_RANGE_WIN - 1) : i + 1])
            row = got[(t, series[i][0])]
            assert row["gk_sum"] == pytest.approx(_e6(st), abs=2e-6)
            assert row["gk24"] == pytest.approx(
                _e6(math.sqrt(max(st / _RANGE_WIN, 0.0))), abs=2e-6
            )
            n += 1
    assert n == len(got) and n > 0


def test_single_bar_events_zero_range(spark):
    """Bars where high == low (single event in the hour) must
    contribute exactly 0 to the Parkinson sum — assert the branch is
    exercised by the real data."""
    bars = _obars()
    assert any(
        h == lo for series in bars.values() for _, _, _, h, lo in series
    )
