"""Momentum tail (operators/momentum.py), Anderson–Darling uniformity
(operators/nonparam.py) and the daily correlation matrix
(operators/assoc.py): pin the SEMANTICS with independent plain-Python
implementations over the real sf0.001 parquet. The A–D check is
first-principles — the direct ranked Σ(2i−1)(ln uᵢ + ln(1−u_{n+1−i}))
— so the per-cell closed form is verified against the textbook
definition."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.momentum import (
    _DPO_SHIFT,
    _DPO_WIN,
    _KST_ROCS,
    _KST_SMAS,
    _KST_WEIGHTS,
    _UO_WINS,
    _UO_WEIGHTS,
)
from ex_hivent_spark.operators.nonparam import _EPOCH_H, _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _bars() -> dict[str, list[tuple[int, float, float, float]]]:
    """(hour_id, close, high, low) per type, hour ascending."""
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    out: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        out[t].append((h, evs[-1]["value"], max(vals), min(vals)))
    return out


def test_ultimate_osc_matches_python(spark):
    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r["uo"]
        for r in SPECS["q_win_ultimate_osc"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        bp, rng = [], []
        for i in range(1, len(series)):
            _, c, h, lo = series[i]
            pc = series[i - 1][1]
            bp.append(_e6(c - min(lo, pc)))
            rng.append(_e6(max(h, pc) - min(lo, pc)))
        for i in range(_UO_WINS[-1] - 1, len(bp)):
            rats = []
            for w in _UO_WINS:
                b = math.fsum(bp[i - w + 1 : i + 1])
                r = math.fsum(rng[i - w + 1 : i + 1])
                rats.append(0.0 if r == 0 else b / r)
            uo = (
                100.0
                * (
                    _UO_WEIGHTS[0] * rats[0]
                    + _UO_WEIGHTS[1] * rats[1]
                    + _UO_WEIGHTS[2] * rats[2]
                )
                / sum(_UO_WEIGHTS)
            )
            assert got[(t, series[i + 1][0])] == pytest.approx(
                _e6(uo), abs=2e-6
            )
            n += 1
    assert n == len(got) and n > 0
    assert all(0.0 <= v <= 100.000001 for v in got.values())


def test_kst_matches_python(spark):
    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r["kst"]
        for r in SPECS["q_win_kst"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        closes = [c for _, c, _, _ in series]
        rocs = {
            r: [
                None
                if i < r or closes[i - r] == 0
                else _e6(100.0 * (closes[i] / closes[i - r] - 1.0))
                for i in range(len(closes))
            ]
            for r in _KST_ROCS
        }
        for i in range(len(closes)):
            smas = []
            ok = True
            for r, m, wt in zip(_KST_ROCS, _KST_SMAS, _KST_WEIGHTS):
                win = rocs[r][max(0, i - m + 1) : i + 1]
                vals = [v for v in win if v is not None]
                if len(win) < m or len(vals) < m:
                    ok = False
                    break
                smas.append(wt * (math.fsum(vals) / m))
            if not ok:
                continue
            assert got[(t, series[i][0])] == pytest.approx(
                _e6(math.fsum(smas)), abs=2e-6
            )
            n += 1
    assert n == len(got) and n > 0


def test_dpo_matches_python(spark):
    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_dpo"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        closes = [c for _, c, _, _ in series]
        for i in range(len(closes)):
            j = i - _DPO_SHIFT
            if j < _DPO_WIN - 1:
                continue
            sma = math.fsum(closes[j - _DPO_WIN + 1 : j + 1]) / _DPO_WIN
            row = got[(t, series[i][0])]
            assert row["sma_disp"] == pytest.approx(_e6(sma), abs=2e-6)
            assert row["dpo"] == pytest.approx(
                _e6(closes[i] - sma), abs=2e-6
            )
            n += 1
    assert n == len(got) and n > 0


def test_ad_uniform_matches_first_principles(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    by_t: dict = defaultdict(list)
    for r in rows:
        j = int(r["ts"].timestamp() // 3600) - _EPOCH_H
        by_t[r["event_type"]].append((j + 0.5) / _N_HOURS)
    got = {
        r["event_type"]: r
        for r in SPECS["q_stats_ad_uniform"].spark(spark, SF_DIR).collect()
    }
    for t, us in by_t.items():
        us.sort()
        n = len(us)
        s = math.fsum(
            (2 * i - 1)
            * (_e6(math.log(us[i - 1])) + _e6(math.log(1 - us[n - i])))
            for i in range(1, n + 1)
        )
        a2 = -n - s / n
        row = got[t]
        assert row["n_events"] == n
        # e12-rounded per-cell terms accumulate ≤ ~1e-9·n drift vs the
        # direct rank sum — allow a scaled tolerance.
        assert row["a2_stat"] == pytest.approx(a2, abs=1e-4)


def test_daily_corr_matches_python(spark):
    from ex_hivent_spark.operators.assoc import _CORR_METRICS

    rows = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    per_day: dict = defaultdict(list)
    for r in rows:
        per_day[r["l_shipdate"].date()].append(r)
    daily: dict = {name: [] for name, _, _ in _CORR_METRICS}
    for d in sorted(per_day):
        rs = per_day[d]
        for name, src, scale in _CORR_METRICS:
            daily[name].append(
                _e6(math.fsum(x[src] for x in rs) / len(rs) / scale)
            )
    got = {
        (r["metric_x"], r["metric_y"]): r
        for r in SPECS["q_agg_daily_corr_matrix"]
        .spark(spark, SF_DIR)
        .collect()
    }
    names = [m[0] for m in _CORR_METRICS]
    assert len(got) == 6
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            xs, ys = daily[a], daily[b]
            nd = len(xs)
            sx, sy = math.fsum(xs), math.fsum(ys)
            sxy = math.fsum(x * y for x, y in zip(xs, ys))
            sxx = math.fsum(x * x for x in xs)
            syy = math.fsum(y * y for y in ys)
            r = (sxy - sx * sy / nd) / math.sqrt(
                (sxx - sx * sx / nd) * (syy - sy * sy / nd)
            )
            row = got[(a, b)]
            assert row["n_days"] == nd
            assert row["pearson_r"] == pytest.approx(_e6(r), abs=2e-6)
            assert -1.000001 <= row["pearson_r"] <= 1.000001
