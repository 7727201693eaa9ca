"""Time-series diagnostics (operators/tsdiag.py): pin the SEMANTICS
with independent plain-Python implementations over the real sf0.001
events table — spine densify by dict lookup, moments by fsum-free
integer arithmetic, closings mirrored step for step."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.tsdiag import _EPOCH_H, _N_HOURS, _VR_Q
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _series() -> list[int]:
    rows = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["ts", "event_type"]
    ).to_pylist()
    cnt: Counter = Counter()
    for r in rows:
        if r["event_type"] == "purchase":
            cnt[int(r["ts"].timestamp() // 3600)] += 1
    return [cnt.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]


def test_adf_lite_matches_python(spark):
    y = _series()
    pairs = [(y[i - 1], y[i] - y[i - 1]) for i in range(1, len(y))]
    n = len(pairs)
    sx = sum(p[0] for p in pairs)
    sy = sum(p[1] for p in pairs)
    sxx = sum(p[0] * p[0] for p in pairs)
    sxy = sum(p[0] * p[1] for p in pairs)
    syy = sum(p[1] * p[1] for p in pairs)
    dxx = float(n) * sxx - float(sx) * sx
    dxy = float(n) * sxy - float(sx) * sy
    dyy = float(n) * syy - float(sy) * sy
    beta = dxy / dxx
    se = _e6(math.sqrt(max((dyy - beta * dxy) / (n - 2) / dxx, 0.0)))
    row = SPECS["q_ts_adf_lite"].spark(spark, SF_DIR).collect()[0]
    assert row["n_obs"] == n
    assert row["beta"] == pytest.approx(_e6(beta), abs=1e-9)
    assert row["rho"] == pytest.approx(_e6(1.0 + beta), abs=1e-9)
    assert row["df_stat"] == pytest.approx(_e6(beta / se), abs=1e-6)
    # a busy event counter mean-reverts hard: DF stat far below zero
    assert row["df_stat"] < -2.0


def test_variance_ratio_matches_python(spark):
    y = _series()
    d1 = [y[i] - y[i - 1] for i in range(1, len(y))]
    dq = [y[i] - y[i - _VR_Q] for i in range(_VR_Q, len(y))]

    def var(d):
        n = len(d)
        s, ss = sum(d), sum(x * x for x in d)
        return (float(ss) - float(s) * s / n) / n

    v1, vq = var(d1), var(dq)
    row = SPECS["q_ts_variance_ratio"].spark(spark, SF_DIR).collect()[0]
    assert row["n_diff1"] == len(d1) and row["n_diffq"] == len(dq)
    assert row["var1"] == pytest.approx(_e6(v1), abs=1e-9)
    assert row["varq"] == pytest.approx(_e6(vq), abs=1e-9)
    assert row["vr"] == pytest.approx(
        _e6(_e6(vq) / (_VR_Q * _e6(v1))), abs=1e-6
    )


def _total_series() -> list[int]:
    rows = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["ts"]
    ).to_pylist()
    cnt: Counter = Counter()
    for r in rows:
        cnt[int(r["ts"].timestamp() // 3600)] += 1
    return [cnt.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]


def test_runs_test_matches_python(spark):
    y = _total_series()
    ys = sorted(y)
    med = (ys[(_N_HOURS - 1) // 2] + ys[_N_HOURS // 2]) / 2.0
    signs = [1 if v > med else -1 for v in y if v != med]
    n1 = sum(1 for s in signs if s == 1)
    n2 = len(signs) - n1
    runs = 1 + sum(
        1 for i in range(1, len(signs)) if signs[i] != signs[i - 1]
    )
    n = n1 + n2
    mu = 1.0 + 2.0 * n1 * n2 / n
    sigma = _e6(
        math.sqrt(
            max(
                2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                / (float(n) * n * (n - 1)),
                0.0,
            )
        )
    )
    row = SPECS["q_ts_runs_test"].spark(spark, SF_DIR).collect()[0]
    assert row["median_y"] == med
    assert row["n_above"] == n1 and row["n_below"] == n2
    assert row["n_runs"] == runs
    if n1 == 0 or n2 == 0 or sigma == 0:
        assert row["z_stat"] is None
    else:
        assert row["z_stat"] == pytest.approx(
            _e6((runs - mu) / sigma), abs=1e-6
        )
        # both sides populated on the total-count series
        assert n1 > 0 and n2 > 0


def test_ar1_half_life_matches_python(spark):
    y = _series()
    pairs = list(zip(y[1:], y[:-1]))
    n = len(pairs)
    sy = sum(a for a, _ in pairs)
    sl = sum(b for _, b in pairs)
    syy = sum(a * a for a, _ in pairs)
    sll = sum(b * b for _, b in pairs)
    syl = sum(a * b for a, b in pairs)
    den = _e6(
        math.sqrt(
            max(float(n) * syy - float(sy) * sy, 0.0)
            * max(float(n) * sll - float(sl) * sl, 0.0)
        )
    )
    rho = _e6((float(n) * syl - float(sy) * sl) / den)
    row = SPECS["q_ts_ar1_half_life"].spark(spark, SF_DIR).collect()[0]
    assert row["n_obs"] == n
    assert row["rho"] == pytest.approx(rho, abs=1e-9)
    if 0 < rho < 1:
        hl = _e6(-_e6(math.log(2.0)) / _e6(math.log(rho)))
        assert row["half_life_hours"] == pytest.approx(hl, abs=1e-6)
        assert row["half_life_hours"] > 0
    else:
        assert row["half_life_hours"] is None


def test_turning_points_matches_python(spark):
    y = _series()
    peaks = sum(
        1
        for i in range(1, len(y) - 1)
        if y[i - 1] < y[i] and y[i] > y[i + 1]
    )
    troughs = sum(
        1
        for i in range(1, len(y) - 1)
        if y[i - 1] > y[i] and y[i] < y[i + 1]
    )
    t = peaks + troughs
    sigma = _e6(math.sqrt((16.0 * _N_HOURS - 29.0) / 90.0))
    z = _e6((t - 2.0 * (_N_HOURS - 2) / 3.0) / sigma)
    row = SPECS["q_ts_turning_points"].spark(spark, SF_DIR).collect()[0]
    assert row["n_hours"] == _N_HOURS
    assert row["n_peaks"] == peaks and row["n_troughs"] == troughs
    assert row["n_turning"] == t
    assert row["z_stat"] == pytest.approx(z, abs=1e-6)
