"""Time-series feature panel (operators/tsfeat.py): pin the semantics
with independent plain-Python implementations over the real sf0.001
events table — KPSS by explicit partial sums, Haar energy by direct
block arithmetic, STL strengths by closed-form OLS/diurnal residual
variances, the sign test by literal counting."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.tsfeat import (
    _EPOCH_H,
    _HAAR_LEVELS,
    _KPSS_CRIT_5,
    _N_HOURS,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _total_series() -> list[int]:
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    c = Counter(int(r["ts"].timestamp() // 3600) for r in rows)
    return [c.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]


def _typed_series(t: str) -> list[int]:
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    c = Counter(
        int(r["ts"].timestamp() // 3600)
        for r in rows
        if r["event_type"] == t
    )
    return [c.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]


def test_kpss_matches_python(spark):
    y = _total_series()
    n = len(y)
    mu = sum(y) / n
    e = [_e6(v - mu) for v in y]
    s2 = math.fsum(x * x for x in e) / n
    run, ss = 0.0, 0.0
    for x in e:
        run += x  # e6-exact values: plain accumulation is exact here
        ss += (run / n) * (run / n)
    eta = _e6(ss / s2)
    row = SPECS["q_ts_kpss_lite"].spark(spark, SF_DIR).collect()[0]
    assert row["n_hours"] == n
    assert row["mean_y"] == pytest.approx(mu, abs=1e-6)
    assert row["resid_var"] == pytest.approx(s2, abs=1e-6)
    assert row["eta_kpss"] == pytest.approx(eta, abs=1e-5)
    assert row["level_stationary_5pct"] == (row["eta_kpss"] < _KPSS_CRIT_5)


def test_wavelet_haar_matches_python(spark):
    y = _total_series()
    got = {
        r["level"]: r
        for r in SPECS["q_ts_wavelet_haar"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(_HAAR_LEVELS)
    for k in _HAAR_LEVELS:
        b = 2**k
        n_blocks = _N_HOURS // b
        energy = 0.0
        for blk in range(n_blocks):
            sl = sum(y[blk * b : blk * b + b // 2])
            sr = sum(y[blk * b + b // 2 : (blk + 1) * b])
            energy += ((sl - sr) / b) ** 2
        row = got[k]
        assert row["block_size"] == b
        assert row["n_blocks"] == n_blocks
        assert row["energy"] == pytest.approx(energy, rel=1e-12)


def test_wavelet_energy_flat_series_is_zero(spark):
    # A constant series has zero detail energy at every scale (left
    # and right half-block sums cancel exactly), and the real series
    # must NOT read zero everywhere (otherwise the op degenerates).
    from ex_hivent_spark.operators.tsfeat import haar_energies

    flat = spark.createDataFrame(
        [(h, 7) for h in range(_N_HOURS)], "h bigint, y bigint"
    )
    for row in haar_energies(flat, 0).collect():
        assert row["energy"] == 0.0

    rows = SPECS["q_ts_wavelet_haar"].spark(spark, SF_DIR).collect()
    assert any(r["energy"] > 0 for r in rows)


def test_stl_strength_matches_python(spark):
    y = _total_series()
    n = len(y)
    var_y = (
        math.fsum(v * v for v in y) - math.fsum(y) * math.fsum(y) / n
    ) / n
    # diurnal profile
    hod_sum = Counter()
    hod_cnt = Counter()
    for i, v in enumerate(y):
        hr = (_EPOCH_H + i) % 24
        hod_sum[hr] += v
        hod_cnt[hr] += 1
    r_des = [
        _e6(v - hod_sum[(_EPOCH_H + i) % 24] / hod_cnt[(_EPOCH_H + i) % 24])
        for i, v in enumerate(y)
    ]
    var_des = (
        math.fsum(x * x for x in r_des)
        - math.fsum(r_des) * math.fsum(r_des) / n
    ) / n
    # OLS line over t = 0..n-1
    st = sum(range(n))
    stt = sum(t * t for t in range(n))
    sty = sum(t * v for t, v in enumerate(y))
    sy = sum(y)
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = sy / n - b * (st / n)
    r_det = [_e6(v - a - b * t) for t, v in enumerate(y)]
    var_det = (
        math.fsum(x * x for x in r_det)
        - math.fsum(r_det) * math.fsum(r_det) / n
    ) / n
    row = SPECS["q_ts_stl_strength"].spark(spark, SF_DIR).collect()[0]
    assert row["n_hours"] == n
    assert row["var_y"] == pytest.approx(var_y, abs=1e-6)
    assert row["var_deseasoned"] == pytest.approx(var_des, abs=1e-6)
    assert row["var_detrended"] == pytest.approx(var_det, abs=1e-6)
    assert row["seasonal_strength"] == pytest.approx(
        max(0.0, 1.0 - var_des / var_y), abs=1e-5
    )
    assert row["trend_strength"] == pytest.approx(
        max(0.0, 1.0 - var_det / var_y), abs=1e-5
    )


def test_sign_test_matches_python(spark):
    a = _typed_series("click")
    b = _typed_series("view")
    d = [x - z for x, z in zip(a, b)]
    n_pos = sum(1 for x in d if x > 0)
    n_neg = sum(1 for x in d if x < 0)
    n_tie = sum(1 for x in d if x == 0)
    m = n_pos + n_neg
    z = _e6((n_pos - m / 2.0) / _e6(math.sqrt(m) / 2.0))
    row = SPECS["q_stats_sign_test"].spark(spark, SF_DIR).collect()[0]
    assert row["n_pos"] == n_pos
    assert row["n_neg"] == n_neg
    assert row["n_tie"] == n_tie
    assert row["z_stat"] == pytest.approx(z, abs=1e-6)


def test_matrix_profile_matches_numpy(spark):
    import numpy as np

    from ex_hivent_spark.operators.tsfeat import _MP_M, _MP_STARTS

    y = np.array(_total_series(), dtype=np.int64)
    n_w = _MP_STARTS
    m = _MP_M
    csum = np.concatenate([[0], np.cumsum(y)])
    csq = np.concatenate([[0], np.cumsum(y * y)])
    S = csum[m:] - csum[:-m]
    Q = csq[m:] - csq[:-m]
    den = m * Q - S * S
    # exact integer cross sums per (i, j = i + d)
    best_key = np.full(n_w, -np.inf)
    best_j = np.full(n_w, -1, dtype=np.int64)
    best_num = np.zeros(n_w)
    for d in range(m, n_w):
        z = y[:-d] * y[d:]
        zc = np.concatenate([[0], np.cumsum(z)])
        P = zc[m:] - zc[:-m]  # i = 0 .. len(z)-m
        n_i = len(P)
        i_idx = np.arange(n_i)
        j_idx = i_idx + d
        valid = (den[i_idx] > 0) & (den[j_idx] > 0)
        num = (m * P - S[i_idx] * S[j_idx]).astype(np.float64)
        for i, j, nu, ok in zip(i_idx, j_idx, num, valid):
            if not ok:
                continue
            for src, dst in ((i, j), (j, i)):
                g = nu * nu / den[dst] if nu >= 0 else -(nu * nu) / den[dst]
                if g > best_key[src] or (
                    g == best_key[src] and dst < best_j[src]
                ):
                    best_key[src], best_j[src] = g, dst
                    best_num[src] = nu
    got = {
        r["h"]: r
        for r in SPECS["q_ts_matrix_profile"].spark(spark, SF_DIR).collect()
    }
    n_checked = 0
    for i in range(n_w):
        if best_j[i] < 0:
            assert _EPOCH_H + i not in got
            continue
        row = got[_EPOCH_H + i]
        assert row["match_h"] == _EPOCH_H + best_j[i]
        r_want = _e6(
            best_num[i] / math.sqrt(float(den[i]) * float(den[best_j[i]]))
        )
        assert row["r"] == pytest.approx(r_want, abs=2e-6)
        assert row["nn_dist"] == pytest.approx(
            _e6(math.sqrt(max(2.0 * m * (1.0 - r_want), 0.0))), abs=2e-5
        )
        assert -1.0 - 1e-9 <= row["r"] <= 1.0 + 1e-9
        n_checked += 1
    assert n_checked == len(got) > 0
