"""Resampling inference (operators/resample.py): pin the SEMANTICS
with independent plain-Python implementations over the real sf0.001
parquet — md5 uniforms via hashlib, the Poisson(1) CASE ladder by
explicit threshold walk, jackknife by literal leave-one-day-out."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.resample import (
    _BOOT_B,
    _K_HI,
    _K_LO,
    _POIS_CUM,
    _U_DEN,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _pois_w(user_id: int, rep: int) -> int:
    h = hashlib.md5(f"{user_id}:{rep}".encode()).hexdigest()
    u = int(h[:13], 16) / _U_DEN
    for k, c in enumerate(_POIS_CUM):
        if u < c:
            return k
    return 6


def test_poisson_ladder_is_a_cdf():
    assert list(_POIS_CUM) == sorted(_POIS_CUM)
    # The ladder is the genuine Poisson(1) CDF to double precision.
    for k, c in enumerate(_POIS_CUM):
        exact = math.fsum(
            math.exp(-1) / math.factorial(i) for i in range(k + 1)
        )
        assert c == pytest.approx(exact, abs=1e-15)


def test_bootstrap_ci_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    m: dict = defaultdict(float)
    for r in rows:
        m[r["user_id"]] += r["value"]
    users = sorted(m)
    bms = []
    for rep in range(_BOOT_B):
        ws = {u: _pois_w(u, rep) for u in users}
        wsum = sum(ws.values())
        assert wsum > 0
        bms.append(
            math.fsum(ws[u] * m[u] for u in users) / wsum
        )
    bms.sort()
    boot_mean = math.fsum(bms) / _BOOT_B
    devs = [_e6(b - boot_mean) for b in bms]
    se = math.sqrt(math.fsum(d * d for d in devs) / (_BOOT_B - 1))
    row = SPECS["q_ab_bootstrap_ci"].spark(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(users)
    assert row["n_reps"] == _BOOT_B
    assert row["obs_mean"] == pytest.approx(
        _e6(math.fsum(m.values()) / len(users)), abs=2e-6
    )
    assert row["boot_mean"] == pytest.approx(_e6(boot_mean), abs=2e-6)
    assert row["boot_se"] == pytest.approx(_e6(se), abs=2e-6)
    assert row["ci_lo"] == pytest.approx(_e6(bms[_K_LO - 1]), abs=2e-6)
    assert row["ci_hi"] == pytest.approx(_e6(bms[_K_HI - 1]), abs=2e-6)
    assert row["ci_lo"] <= row["boot_mean"] <= row["ci_hi"]


def test_jackknife_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    s_d: dict = defaultdict(float)
    n_d: dict = defaultdict(int)
    for r in rows:
        d = r["o_orderdate"].date()
        s_d[d] += r["o_totalprice"]
        n_d[d] += 1
    s_all = math.fsum(s_d.values())
    n_all = sum(n_d.values())
    loo = [
        (s_all - s_d[d]) / (n_all - n_d[d]) for d in sorted(s_d)
    ]
    nd = len(loo)
    bar = math.fsum(loo) / nd
    devs = [_e6(x - bar) for x in loo]
    se = math.sqrt((nd - 1) / nd * math.fsum(d * d for d in devs))
    row = (
        SPECS["q_agg_jackknife_variance"].spark(spark, SF_DIR).collect()[0]
    )
    assert row["n_days"] == nd and row["n_orders"] == n_all
    assert row["grand_mean"] == pytest.approx(
        _e6(s_all / n_all), abs=2e-6
    )
    assert row["jack_se"] == pytest.approx(_e6(se), abs=2e-6)
