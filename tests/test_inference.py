"""Classical-inference battery (operators/inference.py): pin the
SEMANTICS with independent plain-Python implementations over the real
sf0.001 events table — daily aggregates by dict folding, pair loops
for Kendall, explicit rank arithmetic for Friedman."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.inference import _MID_TS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _events():
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()


def test_kendall_tau_matches_python(spark):
    rows = _events()
    daily: dict = defaultdict(lambda: [0, set()])
    for r in rows:
        d = int(r["ts"].timestamp() // 86400)
        cell = daily[(r["event_type"], d)]
        cell[0] += 1
        cell[1].add(r["user_id"])
    series: dict = defaultdict(list)
    for (t, d), (cnt, users) in sorted(daily.items()):
        series[t].append((cnt, len(users)))
    got = {
        r["event_type"]: r
        for r in SPECS["q_stats_kendall_tau"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(series)
    for t, pts in series.items():
        conc = disc = tx = ty = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (x1, y1), (x2, y2) = pts[i], pts[j]
                if (x1 < x2 and y1 < y2) or (x1 > x2 and y1 > y2):
                    conc += 1
                elif (x1 < x2 and y1 > y2) or (x1 > x2 and y1 < y2):
                    disc += 1
                elif x1 == x2 and y1 != y2:
                    tx += 1
                elif y1 == y2 and x1 != x2:
                    ty += 1
        row = got[t]
        assert (row["n_conc"], row["n_disc"]) == (conc, disc)
        assert (row["n_tie_x"], row["n_tie_y"]) == (tx, ty)
        den = (conc + disc + ty) * (conc + disc + tx)
        if den == 0:
            assert row["tau_b"] is None
        else:
            want = _e6((conc - disc) / math.sqrt(den))
            assert row["tau_b"] == pytest.approx(want, abs=2e-6)
            assert -1.0 <= row["tau_b"] <= 1.0


def test_mcnemar_matches_python(spark):
    rows = _events()
    flags: dict = defaultdict(lambda: [0, 0])
    users = set()
    for r in rows:
        users.add(r["user_id"])
        f = flags[(r["event_type"], r["user_id"])]
        if r["ts"].timestamp() < _MID_TS:
            f[0] = 1
        else:
            f[1] = 1
    cells: dict = defaultdict(lambda: [0, 0, 0])  # both, b, c
    for (t, _), (h1, h2) in flags.items():
        if h1 and h2:
            cells[t][0] += 1
        elif h1:
            cells[t][1] += 1
        elif h2:
            cells[t][2] += 1
    got = {
        r["event_type"]: r
        for r in SPECS["q_stats_mcnemar"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(cells)
    for t, (a, b, c) in cells.items():
        row = got[t]
        assert (row["n_both"], row["n_first_only"], row["n_second_only"]) == (
            a,
            b,
            c,
        )
        assert row["n_neither"] == len(users) - a - b - c
        if b + c == 0:
            assert row["mcnemar_stat"] is None
        else:
            assert row["mcnemar_stat"] == pytest.approx(
                _e6((b - c) ** 2 / (b + c)), abs=2e-6
            )
            assert row["mcnemar_cc"] == pytest.approx(
                _e6(max(abs(b - c) - 1, 0) ** 2 / (b + c)), abs=2e-6
            )


def test_chisq_gof_matches_python(spark):
    rows = _events()
    obs: dict = defaultdict(lambda: [0] * 7)
    for r in rows:
        d = int(r["ts"].timestamp() // 86400)
        obs[r["event_type"]][d % 7] += 1
    got = {
        r["event_type"]: r
        for r in SPECS["q_stats_chisq_gof"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(obs)
    for t, cells in obs.items():
        n = sum(cells)
        e = n / 7.0
        chi2 = math.fsum(_e6((o - e) * (o - e) / e) for o in cells)
        row = got[t]
        assert row["n_events"] == n
        assert row["df"] == 6
        assert row["chi2"] == pytest.approx(_e6(chi2), abs=2e-6)
        assert row["chi2"] >= 0


def test_friedman_matches_python(spark):
    rows = _events()
    daily: dict = defaultdict(float)
    for r in rows:
        d = int(r["ts"].timestamp() // 86400)
        daily[(d, r["event_type"])] += r["value"]
    days = sorted({d for d, _ in daily})
    per_type_days: dict = defaultdict(set)
    for d, t in daily:
        per_type_days[t].add(d)
    kept = sorted(t for t, ds in per_type_days.items() if len(ds) == len(days))
    n, k = len(days), len(kept)
    rj: dict = defaultdict(float)
    tie_sum = 0
    for d in days:
        ms = sorted((daily[(d, t)], t) for t in kept)
        # midranks over equal metric values
        groups: dict = defaultdict(list)
        for pos, (mval, t) in enumerate(ms, start=1):
            groups[mval].append((pos, t))
        for mval, members in groups.items():
            t_cnt = len(members)
            tie_sum += t_cnt**3 - t_cnt
            mid = min(p for p, _ in members) + (t_cnt - 1) / 2.0
            for _, t in members:
                rj[t] += mid
    q = 12.0 / (n * k * (k + 1)) * math.fsum(
        v * v for v in rj.values()
    ) - 3.0 * n * (k + 1)
    row = SPECS["q_stats_friedman"].spark(spark, SF_DIR).collect()[0]
    assert (row["n_days"], row["k"]) == (n, k)
    assert row["q_stat"] == pytest.approx(_e6(q), abs=1e-5)
    assert row["q_stat"] >= -1e-9
    cfac = 1.0 - tie_sum / (n * (k**3 - k))
    assert row["tie_factor"] == pytest.approx(_e6(cfac), abs=2e-6)
    if cfac > 0:
        assert row["q_adj"] == pytest.approx(_e6(q / cfac), abs=1e-5)


def test_bartlett_matches_python(spark):
    rows = _events()
    groups: dict = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r["value"])
    k = ntot = 0
    ssq_tot = wlns = inv_sum = 0.0
    for t, vals in groups.items():
        nv = len(vals)
        if nv < 2:
            continue
        sx = math.fsum(vals)
        sxx = math.fsum(v * v for v in vals)
        ssq = _e6(sxx - sx * sx / nv)
        s2 = _e6((sxx - sx * sx / nv) / (nv - 1))
        if s2 <= 0:
            continue
        k += 1
        ntot += nv
        ssq_tot += ssq
        wlns += (nv - 1) * _e6(math.log(s2))
        inv_sum += _e6(1.0 / (nv - 1))
    pooled = _e6(ssq_tot / (ntot - k))
    lnp = _e6(math.log(pooled))
    tnum = (ntot - k) * lnp - wlns
    c = 1.0 + (inv_sum - _e6(1.0 / (ntot - k))) / (3.0 * (k - 1))
    row = SPECS["q_stats_bartlett"].spark(spark, SF_DIR).collect()[0]
    assert (row["k"], row["n_total"]) == (k, ntot)
    assert row["pooled_var"] == pytest.approx(pooled, abs=2e-6)
    assert row["bartlett_stat"] == pytest.approx(_e6(tnum / c), abs=1e-4)


def test_sprt_boundary_matches_python(spark):
    from ex_hivent_spark.operators.inference import (
        _SPRT_A,
        _SPRT_B,
        _SPRT_L0,
        _SPRT_L1,
    )

    rows = _events()
    hourly: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        hourly[h][0] += 1
        if r["event_type"] == "purchase":
            hourly[h][1] += 1
    cum = 0.0
    up_h = dn_h = None
    final = None
    for h in sorted(hourly):
        n, c = hourly[h]
        cum += _e6(c * _SPRT_L1 + (n - c) * _SPRT_L0)
        if up_h is None and cum >= _SPRT_A:
            up_h = h
        if dn_h is None and cum <= _SPRT_B:
            dn_h = h
        final = cum
    row = SPECS["q_ab_sprt_boundary"].spark(spark, SF_DIR).collect()[0]
    assert row["n_hours"] == len(hourly)
    assert row["final_llr"] == pytest.approx(_e6(final), abs=2e-6)
    first = min(x for x in (up_h, dn_h) if x is not None) if (
        up_h is not None or dn_h is not None
    ) else None
    assert row["first_cross_h"] == first
    if first is None:
        assert row["decision"] == "continue"
    elif up_h is not None and (dn_h is None or up_h < dn_h):
        assert row["decision"] == "accept_h1"
    else:
        assert row["decision"] == "accept_h0"


def test_permutation_test_matches_python(spark):
    import hashlib

    from ex_hivent_spark.operators.inference import _PERM_B

    rows = _events()
    per_user: dict = defaultdict(float)
    for r in rows:
        per_user[r["user_id"]] += r["value"]

    def diff(assign):
        a = [m for u, m in per_user.items() if assign(u) == 0]
        b = [m for u, m in per_user.items() if assign(u) == 1]
        return math.fsum(a) / len(a) - math.fsum(b) / len(b)

    d_obs = diff(lambda u: u % 2)
    n_ext = 0
    for rep in range(_PERM_B):
        d = diff(
            lambda u: int(
                hashlib.md5(f"{u}:{rep}".encode()).hexdigest()[31], 16
            )
            % 2
        )
        if abs(d) >= abs(d_obs):
            n_ext += 1
    row = SPECS["q_ab_permutation_test"].spark(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(per_user)
    assert row["n_reps"] == _PERM_B
    assert row["obs_diff"] == pytest.approx(_e6(d_obs), abs=2e-6)
    assert row["n_extreme"] == n_ext
    assert row["p_value"] == pytest.approx(
        _e6((1.0 + n_ext) / (1.0 + _PERM_B)), abs=2e-6
    )
    assert 0.0 < row["p_value"] <= 1.0
