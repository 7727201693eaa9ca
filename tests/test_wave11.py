"""Bartels rank von Neumann + difference-sign runs (operators/
tsdiag.py), Williams fractal points (operators/finance.py) and
Bowker's symmetry decomposition (operators/markov.py): pin the
SEMANTICS with independent plain-Python implementations over the real
sf0.001 parquet."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.tsdiag import _EPOCH_H, _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _total_series():
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(int(r["ts"].timestamp() // 3600) for r in rows)
    return [cnt.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]


def test_bartels_rank_matches_python(spark):
    y = _total_series()
    n = len(y)
    svals = sorted(y)
    ranks = [
        (sum(1 for v in svals if v < yi) + 1)
        + (sum(1 for v in svals if v == yi) - 1) / 2.0
        for yi in y
    ]
    num = sum(
        (ranks[i] - ranks[i + 1]) ** 2 for i in range(n - 1)
    )
    rbar = (n + 1) / 2.0
    den = sum((r - rbar) ** 2 for r in ranks)
    rvn = num / den
    v = (
        4.0
        * (n - 2)
        * (5.0 * n * n - 2.0 * n - 9.0)
        / (5.0 * n * (n + 1) * (n - 1) * (n - 1))
    )
    row = SPECS["q_ts_bartels_rank"].spark(spark, SF_DIR).collect()[0]
    assert row["n_obs"] == n
    assert row["rvn"] == pytest.approx(rvn, abs=2e-6)
    assert row["var_rvn"] == pytest.approx(v, abs=2e-6)
    assert row["z"] == pytest.approx(
        _e6((_e6(rvn) - 2.0) / _e6(math.sqrt(v))), abs=4e-6
    )


def test_runs_updown_matches_python(spark):
    y = _total_series()
    signs = [
        1 if b > a else -1
        for a, b in zip(y, y[1:])
        if b != a
    ]
    m = len(signs)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    e_r = (2.0 * m + 1.0) / 3.0
    v_r = (16.0 * m - 13.0) / 90.0
    row = SPECS["q_ts_runs_updown"].spark(spark, SF_DIR).collect()[0]
    assert row["n_moves"] == m
    assert row["n_up"] == sum(1 for s in signs if s == 1)
    assert row["n_down"] == sum(1 for s in signs if s == -1)
    assert row["n_runs"] == runs
    assert row["e_runs"] == pytest.approx(_e6(e_r), abs=2e-6)
    assert row["z"] == pytest.approx(
        _e6((runs - e_r) / _e6(math.sqrt(v_r))), abs=4e-6
    )


def test_fractal_points_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        byk[(r["event_type"], int(r["ts"].timestamp() // 3600))].append(
            r["value"]
        )
    highs: dict = defaultdict(list)
    lows: dict = defaultdict(list)
    hours: dict = defaultdict(list)
    for (t, h), vals in sorted(byk.items()):
        highs[t].append(max(vals))
        lows[t].append(min(vals))
        hours[t].append(h)
    expected = {}
    for t in highs:
        hs, ls = highs[t], lows[t]
        for i in range(2, len(hs) - 2):
            fh = all(hs[i] > hs[i + d] for d in (-2, -1, 1, 2))
            fl = all(ls[i] < ls[i + d] for d in (-2, -1, 1, 2))
            if fh or fl:
                expected[(t, hours[t][i])] = (int(fh), int(fl))
    got = {
        (r["event_type"], r["hour_id"]): (
            r["is_fractal_high"],
            r["is_fractal_low"],
        )
        for r in SPECS["q_win_fractal_points"].spark(spark, SF_DIR).collect()
    }
    assert got == expected and len(got) > 0


def test_bowker_symmetry_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byu: dict = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append(r)
    cells = Counter()
    for evs in byu.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(evs, evs[1:]):
            if a["event_type"] != b["event_type"]:
                cells[(a["event_type"], b["event_type"])] += 1
    pairs = {}
    for (a, b), n in cells.items():
        key = (min(a, b), max(a, b))
        fwd, bwd = pairs.get(key, (0, 0))
        if a < b:
            fwd += n
        else:
            bwd += n
        pairs[key] = (fwd, bwd)
    got = {
        (r["a"], r["b"]): r
        for r in SPECS["q_stats_bowker_symmetry"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(pairs)
    for key, (fwd, bwd) in pairs.items():
        row = got[key]
        assert row["n_fwd"] == fwd and row["n_bwd"] == bwd
        assert row["chi2_term"] == pytest.approx(
            _e6((fwd - bwd) ** 2 / (fwd + bwd)), abs=2e-6
        )
