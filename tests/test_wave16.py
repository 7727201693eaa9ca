"""Jonckheère–Terpstra trend test (operators/inference.py), revisit
gap histogram and ping-pong rate (operators/convert.py): pin the
SEMANTICS with independent plain-Python implementations over the real
sf0.001 parquet."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_jonckheere_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    daily: dict = defaultdict(float)
    for r in rows:
        d = int(r["ts"].timestamp() // 86400)
        daily[(r["event_type"], d)] += r["value"]
    groups: dict = defaultdict(list)
    for (t, _d), m in daily.items():
        groups[t].append(m)
    types = sorted(groups)
    j = 0.0
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            for x in groups[ta]:
                for y in groups[tb]:
                    j += 1.0 if x < y else (0.5 if x == y else 0.0)
    ns = [len(groups[t]) for t in types]
    nn = sum(ns)
    e_j = (nn * nn - sum(n * n for n in ns)) / 4.0
    var_j = (
        nn * nn * (2.0 * nn + 3.0)
        - sum(n * n * (2 * n + 3) for n in ns)
    ) / 72.0
    row = SPECS["q_stats_jonckheere"].spark(spark, SF_DIR).collect()[0]
    assert row["n_obs"] == nn
    assert row["j_stat"] == pytest.approx(j, abs=2e-6)
    assert row["e_j"] == pytest.approx(e_j, abs=2e-6)
    assert row["var_j"] == pytest.approx(var_j, abs=2e-6)
    assert row["z"] == pytest.approx(
        _e6((j - e_j) / _e6(math.sqrt(var_j))), abs=4e-6
    )


def test_revisit_gaps_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    days: dict = defaultdict(set)
    for r in rows:
        days[r["user_id"]].add(int(r["ts"].timestamp() // 86400))
    hist: dict = defaultdict(int)
    for ds in days.values():
        s = sorted(ds)
        for a, b in zip(s, s[1:]):
            hist[b - a] += 1
    total = sum(hist.values())
    got = {
        r["gap_days"]: r
        for r in SPECS["q_seq_revisit_gaps"].spark(spark, SF_DIR).collect()
    }
    assert {k: v["n_gaps"] for k, v in got.items()} == dict(hist)
    for k, v in got.items():
        assert v["share"] == pytest.approx(
            _e6(hist[k] / total), abs=2e-6
        )


def test_ping_pong_rate_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byu: dict = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append(r)
    agg: dict = defaultdict(lambda: [0, 0])
    for evs in byu.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        ts = [r["event_type"] for r in evs]
        for i in range(1, len(ts) - 1):
            if ts[i - 1] != ts[i]:
                a = agg[(ts[i - 1], ts[i])]
                a[0] += 1
                a[1] += int(ts[i + 1] == ts[i - 1])
    got = {
        (r["from_type"], r["via_type"]): r
        for r in SPECS["q_seq_ping_pong_rate"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for key, (n, pp) in agg.items():
        row = got[key]
        assert row["n_triples"] == n and row["n_pingpong"] == pp
        assert row["pingpong_rate"] == pytest.approx(
            _e6(pp / n), abs=2e-6
        )
        assert 0.0 <= row["pingpong_rate"] <= 1.0
