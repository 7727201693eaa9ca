"""Fligner–Policello robust rank test (operators/nonparam.py),
habit-strength histogram (operators/convert.py) and token-length
profile (llm/lexsignals.py): pin the SEMANTICS with independent
plain-Python implementations over the real sf0.001 parquet — the
Fligner check computes placements by DIRECT cross-group counting,
validating the operator's pooled-minus-own midrank identity."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.nonparam import _AB_G1, _AB_G2
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_fligner_policello_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    hv: dict = defaultdict(float)
    for r in rows:
        if r["event_type"] in (_AB_G1, _AB_G2):
            hv[(r["event_type"], int(r["ts"].timestamp() // 3600))] += r[
                "value"
            ]
    g1 = [m for (t, _h), m in hv.items() if t == _AB_G1]
    g2 = [m for (t, _h), m in hv.items() if t == _AB_G2]

    def placements(xs, ys):
        return [
            sum(1.0 for y in ys if y < x)
            + 0.5 * sum(1 for y in ys if y == x)
            for x in xs
        ]

    p1 = placements(g1, g2)
    p2 = placements(g2, g1)
    sp1, sp2 = math.fsum(p1), math.fsum(p2)
    m1, m2 = sp1 / len(p1), sp2 / len(p2)
    ss1 = math.fsum((p - m1) ** 2 for p in p1)
    ss2 = math.fsum((p - m2) ** 2 for p in p2)
    u = (sp2 - sp1) / (2.0 * math.sqrt(ss1 + ss2 + m1 * m2))
    row = SPECS["q_stats_fligner_policello"].spark(spark, SF_DIR).collect()[0]
    assert row["n_g1"] == len(g1) and row["n_g2"] == len(g2)
    assert row["mean_placement_g1"] == pytest.approx(m1, abs=2e-6)
    assert row["mean_placement_g2"] == pytest.approx(m2, abs=2e-6)
    assert row["u_stat"] == pytest.approx(u, abs=1e-4)


def test_habit_strength_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    uh = Counter(
        (r["user_id"], int(r["ts"].timestamp() // 3600) % 24)
        for r in rows
    )
    per_user: dict = defaultdict(dict)
    for (u, hh), n in uh.items():
        per_user[u][hh] = n
    deciles: dict = defaultdict(lambda: [0, 0])
    for u, bins in per_user.items():
        modal = max(bins.values())
        n = sum(bins.values())
        d = math.floor(modal / n * 10.0)
        deciles[d][0] += 1
        deciles[d][1] += n
    total = sum(v[0] for v in deciles.values())
    got = {
        r["decile"]: r
        for r in SPECS["q_seq_habit_strength"].spark(spark, SF_DIR).collect()
    }
    assert {k: v["n_users"] for k, v in got.items()} == {
        k: v[0] for k, v in deciles.items()
    }
    for k, row in got.items():
        assert row["n_events"] == deciles[k][1]
        assert row["user_share"] == pytest.approx(
            _e6(deciles[k][0] / total), abs=2e-6
        )


def test_token_len_profile_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    g = Counter()
    for d in docs:
        for tok in d["text"].split(" "):
            g[(d["source"], len(tok))] += 1
    tot: dict = defaultdict(lambda: [0, 0])
    for (src, ln), n in g.items():
        tot[src][0] += n
        tot[src][1] += ln * n
    got = {
        (r["source"], r["tok_len"]): r
        for r in SPECS["q_llm_token_len_profile"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(g)
    for (src, ln), n in g.items():
        row = got[(src, ln)]
        assert row["n_toks"] == n
        assert row["share"] == pytest.approx(
            _e6(n / tot[src][0]), abs=2e-6
        )
        assert row["mean_len"] == pytest.approx(
            _e6(tot[src][1] / tot[src][0]), abs=2e-6
        )
