"""Window funnel (operators/funnelwin.py) and char-class profile
(llm/docstats.py): pin the SEMANTICS with independent plain-Python
implementations over the real sf0.001 parquet."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.funnelwin import (
    _FUNNEL_STEPS,
    _FUNNEL_WIN_US,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_window_funnel_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    by_u: dict = defaultdict(list)
    for r in rows:
        by_u[r["user_id"]].append(
            (round(r["ts"].timestamp() * 1e6), r["event_type"])
        )
    levels = Counter()
    for u, evs in by_u.items():
        s1 = [t for t, ty in evs if ty == _FUNNEL_STEPS[0]]
        if not s1:
            levels[0] += 1
            continue
        t1 = min(s1)
        end = t1 + _FUNNEL_WIN_US
        s2 = [
            t
            for t, ty in evs
            if ty == _FUNNEL_STEPS[1] and t1 < t <= end
        ]
        if not s2:
            levels[1] += 1
            continue
        t2 = min(s2)
        s3 = [
            t
            for t, ty in evs
            if ty == _FUNNEL_STEPS[2] and t2 < t <= end
        ]
        levels[3 if s3 else 2] += 1
    n_users = len(by_u)
    got = {
        r["level"]: r
        for r in SPECS["q_seq_window_funnel"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == {lv for lv, c in levels.items() if c > 0}
    for lv, c in levels.items():
        if c == 0:
            continue
        row = got[lv]
        assert row["n_at_level"] == c
        assert row["share"] == pytest.approx(_e6(c / n_users), abs=2e-6)
    assert sum(r["n_at_level"] for r in got.values()) == n_users


def test_char_class_profile_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    agg: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for d in docs:
        t = d["text"]
        a = agg[d["lang"]]
        a[0] += 1
        a[1] += len(t)
        a[2] += len(re.sub(r"[^a-zA-Z]", "", t))
        a[3] += len(re.sub(r"[^0-9]", "", t))
        a[4] += len(re.sub(r"[^ ]", "", t))
    got = {
        r["lang"]: r
        for r in SPECS["q_llm_char_class_profile"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(agg)
    for lang, (nd, nc, na, ndig, nsp) in agg.items():
        row = got[lang]
        assert row["n_docs"] == nd and row["n_chars"] == nc
        assert row["alpha_ratio"] == pytest.approx(_e6(na / nc), abs=2e-6)
        assert row["digit_ratio"] == pytest.approx(
            _e6(ndig / nc), abs=2e-6
        )
        assert row["space_ratio"] == pytest.approx(
            _e6(nsp / nc), abs=2e-6
        )
        assert row["other_ratio"] == pytest.approx(
            _e6(1 - (na + ndig + nsp) / nc), abs=2e-6
        )
    # Ratios partition the character mass.
    for row in got.values():
        total = (
            row["alpha_ratio"]
            + row["digit_ratio"]
            + row["space_ratio"]
            + row["other_ratio"]
        )
        assert total == pytest.approx(1.0, abs=1e-5)
