"""Quality audits (operators/quality.py) + embedding centroid shift
(llm/embaudit.py): pin the SEMANTICS with independent plain-Python
implementations over the real sf0.001 parquet, and pin the
enum-conformance audit's both-outcome contract (the configured
violating columns actually violate)."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.quality import (
    _DOMAINS,
    _FRESH_WIN_S,
    _MONTH_DAYS,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_freshness_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    wmax = max(r["ts"] for r in rows)
    by_t: dict = defaultdict(list)
    for r in rows:
        by_t[r["event_type"]].append(r["ts"])
    got = {
        r["event_type"]: r
        for r in SPECS["q_quality_freshness_lag"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(by_t)
    for t, tss in by_t.items():
        last = max(tss)
        n = len(tss)
        n24 = sum(
            1
            for ts in tss
            if ts.timestamp() > wmax.timestamp() - _FRESH_WIN_S
        )
        row = got[t]
        assert row["n_events"] == n
        assert row["last_ts"] == last
        assert row["staleness_s"] == int(
            math.floor(wmax.timestamp()) - math.floor(last.timestamp())
        )
        assert row["last24h_count"] == n24
        assert row["freshness_ratio"] == pytest.approx(
            _e6(n24 / (n / _MONTH_DAYS)), abs=2e-6
        )


def test_enum_conformance_matches_python(spark):
    got = {
        (r["table_name"], r["column_name"]): r
        for r in SPECS["q_quality_enum_conformance"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert len(got) == len(_DOMAINS)
    for table, column, domain in _DOMAINS:
        vals = [
            r[column]
            for r in pq.read_table(
                f"{SF_DIR}/{table}.parquet", columns=[column]
            ).to_pylist()
        ]
        viol = [v for v in vals if v not in domain]
        row = got[(table, column)]
        assert row["n_rows"] == len(vals)
        assert row["n_violating"] == len(viol)
        assert row["conformance"] == pytest.approx(
            _e6(1.0 - len(viol) / len(vals)), abs=2e-6
        )
        assert row["example_violation"] == (min(viol) if viol else None)


def test_enum_conformance_exercises_both_outcomes(spark):
    rows = (
        SPECS["q_quality_enum_conformance"].spark(spark, SF_DIR).collect()
    )
    violating = {r["column_name"] for r in rows if r["n_violating"] > 0}
    clean = {r["column_name"] for r in rows if r["n_violating"] == 0}
    # The configured drift cases are flagged...
    assert {"o_orderstatus", "lang"} <= violating
    # ...and the fully-documented domains stay clean.
    assert "event_type" in clean and "l_returnflag" in clean


def test_centroid_shift_matches_python(spark):
    # Mirror the engine's decimal(25,6) detour exactly: every addend
    # is HALF_UP-rounded to 6 decimals before the (exact) summation.
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")

    rows = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    sums: dict = defaultdict(lambda: None)
    counts: dict = defaultdict(int)
    for r in rows:
        key = (r["label"], r["vec_id"] % 2)
        v = [
            Decimal(float(x)).quantize(q6, ROUND_HALF_UP)
            for x in r["embedding"]
        ]
        if sums[key] is None:
            sums[key] = [Decimal(0)] * len(v)
        sums[key] = [a + b for a, b in zip(sums[key], v)]
        counts[key] += 1
    got = {
        r["label"]: r
        for r in SPECS["q_emb_centroid_shift"].spark(spark, SF_DIR).collect()
    }
    labels = {lb for lb, _ in sums}
    assert set(got) == labels
    for lb in labels:
        ce = [_e6(float(s) / counts[(lb, 0)]) for s in sums[(lb, 0)]]
        co = [_e6(float(s) / counts[(lb, 1)]) for s in sums[(lb, 1)]]
        ss = math.fsum((a - b) ** 2 for a, b in zip(ce, co))
        dot = math.fsum(a * b for a, b in zip(ce, co))
        ne2 = math.fsum(a * a for a in ce)
        no2 = math.fsum(b * b for b in co)
        row = got[lb]
        assert row["n_even"] == counts[(lb, 0)]
        assert row["n_odd"] == counts[(lb, 1)]
        assert row["l2_shift"] == pytest.approx(
            _e6(math.sqrt(ss)), abs=2e-6
        )
        assert row["centroid_cos"] == pytest.approx(
            _e6(dot / math.sqrt(ne2 * no2)), abs=2e-6
        )
        # Cosine stays a valid cosine. (No magnitude assertion: the
        # synthetic labels' centroids sit near the origin, so the
        # split-half cosine is legitimately small at tiny SF.)
        assert -1.000001 <= row["centroid_cos"] <= 1.000001
