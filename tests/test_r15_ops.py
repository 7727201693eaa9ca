"""r15 operators: hand-computed references on the sf0.001 testdata
plus invariant checks (the SURVEY §5 strategy — each op checked
against plain-Python math, not just the DuckDB oracle)."""

from __future__ import annotations

import hashlib
import math

import pytest

from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _docs(sf_dir):
    import duckdb

    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def test_pixel_stats_matches_python_md5_bytes(spark):
    got = {
        r["media_id"]: r
        for r in SPECS["q_mm_pixel_stats"].spark(spark, SF_DIR).collect()
    }
    ref_ids = set()
    for doc_id, text in _docs(SF_DIR):
        if doc_id % 3 != 0:
            continue  # image kind only
        ref_ids.add(doc_id)
        payload = hashlib.md5(text.encode()).digest() * (doc_id % 7 + 1)
        b = list(payload)
        n = len(b)
        row = got[doc_id]
        assert row["n_px"] == n
        assert row["px_min"] == min(b)
        assert row["px_max"] == max(b)
        assert row["px_range"] == max(b) - min(b)
        assert row["mean_px"] == _e6(sum(b) / n)
        sb, ssq = sum(b), sum(x * x for x in b)
        assert row["var_px"] == _e6(ssq / n - (sb / n) * (sb / n))
        assert row["var_px"] >= 0.0
    assert set(got) == ref_ids


def test_aspect_bucket_pack_matches_python(spark):
    got = {
        (r["kind"], r["aspect_bucket"]): r
        for r in SPECS["q_mm_aspect_bucket_pack"].spark(spark, SF_DIR).collect()
    }
    ref: dict[tuple[str, int], list[int]] = {}
    for doc_id, _ in _docs(SF_DIR):
        if doc_id % 3 == 1:
            continue  # audio has no aspect
        kind = "image" if doc_id % 3 == 0 else "video"
        w, h = doc_id % 64 + 1, doc_id % 48 + 1
        ref.setdefault((kind, w * 4 // h), []).append(w * h)
    assert set(got) == set(ref)
    for key, pxs in ref.items():
        row = got[key]
        n = len(pxs)
        assert row["n_items"] == n
        assert row["total_px"] == sum(pxs)
        assert row["n_batches"] == (n + 31) // 32
        assert row["pad_waste"] == (n + 31) // 32 * 32 - n
        assert 0 <= row["pad_waste"] < 32


def test_bloom_sizing_formula_and_bounds(spark):
    rows = SPECS["q_maint_bloom_sizing"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        n, m = r["n_keys"], r["m_bits"]
        assert m == math.ceil(n * 9.585058610817272)
        assert r["k_hashes"] == 7
        assert r["bits_per_key"] == _e6(m / n)
        miss = _e6(math.exp(-(7.0 * n) / m))
        assert r["fpp"] == _e6((1.0 - miss) ** 7)
        # sized for 1%: achieved fpp must sit near the target
        assert 0.005 < r["fpp"] < 0.015


def test_retention_tiers_partition_events_exactly(spark):
    import duckdb

    rows = SPECS["q_maint_retention_tiers"].spark(spark, SF_DIR).collect()
    con = duckdb.connect()
    per_type = dict(
        con.execute(
            f"SELECT event_type, count(*) FROM '{SF_DIR}/events.parquet' "
            "GROUP BY event_type"
        ).fetchall()
    )
    got_type_totals: dict[str, int] = {}
    for r in rows:
        assert r["tier"] in ("hot", "warm", "cold", "expired")
        got_type_totals[r["event_type"]] = (
            got_type_totals.get(r["event_type"], 0) + r["n_events"]
        )
        assert r["share"] == _e6(r["n_events"] / per_type[r["event_type"]])
    # tiers partition each type's stream: counts add back up exactly
    assert got_type_totals == per_type


def test_incremental_watermark_min_of_max(spark):
    import duckdb

    rows = SPECS["q_maint_incremental_watermark"].spark(spark, SF_DIR).collect()
    con = duckdb.connect()
    ref = {
        t: (mx, n)
        for t, mx, n in con.execute(
            f"SELECT event_type, max(epoch_us(ts)), count(*) "
            f"FROM '{SF_DIR}/events.parquet' GROUP BY event_type"
        ).fetchall()
    }
    wm = min(mx for mx, _ in ref.values())
    assert {r["event_type"] for r in rows} == set(ref)
    blocking = 0
    for r in rows:
        mx, n = ref[r["event_type"]]
        assert r["pmax_us"] == mx
        assert r["n_events"] == n
        assert r["lag_us"] == mx - wm >= 0
        assert r["is_blocking"] == (mx == wm)
        blocking += int(r["is_blocking"])
    assert blocking >= 1  # someone holds the watermark


def test_voronoi_catchment_matches_python_argmin(spark):
    import duckdb

    from ex_hivent_spark.operators.geo import _AX, _AY, _MOD, _SITES

    rows = SPECS["q_geo_voronoi_catchment"].spark(spark, SF_DIR).collect()
    con = duckdb.connect()
    keys = [
        k
        for (k,) in con.execute(
            f"SELECT c_custkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    ref: dict[int, list[int]] = {}
    for k in keys:
        kx, ky = (k * _AX) % _MOD, (k * _AY) % _MOD
        best = min(
            (( (kx - sx) ** 2 + (ky - sy) ** 2 ), sid)
            for sid, sx, sy in _SITES
        )
        ref.setdefault(best[1], []).append(best[0])
    got = {r["site_id"]: r for r in rows}
    assert set(got) == set(ref)
    assert sum(r["n_pts"] for r in rows) == len(keys)  # total partition
    for sid, d2s in ref.items():
        row = got[sid]
        assert row["n_pts"] == len(d2s)
        assert row["max_dist2"] == max(d2s)
        mean = sum(_e6(math.sqrt(d)) for d in d2s) / len(d2s)
        assert row["mean_dist"] == pytest.approx(_e6(mean), abs=1e-6)


def test_range_bounds_balanced_and_ordered(spark):
    import duckdb

    rows = sorted(
        SPECS["q_layout_range_bounds"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["tile"],
    )
    con = duckdb.connect()
    (n_total,) = con.execute(
        f"SELECT count(*) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()
    assert [r["tile"] for r in rows] == list(range(16))
    assert sum(r["n_rows"] for r in rows) == n_total
    # equal-rank split: tile sizes differ by at most 1
    sizes = [r["n_rows"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # key ranges are ordered and non-overlapping up to boundary ties
    for a, b in zip(rows, rows[1:]):
        assert a["lower_cents"] <= a["upper_cents"]
        assert a["upper_cents"] <= b["lower_cents"]
