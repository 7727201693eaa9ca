"""Adamic-Adar edge scores (llm/clusters.py) and grid-density hotspots
(operators/geo.py): independent plain-Python recomputation. The
density test reads sf0.01 (at sf0.001 every customer occupies its own
cell, all density ratios are exactly 1.0, and the hotspot filter is
structurally empty — asserted too)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.geo import _AX, _AY, _DENS_CELL, _MOD
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()
SF01 = "/root/testdata/sf0.01"


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _edges(spark) -> list[tuple]:
    rows = (
        SPECS["q_llm_ngram_jaccard"].spark(spark, SF_DIR).collect()
    )
    return [(r["doc_a"], r["doc_b"]) for r in rows]


def test_adamic_adar_matches_python(spark):
    edges = _edges(spark)
    adj: dict = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in SPECS["q_graph_adamic_adar"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(edges)
    for a, b in edges:
        common = adj[a] & adj[b]
        aa = math.fsum(1.0 / _e6(math.log(len(adj[w]))) for w in common)
        row = got[(a, b)]
        assert row["common_neighbors"] == len(common)
        assert row["aa_score"] == pytest.approx(aa, abs=1e-9)
        # every witness has degree >= 2 by construction
        for w in common:
            assert len(adj[w]) >= 2


def _cells(sf: str) -> Counter:
    rows = pq.read_table(f"{sf}/customer.parquet").to_pylist()
    cnt: Counter = Counter()
    for r in rows:
        kx = r["c_custkey"] * _AX % _MOD
        ky = r["c_custkey"] * _AY % _MOD
        cnt[(kx // _DENS_CELL, ky // _DENS_CELL)] += 1
    return cnt


def test_grid_density_empty_at_sparse_sf(spark):
    cnt = _cells(SF_DIR)
    assert max(cnt.values()) == 1  # the structural-sparsity premise
    assert (
        SPECS["q_geo_grid_density"].spark(spark, SF_DIR).count() == 0
    )


def test_grid_density_matches_python_at_sf001(spark):
    cnt = _cells(SF01)
    n_total = sum(cnt.values())
    n_cells = len(cnt)
    expect = {}
    for (cx, cy), n in cnt.items():
        dens = n * n_cells / n_total
        if dens < 1.2:
            continue
        neigh_n = neigh_cells = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = cnt.get((cx + dx, cy + dy))
                if nb is not None:
                    neigh_n += nb
                    neigh_cells += 1
        expect[(cx, cy)] = (n, neigh_n, neigh_cells, dens)
    got = {
        (r["cx"], r["cy"]): r
        for r in SPECS["q_geo_grid_density"].spark(spark, SF01).collect()
    }
    assert set(got) == set(expect)
    for k, (n, neigh_n, neigh_cells, dens) in expect.items():
        row = got[k]
        assert row["n"] == n
        assert row["neigh_n"] == neigh_n
        assert row["neigh_cells"] == neigh_cells
        assert row["density_ratio"] == pytest.approx(dens, rel=1e-12)
        assert row["neigh_density_ratio"] == pytest.approx(
            neigh_n * n_cells / (n_total * neigh_cells), rel=1e-12
        )


def test_assortativity_matches_python(spark):
    """Newman degree assortativity recomputed from the edge list."""
    pairs = _edges(spark)
    deg: dict = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    xs = []
    for a, b in pairs:
        xs.append((deg[a], deg[b]))
        xs.append((deg[b], deg[a]))
    m = len(xs)
    sx = sum(x for x, _ in xs)
    sxx = sum(x * x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    den = m * sxx - sx * sx
    expect = 0.0 if den == 0 else _e6((m * sxy - sx * sx) / den)
    row = SPECS["q_graph_assortativity"].spark(spark, SF_DIR).collect()[0]
    assert row["n_edges"] == len(pairs)
    assert row["assortativity"] == pytest.approx(expect, abs=1e-9)
    assert -1.0 - 1e-9 <= row["assortativity"] <= 1.0 + 1e-9


def test_point_in_polygon_matches_python(spark):
    from ex_hivent_spark.operators.geo import _POLYGONS

    keys = [
        r["c_custkey"]
        for r in pq.read_table(f"{SF_DIR}/customer.parquet").to_pylist()
    ]
    want: dict = {}
    for pid, verts in _POLYGONS.items():
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        n_bbox = n_in = 0
        for k in keys:
            x = ((k * _AX) % _MOD) / 1000.0
            y = ((k * _AY) % _MOD) / 1000.0
            if not (min(xs) <= x <= max(xs) and min(ys) <= y <= max(ys)):
                continue
            n_bbox += 1
            inside = False
            for i, (x1, y1) in enumerate(verts):
                x2, y2 = verts[(i + 1) % len(verts)]
                if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (
                    y2 - y1
                ) + x1:
                    inside = not inside
            n_in += 1 if inside else 0
        want[pid] = (len(verts), n_bbox, n_in)
    got = {
        r["polygon_id"]: r
        for r in SPECS["q_geo_point_in_polygon"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for pid, (n_edges, n_bbox, n_in) in want.items():
        row = got[pid]
        assert row["n_edges"] == n_edges
        assert row["n_bbox_candidates"] == n_bbox
        assert row["n_inside"] == n_in
        assert row["n_inside"] <= row["n_bbox_candidates"]


def test_skyline_matches_python_bruteforce(spark):
    parts = pq.read_table(f"{SF01}/part.parquet").to_pylist()
    pts = [(p["p_partkey"], p["p_size"], p["p_retailprice"]) for p in parts]
    sky = set()
    for k, s, pr in pts:
        dominated = any(
            (s2 >= s and pr2 <= pr and (s2 > s or pr2 < pr))
            for _, s2, pr2 in pts
        )
        if not dominated:
            sky.add((k, s, pr))
    got = {
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in SPECS["q_join_skyline"].spark(spark, SF01).collect()
    }
    assert got == sky and len(sky) > 0
    # frontier property: along increasing size, surviving prices must
    # strictly increase (a larger size at an equal-or-lower price would
    # dominate every smaller survivor)
    prices = [p for _, _, p in sorted(got, key=lambda t: t[1])]
    assert all(b > a for a, b in zip(prices, prices[1:]))
