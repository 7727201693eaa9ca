"""Spatial radius join via grid-cell blocking.

The missing spatial shape next to the time-range and similarity joins:
"find pairs of points within distance d" — session stitching by
proximity, store-catchment overlap, duplicate-location detection. The
plan is the same lossless blocking discipline as the dedup family: a
content-derived cell key bounds the candidate set (points within d of
each other MUST fall in the same or an adjacent cell when the cell
width equals d), candidates equi-join on the cell, and exact geometry
verifies — never an all-pairs product.

Coordinates here are synthesized deterministically from customer keys
(the testdata has no geo columns): integer multiplicative hashes give
each customer a point on a 1000x1000 plane with exact 0.001 grid
coordinates, so both engines derive identical doubles and the oracle
can verify with a genuine all-pairs plan. Distances are planar
(Euclidean): pure IEEE arithmetic — a haversine variant would need
trig rounding contracts; the BLOCKING plan is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.plans.registry import register

# Multiplicative hashes spreading custkeys over a [0, 1e6) integer
# grid; coordinate = k / 1000.0 (exact same double in any engine).
_AX, _AY = 2654435761, 40503
_MOD = 1_000_000
_RADIUS = 5.0  # cell width == radius -> 3x3 neighborhood is lossless
_CELL = int(_RADIUS * 1000)  # cell key divisor in integer grid units


@register(
    "q_geo_radius_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * {_AX}) % {_MOD} AS kx,
             (c_custkey * {_AY}) % {_MOD} AS ky
      FROM customer
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             (a.kx / 1000.0 - b.kx / 1000.0) * (a.kx / 1000.0 - b.kx / 1000.0)
             + (a.ky / 1000.0 - b.ky / 1000.0) * (a.ky / 1000.0 - b.ky / 1000.0)
                 AS dist2
      FROM pts a JOIN pts b ON a.id < b.id
    )
    SELECT id_a, id_b, dist2 FROM pairs
    WHERE dist2 <= {_RADIUS} * {_RADIUS}
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within Euclidean distance _RADIUS on the
    synthesized customer plane, with the squared distance.

    Blocking: cell = (kx div _CELL, ky div _CELL) in INTEGER arithmetic
    (cell width == the radius), side A explodes its 3x3 cell
    neighborhood, candidates equi-join on the neighbor cell, exact
    distance verifies. The filter is lossless — two points within d
    cannot differ by more than one cell per axis — so the result is
    IDENTICAL to the oracle's all-pairs plan (which is quadratic; the
    cell join is the 100 TB path, exactly as the prefix filter is for
    Jaccard). Expected candidates per cell are |points| * d^2 / area —
    the selectivity knob is the radius itself.

    Determinism: cell keys are pure integer division; coordinates are
    k/1000.0 exact IEEE divisions shared by both engines; dist2 is two
    products + one sum on identical doubles — no rounding anywhere."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * _AX) % _MOD).alias("kx"),
        ((F.col("c_custkey") * _AY) % _MOD).alias("ky"),
    )
    pts = c.select(
        "id",
        "kx",
        "ky",
        F.floor(F.col("kx") / _CELL).cast("long").alias("cx"),
        F.floor(F.col("ky") / _CELL).cast("long").alias("cy"),
    )

    # A-side: explode the 3x3 neighborhood; B-side: home cell only.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("kx").alias("kx_a"),
        F.col("ky").alias("ky_a"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "kx_a",
        "ky_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("kx").alias("kx_b"),
        F.col("ky").alias("ky_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("kx_a") / 1000.0 - F.col("kx_b") / 1000.0
    dy = F.col("ky_a") / 1000.0 - F.col("ky_b") / 1000.0
    dist2 = dx * dx + dy * dy
    # no distinct needed: B sits in its single home cell, so each pair
    # meets on exactly one (jx, jy) — the join emits it once.
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(_RADIUS * _RADIUS))
    )


_NN_RADIUS = 25.0  # bounded-NN search radius (plane units)
_NN_CELL = int(_NN_RADIUS * 1000)


@register(
    "q_geo_nearest_neighbor",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey AS id,
             (c_custkey * {_AX}) % {_MOD} AS kx,
             (c_custkey * {_AY}) % {_MOD} AS ky
      FROM customer
    ),
    supp AS (
      SELECT s_suppkey AS id,
             (s_suppkey * {_AX}) % {_MOD} AS kx,
             (s_suppkey * {_AY}) % {_MOD} AS ky
      FROM supplier
    ),
    cand AS (
      SELECT s.id AS supp_id, c.id AS cust_id,
             (s.kx / 1000.0 - c.kx / 1000.0)
               * (s.kx / 1000.0 - c.kx / 1000.0)
             + (s.ky / 1000.0 - c.ky / 1000.0)
               * (s.ky / 1000.0 - c.ky / 1000.0) AS dist2
      FROM supp s JOIN cust c
        ON (s.kx / 1000.0 - c.kx / 1000.0)
             * (s.kx / 1000.0 - c.kx / 1000.0)
           + (s.ky / 1000.0 - c.ky / 1000.0)
             * (s.ky / 1000.0 - c.ky / 1000.0)
           <= {_NN_RADIUS} * {_NN_RADIUS}
    ),
    best AS (
      SELECT supp_id,
             min({{'d': dist2, 'id': cust_id}}) AS b,
             CAST(count(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY supp_id
    )
    SELECT s.id AS supp_id,
           b['id'] AS nearest_cust,
           b['d'] AS dist2,
           coalesce(n_candidates, 0) AS n_candidates
    FROM supp s LEFT JOIN best ON best.supp_id = s.id
    """,
)
def q_geo_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius nearest-neighbor join: for every supplier point,
    the closest customer point within _NN_RADIUS (NULL when the disc
    is empty) plus the candidate count — the spatial assignment join
    (nearest depot / store catchment / dedup-by-location) that a
    plain radius join only half answers.

    Plan: the q_geo_radius_join cell-blocking discipline with cell
    width == radius — suppliers explode their 3×3 cell neighborhood,
    customers sit in their home cell, the equi-join on the neighbor
    cell bounds candidates losslessly (a point within R cannot be
    farther than one cell away per axis), and the per-supplier argmin
    is a min-over-struct hash aggregate (no window). The left join
    back to suppliers keeps empty-disc rows. At scale, unbounded
    exact NN runs this with expanding ring radii over the same grid;
    the bounded form IS the production shape (assignment problems
    always carry a service-radius cap). Determinism: exact IEEE
    dist2 on grid-exact coordinates, (dist2, cust_id) total order."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        ((F.col("c_custkey") * _AX) % _MOD).alias("kx"),
        ((F.col("c_custkey") * _AY) % _MOD).alias("ky"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_id"),
        ((F.col("s_suppkey") * _AX) % _MOD).alias("kx"),
        ((F.col("s_suppkey") * _AY) % _MOD).alias("ky"),
    )
    c_cells = cust.select(
        "cust_id",
        F.col("kx").alias("kx_c"),
        F.col("ky").alias("ky_c"),
        F.floor(F.col("kx") / _NN_CELL).cast("long").alias("jx"),
        F.floor(F.col("ky") / _NN_CELL).cast("long").alias("jy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    s_cells = supp.select(
        "supp_id",
        F.col("kx").alias("kx_s"),
        F.col("ky").alias("ky_s"),
        F.explode(offsets).alias("o"),
        F.floor(F.col("kx") / _NN_CELL).cast("long").alias("cx"),
        F.floor(F.col("ky") / _NN_CELL).cast("long").alias("cy"),
    ).select(
        "supp_id",
        "kx_s",
        "ky_s",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    dx = F.col("kx_s") / 1000.0 - F.col("kx_c") / 1000.0
    dy = F.col("ky_s") / 1000.0 - F.col("ky_c") / 1000.0
    dist2 = dx * dx + dy * dy
    cand = (
        s_cells.join(c_cells, ["jx", "jy"])
        .select("supp_id", "cust_id", dist2.alias("dist2"))
        .filter(F.col("dist2") <= _NN_RADIUS * _NN_RADIUS)
    )
    best = cand.groupBy("supp_id").agg(
        F.min(
            F.struct(F.col("dist2").alias("d"), F.col("cust_id").alias("id"))
        ).alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
    )
    return supp.select("supp_id").join(best, "supp_id", "left").select(
        "supp_id",
        F.col("b.id").alias("nearest_cust"),
        F.col("b.d").alias("dist2"),
        F.coalesce(F.col("n_candidates"), F.lit(0).cast("bigint")).alias(
            "n_candidates"
        ),
    )


# Density grid: 20-unit cells over the 1000x1000 plane -> <=2500 cells.
_DENS_CELL = 20000  # in integer grid units (20.0 * 1000)


@register(
    "q_geo_grid_density",
    oracle=f"""
    WITH pts AS (
      SELECT (c_custkey * {_AX}) % {_MOD} AS kx,
             (c_custkey * {_AY}) % {_MOD} AS ky
      FROM customer
    ),
    cells AS (
      SELECT CAST(floor(kx / {_DENS_CELL}) AS BIGINT) AS cx,
             CAST(floor(ky / {_DENS_CELL}) AS BIGINT) AS cy,
             CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM cells
    ),
    offs AS (
      SELECT dx, dy
      FROM (SELECT unnest([-1, 0, 1]) AS dx)
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy)
    ),
    neigh AS (
      SELECT a.cx, a.cy, CAST(sum(b.n) AS BIGINT) AS neigh_n,
             CAST(count(*) AS BIGINT) AS neigh_cells
      FROM cells a
      JOIN offs o ON TRUE
      JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
      GROUP BY a.cx, a.cy
    )
    SELECT c.cx, c.cy, c.n, h.neigh_n, h.neigh_cells,
           CAST(c.n AS DOUBLE) * t.n_cells / t.n_total AS density_ratio,
           CAST(h.neigh_n AS DOUBLE) * t.n_cells
             / (t.n_total * h.neigh_cells) AS neigh_density_ratio
    FROM cells c
    JOIN neigh h ON h.cx = c.cx AND h.cy = c.cy
    CROSS JOIN tot t
    WHERE CAST(c.n AS DOUBLE) * t.n_cells / t.n_total >= 1.2
    """,
)
def q_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density hotspots: points bin into fixed 20-unit grid
    cells; a cell is a hotspot when its density is ≥1.2× the global
    mean cell density, reported with its 3×3-neighborhood density
    (the Getis-Ord-style local cluster readout distinguishing an
    isolated spike from a genuine dense region). The standard
    store-siting / demand-heatmap aggregation.

    Plan: one hash aggregate bins the points (cell count bounded by
    the fixed 2500-cell grid, not point volume); the 3×3 neighborhood
    is a 9-way offset self-join of the CELL frame (broadcast-sized
    both sides); global totals are a scalar broadcast. At 100 TB only
    the first aggregate touches data volume — everything after is
    grid-sized. Determinism: all-integer counts; density ratios are
    single exact double divisions of integers (no libm); the hotspot
    threshold compares the same expression both engines."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        (F.col("c_custkey") * _AX % _MOD).alias("kx"),
        (F.col("c_custkey") * _AY % _MOD).alias("ky"),
    )
    cells = pts.groupBy(
        F.floor(F.col("kx") / _DENS_CELL).cast("bigint").alias("cx"),
        F.floor(F.col("ky") / _DENS_CELL).cast("bigint").alias("cy"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n")).localCheckpoint(
        eager=False
    )  # the cell frame feeds totals, the 9-way join, and the output
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    offs = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("bigint").alias("dx"),
        (F.floor(F.col("id") / 3) - 1).cast("bigint").alias("dy"),
    )
    b = cells.select(
        F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("n").alias("bn")
    )
    neigh = (
        cells.crossJoin(F.broadcast(offs))
        .join(
            F.broadcast(b),
            (F.col("bx") == F.col("cx") + F.col("dx"))
            & (F.col("by") == F.col("cy") + F.col("dy")),
        )
        .groupBy("cx", "cy")
        .agg(
            F.sum("bn").cast("bigint").alias("neigh_n"),
            F.count(F.lit(1)).cast("bigint").alias("neigh_cells"),
        )
    )
    out = (
        cells.join(neigh, ["cx", "cy"])
        .crossJoin(F.broadcast(tot))
    )
    dens = (
        F.col("n").cast("double")
        * F.col("n_cells")
        / F.col("n_total")
    )
    return out.filter(dens >= 1.2).select(
        "cx",
        "cy",
        "n",
        "neigh_n",
        "neigh_cells",
        dens.alias("density_ratio"),
        (
            F.col("neigh_n").cast("double")
            * F.col("n_cells")
            / (F.col("n_total") * F.col("neigh_cells"))
        ).alias("neigh_density_ratio"),
    )


# Audit polygons on the synthesized 1000x1000 customer plane: integer
# vertices, one deliberately NON-convex ring so the even-odd rule is
# genuinely exercised. Closing edge implied.
_POLYGONS = {
    1: ((100, 100), (400, 150), (250, 450)),
    2: ((500, 500), (900, 520), (880, 900), (690, 640)),
    3: ((50, 600), (300, 620), (350, 850), (200, 950), (80, 800)),
}


def _poly_edges() -> list[tuple[int, float, float, float, float]]:
    """(polygon_id, x1, y1, x2, y2) edge list, ring-closed."""
    rows = []
    for pid, verts in _POLYGONS.items():
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            rows.append((pid, float(x1), float(y1), float(x2), float(y2)))
    return rows


def _poly_bboxes() -> list[tuple[int, float, float, float, float, int]]:
    """(polygon_id, xmin, ymin, xmax, ymax, n_edges)."""
    rows = []
    for pid, verts in _POLYGONS.items():
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        rows.append(
            (
                pid,
                float(min(xs)),
                float(min(ys)),
                float(max(xs)),
                float(max(ys)),
                len(verts),
            )
        )
    return rows


_SQL_EDGES_PIP = " UNION ALL ".join(
    f"SELECT {pid} AS polygon_id, CAST({x1} AS DOUBLE) AS x1,"
    f" CAST({y1} AS DOUBLE) AS y1, CAST({x2} AS DOUBLE) AS x2,"
    f" CAST({y2} AS DOUBLE) AS y2"
    for pid, x1, y1, x2, y2 in _poly_edges()
)
_SQL_BBOX_PIP = " UNION ALL ".join(
    f"SELECT {pid} AS polygon_id, CAST({xmin} AS DOUBLE) AS xmin,"
    f" CAST({ymin} AS DOUBLE) AS ymin, CAST({xmax} AS DOUBLE) AS xmax,"
    f" CAST({ymax} AS DOUBLE) AS ymax, CAST({ne} AS INT) AS n_edges"
    for pid, xmin, ymin, xmax, ymax, ne in _poly_bboxes()
)


@register(
    "q_geo_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             ((c_custkey * {_AX}) % {_MOD}) / 1000.0 AS x,
             ((c_custkey * {_AY}) % {_MOD}) / 1000.0 AS y
      FROM customer
    ),
    bbox AS ({_SQL_BBOX_PIP}),
    edges AS ({_SQL_EDGES_PIP}),
    cand AS (
      SELECT p.id, p.x, p.y, b.polygon_id
      FROM pts p JOIN bbox b
        ON p.x >= b.xmin AND p.x <= b.xmax
       AND p.y >= b.ymin AND p.y <= b.ymax
    ),
    crossings AS (
      SELECT c.id, c.polygon_id,
             CAST(sum(CASE WHEN (e.y1 > c.y) <> (e.y2 > c.y)
                            AND c.x < (e.x2 - e.x1) * (c.y - e.y1)
                                      / (e.y2 - e.y1) + e.x1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
      FROM cand c JOIN edges e ON e.polygon_id = c.polygon_id
      GROUP BY c.id, c.polygon_id
    )
    SELECT b.polygon_id, b.n_edges,
           CAST(count(cr.id) AS BIGINT) AS n_bbox_candidates,
           CAST(sum(CASE WHEN cr.n_cross % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inside
    FROM bbox b LEFT JOIN crossings cr ON cr.polygon_id = b.polygon_id
    GROUP BY b.polygon_id, b.n_edges
    """,
)
def q_geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment counts by even-odd ray casting:
    every synthesized customer point tested against three audit
    polygons (one non-convex) — the geofencing / catchment-area
    operator class next to the radius join. A horizontal ray from the
    point crosses edge (x1,y1)-(x2,y2) iff the edge spans the point's
    y and the intersection lies right of the point; odd crossings =
    inside.

    Plan: the polygon set is a HANDFUL of literal rows — the bounding
    boxes broadcast-join onto the point scan first (the cheap lossless
    prefilter: containment implies bbox containment, so the per-edge
    work touches only bbox candidates), then the ≤|edges|-per-polygon
    expansion and two hash aggregates. Point volume enters through one
    scan; everything after the bbox join is candidate-sized.
    Determinism: coordinates are exact 0.001-grid doubles from integer
    hashes, the crossing test is one IEEE chain on identical inputs in
    both engines (boundary-exact points resolve identically by the
    shared strict-inequality convention), crossing counts are
    integers, parity is exact."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * _AX) % _MOD) / 1000.0).alias("x"),
        (((F.col("c_custkey") * _AY) % _MOD) / 1000.0).alias("y"),
    )
    spark_bbox = spark.createDataFrame(
        _poly_bboxes(),
        "polygon_id int, xmin double, ymin double, xmax double,"
        " ymax double, n_edges int",
    )
    spark_edges = spark.createDataFrame(
        _poly_edges(),
        "polygon_id int, x1 double, y1 double, x2 double, y2 double",
    )
    cand = pts.join(
        F.broadcast(spark_bbox),
        (F.col("x") >= F.col("xmin"))
        & (F.col("x") <= F.col("xmax"))
        & (F.col("y") >= F.col("ymin"))
        & (F.col("y") <= F.col("ymax")),
    ).select("id", "x", "y", "polygon_id")
    crossing = (
        F.col("y1") > F.col("y")
    ) != (F.col("y2") > F.col("y"))
    right_of = F.col("x") < (
        (F.col("x2") - F.col("x1"))
        * (F.col("y") - F.col("y1"))
        / (F.col("y2") - F.col("y1"))
        + F.col("x1")
    )
    crossings = (
        cand.join(F.broadcast(spark_edges), "polygon_id")
        .groupBy("id", "polygon_id")
        .agg(
            F.sum(F.when(crossing & right_of, 1).otherwise(0))
            .cast("bigint")
            .alias("n_cross")
        )
    )
    return (
        spark_bbox.select("polygon_id", "n_edges")
        .join(crossings, "polygon_id", "left")
        .groupBy("polygon_id", "n_edges")
        .agg(
            F.count("id").cast("bigint").alias("n_bbox_candidates"),
            F.sum(F.when(F.col("n_cross") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inside"),
        )
    )


@register(
    "q_join_skyline",
    oracle="""
    WITH per_size AS (
      SELECT p_size, min(p_retailprice) AS minp
      FROM part GROUP BY p_size
    ),
    thresh AS (
      SELECT s.p_size, s.minp,
             min(o.minp) AS min_larger
      FROM per_size s LEFT JOIN per_size o ON o.p_size > s.p_size
      GROUP BY s.p_size, s.minp
    )
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p JOIN thresh t ON p.p_size = t.p_size
    WHERE p.p_retailprice = t.minp
      AND (t.min_larger IS NULL OR p.p_retailprice < t.min_larger)
    """,
)
def q_join_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of the part catalog: parts not
    dominated on (maximize p_size, minimize p_retailprice) — a part
    survives iff no other part is at least as large AND at most as
    expensive with one strict — the classic "best tradeoff candidates"
    operator (cheapest part at every size level that beats everything
    larger). Ties on both axes co-survive.

    Plan: dominance NEVER becomes an all-pairs product — p_size has
    attribute-bounded cardinality (1..50 in TPC-H), so one hash
    aggregate collapses parts to the per-size minimum price, a
    |sizes|² self-join (≤2500 rows) derives each size's
    strictly-larger threshold, and the tiny threshold frame
    broadcast-joins back onto the part scan. This is the standard
    distributed skyline shape: block by one axis, reduce, sweep the
    bounded block frame. Determinism: min-price picks and comparisons
    on exact doubles; no float aggregation at all."""
    p = load_table(spark, sf_dir, "part")
    per_size = p.groupBy("p_size").agg(
        F.min("p_retailprice").alias("minp")
    )
    s, o = per_size.alias("s"), per_size.alias("o")
    thresh = (
        s.join(o, F.col("o.p_size") > F.col("s.p_size"), "left")
        .groupBy(F.col("s.p_size").alias("p_size"), F.col("s.minp").alias("minp"))
        .agg(F.min(F.col("o.minp")).alias("min_larger"))
    )
    return (
        p.join(F.broadcast(thresh), "p_size")
        .filter(
            (F.col("p_retailprice") == F.col("minp"))
            & (
                F.col("min_larger").isNull()
                | (F.col("p_retailprice") < F.col("min_larger"))
            )
        )
        .select("p_partkey", "p_size", "p_retailprice")
    )


# DBSCAN density threshold: a point is CORE when its eps-ball (eps =
# _RADIUS) holds >= _MINPTS points INCLUDING itself (the textbook 2D
# default minPts = 4).
_MINPTS = 4


@register(
    "q_geo_dbscan_core",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * {_AX}) % {_MOD} AS kx,
             (c_custkey * {_AY}) % {_MOD} AS ky
      FROM customer
    ),
    nbr AS (
      SELECT a.id,
             CAST(count(b.id) AS BIGINT) AS nbrs
      FROM pts a LEFT JOIN pts b
        ON a.id <> b.id
       AND (a.kx / 1000.0 - b.kx / 1000.0)
           * (a.kx / 1000.0 - b.kx / 1000.0)
           + (a.ky / 1000.0 - b.ky / 1000.0)
             * (a.ky / 1000.0 - b.ky / 1000.0)
           <= {_RADIUS} * {_RADIUS}
      GROUP BY a.id
    )
    SELECT nbrs AS n_neighbors,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(CASE WHEN nbrs + 1 >= {_MINPTS} THEN 1 ELSE 0 END
                AS INTEGER) AS is_core
    FROM nbr GROUP BY nbrs
    """,
)
def q_geo_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core-point census on the synthesized customer plane: the
    histogram of eps-neighbor counts (eps = the q_geo_radius_join
    radius) with each bin marked core/non-core under minPts = 4
    (ball population INCLUDING the point itself — the textbook
    convention). This is the density-classification half of DBSCAN —
    the expensive step at scale; the cluster-expansion half is
    connected components over core-core edges (the
    q_llm_dedup_clusters machinery).

    Plan: the lossless 3×3 cell-blocked self-join (cell width == eps,
    the q_geo_radius_join class — candidates per point stay O(density·
    eps²), never all-pairs), counting BOTH directions of each pair by
    keying on the A side; zero-neighbor points survive via the
    left join back to the point set; the histogram is a ≤max-degree
    aggregate. The ORACLE uses the quadratic all-pairs plan — the
    blocked plan must agree exactly. Determinism: coordinates are
    exact k/1000.0 IEEE grid doubles shared by both engines; the
    distance predicate is two products + one sum on identical doubles;
    every output is an exact integer — no rounding anywhere."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * _AX) % _MOD).alias("kx"),
        ((F.col("c_custkey") * _AY) % _MOD).alias("ky"),
    )
    pts = c.select(
        "id",
        "kx",
        "ky",
        F.floor(F.col("kx") / _CELL).cast("long").alias("cx"),
        F.floor(F.col("ky") / _CELL).cast("long").alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("kx").alias("kx_a"),
        F.col("ky").alias("ky_a"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "kx_a",
        "ky_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("kx").alias("kx_b"),
        F.col("ky").alias("ky_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("kx_a") / 1000.0 - F.col("kx_b") / 1000.0
    dy = F.col("ky_a") / 1000.0 - F.col("ky_b") / 1000.0
    deg = (
        a.join(b, ["jx", "jy"])
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(dx * dx + dy * dy <= F.lit(_RADIUS * _RADIUS))
        .groupBy("id_a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nbrs"))
    )
    cnt = pts.select("id").join(
        deg, pts["id"] == deg["id_a"], "left"
    ).select(F.coalesce(F.col("nbrs"), F.lit(0)).cast("bigint").alias("nbrs"))
    return cnt.groupBy(F.col("nbrs").alias("n_neighbors")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.max(
            F.when(F.col("nbrs") + 1 >= _MINPTS, 1).otherwise(0)
        )
        .cast("int")
        .alias("is_core"),
    )



# Voronoi catchment sites: a fixed literal set of 8 depot/store points
# on the same [0, 1e6) integer grid as the synthesized customer
# points — shared verbatim with the oracle text.
_SITES = tuple(
    (i, (i * 2654435761 + 97531) % 1_000_000, (i * 40503 + 13579) % 1_000_000)
    for i in range(8)
)
_SQL_SITES = ", ".join(f"({i}, {sx}, {sy})" for i, sx, sy in _SITES)


@register(
    "q_geo_voronoi_catchment",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * {_AX}) % {_MOD} AS kx,
             (c_custkey * {_AY}) % {_MOD} AS ky
      FROM customer
    ),
    sites(site_id, sx, sy) AS (VALUES {_SQL_SITES}),
    cand AS (
      SELECT id, site_id,
             (kx - sx) * (kx - sx) + (ky - sy) * (ky - sy) AS d2
      FROM pts CROSS JOIN sites
    ),
    md AS (SELECT id, min(d2) AS mind FROM cand GROUP BY id),
    asg AS (
      SELECT c.id, CAST(min(c.site_id) AS BIGINT) AS site_id,
             CAST(min(c.d2) AS BIGINT) AS d2
      FROM cand c JOIN md m ON m.id = c.id AND c.d2 = m.mind
      GROUP BY c.id
    )
    SELECT site_id,
           CAST(count(*) AS BIGINT) AS n_pts,
           CAST(max(d2) AS BIGINT) AS max_dist2,
           floor(CAST(sum(CAST(floor(sqrt(CAST(d2 AS DOUBLE))
                                     * 1000000.0 + 0.5) / 1000000.0
                               AS DECIMAL(38,6))) AS DOUBLE)
                 / count(*) * 1000000.0 + 0.5) / 1000000.0 AS mean_dist
    FROM asg GROUP BY site_id
    """,
)
def q_geo_voronoi_catchment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voronoi catchment assignment: every customer point goes to its
    nearest of 8 fixed depot sites (exact squared-distance argmin,
    site-id tie-break), and each site reports its catchment size, the
    farthest assigned point, and the mean assignment distance — the
    store-catchment / fulfillment-coverage readout next to the
    radius-join and grid-density shapes.

    Plan: the site set is a literal broadcast (|sites| rows), so the
    assignment is one map-side crossJoin + a per-point min aggregate —
    no point-to-point pairs anywhere, linear at any scale. Spark's
    argmin is min(struct(d2, site_id)) — lexicographically identical
    to the oracle's two-step min(d2)-then-min(site_id). Determinism:
    squared distances are exact int64; sqrt is IEEE correctly rounded
    and e6-rounded per row before the exact decimal sum (the module's
    one-libm-call discipline)."""
    from ex_hivent_spark.functions.decimals import dround

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * _AX) % _MOD).alias("kx"),
        ((F.col("c_custkey") * _AY) % _MOD).alias("ky"),
    )
    sites = spark.createDataFrame(
        list(_SITES), "site_id bigint, sx bigint, sy bigint"
    )
    d2 = (F.col("kx") - F.col("sx")) * (F.col("kx") - F.col("sx")) + (
        F.col("ky") - F.col("sy")
    ) * (F.col("ky") - F.col("sy"))
    cand = pts.crossJoin(F.broadcast(sites)).select(
        "id", "site_id", d2.alias("d2")
    )
    asg = (
        cand.groupBy("id")
        .agg(F.min(F.struct("d2", "site_id")).alias("b"))
        .select(
            F.col("b.site_id").cast("bigint").alias("site_id"),
            F.col("b.d2").cast("bigint").alias("d2"),
        )
    )
    return asg.groupBy("site_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pts"),
        F.max("d2").cast("bigint").alias("max_dist2"),
        dround(
            F.sum(
                dround(F.sqrt(F.col("d2").cast("double")), 6).cast(
                    "decimal(38,6)"
                )
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_dist"),
    )
