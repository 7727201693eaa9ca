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
