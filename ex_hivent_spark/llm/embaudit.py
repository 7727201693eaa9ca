"""Embedding-stability audits: the per-label CENTROID SHIFT between
the corpus's two id-parity halves — the "did the embedding space move
between two snapshots / producers" readout (cosine ≈ 1 and small L2
shift per label say the two halves agree; a drifting encoder or a
contaminated batch shows up as a label whose halves disagree). The
split-half design needs no second corpus: id parity is a
deterministic 50/50 assignment of the SAME table, so the statistic is
a null-calibrated baseline for real snapshot-vs-snapshot runs.

Plan discipline: vectors collapse to per-(label, half, dim) centroid
accumulators in ONE posexplode + hash aggregate (map-side combined —
the shuffle carries |labels|·2·64 accumulator rows, never vectors);
the half-vs-half comparison is a dim-keyed join of two
64-row-per-label frames. No windows, no collects.

Determinism: float32 lanes widen to float64 identically; centroid
sums ride the decimal detour; each centroid coordinate is e6-rounded
BEFORE the cross/square products (exact 1e-12-grid values summed at
decimal(38,12)); closing sqrt/ratios are e6-rounded.

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no embedding surface; this
derives from the driver's analytics mandate and standard
embedding-drift monitoring practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register


@register(
    "q_emb_centroid_shift",
    oracle=f"""
    WITH x AS (
      SELECT label, vec_id % 2 AS half, i - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    cent AS (
      SELECT label, half, dim,
             CAST(count(*) AS BIGINT) AS n,
             {sql_dround(
                 "CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE)"
                 " / count(*)", 6,
             )} AS c
      FROM x GROUP BY label, half, dim
    ),
    j AS (
      SELECT e.label, e.dim, e.c AS ce, o.c AS co,
             e.n AS ne, o.n AS no
      FROM (SELECT * FROM cent WHERE half = 0) e
      JOIN (SELECT * FROM cent WHERE half = 1) o
        ON e.label = o.label AND e.dim = o.dim
    ),
    agg AS (
      SELECT label,
             CAST(max(ne) AS BIGINT) AS n_even,
             CAST(max(no) AS BIGINT) AS n_odd,
             CAST(sum(CAST((ce - co) * (ce - co) AS DECIMAL(38,12)))
                  AS DOUBLE) AS ss_diff,
             CAST(sum(CAST(ce * co AS DECIMAL(38,12))) AS DOUBLE) AS dot,
             CAST(sum(CAST(ce * ce AS DECIMAL(38,12))) AS DOUBLE) AS ne2,
             CAST(sum(CAST(co * co AS DECIMAL(38,12))) AS DOUBLE) AS no2
      FROM j GROUP BY label
    )
    SELECT label, n_even, n_odd,
           {sql_dround("sqrt(ss_diff)", 6)} AS l2_shift,
           {sql_dround("dot / sqrt(ne2 * no2)", 6)} AS centroid_cos
    FROM agg
    """,
)
def q_emb_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid agreement between the two vec_id-parity
    halves of the embedding corpus: the L2 distance and cosine between
    each label's even-half and odd-half centroids, plus both half
    sizes. The split-half null baseline for embedding-drift
    monitoring — on a healthy static corpus cosine ≈ 1; re-pointing
    one half at a new encoder snapshot turns this into the actual
    drift test with the same plan.

    Plan: one posexplode + hash aggregate to per-(label, half, dim)
    accumulators (map-side combined; the shuffle carries
    |labels|·2·64 rows, never vectors), then a (label, dim)-keyed
    join of the two half frames and a per-label closing aggregate.
    Determinism: centroid coordinates are decimal-sum/count doubles
    e6-rounded BEFORE differencing/products, so every summed term
    lies on the exact 1e-12 grid (decimal(38,12)); closing sqrt and
    cosine are e6-rounded. Labels are balanced across parities at
    every SF, so the inner join never drops a label."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "v32"),
    ).select(
        "label",
        "half",
        F.col("dim").cast("bigint").alias("dim"),
        F.col("v32").cast("double").alias("v"),
    )
    cent = x.groupBy("label", "half", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dround(
            F.sum(F.col("v").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("c"),
    )
    ev = cent.filter(F.col("half") == 0).select(
        "label",
        "dim",
        F.col("c").alias("ce"),
        F.col("n").alias("ne"),
    )
    od = cent.filter(F.col("half") == 1).select(
        "label",
        "dim",
        F.col("c").alias("co"),
        F.col("n").alias("no"),
    )
    j = ev.join(od, ["label", "dim"])
    diff = F.col("ce") - F.col("co")
    agg = j.groupBy("label").agg(
        F.max("ne").cast("bigint").alias("n_even"),
        F.max("no").cast("bigint").alias("n_odd"),
        F.sum((diff * diff).cast("decimal(38,12)"))
        .cast("double")
        .alias("ss_diff"),
        F.sum((F.col("ce") * F.col("co")).cast("decimal(38,12)"))
        .cast("double")
        .alias("dot"),
        F.sum((F.col("ce") * F.col("ce")).cast("decimal(38,12)"))
        .cast("double")
        .alias("ne2"),
        F.sum((F.col("co") * F.col("co")).cast("decimal(38,12)"))
        .cast("double")
        .alias("no2"),
    )
    return agg.select(
        "label",
        "n_even",
        "n_odd",
        dround(F.sqrt(F.col("ss_diff")), 6).alias("l2_shift"),
        dround(
            F.col("dot") / F.sqrt(F.col("ne2") * F.col("no2")), 6
        ).alias("centroid_cos"),
    )
