"""CBO-lite planning advisor over ``analyze_table`` stats manifests.

Spark's own cost-based decisions (broadcast selection, AQE coalescing)
read catalog statistics that a metastore normally supplies. This module
closes the loop for the engine's file-based tables: the ``_STATS.json``
manifests written by :func:`ex_hivent_spark.maintenance.analyze_table`
feed the same three decisions a human (or the session builder) makes
before launching a 100 TB job — how many shuffle partitions, which join
sides to broadcast, and roughly how large a join output will be.

Everything below is arithmetic over a dict read from a few-KB manifest:
no Spark session needed, so it can run in a launcher before the first
job is submitted. The one exception is :func:`stats_broadcast`, the
builder-facing bridge: query builders route their dimension inputs
through it so that, when a table HAS been ANALYZEd, the manifest —
not a hardcoded assumption — decides whether the side is broadcast or
explicitly forced to a shuffle join (a "dimension" that grew past the
broadcast regime would otherwise OOM the driver at 100 TB).
"""

from __future__ import annotations

import math

MB = 1024 * 1024


def suggest_shuffle_partitions(
    stats: dict,
    target_partition_mb: int = 128,
    min_partitions: int = 1,
    max_partitions: int = 200_000,
) -> int:
    """Shuffle-partition count so post-shuffle partitions land near the
    target size (the spill-avoidance rule of thumb: partitions must fit
    comfortably in executor memory). Parquet bytes are compressed ~2-4x
    vs in-memory rows; the compressed size is still the right sizing
    basis because shuffle files are compressed too."""
    n = math.ceil(stats["total_bytes"] / (target_partition_mb * MB))
    return max(min_partitions, min(max_partitions, n))


def is_broadcastable(stats: dict, threshold_mb: int = 32) -> bool:
    """Whether a table fits Spark's broadcast regime (driver collects +
    every executor holds a copy). The default mirrors a production
    ``spark.sql.autoBroadcastJoinThreshold`` bumped for dimension
    tables; pass your own threshold for memory-tight clusters."""
    return stats["total_bytes"] <= threshold_mb * MB


def estimate_join_rows(
    stats_a: dict, stats_b: dict, key_a: str, key_b: str
) -> int:
    """Classic CBO equi-join cardinality estimate:
    ``|A| * |B| / max(ndv(A.key), ndv(B.key))`` — exact under the
    uniform-frequency / containment assumptions every textbook
    optimizer starts from. Used to decide whether a join output will
    explode (many-to-many on a low-ndv key) before running it."""
    ndv_a = max(1, stats_a["columns"][key_a]["approx_ndv"])
    ndv_b = max(1, stats_b["columns"][key_b]["approx_ndv"])
    return int(stats_a["n_rows"] * stats_b["n_rows"] / max(ndv_a, ndv_b))


def stats_broadcast(
    spark,
    sf_dir: str,
    table: str,
    df=None,
    default_broadcast: bool = True,
    threshold_mb: int = 32,
):
    """Stats-informed broadcast decision for a join input.

    - table ANALYZEd (``_STATS.json`` present) and under the broadcast
      threshold → ``broadcast(df)``;
    - ANALYZEd and TOO BIG → ``df.hint("shuffle_hash")`` (an explicit
      do-not-broadcast: Spark's own size estimate can undercount a
      compressed/partitioned table and broadcast something that OOMs
      the driver — the manifest's byte count is ground truth);
    - never analyzed → the caller's static default (dims broadcast),
      which is also the driver-harness path where no manifests exist.
    """
    from pyspark.sql import functions as F

    from ex_hivent_spark.catalog import load_table
    from ex_hivent_spark.maintenance import read_table_stats

    if df is None:
        df = load_table(spark, sf_dir, table)
    stats = read_table_stats(spark, f"{sf_dir}/{table}.parquet")
    if stats is None:
        return F.broadcast(df) if default_broadcast else df
    if is_broadcastable(stats, threshold_mb):
        return F.broadcast(df)
    return df.hint("shuffle_hash")


def suggest_join_strategy(
    stats_a: dict,
    stats_b: dict,
    key_a: str,
    key_b: str,
    broadcast_threshold_mb: int = 32,
) -> dict:
    """Join-planning advice for A ⋈ B on (key_a = key_b): which side to
    broadcast (smaller side, if it fits), the estimated output rows,
    and a skew warning when one side's key ndv is so low relative to
    its row count that AQE skew splitting (or explicit salting,
    operators/skew.py) should be enabled."""
    a_b, b_b = stats_a["total_bytes"], stats_b["total_bytes"]
    small, small_stats = ("a", stats_a) if a_b <= b_b else ("b", stats_b)
    broadcast = (
        small if is_broadcastable(small_stats, broadcast_threshold_mb) else None
    )
    est = estimate_join_rows(stats_a, stats_b, key_a, key_b)
    # rows-per-key above this ratio means the hottest keys dominate
    # partitions: flag for AQE skew join / salting.
    def rows_per_key(stats, key):
        return stats["n_rows"] / max(1, stats["columns"][key]["approx_ndv"])

    skew_risk = max(
        rows_per_key(stats_a, key_a), rows_per_key(stats_b, key_b)
    ) > 10_000
    return {
        "broadcast_side": broadcast,
        "estimated_rows": est,
        "skew_risk": skew_risk,
        "shuffle_partitions": max(
            suggest_shuffle_partitions(stats_a),
            suggest_shuffle_partitions(stats_b),
        ),
    }


def dim_retain_fraction(dim: dict) -> float:
    """Fraction of FACT rows an FK join against this (possibly
    filtered) dimension retains, under the textbook uniform/containment
    assumptions: the fact's key values spread uniformly over the dim
    key domain, so keeping ``filtered_rows`` of ``ndv(key)`` distinct
    keys keeps that fraction of fact rows. ``dim`` needs ``stats``,
    ``key``, and optionally ``filtered_rows`` (defaults to the full
    table — retain 1.0 for a complete unique-key dimension)."""
    ndv = max(1, dim["stats"]["columns"][dim["key"]]["approx_ndv"])
    filtered = dim.get("filtered_rows", dim["stats"]["n_rows"])
    return min(1.0, filtered / ndv)


def order_dimensions(dims: list[dict]) -> list[dict]:
    """Greedy selectivity-first ordering for star joins whose
    dimensions attach INDEPENDENTLY to the fact table (commuting
    joins): apply the most row-reducing dimension first so every later
    probe sees the smallest possible intermediate — the classic greedy
    heuristic that is optimal for independent selections. Ties break
    toward the smaller table (cheaper hash build), then name
    (determinism). Chained snowflake joins (dim keyed off a previous
    dim, e.g. lineitem→orders→customer) do NOT commute and must keep
    their dependency order — this helper is for the flat-star case."""
    return sorted(
        dims,
        key=lambda d: (
            dim_retain_fraction(d),
            d["stats"]["total_bytes"],
            d["name"],
        ),
    )


def plan_star_join(
    fact_stats: dict,
    dims: list[dict],
    broadcast_threshold_mb: int = 32,
) -> dict:
    """Full advisory plan for fact ⋈ dim₁ ⋈ … ⋈ dimₙ (independent
    FK dims): the greedy join order, the estimated fact-row count
    after each step, per-dim broadcast decisions from the manifests,
    and the shuffle-partition suggestion for the surviving fact flow.
    Pure manifest arithmetic — runs in a launcher before any job."""
    ordered = order_dimensions(dims)
    est = float(fact_stats["n_rows"])
    steps = []
    for d in ordered:
        est *= dim_retain_fraction(d)
        steps.append(
            {
                "dim": d["name"],
                "estimated_fact_rows": int(est),
                "broadcast": is_broadcastable(
                    d["stats"], broadcast_threshold_mb
                ),
            }
        )
    return {
        "order": [d["name"] for d in ordered],
        "steps": steps,
        "shuffle_partitions": suggest_shuffle_partitions(fact_stats),
    }
