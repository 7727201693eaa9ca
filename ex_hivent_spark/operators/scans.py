"""Scans, projections, filters, and envelope-projection queries.

Reference grounding (hivent/ex-hivent):
- full scan ≙ ``Memory.all`` (lib/support/memory.ex:118)
- topic subscription filter ≙ consumer channel join (lib/hivent/consumer.ex:105)
- envelope enrichment ≙ ``Emitter.build_message``/``meta_data``
  (lib/hivent/emitter.ex:70-85) + server-side uuid/created_at/cid defaults
  (test/support/channel_client.ex:146-154)
- partition-by-key ≙ emitter ``key`` option (lib/hivent/emitter.ex:53) with
  ``partition_count`` (config/config.exs:8, default 4)
- exists/subset check ≙ ``Memory.include?`` (lib/support/memory.ex:139-141)

All plans are declarative DataFrame chains: Catalyst pushes the filters
and projections into the parquet scan (verify with
``.explain()`` → ``PushedFilters``/``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.plans.registry import register

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@register(
    "q_scan_events",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def q_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of the events table in stable column order (Memory.all)."""
    return load_table(spark, sf_dir, "events").select(*EVENT_COLS)


@register(
    "q_scan_projection",
    oracle="SELECT event_id, ts, event_type FROM events",
)
def q_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: only 3 of 6 columns reach the scan (ReadSchema)."""
    return load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")


@register(
    "q_source_json_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM events
    """,
)
def q_source_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read of the dynamic JSON payload (event.ex:33): extract
    ``props.k`` as int. Uses ``get_json_object`` (JVM-side, codegen)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@register(
    "q_filter_topic",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_filter_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic subscription as a filter: events of one name/type
    (consumer.ex:105 joins channel "event:<topic>")."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(*EVENT_COLS)
    )


@register(
    "q_filter_compound",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE value > 50
      AND event_type IN ('purchase', 'view')
      AND ts >= TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: numeric + IN-list + timestamp range."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(
        (F.col("value") > 50)
        & F.col("event_type").isin("purchase", "view")
        & (F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "q_filter_null_like",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority LIKE '1-%'
      AND o_orderstatus IS NOT NULL
      AND o_orderstatus <> 'P'
    """,
)
def q_filter_null_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-prefix + null-safe status filter on orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").like("1-%")
        & F.col("o_orderstatus").isNotNull()
        & (F.col("o_orderstatus") != "P")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "q_project_enrich",
    oracle="""
    SELECT event_id,
           'spark_engine' AS producer,
           coalesce(json_extract_string(props, '$.cid'),
                    'cid-' || CAST(event_id AS VARCHAR)) AS cid,
           CAST(user_id AS VARCHAR) AS partition_key,
           user_id % 4 AS partition_id
    FROM events
    """,
)
def q_project_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope enrichment (emitter.ex:70-85): stamp producer, default the
    correlation id, derive the partition key and a deterministic partition
    assignment with ``partition_count=4`` (config/config.exs:8).

    On a stream this is the map-side of ``repartition(n, key)`` — the
    expression is pure projection, no shuffle by itself.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.lit("spark_engine").alias("producer"),
        F.coalesce(
            F.get_json_object("props", "$.cid"),
            F.concat(F.lit("cid-"), F.col("event_id").cast("string")),
        ).alias("cid"),
        F.col("user_id").cast("string").alias("partition_key"),
        F.pmod(F.col("user_id"), F.lit(4)).alias("partition_id"),
    )


@register(
    "q_include_subset",
    oracle="""
    SELECT count(*) AS n_matching, count(*) > 0 AS found
    FROM events WHERE event_type = 'signup' AND value > 100
    """,
)
def q_include_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Memory.include?`` as a query (memory.ex:139-141): existence of an
    event matching a conjunctive subset predicate. The reference's payload
    arm is vacuous (unpinned match, memory.ex:68); we implement real
    matching — documented deviation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter((F.col("event_type") == "signup") & (F.col("value") > 100))
        .agg(F.count(F.lit(1)).alias("n_matching"))
        .select("n_matching", (F.col("n_matching") > 0).alias("found"))
    )
