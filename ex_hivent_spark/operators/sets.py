"""Set operations, exact dedup, sorts/limits/top-k.

Reference grounding: ``Memory.last`` (memory.ex:123) ≙ ORDER BY ... DESC
LIMIT 1; event identity/dedup by ``meta.uuid`` (memory.ex:90).

Scale notes: `orderBy().limit(k)` compiles to TakeOrderedAndProject —
each partition keeps a k-heap, only k·partitions rows reach the driver
stage. Set ops are shuffle-distinct; exact dedup keeps a deterministic
winner via row_number so the oracle can reproduce it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.plans.registry import register


@register(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with limit (TakeOrderedAndProject; the trailing
    unique key makes the top-100 set deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(),
                 F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "q_last_event",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
)
def q_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Memory.last`` (memory.ex:123): the most recent event."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
    )


@register(
    "q_set_union",
    oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
    UNION
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'error'
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union of two topic streams."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    signup = e.filter(F.col("event_type") == "signup")
    error = e.filter(F.col("event_type") == "error")
    return signup.union(error).distinct()


@register(
    "q_set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both purchased and viewed."""
    e = load_table(spark, sf_dir, "events")
    purchased = e.filter(F.col("event_type") == "purchase").select("user_id")
    viewed = e.filter(F.col("event_type") == "view").select("user_id")
    return purchased.intersect(viewed)


@register(
    "q_set_except",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS day
    FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id, CAST(ts AS DATE)
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) pairs with a view but no purchase that day — the
    browsed-without-buying day list. The r12 vacuous-op audit found
    the old USER-grain EXCEPT was empty at every SF (this generator's
    users all eventually do every event type), so the hash check was
    schema-only; the (user, day) grain is non-empty AND non-total at
    every SF (~64% of view-days). Changed output → fronted in the
    r13 rotation for a fresh driver check."""
    e = load_table(spark, sf_dir, "events")
    viewed = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    purchased = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    return viewed.subtract(purchased)


@register(
    "q_dedup_exact",
    oracle="""
    SELECT user_id, event_type, value, event_id AS kept_event_id
    FROM (
      SELECT user_id, event_type, value, event_id,
             row_number() OVER (PARTITION BY user_id, event_type, value
                                ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication by (user_id, event_type, value), keeping the
    smallest event_id — the deterministic twin of ``dropDuplicates``
    (reference identity: meta.uuid, memory.ex:90)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type", "value").orderBy("event_id")
    return (
        e.select("user_id", "event_type", "value", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "value",
                F.col("event_id").alias("kept_event_id"))
    )


@register(
    "q_set_multiset_ops",
    oracle="""
    WITH a AS (SELECT event_type FROM events WHERE value > 100),
         b AS (SELECT event_type FROM events WHERE user_id % 2 = 0)
    SELECT 'intersect_all' AS op, event_type, count(*) AS n
    FROM (SELECT event_type FROM a INTERSECT ALL SELECT event_type FROM b)
    GROUP BY event_type
    UNION ALL
    SELECT 'except_all' AS op, event_type, count(*) AS n
    FROM (SELECT event_type FROM a EXCEPT ALL SELECT event_type FROM b)
    GROUP BY event_type
    """,
)
def q_set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) semantics: INTERSECT ALL / EXCEPT ALL preserve
    duplicate counts — min(m,n) and max(m-n,0) per value respectively —
    unlike their distinct-izing set twins (q_set_intersect/except).
    Summarized as counts per type so the bag cardinalities are the
    hash-checked signal."""
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("value") > 100).select("event_type")
    b = e.filter(F.col("user_id") % 2 == 0).select("event_type")
    ia = (
        a.intersectAll(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    ea = (
        a.exceptAll(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return ia.unionByName(ea).select("op", "event_type", "n")


@register(
    "q_set_relational_division",
    oracle="""
    WITH t AS (SELECT count(DISTINCT event_type) AS n_all FROM events)
    SELECT user_id,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    HAVING count(DISTINCT event_type) = (SELECT n_all FROM t)
    """,
)
def q_set_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIONAL DIVISION — the classic 'suppliers who supply ALL
    parts' query shape: users whose event-type set covers every type
    present in the corpus (the universal-quantifier predicate SQL has
    no operator for). Implemented as the standard count-matching
    rewrite: per-user distinct-type count equals the global distinct
    count, the divisor arriving as a one-row broadcast scalar.

    Plan: one distinct aggregate per side; the HAVING comparison is an
    integer equality. No per-user set materialization — at 100 TB both
    sides are partial-aggregating distinct counts."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    total = e.select(
        F.countDistinct("event_type").alias("n_all")
    ).withColumn("j", F.lit(1))
    per_user = (
        e.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_types"))
        .withColumn("j", F.lit(1))
    )
    return (
        per_user.join(F.broadcast(total), "j")
        .filter(F.col("n_types") == F.col("n_all"))
        .select("user_id", "n_types")
    )


_MERGE_SPAN_DAYS = 30  # each order opens a 30-day activity window


@register(
    "q_set_interval_merge",
    oracle=f"""
    WITH iv AS (
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + {_MERGE_SPAN_DAYS} AS e
      FROM orders
    ),
    marked AS (
      SELECT o_custkey, o_orderkey, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY o_custkey
                                        ORDER BY s, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                  OR max(e) OVER (PARTITION BY o_custkey
                                  ORDER BY s, o_orderkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    grp AS (
      SELECT o_custkey, s, e,
             sum(new_island) OVER (PARTITION BY o_custkey
                                   ORDER BY s, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS island
      FROM marked
    )
    SELECT o_custkey, CAST(island AS BIGINT) AS island_seq,
           min(s) AS island_start, max(e) AS island_end,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM grp GROUP BY o_custkey, island
    """,
)
def q_set_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (gaps-and-islands): each order opens a 30-day
    activity window; overlapping/touching windows per customer merge
    into contiguous activity ISLANDS — the canonical sessionize-over-
    intervals operator (uptime stitching, policy-coverage merging,
    subscription episode building). Output: one row per island with
    its span and order count.

    Plan: the classic two-window formulation — a running high-water
    end (exclusive frame) marks island breaks, a running sum of breaks
    numbers them, one hash aggregate closes — both windows partition
    by customer (per-partition rows bounded by orders-per-customer,
    never a global sort) and SHARE the (s, tiebreak) sort order.
    Determinism: pure date/integer arithmetic; ties are broken by
    o_orderkey; identical windows on both engines. At 100 TB this is
    one shuffle on o_custkey plus per-group linear work."""
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), _MERGE_SPAN_DAYS).alias(
            "e"
        ),
    )
    prev_hi = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    hw = F.max("e").over(prev_hi)
    marked = iv.select(
        "o_custkey",
        "o_orderkey",
        "s",
        "e",
        F.when(hw.isNull() | (F.col("s") > hw), 1).otherwise(0).alias(
            "new_island"
        ),
    )
    # the island-numbering window must share marked's TOTAL order
    # (s, o_orderkey): with (s, e) alone, same-day orders tie and a
    # break flag landing inside the tie would number nondeterministically
    run = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = marked.select(
        "o_custkey",
        "s",
        "e",
        F.sum("new_island").over(run).alias("island"),
    )
    return grp.groupBy(
        "o_custkey", F.col("island").cast("bigint").alias("island_seq")
    ).agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
