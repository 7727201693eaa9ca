"""Aggregation operators: hash aggregates, distinct/approx-distinct,
rollup/cube/grouping-sets, having.

Reference grounding: the reference counts distinct event identity by
``meta.uuid`` (consumer.ex:73, memory.ex:90); everything else is the
driver-mandated batch surface.

Scale notes: all groupBys here are partial-aggregated map-side by Spark
(hash agg with merge), so shuffle volume is |groups|, not |rows|. Float
sums go through the decimal trick (functions/decimals.py) for
order-insensitive determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, register_views, spread_table
from ex_hivent_spark.functions.decimals import (
    davg,
    dround,
    dsum,
    sql_davg,
    sql_dround,
    sql_dsum,
)
from ex_hivent_spark.plans.registry import register


@register(
    "q_agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the flagship batch spine
    (scan → pushed filter → project → partial+final hash agg).
    r16: spread_table — the single-row-group testdata scan ran the
    7-aggregate partial phase (decimal products included) in ONE task;
    hash-spreading on l_orderkey parallelizes the map side (decimal
    sums are order-insensitive, oracle-verified). No-op on real
    multi-split inputs."""
    l = spread_table(spark, sf_dir, "lineitem", "l_orderkey")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (identity ≙ meta.uuid
    dedup, memory.ex:90). Spark expands this to a two-phase agg."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type — the
    scale path for count-distinct (constant memory per group, one pass,
    merge-able sketches). The raw estimate is engine-specific, so the
    oracled contract is the sketch's actual GUARANTEE: the estimate
    lands within 5% of the exact count (rsd=0.02 ⟹ ±2σ ≈ 4%). The
    query emits the exact count plus an in-bound boolean; the oracle
    asserts the same exact count and literal TRUE — making the sketch's
    accuracy, not its internals, the hash-checked surface. Spark's HLL
    hash is deterministic, so the boolean is stable run-to-run."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("approx") - F.col("n_exact"))
                <= F.col("n_exact") * F.lit(0.05)
            ).alias("approx_ok"),
        )
    )


@register(
    "q_agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum("o_totalprice", "revenue")},
           count(*) AS n_orders,
           GROUPING(r_name, n_name) AS gid
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (region, nation) with rollup subtotals + grand total;
    ``grouping_id`` distinguishes subtotal levels."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            dsum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@register(
    "q_agg_cube",
    oracle=f"""
    SELECT event_type,
           CASE WHEN value < 50 THEN 'low'
                WHEN value < 200 THEN 'mid'
                ELSE 'high' END AS value_bucket,
           count(*) AS n_events,
           {sql_dsum("value", "sum_value")}
    FROM events
    GROUP BY CUBE (event_type,
                   CASE WHEN value < 50 THEN 'low'
                        WHEN value < 200 THEN 'mid'
                        ELSE 'high' END)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts/sums by (event_type, value bucket) over the full cube."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "value_bucket",
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high"),
    )
    return e.cube("event_type", "value_bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )


@register(
    "q_agg_grouping_sets",
    oracle=f"""
    SELECT r_name, n_name, count(*) AS n_customers,
           {sql_dsum("c_acctbal", "sum_acctbal")}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (spark.sql passthrough —
    the engine registers the catalog as temp views)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT r_name, n_name, count(*) AS n_customers,
               {sql_dsum("c_acctbal", "sum_acctbal")}
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


@register(
    "q_agg_having",
    oracle=f"""
    SELECT * FROM (
      SELECT event_type,
             {sql_davg("value", "avg_value")},
             count(*) AS n_events
      FROM events GROUP BY event_type
    ) WHERE n_events > 10 AND avg_value > 50
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + post-aggregation filter (HAVING). Threshold 50 sits
    INSIDE the per-type mean distribution (means cluster 48-52 on this
    generator), so the filter passes some-but-not-all groups at every
    SF — the r12 vacuous-op audit found the old >90 threshold could
    never fire (every SF returned zero rows, so the hash check was
    schema-only). Changed output → fronted in the r13 rotation for a
    fresh driver check (the r8 rewritten-op precedent)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(davg("value", "avg_value"), F.count(F.lit(1)).alias("n_events"))
        .filter((F.col("n_events") > 10) & (F.col("avg_value") > 50))
    )


@register(
    "q_agg_mode_deterministic",
    oracle="""
    WITH freq AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    ranked AS (
      SELECT user_id, event_type, c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY c DESC, event_type) AS rn
      FROM freq
    )
    SELECT user_id, event_type AS modal_type, c AS modal_count
    FROM ranked WHERE rn = 1
    """,
)
def q_agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-user modal event type. Native mode() breaks
    ties arbitrarily on BOTH engines — unusable under a value-hash gate
    — so the mode is an argmax over (count desc, type asc):
    min(struct(-c, type)) — one count aggregate + one min(struct)
    aggregate, both partial-aggregated map-side, no per-group sort
    (the oracle spells the same order as a window rank)."""
    e = load_table(spark, sf_dir, "events")
    freq = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    best = freq.groupBy("user_id").agg(
        F.min(
            F.struct(
                (-F.col("c")).alias("neg_c"),
                F.col("event_type"),
                F.col("c"),
            )
        ).alias("b")
    )
    return best.select(
        "user_id",
        F.col("b.event_type").alias("modal_type"),
        F.col("b.c").alias("modal_count"),
    )


@register(
    "q_agg_string_concat",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities,
           count(*) AS n_orders
    FROM orders
    WHERE o_orderstatus = 'P'
    GROUP BY o_custkey
    """,
)
def q_agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): per-customer pipe-joined
    order priorities. collect_list order is partition-dependent, so the
    list is array_sort'ed before joining — the only way string_agg can
    survive an exact hash check on a distributed engine."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("o_orderpriority")), "|"
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_agg_time_grain_rollup",
    oracle=f"""
    SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket_start,
           count(*) AS n_events, {sql_dsum("value", "sum_value")}
    FROM events GROUP BY date_trunc('hour', ts)
    UNION ALL
    SELECT 'day' AS grain, date_trunc('day', ts) AS bucket_start,
           count(*) AS n_events, {sql_dsum("value", "sum_value")}
    FROM events GROUP BY date_trunc('day', ts)
    """,
)
def q_agg_time_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same measure
    maintained at multiple time grains (hour + day) with a grain label.
    Implemented as GROUPING SETS over pre-computed truncations — ONE
    scan and one Expand feeding a single hash aggregate, instead of a
    UNION ALL of per-grain scans (what the oracle spells out)."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        "value",
    )
    e.createOrReplaceTempView("ev_grains")
    return spark.sql(
        f"""
        SELECT CASE WHEN d IS NULL THEN 'hour' ELSE 'day' END AS grain,
               coalesce(h, d) AS bucket_start,
               count(*) AS n_events,
               {sql_dsum("value", "sum_value")}
        FROM ev_grains
        GROUP BY GROUPING SETS ((h), (d))
        """
    )


@register(
    "q_agg_sketch_rollup",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS sketch_ok
    FROM events GROUP BY event_type
    """,
)
def q_agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count sketches — the continuous-
    aggregate pattern for 100 TB rollups: build one Datasketches HLL
    sketch per (event_type, day) cell, then MERGE the daily sketches
    into a per-event-type total with ``hll_union_agg`` — never
    re-touching raw rows. This is what makes hierarchical time rollups
    maintainable: day cells merge into weeks/months for free, and a
    late-arriving day only rebuilds its own cell.

    Exact distinct counts do NOT compose this way (distinct is not
    associative over partial counts), which is the whole point of
    shipping sketches. The oracled contract is again the guarantee, not
    the internals: the merged estimate must land within 5% of the exact
    count (lgConfigK=12 -> ~1.6% rsd), emitted as a boolean next to the
    exact value so the DuckDB hash check pins both."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("approx") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.05)
        ).alias("sketch_ok"),
    )


@register(
    "q_agg_approx_percentile",
    oracle="""
    SELECT event_type,
           floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) / 1000000.0
               AS p50_exact,
           TRUE AS approx_in_bounds
    FROM events GROUP BY event_type
    """,
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median via the KLL/GK-style ``approx_percentile``
    sketch (bounded rank error, mergeable, one pass) next to the exact
    interpolated median. The sketch's guarantee is a RANK bound, so the
    oracled boolean asserts the estimate lands between the exact p45
    and p55 values — a 5-percentile rank tolerance, far looser than the
    sketch's actual n/accuracy bound. The exact median is hash-compared
    (rounded to 1e-6 for cross-engine interpolation arithmetic)."""
    e = load_table(spark, sf_dir, "events")
    qs = e.groupBy("event_type").agg(
        F.percentile("value", F.lit([0.45, 0.5, 0.55])).alias("pv"),
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("ap"),
    )
    from ex_hivent_spark.functions.decimals import dround

    return qs.select(
        "event_type",
        dround(F.element_at("pv", 2), 6).alias("p50_exact"),
        (
            (F.col("ap") >= F.element_at("pv", 1))
            & (F.col("ap") <= F.element_at("pv", 3))
        ).alias("approx_in_bounds"),
    )


@register(
    "q_agg_bitmap_rollup",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           count(DISTINCT user_id) AS n_users_exact
    FROM events GROUP BY 1
    """,
)
def q_agg_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user rollup via bitmap aggregates — the exact
    counterpart of the HLL sketch rollup (q_agg_sketch_rollup): per
    (day, bitmap-bucket) cells hold a roaring-style bitmap of user ids
    (``bitmap_construct_agg``); the week level merges cells with
    ``bitmap_or_agg`` and sums per-bucket ``bitmap_count`` — exact
    distinct counts at any rollup level WITHOUT re-touching raw rows.

    This is how exact distinct survives 100 TB/day: the day→week→month
    hierarchy merges fixed-size bitmap cells (one OR per bucket), and
    dedup work distributes across (day, bucket) keys instead of one
    giant count-distinct shuffle. The oracle is the semantic contract:
    plain count(DISTINCT) per week."""
    e = load_table(spark, sf_dir, "events")
    day_cells = (
        e.select(
            F.date_trunc("week", "ts").cast("date").alias("week"),
            F.to_date("ts").alias("day"),
            "user_id",
        )
        .groupBy("week", "day", F.bitmap_bucket_number("user_id").alias("bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    )
    week_cells = day_cells.groupBy("week", "bucket").agg(
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("n_in_bucket")
    )
    return week_cells.groupBy("week").agg(
        F.sum("n_in_bucket").alias("n_users_exact")
    )


@register(
    "q_agg_winsorize",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             {sql_dround("quantile_cont(value, 0.05)", 6)} AS p05,
             {sql_dround("quantile_cont(value, 0.95)", 6)} AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, any_value(p05) AS p05, any_value(p95) AS p95,
           count(*) FILTER (value < p05 OR value > p95) AS n_clipped,
           {sql_davg("greatest(p05, least(p95, value))", "winsorized_mean")},
           {sql_davg("value", "raw_mean")}
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped-tail) robust aggregation: per event type,
    the 5th/95th percentile bounds, how many values they clip, and the
    winsorized vs raw mean — the outlier-robust KPI pattern. Two
    passes: a per-group exact percentile (per-group sort, same envelope
    as any ranking), then the tiny bounds table broadcast back onto the
    fact scan for clip-and-aggregate. Percentiles e6-rounded (shared
    Spark/DuckDB interpolation definition, last-ulp guard); clipping
    compares against the rounded bounds so the clip set is identical in
    both engines, and means go through decimal sums."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        dround(F.percentile("value", F.lit(0.05)), 6).alias("p05"),
        dround(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )
    j = e.join(F.broadcast(bounds), "event_type")
    clipped = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value")))
    out_of_band = (F.col("value") < F.col("p05")) | (
        F.col("value") > F.col("p95")
    )
    return j.groupBy("event_type").agg(
        F.any_value("p05").alias("p05"),
        F.any_value("p95").alias("p95"),
        F.count(F.when(out_of_band, 1)).alias("n_clipped"),
        davg(clipped, "winsorized_mean"),
        davg("value", "raw_mean"),
    )


@register(
    "q_agg_heavy_hitters",
    oracle="""
    WITH t AS (SELECT count(*) AS total FROM lineitem),
    c AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_items
      FROM lineitem GROUP BY l_partkey
    ),
    r AS (
      SELECT l_partkey, n_items,
             row_number() OVER (ORDER BY n_items DESC, l_partkey) AS rn
      FROM c
    )
    SELECT l_partkey, n_items, rn,
           floor(CAST(n_items AS DOUBLE) / total * 1000000.0 + 0.5)
               / 1000000.0 AS share
    FROM r CROSS JOIN t
    WHERE rn <= 20
    """,
)
def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-items report: the 20 most frequent part keys
    across all lineitems with their counts, ranks, and corpus share —
    the exact answer a space-saving / Misra-Gries sketch approximates,
    and the skew report run before choosing join strategies (the top
    entries ARE the candidate salt keys). Ties break on the key, so
    the cut is deterministic; only the reported share is (e6-rounded)
    floating point.

    Plan: one hash aggregate with map-side partial combine (a frequency
    count stream is exactly what partial aggregation compresses best —
    hot keys collapse within each map task), then orderBy().limit(20),
    which Spark plans as TakeOrderedAndProject: each task keeps only
    its local top-20 (key, count) pairs and the driver merges — no
    global sort, no single-partition shuffle of the |keys|-row counts
    frame. The row_number window that assigns rn runs AFTER the limit,
    over exactly 20 rows, so its single partition is bounded by the
    report size, not the key cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()  # one scalar; reused as a literal
    c = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items")
    )
    top = c.orderBy(F.col("n_items").desc(), "l_partkey").limit(20)
    w = Window.orderBy(F.col("n_items").desc(), "l_partkey")  # 20 rows
    return (
        top.withColumn("rn", F.row_number().over(w))
        .select(
            "l_partkey",
            "n_items",
            "rn",
            dround(F.col("n_items").cast("double") / float(total), 6).alias(
                "share"
            ),
        )
    )


@register(
    "q_agg_fulfillment_latency",
    oracle=f"""
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT)
               AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(days) AS BIGINT) AS min_days,
           CAST(max(days) AS BIGINT) AS max_days,
           CAST(sum(days) AS BIGINT) AS sum_days,
           CAST(sum(days) AS DOUBLE) / count(*) AS avg_days,
           {sql_dround(
               "sqrt(greatest((CAST(sum(days * days) AS DOUBLE)"
               " - CAST(sum(days) AS DOUBLE) * sum(days) / count(*))"
               " / (count(*) - 1), 0))", 6)} AS sd_days
    FROM lat GROUP BY priority ORDER BY priority
    """,
)
def q_agg_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment latency profile per order priority: whole days
    from order placement to line SHIPMENT (the TPC-H order→lineitem
    join; this testdata carries l_shipdate, not l_receiptdate), with
    count/min/max/mean/sd — the SLA dashboard cut ("are
    URGENT orders actually faster?") and the operational twin of
    q_agg_pricing_summary.

    Plan: the orders side carries only (orderkey, priority) into the
    join — a shuffle join on orderkey at fact scale (the natural
    co-partitioned key both tables would be bucketed by in a
    warehouse), then ONE hash aggregate with map-side combine.
    Determinism: day differences are exact integers; all moments are
    integer sums; the sd sqrt (the only libm) is e6-rounded and
    clamped at zero."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sdate")
    )
    lat = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "priority",
        F.datediff(F.col("sdate"), F.col("odate"))
        .cast("bigint")
        .alias("days"),
    )
    d = F.col("days")
    return (
        lat.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.min("days").cast("bigint").alias("min_days"),
            F.max("days").cast("bigint").alias("max_days"),
            F.sum("days").cast("bigint").alias("sum_days"),
            (F.sum("days").cast("double") / F.count(F.lit(1))).alias(
                "avg_days"
            ),
            dround(
                F.sqrt(
                    F.greatest(
                        (
                            F.sum(d * d).cast("double")
                            - F.sum(d).cast("double")
                            * F.sum(d)
                            / F.count(F.lit(1))
                        )
                        / (F.count(F.lit(1)) - 1),
                        F.lit(0.0),
                    )
                ),
                6,
            ).alias("sd_days"),
        )
        .orderBy("priority")
    )


@register(
    "q_agg_geometric_mean",
    oracle=f"""
    WITH logs AS (
      SELECT event_type,
             CASE WHEN value > 0
                  THEN {sql_dround("ln(value)", 6)} END AS lv
      FROM events
    ),
    agg AS (
      SELECT event_type,
             CAST(count(lv) AS BIGINT) AS n_events,
             CAST(count(*) - count(lv) AS BIGINT) AS n_nonpos,
             CAST(sum(CAST(lv AS DECIMAL(25,6))) AS DOUBLE) AS slv
      FROM logs GROUP BY event_type
    )
    SELECT event_type, n_events, n_nonpos,
           {sql_dround("slv / n_events", 6)} AS log_mean,
           {sql_dround(
               f"exp({sql_dround('slv / n_events', 6)})", 6)} AS geo_mean
    FROM agg
    """,
)
def q_agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of event value per type — the right average for
    multiplicative quantities (latency ratios, growth factors) that
    the arithmetic mean overstates under right skew; neither engine
    has it as a builtin, so it composes as exp(mean(ln x)) — the
    integer-log-space-product discipline (SCALE.md) in its continuous
    form. Non-positive values have no logarithm and take the standard
    FILTER convention — excluded from the mean, counted in n_nonpos so
    the exclusion is auditable. (The r11 full-registry anchor caught
    exactly this: value = 0 rows first appear at sf0.1, where the
    previous unguarded ln(0) made the engines diverge — DuckDB errors,
    Spark yields NULL — invisible at the sf0.01 driver gate.)

    Plan: ONE map pass for the logs, one hash aggregate per type —
    map-side partial combine, flat in event volume, no windows, no
    joins. Determinism: each ln (libm) is e6-rounded per row on both
    sides BEFORE aggregation, the sum rides the decimal detour, the
    mean divides by an exact count, and the closing exp (libm) is
    e6-rounded again."""
    e = load_table(spark, sf_dir, "events")
    logs = e.select(
        "event_type",
        F.when(
            F.col("value") > 0, dround(F.log(F.col("value")), 6)
        ).alias("lv"),
    )
    agg = logs.groupBy("event_type").agg(
        F.count("lv").cast("bigint").alias("n_events"),
        (F.count(F.lit(1)) - F.count("lv")).cast("bigint").alias("n_nonpos"),
        F.sum(F.col("lv").cast("decimal(25,6)")).cast("double").alias("slv"),
    )
    log_mean = dround(F.col("slv") / F.col("n_events"), 6)
    return agg.select(
        "event_type",
        "n_events",
        "n_nonpos",
        log_mean.alias("log_mean"),
        dround(F.exp(log_mean), 6).alias("geo_mean"),
    )


# Count-Min sketch geometry for the frequency-estimate audit: D md5
# hash rows x W counters, probing the top-N hottest keys.
_CMS_D = 4
_CMS_W = 64
_CMS_TOP = 10


def _cms_cell_sql(d: int, key: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({d} AS VARCHAR) || ':'"
        f" || CAST({key} AS VARCHAR)), 1, 12))::BIGINT % {_CMS_W}"
    )


@register(
    "q_agg_cms_audit",
    oracle=f"""
    WITH exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM exact),
    cells AS (
      SELECT d.d,
             CASE d.d
               {" ".join(
                   f"WHEN {d} THEN {_cms_cell_sql(d, 'exact.user_id')}"
                   for d in range(_CMS_D))}
             END AS cell,
             CAST(sum(exact.c) AS BIGINT) AS cnt
      FROM exact, (SELECT CAST(unnest(range({_CMS_D})) AS BIGINT) AS d) d
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT user_id, c FROM exact
      ORDER BY c DESC, user_id LIMIT {_CMS_TOP}
    ),
    est AS (
      SELECT p.user_id, p.c,
             min(cells.cnt) AS est
      FROM probes p, (SELECT CAST(unnest(range({_CMS_D})) AS BIGINT)
                      AS d) dd
      JOIN cells ON cells.d = dd.d
      WHERE cells.cell = CASE dd.d
               {" ".join(
                   f"WHEN {d} THEN {_cms_cell_sql(d, 'p.user_id')}"
                   for d in range(_CMS_D))}
             END
      GROUP BY p.user_id, p.c
    )
    SELECT e.user_id, e.c AS exact_count, e.est AS cms_estimate,
           e.est - e.c AS overcount,
           e.est >= e.c AS never_undercounts,
           CAST(e.est - e.c AS DOUBLE)
             <= 2.0 * (SELECT n FROM tot) / {_CMS_W} AS within_2eps
    FROM est e
    """,
)
def q_agg_cms_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency-estimate audit: a 4×64 CMS over
    per-user event counts (md5 row hashes — deterministic, so the
    sketch is identical on any cluster or retry), probed at the ten
    hottest users against their exact counts. The two contracts a CMS
    ships with are asserted as COLUMNS: estimates never undercount
    (min over rows of an over-approximating cell), and the overcount
    stays within the 2N/W slack (twice the expected collision mass —
    the audit threshold; the ε=e/W textbook bound holds w.h.p.). This
    is the q_agg_sketch_rollup companion for FREQUENCY sketches:
    heavy-hitter serving layers store exactly these counters.

    Plan: event volume collapses to the per-user exact frame once;
    the sketch builds FROM that aggregate (a |users|×4 expansion into
    at most 256 counter cells — never a 4× pass over raw events); the
    probe set is a TakeOrdered top-10 broadcast back onto the tiny
    cell table. Determinism: integer counts, md5 cell arithmetic
    identical in both engines, min-of-integers estimates."""
    e = load_table(spark, sf_dir, "events")
    exact = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # sketch build + probe ranking +
    # the total all fan out from this one user-grain frame
    tot = exact.agg(F.sum("c").cast("bigint").alias("n"))

    def cell(d: int, key) -> "F.Column":
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(str(d)),
                            F.lit(":"),
                            key.cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            % _CMS_W
        )

    rows = None
    for d in range(_CMS_D):
        r = exact.select(
            F.lit(d).cast("bigint").alias("d"),
            cell(d, F.col("user_id")).alias("cell"),
            "c",
        )
        rows = r if rows is None else rows.unionByName(r)
    cells = rows.groupBy("d", "cell").agg(
        F.sum("c").cast("bigint").alias("cnt")
    )
    probes = exact.orderBy(F.col("c").desc(), "user_id").limit(_CMS_TOP)
    probe_cells = None
    for d in range(_CMS_D):
        pc = probes.select(
            "user_id",
            "c",
            F.lit(d).cast("bigint").alias("d"),
            cell(d, F.col("user_id")).alias("cell"),
        )
        probe_cells = (
            pc if probe_cells is None else probe_cells.unionByName(pc)
        )
    est = (
        probe_cells.join(F.broadcast(cells), ["d", "cell"])
        .groupBy("user_id", "c")
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )
    return est.crossJoin(F.broadcast(tot)).select(
        "user_id",
        F.col("c").alias("exact_count"),
        F.col("est").alias("cms_estimate"),
        (F.col("est") - F.col("c")).alias("overcount"),
        (F.col("est") >= F.col("c")).alias("never_undercounts"),
        (
            (F.col("est") - F.col("c")).cast("double")
            <= 2.0 * F.col("n") / _CMS_W
        ).alias("within_2eps"),
    )
