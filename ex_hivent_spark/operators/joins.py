"""Join operators: equi, star multiway, outer, semi/anti, broadcast,
range/theta (time-window), and as-of.

The reference has no joins (SURVEY.md §2.A) — this is the engine's batch
relational surface mandated by the driver contract. Scale notes:

- Small dims (region/nation/customer at star scale) broadcast — either
  explicitly (``F.broadcast``) or via AQE's dynamic broadcast selection.
- The time-window range join is rewritten to an *equi* join on a
  time-bucket key plus a residual predicate, so it hash-joins and scales
  linearly instead of falling into BroadcastNestedLoopJoin.
- The as-of join is the union+window implementation in
  :mod:`ex_hivent_spark.operators.asof` — one shuffle, no pair blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dsum, sql_dsum
from ex_hivent_spark.operators.asof import asof_join
from ex_hivent_spark.plans.registry import register


@register(
    "q_join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain inner equi-join orders ⋈ customer (shuffled hash/SMJ or
    broadcast per AQE's size estimate)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_join_star_multiway",
    oracle=f"""
    SELECT r_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           count(*) AS n_rows
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_join_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema 5-way join, revenue per region. Dimension tables are
    orders-of-magnitude smaller than the fact table, so Catalyst/AQE
    broadcasts them — the fact table is scanned once with no shuffle
    until the final 5-group aggregate. The nation/region broadcast is
    stats-informed (planner.stats_broadcast): an ANALYZE manifest, when
    present, overrides the static dims-are-small assumption in either
    direction."""
    from ex_hivent_spark.planner import stats_broadcast

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = stats_broadcast(spark, sf_dir, "nation")
    r = stats_broadcast(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customers with their order counts, including zero."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_join_full_outer",
    oracle="""
    WITH s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey),
         c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
               FROM customer GROUP BY c_nationkey)
    SELECT coalesce(s.nk, c.nk) AS nationkey, n_suppliers, n_customers
    FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier vs customer presence per nation, full outer — aggregates
    pushed below the join so the outer join runs on tiny inputs."""
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return s.join(c, s.nk == c.nk, "full").select(
        F.coalesce(s.nk, c.nk).alias("nationkey"), "n_suppliers", "n_customers"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one order (no order columns leak out)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who never placed a 1-URGENT order (left anti join
    against a pre-filtered build side).

    r13 vacuous-op audit rewrite: the original "customers with no
    orders at all" was EMPTY at the sf0.01 driver gate (the generator
    assigns ≥1 order to every sf0.01 customer), so its hash-match was
    schema-only. The priority predicate keeps the result non-empty at
    every gate SF (18 / 203 / 1,986 rows at sf0.001/0.01/0.1) while
    staying a pure anti-join exercise; the filter pushes into the
    orders scan before the join builds."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_broadcast",
    oracle=f"""
    SELECT p_brand,
           {sql_dsum("l_quantity", "sum_qty")},
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size > 40
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(selective dim): the part-side filter prunes before
    broadcast, so the fact table never shuffles for the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q_join_range_theta",
    oracle="""
    WITH p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, ts FROM events
               WHERE event_type IN ('click', 'view'))
    SELECT p.event_id AS purchase_id, count(c.event_id) AS n_recent
    FROM p LEFT JOIN c
      ON c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.event_id
    """,
)
def q_join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window theta join with no equi key: for each purchase, how
    many click/view events (any user) happened in the preceding hour.

    Scale strategy: bucket both sides by epoch-hour and turn the range
    predicate into an equi join on the bucket plus a residual filter —
    each candidate row lands in at most 2 buckets, so the join is a hash
    join over ~2·|C| rows instead of a nested-loop over |P|·|C| pairs.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.expr("unix_micros(ts) div 3600000000").alias("bucket"),
    )  # wave-9 pin A/B-tested and REVERTED (0.62 unpinned vs 0.75
    # pinned in the calm tiebreak)
    c = (
        e.filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("ts").alias("c_ts"),
            F.expr("unix_micros(ts) div 3600000000").alias("c_bucket"),
        )
        # a click in hour H can precede-within-1h a purchase in H or H+1
        .withColumn("bucket", F.explode(F.array("c_bucket", F.col("c_bucket") + 1)))
        .drop("c_bucket")
    )
    counts = (
        p.join(c, "bucket")
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )
    return (
        p.select("purchase_id")
        .join(counts, "purchase_id", "left")
        .select("purchase_id", F.coalesce("n_recent", F.lit(0)).alias("n_recent"))
    )


@register(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id AS purchase_id, p.user_id AS user_id,
                  p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
         ),
         matched AS (SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
                     FROM j WHERE rn = 1)
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts, m.click_id AS click_id, m.click_ts AS click_ts
    FROM p LEFT JOIN matched m ON p.event_id = m.purchase_id
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click by the same user
    at-or-before the purchase time (null if none). Uses the scalable
    union+window implementation (see operators/asof.py) — the oracle uses
    the quadratic row_number formulation DuckDB can afford at sf0.01."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        p, c, by="user_id", left_ts="purchase_ts", right_ts="click_ts",
        right_seq="click_id",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("asof.click_id").alias("click_id"),
        F.col("asof.click_ts").alias("click_ts"),
    )


ASOF_TOL_US = 30 * 60 * 1_000_000  # 30-minute max staleness


@register(
    "q_join_asof_tolerance",
    oracle=f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id AS purchase_id,
                  c.event_id AS click_id, c.ts AS click_ts,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
         ),
         matched AS (SELECT purchase_id, click_id, click_ts
                     FROM j WHERE rn = 1)
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(m.click_ts) <= {ASOF_TOL_US}
                THEN m.click_id END AS click_id,
           CASE WHEN epoch_us(p.ts) - epoch_us(m.click_ts) <= {ASOF_TOL_US}
                THEN epoch_us(p.ts) - epoch_us(m.click_ts) END AS staleness_us
    FROM p LEFT JOIN matched m ON p.event_id = m.purchase_id
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance (pandas
    ``merge_asof(tolerance=...)`` semantics): the latest same-user click
    at-or-before each purchase counts only if it is at most 30 minutes
    old; staler matches report NULL, exactly like no match. The
    tolerance is a post-filter on the single as-of match — same
    union+window plan as q_join_asof (one shuffle + one sort, no pair
    blow-up), zero extra cost."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        p, c, by="user_id", left_ts="purchase_ts", right_ts="click_ts",
        right_seq="click_id",
    )
    gap = F.unix_micros("purchase_ts") - F.unix_micros(F.col("asof.click_ts"))
    within = F.col("asof").isNotNull() & (gap <= ASOF_TOL_US)
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.when(within, F.col("asof.click_id")).alias("click_id"),
        F.when(within, gap).alias("staleness_us"),
    )


@register(
    "q_join_interval_attribution",
    oracle="""
    SELECT v.user_id,
           v.ts AS l_ts,
           c.ts AS r_ts,
           epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts > v.ts
     AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def q_join_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click attribution within 1 hour — the BATCH twin of the
    stream-stream interval join, produced by the SAME builder
    (streaming/joins.py interval_join) on static frames: Structured
    Streaming's batch/stream unification means one implementation
    serves both, and this oracle row checks the shared semantics. The
    equi-key keeps it a hash join; the time predicates are residual
    filters, never a nested loop."""
    from ex_hivent_spark.streaming.joins import interval_join

    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("l_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts")
    )
    return interval_join(views, clicks, watermark=None)


@register(
    "q_join_right_outer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (every customer, matched orders or NULLs) —
    completes the join-type surface next to left/full/semi/anti.
    Planned identically to the mirrored left join: hash join with the
    preserved side streamed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH u AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CASE event_type WHEN 'click' THEN 0 ELSE 1 END AS side,
             CASE event_type WHEN 'click' THEN event_id END AS c_id,
             CASE event_type WHEN 'click' THEN epoch_us(ts) END AS c_us,
             event_id, ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT *,
        last_value(c_id IGNORE NULLS) OVER bw AS prev_id,
        last_value(c_us IGNORE NULLS) OVER bw AS prev_us,
        first_value(c_id IGNORE NULLS) OVER fw AS next_id,
        first_value(c_us IGNORE NULLS) OVER fw AS next_us
      FROM u
      WINDOW bw AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fw AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           CASE WHEN prev_id IS NULL THEN next_id
                WHEN next_id IS NULL THEN prev_id
                WHEN ts_us - prev_us <= next_us - ts_us THEN prev_id
                ELSE next_id END AS click_id,
           CASE WHEN prev_id IS NULL THEN next_us - ts_us
                WHEN next_id IS NULL THEN ts_us - prev_us
                WHEN ts_us - prev_us <= next_us - ts_us THEN ts_us - prev_us
                ELSE next_us - ts_us END AS gap_us,
           CASE WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
                WHEN next_id IS NULL THEN 'backward'
                WHEN prev_id IS NULL THEN 'forward'
                WHEN ts_us - prev_us <= next_us - ts_us THEN 'backward'
                ELSE 'forward' END AS direction
    FROM w WHERE side = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, ``direction='nearest'`` (pandas ``merge_asof``): each
    purchase matches its temporally CLOSEST same-user click, before or
    after. Tie-breaks are fully deterministic: equal |gap| prefers the
    backward match; same-timestamp clicks resolve to the largest
    click_id backward / smallest forward.

    One union + ONE window pass over (user_id, ts): the backward
    candidate is ``last_value(..., ignorenulls)`` over the preceding
    frame, the forward candidate ``first_value`` over the following
    frame — both frames share the sort, so Spark runs a single Window
    operator (plan-asserted). One shuffle, no join, no pair blow-up,
    and the gap arithmetic is all-integer (microseconds) so the oracle
    match is exact by construction."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = F.col("event_type") == "click"
    u = e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(is_click, F.lit(0)).otherwise(F.lit(1)).alias("side"),
        F.when(is_click, F.col("event_id")).alias("c_id"),
        F.when(is_click, F.unix_micros("ts")).alias("c_us"),
        "event_id",
        "ts",
    )
    order = [F.col("ts_us"), F.col("side"), F.col("event_id")]
    bw = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fw = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = u.select(
        "*",
        F.last("c_id", ignorenulls=True).over(bw).alias("prev_id"),
        F.last("c_us", ignorenulls=True).over(bw).alias("prev_us"),
        F.first("c_id", ignorenulls=True).over(fw).alias("next_id"),
        F.first("c_us", ignorenulls=True).over(fw).alias("next_us"),
    ).filter(F.col("side") == 1)
    back_gap = F.col("ts_us") - F.col("prev_us")
    fwd_gap = F.col("next_us") - F.col("ts_us")
    backward = F.col("next_id").isNull() | (
        F.col("prev_id").isNotNull() & (back_gap <= fwd_gap)
    )
    return w.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(backward, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("click_id"),
        F.when(backward, back_gap).otherwise(fwd_gap).alias("gap_us"),
        F.when(
            F.col("prev_id").isNull() & F.col("next_id").isNull(),
            F.lit(None).cast("string"),
        )
        .when(backward, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


@register(
    "q_join_salted_skew",
    oracle="""
    SELECT user_id, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS matched_order_value
    FROM events
    JOIN orders ON o_custkey = user_id % 100
    WHERE event_type IN ('purchase', 'view')
    GROUP BY user_id, event_type
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join, driver-verified: events join a synthetic hot
    key (user_id % 100 folds every user onto 100 order custkeys — each
    key ~1% of the fact table, the power-law shape that overflows one
    reducer at scale).  The salted plan spreads each hot key over 8
    deterministic sub-keys and replicates the build side 8x; the result
    hash-matches the PLAIN join SQL — proving salting changes only the
    shuffle distribution, never the answer.

    At 100 TB this is the tool for the keys AQE skew-splitting can't
    fix (a single key exceeding one executor); salt is derived from
    xxhash64 of a unique column, never rand(), so shuffle retries are
    idempotent.  See operators/skew.py."""
    from ex_hivent_spark.operators.skew import salted_join

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .withColumn("join_key", (F.col("user_id") % 100))
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("join_key"), "o_totalprice"
    )
    joined = salted_join(
        e, o, on="join_key", fact_unique_col="event_id", n_salt=8
    )
    DEC = "decimal(25,6)"
    return joined.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias(
            "matched_order_value"
        ),
    )


@register(
    "q_join_bloom_prefilter",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY l_returnflag
    """,
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-bloom-pruned fact join: revenue by return flag for
    lineitems of urgent 1997-H1 orders, with the lineitem scan pruned
    BEFORE the join shuffle by a Bloom filter built from the filtered
    order keys (operators/bloom.py — the explicit form of Spark's
    row-level runtime filtering / Trino's dynamic filters).

    The oracle is the PLAIN join: Bloom filters admit false positives
    but never false negatives, so pruned results must be bit-identical
    — the hash check proves that property end to end. At 100 TB the
    bitmap is O(m) bytes (vs O(|keys|) for a broadcast key set) and
    non-matching fact rows die map-side instead of shuffling. Sizing:
    when the orders table has an ANALYZE manifest, m and k derive from
    the key ndv (bloom.stats_bloom_params); sizing only moves the
    false-positive rate, never the results."""
    from ex_hivent_spark.operators.bloom import (
        bloom_prefilter,
        stats_bloom_params,
    )

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    m, seeds = stats_bloom_params(
        spark, f"{sf_dir}/orders.parquet", "o_orderkey"
    )
    pruned = bloom_prefilter(
        li, o.select("o_orderkey"), "l_orderkey", "o_orderkey",
        m=m, seeds=seeds,
    )
    return (
        pruned.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
    )


_LATERAL_TOPK_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
    WHERE c.c_mktsegment = 'BUILDING'
"""


@register("q_join_lateral_topk", oracle=_LATERAL_TOPK_SQL)
def q_join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — per BUILDING-segment customer, the
    top-3 orders by total price, expressed as the SQL-standard lateral
    derived table rather than the window-rank idiom
    (q_win_rank_topk_per_group's twin through the other door). The
    identical SQL text runs on both engines; the ORDER BY tiebreaks on
    o_orderkey so the pick is a unique total order.

    Plan: Catalyst DECORRELATES the lateral — no per-customer
    execution: the orders side becomes WindowGroupLimit (partial
    map-side top-3 per custkey, then final after one hash exchange —
    the optimal distributed top-k-per-group), the customer side
    broadcasts, and the correlation closes as one BroadcastHashJoin.
    The segment filter pushes to the customer scan. At 100 TB this is
    exactly the plan you would hand-write; the lateral form simply
    proves the engine's subquery surface. Determinism: raw column
    values only, unique sort — nothing to round."""
    from ex_hivent_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL)
