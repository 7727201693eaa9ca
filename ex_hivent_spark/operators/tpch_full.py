"""TPC-H query-shape completion: the 15 classic shapes not already
covered by analytics.py (Q1/Q3/Q5/Q6/Q10/Q14/Q18 live there).

The testdata schema is TPC-H-*ish* — no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode, no c_phone, no p_container — so
each query here keeps the *shape* of its TPC-H counterpart (the join
topology, subquery structure, and aggregation pattern that stress an
optimizer) with predicates adapted to the columns that exist.  Every
query is oracle-checked against DuckDB; float aggregation follows the
decimal-sum convention (functions/decimals.py) so hashes are bit-exact.

Scale notes (100 TB): all joins are equi-keyed; dimension sides
(part/supplier/nation/region and the one-row scalar-subquery results)
broadcast under AQE; fact-fact joins shuffle on their natural keys.
Correlated/scalar subqueries are expressed either as uncorrelated
one-row broadcasts or as pre-aggregated join sides — never as per-row
re-execution.  LIMIT queries sort on unique key combinations so the
selected set is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, register_views, spread_table
from ex_hivent_spark.functions.decimals import davg, dsum, sql_davg, sql_dsum
from ex_hivent_spark.plans.registry import register

_SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier (correlated-min subquery as agg + join)
# --------------------------------------------------------------------------
@register(
    "q_tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), best AS (
      SELECT c.l_partkey, min(c.supply_cost) AS min_cost
      FROM cost c JOIN eu ON c.l_suppkey = eu.s_suppkey
      GROUP BY c.l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM cost c
    JOIN eu ON c.l_suppkey = eu.s_suppkey
    JOIN best b ON c.l_partkey = b.l_partkey AND c.supply_cost = b.min_cost
    JOIN part ON p_partkey = c.l_partkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the EUROPE supplier offering the
    minimum unit cost (min over an aggregated cost table replaces the
    correlated subquery — one pass, no re-execution).  Unit cost
    min(l_extendedprice/l_quantity) stands in for ps_supplycost.  The
    supplier/nation/region side is tiny (broadcasts); the cost
    aggregation shuffles on (l_partkey, l_suppkey).  LIMIT sorts on a
    unique key set.

    r17 (guide §3.2/§2.4): (a) the selective part predicate
    (p_size=15 AND p_type='STANDARD') pre-filters lineitem through a
    broadcast semi-join BEFORE the cost aggregate — the per-part min
    is independent of other parts, so restricting partkeys early
    changes nothing while cutting the aggregate's input ~50x; (b) the
    min-cost correlated shape is a window over l_partkey instead of a
    groupBy + self-join — the cost_eu subtree previously appeared
    twice in the plan (lineitem scanned and aggregated twice)."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost_eu = cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
    wmin = Window.partitionBy("l_partkey")
    best = cost_eu.withColumn(
        "min_cost", F.min("supply_cost").over(wmin)
    ).filter(F.col("supply_cost") == F.col("min_cost"))
    return (
        best.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q4 shape: priority counting with EXISTS (left-semi join)
# --------------------------------------------------------------------------
@register(
    "q_tpch_q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority for orders with at least
    one line shipped after the order date (shipdate>orderdate replaces
    commitdate<receiptdate).  The EXISTS is a left-semi join — Spark
    dedups the probe side, no row multiplication; the date filter pushes
    into the orders scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations
# --------------------------------------------------------------------------
@register(
    "q_tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           {sql_dsum(_SQL_REVENUE, "revenue")}
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
    """,
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year.  Nation dims broadcast; the disjunctive nation-pair
    predicate lands after the joins (Catalyst pushes each half into the
    respective dim scans); lineitem-orders is the one real shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    from ex_hivent_spark.planner import stats_broadcast

    s = stats_broadcast(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = stats_broadcast(
        spark,
        sf_dir,
        "nation",
        n.select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        ),
    )
    n2 = stats_broadcast(
        spark,
        sf_dir,
        "nation",
        n.select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        ),
    )
    return (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(_revenue(), "revenue"))
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share
# --------------------------------------------------------------------------
@register(
    "q_tpch_q8_market_share",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(sum(CAST(CASE WHEN n1.n_name = 'NATION_3'
                              THEN {_SQL_REVENUE} ELSE 0.0 END
                         AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(sum(CAST({_SQL_REVENUE} AS DECIMAL(25,6))) AS DOUBLE)
             AS mkt_share
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    JOIN part ON p_partkey = l_partkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue sold into
    ASIA, by order year.  Share = decimal-summed conditional revenue /
    decimal-summed total revenue — one double division at the end, so
    the ratio is bit-deterministic.  All dims broadcast; the only big
    shuffles are lineitem-orders and the year aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), "n_regionkey")
    DEC = "decimal(25,6)"
    cond = F.when(F.col("supp_nation") == "NATION_3", _revenue()).otherwise(0.0)
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(cond.cast(DEC)).cast("double")
                / F.sum(_revenue().cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# --------------------------------------------------------------------------
_Q9_AMOUNT_SQL = (
    "l_extendedprice * (1 - l_discount) - 0.01 * (p_retailprice * l_quantity)"
)


@register(
    "q_tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           {sql_dsum(_Q9_AMOUNT_SQL, "sum_profit")}
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on '%gear%' parts by supplier nation and
    order year; 1% of retail price times quantity stands in for
    ps_supplycost.  The amount is pure per-row IEEE arithmetic (same
    association order both engines), aggregated via decimal sums.
    part/supplier/nation broadcast (stats-informed via
    planner.stats_broadcast when ANALYZE manifests exist);
    lineitem-orders shuffles."""
    from ex_hivent_spark.planner import stats_broadcast

    li = load_table(spark, sf_dir, "lineitem")
    s = stats_broadcast(spark, sf_dir, "supplier")
    p = stats_broadcast(
        spark,
        sf_dir,
        "part",
        load_table(spark, sf_dir, "part").filter(
            F.col("p_name").like("%gear%")
        ),
    )
    o = load_table(spark, sf_dir, "orders")
    n = stats_broadcast(spark, sf_dir, "nation")
    amount = _revenue() - 0.01 * (F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(amount, "sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11 shape: important-stock scalar-subquery HAVING
# --------------------------------------------------------------------------
_Q11_SQL = f"""
    WITH eu_li AS (
      SELECT l_partkey, {_SQL_REVENUE} AS rev
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT l_partkey, {sql_dsum("rev", "value")}
    FROM eu_li
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) >
           (SELECT CAST(sum(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) * 1.5
                   / count(DISTINCT l_partkey)
            FROM eu_li)
"""


@register("q_tpch_q11_important_value", oracle=_Q11_SQL)
def q_tpch_q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose EUROPE-supplied revenue exceeds a
    fraction of the total (uncorrelated scalar subquery in HAVING —
    Catalyst evaluates it once and broadcasts the one-row result).
    Identical SQL text runs on both engines; both decimal-sum the same
    per-row doubles so threshold comparisons are bit-exact.

    Threshold is MEAN-RELATIVE (> 1.5× the average per-part value),
    not a fixed fraction of the total: official TPC-H scales Q11's
    fraction as 0.0001/SF for exactly this reason — a fixed fraction
    goes vacuously empty as |parts| grows (the r13 sf0.1 zero-row
    audit caught the old 0.001 doing just that: non-empty at sf0.01,
    empty at sf0.1, dead at any production scale). Mean-relative
    selects the above-1.5×-average tail at every SF
    (14 / 331 / 2,922 parts at sf0.001/0.01/0.1)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


# --------------------------------------------------------------------------
# Q12 shape: priority split by return flag (conditional counts)
# --------------------------------------------------------------------------
@register(
    "q_tpch_q12_priority_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: urgent-vs-other order counts per return flag
    (return flag replaces ship mode).  Conditional integer sums.

    Hardened after the r4 driver hash mismatch: BOTH engines compare
    ``cast(l_shipdate AS date)`` against DATE literals, so the year
    boundary is a pure calendar comparison immune to any timestamp-vs-NTZ
    or session-timezone interpretation drift between Spark and the
    oracle; the oracle's conditional sums are CAST(... AS BIGINT) so
    DuckDB's HUGEINT sum result can't hash-diverge from Spark's BIGINT."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 shape: distribution of orders per customer
# --------------------------------------------------------------------------
@register(
    "q_tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                       AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of non-urgent order counts per
    customer, zero-order customers included.

    r17 (guide §2.3 — aggregate before you shuffle/join): orders
    pre-aggregates to per-custkey counts BEFORE meeting customer, so
    the left join matches one count row per customer instead of
    multiplying every customer by its order rows and counting after
    (same count: per-customer order count is independent of other
    customers; no-match customers read coalesce(0), exactly the rows
    the filtered left join counted as 0). The orders shuffle carries
    partial-aggregated counts, not raw rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    oc = (
        o.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        c.join(oc, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            F.coalesce(F.col("n_orders"), F.lit(0).cast("bigint")).alias(
                "c_count"
            )
        )
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier by quarterly revenue (max scalar subquery)
# --------------------------------------------------------------------------
_Q15_SQL = f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum(_SQL_REVENUE, "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q_tpch_q15_top_supplier", oracle=_Q15_SQL)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue (the
    view + max scalar subquery of the original, as a CTE).  Revenue per
    supplier is decimal-summed so the max and the equality comparison
    agree across engines bit-exactly.  One suppkey shuffle; the max is
    a one-row broadcast."""
    register_views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


# --------------------------------------------------------------------------
# Q16 shape: supplier variety per part attribute group
# --------------------------------------------------------------------------
@register(
    "q_tpch_q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND s_acctbal >= 0.0
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    brand/type/size group, excluding one brand, one type, and
    negative-balance suppliers (the complaints-filter analog).  Exact
    distinct count — Spark plans it as a two-phase aggregate; the part
    and supplier dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0.0)
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue (per-part average threshold)
# --------------------------------------------------------------------------
_Q17_SQL = f"""
    WITH part_avg AS (
      SELECT l_partkey AS pa_partkey, {sql_davg("l_quantity", "avg_qty")}
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pa_partkey = l_partkey
    WHERE p_brand = 'Brand#7' AND l_quantity < 0.2 * avg_qty
"""


@register("q_tpch_q17_small_qty_revenue", oracle=_Q17_SQL)
def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — lines
    under 20%% of their part's average quantity.  The average is
    decimal-sum/count so the 0.2*avg threshold compares identically in
    both engines.

    r17 (guide §3.2/§2.4, the Q2 treatment): (a) the selective brand
    predicate pre-filters lineitem through a broadcast semi-join BEFORE
    anything aggregates — a part's average quantity depends only on its
    own lines, so restricting partkeys early changes nothing; (b) the
    correlated average is a window over l_partkey instead of a second
    lineitem aggregate + join back — lineitem scans 2 → 1, and the one
    exchange carries only the brand-filtered lines."""
    from pyspark.sql import Window

    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#7")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).over(w).cast("double")
        / F.count("l_quantity").over(w)
    )
    qualifying = li.withColumn("avg_qty", avg_qty).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")
    )
    return qualifying.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicates
# --------------------------------------------------------------------------
@register(
    "q_tpch_q19_disjunctive",
    oracle=f"""
    SELECT {sql_dsum(_SQL_REVENUE, "revenue")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/quantity
    conjunctions.  Catalyst extracts the common-attribute envelope
    (brand IN ..., size<=15, quantity<=30) for pushdown into both scans
    and evaluates the residual disjunction post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, sz, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#1") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(_revenue(), "revenue"))
    )


# --------------------------------------------------------------------------
# Q20 shape: suppliers with excess share of a part's volume
# --------------------------------------------------------------------------
@register(
    "q_tpch_q20_excess_suppliers",
    oracle="""
    WITH small_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small %'
    ), per_pair AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS pair_qty
      FROM lineitem JOIN small_parts ON p_partkey = l_partkey
      GROUP BY l_partkey, l_suppkey
    ), per_part AS (
      SELECT l_partkey AS t_partkey,
             CAST(sum(CAST(pair_qty AS DECIMAL(25,6))) AS DOUBLE)
               AS total_qty,
             CAST(count(*) AS BIGINT) AS n_supp
      FROM per_pair
      GROUP BY l_partkey
    )
    SELECT DISTINCT s_name, s_acctbal
    FROM per_pair
    JOIN per_part ON l_partkey = t_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE pair_qty > 2.0 * total_qty / n_supp AND r_name = 'ASIA'
    """,
)
def q_tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers holding an EXCESS share of some
    'small *' part's shipped volume (volume share replaces the
    availqty half-of-demand test). Nested aggregation —
    per-(part,supplier) decimal-summed quantities, re-aggregated to
    the per-part total + supplier count — then a distinct supplier
    projection; supplier/nation/region broadcast.

    Excess is MEAN-RELATIVE (pair share > 2× the part's average
    per-supplier share), not a fixed 20%: with |suppliers| growing in
    SF, any fixed share threshold goes vacuously empty (the r13
    sf0.1 zero-row audit caught 0.2 doing that — max observed share
    at sf0.1 is 0.202), exactly why official TPC-H scales its
    thresholds by 1/SF. Mean-relative keeps the skew tail at every SF
    (11 / 215 / 1,108 qualifying pairs at sf0.001/0.01/0.1). The
    per-part frame now derives FROM the per-pair frame (one lineitem
    aggregate instead of two — the r13 plan-audit discipline), with
    the total re-summed through the decimal detour so both engines
    fold identical values."""
    li = load_table(spark, sf_dir, "lineitem")
    sp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small %"))
        .select("p_partkey")
    )
    li_small = li.join(F.broadcast(sp), F.col("p_partkey") == F.col("l_partkey"))
    DEC = "decimal(25,6)"
    per_pair = li_small.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("pair_qty")
    ).localCheckpoint(eager=False)  # feeds per_part AND the share join
    per_part = per_pair.groupBy(
        F.col("l_partkey").alias("t_partkey")
    ).agg(
        F.sum(F.col("pair_qty").cast(DEC)).cast("double").alias("total_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n_supp"),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        per_pair.join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(
            F.col("pair_qty")
            > F.lit(2.0) * F.col("total_qty") / F.col("n_supp")
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "s_acctbal")
        .distinct()
    )


# --------------------------------------------------------------------------
# Q21 shape: sole problem supplier in multi-supplier orders
# --------------------------------------------------------------------------
@register(
    "q_tpch_q21_sole_supplier",
    oracle="""
    WITH ord_stats AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_r_supp
      FROM lineitem GROUP BY l_orderkey
    ), r_pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT s_name, count(*) AS numwait
    FROM r_pairs
    JOIN ord_stats USING (l_orderkey)
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE n_supp >= 2 AND n_r_supp = 1 AND o_orderstatus = 'F'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *only* one with returned
    ('R') lines on a finished multi-supplier order — the EXISTS /
    NOT-EXISTS double correlation of the original, expressed as one
    per-order aggregation (distinct suppliers, distinct R-suppliers)
    instead of two correlated rescans.  Integer counts only; orderkey
    is the single shuffle key; supplier broadcasts.

    r16: one lineitem pass instead of two.  The old form aggregated
    lineitem twice (a double-countDistinct with an Expand, plus a
    DISTINCT for the R-pairs) and joined the results; since both the
    per-order supplier counts and the identity of the sole R-supplier
    are determined by the deduplicated (orderkey, suppkey, had-an-R-line)
    pairs, one pair-level aggregation followed by a per-order rollup of
    those (tiny) pair rows yields the same relation: n_supp = pair
    count, n_r_supp = count of R-pairs, and when n_r_supp = 1 the sole
    R supplier is max(suppkey | R).  Plan: 2 scans + Expand + 3
    lineitem-scale Exchanges -> 1 scan + 1 lineitem-scale Exchange.
    spread_table parallelizes the pair aggregation's map side (the
    single-row-group scan ran it in one task), and hash partitioning
    on l_orderkey also satisfies both groupings — no added shuffle."""
    li = spread_table(spark, sf_dir, "lineitem", "l_orderkey")
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("l_returnflag") == "R").alias("any_r")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.count(F.when(F.col("any_r"), True)).alias("n_r_supp"),
        F.max(F.when(F.col("any_r"), F.col("l_suppkey"))).alias("l_suppkey"),
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 shape: dormant high-balance customers (anti join + global average)
# --------------------------------------------------------------------------
_Q22_SQL = f"""
    SELECT c_nationkey, count(*) AS numcust,
           {sql_dsum("c_acctbal", "totacctbal")}
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg("c_acctbal", "v").replace(" AS v", "")}
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
"""


@register("q_tpch_q22_dormant_customers", oracle=_Q22_SQL)
def q_tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no *urgent* orders (this testdata gives every customer at least
    one order, so plain no-orders dormancy is empty — the urgent filter
    keeps the anti-join shape non-degenerate), grouped by nation
    (nationkey replaces the phone country code).  The global average is
    an uncorrelated scalar subquery (one-row broadcast); NOT EXISTS
    plans as a left-anti join on custkey.  Identical SQL text on both
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)
