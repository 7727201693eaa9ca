"""Commerce-graph / market-basket analytics over the TPC-H order
stream: one HITS iteration on the customer→part bipartite graph,
the supplier co-purchase projection, within-order part-pair lift,
ABC inventory classification, and repeat-purchase gap statistics —
the merchandising panel (what anchors baskets, which suppliers are
substitutes, where the revenue head ends, how often customers come
back).

Plan discipline: every pair expansion is blocked by a NATURAL key
whose group size is catalog-bounded (parts per order ≤ the basket
size, suppliers per part ≤ the sourcing fan-out), never an all-pairs
join; global rankings (ABC) ride the blocked prefix fold
(operators/prefix.py) instead of a single-partition sort; top-k
outputs order by exact integers or e6-grid doubles with full key
tie-breaks.

Determinism: supports/degrees/day-gaps are exact integers; revenue is
exact integer cents (floor(x·100 + 0.5) per line); percentile picks
use integer-inequality thresholds (10·cum ≥ 9·n, no float ceil); the
few closing ratios are e6-rounded; no libm anywhere in the module.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no commerce surface; these derive from the
driver's analytics mandate (HITS per Kleinberg 1999; lift per the
association-rules literature; ABC per classical inventory control).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, spread_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.prefix import running_totals_blocked
from ex_hivent_spark.plans.registry import register
from ex_hivent_spark.session_memo import session_memo


@session_memo
def cosupplier_frames(spark: SparkSession, sf_dir: str):
    """(sp, pairs): the distinct (supplier, part) bipartite list and
    the co-sourcing supplier pair-count frame, both lazily
    localCheckpointed and session-memoized. Two queries derive from
    this identical build (q_graph_copurchase_suppliers,
    q_graph_rich_club — whose edge set is exactly pairs' key set), and
    the pair expansion is the dominant stage of both (~3 s warm at
    sf0.1), so a session running the family back-to-back pays it once
    (the minhash_frames precedent). The pair expansion joins sp to
    itself ON THE PART KEY — group size is the per-part sourcing
    fan-out, so it is linear in |sp|, never |suppliers|²; the pinned
    pairs frame is ≤ C(|suppliers|, 2) rows of three integers."""
    sp = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = sp.select(F.col("s").alias("s_a"), "p")
    b = sp.select(F.col("s").alias("s_b"), "p")
    pairs = (
        a.join(b, "p")
        .filter(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_parts"))
        .localCheckpoint(eager=False)
    )
    return sp, pairs

# Distinct customer→part purchase edges — SQL CTE body.
_SQL_CP_EDGES = """
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
"""

_HITS_TOP = 20
_COSUP_TOP = 30
_BASKET_TOP = 40
_BASKET_MIN_SUPP = 2


def _cp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16 OPTIMIZATION: spread the single-row-group lineitem scan so
    # the join + distinct map side is parallel (guide §2.5/§6).
    l = spread_table(spark, sf_dir, "lineitem", "l_orderkey").select(
        "l_orderkey", "l_partkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )


@register(
    "q_graph_hits_step",
    oracle=f"""
    WITH edges AS ({_SQL_CP_EDGES}),
    auth1 AS (
      SELECT p, CAST(count(*) AS BIGINT) AS a1 FROM edges GROUP BY p
    ),
    hub1 AS (
      SELECT e.c, CAST(sum(a.a1) AS BIGINT) AS h1
      FROM edges e JOIN auth1 a ON a.p = e.p GROUP BY e.c
    ),
    auth2 AS (
      SELECT e.p, CAST(sum(h.h1) AS BIGINT) AS a2
      FROM edges e JOIN hub1 h ON h.c = e.c GROUP BY e.p
    ),
    nrm AS (
      SELECT {sql_dround(
          "sqrt(CAST(sum(CAST(CAST(a2 AS DOUBLE) * a2"
          " AS DECIMAL(38,6))) AS DOUBLE))", 6)} AS nn
      FROM auth2
    )
    SELECT t2.p AS partkey, a1.a1 AS in_degree, t2.a2 AS auth_score,
           {sql_dround("CAST(t2.a2 AS DOUBLE) / nrm.nn", 6)} AS auth_norm
    FROM auth2 t2 JOIN auth1 a1 ON a1.p = t2.p CROSS JOIN nrm
    ORDER BY t2.a2 DESC, t2.p LIMIT {_HITS_TOP}
    """,
)
def q_graph_hits_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full HITS iteration (Kleinberg) on the customer→part
    bipartite purchase graph from uniform initialization: authority¹ =
    in-degree, hub¹(c) = Σ authority¹ over c's parts, authority²(p) =
    Σ hub¹ over p's buyers — the top-20 "anchor products",
    ranked by endorsement from broad-basket customers rather than raw
    popularity (a part bought only by single-item customers scores
    below one bought by catalog-spanning ones at equal degree).

    Plan: three hash-aggregate half-steps over the distinct edge list
    (edges shuffle by part, then customer, then part — the bipartite
    message-passing pattern that scales to any edge count); the L2
    norm is one scalar aggregate; top-k is an orderBy+limit
    (TakeOrdered, no global sort materialization). Determinism:
    scores stay exact BIGINTs through both half-steps; each square is
    one IEEE double product (exact below 2^53, identical expressions
    beyond — the int64 product would wrap on Spark while DuckDB
    raises) summed through decimal(38,6); the one sqrt and the
    normalized ratio are e6-rounded; ties rank by part key."""
    edges = _cp_edges(spark, sf_dir).localCheckpoint(eager=False)
    auth1 = edges.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("a1")
    )
    hub1 = (
        edges.join(auth1, "p")
        .groupBy("c")
        .agg(F.sum("a1").cast("bigint").alias("h1"))
    )
    auth2 = (
        edges.join(hub1, "c")
        .groupBy("p")
        .agg(F.sum("h1").cast("bigint").alias("a2"))
    )
    # r17: pinning auth2 here was A/B-tested and REVERTED (min 2.60 ->
    # 3.81 s, jobs 15 -> 16): the extra materialization barrier costs
    # more than the norm broadcast's re-derivation of the aggregate
    # chain from the already-pinned edge list.
    nrm = auth2.agg(
        dround(
            F.sqrt(
                F.sum(
                    (F.col("a2").cast("double") * F.col("a2")).cast(
                        "decimal(38,6)"
                    )
                ).cast("double")
            ),
            6,
        ).alias("nn")
    )
    return (
        auth2.join(auth1, "p")
        .crossJoin(F.broadcast(nrm))
        .select(
            F.col("p").alias("partkey"),
            F.col("a1").alias("in_degree"),
            F.col("a2").alias("auth_score"),
            dround(F.col("a2").cast("double") / F.col("nn"), 6).alias(
                "auth_norm"
            ),
        )
        .orderBy(F.col("auth_score").desc(), "partkey")
        .limit(_HITS_TOP)
    )


@register(
    "q_graph_copurchase_suppliers",
    oracle=f"""
    WITH sp AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    deg AS (
      SELECT s, CAST(count(*) AS BIGINT) AS d FROM sp GROUP BY s
    ),
    pairs AS (
      SELECT a.s AS s_a, b.s AS s_b,
             CAST(count(*) AS BIGINT) AS common_parts
      FROM sp a JOIN sp b ON b.p = a.p AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT p.s_a, p.s_b, p.common_parts,
           da.d AS deg_a, db.d AS deg_b,
           {sql_dround(
               "CAST(p.common_parts AS DOUBLE)"
               " / (da.d + db.d - p.common_parts)", 6)} AS jaccard
    FROM pairs p
    JOIN deg da ON da.s = p.s_a
    JOIN deg db ON db.s = p.s_b
    ORDER BY p.common_parts DESC, p.s_a, p.s_b LIMIT {_COSUP_TOP}
    """,
)
def q_graph_copurchase_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier co-sourcing projection of the bipartite supplier–part
    graph: for each supplier pair, how many parts both ship and the
    Jaccard overlap of their catalogs — the substitutability /
    consolidation map (high overlap = interchangeable sources, the
    pairs a procurement platform plays against each other). Top
    30 edges by shared-part count.

    Plan: the projection joins the distinct (supplier, part) list to
    itself ON THE PART KEY — group size is the per-part sourcing
    fan-out (catalog-bounded, TPC-H ships 4), so the pair expansion
    is linear in |sp|, never |suppliers|²; degrees broadcast back.
    The sp + pair-count frames are session-memoized
    (:func:`cosupplier_frames` — q_graph_rich_club shares them).
    Determinism: counts are exact integers, one e6-rounded closing
    ratio, full-key tie-broken top-k."""
    sp, pairs = cosupplier_frames(spark, sf_dir)
    deg = sp.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    da = deg.select(F.col("s").alias("s_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("s").alias("s_b"), F.col("d").alias("deg_b"))
    return (
        pairs.join(F.broadcast(da), "s_a")
        .join(F.broadcast(db), "s_b")
        .select(
            "s_a",
            "s_b",
            "common_parts",
            "deg_a",
            "deg_b",
            dround(
                F.col("common_parts").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_parts")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("common_parts").desc(), "s_a", "s_b")
        .limit(_COSUP_TOP)
    )


@register(
    "q_basket_part_pairs",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    supp AS (
      SELECT p, CAST(count(*) AS BIGINT) AS s FROM op GROUP BY p
    ),
    n AS (
      SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM op
    ),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING count(*) >= {_BASKET_MIN_SUPP}
    )
    SELECT pr.part_a, pr.part_b, pr.n_both,
           sa.s AS n_orders_a, sb.s AS n_orders_b,
           {sql_dround(
               "CAST(n.n_orders AS DOUBLE) * pr.n_both"
               " / (CAST(sa.s AS DOUBLE) * sb.s)", 6)} AS lift
    FROM pairs pr
    JOIN supp sa ON sa.p = pr.part_a
    JOIN supp sb ON sb.p = pr.part_b
    CROSS JOIN n
    ORDER BY lift DESC, pr.part_a, pr.part_b LIMIT {_BASKET_TOP}
    """,
)
def q_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket part-pair lift: for part pairs co-occurring in at
    least 2 orders, lift = N·supp(ab)/(supp(a)·
    supp(b)) — how much more often the pair ships together than
    independence predicts (the association-rule screen behind
    "frequently bought together"). Top 40 pairs by lift.

    Plan: pair expansion joins the distinct (order, part) list to
    itself ON THE ORDER KEY — group size is the basket's line count
    (≤ 7 in TPC-H), so the blow-up is ≤ C(7,2) per order and linear
    overall; the min-support HAVING prunes the pair frame before the
    broadcast support joins. Determinism: supports are exact
    integers; lift is one e6-rounded double ratio; the top-k orders
    on the e6 grid with full part-key tie-break."""
    # r16 OPTIMIZATION (guide §2.5/§6): spread the single-row-group
    # lineitem scan so the distinct's map side runs on every core
    # instead of one task (steady-state pair aggregate 3.2 -> 1.3 s);
    # no-op on real multi-split inputs.
    op = (
        spread_table(spark, sf_dir, "lineitem", "l_orderkey")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    supp = op.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    n = op.agg(F.countDistinct("o").cast("bigint").alias("n_orders"))
    a = op.select("o", F.col("p").alias("part_a"))
    b = op.select("o", F.col("p").alias("part_b"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= _BASKET_MIN_SUPP)
    )
    sa = supp.select(
        F.col("p").alias("part_a"), F.col("s").alias("n_orders_a")
    )
    sb = supp.select(
        F.col("p").alias("part_b"), F.col("s").alias("n_orders_b")
    )
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_orders_a",
            "n_orders_b",
            dround(
                F.col("n_orders").cast("double")
                * F.col("n_both")
                / (
                    F.col("n_orders_a").cast("double")
                    * F.col("n_orders_b")
                ),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(_BASKET_TOP)
    )


@register(
    "q_agg_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS p,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM rev),
    ranked AS (
      SELECT p, cents,
             CAST(sum(cents) OVER (ORDER BY cents DESC, p
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum
      FROM rev
    ),
    classed AS (
      SELECT p, cents,
             CASE WHEN cum * 10 <= t * 7 THEN 'A'
                  WHEN cum * 10 <= t * 9 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked CROSS JOIN tot
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           floor(CAST(sum(cents) AS DOUBLE) / (SELECT t FROM tot)
                 * 1000000.0 + 0.5) / 1000000.0 AS rev_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def q_agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification of parts by revenue: parts are
    ranked by exact integer-cent revenue (descending, part-key
    tie-break) and classed A while the running share stays ≤ 70 % of
    total, B to 90 %, C after — the classical where-does-the-head-end
    split (class A is the sliver of SKUs carrying the business).
    Emits per-class part counts, revenue, and share.

    Plan: per-part revenue is one hash aggregate on exact cents; the
    global descending running sum rides the blocked prefix fold
    (operators/prefix.py — negated-cents blocks keep the order
    monotone; NO single-partition sort anywhere), and the class split
    compares 10·cum against 7·t / 9·t in pure integers (no float
    boundary can disagree between engines). The grand total t is a
    ONE-row driver collect off the checkpointed rev frame folded into
    the class predicate as literals — the r15 profile showed the
    former tot-aggregate + crossJoin(broadcast) pair bought two extra
    codegen stages for a scalar (steady-state after: ~1.3 s; the
    anchor's 3.4 s one-shot is per-plan codegen/stage setup, not data
    work — run-to-run same-session re-times drop 4.1→1.3 s with NO
    plan change). Determinism: integers end-to-end (t·7/t·9 are exact
    int64 products far below 2^63 at any SF); the one share ratio is
    e6-rounded against the exact int64→double t."""
    l = load_table(spark, sf_dir, "lineitem")
    rev = (
        l.select(
            F.col("l_partkey").alias("p"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
                + 0.5
            )
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("p")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
        .withColumn("neg", (-F.col("cents")).cast("bigint"))
        .localCheckpoint(eager=False)  # totals probe + prefix pass
    )
    t = rev.agg(F.sum("cents").cast("bigint")).collect()[0][0]
    if t is None:  # empty lineitem: F.sum over zero rows is NULL — the
        # oracle's GROUP BY over zero rows is an empty frame, so return
        # one of the declared schema instead of building `lit(None)*7`.
        return spark.createDataFrame(
            [],
            "abc_class string, n_parts bigint, revenue_cents bigint,"
            " rev_share double",
        )
    blocked = rev.withColumn("blk", F.expr("neg DIV 10000000"))
    ranked = running_totals_blocked(
        blocked,
        order_cols=["neg", "p"],
        block_cols=["blk"],
        sum_cols={"cents": "cum"},
    )
    classed = ranked.select(
        "cents",
        F.when(F.col("cum") * 10 <= F.lit(t * 7), F.lit("A"))
        .when(F.col("cum") * 10 <= F.lit(t * 9), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            "abc_class",
            "n_parts",
            "revenue_cents",
            dround(
                F.col("revenue_cents").cast("double") / F.lit(float(t)), 6
            ).alias("rev_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "q_agg_order_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       CAST(lag(o_orderdate) OVER w AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)
    ),
    g AS (SELECT CAST(gap AS BIGINT) AS gap FROM gaps
          WHERE gap IS NOT NULL),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap) AS BIGINT) AS s,
             CAST(max(gap) AS BIGINT) AS mx
      FROM g
    ),
    vc AS (
      SELECT gap, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY gap
    ),
    cum AS (
      SELECT gap, CAST(sum(cnt) OVER (ORDER BY gap
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS cum
      FROM vc
    ),
    multi AS (
      SELECT CAST(count(*) AS BIGINT) AS n_customers_multi
      FROM (SELECT o_custkey FROM orders
            GROUP BY o_custkey HAVING count(*) >= 2)
    )
    SELECT m.n_customers_multi, t.n AS n_gaps,
           floor(CAST(t.s AS DOUBLE) / t.n * 1000000.0 + 0.5)
             / 1000000.0 AS mean_gap_days,
           (SELECT min(gap) FROM cum, t WHERE cum * 2 >= t.n)
             AS p50_gap_days,
           (SELECT min(gap) FROM cum, t WHERE cum * 10 >= t.n * 9)
             AS p90_gap_days,
           t.mx AS max_gap_days
    FROM t, multi m
    """,
)
def q_agg_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: day gaps between each customer's
    consecutive orders (ordered by date then order key), summarized as
    count / mean / exact p50 / exact p90 / max plus the repeat-buyer
    headcount — the replenishment-cycle readout that calibrates churn
    windows and win-back timing.

    Plan: gaps come from one lag window partitioned by customer
    (per-customer order counts bound the frames); the exact
    percentiles ride the value-count trick — day-gaps form a tiny
    integer dimension, cumulated once, picked by the integer
    inequality 10·cum ≥ 9·n (inverse-CDF lower quantile; no float
    ceil to disagree on). Determinism: integer day arithmetic
    end-to-end; the one mean is e6-rounded."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate")).over(w).cast("date"),
        )
        .cast("bigint")
        .alias("gap")
    ).filter(F.col("gap").isNotNull()).localCheckpoint(eager=False)
    t = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("s"),
        F.max("gap").cast("bigint").alias("mx"),
    )
    vc = gaps.groupBy("gap").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vc.select(
        "gap", F.sum("cnt").over(wc).cast("bigint").alias("cum")
    ).localCheckpoint(eager=False)
    multi = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers_multi"))
    )
    tb = F.broadcast(t)
    p50 = (
        cum.crossJoin(tb)
        .filter(F.col("cum") * 2 >= F.col("n"))
        .agg(F.min("gap").alias("p50_gap_days"))
    )
    p90 = (
        cum.crossJoin(tb)
        .filter(F.col("cum") * 10 >= F.col("n") * 9)
        .agg(F.min("gap").alias("p90_gap_days"))
    )
    return (
        multi.crossJoin(tb)
        .crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p90))
        .select(
            "n_customers_multi",
            F.col("n").alias("n_gaps"),
            dround(F.col("s").cast("double") / F.col("n"), 6).alias(
                "mean_gap_days"
            ),
            "p50_gap_days",
            "p90_gap_days",
            F.col("mx").alias("max_gap_days"),
        )
    )


# Mix/rate decomposition periods (well-populated TPC-H order years).
_DECOMP_Y1 = 1995
_DECOMP_Y2 = 1996


@register(
    "q_agg_mix_rate_decomp",
    oracle=f"""
    WITH g1 AS (
      SELECT o_orderpriority AS segment,
             CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS rev1
      FROM orders WHERE year(o_orderdate) = {_DECOMP_Y1}
      GROUP BY 1
    ),
    g2 AS (
      SELECT o_orderpriority AS segment,
             CAST(count(*) AS BIGINT) AS n2,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS rev2
      FROM orders WHERE year(o_orderdate) = {_DECOMP_Y2}
      GROUP BY 1
    ),
    merged AS (
      SELECT COALESCE(g1.segment, g2.segment) AS segment,
             COALESCE(n1, 0) AS n1, COALESCE(rev1, 0.0) AS rev1,
             COALESCE(n2, 0) AS n2, COALESCE(rev2, 0.0) AS rev2
      FROM g1 FULL OUTER JOIN g2 ON g1.segment = g2.segment
    ),
    rates AS (
      SELECT segment, n1, n2, rev1, rev2,
             CASE WHEN n1 = 0 THEN 0.0
                  ELSE {sql_dround("rev1 / n1", 6)} END AS r1,
             CASE WHEN n2 = 0 THEN 0.0
                  ELSE {sql_dround("rev2 / n2", 6)} END AS r2
      FROM merged
    )
    SELECT segment, n1, n2, r1, r2,
           {sql_dround("rev2 - rev1", 6)} AS delta_rev,
           {sql_dround("(n2 - n1) * (r1 + r2) / 2.0", 6)}
             AS volume_effect,
           {sql_dround("(n1 + n2) / 2.0 * (r2 - r1)", 6)}
             AS rate_effect,
           {sql_dround(
               f"({sql_dround('rev2 - rev1', 6)})"
               f" - ({sql_dround('(n2 - n1) * (r1 + r2) / 2.0', 6)})"
               f" - ({sql_dround('(n1 + n2) / 2.0 * (r2 - r1)', 6)})",
               6)} AS recon_residual
    FROM rates
    """,
)
def q_agg_mix_rate_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bennet (symmetric) mix/rate decomposition of the year-over-year
    revenue change per order-priority segment: Δrev splits into a
    VOLUME effect Δn·r̄ (more orders at the average rate) and a RATE
    effect n̄·Δr (same orders at a higher average value) — the
    metric-tree root-cause readout ("did Q2 revenue move because we
    sold more or because orders got bigger, and in which segment?").
    recon_residual exposes the e6-rounding slack of the identity
    Δ(n·r) = Δn·r̄ + n̄·Δr so a consumer can assert the decomposition
    closes.

    Plan: two year-filtered hash aggregates of orders (filters push to
    the scan) full-outer-joined on the ≤5-row segment frame — segment
    cardinality bounded after the first aggregate. Determinism:
    revenue rides the decimal detour; rates and both effects are IEEE
    chains of integers and e6-rounded values, each closing e6-rounded;
    a segment absent from a year enters with n=0, rev=0, r=0 on both
    sides."""
    o = load_table(spark, sf_dir, "orders")

    def year_agg(yr: int, nn: str, rr: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == yr)
            .groupBy(F.col("o_orderpriority").alias("segment"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(nn),
                F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                .cast("double")
                .alias(rr),
            )
        )

    g1 = year_agg(_DECOMP_Y1, "n1", "rev1")
    g2 = year_agg(_DECOMP_Y2, "n2", "rev2")
    both = (
        g1.join(g2, "segment", "full_outer")
        .select(
            "segment",
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.coalesce("rev1", F.lit(0.0)).alias("rev1"),
            F.coalesce("n2", F.lit(0)).alias("n2"),
            F.coalesce("rev2", F.lit(0.0)).alias("rev2"),
        )
    )
    r1 = F.when(F.col("n1") == 0, F.lit(0.0)).otherwise(
        dround(F.col("rev1") / F.col("n1"), 6)
    )
    r2 = F.when(F.col("n2") == 0, F.lit(0.0)).otherwise(
        dround(F.col("rev2") / F.col("n2"), 6)
    )
    rates = both.select(
        "segment", "n1", "n2", "rev1", "rev2",
        r1.alias("r1"), r2.alias("r2"),
    )
    delta = dround(F.col("rev2") - F.col("rev1"), 6)
    vol = dround(
        (F.col("n2") - F.col("n1")) * (F.col("r1") + F.col("r2")) / 2.0, 6
    )
    rate = dround(
        (F.col("n1") + F.col("n2")) / 2.0 * (F.col("r2") - F.col("r1")), 6
    )
    return rates.select(
        "segment",
        "n1",
        "n2",
        "r1",
        "r2",
        delta.alias("delta_rev"),
        vol.alias("volume_effect"),
        rate.alias("rate_effect"),
        dround(delta - vol - rate, 6).alias("recon_residual"),
    )


# Rich-club degree-threshold grid (literal powers of two).
_RC_KS = (1, 2, 4, 8, 16, 32, 64)


@register(
    "q_graph_rich_club",
    oracle=f"""
    WITH sp AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.s AS s_a, b.s AS s_b
      FROM sp a JOIN sp b ON b.p = a.p AND a.s < b.s
    ),
    deg AS (
      SELECT s, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT s_a AS s FROM edges UNION ALL SELECT s_b AS s FROM edges
      ) GROUP BY s
    ),
    ecnt AS (
      SELECT {", ".join(
          f'''CAST(sum(CASE WHEN da.d > {k} AND db.d > {k}
                        THEN 1 ELSE 0 END) AS BIGINT) AS e{k}'''
          for k in _RC_KS
      )}
      FROM edges e
      JOIN deg da ON da.s = e.s_a JOIN deg db ON db.s = e.s_b
    ),
    ncnt AS (
      SELECT {", ".join(
          f'''CAST(sum(CASE WHEN d > {k} THEN 1 ELSE 0 END)
               AS BIGINT) AS n{k}'''
          for k in _RC_KS
      )}
      FROM deg
    )
    {" UNION ALL ".join(
        f'''SELECT CAST({k} AS BIGINT) AS k_threshold, n{k} AS n_nodes,
               e{k} AS n_edges,
               floor(2.0 * e{k} / (CAST(n{k} AS DOUBLE) * (n{k} - 1))
                     * 1000000.0 + 0.5) / 1000000.0 AS phi
        FROM ecnt CROSS JOIN ncnt WHERE n{k} >= 2'''
        for k in _RC_KS
    )}
    """,
)
def q_graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient curve of the supplier co-sourcing graph:
    for each literal degree threshold k, the density
    φ(k) = 2·E_{{>k}} / (N_{{>k}}·(N_{{>k}}−1)) among suppliers with
    more than k co-sourcing partners — a rising φ(k) says the
    best-connected suppliers preferentially source the same parts as
    EACH OTHER (consolidation risk at the top of the supply network).
    Thresholds with fewer than two qualifying nodes are dropped on
    both sides.

    Plan: edges are exactly the KEY SET of the session-memoized
    co-sourcing pair-count frame (:func:`cosupplier_frames` — shared
    with q_graph_copurchase_suppliers; a warm call never re-runs the
    part-key expansion, and the expansion is linear in |sp|, never
    |suppliers|²); degrees are one endpoint aggregate; ALL thresholds
    are conditional sums in ONE pass over the edge frame with the
    ≤|suppliers|-row degree frame broadcast, closing into ≤7 rows.
    Determinism: exact integer counts, one e6-rounded density per
    row."""
    _sp, pairs = cosupplier_frames(spark, sf_dir)
    edges = pairs.select("s_a", "s_b")
    deg = (
        edges.select(F.col("s_a").alias("s"))
        .unionAll(edges.select(F.col("s_b").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    da = deg.select(F.col("s").alias("s_a"), F.col("d").alias("da"))
    db = deg.select(F.col("s").alias("s_b"), F.col("d").alias("db"))
    je = edges.join(F.broadcast(da), "s_a").join(F.broadcast(db), "s_b")
    ecnt = je.agg(
        *[
            F.sum(
                F.when((F.col("da") > k) & (F.col("db") > k), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"e{k}")
            for k in _RC_KS
        ]
    )
    ncnt = deg.agg(
        *[
            F.sum(F.when(F.col("d") > k, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n{k}")
            for k in _RC_KS
        ]
    )
    one = ecnt.crossJoin(F.broadcast(ncnt))
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).cast("bigint").alias("k_threshold"),
                    F.col(f"n{k}").alias("n_nodes"),
                    F.col(f"e{k}").alias("n_edges"),
                )
                for k in _RC_KS
            ]
        )
    ).alias("rc")
    return (
        one.select(rows)
        .select(
            F.col("rc.k_threshold").alias("k_threshold"),
            F.col("rc.n_nodes").alias("n_nodes"),
            F.col("rc.n_edges").alias("n_edges"),
        )
        .filter(F.col("n_nodes") >= 2)
        .select(
            "k_threshold",
            "n_nodes",
            "n_edges",
            dround(
                2.0
                * F.col("n_edges")
                / (F.col("n_nodes").cast("double") * (F.col("n_nodes") - 1)),
                6,
            ).alias("phi"),
        )
    )


@register(
    "q_agg_price_realization",
    oracle=f"""
    WITH unit AS (
      SELECT l.l_partkey, p.p_brand, p.p_retailprice,
             {sql_dround(
                 "l.l_extendedprice / l.l_quantity"
                 " * (1.0 - l.l_discount)", 6)} AS realized_unit
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    g AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(p_retailprice AS DECIMAL(25,6))) AS DOUBLE)
               / count(*) AS list_mean,
             CAST(sum(CAST(realized_unit AS DECIMAL(25,6))) AS DOUBLE)
               / count(*) AS realized_mean
      FROM unit GROUP BY p_brand
    )
    SELECT p_brand, n_lines,
           {sql_dround("list_mean", 6)} AS list_mean,
           {sql_dround("realized_mean", 6)} AS realized_mean,
           {sql_dround("realized_mean / list_mean", 6)} AS realization
    FROM g
    """,
)
def q_agg_price_realization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price realization per brand: the mean post-discount realized
    unit price (extendedprice/quantity · (1−discount)) against the
    mean list price, and their ratio — the pocket-price waterfall
    headline (realization ≪ 1 flags brands whose list price is
    fiction; pairs with q_agg_price_elasticity to separate deliberate
    discounting from leakage).

    Plan: one part-key join (part side broadcastable), one hash
    aggregate to the ≤|brands| frame. Determinism: the per-line
    realized unit price is an e6-rounded per-row IEEE expression
    (quantity ≥ 1 always — the division is total); both means ride
    the decimal detour; closings are e6-rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    unit = li.join(
        F.broadcast(p.select("p_partkey", "p_brand", "p_retailprice")),
        li["l_partkey"] == p["p_partkey"],
    ).select(
        "p_brand",
        "p_retailprice",
        dround(
            F.col("l_extendedprice")
            / F.col("l_quantity")
            * (1.0 - F.col("l_discount")),
            6,
        ).alias("realized_unit"),
    )
    g = unit.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        (
            F.sum(F.col("p_retailprice").cast("decimal(25,6)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("list_mean"),
        (
            F.sum(F.col("realized_unit").cast("decimal(25,6)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("realized_mean"),
    )
    return g.select(
        "p_brand",
        "n_lines",
        dround(F.col("list_mean"), 6).alias("list_mean"),
        dround(F.col("realized_mean"), 6).alias("realized_mean"),
        dround(F.col("realized_mean") / F.col("list_mean"), 6).alias(
            "realization"
        ),
    )


@register(
    "q_agg_order_size_profile",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(floor(
                 l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
               AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_orderkey
    ),
    buckets AS (
      SELECT n_lines,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS c
      FROM per_order GROUP BY n_lines
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM buckets)
    SELECT n_lines, n_orders,
           floor(CAST(c AS DOUBLE) / 100.0 * 1000000.0 + 0.5)
             / 1000000.0 AS revenue,
           floor(CAST(c AS DOUBLE) / CAST(t AS DOUBLE) * 1000000.0
                 + 0.5) / 1000000.0 AS revenue_share,
           floor(CAST(c AS DOUBLE) / 100.0 / n_orders * 1000000.0
                 + 0.5) / 1000000.0 AS avg_order_value
    FROM buckets CROSS JOIN tot
    """,
)
def q_agg_order_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size profile: bucket orders by their line count and report
    how many orders, how much discounted revenue, what share of total
    revenue, and the average order value each basket size carries —
    the "do big baskets pay the bills?" merchandising readout that
    q_agg_pareto_coverage answers by customer and this answers by
    BASKET SHAPE (TPC-H orders carry 1–7 lines; a real catalog's tail
    is longer but the profile stays ≤ max-basket rows).

    Plan: one per-order hash aggregate over lineitem (map-side
    combine), one ≤max-basket-size aggregate, and the scalar total
    joins back broadcast — no window and no second lineitem pass.
    Determinism: revenue is exact integer cents per line
    (floor(x·100+0.5) of the deterministic IEEE product) summed as
    BIGINTs end-to-end; every closing converts cents to DOUBLE once
    (exact below 2⁵³ — ~9e13 dollars — and correctly-rounded
    identically beyond) and e6-rounds after the division chain."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (1.0 - F.col("l_discount"))
                * 100.0
                + 0.5
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("cents"),
    )
    buckets = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("c"),
    )
    # r17: pin the tiny bucket frame (the cms_audit/grid_density
    # pattern) — the grand total used to ride as
    # crossJoin(broadcast(buckets.agg(...))), a broadcast job that
    # recomputed the full lineitem per-order aggregate before the main
    # job started. Pinned, both consumers read the ≤|n_lines|-row
    # materialization: one lineitem pass.
    buckets = buckets.localCheckpoint(eager=False)
    tot = buckets.agg(F.sum("c").cast("bigint").alias("t"))
    cd = F.col("c").cast("double")
    return buckets.crossJoin(F.broadcast(tot)).select(
        "n_lines",
        "n_orders",
        dround(cd / 100.0, 6).alias("revenue"),
        dround(cd / F.col("t").cast("double"), 6).alias("revenue_share"),
        dround(cd / 100.0 / F.col("n_orders"), 6).alias(
            "avg_order_value"
        ),
    )


_SQL_CENTS = (
    "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)"
    " AS BIGINT)"
)


@register(
    "q_agg_nation_trade_balance",
    oracle=f"""
    WITH exp AS (
      SELECT n.n_name AS nation,
             CAST(sum({_SQL_CENTS}) AS BIGINT) AS exp_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    imp AS (
      SELECT n.n_name AS nation,
             CAST(sum({_SQL_CENTS}) AS BIGINT) AS imp_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT coalesce(e.nation, i.nation) AS nation,
           CAST(coalesce(e.exp_cents, 0) AS BIGINT) AS exp_cents,
           CAST(coalesce(i.imp_cents, 0) AS BIGINT) AS imp_cents,
           CAST(coalesce(e.exp_cents, 0) - coalesce(i.imp_cents, 0)
                AS BIGINT) AS net_cents,
           {sql_dround(
               "CAST(coalesce(e.exp_cents, 0)"
               " - coalesce(i.imp_cents, 0) AS DOUBLE)"
               " / (coalesce(e.exp_cents, 0)"
               " + coalesce(i.imp_cents, 0))", 6)} AS balance_ratio
    FROM exp e FULL OUTER JOIN imp i ON e.nation = i.nation
    """,
)
def q_agg_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation trade balance on the order flow: each nation's revenue
    as a SUPPLIER of shipped lines (exports) vs as the ordering
    CUSTOMER's nation (imports), the net, and the normalized balance
    (net / gross ∈ [−1, 1]) — the two-role star join that answers
    "which geographies produce vs consume?", the regional twin of
    TPC-H Q7's nation-pair volume.

    Plan: TWO passes over lineitem, each a star join with every dim
    broadcastable (supplier/nation on one side; the orders join
    shuffles on the order key, then customer/nation broadcast), each
    collapsing to ≤|nations| rows before the full-outer alignment of
    the two role totals (aggregate-sized sides). Determinism: revenue
    is exact integer cents per line (floor(x·100+0.5)) summed as
    BIGINTs; the closing ratio casts the integer net to DOUBLE once
    over the integer gross, e6-rounded (gross > 0 whenever a nation
    row exists)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
        + 0.5
    ).cast("bigint")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    exp = (
        li.select("l_suppkey", cents.alias("cents"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("bigint").alias("exp_cents"))
    )
    imp = (
        li.select("l_orderkey", cents.alias("cents"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("bigint").alias("imp_cents"))
    )
    j = exp.withColumnRenamed("nation", "e_nation").join(
        imp.withColumnRenamed("nation", "i_nation"),
        F.col("e_nation") == F.col("i_nation"),
        "full_outer",
    )
    ec = F.coalesce(F.col("exp_cents"), F.lit(0)).cast("bigint")
    ic = F.coalesce(F.col("imp_cents"), F.lit(0)).cast("bigint")
    return j.select(
        F.coalesce(F.col("e_nation"), F.col("i_nation")).alias("nation"),
        ec.alias("exp_cents"),
        ic.alias("imp_cents"),
        (ec - ic).cast("bigint").alias("net_cents"),
        dround((ec - ic).cast("double") / (ec + ic), 6).alias(
            "balance_ratio"
        ),
    )


@register(
    "q_agg_nation_brand_lift",
    oracle=f"""
    WITH cell AS (
      SELECT n.n_name AS nation, p.p_brand AS brand,
             CAST(sum({_SQL_CENTS}) AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY n.n_name, p.p_brand
    ),
    nm AS (
      SELECT nation, CAST(sum(cents) AS BIGINT) AS n_cents
      FROM cell GROUP BY nation
    ),
    bm AS (
      SELECT brand, CAST(sum(cents) AS BIGINT) AS b_cents
      FROM cell GROUP BY brand
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM cell)
    SELECT cell.nation, cell.brand, cell.cents,
           {sql_dround(
               "CAST(cell.cents AS DOUBLE) * t"
               " / (CAST(n_cents AS DOUBLE) * b_cents)", 6)} AS lift
    FROM cell
    JOIN nm ON cell.nation = nm.nation
    JOIN bm ON cell.brand = bm.brand
    CROSS JOIN tot
    """,
)
def q_agg_nation_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation×brand revenue affinity lift: observed cell revenue over
    the independence expectation — lift(n,b) = rev(n,b)·T /
    (rev(n)·rev(b)) — the cross-dimensional "who over-indexes on
    what?" matrix behind assortment localization (lift ≫ 1: that
    nation's customers disproportionately buy that brand). The
    two-dimensional sibling of q_basket_event_lift's within-basket
    pair lift.

    Plan: ONE lineitem pass through the star (orders shuffle-join on
    the order key; customer/nation/part all broadcast) collapsing to
    the ≤|nations|·|brands| cell grid; both margins and the total are
    aggregates OF THE CELL GRID (aggregate-sized — the corpus is never
    re-scanned) joined back broadcastable. Determinism: revenue is
    exact integer cents per line summed as BIGINTs; the lift casts
    each integer to DOUBLE in identical order (granger discipline) and
    e6-rounds; margins are positive wherever a cell exists."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
        + 0.5
    ).cast("bigint")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cell = (
        li.select("l_orderkey", "l_partkey", cents.alias("cents"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    cell = cell.localCheckpoint(eager=False)
    nm = cell.groupBy(F.col("nation").alias("mn")).agg(
        F.sum("cents").cast("bigint").alias("n_cents")
    )
    bm = cell.groupBy(F.col("brand").alias("mb")).agg(
        F.sum("cents").cast("bigint").alias("b_cents")
    )
    tot = cell.agg(F.sum("cents").cast("bigint").alias("t"))
    j = (
        cell.join(F.broadcast(nm), F.col("nation") == F.col("mn"))
        .join(F.broadcast(bm), F.col("brand") == F.col("mb"))
        .crossJoin(F.broadcast(tot))
    )
    return j.select(
        "nation",
        "brand",
        "cents",
        dround(
            F.col("cents").cast("double")
            * F.col("t")
            / (F.col("n_cents").cast("double") * F.col("b_cents")),
            6,
        ).alias("lift"),
    )
