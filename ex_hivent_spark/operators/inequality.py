"""Income-inequality indices over per-customer spend, by nation: the
Theil T index (the entropy-based inequality measure that decomposes
additively between/within groups) and the Atkinson index at ε=1 (the
welfare-normative measure 1 − geomean/mean) — the two standard
complements to the Gini/Lorenz pair already in operators/drift.py
(different axiomatics: Theil is decomposable, Atkinson carries an
explicit inequality-aversion parameter, Gini is rank-based).

Both consume the same per-customer total-spend frame (one hash
aggregate of orders + two dimension joins), session-memoized via
ex_hivent_spark.session_memo — first caller pays, the pair shares.

Scale shape: orders collapse to |customers| rows in one partial-
aggregated shuffle; nation joins broadcast (25 rows); the index
closings are per-nation hash aggregates. Magnitude discipline: sums
stay per-nation (≤ ~1.5e9 at scale 6 — inside the 2^53 unscaled-
decimal bound the global sum would breach at sf0.1+).

Determinism: per-customer spend is a decimal-detour sum; each ln/exp
(libm) is e6-rounded on both sides (the q_agg_geometric_mean
convention); ratios are single IEEE divisions of deterministic
doubles; every computed double is e6-rounded before decimal
re-aggregation.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no analytics surface; these derive from the
driver's analytics mandate and the standard inequality-measurement
literature (Theil 1967; Atkinson 1970).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register
from ex_hivent_spark.session_memo import session_memo

# Shared DuckDB CTE: per-customer spend tagged with nation name.
_SQL_SPEND = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS x
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT n.n_name AS nation, s.x, s.o_custkey AS ck
      FROM spend s
      JOIN customer c ON c.c_custkey = s.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    g AS (
      SELECT nation,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx
      FROM j GROUP BY nation
    )
"""


@session_memo
def _nation_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, x): per-customer total spend with nation name, lazily
    localCheckpointed + session-memoized — both inequality indices
    derive from the identical frame. Customers with no orders are
    excluded (spend is undefined, and x > 0 holds for every included
    row since o_totalprice > 0 — the ln() domain guard)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("x")
    )
    return (
        spend.join(
            customer.select("c_custkey", "c_nationkey"),
            spend["o_custkey"] == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        # ck rides along as the deterministic rank tie-break for the
        # quantile-share ops (palma); the index ops ignore it.
        .select(
            F.col("n_name").alias("nation"),
            "x",
            F.col("o_custkey").alias("ck"),
        )
        .localCheckpoint(eager=False)
    )


def _nation_sums(j: DataFrame) -> DataFrame:
    """Per-nation (n_customers, sx) totals of the spend frame."""
    return j.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.col("x").cast("decimal(25,6)")).cast("double").alias("sx"),
    )


@register(
    "q_agg_theil_index",
    oracle=_SQL_SPEND
    + f""",
    terms AS (
      SELECT j.nation,
             {sql_dround(
                 "(j.x / (g.sx / g.n_customers))"
                 " * (" + sql_dround(
                     "ln(j.x / (g.sx / g.n_customers))", 6) + ")", 6,
             )} AS term
      FROM j JOIN g USING (nation)
    )
    SELECT g.nation, g.n_customers,
           {sql_dround("g.sx / g.n_customers", 6)} AS mean_spend,
           {sql_dround(
               "CAST(sum(CAST(t.term AS DECIMAL(25,6))) AS DOUBLE)"
               " / g.n_customers", 6,
           )} AS theil_t
    FROM terms t JOIN g USING (nation)
    GROUP BY g.nation, g.n_customers, g.sx
    """,
)
def q_agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of customer-spend inequality within each nation:
    T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ) over purchasing customers — 0 when
    every customer spends the same, ln(n) at maximal concentration.
    The decomposable companion to q_agg_gini_concentration: unlike
    Gini, per-group Theils aggregate exactly into a total (between +
    within), which is why mix-shift analyses prefer it.

    Plan: one partial-aggregated customer rollup, broadcast nation
    join, a 25-row per-nation totals frame joined back broadcast-size,
    one closing aggregate. Determinism: spend and per-nation sums ride
    the decimal detour; x/μ is a single IEEE division; ln is
    e6-rounded per row (geometric-mean convention); the term product
    is e6-rounded before its decimal sum; the closing mean divides by
    an exact count and e6-rounds."""
    j = _nation_spend(spark, sf_dir)
    g = _nation_sums(j)
    mu = F.col("sx") / F.col("n_customers")
    r = F.col("x") / mu
    terms = j.join(F.broadcast(g), "nation").select(
        "nation",
        dround(r * dround(F.log(r), 6), 6).alias("term"),
    )
    return (
        terms.groupBy("nation")
        .agg(
            F.sum(F.col("term").cast("decimal(25,6)"))
            .cast("double")
            .alias("sterm")
        )
        .join(F.broadcast(g), "nation")
        .select(
            "nation",
            "n_customers",
            dround(mu, 6).alias("mean_spend"),
            dround(F.col("sterm") / F.col("n_customers"), 6).alias(
                "theil_t"
            ),
        )
    )


@register(
    "q_agg_atkinson_index",
    oracle=_SQL_SPEND
    + f""",
    lx AS (
      SELECT nation, {sql_dround("ln(x)", 6)} AS lx FROM j
    ),
    la AS (
      SELECT nation,
             CAST(sum(CAST(lx AS DECIMAL(25,6))) AS DOUBLE) AS slx
      FROM lx GROUP BY nation
    )
    SELECT g.nation, g.n_customers,
           {sql_dround("g.sx / g.n_customers", 6)} AS mean_spend,
           {sql_dround("exp(" + sql_dround("la.slx / g.n_customers", 6)
                       + ")", 6)} AS geo_mean_spend,
           {sql_dround(
               "1.0 - (" + sql_dround(
                   "exp(" + sql_dround("la.slx / g.n_customers", 6) + ")",
                   6) + ") / (g.sx / g.n_customers)", 6,
           )} AS atkinson_1
    FROM g JOIN la USING (nation)
    """,
)
def q_agg_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index at aversion ε=1 for customer spend
    within each nation: A₁ = 1 − geomean(x)/mean(x) — the share of
    total spend society would give up to equalize, under log utility.
    0 for perfect equality, →1 as concentration grows; reported next
    to both means so the geometric/arithmetic gap is auditable.

    Plan: the session-memoized spend frame shared with
    q_agg_theil_index, one log map, two per-nation hash aggregates.
    Determinism: ln and the closing exp are e6-rounded (libm
    convention); log sums ride the decimal detour; x > 0 for every
    row by construction (o_totalprice > 0)."""
    j = _nation_spend(spark, sf_dir)
    g = _nation_sums(j)
    la = (
        j.select("nation", dround(F.log("x"), 6).alias("lx"))
        .groupBy("nation")
        .agg(
            F.sum(F.col("lx").cast("decimal(25,6)"))
            .cast("double")
            .alias("slx")
        )
    )
    mu = F.col("sx") / F.col("n_customers")
    geo = dround(F.exp(dround(F.col("slx") / F.col("n_customers"), 6)), 6)
    return g.join(la, "nation").select(
        "nation",
        "n_customers",
        dround(mu, 6).alias("mean_spend"),
        geo.alias("geo_mean_spend"),
        dround(1.0 - geo / mu, 6).alias("atkinson_1"),
    )


@register(
    "q_agg_theil_decomposition",
    oracle=_SQL_SPEND
    + f""",
    tot AS (
      SELECT CAST(sum(n_customers) AS BIGINT) AS nn,
             CAST(sum(CAST(sx AS DECIMAL(38,6))) AS DOUBLE) AS sxt
      FROM g
    ),
    terms AS (
      SELECT {sql_dround(
          "(j.x / (t.sxt / t.nn))"
          " * (" + sql_dround("ln(j.x / (t.sxt / t.nn))", 6) + ")", 6,
      )} AS term
      FROM j CROSS JOIN tot t
    ),
    total AS (
      SELECT {sql_dround(
          "CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE)"
          " / (SELECT nn FROM tot)", 6)} AS t_total
      FROM terms
    ),
    within_g AS (
      SELECT g.nation,
             g.sx / t.sxt AS sg,
             {sql_dround(
                 "CAST(sum(CAST(" + sql_dround(
                     "(j.x / (g.sx / g.n_customers))"
                     " * (" + sql_dround(
                         "ln(j.x / (g.sx / g.n_customers))", 6) + ")",
                     6) + " AS DECIMAL(25,6))) AS DOUBLE)"
                 " / g.n_customers", 6)} AS t_g
      FROM j JOIN g USING (nation) CROSS JOIN tot t
      GROUP BY g.nation, g.sx, g.n_customers, t.sxt
    ),
    parts AS (
      SELECT
        CAST(sum(CAST({sql_dround("sg * t_g", 6)}
                      AS DECIMAL(25,6))) AS DOUBLE) AS t_within,
        CAST(sum(CAST({sql_dround(
            "sg * (" + sql_dround(
                "ln(sg * (SELECT nn FROM tot)"
                "   / (SELECT CAST(n_customers AS DOUBLE) FROM g g2"
                "      WHERE g2.nation = within_g.nation))", 6) + ")",
            6)} AS DECIMAL(25,6))) AS DOUBLE) AS t_between
      FROM within_g
    )
    SELECT (SELECT nn FROM tot) AS n_customers,
           (SELECT t_total FROM total) AS t_total,
           {sql_dround("t_between", 6)} AS t_between,
           {sql_dround("t_within", 6)} AS t_within,
           {sql_dround(
               "abs((SELECT t_total FROM total) - t_between - t_within)",
               6)} AS recon_residual
    FROM parts
    """,
)
def q_agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Theil T between/within decomposition over nations — the
    property q_agg_theil_index exists for: T_total = T_between +
    Σ_g s_g·T_g exactly (s_g = nation g's spend share), so the one
    row this emits tells you whether customer-spend inequality lives
    BETWEEN markets (nation means differ) or WITHIN them — with the
    reconciliation residual as an audit column (≈0 up to the e6
    rounding of the parts; a large residual would mean the inputs
    disagree, which is exactly what an auditor wants surfaced).

    Plan: the session-memoized spend frame (shared with both index
    queries), its 25-row per-nation totals, one global scalar
    aggregate, one all-customer term pass — the only corpus-sized
    work is the per-customer term map. Magnitude discipline: the
    global spend total sums the 25 per-nation DOUBLES at
    decimal(38,6) (one cast of a ~1e10 value — its ~1-ulp
    double-rounding drift enters only RATIOS, never an emitted e6
    absolute); every emitted statistic is O(1). Determinism: the
    geometric-mean ln/e6 convention throughout; shares are single
    divisions of deterministic doubles."""
    j = _nation_spend(spark, sf_dir)
    g = _nation_sums(j)
    tot = g.agg(
        F.sum("n_customers").cast("bigint").alias("nn"),
        F.sum(F.col("sx").cast("decimal(38,6)")).cast("double").alias(
            "sxt"
        ),
    )
    mu_all = F.col("sxt") / F.col("nn")
    r_all = F.col("x") / mu_all
    total = (
        j.crossJoin(F.broadcast(tot))
        .select(dround(r_all * dround(F.log(r_all), 6), 6).alias("term"), "nn")
        .groupBy("nn")
        .agg(
            dround(
                F.sum(F.col("term").cast("decimal(25,6)")).cast("double")
                / F.col("nn"),
                6,
            ).alias("t_total")
        )
    )
    mu_g = F.col("sx") / F.col("n_customers")
    r_g = F.col("x") / mu_g
    within_g = (
        j.join(F.broadcast(g), "nation")
        .crossJoin(F.broadcast(tot))
        .groupBy("nation", "sx", "n_customers", "sxt", "nn")
        .agg(
            dround(
                F.sum(
                    dround(r_g * dround(F.log(r_g), 6), 6).cast(
                        "decimal(25,6)"
                    )
                ).cast("double")
                / F.col("n_customers"),
                6,
            ).alias("t_g")
        )
        .select(
            (F.col("sx") / F.col("sxt")).alias("sg"),
            "t_g",
            "n_customers",
            "nn",
        )
    )
    between_term = F.col("sg") * dround(
        F.log(
            F.col("sg") * F.col("nn") / F.col("n_customers").cast("double")
        ),
        6,
    )
    parts = within_g.agg(
        F.sum(dround(F.col("sg") * F.col("t_g"), 6).cast("decimal(25,6)"))
        .cast("double")
        .alias("t_within"),
        F.sum(dround(between_term, 6).cast("decimal(25,6)"))
        .cast("double")
        .alias("t_between"),
    )
    return (
        parts.crossJoin(F.broadcast(tot.select("nn")))
        .crossJoin(F.broadcast(total.select("t_total")))
        .select(
            F.col("nn").alias("n_customers"),
            "t_total",
            dround(F.col("t_between"), 6).alias("t_between"),
            dround(F.col("t_within"), 6).alias("t_within"),
            dround(
                F.abs(
                    F.col("t_total") - F.col("t_between") - F.col("t_within")
                ),
                6,
            ).alias("recon_residual"),
        )
    )


@register(
    "q_agg_ge2_index",
    oracle=_SQL_SPEND
    + f""",
    sq AS (
      SELECT j.nation,
             CAST(sum(CAST({sql_dround(
                 "(j.x / (g.sx / g.n_customers))"
                 " * (j.x / (g.sx / g.n_customers))", 6,
             )} AS DECIMAL(38,6))) AS DOUBLE) AS srr
      FROM j JOIN g USING (nation)
      GROUP BY j.nation
    )
    SELECT g.nation, g.n_customers,
           {sql_dround("(srr / g.n_customers - 1.0) / 2.0", 6)} AS ge2,
           {sql_dround(
               "sqrt(srr / g.n_customers - 1.0)", 6)} AS cv
    FROM g JOIN sq USING (nation)
    """,
)
def q_agg_ge2_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GE(2), the half-squared-coefficient-of-variation member of the
    generalized-entropy inequality family, per nation:
    GE(2) = ((1/n)·Σ(xᵢ/μ)² − 1)/2, reported with the CV itself —
    completing the family next to q_agg_theil_index (GE(1)) and
    q_agg_atkinson_index: GE(2) is the top-sensitive member (weights
    the right tail), Theil the middle, Atkinson(1) the bottom, so the
    three TOGETHER localize where the concentration lives. The only
    libm call is the closing sqrt; the ratios are pure arithmetic.

    Plan: the session-memoized spend frame shared with the whole
    family; one per-nation aggregate of e6-rounded squared shares
    (share ≤ ~n, squares bounded — decimal(38,6) sums stay far inside
    2^53), one 25-row closing join. Determinism: shares are single
    divisions of deterministic doubles; squares e6-round before the
    decimal sum; both outputs e6-round (mean ratio ≥ 1 by Jensen, so
    the sqrt argument is non-negative up to e6 slack — and exact 0
    only under perfect equality, where sqrt(0) is exact)."""
    j = _nation_spend(spark, sf_dir)
    g = _nation_sums(j)
    mu = F.col("sx") / F.col("n_customers")
    r = F.col("x") / mu
    sq = (
        j.join(F.broadcast(g), "nation")
        .select("nation", dround(r * r, 6).alias("rr"))
        .groupBy("nation")
        .agg(
            F.sum(F.col("rr").cast("decimal(38,6)"))
            .cast("double")
            .alias("srr")
        )
    )
    mean_rr = F.col("srr") / F.col("n_customers")
    return g.join(sq, "nation").select(
        "nation",
        "n_customers",
        dround((mean_rr - 1.0) / 2.0, 6).alias("ge2"),
        dround(F.sqrt(mean_rr - 1.0), 6).alias("cv"),
    )


@register(
    "q_agg_pietra_index",
    oracle=_SQL_SPEND
    + f""",
    terms AS (
      SELECT j.nation,
             {sql_dround("abs(j.x - g.sx / g.n_customers)", 6)} AS term
      FROM j JOIN g USING (nation)
    )
    SELECT g.nation, g.n_customers,
           {sql_dround("g.sx / g.n_customers", 6)} AS mean_spend,
           {sql_dround(
               "CAST(sum(CAST(t.term AS DECIMAL(25,6))) AS DOUBLE)"
               " / (2.0 * g.sx)", 6,
           )} AS pietra
    FROM terms t JOIN g USING (nation)
    GROUP BY g.nation, g.n_customers, g.sx
    """,
)
def q_agg_pietra_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pietra (Hoover/Robin Hood) index of customer-spend inequality
    within each nation: P = Σ|xᵢ−μ| / (2·Σxᵢ) — the share of total
    spend that would have to move between customers to equalize
    everyone. The L1 companion to Theil (entropy) and Atkinson
    (welfare): Pietra is the maximal vertical gap between the Lorenz
    curve and the diagonal, so it reads directly off
    q_agg_lorenz_points.

    Plan: the session-memoized per-customer spend frame (shared with
    theil/atkinson/ge2), a 25-row per-nation totals broadcast, one
    closing aggregate. Determinism: |x−μ| is one IEEE subtraction +
    abs of deterministic doubles, e6-rounded per row, decimal-summed;
    the closing ratio divides by 2·sx (a deterministic double) and
    e6-rounds. Per-nation term sums stay ≤ 2·sx ≈ 1.5e9 at big SF —
    inside the 2^53 unscaled-decimal bound."""
    j = _nation_spend(spark, sf_dir)
    g = _nation_sums(j)
    mu = F.col("sx") / F.col("n_customers")
    terms = j.join(F.broadcast(g), "nation").select(
        "nation",
        dround(F.abs(F.col("x") - mu), 6).alias("term"),
    )
    return (
        terms.groupBy("nation")
        .agg(
            F.sum(F.col("term").cast("decimal(25,6)"))
            .cast("double")
            .alias("sterm")
        )
        .join(F.broadcast(g), "nation")
        .select(
            "nation",
            "n_customers",
            dround(mu, 6).alias("mean_spend"),
            dround(F.col("sterm") / (2.0 * F.col("sx")), 6).alias("pietra"),
        )
    )


@register(
    "q_agg_palma_ratio",
    oracle=_SQL_SPEND
    + f""",
    ranked AS (
      SELECT nation, x, ck,
             row_number() OVER (PARTITION BY nation
                                ORDER BY x DESC, ck) AS rd,
             row_number() OVER (PARTITION BY nation
                                ORDER BY x ASC, ck) AS ra
      FROM j
    ),
    kk AS (
      SELECT nation, n_customers, sx,
             greatest(CAST(1 AS BIGINT),
                      CAST(floor(CAST(n_customers AS DOUBLE) / 10.0)
                           AS BIGINT)) AS top_k,
             greatest(CAST(1 AS BIGINT),
                      CAST(floor(CAST(n_customers AS DOUBLE) * 2.0 / 5.0)
                           AS BIGINT)) AS bot_k
      FROM g
    ),
    shares AS (
      SELECT k.nation, k.n_customers, k.top_k, k.bot_k, k.sx,
             CAST(sum(CASE WHEN r.rd <= k.top_k
                           THEN CAST(r.x AS DECIMAL(25,6)) END)
                  AS DOUBLE) AS s_top,
             CAST(sum(CASE WHEN r.ra <= k.bot_k
                           THEN CAST(r.x AS DECIMAL(25,6)) END)
                  AS DOUBLE) AS s_bot
      FROM ranked r JOIN kk k USING (nation)
      GROUP BY k.nation, k.n_customers, k.top_k, k.bot_k, k.sx
    )
    SELECT nation, n_customers, top_k, bot_k,
           {sql_dround("s_top / sx", 6)} AS top_share,
           {sql_dround("s_bot / sx", 6)} AS bot_share,
           {sql_dround("s_top / s_bot", 6)} AS palma
    FROM shares
    """,
)
def q_agg_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio of customer-spend inequality within each nation:
    the top-decile spend share divided by the bottom-40% share — the
    quantile-based index policy work prefers over Gini because it
    isolates the two tails that actually move (Palma 2011; Cobham &
    Sumner 2013). Group sizes floor at 1 so small nations stay
    defined (the sf0.001 guard: ~6 customers per nation).

    Plan: the memoized spend frame, two per-nation rank windows
    (partition-bounded — |customers|/|nations| rows each, never
    global), one conditional-sum aggregate, a 25-row closing.
    Determinism: both ranks tie-break on the customer key (ck); group
    cutoffs are floor(n/10.0) on IEEE doubles (identical in both
    engines); tail sums ride the decimal detour; the three closing
    ratios are single IEEE divisions, e6-rounded."""
    from pyspark.sql import Window

    j = _nation_spend(spark, sf_dir)
    g = _nation_sums(j)
    wd = Window.partitionBy("nation").orderBy(F.col("x").desc(), "ck")
    wa = Window.partitionBy("nation").orderBy(F.col("x").asc(), "ck")
    ranked = j.select(
        "nation",
        "x",
        F.row_number().over(wd).alias("rd"),
        F.row_number().over(wa).alias("ra"),
    )
    one = F.lit(1).cast("bigint")
    kk = g.select(
        "nation",
        "n_customers",
        "sx",
        F.greatest(
            one,
            F.floor(F.col("n_customers").cast("double") / 10.0).cast(
                "bigint"
            ),
        ).alias("top_k"),
        F.greatest(
            one,
            F.floor(
                F.col("n_customers").cast("double") * 2.0 / 5.0
            ).cast("bigint"),
        ).alias("bot_k"),
    )
    dec = "decimal(25,6)"
    shares = (
        ranked.join(F.broadcast(kk), "nation")
        .groupBy("nation", "n_customers", "top_k", "bot_k", "sx")
        .agg(
            F.sum(
                F.when(F.col("rd") <= F.col("top_k"), F.col("x").cast(dec))
            )
            .cast("double")
            .alias("s_top"),
            F.sum(
                F.when(F.col("ra") <= F.col("bot_k"), F.col("x").cast(dec))
            )
            .cast("double")
            .alias("s_bot"),
        )
    )
    return shares.select(
        "nation",
        "n_customers",
        "top_k",
        "bot_k",
        dround(F.col("s_top") / F.col("sx"), 6).alias("top_share"),
        dround(F.col("s_bot") / F.col("sx"), 6).alias("bot_share"),
        dround(F.col("s_top") / F.col("s_bot"), 6).alias("palma"),
    )
