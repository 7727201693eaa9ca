"""Categorical / ordinal association measures: Theil's uncertainty
coefficient (the entropy-based asymmetric "how predictable is the
event type from the hour of day"), Cohen's kappa
(chance-corrected agreement between two labelings of the document
corpus), and the Goodman–Kruskal gamma / Somers' D pair (ordinal
concordance between part size and its price band). They complete the
association toolkit next to q_stats_cramers_v (symmetric nominal),
q_stats_kendall_tau (continuous ordinal) and q_ts_spearman_corr.

Plan discipline: data volume only enters through contingency-cell
hash aggregates — (type × hour-of-day) is ≤ 120 cells, (lang × lang)
≤ 25, (size × price-band) ≤ ~500 (50 sizes × 10 bands) — and every pair computation runs
on the BOUNDED cell frame (a broadcast cell×cell join is |cells|²,
data-volume invariant), never on raw rows. No windows at all.

Determinism: integer cell counts; every ln (libm) e6-rounded per
bounded cell before its decimal sum; concordance products are exact
integer arithmetic widened to decimal(38,0); closing ratios
e6-rounded.

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no statistics surface;
these derive from the driver's analytics mandate and standard
categorical-data practice (Theil 1970, Cohen 1960,
Goodman–Kruskal 1954, Somers 1962).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, spread_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# Price-band width for the ordinal part grid (p_retailprice spans
# 900-1000 — 10 bands; fixed literal banding, never a data-dependent
# ntile).
_PRICE_BAND = 10.0


@register(
    "q_stats_theil_u",
    oracle=f"""
    WITH cells AS (
      SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    tm AS (SELECT t, CAST(sum(c) AS BIGINT) AS ct FROM cells GROUP BY t),
    hm AS (SELECT h, CAST(sum(c) AS BIGINT) AS ch FROM cells GROUP BY h),
    ht AS (
      SELECT CAST(sum(CAST(
               {sql_dround(
                   "-(CAST(ct AS DOUBLE) / n)"
                   " * ln(CAST(ct AS DOUBLE) / n)", 6)}
             AS DECIMAL(25,6))) AS DOUBLE) AS h_type
      FROM tm CROSS JOIN tot
    ),
    hc AS (
      SELECT CAST(sum(CAST(
               {sql_dround(
                   "-(CAST(c AS DOUBLE) / n)"
                   " * ln(CAST(c AS DOUBLE) / ch)", 6)}
             AS DECIMAL(25,6))) AS DOUBLE) AS h_cond
      FROM cells JOIN hm USING (h) CROSS JOIN tot
    )
    SELECT n AS n_events, {sql_dround("h_type", 6)} AS h_type,
           {sql_dround("h_cond", 6)} AS h_cond,
           {sql_dround("(h_type - h_cond) / h_type", 6)} AS theil_u
    FROM ht CROSS JOIN hc CROSS JOIN tot
    """,
)
def q_stats_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(type | hour-of-day): the
    fraction of event-type entropy explained by knowing the hour,
    (H(T) − H(T|H)) / H(T) from the (type × hour) contingency — the
    asymmetric, chance-floor-free alternative to Cramér's V for "does
    the daily cycle predict what users do".

    Plan: one hash aggregate to the ≤ 5×24-cell contingency; margins
    and entropies are sub-aggregates of that bounded frame (broadcast
    one-row total). Determinism: each cell's −p·ln(p) contribution
    (the only libm) is e6-rounded before its decimal sum; counts are
    exact integers; the closing ratio is e6-rounded. H(T) > 0
    whenever two types exist, so the division is total."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        F.col("event_type").alias("t"),
        F.hour("ts").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c")).localCheckpoint(
        eager=False
    )  # margins + entropies: one scan of the stream
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    tm = cells.groupBy("t").agg(F.sum("c").cast("bigint").alias("ct"))
    hm = cells.groupBy("h").agg(F.sum("c").cast("bigint").alias("ch"))
    ht = (
        tm.crossJoin(F.broadcast(tot))
        .select(
            dround(
                -(F.col("ct").cast("double") / F.col("n"))
                * F.log(F.col("ct").cast("double") / F.col("n")),
                6,
            ).alias("e")
        )
        .agg(
            F.sum(F.col("e").cast("decimal(25,6)"))
            .cast("double")
            .alias("h_type")
        )
    )
    hc = (
        cells.join(F.broadcast(hm), "h")
        .crossJoin(F.broadcast(tot))
        .select(
            dround(
                -(F.col("c").cast("double") / F.col("n"))
                * F.log(F.col("c").cast("double") / F.col("ch")),
                6,
            ).alias("e")
        )
        .agg(
            F.sum(F.col("e").cast("decimal(25,6)"))
            .cast("double")
            .alias("h_cond")
        )
    )
    j = ht.crossJoin(F.broadcast(hc)).crossJoin(F.broadcast(tot))
    return j.select(
        F.col("n").alias("n_events"),
        dround(F.col("h_type"), 6).alias("h_type"),
        dround(F.col("h_cond"), 6).alias("h_cond"),
        dround(
            (F.col("h_type") - F.col("h_cond")) / F.col("h_type"), 6
        ).alias("theil_u"),
    )


@register(
    "q_stats_cohen_kappa",
    oracle="""
    WITH pred AS (
      SELECT source, lang AS pred_lang
      FROM (
        SELECT source, lang,
               row_number() OVER (PARTITION BY source
                                  ORDER BY count(*) DESC, lang ASC)
                 AS rn
        FROM documents GROUP BY source, lang
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT d.lang AS a, p.pred_lang AS b
      FROM documents d JOIN pred p ON d.source = p.source
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY a, b
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    am AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM cells GROUP BY a),
    bm AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY b),
    agree AS (
      SELECT CAST(coalesce(sum(CASE WHEN a = b THEN c END), 0) AS BIGINT)
               AS n_agree
      FROM cells
    ),
    chance AS (
      SELECT CAST(sum(CAST(am.ca AS DECIMAL(38,0))
                      * CAST(bm.cb AS DECIMAL(38,0))) AS DOUBLE) AS pe_num
      FROM am JOIN bm ON am.a = bm.b
    )
    SELECT n AS n_docs, n_agree,
           CAST(n_agree AS DOUBLE) / n AS po,
           pe_num / (CAST(n AS DOUBLE) * n) AS pe,
           floor((CAST(n_agree AS DOUBLE) / n
                  - pe_num / (CAST(n AS DOUBLE) * n))
                 / (1.0 - pe_num / (CAST(n AS DOUBLE) * n))
                 * 1000000.0 + 0.5) / 1000000.0 AS kappa
    FROM agree CROSS JOIN chance CROSS JOIN tot
    """,
)
def q_stats_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two labelings of every document: rater A
    is the document's own ``lang`` field, rater B predicts each doc's
    language as its SOURCE's modal language (ties broken
    alphabetically — a deterministic majority-class baseline).
    kappa = (p_o − p_e)/(1 − p_e) corrects the raw agreement for the
    agreement two independent raters with these marginals would reach
    by chance — the standard labeling-quality audit for weak/distant
    supervision pipelines.

    Plan: the modal-language pick is a count aggregate + row_number
    over the ≤ |sources|×|langs| grouped frame (partitioned by
    source, ≤ 5 rows per partition); the (a, b) confusion frame is
    ≤ 25 cells; marginals and the chance term are sub-aggregates of
    it (diagonal-marginal join on the bounded lang key). Determinism:
    pure integer contingency arithmetic — products widened to
    decimal(38,0) — with single double divisions; only the closing
    kappa is e6-rounded."""
    d = load_table(spark, sf_dir, "documents")
    slc = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wmode = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("lang").asc()
    )
    pred = (
        slc.select(
            "source", "lang", F.row_number().over(wmode).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("pred_lang"))
    )
    pairs = d.join(F.broadcast(pred), "source").select(
        F.col("lang").alias("a"), F.col("pred_lang").alias("b")
    )
    cells = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # margins + diagonal: one scan
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    am = cells.groupBy("a").agg(F.sum("c").cast("bigint").alias("ca"))
    bm = cells.groupBy("b").agg(F.sum("c").cast("bigint").alias("cb"))
    agree = cells.agg(
        F.coalesce(F.sum(F.when(F.col("a") == F.col("b"), F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("n_agree")
    )
    chance = (
        am.join(bm, am["a"] == bm["b"])
        .agg(
            F.sum(
                F.col("ca").cast("decimal(38,0)")
                * F.col("cb").cast("decimal(38,0)")
            )
            .cast("double")
            .alias("pe_num")
        )
    )
    j = agree.crossJoin(F.broadcast(chance)).crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    po = F.col("n_agree").cast("double") / F.col("n")
    pe = F.col("pe_num") / (nd * F.col("n"))
    return j.select(
        F.col("n").alias("n_docs"),
        "n_agree",
        po.alias("po"),
        pe.alias("pe"),
        dround((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


@register(
    "q_stats_concordance_gamma",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(p_size AS BIGINT) AS x,
             CAST(floor(p_retailprice / {_PRICE_BAND}) AS BIGINT) AS y,
             CAST(count(*) AS BIGINT) AS c
      FROM part GROUP BY 1, 2
    ),
    conc AS (
      SELECT
        CAST(coalesce(sum(CASE WHEN b.x > a.x AND b.y > a.y
                      THEN CAST(a.c AS DECIMAL(38,0))
                           * CAST(b.c AS DECIMAL(38,0)) END), 0)
             AS DECIMAL(38,0)) AS n_c,
        CAST(coalesce(sum(CASE WHEN b.x > a.x AND b.y < a.y
                      THEN CAST(a.c AS DECIMAL(38,0))
                           * CAST(b.c AS DECIMAL(38,0)) END), 0)
             AS DECIMAL(38,0)) AS n_d,
        CAST(coalesce(sum(CASE WHEN b.x > a.x AND b.y = a.y
                      THEN CAST(a.c AS DECIMAL(38,0))
                           * CAST(b.c AS DECIMAL(38,0)) END), 0)
             AS DECIMAL(38,0)) AS t_y
      FROM cells a JOIN cells b ON b.x > a.x OR (b.x = a.x AND b.y > a.y)
    )
    SELECT CAST(n_c AS BIGINT) AS n_c, CAST(n_d AS BIGINT) AS n_d,
           CAST(t_y AS BIGINT) AS t_y,
           {sql_dround(
               "(CAST(n_c AS DOUBLE) - CAST(n_d AS DOUBLE))"
               " / (CAST(n_c AS DOUBLE) + CAST(n_d AS DOUBLE))", 6,
           )} AS gamma,
           {sql_dround(
               "(CAST(n_c AS DOUBLE) - CAST(n_d AS DOUBLE))"
               " / (CAST(n_c AS DOUBLE) + CAST(n_d AS DOUBLE)"
               "    + CAST(t_y AS DOUBLE))", 6,
           )} AS somers_dyx
    FROM conc
    """,
)
def q_stats_concordance_gamma(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goodman–Kruskal gamma and Somers' D(y|x) for the ordinal
    association between part size and its retail-price band
    (width-10 literal bands — never a data-dependent ntile): from
    concordant/discordant pair counts over the contingency,
    gamma = (C−D)/(C+D) ignores all ties; Somers' D additionally
    charges pairs tied on the DEPENDENT price band, making it the
    directional "does bigger predict pricier" effect size.

    Plan: raw parts collapse to the ≤ |sizes|×|bands| (~50×10) cell
    frame in one hash aggregate; C/D/T_y come from ONE broadcast
    cell×cell half-join (each unordered pair visited exactly once via
    the (x, y) lexicographic guard) — |cells|² work, data-volume
    invariant. Determinism: pure integer pair arithmetic widened to
    decimal(38,0) (count products can pass 2^63 at extreme scale);
    the two closing ratios are e6-rounded doubles."""
    p = load_table(spark, sf_dir, "part")
    cells = p.groupBy(
        F.col("p_size").cast("bigint").alias("x"),
        F.floor(F.col("p_retailprice") / _PRICE_BAND)
        .cast("bigint")
        .alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    half = (F.col("xb") > F.col("xa")) | (
        (F.col("xb") == F.col("xa")) & (F.col("yb") > F.col("ya"))
    )
    prod = F.col("ca").cast("decimal(38,0)") * F.col("cb").cast(
        "decimal(38,0)"
    )
    zero = F.lit(0).cast("decimal(38,0)")
    conc = a.join(F.broadcast(b), half).agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("xb") > F.col("xa"))
                    & (F.col("yb") > F.col("ya")),
                    prod,
                )
            ),
            zero,
        )
        .cast("decimal(38,0)")
        .alias("n_c"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("xb") > F.col("xa"))
                    & (F.col("yb") < F.col("ya")),
                    prod,
                )
            ),
            zero,
        )
        .cast("decimal(38,0)")
        .alias("n_d"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("xb") > F.col("xa"))
                    & (F.col("yb") == F.col("ya")),
                    prod,
                )
            ),
            zero,
        )
        .cast("decimal(38,0)")
        .alias("t_y"),
    )
    nc = F.col("n_c").cast("double")
    ndd = F.col("n_d").cast("double")
    ty = F.col("t_y").cast("double")
    return conc.select(
        F.col("n_c").cast("bigint").alias("n_c"),
        F.col("n_d").cast("bigint").alias("n_d"),
        F.col("t_y").cast("bigint").alias("t_y"),
        dround((nc - ndd) / (nc + ndd), 6).alias("gamma"),
        dround((nc - ndd) / (nc + ndd + ty), 6).alias("somers_dyx"),
    )


# Daily-metric correlation matrix: the four lineitem rate metrics and
# the literal normalizers that keep every daily mean O(1) (correlation
# is scale-invariant, so the normalizers are free — and they keep the
# decimal-detour magnitudes inside the 2^53 exactness bound at ANY
# data volume, the SCALE.md second-moment lesson).
_CORR_METRICS = (
    ("avg_qty", "l_quantity", 50.0),
    ("avg_price", "l_extendedprice", 100000.0),
    ("avg_discount", "l_discount", 1.0),
    ("avg_tax", "l_tax", 1.0),
)


def _sql_corr_matrix() -> str:
    day_cols = ", ".join(
        f"""floor(CAST(sum(CAST({src} AS DECIMAL(25,6))) AS DOUBLE)
               / count(*) / {scale} * 1000000.0 + 0.5) / 1000000.0
               AS {name}"""
        for name, src, scale in _CORR_METRICS
    )
    mom_cols = ["CAST(count(*) AS BIGINT) AS n_days"]
    names = [m[0] for m in _CORR_METRICS]
    for i, a in enumerate(names):
        mom_cols.append(
            f"CAST(sum(CAST({a} AS DECIMAL(25,6))) AS DOUBLE) AS s_{a}"
        )
        for b in names[i:]:
            mom_cols.append(
                f"CAST(sum(CAST({a} * {b} AS DECIMAL(38,12))) AS DOUBLE)"
                f" AS s_{a}_{b}"
            )
    pair_rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            r = (
                f"(s_{a}_{b} - s_{a} * s_{b} / n_days)"
                f" / sqrt(greatest((s_{a}_{a} - s_{a} * s_{a} / n_days)"
                f" * (s_{b}_{b} - s_{b} * s_{b} / n_days), 0))"
            )
            pair_rows.append(
                f"""SELECT '{a}' AS metric_x, '{b}' AS metric_y, n_days,
                    {sql_dround(r, 6)} AS pearson_r FROM mom"""
            )
    union = " UNION ALL ".join(pair_rows)
    return f"""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day, {day_cols}
      FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
    ),
    mom AS (SELECT {", ".join(mom_cols)} FROM daily)
    {union}
    """


@register("q_agg_daily_corr_matrix", oracle=_sql_corr_matrix())
def q_agg_daily_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix (all 6 pairs) of the four daily
    lineitem rate metrics — mean quantity, mean extended price, mean
    discount, mean tax — the "which levers move together day over
    day" readout behind pricing/promo dashboards. Metrics are divided
    by literal normalizers first: correlation is scale-invariant, so
    this is free, and it pins every daily mean at O(1) so the
    second-moment decimal sums stay inside the 2^53 exactness bound
    at ANY data volume (the SCALE.md Bollinger lesson).

    Plan: one hash aggregate to the daily grain, ONE moments
    aggregate over |days| rows computing all 4 sums + 10 cross/square
    sums in a single pass, then 6 literal-labeled one-row selects
    unioned — no joins, no windows. Determinism: daily means are
    decimal-sum/count e6-rounded, so cross products are exact
    1e-12-grid values summed at decimal(38,12); each closing r is
    e6-rounded with the variance product zero-clamped under the
    sqrt.

    r16: spread_table — the daily aggregate's partial phase (4 decimal
    casts+sums per line) ran inside the one-task single-row-group
    scan; A/B measured spread 2.08/2.74 s vs plain 2.54/3.78 s
    medians (two arms each). Decimal sums are order-insensitive, so
    the repartition is exactness-safe; no-op on multi-split inputs."""
    li = spread_table(spark, sf_dir, "lineitem", "l_orderkey")
    day_aggs = [
        dround(
            F.sum(F.col(src).cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
            / scale,
            6,
        ).alias(name)
        for name, src, scale in _CORR_METRICS
    ]
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("day")
    ).agg(*day_aggs)
    names = [m[0] for m in _CORR_METRICS]
    mom_aggs = [F.count(F.lit(1)).cast("bigint").alias("n_days")]
    for i, a in enumerate(names):
        mom_aggs.append(
            F.sum(F.col(a).cast("decimal(25,6)"))
            .cast("double")
            .alias(f"s_{a}")
        )
        for b in names[i:]:
            mom_aggs.append(
                F.sum((F.col(a) * F.col(b)).cast("decimal(38,12)"))
                .cast("double")
                .alias(f"s_{a}_{b}")
            )
    mom = daily.agg(*mom_aggs)
    # r16 OPTIMIZATION: the 6 pair rows were a 6-way unionByName of
    # one-row selects over a lazily-checkpointed moments frame — six
    # plan branches, a checkpoint materialization job, and 6× the
    # codegen. All six rows derive from the SAME one-row frame, so one
    # inline() over an array of structs emits them in a single branch
    # (identical per-pair expressions, identical values — the oracle's
    # UNION ALL is row-order-free).
    pair_structs = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            n = F.col("n_days")
            cov = F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}") / n
            va = F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}") / n
            vb = F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}") / n
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("metric_x"),
                    F.lit(b).alias("metric_y"),
                    F.col("n_days").alias("n_days"),
                    dround(
                        cov / F.sqrt(F.greatest(va * vb, F.lit(0.0))), 6
                    ).alias("pearson_r"),
                )
            )
    return mom.select(F.inline(F.array(*pair_structs)))


# Price-elasticity ln-price centering literal (p_retailprice spans
# 900-1000, ln ≈ 6.8-6.9 — the shift is slope-invariant and keeps
# every second-moment term O(0.1) so the decimal sums never approach
# the 2^53 exactness bound).
_ELAST_LNP_BASE = 7.0


@register(
    "q_agg_price_elasticity",
    oracle=f"""
    WITH pg AS (
      SELECT l.l_partkey,
             {sql_dround("ln(p.p_retailprice)", 6)}
               - {_ELAST_LNP_BASE} AS x,
             {sql_dround(
                 "ln(CAST(sum(CAST(l.l_quantity AS DECIMAL(25,6)))"
                 " AS DOUBLE))", 6)} AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY l.l_partkey, p.p_retailprice
    ),
    by_ AS (
      SELECT CAST(floor(
               CAST(sum(CAST(y AS DECIMAL(25,6))) AS DOUBLE) / count(*))
             AS BIGINT) AS yb
      FROM pg
    ),
    c AS (
      SELECT x, {sql_dround("y - yb", 6)} AS yc
      FROM pg CROSS JOIN by_
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(yc AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST({sql_dround("x * yc", 8)}
                           AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
             CAST(sum(CAST({sql_dround("x * x", 8)}
                           AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
             CAST(sum(CAST({sql_dround("yc * yc", 8)}
                           AS DECIMAL(38,8))) AS DOUBLE) AS syy
      FROM c
    )
    SELECT n_parts,
           {sql_dround(
               "(sxy - sx * sy / n_parts) / (sxx - sx * sx / n_parts)",
               6)} AS elasticity,
           {sql_dround(
               "(sxy - sx * sy / n_parts) * (sxy - sx * sy / n_parts)"
               " / greatest((sxx - sx * sx / n_parts)"
               " * (syy - sy * sy / n_parts), 1e-300)", 6)} AS r2
    FROM m
    """,
)
def q_agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand across parts: the OLS slope
    of ln(total quantity sold) on ln(retail price) over the part
    grain, with R² — the classic cross-sectional elasticity readout
    (slope ≈ −1.5 says a 1% price premium costs 1.5% volume; R² says
    how much of the quantity spread price explains at all).

    Plan: lineitem collapses to the part grain through ONE join +
    hash aggregate (the part side carries the price); one integer
    y-base aggregate broadcast back (the SCALE.md relative-deviation
    pattern — ln-price is centered by a LITERAL, ln-quantity by the
    integer-floored mean, both slope-invariant and pinning every
    moment term O(1) at any volume); one moments pass closes the
    regression. Determinism: both lns e6-rounded; cross/square terms
    e8-rounded into decimal(38,8) sums (magnitude budget:
    |parts|·O(1) stays under the 2^53 unscaled bound); closing
    slope/R² e6-rounded, the R² denominator clamped away from 0."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pg = (
        li.join(
            p.select("p_partkey", "p_retailprice"),
            li["l_partkey"] == p["p_partkey"],
        )
        .groupBy("l_partkey", "p_retailprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(25,6)"))
            .cast("double")
            .alias("qty")
        )
        .select(
            (dround(F.log("p_retailprice"), 6) - _ELAST_LNP_BASE).alias(
                "x"
            ),
            dround(F.log(F.col("qty")), 6).alias("y"),
        )
        .localCheckpoint(eager=False)  # base + moments: one pass
    )
    by_ = pg.agg(
        F.floor(
            F.sum(F.col("y").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("yb")
    )
    c = pg.crossJoin(F.broadcast(by_)).select(
        "x", dround(F.col("y") - F.col("yb"), 6).alias("yc")
    )
    m = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.col("x").cast("decimal(25,6)")).cast("double").alias("sx"),
        F.sum(F.col("yc").cast("decimal(25,6)"))
        .cast("double")
        .alias("sy"),
        F.sum(dround(F.col("x") * F.col("yc"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxy"),
        F.sum(dround(F.col("x") * F.col("x"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxx"),
        F.sum(dround(F.col("yc") * F.col("yc"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n_parts")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return m.select(
        "n_parts",
        dround(cov / vx, 6).alias("elasticity"),
        dround(
            cov * cov / F.greatest(vx * vy, F.lit(1e-300)), 6
        ).alias("r2"),
    )
