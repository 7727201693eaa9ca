"""Classical k-sample / distribution-shape inference battery: one-way
ANOVA (parametric k-group mean test), Kruskal–Wallis (its rank-based
twin), Mann–Whitney U (the rank-based two-sample test complementing
Welch's t in operators/drift.py), and the Jarque–Bera normality check
— the standard "are these segments actually different / is this metric
Gaussian enough for the parametric tests?" toolkit an experimentation
platform runs before trusting a t-test readout.

None exists as a Spark builtin. Each is expressed as hash aggregates
plus, for the rank tests, the DETERMINISTIC blocked prefix-sum
machinery (operators/prefix.py) over the *distinct-value* frame — the
same no-single-partition ranking discipline as
q_agg_gini_concentration — so every plan survives the 100 TB
scale-up: event volume only ever enters through hash aggregates;
windows touch frames bounded by distinct-value or group cardinality.

Determinism: the drift.py discipline — integer counts, decimal-detour
sums (wide scales sized for ~1e12-row value^4 power sums), exact
dyadic average ranks (.5 grid from integer cumulative counts), and an
e6 rounding on every libm (sqrt) or cancellation-prone closing so the
DuckDB oracle hash-matches bit-exactly.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no statistics surface; these derive from the
driver's analytics mandate and standard experimentation practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.prefix import running_totals_blocked
from ex_hivent_spark.plans.registry import register

# Distinct-value ranking grid: events.value lives in [0, ~500); a
# width-10 block keeps ≤ ~50 prefix blocks at any scale (the blocked
# fold is over DISTINCT values — one row per value — so there are no
# order ties inside a block).
_VAL_BLOCK = 10.0


def _avg_ranks(distinct_counts: DataFrame) -> DataFrame:
    """Average (midrank) per distinct ``value`` from a (value, cnt)
    frame via the blocked prefix fold: rank = cum-count-before +
    (cnt + 1)/2 — an exact .5-grid dyadic. No global window."""
    blocked = distinct_counts.withColumn(
        "blk", F.floor(F.col("value") / F.lit(_VAL_BLOCK))
    )
    ranked = running_totals_blocked(
        blocked,
        order_cols=["value"],
        block_cols=["blk"],
        sum_cols={"cnt": "cum"},
    )
    return ranked.select(
        "value",
        "cnt",
        (
            (F.col("cum") - F.col("cnt")).cast("double")
            + (F.col("cnt").cast("double") + 1) / 2.0
        ).alias("rnk"),
    )


# Oracle twin of _avg_ranks as a CTE body over (value, cnt) `vc`.
_SQL_RANKS = """
      SELECT value, cnt,
             CAST(sum(cnt) OVER (ORDER BY value
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - cnt AS DOUBLE)
             + (CAST(cnt AS DOUBLE) + 1) / 2.0 AS rnk
      FROM vc
"""


@register(
    "q_stats_anova_oneway",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
               AS sxx
      FROM events GROUP BY event_type
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS ntot,
             CAST(sum(CAST(sx AS DECIMAL(38,10))) AS DOUBLE) AS sxt,
             CAST(sum(CAST(sxx AS DECIMAL(38,10))) AS DOUBLE) AS sxxt,
             CAST(sum(CAST(sx * sx / n AS DECIMAL(38,10))) AS DOUBLE)
               AS sb
      FROM g
    )
    SELECT k, ntot AS n_total,
           {sql_dround("sb - sxt * sxt / ntot", 6)} AS ss_between,
           {sql_dround("sxxt - sb", 6)} AS ss_within,
           {sql_dround(
               "((sb - sxt * sxt / ntot) / (k - 1))"
               " / ((sxxt - sb) / (ntot - k))",
               6,
           )} AS f_stat
    FROM t
    """,
)
def q_stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of equal mean ``value`` across the five
    event types — the k-group generalization of the two-sample t
    (drift.py's Welch): F = (SSB/(k−1)) / (SSW/(N−k)) with
    SSB = Σ sx_g²/n_g − (Σsx)²/N and SSW = Σsxx − Σ sx_g²/n_g
    computed from per-group raw moment sums only.

    Plan: ONE hash aggregate collapses the stream to k=|event_type|
    moment rows (map-side partial combine, no second scan); the
    closing totals are one more aggregate over those k rows — nothing
    after the scan is data-sized. Determinism: per-group sums take the
    decimal detour (sum-of-squares through decimal(38,6): value² ≈
    2.5e5/row holds to ~1e26 rows); the k-row closing sums re-enter
    decimal(38,10) because a 5-row double sum is still
    order-sensitive; the three closings (cancellation-prone
    differences and the F ratio) are e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    x = F.col("value")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x.cast("decimal(25,6)")).cast("double").alias("sx"),
        F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("sxx"),
    )
    d10 = "decimal(38,10)"
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("ntot"),
        F.sum(F.col("sx").cast(d10)).cast("double").alias("sxt"),
        F.sum(F.col("sxx").cast(d10)).cast("double").alias("sxxt"),
        F.sum((F.col("sx") * F.col("sx") / F.col("n")).cast(d10))
        .cast("double")
        .alias("sb"),
    )
    k, ntot = F.col("k"), F.col("ntot")
    sb, sxt, sxxt = F.col("sb"), F.col("sxt"), F.col("sxxt")
    ssb = sb - sxt * sxt / ntot
    ssw = sxxt - sb
    return t.select(
        k,
        ntot.alias("n_total"),
        dround(ssb, 6).alias("ss_between"),
        dround(ssw, 6).alias("ss_within"),
        dround((ssb / (k - 1)) / (ssw / (ntot - k)), 6).alias("f_stat"),
    )


@register(
    "q_stats_kruskal_wallis",
    oracle=f"""
    WITH vc AS (
      SELECT value, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY value
    ),
    r AS ({_SQL_RANKS}),
    gc AS (
      SELECT value, event_type, CAST(count(*) AS BIGINT) AS gcnt
      FROM events GROUP BY value, event_type
    ),
    rg AS (
      SELECT gc.event_type,
             CAST(sum(gc.gcnt) AS BIGINT) AS n,
             CAST(sum(CAST(r.rnk AS DECIMAL(25,1))
                      * CAST(gc.gcnt AS DECIMAL(12,0))) AS DOUBLE)
               AS rsum
      FROM gc JOIN r ON gc.value = r.value
      GROUP BY gc.event_type
    ),
    ties AS (
      SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tcorr
      FROM vc
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS ntot,
             CAST(sum(CAST(rsum * rsum / n AS DECIMAL(38,6))) AS DOUBLE)
               AS srr
      FROM rg
    )
    SELECT k, ntot AS n_total,
           {sql_dround(
               "(12.0 / (CAST(ntot AS DOUBLE) * (ntot + 1)) * srr"
               " - 3.0 * (ntot + 1))"
               " / (1.0 - CAST(tcorr AS DOUBLE)"
               "         / (CAST(ntot AS DOUBLE) * ntot * ntot - ntot))",
               6,
           )} AS h_stat
    FROM t CROSS JOIN ties
    """,
)
def q_stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test of equal ``value`` distributions across
    the five event types — the rank-based (distribution-free) twin of
    q_stats_anova_oneway, robust to the heavy right tail a revenue
    metric always has: H = 12/(N(N+1)) Σ R_g²/n_g − 3(N+1), divided by
    the tie correction 1 − Σ(t³−t)/(N³−N) over distinct-value tie
    groups, with exact average-rank (midrank) tie handling.

    Plan: two hash aggregates collapse the stream to the distinct
    (value) and (value, event_type) count frames; global midranks come
    from the DETERMINISTIC blocked prefix fold over the distinct-value
    frame (fixed width-10 value grid, ≤ ~50 blocks, NO
    single-partition row_number); the per-group rank sums are one
    shuffle join on value (both sides distinct-value-sized, far below
    event volume) plus a k-row aggregate. Determinism: midranks are
    exact .5-dyadics from integer cumulative counts; rank·count
    products are computed in EXACT decimal arithmetic
    (decimal(25,1) × decimal(12,0) — at rank·cnt ≈ 1e15⁺ a double ulp
    exceeds the .5 grid, the gini lesson); the closing H is e6-rounded
    (the decimal→double casts of >2⁵³ sums double-round in DuckDB).
    r16: A/B-tested spread_table on the events scan and REVERTED
    (1.09 plain vs 1.66 spread median) — both value-grain aggregates
    collapse to ~|distinct values| partials inside the scan task, so
    the user_id repartition shipped raw rows for nothing."""
    e = load_table(spark, sf_dir, "events")
    vc = e.groupBy("value").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=False)  # ranks + tie correction: the
    # distinct-value frame is computed once
    r = _avg_ranks(vc)
    gc = e.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("gcnt")
    )
    rg = (
        gc.join(r.select("value", "rnk"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("gcnt").cast("bigint").alias("n"),
            F.sum(
                F.col("rnk").cast("decimal(25,1)")
                * F.col("gcnt").cast("decimal(12,0)")
            )
            .cast("double")
            .alias("rsum"),
        )
    )
    ties = vc.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("bigint")
        .alias("tcorr")
    )
    t = rg.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("ntot"),
        F.sum(
            (F.col("rsum") * F.col("rsum") / F.col("n")).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("srr"),
    )
    nd = F.col("ntot").cast("double")
    h = 12.0 / (nd * (F.col("ntot") + 1)) * F.col("srr") - 3.0 * (
        F.col("ntot") + 1
    )
    corr = 1.0 - F.col("tcorr").cast("double") / (
        nd * F.col("ntot") * F.col("ntot") - F.col("ntot")
    )
    return t.crossJoin(F.broadcast(ties)).select(
        "k",
        F.col("ntot").alias("n_total"),
        dround(h / corr, 6).alias("h_stat"),
    )


@register(
    "q_stats_mannwhitney_u",
    oracle=f"""
    WITH ev AS (
      SELECT value, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    vc AS (
      SELECT value, CAST(count(*) AS BIGINT) AS cnt
      FROM ev GROUP BY value
    ),
    r AS ({_SQL_RANKS}),
    gc AS (
      SELECT value, event_type, CAST(count(*) AS BIGINT) AS gcnt
      FROM ev GROUP BY value, event_type
    ),
    rg AS (
      SELECT gc.event_type,
             CAST(sum(gc.gcnt) AS BIGINT) AS n,
             CAST(sum(CAST(r.rnk AS DECIMAL(25,1))
                      * CAST(gc.gcnt AS DECIMAL(12,0))) AS DOUBLE)
               AS rsum
      FROM gc JOIN r ON gc.value = r.value
      GROUP BY gc.event_type
    ),
    ties AS (
      SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tcorr
      FROM vc
    ),
    w AS (
      SELECT c.n AS n1, c.rsum AS r1, p.n AS n2
      FROM (SELECT * FROM rg WHERE event_type = 'click') c
      CROSS JOIN (SELECT * FROM rg WHERE event_type = 'purchase') p
    )
    SELECT n1, n2,
           r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0 AS u_stat,
           (r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
            - CAST(n1 AS DOUBLE) * n2 / 2.0)
           / ({sql_dround(
                 "sqrt(greatest("
                 "CAST(n1 AS DOUBLE) * n2 / 12.0"
                 " * ((n1 + n2 + 1)"
                 "    - CAST(tcorr AS DOUBLE)"
                 "      / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))),"
                 " 0))",
                 6,
             )}) AS z_stat
    FROM w CROSS JOIN ties
    """,
)
def q_stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between the click and
    purchase ``value`` populations — the rank-based two-sample test
    (no normality assumption) complementing q_agg_welch_ttest:
    U = R₁ − n₁(n₁+1)/2 over midranks of the POOLED sample, with the
    tie-corrected normal approximation
    z = (U − n₁n₂/2) / sqrt(n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1)))).

    Plan: identical machinery to q_stats_kruskal_wallis on the
    two-type slice — distinct-value counts, blocked-prefix midranks,
    one value-keyed shuffle join, a 2-row pivot via broadcast cross
    join. Determinism: same exact-dyadic midranks and decimal
    rank·count products; the closing sqrt (the only libm) is
    e6-rounded and clamped at 0 (drift.py's degenerate-window
    lesson)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    vc = e.groupBy("value").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=False)  # ranks + ties: one slice scan
    r = _avg_ranks(vc)
    gc = e.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("gcnt")
    )
    rg = (
        gc.join(r.select("value", "rnk"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("gcnt").cast("bigint").alias("n"),
            F.sum(
                F.col("rnk").cast("decimal(25,1)")
                * F.col("gcnt").cast("decimal(12,0)")
            )
            .cast("double")
            .alias("rsum"),
        )
        .localCheckpoint(eager=False)  # both pivot filters: one pass
    )
    ties = vc.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("bigint")
        .alias("tcorr")
    )
    c = rg.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n1"), F.col("rsum").alias("r1")
    )
    p = rg.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n2")
    )
    w = c.crossJoin(F.broadcast(p)).crossJoin(F.broadcast(ties))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u = F.col("r1") - n1d * (F.col("n1") + 1) / 2.0
    ntot = F.col("n1") + F.col("n2")
    sig = F.sqrt(
        F.greatest(
            n1d
            * n2d
            / 12.0
            * (
                (ntot + 1)
                - F.col("tcorr").cast("double")
                / (ntot.cast("double") * (ntot - 1))
            ),
            F.lit(0.0),
        )
    )
    return w.select(
        "n1",
        "n2",
        u.alias("u_stat"),
        ((u - n1d * n2d / 2.0) / dround(sig, 6)).alias("z_stat"),
    )


@register(
    "q_stats_jarque_bera",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
               AS s2,
             CAST(sum(CAST(value * value * value AS DECIMAL(38,6)))
                  AS DOUBLE) AS s3,
             CAST(sum(CAST(value * value * value * value
                           AS DECIMAL(38,6))) AS DOUBLE) AS s4
      FROM events GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM g
    ),
    s AS (
      SELECT event_type, n,
             {sql_dround(
                 "m3 / (greatest(m2, 0)"
                 "      * sqrt(greatest(m2, 0)))", 6)} AS skewness,
             {sql_dround("m4 / (m2 * m2) - 3.0", 6)} AS kurtosis_ex
      FROM m
    )
    SELECT event_type, n, skewness, kurtosis_ex,
           {sql_dround(
               "CAST(n AS DOUBLE) / 6.0"
               " * (skewness * skewness"
               "    + kurtosis_ex * kurtosis_ex / 4.0)",
               6,
           )} AS jb_stat
    FROM s ORDER BY event_type
    """,
)
def q_stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test of ``value`` per event type — the
    moment-based "is this metric Gaussian enough for the parametric
    tests?" gate (JB = n/6 (S² + K²/4) from sample skewness S and
    excess kurtosis K) that an experimentation platform runs before
    trusting a t/ANOVA readout on a heavy-tailed revenue metric.

    Plan: ONE hash aggregate collapses the stream to per-group raw
    power sums Σx..Σx⁴ (map-side combine; value ≤ ~500 so x⁴ ≤ 6.3e10
    per row — decimal(38,6) holds to ~1e21 rows); central moments,
    S, K, and JB are per-row arithmetic on the k-row frame. JB is
    computed from the ROUNDED S and K (stated definition here) so the
    statistic inherits their determinism. Determinism: power sums take
    the decimal detour; per-row x·x·x products are written as repeated
    multiplication (identical association both engines, no pow());
    the S sqrt (the only libm) and the cancellation-prone K are
    e6-rounded, m2 clamped at 0 against double cancellation on a
    near-constant group."""
    e = load_table(spark, sf_dir, "events")
    x = F.col("value")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x.cast("decimal(25,6)")).cast("double").alias("s1"),
        F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("s2"),
        F.sum((x * x * x).cast("decimal(38,6)"))
        .cast("double")
        .alias("s3"),
        F.sum((x * x * x * x).cast("decimal(38,6)"))
        .cast("double")
        .alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    m = g.select(
        "event_type",
        "n",
        dround(
            m3
            / (
                F.greatest(m2, F.lit(0.0))
                * F.sqrt(F.greatest(m2, F.lit(0.0)))
            ),
            6,
        ).alias("skewness"),
        dround(m4 / (m2 * m2) - 3.0, 6).alias("kurtosis_ex"),
    )
    return m.select(
        "event_type",
        "n",
        "skewness",
        "kurtosis_ex",
        dround(
            n.cast("double")
            / 6.0
            * (
                F.col("skewness") * F.col("skewness")
                + F.col("kurtosis_ex") * F.col("kurtosis_ex") / 4.0
            ),
            6,
        ).alias("jb_stat"),
    ).orderBy("event_type")


@register(
    "q_stats_cramers_v",
    oracle=f"""
    WITH obs AS (
      SELECT event_type AS et, dayofweek(ts) AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT r.et, c.dow
      FROM (SELECT DISTINCT et FROM obs) r
      CROSS JOIN (SELECT DISTINCT dow FROM obs) c
    ),
    cells AS (
      SELECT s.et, s.dow, CAST(coalesce(o.o, 0) AS BIGINT) AS o
      FROM spine s LEFT JOIN obs o ON s.et = o.et AND s.dow = o.dow
    ),
    rt AS (SELECT et, CAST(sum(o) AS BIGINT) AS rtot FROM cells GROUP BY et),
    ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ctot FROM cells GROUP BY dow),
    tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT et) AS BIGINT) AS nr,
             CAST(count(DISTINCT dow) AS BIGINT) AS nc
      FROM cells
    ),
    t AS (
      SELECT o,
             CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE)
               AS e,
             n, nr, nc
      FROM cells JOIN rt USING (et) JOIN ct USING (dow) CROSS JOIN tot
    ),
    chi AS (
      SELECT max(n) AS n, max(nr) AS nr, max(nc) AS nc,
             {sql_dround(
                 "CAST(sum(CAST((CAST(o AS DOUBLE) - e)"
                 " * (CAST(o AS DOUBLE) - e) / e"
                 " AS DECIMAL(25,6))) AS DOUBLE)", 6)} AS chi2_stat
      FROM t
    )
    SELECT n AS n_total,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           chi2_stat,
           {sql_dround(
               "sqrt(chi2_stat / (CAST(n AS DOUBLE)"
               " * least(nr - 1, nc - 1)))", 6)} AS cramers_v
    FROM chi
    """,
)
def q_stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the association between event type
    and day-of-week — the [0,1]-normalized companion to the chi-square
    statistic (q_agg_chi2_independence reports significance, which at
    1e12 rows is always "significant"; V = sqrt(chi2 / (N·min(R−1,
    C−1))) reports whether the association MATTERS), over the dense
    |types|×7 grid with zero cells contributing their E terms.

    Plan: the chi2 dense-grid discipline — one hash aggregate to the
    observed cells, broadcast label-spine densification, marginals
    over the pinned cells frame, one scalar closing. Determinism:
    integer counts, the per-cell terms through the decimal sum, chi2
    e6-rounded, and V computed FROM the rounded chi2 with its own
    e6-rounded sqrt (the only libm)."""
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.groupBy(
            F.col("event_type").alias("et"),
            F.dayofweek("ts").alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .localCheckpoint(eager=False)  # spine + marginals: one scan
    )
    spine = (
        obs.select("et")
        .distinct()
        .crossJoin(F.broadcast(obs.select("dow").distinct()))
    )
    cells = spine.join(F.broadcast(obs), ["et", "dow"], "left").select(
        "et", "dow", F.coalesce("o", F.lit(0)).cast("bigint").alias("o")
    ).localCheckpoint(eager=False)
    rt = cells.groupBy("et").agg(F.sum("o").cast("bigint").alias("rtot"))
    ct = cells.groupBy("dow").agg(F.sum("o").cast("bigint").alias("ctot"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("et").cast("bigint").alias("nr"),
        F.countDistinct("dow").cast("bigint").alias("nc"),
    )
    t = (
        cells.join(F.broadcast(rt), "et")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "o",
            (
                F.col("rtot").cast("double")
                * F.col("ctot").cast("double")
                / F.col("n").cast("double")
            ).alias("e"),
            "n",
            "nr",
            "nc",
        )
    )
    od = F.col("o").cast("double")
    chi = t.agg(
        F.max("n").alias("n"),
        F.max("nr").alias("nr"),
        F.max("nc").alias("nc"),
        dround(
            F.sum(
                ((od - F.col("e")) * (od - F.col("e")) / F.col("e")).cast(
                    "decimal(25,6)"
                )
            ).cast("double"),
            6,
        ).alias("chi2_stat"),
    )
    return chi.select(
        F.col("n").alias("n_total"),
        ((F.col("nr") - 1) * (F.col("nc") - 1))
        .cast("bigint")
        .alias("dof"),
        "chi2_stat",
        dround(
            F.sqrt(
                F.col("chi2_stat")
                / (
                    F.col("n").cast("double")
                    * F.least(F.col("nr") - 1, F.col("nc") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "q_stats_brown_forsythe",
    oracle=f"""
    WITH vc AS (
      SELECT event_type AS et, value, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cumv AS (
      SELECT et, value, cnt,
             CAST(sum(cnt) OVER (PARTITION BY et ORDER BY value
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum
      FROM vc
    ),
    gt AS (SELECT et, CAST(sum(cnt) AS BIGINT) AS ng FROM vc GROUP BY et),
    med AS (
      SELECT g.et,
             ((SELECT min(value) FROM cumv c
               WHERE c.et = g.et
                 AND c.cum >= CAST(floor((g.ng + 1) / 2.0) AS BIGINT))
              + (SELECT min(value) FROM cumv c
                 WHERE c.et = g.et
                   AND c.cum >= CAST(floor(g.ng / 2.0) AS BIGINT) + 1)
             ) / 2.0 AS med
      FROM gt g
    ),
    z AS (
      SELECT e.event_type AS et, abs(e.value - m.med) AS z
      FROM events e JOIN med m ON m.et = e.event_type
    ),
    g AS (
      SELECT et,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(z AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(z * z AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM z GROUP BY et
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS ntot,
             CAST(sum(CAST(sx AS DECIMAL(38,10))) AS DOUBLE) AS sxt,
             CAST(sum(CAST(sxx AS DECIMAL(38,10))) AS DOUBLE) AS sxxt,
             CAST(sum(CAST(sx * sx / n AS DECIMAL(38,10))) AS DOUBLE)
               AS sb
      FROM g
    )
    SELECT k, ntot AS n_total,
           {sql_dround(
               "((sb - sxt * sxt / ntot) / (k - 1))"
               " / ((sxxt - sb) / (ntot - k))",
               6,
           )} AS f_stat
    FROM t
    """,
)
def q_stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test of equal ``value`` VARIANCE across the five
    event types — the robust Levene variant (one-way ANOVA on the
    absolute deviations z = |x − median_g| from each group's exact
    MEDIAN, not its mean): the gate one runs before trusting the
    equal-variance assumptions downstream dashboards quietly make, and
    median-centering keeps it calibrated under the heavy tails that
    break the classical Bartlett test.

    Plan: group medians come from per-(group, value) distinct counts
    cumulated via the blocked prefix fold — the fold is GLOBAL over
    the lexicographic (group, value-block) order, so each group's
    preceding-groups total (a k-row broadcast self-join) subtracts
    back out to per-group cumulative counts; the two middle picks are
    two filtered min-aggregates; the |x − med| pass re-joins the k-row
    median frame by broadcast and the ANOVA closing is the
    q_stats_anova_oneway machinery. TWO scans of the stream (the
    distinct-count aggregate, then the centered-moment aggregate) —
    a median cannot be folded into one pass exactly. Determinism:
    medians are exact half-sums of observed doubles; z is per-row
    double arithmetic; moment sums ride the decimal detour; the one
    cancellation-prone closing is e6-rounded (no libm)."""
    e = load_table(spark, sf_dir, "events")
    vc = e.groupBy(
        F.col("event_type").alias("et"), "value"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt")).localCheckpoint(
        eager=False
    )  # totals + the prefix fold: one scan of the stream
    gt = vc.groupBy("et").agg(F.sum("cnt").cast("bigint").alias("ng"))
    a = gt.select(F.col("et").alias("et_a"), F.col("ng").alias("ng_a"))
    off = (
        a.join(gt.select("et", "ng"), F.col("et") < F.col("et_a"), "left")
        .groupBy(F.col("et_a").alias("et"))
        .agg(F.coalesce(F.sum("ng"), F.lit(0)).cast("bigint").alias("off"))
    )
    blocked = vc.withColumn("blk", F.floor(F.col("value") / F.lit(10.0)))
    cum = running_totals_blocked(
        blocked,
        order_cols=["value"],
        block_cols=["et", "blk"],
        sum_cols={"cnt": "gcum"},
    )
    cumv = (
        cum.join(F.broadcast(off), "et")
        .join(F.broadcast(gt), "et")
        .select(
            "et",
            "value",
            (F.col("gcum") - F.col("off")).alias("cum"),
            "ng",
        )
    )
    # r16: both middle picks in ONE conditional aggregate (min ignores
    # the when()-null rows, so min(when(cond, v)) == filter(cond).min(v))
    # instead of two filtered aggregates that each re-executed the whole
    # prefix subtree (window exchange + offsets join) — one pass, no
    # lo⋈hi join.
    med = (
        cumv.groupBy("et")
        .agg(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.floor((F.col("ng") + 1) / 2.0).cast("bigint"),
                    F.col("value"),
                )
            ).alias("v_lo"),
            F.min(
                F.when(
                    F.col("cum")
                    >= F.floor(F.col("ng") / 2.0).cast("bigint") + 1,
                    F.col("value"),
                )
            ).alias("v_hi"),
        )
        .select("et", ((F.col("v_lo") + F.col("v_hi")) / 2.0).alias("med"))
    )
    z = e.join(
        F.broadcast(med), e["event_type"] == med["et"]
    ).select("et", F.abs(F.col("value") - F.col("med")).alias("z"))
    zc = F.col("z")
    g = z.groupBy("et").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(zc.cast("decimal(25,6)")).cast("double").alias("sx"),
        F.sum((zc * zc).cast("decimal(38,6)")).cast("double").alias("sxx"),
    )
    d10 = "decimal(38,10)"
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("ntot"),
        F.sum(F.col("sx").cast(d10)).cast("double").alias("sxt"),
        F.sum(F.col("sxx").cast(d10)).cast("double").alias("sxxt"),
        F.sum((F.col("sx") * F.col("sx") / F.col("n")).cast(d10))
        .cast("double")
        .alias("sb"),
    )
    k, ntot = F.col("k"), F.col("ntot")
    ssb = F.col("sb") - F.col("sxt") * F.col("sxt") / ntot
    ssw = F.col("sxxt") - F.col("sb")
    return t.select(
        k,
        ntot.alias("n_total"),
        dround((ssb / (k - 1)) / (ssw / (ntot - k)), 6).alias("f_stat"),
    )


@register(
    "q_stats_wilson_ci",
    oracle=f"""
    WITH base AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_en
      FROM documents GROUP BY source
    ),
    parts AS (
      SELECT source, n_docs, n_en,
             CAST(n_en AS DOUBLE) / n_docs AS p_hat,
             (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n_docs AS z2n,
             {sql_dround(
                 "sqrt((CAST(n_en AS DOUBLE) / n_docs)"
                 " * (1.0 - CAST(n_en AS DOUBLE) / n_docs) / n_docs"
                 " + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * n_docs * n_docs))", 6)} AS rt
      FROM base
    )
    SELECT source, n_docs, n_en, p_hat,
           {sql_dround(
               "(p_hat + z2n / 2.0 - 1.96 * rt) / (1.0 + z2n)", 6)}
               AS wilson_lower,
           {sql_dround(
               "(p_hat + z2n / 2.0 + 1.96 * rt) / (1.0 + z2n)", 6)}
               AS wilson_upper
    FROM parts
    """,
)
def q_stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval per source for the share
    of English documents — the binomial-proportion interval that stays
    inside [0,1] and behaves at small n or extreme p̂ where the naive
    Wald interval collapses (the standard choice for conversion-rate
    and quality-share readouts on segments of wildly different size).

    Plan: ONE hash aggregate to (source, n, k) — segment-count-sized
    thereafter; the interval is per-row arithmetic on the tiny result.
    Partial aggregation makes the scan map-combining, so the plan is
    flat in event volume. Determinism: counts are exact integers, p̂
    is one small-integer IEEE division, the single libm sqrt is
    e6-rounded on both sides, and each bound's closing expression is
    e6-rounded — z enters only through the literal 1.96, which parses
    to the identical double in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_en"),
    )
    nd = F.col("n_docs").cast("double")
    p_hat = F.col("n_en").cast("double") / F.col("n_docs")
    z2n = F.lit(1.96 * 1.96) / F.col("n_docs")
    parts = base.select(
        "source",
        "n_docs",
        "n_en",
        p_hat.alias("p_hat"),
        z2n.alias("z2n"),
        dround(
            F.sqrt(
                (F.col("n_en").cast("double") / F.col("n_docs"))
                * (1.0 - F.col("n_en").cast("double") / F.col("n_docs"))
                / F.col("n_docs")
                + F.lit(1.96 * 1.96) / (4.0 * nd * nd)
            ),
            6,
        ).alias("rt"),
    )
    return parts.select(
        "source",
        "n_docs",
        "n_en",
        "p_hat",
        dround(
            (F.col("p_hat") + F.col("z2n") / 2.0 - 1.96 * F.col("rt"))
            / (1.0 + F.col("z2n")),
            6,
        ).alias("wilson_lower"),
        dround(
            (F.col("p_hat") + F.col("z2n") / 2.0 + 1.96 * F.col("rt"))
            / (1.0 + F.col("z2n")),
            6,
        ).alias("wilson_upper"),
    )


@register(
    "q_stats_cochran_armitage",
    oracle=f"""
    WITH lab AS (
      SELECT CAST(floor((day(ts) - 1) / 7) AS BIGINT) AS wk,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events
    ),
    g AS (
      SELECT wk,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS k
      FROM lab GROUP BY wk
    ),
    sums AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(k) AS BIGINT) AS kk,
             CAST(sum(wk * n) AS BIGINT) AS swn,
             CAST(sum(wk * k) AS BIGINT) AS swk,
             CAST(sum(wk * wk * n) AS BIGINT) AS sw2n,
             CAST(count(*) AS BIGINT) AS n_groups
      FROM g
    ),
    closing AS (
      SELECT n_groups, nn, kk,
             swk - (CAST(kk AS DOUBLE) / nn) * swn AS t_stat,
             (CAST(kk AS DOUBLE) / nn)
               * (1.0 - CAST(kk AS DOUBLE) / nn)
               * (sw2n - CAST(swn AS DOUBLE) * swn / nn) AS v
      FROM sums
    )
    SELECT n_groups, nn AS n_total, kk AS k_total,
           CASE WHEN {sql_dround("sqrt(greatest(v, 0.0))", 6)} = 0
                THEN 0.0
                ELSE {sql_dround(
                    "t_stat / (" + sql_dround(
                        "sqrt(greatest(v, 0.0))", 6) + ")", 6)}
           END AS z_trend
    FROM closing
    """,
)
def q_stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test on purchase conversion across the
    ordered week-of-month buckets (scores 0..4): z = Σwᵢ(kᵢ − nᵢp̄) /
    √(p̄(1−p̄)(Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N)) — the 'is conversion DRIFTING
    monotonically across ordered segments?' test that a k-group
    chi-square dilutes (chi-square spends its power on any deviation;
    CA concentrates it on the linear trend). Complements
    q_ts_mann_kendall's distribution-free trend on levels with the
    proportions version.

    Plan: ONE conditional hash aggregate to ≤5 (week, n, k) rows, a
    one-row integer moment reduction, per-row closing — nothing after
    the scan is data-sized, partial aggregation throughout.
    Determinism: all moments are exact BIGINTs; the closing is IEEE
    arithmetic written identically both sides, the variance clamps at
    0 inside the e6-rounded sqrt, and the final ratio is e6-rounded
    (0.0 on a degenerate zero-variance table)."""
    e = load_table(spark, sf_dir, "events")
    lab = e.select(
        F.floor((F.dayofmonth("ts") - 1) / 7).cast("bigint").alias("wk"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    g = lab.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("k"),
    )
    sums = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("k").cast("bigint").alias("kk"),
        F.sum(F.col("wk") * F.col("n")).cast("bigint").alias("swn"),
        F.sum(F.col("wk") * F.col("k")).cast("bigint").alias("swk"),
        F.sum(F.col("wk") * F.col("wk") * F.col("n"))
        .cast("bigint")
        .alias("sw2n"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    pbar = F.col("kk").cast("double") / F.col("nn")
    t_stat = F.col("swk") - pbar * F.col("swn")
    v = (
        pbar
        * (1.0 - pbar)
        * (F.col("sw2n") - F.col("swn").cast("double") * F.col("swn") / F.col("nn"))
    )
    closing = sums.select(
        "n_groups",
        F.col("nn").alias("n_total"),
        F.col("kk").alias("k_total"),
        t_stat.alias("t_stat"),
        v.alias("v"),
    )
    den = dround(F.sqrt(F.greatest(F.col("v"), F.lit(0.0))), 6)
    return closing.select(
        "n_groups",
        "n_total",
        "k_total",
        F.when(den == 0, F.lit(0.0))
        .otherwise(dround(F.col("t_stat") / den, 6))
        .alias("z_trend"),
    )
