"""Nonparametric / robustness additions to the stats battery: the
mean-centered Levene variance-equality test (the classical companion
to q_stats_brown_forsythe's median variant), the Wilcoxon SIGNED-RANK
test on paired per-user month-half means (the one-sample/paired
counterpart to q_stats_mannwhitney_u's two-sample rank sum), and a
grouped Cramér–von Mises uniformity statistic for the within-month
arrival distribution (the quadratic-EDF companion to q_ts_ks_drift's
sup-norm).

Plan discipline (stats.py's): event volume only enters through hash
aggregates — per-(group, value) distinct counts, per-user pair means,
per-hour cells; ranking uses the DETERMINISTIC blocked prefix-sum
machinery (operators/prefix.py) over distinct-|d| frames; the CvM
cumulative runs per type over the 720-row hour spine. No global
sorts, no data-volume windows.

Determinism: integer counts, decimal-detour sums, exact dyadic
midranks, e6/e12 roundings on every libm or cancellation-prone
closing; the CvM per-cell closed form is pure per-row double
arithmetic from integer counts (bit-identical across engines).

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no statistics surface;
these derive from the driver's analytics mandate and standard
nonparametric practice (Levene 1960, Wilcoxon 1945 with the
normal-approximation tie correction, Cramér–von Mises per
D'Agostino & Stephens' EDF-test compendium).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.prefix import running_totals_blocked
from ex_hivent_spark.plans.registry import register

# The events table spans this fixed month (drift.py's spine constants).
_EPOCH_H = 473352
_N_HOURS = 720
# Month-half boundary for the paired design, in hours-since-epoch.
_HALF_H = _EPOCH_H + _N_HOURS // 2
# |d| ranking grid: per-user mean diffs live in [0, ~500) — width-10
# blocks keep the prefix fold at ≤ ~50 blocks at any scale.
_D_BLOCK = 10.0


@register(
    "q_stats_levene",
    oracle=f"""
    WITH gm AS (
      SELECT event_type AS et,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
               / count(*) AS mean_g
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type AS et,
             {sql_dround("abs(e.value - m.mean_g)", 6)} AS z
      FROM events e JOIN gm m ON m.et = e.event_type
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
           )} AS w_stat
    FROM t
    """,
)
def q_stats_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test (MEAN-centered, the 1960 original) of equal
    ``value`` variance across the five event types: one-way ANOVA on
    z = |x − mean_g|. Next to q_stats_brown_forsythe (median-centered)
    the pair brackets the robustness spectrum — Levene is more
    powerful under near-normality, Brown–Forsythe under heavy tails;
    divergence between the two W statistics is itself a tail alarm.

    Plan: one hash aggregate for the k group means (broadcast back —
    k = 5 rows), one centered-moment aggregate, one k-row closing —
    TWO stream scans (a mean, unlike a median, cannot be re-derived
    from the distinct-count frame without a second pass over z
    anyway; same scan count as Brown–Forsythe). Determinism: group
    means are decimal-sum/count; z is e6-rounded per row so z² lands
    on the 1e-12 grid; moment sums ride the decimal detour and the
    one cancellation-prone closing is e6-rounded (no libm)."""
    e = load_table(spark, sf_dir, "events")
    gm = e.groupBy(F.col("event_type").alias("et")).agg(
        (
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_g")
    )
    z = e.join(
        F.broadcast(gm), e["event_type"] == gm["et"]
    ).select(
        "et", dround(F.abs(F.col("value") - F.col("mean_g")), 6).alias("z")
    )
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
        dround((ssb / (k - 1)) / (ssw / (ntot - k)), 6).alias("w_stat"),
    )


@register(
    "q_stats_wilcoxon_signed_rank",
    oracle=f"""
    WITH um AS (
      SELECT user_id,
             CAST(sum(CASE WHEN floor(epoch(ts) / 3600) < {_HALF_H}
                           THEN CAST(value AS DECIMAL(25,6)) END)
                  AS DOUBLE)
               / sum(CASE WHEN floor(epoch(ts) / 3600) < {_HALF_H}
                          THEN 1 ELSE 0 END) AS m1,
             CAST(sum(CASE WHEN floor(epoch(ts) / 3600) >= {_HALF_H}
                           THEN CAST(value AS DECIMAL(25,6)) END)
                  AS DOUBLE)
               / sum(CASE WHEN floor(epoch(ts) / 3600) >= {_HALF_H}
                          THEN 1 ELSE 0 END) AS m2
      FROM events GROUP BY user_id
      HAVING sum(CASE WHEN floor(epoch(ts) / 3600) < {_HALF_H}
                      THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN floor(epoch(ts) / 3600) >= {_HALF_H}
                      THEN 1 ELSE 0 END) > 0
    ),
    d AS (
      SELECT user_id, {sql_dround("m2 - m1", 6)} AS d
      FROM um
    ),
    nz AS (SELECT user_id, d, abs(d) AS absd FROM d WHERE d <> 0),
    vc AS (
      SELECT absd, CAST(count(*) AS BIGINT) AS cnt
      FROM nz GROUP BY absd
    ),
    r AS (
      SELECT absd, cnt,
             CAST(sum(cnt) OVER (ORDER BY absd
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - cnt AS DOUBLE)
             + (CAST(cnt AS DOUBLE) + 1) / 2.0 AS rnk
      FROM vc
    ),
    w AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN nz.d > 0
                           THEN CAST(r.rnk AS DECIMAL(25,1)) END)
                  AS DOUBLE) AS w_plus
      FROM nz JOIN r ON nz.absd = r.absd
    ),
    ties AS (
      SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tcorr
      FROM vc
    )
    SELECT n_pairs, w_plus,
           (w_plus - CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 4.0)
           / ({sql_dround(
               "sqrt(greatest("
               "CAST(n_pairs AS DOUBLE) * (n_pairs + 1)"
               " * (2 * n_pairs + 1) / 24.0"
               " - CAST(tcorr AS DOUBLE) / 48.0, 0))",
               6,
           )}) AS z_stat
    FROM w CROSS JOIN ties
    """,
)
def q_stats_wilcoxon_signed_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wilcoxon signed-rank test on the paired per-user design: each
    user's mean event value in the month's first half vs the second
    (users active in both), d = m2 − m1, zero diffs dropped (the
    standard convention), W⁺ = sum of the midranks of |d| where
    d > 0, and the tie-corrected normal approximation
    z = (W⁺ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48) — the
    distribution-free paired companion to q_stats_mannwhitney_u.

    Plan: event volume collapses to the per-USER paired-mean frame in
    ONE hash aggregate (conditional halves); |d| midranks come from
    the blocked prefix fold over the DISTINCT-|d| frame (the
    q_stats_mannwhitney_u machinery — no data-volume window); one
    |d|-keyed join closes W⁺. Determinism: half-means are
    decimal-sum/count doubles, d is e6-rounded (so |d| equality —
    the tie grid — is exact), midranks are exact .5-grid dyadics
    summed at decimal(25,1), and the closing sqrt is e6-rounded and
    zero-clamped."""
    e = load_table(spark, sf_dir, "events")
    in_h1 = F.floor(F.unix_timestamp("ts") / 3600) < _HALF_H
    um = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(in_h1, F.col("value").cast("decimal(25,6)"))
                ).cast("double")
                / F.sum(F.when(in_h1, 1).otherwise(0))
            ).alias("m1"),
            (
                F.sum(
                    F.when(~in_h1, F.col("value").cast("decimal(25,6)"))
                ).cast("double")
                / F.sum(F.when(~in_h1, 1).otherwise(0))
            ).alias("m2"),
            F.sum(F.when(in_h1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(~in_h1, 1).otherwise(0)).alias("c2"),
        )
        .filter((F.col("c1") > 0) & (F.col("c2") > 0))
    )
    nz = um.select(
        "user_id", dround(F.col("m2") - F.col("m1"), 6).alias("d")
    ).filter(F.col("d") != 0)
    nz = nz.select("user_id", "d", F.abs(F.col("d")).alias("absd"))
    # r16 wave 8 NOTE: an (absd, sign)-count restructure (one events
    # pass, W+ from rnk·c products) was A/B-tested and REVERTED —
    # 1.55 s/12 jobs → 2.00 s/14 jobs: the pair frame is near-events-
    # sized, so materializing the finer checkpoint and re-deriving the
    # distinct-|d| counts from it per consumer cost more than the
    # second scan it saved (the kruskal/mannwhitney A/B read the same).
    vc = nz.groupBy("absd").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=False)  # ranks + ties: one pass
    blocked = vc.withColumn(
        "blk", F.floor(F.col("absd") / F.lit(_D_BLOCK))
    )
    ranked = running_totals_blocked(
        blocked,
        order_cols=["absd"],
        block_cols=["blk"],
        sum_cols={"cnt": "cum"},
    )
    r = ranked.select(
        "absd",
        (
            (F.col("cum") - F.col("cnt")).cast("double")
            + (F.col("cnt").cast("double") + 1) / 2.0
        ).alias("rnk"),
    )
    w = nz.join(r, "absd").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.when(F.col("d") > 0, F.col("rnk").cast("decimal(25,1)"))
        )
        .cast("double")
        .alias("w_plus"),
    )
    ties = vc.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("tcorr")
    )
    j = w.crossJoin(F.broadcast(ties))
    n = F.col("n_pairs")
    nd = n.cast("double")
    sig = F.sqrt(
        F.greatest(
            nd * (n + 1) * (2 * n + 1) / 24.0
            - F.col("tcorr").cast("double") / 48.0,
            F.lit(0.0),
        )
    )
    return j.select(
        "n_pairs",
        "w_plus",
        (
            (F.col("w_plus") - nd * (n + 1) / 4.0) / dround(sig, 6)
        ).alias("z_stat"),
    )


@register(
    "q_stats_cvm_uniform",
    oracle=f"""
    WITH cells AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) - {_EPOCH_H} AS j,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, j, c,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY j
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - c AS BIGINT) AS cb,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM cells
    ),
    terms AS (
      SELECT event_type, n,
             {sql_dround(
                 f"CAST(c AS DOUBLE)"
                 f" * ((j + 0.5) / {float(_N_HOURS)})"
                 f" * ((j + 0.5) / {float(_N_HOURS)})"
                 f" - ((j + 0.5) / {float(_N_HOURS)})"
                 f"   * (2.0 * c * cb + CAST(c AS DOUBLE) * c) / n"
                 f" + (4.0 * cb * CAST(cb AS DOUBLE) * c"
                 f"    + 4.0 * cb * CAST(c AS DOUBLE) * c"
                 f"    + CAST(c AS DOUBLE)"
                 f"      * (4.0 * c * CAST(c AS DOUBLE) - 1) / 3.0)"
                 f"   / (4.0 * n * CAST(n AS DOUBLE))", 12,
             )} AS term
      FROM cum
    )
    SELECT event_type, n AS n_events,
           {sql_dround(
               "CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE)"
               " + 1.0 / (12.0 * n)", 6,
           )} AS w2_stat
    FROM terms GROUP BY event_type, n
    """,
)
def q_stats_cvm_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér–von Mises uniformity statistic for each event type's
    arrival distribution over the fixed 720-hour month:
    W² = Σᵢ (uᵢ − (2i−1)/(2n))² + 1/(12n), with every event in hour
    cell j assigned the midpoint probability-integral value
    u = (j+0.5)/720 (the grouped-data convention). The quadratic-EDF
    companion to q_ts_ks_drift's sup-norm — CvM weights the whole
    body of the discrepancy, not just its worst point. Under
    uniformity W² ≈ 1/6 + O(1/n); bursty arrival profiles inflate it.

    Plan: event volume collapses to the per-(type, hour) cell frame
    in one hash aggregate; the rank structure folds into a CLOSED
    FORM per cell (the within-cell Σ(2(C+j)−1) and Σ(2(C+j)−1)² sums
    expand to cube-free polynomials in the cell count and its
    preceding cumulative), so the "sort" is one cumulative window
    per type over ≤720 spine rows. Determinism: the per-cell term is
    pure per-row double arithmetic from integer counts (bit-identical
    across engines), e12-rounded before its decimal(38,12) sum; the
    closing adds the 1/(12n) constant and e6-rounds."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        (
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
            - _EPOCH_H
        ).alias("j"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "j",
        "c",
        (F.sum("c").over(wcum) - F.col("c")).cast("bigint").alias("cb"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    c = F.col("c").cast("double")
    cb = F.col("cb").cast("double")
    n = F.col("n").cast("double")
    u = (F.col("j") + 0.5) / float(_N_HOURS)
    term = (
        c * u * u
        - u * (2.0 * c * cb + c * c) / n
        + (4.0 * cb * cb * c + 4.0 * cb * c * c + c * (4.0 * c * c - 1) / 3.0)
        / (4.0 * n * n)
    )
    terms = cum.select(
        "event_type", "n", dround(term, 12).alias("term")
    )
    return terms.groupBy("event_type", F.col("n").alias("n_events")).agg(
        dround(
            F.sum(F.col("term").cast("decimal(38,12)")).cast("double")
            + 1.0 / (12.0 * F.col("n_events")),
            6,
        ).alias("w2_stat")
    )


_SQL_LNU = sql_dround(f"ln((j + 0.5) / {float(_N_HOURS)})", 6)
_SQL_LN1U = sql_dround(f"ln(1.0 - (j + 0.5) / {float(_N_HOURS)})", 6)


@register(
    "q_stats_ad_uniform",
    oracle=f"""
    WITH cells AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) - {_EPOCH_H} AS j,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, j, c,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY j
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - c AS BIGINT) AS cb,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM cells
    ),
    terms AS (
      SELECT event_type, n,
             {sql_dround(
                 "((2.0 * c * cb + CAST(c AS DOUBLE) * c)"
                 "  / (CAST(n AS DOUBLE) * n))"
                 " * (" + _SQL_LNU + ")"
                 " + ((2.0 * n * CAST(c AS DOUBLE)"
                 "     - 2.0 * c * cb - CAST(c AS DOUBLE) * c)"
                 "    / (CAST(n AS DOUBLE) * n))"
                 " * (" + _SQL_LN1U + ")",
                 12,
             )} AS t
      FROM cum
    )
    SELECT event_type, n AS n_events,
           {sql_dround(
               "-CAST(n AS DOUBLE)"
               " - CAST(n AS DOUBLE)"
               "   * CAST(sum(CAST(t AS DECIMAL(38,12))) AS DOUBLE)", 6,
           )} AS a2_stat
    FROM terms GROUP BY event_type, n
    """,
)
def q_stats_ad_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson–Darling uniformity statistic for each event type's
    arrival distribution over the fixed 720-hour month:
    A² = −n − (1/n)Σᵢ(2i−1)(ln uᵢ + ln(1−u_{n+1−i})) with the grouped
    midpoint convention u = (j+0.5)/720 — the tail-weighted EDF
    companion to q_stats_cvm_uniform (the 1/(F(1−F)) weight makes A²
    the sensitive detector for burst onsets at the month's EDGES,
    where CvM and KS go blind).

    Plan: the q_stats_cvm_uniform machinery — one hash aggregate to
    the per-(type, hour) cells, one cumulative window per type over
    ≤720 spine rows, and the rank sums folded into per-cell CLOSED
    FORMS (Σ(2i−1) over a cell = 2cC + c²; the reflected sum =
    2nc − 2cC − c²). Determinism: both lns are e6-rounded (midpoint
    u ∈ (0,1) strictly, so they are total); each cell term is
    normalized by n² FIRST (keeping it O(1) — the decimal magnitude
    bound survives any n), e12-rounded, summed at decimal(38,12);
    the −n − n·S closing is exact double arithmetic, e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        (
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
            - _EPOCH_H
        ).alias("j"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "j",
        "c",
        (F.sum("c").over(wcum) - F.col("c")).cast("bigint").alias("cb"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    c = F.col("c").cast("double")
    cb = F.col("cb").cast("double")
    n = F.col("n").cast("double")
    u = (F.col("j") + 0.5) / float(_N_HOURS)
    lnu = dround(F.log(u), 6)
    ln1u = dround(F.log(1.0 - u), 6)
    t = (
        ((2.0 * c * cb + c * c) / (n * n)) * lnu
        + ((2.0 * n * c - 2.0 * c * cb - c * c) / (n * n)) * ln1u
    )
    terms = cum.select("event_type", "n", dround(t, 12).alias("t"))
    return terms.groupBy("event_type", F.col("n").alias("n_events")).agg(
        dround(
            -F.col("n_events").cast("double")
            - F.col("n_events").cast("double")
            * F.sum(F.col("t").cast("decimal(38,12)")).cast("double"),
            6,
        ).alias("a2_stat")
    )


@register(
    "q_stats_moods_median",
    oracle="""
    WITH vc AS (
      SELECT value, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY value
    ),
    cum AS (
      SELECT value, cnt,
             CAST(sum(cnt) OVER (ORDER BY value
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum
      FROM vc
    ),
    nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
    med AS (
      SELECT ((SELECT min(value) FROM cum c CROSS JOIN nt
               WHERE c.cum >= CAST(floor((nt.n + 1) / 2.0) AS BIGINT))
              + (SELECT min(value) FROM cum c CROSS JOIN nt
                 WHERE c.cum >= CAST(floor(nt.n / 2.0) AS BIGINT) + 1)
             ) / 2.0 AS med
    ),
    g AS (
      SELECT event_type,
             CAST(sum(CASE WHEN value > med THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_above,
             CAST(sum(CASE WHEN value <= med THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_below
      FROM events CROSS JOIN med GROUP BY event_type
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_above) AS BIGINT) AS ta,
             CAST(sum(n_below) AS BIGINT) AS tb
      FROM g
    )
    SELECT t.k, t.ta + t.tb AS n_total,
           (SELECT med FROM med) AS grand_median,
           floor(sum(
             (n_above - CAST(n_above + n_below AS DOUBLE) * t.ta
                        / (t.ta + t.tb))
             * (n_above - CAST(n_above + n_below AS DOUBLE) * t.ta
                          / (t.ta + t.tb))
             / (CAST(n_above + n_below AS DOUBLE) * t.ta / (t.ta + t.tb))
             + (n_below - CAST(n_above + n_below AS DOUBLE) * t.tb
                          / (t.ta + t.tb))
               * (n_below - CAST(n_above + n_below AS DOUBLE) * t.tb
                            / (t.ta + t.tb))
               / (CAST(n_above + n_below AS DOUBLE) * t.tb
                  / (t.ta + t.tb))
           ) * 1000000.0 + 0.5) / 1000000.0 AS chi2
    FROM g CROSS JOIN t GROUP BY t.k, t.ta, t.tb
    """,
)
def q_stats_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the five event types: the 2×k
    above/below contingency against the GRAND exact median (values
    equal to the median count as "below" — documented convention) and
    its chi-square statistic (df = k−1) — the maximally-robust k-group
    location test (only signs of deviations matter), the coarse
    companion to q_stats_kruskal_wallis' rank version.

    Plan: the grand median comes from distinct-value counts + the
    blocked prefix fold and two filtered min-picks (the
    q_stats_brown_forsythe machinery, one shared pooled frame); one
    broadcast of the median closes the 2×k table in a single
    conditional aggregate. Determinism: the median is an exact
    half-sum of observed doubles; cell counts are integers; the chi2
    closing is pure double arithmetic from integer counts,
    e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    vc = e.groupBy("value").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=False)  # fold + total: one pass
    blocked = vc.withColumn(
        "blk", F.floor(F.col("value") / F.lit(_D_BLOCK))
    )
    cum = running_totals_blocked(
        blocked,
        order_cols=["value"],
        block_cols=["blk"],
        sum_cols={"cnt": "cum"},
    )
    nt = vc.agg(F.sum("cnt").cast("bigint").alias("n"))
    c = cum.crossJoin(F.broadcast(nt))
    # r16: both middle picks in ONE conditional aggregate (min ignores
    # the when()-null rows) instead of two filtered aggregates that each
    # re-executed the prefix subtree, plus the lo⋈hi broadcast join.
    med = c.agg(
        F.min(
            F.when(
                F.col("cum") >= F.floor((F.col("n") + 1) / 2.0).cast("bigint"),
                F.col("value"),
            )
        ).alias("v_lo"),
        F.min(
            F.when(
                F.col("cum") >= F.floor(F.col("n") / 2.0).cast("bigint") + 1,
                F.col("value"),
            )
        ).alias("v_hi"),
    ).select(((F.col("v_lo") + F.col("v_hi")) / 2.0).alias("med"))
    g = (
        e.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") > F.col("med"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above"),
            F.sum(F.when(F.col("value") <= F.col("med"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_below"),
        )
        .localCheckpoint(eager=False)  # totals + chi2: one pass
    )
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_above").cast("bigint").alias("ta"),
        F.sum("n_below").cast("bigint").alias("tb"),
    )
    j = g.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(med))
    ng = (F.col("n_above") + F.col("n_below")).cast("double")
    tt = (F.col("ta") + F.col("tb")).cast("double")
    ea = ng * F.col("ta") / tt
    eb = ng * F.col("tb") / tt
    cell = (F.col("n_above") - ea) * (F.col("n_above") - ea) / ea + (
        F.col("n_below") - eb
    ) * (F.col("n_below") - eb) / eb
    return j.groupBy("k", "ta", "tb", "med").agg(
        dround(F.sum(cell), 6).alias("chi2")
    ).select(
        "k",
        (F.col("ta") + F.col("tb")).cast("bigint").alias("n_total"),
        F.col("med").alias("grand_median"),
        "chi2",
    )


@register(
    "q_stats_grubbs_outlier",
    oracle=f"""
    WITH m AS (
      SELECT event_type AS et,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
               / count(*) AS mean_g,
             CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
               AS sxx,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx
      FROM events GROUP BY event_type
    ),
    d AS (
      SELECT e.event_type AS et, e.value,
             abs(e.value - m.mean_g) AS dev
      FROM events e JOIN m ON m.et = e.event_type
    ),
    mx AS (SELECT et, max(dev) AS maxdev FROM d GROUP BY et),
    pick AS (
      SELECT d.et, min(d.value) AS outlier_value
      FROM d JOIN mx ON d.et = mx.et AND d.dev = mx.maxdev
      GROUP BY d.et
    )
    SELECT m.et AS event_type, m.n, {sql_dround("m.mean_g", 6)} AS mean_g,
           {sql_dround(
               "sqrt(greatest((m.sxx - m.sx * m.sx / m.n) / (m.n - 1),"
               " 0))", 6)} AS sd_g,
           p.outlier_value,
           {sql_dround(
               "mx.maxdev / sqrt(greatest((m.sxx - m.sx * m.sx / m.n)"
               " / (m.n - 1), 0))", 6)} AS g_stat
    FROM m JOIN mx ON m.et = mx.et JOIN pick p ON m.et = p.et
    """,
)
def q_stats_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' outlier statistic per event type: G = max|x − mean|/s
    (sample sd) plus the offending value (the SMALLEST value achieving
    the max deviation — deterministic tie-break) — the single-outlier
    screen run before the parametric batteries, complementing
    q_agg_mad_outliers' robust version (G is the test with an actual
    null distribution; MAD is the flagging heuristic).

    Plan: one moment aggregate per type (broadcast back), one
    deviation pass with a per-type max, one equality-pick aggregate —
    three hash aggregates, no windows. Determinism: means/sds ride
    the decimal detour; deviations are per-row doubles compared
    exactly (identical bits both engines); sd and G closings are
    e6-rounded and zero-clamped."""
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
    ).localCheckpoint(eager=False)  # deviation pass + closing: one scan
    mm = m.select(
        "et", "n", "sx", "sxx", (F.col("sx") / F.col("n")).alias("mean_g")
    )
    d = e.join(
        F.broadcast(mm.select("et", "mean_g")),
        e["event_type"] == F.col("et"),
    ).select("et", "value", F.abs(F.col("value") - F.col("mean_g")).alias("dev"))
    d = d.localCheckpoint(eager=False)  # max + pick: one pass
    mx = d.groupBy("et").agg(F.max("dev").alias("maxdev"))
    pick = (
        d.join(F.broadcast(mx), "et")
        .filter(F.col("dev") == F.col("maxdev"))
        .groupBy("et")
        .agg(F.min("value").alias("outlier_value"))
    )
    j = mm.join(F.broadcast(mx), "et").join(F.broadcast(pick), "et")
    sd = F.sqrt(
        F.greatest(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1),
            F.lit(0.0),
        )
    )
    return j.select(
        F.col("et").alias("event_type"),
        "n",
        dround(F.col("mean_g"), 6).alias("mean_g"),
        dround(sd, 6).alias("sd_g"),
        "outlier_value",
        dround(F.col("maxdev") / sd, 6).alias("g_stat"),
    )


@register(
    "q_stats_dixon_q",
    oracle="""
    WITH ext AS (
      SELECT event_type AS et, min(value) AS mn, max(value) AS mx,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    nd AS (
      SELECT e.event_type AS et,
             CAST(sum(CASE WHEN e.value = x.mn THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_min,
             CAST(sum(CASE WHEN e.value = x.mx THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_max,
             min(CASE WHEN e.value > x.mn THEN e.value END) AS min_gt,
             max(CASE WHEN e.value < x.mx THEN e.value END) AS max_lt
      FROM events e JOIN ext x ON e.event_type = x.et
      GROUP BY e.event_type
    )
    SELECT x.et AS event_type, x.n, x.mn AS x_min, x.mx AS x_max,
           floor((CASE WHEN nd.n_min >= 2 THEN x.mn ELSE nd.min_gt END
                  - x.mn) / (x.mx - x.mn) * 1000000.0 + 0.5)
             / 1000000.0 AS q_low,
           floor((x.mx
                  - CASE WHEN nd.n_max >= 2 THEN x.mx ELSE nd.max_lt END)
                 / (x.mx - x.mn) * 1000000.0 + 0.5)
             / 1000000.0 AS q_high
    FROM ext x JOIN nd ON x.et = nd.et
    """,
)
def q_stats_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q ratios per event type: Q_low = (x₂ − x₁)/(xₙ − x₁)
    and Q_high = (xₙ − xₙ₋₁)/(xₙ − x₁) from the order statistics
    (duplicated extremes make the gap 0 — the correct order-statistic
    semantics) — the small-sample endpoint-outlier screen next to
    Grubbs' center-based one: a large Q says the extreme is detached
    from the rest of the range.

    Plan: one extremes aggregate per type (broadcast back), one
    conditional aggregate for second-order statistics — two hash
    aggregates, no windows, no sort. Determinism: all picks are exact
    min/max of observed doubles; the two closing ratios are
    e6-rounded (the range is > 0 for every type at every SF)."""
    e = load_table(spark, sf_dir, "events")
    ext = e.groupBy(F.col("event_type").alias("et")).agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    nd = (
        e.join(F.broadcast(ext), e["event_type"] == F.col("et"))
        .groupBy("et")
        .agg(
            F.sum(F.when(F.col("value") == F.col("mn"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_min"),
            F.sum(F.when(F.col("value") == F.col("mx"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_max"),
            F.min(
                F.when(F.col("value") > F.col("mn"), F.col("value"))
            ).alias("min_gt"),
            F.max(
                F.when(F.col("value") < F.col("mx"), F.col("value"))
            ).alias("max_lt"),
        )
    )
    j = ext.join(nd, "et")
    x2 = F.when(F.col("n_min") >= 2, F.col("mn")).otherwise(
        F.col("min_gt")
    )
    xn1 = F.when(F.col("n_max") >= 2, F.col("mx")).otherwise(
        F.col("max_lt")
    )
    rng = F.col("mx") - F.col("mn")
    return j.select(
        F.col("et").alias("event_type"),
        "n",
        F.col("mn").alias("x_min"),
        F.col("mx").alias("x_max"),
        dround((x2 - F.col("mn")) / rng, 6).alias("q_low"),
        dround((F.col("mx") - xn1) / rng, 6).alias("q_high"),
    )


@register(
    "q_stats_cochran_q",
    oracle="""
    WITH x AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    r AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS ri
      FROM x GROUP BY user_id
    ),
    cj AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS c
      FROM x GROUP BY event_type
    ),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM cj),
    rs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(ri) AS BIGINT) AS sr,
             CAST(sum(ri * ri) AS BIGINT) AS sr2
      FROM r
    ),
    cs AS (
      SELECT CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS sc2
      FROM cj
    )
    SELECT k.k, rs.n_users,
           CASE WHEN k.k * rs.sr - rs.sr2 = 0 THEN NULL ELSE
             floor((k.k - 1.0)
                   * (k.k * CAST(cs.sc2 AS DOUBLE)
                      - CAST(cs.sc AS DOUBLE) * cs.sc)
                   / (k.k * CAST(rs.sr AS DOUBLE)
                      - CAST(rs.sr2 AS DOUBLE))
                   * 1000000.0 + 0.5) / 1000000.0
           END AS q_stat
    FROM k CROSS JOIN rs CROSS JOIN cs
    """,
)
def q_stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over the users × event-types participation matrix
    (x_uj = 1 iff user u performed type j at least once):
    Q = (k−1)·(k·ΣCⱼ² − (ΣCⱼ)²) / (k·ΣRᵢ − ΣRᵢ²) — the k-treatment
    binary repeated-measures test ("do the five behaviors have equal
    adoption across the SAME users?"), the k-ary extension of
    q_stats_mcnemar. df = k−1; users who did everything (Rᵢ = k)
    contribute no discrimination — and when EVERY user did (possible
    at tiny SF: 15 users all hit all 5 types at sf0.001) the
    denominator is 0 and the statistic takes the NULL branch on both
    sides (documented degenerate case).

    Plan: one DISTINCT (user, type) aggregate (the only touch of raw
    volume — the shuffle carries ≤ |users|·k pairs), then row/column
    marginal aggregates and a one-row integer closing. Determinism:
    pure integer sums end-to-end; the single closing division is
    e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    x = e.select("user_id", "event_type").distinct().localCheckpoint(
        eager=False
    )  # row + column marginals: one distinct pass
    r = x.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ri")
    )
    cj = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    k = cj.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    rs = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("ri").cast("bigint").alias("sr"),
        F.sum(F.col("ri") * F.col("ri")).cast("bigint").alias("sr2"),
    )
    cs = cj.agg(
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sc2"),
    )
    j = k.crossJoin(F.broadcast(rs)).crossJoin(F.broadcast(cs))
    kk = F.col("k").cast("double")
    return j.select(
        "k",
        "n_users",
        F.when(
            F.col("k") * F.col("sr") - F.col("sr2") == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            dround(
                (kk - 1.0)
                * (kk * F.col("sc2").cast("double")
                   - F.col("sc").cast("double") * F.col("sc"))
                / (kk * F.col("sr").cast("double")
                   - F.col("sr2").cast("double")),
                6,
            )
        )
        .alias("q_stat"),
    )


# Ansari-Bradley sample pair: the two highest-traffic interaction
# types, compared on hourly value-sum dispersion.
_AB_G1 = "click"
_AB_G2 = "view"

_SQL_AB_HOURLY = f"""
      SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS m
      FROM events WHERE event_type IN ('{_AB_G1}', '{_AB_G2}')
      GROUP BY 1, 2
"""


@register(
    "q_stats_ansari_bradley",
    oracle=f"""
    WITH hv AS ({_SQL_AB_HOURLY}),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hv),
    rk AS (
      SELECT event_type,
             CAST(rank() OVER (ORDER BY m) AS DOUBLE)
               + (CAST(count(*) OVER (PARTITION BY m) AS DOUBLE) - 1)
                 / 2.0 AS r
      FROM hv
    ),
    sc AS (
      SELECT event_type,
             least(r, CAST(n AS DOUBLE) + 1.0 - r) AS a
      FROM rk CROSS JOIN nn
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN event_type = '{_AB_G1}' THEN 1 ELSE 0
                      END) AS BIGINT) AS m1,
             CAST(sum(CASE WHEN event_type = '{_AB_G2}' THEN 1 ELSE 0
                      END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN event_type = '{_AB_G1}'
                      THEN CAST(a AS DECIMAL(25,6)) END)
                  AS DOUBLE) AS w,
             CAST(sum(CAST(a AS DECIMAL(25,6))) AS DOUBLE) AS sa,
             CAST(sum(CAST(a * a AS DECIMAL(25,6))) AS DOUBLE) AS saa
      FROM sc
    ),
    cl AS (
      SELECT m1, n2, w,
             CAST(m1 AS DOUBLE) * sa / (m1 + n2) AS e_w,
             CAST(m1 AS DOUBLE) * n2
               * ((m1 + n2) * saa - sa * sa)
               / (CAST(m1 + n2 AS DOUBLE) * (m1 + n2) * (m1 + n2 - 1))
               AS var_w
      FROM agg
    )
    SELECT m1 AS n_g1, n2 AS n_g2,
           {sql_dround("w", 6)} AS w_stat,
           {sql_dround("e_w", 6)} AS e_w,
           {sql_dround("var_w", 6)} AS var_w,
           CASE WHEN var_w <= 0 THEN NULL
                ELSE {sql_dround(
                    "(w - e_w) / (" + sql_dround("sqrt(var_w)", 6)
                    + ")", 6)}
           END AS z
    FROM cl
    """,
)
def q_stats_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley dispersion test: do 'click' and 'view' hourly
    value sums have the same SPREAD around a common median? Scores run
    from both ends of the pooled midrank order (a = min(r, N+1−r) —
    center-heavy observations score high), W = Σa over the click
    group; z closes from the tie-robust score-sum moments E[W] =
    m·Σa/N, Var[W] = mn(NΣa² − (Σa)²)/(N²(N−1)). The scale
    counterpart of q_stats_mannwhitney_u's location test — equal
    medians but different z here means one surface's hourly engagement
    is far more volatile.

    Plan: one filtered (type, hour) hash aggregate (corpus-sized scan
    collapses to ≤2·|hours| rows); the pooled midrank window runs over
    that time-grain-bounded frame (allowlisted, the q_ts_xcorr class;
    the tie-count window is value-partitioned); one scalar aggregate
    closes. Determinism: the ranked metric is a decimal-detour sum so
    pooled tie groups agree exactly; midranks and scores are exact
    .5-grid rationals summed through the decimal detour (Σa² stays
    ≤ N³ ≈ 3e9 at the hourly grain — inside the 2^53 unscaled bound);
    moment closings cast to DOUBLE before multiplying in identical
    IEEE order; √Var is e6-rounded before the e6-rounded z."""
    e = load_table(spark, sf_dir, "events")
    hv = (
        e.filter(F.col("event_type").isin(_AB_G1, _AB_G2))
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600)
            .cast("bigint")
            .alias("h"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("m")
        )
    )
    nn = hv.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wr = Window.orderBy("m")
    wt = Window.partitionBy("m")
    rk = hv.select(
        "event_type",
        (
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(wt).cast("double") - 1) / 2.0
        ).alias("r"),
    )
    sc = rk.crossJoin(F.broadcast(nn)).select(
        "event_type",
        F.least(
            F.col("r"), F.col("n").cast("double") + 1.0 - F.col("r")
        ).alias("a"),
    )
    a = F.col("a")
    dec = "decimal(25,6)"
    agg = sc.agg(
        F.sum(F.when(F.col("event_type") == _AB_G1, 1).otherwise(0))
        .cast("bigint")
        .alias("m1"),
        F.sum(F.when(F.col("event_type") == _AB_G2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("event_type") == _AB_G1, a.cast(dec)))
        .cast("double")
        .alias("w"),
        F.sum(a.cast(dec)).cast("double").alias("sa"),
        F.sum((a * a).cast(dec)).cast("double").alias("saa"),
    )
    m1, n2 = F.col("m1"), F.col("n2")
    cl = agg.select(
        "m1",
        "n2",
        "w",
        (m1.cast("double") * F.col("sa") / (m1 + n2)).alias("e_w"),
        (
            m1.cast("double")
            * n2
            * ((m1 + n2) * F.col("saa") - F.col("sa") * F.col("sa"))
            / ((m1 + n2).cast("double") * (m1 + n2) * (m1 + n2 - 1))
        ).alias("var_w"),
    )
    w, ew, vw = F.col("w"), F.col("e_w"), F.col("var_w")
    return cl.select(
        m1.alias("n_g1"),
        n2.alias("n_g2"),
        dround(w, 6).alias("w_stat"),
        dround(ew, 6).alias("e_w"),
        dround(vw, 6).alias("var_w"),
        F.when(vw <= 0, F.lit(None).cast("double"))
        .otherwise(dround((w - ew) / dround(F.sqrt(vw), 6), 6))
        .alias("z"),
    )


# Yuen trim fraction, as an integer reciprocal (g = n div 10 per side).
_YUEN_TRIM_DIV = 10


@register(
    "q_stats_yuen_trimmed",
    oracle=f"""
    WITH hv AS ({_SQL_AB_HOURLY}),
    rk AS (
      SELECT event_type, m,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY m, h) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type)
                  AS BIGINT) AS n
      FROM hv
    ),
    bounds AS (
      SELECT event_type, n, n // {_YUEN_TRIM_DIV} AS g,
             max(CASE WHEN rn = n // {_YUEN_TRIM_DIV} + 1
                 THEN m END) AS lo,
             max(CASE WHEN rn = n - n // {_YUEN_TRIM_DIV}
                 THEN m END) AS hi
      FROM rk GROUP BY event_type, n
    ),
    w AS (
      SELECT rk.event_type, rk.n, b.g,
             CASE WHEN rk.rn > b.g AND rk.rn <= rk.n - b.g
                  THEN CAST(rk.m AS DECIMAL(25,6)) END AS tm,
             CASE WHEN rk.m < b.lo THEN b.lo
                  WHEN rk.m > b.hi THEN b.hi
                  ELSE rk.m END AS wv
      FROM rk JOIN bounds b ON rk.event_type = b.event_type
    ),
    agg AS (
      SELECT event_type, n, g, n - 2 * g AS h_eff,
             CAST(sum(tm) AS DOUBLE) / (n - 2 * g) AS tmean,
             CAST(sum(CAST(wv AS DECIMAL(25,6))) AS DOUBLE) AS sw,
             CAST(sum(CAST(wv * wv AS DECIMAL(25,6)))
                  AS DOUBLE) AS sww
      FROM w GROUP BY event_type, n, g
    ),
    d AS (
      SELECT event_type, n, g, h_eff, tmean,
             (sww - sw * sw / n) / (n - 1) AS wvar
      FROM agg
    ),
    two AS (
      SELECT max(CASE WHEN event_type = '{_AB_G1}' THEN n END) AS n1,
             max(CASE WHEN event_type = '{_AB_G1}' THEN g END) AS g1,
             max(CASE WHEN event_type = '{_AB_G1}' THEN h_eff END) AS h1,
             max(CASE WHEN event_type = '{_AB_G1}' THEN tmean END) AS tm1,
             max(CASE WHEN event_type = '{_AB_G1}' THEN wvar END) AS wv1,
             max(CASE WHEN event_type = '{_AB_G2}' THEN n END) AS n2,
             max(CASE WHEN event_type = '{_AB_G2}' THEN h_eff END) AS h2,
             max(CASE WHEN event_type = '{_AB_G2}' THEN tmean END) AS tm2,
             max(CASE WHEN event_type = '{_AB_G2}' THEN wvar END) AS wv2
      FROM d
    )
    SELECT n1, n2, h1 AS h_eff1, h2 AS h_eff2,
           {sql_dround("tm1", 6)} AS tmean_g1,
           {sql_dround("tm2", 6)} AS tmean_g2,
           {sql_dround("tm1 - tm2", 6)} AS diff,
           CASE WHEN h1 <= 1 OR h2 <= 1 THEN NULL
                ELSE {sql_dround(
                    "(tm1 - tm2) / ("
                    + sql_dround(
                        "sqrt(wv1 * (n1 - 1) / (h1 * (h1 - 1.0))"
                        " + wv2 * (n2 - 1) / (h2 * (h2 - 1.0)))", 6)
                    + ")", 6)}
           END AS yuen_t
    FROM two
    """,
)
def q_stats_yuen_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's trimmed-mean test between the 'click' and 'view' hourly
    value-sum samples: 10%-per-side trimmed means compared through the
    winsorized variances — t = (x̄ₜ₁−x̄ₜ₂)/√(d₁+d₂) with dᵢ =
    s²wᵢ(nᵢ−1)/(hᵢ(hᵢ−1)) — the outlier-robust replacement for
    q_agg_welch_ttest when a few blowout hours would otherwise own the
    mean (Yuen 1974). Trim counts are exact integer n div 10; the
    trimmed/winsorized sets come from an unambiguous (value, hour)
    total order.

    Plan: one filtered (type, hour) hash aggregate; ranking windows
    partitioned BY TYPE over the ≤|hours| frame (time-grain bounded —
    never data-volume sized); the two order-statistic bounds come from
    one conditional aggregate joined back (aggregate-sized); one
    scalar pivot closes. Determinism: the ranked metric is a decimal-
    detour sum (tie order fixed by the hour tiebreak); trimmed sums
    and winsorized moments ride the decimal detour (squared hourly
    sums stay ≪ the 2⁵³ unscaled bound at this grain — the hourly
    value-sum magnitudes; re-grain before squaring if levels grow
    ~100×); closings are IEEE chains with √ e6-rounded before the
    e6-rounded t; degenerate trims (h ≤ 1) read NULL."""
    e = load_table(spark, sf_dir, "events")
    hv = (
        e.filter(F.col("event_type").isin(_AB_G1, _AB_G2))
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600)
            .cast("bigint")
            .alias("h"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("m")
        )
    )
    wr = Window.partitionBy("event_type").orderBy("m", "h")
    wn = Window.partitionBy("event_type")
    rk = hv.select(
        "event_type",
        "m",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    g = (F.col("n") / _YUEN_TRIM_DIV).cast("bigint")
    bounds = rk.groupBy("event_type", "n").agg(
        F.max(F.when(F.col("rn") == g + 1, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("rn") == F.col("n") - g, F.col("m"))).alias(
            "hi"
        ),
    ).select(
        F.col("event_type").alias("bt"),
        F.col("n").alias("bn"),
        g.alias("g"),
        "lo",
        "hi",
    )
    dec = "decimal(25,6)"
    w = rk.join(
        F.broadcast(bounds), rk["event_type"] == bounds["bt"]
    ).select(
        "event_type",
        "n",
        "g",
        F.when(
            (F.col("rn") > F.col("g"))
            & (F.col("rn") <= F.col("n") - F.col("g")),
            F.col("m").cast(dec),
        ).alias("tm"),
        F.when(F.col("m") < F.col("lo"), F.col("lo"))
        .when(F.col("m") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("m"))
        .alias("wv"),
    )
    agg = w.groupBy("event_type", "n", "g").agg(
        (
            F.sum("tm").cast("double")
            / (F.col("n") - 2 * F.col("g"))
        ).alias("tmean"),
        F.sum(F.col("wv").cast(dec)).cast("double").alias("sw"),
        F.sum((F.col("wv") * F.col("wv")).cast(dec))
        .cast("double")
        .alias("sww"),
    )
    d = agg.select(
        "event_type",
        "n",
        "g",
        (F.col("n") - 2 * F.col("g")).alias("h_eff"),
        "tmean",
        (
            (F.col("sww") - F.col("sw") * F.col("sw") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("wvar"),
    )

    def pick(col, t):
        return F.max(F.when(F.col("event_type") == t, F.col(col)))

    two = d.agg(
        pick("n", _AB_G1).alias("n1"),
        pick("h_eff", _AB_G1).alias("h1"),
        pick("tmean", _AB_G1).alias("tm1"),
        pick("wvar", _AB_G1).alias("wv1"),
        pick("n", _AB_G2).alias("n2"),
        pick("h_eff", _AB_G2).alias("h2"),
        pick("tmean", _AB_G2).alias("tm2"),
        pick("wvar", _AB_G2).alias("wv2"),
    )
    tm1, tm2 = F.col("tm1"), F.col("tm2")
    h1, h2 = F.col("h1"), F.col("h2")
    se = dround(
        F.sqrt(
            F.col("wv1") * (F.col("n1") - 1) / (h1 * (h1 - 1.0))
            + F.col("wv2") * (F.col("n2") - 1) / (h2 * (h2 - 1.0))
        ),
        6,
    )
    return two.select(
        "n1",
        "n2",
        h1.alias("h_eff1"),
        h2.alias("h_eff2"),
        dround(tm1, 6).alias("tmean_g1"),
        dround(tm2, 6).alias("tmean_g2"),
        dround(tm1 - tm2, 6).alias("diff"),
        F.when((h1 <= 1) | (h2 <= 1), F.lit(None).cast("double"))
        .otherwise(dround((tm1 - tm2) / se, 6))
        .alias("yuen_t"),
    )


@register(
    "q_stats_fligner_policello",
    oracle=f"""
    WITH hv AS ({_SQL_AB_HOURLY}),
    rk AS (
      SELECT event_type,
             CAST(rank() OVER (ORDER BY m) AS DOUBLE)
               + (CAST(count(*) OVER (PARTITION BY m) AS DOUBLE) - 1)
                 / 2.0 AS r_pool,
             CAST(rank() OVER (PARTITION BY event_type ORDER BY m)
                  AS DOUBLE)
               + (CAST(count(*) OVER (PARTITION BY event_type, m)
                       AS DOUBLE) - 1) / 2.0 AS r_own
      FROM hv
    ),
    pl AS (
      SELECT event_type, r_pool - r_own AS p FROM rk
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(p AS DECIMAL(25,6))) AS DOUBLE) AS sp,
             CAST(sum(CAST(p * p AS DECIMAL(25,6))) AS DOUBLE) AS spp
      FROM pl GROUP BY event_type
    ),
    two AS (
      SELECT max(CASE WHEN event_type = '{_AB_G1}' THEN n END) AS n1,
             max(CASE WHEN event_type = '{_AB_G1}' THEN sp END) AS sp1,
             max(CASE WHEN event_type = '{_AB_G1}' THEN spp END) AS v1,
             max(CASE WHEN event_type = '{_AB_G2}' THEN n END) AS n2,
             max(CASE WHEN event_type = '{_AB_G2}' THEN sp END) AS sp2,
             max(CASE WHEN event_type = '{_AB_G2}' THEN spp END) AS v2
      FROM g
    ),
    c AS (
      SELECT n1, n2, sp1, sp2,
             v1 - sp1 * sp1 / n1 AS ss1,
             v2 - sp2 * sp2 / n2 AS ss2,
             sp1 / n1 * (sp2 / n2) AS pq
      FROM two
    )
    SELECT n1 AS n_g1, n2 AS n_g2,
           {sql_dround("sp1 / n1", 6)} AS mean_placement_g1,
           {sql_dround("sp2 / n2", 6)} AS mean_placement_g2,
           CASE WHEN ss1 + ss2 + pq <= 0 THEN NULL
                ELSE {sql_dround(
                    "(sp2 - sp1) / (2.0 * ("
                    + sql_dround("sqrt(ss1 + ss2 + pq)", 6)
                    + "))", 6)}
           END AS u_stat
    FROM c
    """,
)
def q_stats_fligner_policello(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fligner–Policello robust rank-order test between the 'click'
    and 'view' hourly value-sum samples: placements P_i = #(other
    group < x_i) (+½ ties) compared through û = (ΣP₂ − ΣP₁) /
    (2√(SS₁ + SS₂ + P̄₁P̄₂)) — the Behrens–Fisher-safe alternative to
    q_stats_mannwhitney_u that does NOT assume equal variances (only
    symmetry), the exact gap Welch fills for t-tests. Placements come
    from the identity P_i = midrank_pooled(x_i) − midrank_own(x_i), so
    NO cross-group comparison join ever runs.

    Plan: one filtered (type, hour) hash aggregate; the pooled midrank
    window runs over the ≤2·|hours| time-grain-bounded frame
    (allowlisted, the q_stats_ansari_bradley class) and the own-group
    windows are partitioned; one per-group moment aggregate + scalar
    pivot close. Determinism: the ranked metric is a decimal-detour
    sum so pooled tie groups agree exactly; placements are exact
    .5-grid rationals whose moments ride the decimal detour (Σp² ≤
    n³ ≈ 3e9 at the hourly grain — inside the 2⁵³ bound); closings
    cast in identical IEEE order with √ e6-rounded before the
    e6-rounded û; a degenerate spread reads NULL."""
    e = load_table(spark, sf_dir, "events")
    hv = (
        e.filter(F.col("event_type").isin(_AB_G1, _AB_G2))
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600)
            .cast("bigint")
            .alias("h"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("m")
        )
    )
    wp = Window.orderBy("m")
    wpt = Window.partitionBy("m")
    wo = Window.partitionBy("event_type").orderBy("m")
    wot = Window.partitionBy("event_type", "m")
    r_pool = (
        F.rank().over(wp).cast("double")
        + (F.count(F.lit(1)).over(wpt).cast("double") - 1) / 2.0
    )
    r_own = (
        F.rank().over(wo).cast("double")
        + (F.count(F.lit(1)).over(wot).cast("double") - 1) / 2.0
    )
    pl = hv.select(
        "event_type", (r_pool - r_own).alias("p")
    )
    dec = "decimal(25,6)"
    g = pl.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("p").cast(dec)).cast("double").alias("sp"),
        F.sum((F.col("p") * F.col("p")).cast(dec))
        .cast("double")
        .alias("spp"),
    )

    def pick(col, t):
        return F.max(F.when(F.col("event_type") == t, F.col(col)))

    two = g.agg(
        pick("n", _AB_G1).alias("n1"),
        pick("sp", _AB_G1).alias("sp1"),
        pick("spp", _AB_G1).alias("v1"),
        pick("n", _AB_G2).alias("n2"),
        pick("sp", _AB_G2).alias("sp2"),
        pick("spp", _AB_G2).alias("v2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    sp1, sp2 = F.col("sp1"), F.col("sp2")
    c = two.select(
        "n1",
        "n2",
        "sp1",
        "sp2",
        (F.col("v1") - sp1 * sp1 / n1).alias("ss1"),
        (F.col("v2") - sp2 * sp2 / n2).alias("ss2"),
        (sp1 / n1 * (sp2 / n2)).alias("pq"),
    )
    den = F.col("ss1") + F.col("ss2") + F.col("pq")
    return c.select(
        n1.alias("n_g1"),
        n2.alias("n_g2"),
        dround(sp1 / n1, 6).alias("mean_placement_g1"),
        dround(sp2 / n2, 6).alias("mean_placement_g2"),
        F.when(den <= 0, F.lit(None).cast("double"))
        .otherwise(
            dround(
                (sp2 - sp1) / (2.0 * dround(F.sqrt(den), 6)), 6
            )
        )
        .alias("u_stat"),
    )


@register(
    "q_stats_kuiper_uniform",
    oracle=f"""
    WITH cells AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) - {_EPOCH_H} AS j,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, j, c,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY j
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM cells
    ),
    dev AS (
      SELECT event_type, n,
             CAST(cum AS DOUBLE) / n - (j + 0.5) / {float(_N_HOURS)}
               AS dplus,
             (j + 0.5) / {float(_N_HOURS)}
               - CAST(cum - c AS DOUBLE) / n AS dminus
      FROM cum
    )
    SELECT event_type, n AS n_events,
           {sql_dround("max(dplus)", 6)} AS d_plus,
           {sql_dround("max(dminus)", 6)} AS d_minus,
           {sql_dround("max(dplus) + max(dminus)", 6)} AS v_stat
    FROM dev GROUP BY event_type, n
    """,
)
def q_stats_kuiper_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper's V uniformity statistic for each event type's arrival
    distribution over the fixed 720-hour month: V = D⁺ + D⁻, the sum
    of the largest positive and negative EDF deviations under the
    grouped-data midpoint convention u = (j+0.5)/720 (exactly
    q_stats_cvm_uniform's assignment). Unlike the one-sided KS
    sup-norm, V is invariant to cyclic shifts of the origin — the
    right uniformity test for ARRIVAL-TIME-OF-DAY/month data where
    "where the month starts" is arbitrary; a diurnal profile that KS
    half-misses (deviation split across the wrap point) shows fully
    in V.

    Plan: one per-(type, hour) hash aggregate, one cumulative window
    per type over ≤720 spine rows, one closing max aggregate — event
    volume touches only the first aggregate. Determinism: deviations
    are pure double arithmetic on exact integer counts (bit-identical
    across engines), max picks are exact, and the three outputs
    e6-round. D⁺ uses the inclusive cumulative count (EDF just after
    the cell's mass), D⁻ the exclusive one (just before) — both
    documented in the oracle identically."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        (
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
            - _EPOCH_H
        ).alias("j"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "j",
        "c",
        F.sum("c").over(wcum).cast("bigint").alias("cum"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    u = (F.col("j") + 0.5) / float(_N_HOURS)
    dev = cum.select(
        "event_type",
        "n",
        (F.col("cum").cast("double") / F.col("n") - u).alias("dplus"),
        (
            u - (F.col("cum") - F.col("c")).cast("double") / F.col("n")
        ).alias("dminus"),
    )
    return dev.groupBy("event_type", F.col("n").alias("n_events")).agg(
        dround(F.max("dplus"), 6).alias("d_plus"),
        dround(F.max("dminus"), 6).alias("d_minus"),
        dround(F.max("dplus") + F.max("dminus"), 6).alias("v_stat"),
    )


@register(
    "q_stats_ks_two_sample",
    oracle=f"""
    WITH vc AS (
      SELECT value,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY value
    ),
    cum AS (
      SELECT value,
             CAST(sum(c1) OVER w AS BIGINT) AS k1,
             CAST(sum(c2) OVER w AS BIGINT) AS k2,
             CAST(sum(c1) OVER () AS BIGINT) AS n1,
             CAST(sum(c2) OVER () AS BIGINT) AS n2
      FROM vc
      WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    dev AS (
      SELECT n1, n2,
             CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2 AS d
      FROM cum
    )
    SELECT max(n1) AS n1, max(n2) AS n2,
           {sql_dround("max(d)", 6)} AS d_plus,
           {sql_dround("max(-d)", 6)} AS d_minus,
           {sql_dround("greatest(max(d), max(-d))", 6)} AS d_stat,
           {sql_dround(
               "greatest(max(d), max(-d))"
               " * sqrt(CAST(max(n1) AS DOUBLE) * max(n2)"
               "        / (max(n1) + max(n2)))", 6)} AS ks_stat
    FROM dev
    """,
)
def q_stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between the click and view
    VALUE distributions: D = sup|F₁ − F₂| over the pooled value grid,
    with its one-sided parts and the scaled statistic
    D·√(n₁n₂/(n₁+n₂)) — the distribution-equality companion to
    q_agg_welch_ttest (means) / q_stats_f_test_variance (scale) /
    q_stats_mannwhitney_u (location shift): KS sees ANY difference.
    (q_ts_ks_drift is the same sup-norm across TIME halves; this is
    the across-SEGMENT form.)

    Plan: event volume collapses to per-DISTINCT-value conditional
    counts in one hash aggregate; the pooled EDF cumulative runs as
    the blocked prefix fold over the fixed value/10 grid (≤57 blocks
    at this value range — operators/prefix.py's deterministic
    blocking, never a single-partition sort); one max-aggregate
    closing. Determinism: EDF steps are exact integer-ratio doubles;
    sup picks are exact; outputs e6-round (sqrt is the one libm
    call). Ties across groups are handled exactly: both EDFs evaluate
    at every pooled distinct value."""
    e = load_table(spark, sf_dir, "events")
    vc = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("c1"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("c2"),
        )
        # r16 wave 8: pin the distinct-value frame — it feeds the
        # blocked prefix fold (two consumers) AND the n1/n2 totals,
        # each of which previously re-ran the events-scale aggregate.
        .localCheckpoint(eager=False)
    )
    blocked = vc.withColumn(
        "blk", F.floor(F.col("value") / F.lit(10.0)).cast("bigint")
    )
    cum = running_totals_blocked(
        blocked,
        order_cols=["value"],
        block_cols=["blk"],
        sum_cols={"c1": "k1", "c2": "k2"},
    )
    tot = vc.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        (
            F.col("k1").cast("double") / F.col("n1")
            - F.col("k2").cast("double") / F.col("n2")
        ).alias("d"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    d_stat = F.greatest(F.max("d"), F.max(-F.col("d")))
    return dev.groupBy("n1", "n2").agg(
        dround(F.max("d"), 6).alias("d_plus"),
        dround(F.max(-F.col("d")), 6).alias("d_minus"),
        dround(d_stat, 6).alias("d_stat"),
        dround(
            d_stat
            * F.sqrt(n1.cast("double") * n2 / (n1 + n2)),
            6,
        ).alias("ks_stat"),
    )


@register(
    "q_stats_kendall_w",
    oracle=f"""
    WITH d AS (
      SELECT l_returnflag AS rf, CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
               AS rev
      FROM lineitem GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
    ),
    mm AS (SELECT CAST(count(DISTINCT rf) AS BIGINT) AS m FROM d),
    full_days AS (
      SELECT day FROM d CROSS JOIN mm
      GROUP BY day, mm.m HAVING count(*) = mm.m
    ),
    ranks AS (
      SELECT rf, day,
             CAST(row_number() OVER (PARTITION BY rf
                                     ORDER BY rev, day) AS BIGINT) AS r
      FROM d JOIN full_days USING (day)
    ),
    rs AS (
      SELECT day, CAST(sum(r) AS BIGINT) AS rsum
      FROM ranks GROUP BY day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rs),
    s4 AS (
      SELECT CAST(sum((2 * rsum - mm.m * (nn.n + 1))
                      * (2 * rsum - mm.m * (nn.n + 1))) AS BIGINT) AS s4
      FROM rs CROSS JOIN mm CROSS JOIN nn
      GROUP BY mm.m, nn.n
    )
    SELECT mm.m AS n_judges, nn.n AS n_items, s4.s4 AS s4,
           floor(3.0 * s4.s4
                 / (CAST(mm.m AS DOUBLE) * mm.m
                    * (CAST(nn.n AS DOUBLE) * nn.n * nn.n - nn.n))
                 * 1000000.0 + 0.5) / 1000000.0 AS w
    FROM s4 CROSS JOIN mm CROSS JOIN nn
    """,
)
def q_stats_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across the return-flag
    "judges": each flag ranks the common trading days by its daily
    revenue; W ∈ [0,1] measures how much the m rankings agree
    (W = 12·S / (m²(n³−n)), Kendall & Babington Smith 1939) — the
    multi-rater companion to q_stats_kendall_tau's two-series view.
    Only days carried by ALL flags enter (complete-block requirement);
    revenue ties are broken by day, making every rank a total order.

    Plan: one hash aggregate to the (flag, day) grain, a HAVING-style
    complete-day filter, per-flag rank windows (time-grain-bounded
    partitions), a per-day rank-sum aggregate, one closing row.
    Determinism: ALL-INTEGER core — using S4 = Σ(2·Rᵢ − m(n+1))² = 4S
    keeps the deviations integral (no n+1 halves), so W = 3·S4 /
    (m²(n³−n)) is a single IEEE division of exact integers,
    e6-rounded; magnitudes ≤ m²n³ ≈ 1e11 at sf0.1 — far inside
    int64."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("rev")
    )
    # r16 wave 9 NOTE: pinning this ≤|flags|·|days| frame was A/B-
    # tested and REVERTED (1.29 -> 2.77 s): the seven duplicated
    # lineitem subtrees run CONCURRENTLY inside one job, while the
    # checkpoint serializes the aggregate into a blocking job ahead
    # of every consumer.
    mm = d.agg(F.countDistinct("rf").cast("bigint").alias("m"))
    full_days = (
        d.crossJoin(F.broadcast(mm))
        .groupBy("day", "m")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == F.col("m"))
        .select("day")
    )
    wr = Window.partitionBy("rf").orderBy("rev", "day")
    ranks = d.join(full_days, "day").select(
        "rf", "day", F.row_number().over(wr).cast("bigint").alias("r")
    )
    rs = ranks.groupBy("day").agg(F.sum("r").cast("bigint").alias("rsum"))
    nn = rs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dev = 2 * F.col("rsum") - F.col("m") * (F.col("n") + 1)
    s4 = (
        rs.crossJoin(F.broadcast(mm))
        .crossJoin(F.broadcast(nn))
        .groupBy("m", "n")
        .agg(F.sum(dev * dev).cast("bigint").alias("s4"))
    )
    return s4.select(
        F.col("m").alias("n_judges"),
        F.col("n").alias("n_items"),
        "s4",
        dround(
            3.0
            * F.col("s4")
            / (
                F.col("m").cast("double")
                * F.col("m")
                * (
                    F.col("n").cast("double") * F.col("n") * F.col("n")
                    - F.col("n")
                )
            ),
            6,
        ).alias("w"),
    )
