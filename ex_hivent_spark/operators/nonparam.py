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
