"""Deterministic resampling inference: the Poisson bootstrap
confidence interval (the resampling scheme that actually works on a
cluster — per-row independent Poisson(1) weights need no global
sample-with-replacement coordination, the classic streaming-bootstrap
construction) and the leave-one-block-out jackknife standard error —
the two assumption-free uncertainty readouts an experimentation
platform pairs with its closed-form tests (q_agg_welch_ttest,
q_ab_permutation_test).

Randomness is the engine's no-rand() rule throughout: every replicate
weight is an md5-derived uniform pushed through the spelled-literal
Poisson(1) inverse CDF, so replicas are identical on any cluster,
partitioning, or retry — and in the DuckDB oracle.

Plan discipline: event volume collapses to the per-user metric frame
ONCE; the B-replicate grid expands that aggregate (never raw events)
through one hash aggregate keyed on rep; the percentile pick runs on
the B-row replicate frame (bounded by the literal B, allowlisted).
The jackknife's blocks are DAYS — the leave-one-out means come from
one day-grain aggregate plus a broadcast one-row total, never a
second scan.

Determinism: per-user/day sums ride the decimal detour; weights are
exact small integers; replicate means are decimal-sum/int-sum
divisions; deviations are e6-rounded before the decimal(38,12) square
sums; closing sqrt/CI picks are e6-rounded.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no inference surface; these derive from the
driver's analytics mandate and standard resampling practice (Efron's
bootstrap/jackknife; the Poisson bootstrap per Chamandy et al.'s
"Estimating Uncertainty for Massive Data Streams").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# Bootstrap replicate count (the permutation test's B).
_BOOT_B = 200
# Two-sided 95% CI tail ranks over B replicates.
_K_LO = 5  # ceil(0.025 * 200)
_K_HI = 195  # floor(0.975 * 200)
# Cumulative Poisson(1) inverse-CDF thresholds, spelled as exact
# double literals (never computed via exp()) so both engines parse
# identical IEEE values. P(W > 5) ≈ 5.9e-4 folds into weight 6 (cap).
_POIS_CUM = (
    0.36787944117144233,  # P(0)
    0.7357588823428847,  # P(<=1)
    0.9196986029286058,  # P(<=2)
    0.9810118431238462,  # P(<=3)
    0.9963401531726563,  # P(<=4)
    0.9994058151824183,  # P(<=5)
)
# 13 md5 hex chars -> uniform grid denominator 16^13 = 2^52.
_U_DEN = 4503599627370496.0


def _sql_pois_weight(u_expr: str) -> str:
    """CASE ladder mapping a uniform in [0,1) to a Poisson(1) draw."""
    branches = "".join(
        f" WHEN {u_expr} < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"CASE{branches} ELSE 6 END"


def _pois_weight(u) -> F.Column:
    w = F.when(u < _POIS_CUM[0], 0)
    for k, c in enumerate(_POIS_CUM[1:], start=1):
        w = w.when(u < c, k)
    return w.otherwise(6)


@register(
    "q_ab_bootstrap_ci",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS m
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CAST(m AS DECIMAL(25,6))) AS DOUBLE) / count(*)
               AS obs_mean
      FROM u
    ),
    reps AS (
      SELECT u.user_id, u.m, r.rep,
             {_sql_pois_weight(
                 "('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':'"
                 " || CAST(r.rep AS VARCHAR)), 1, 13))::BIGINT"
                 f" / {_U_DEN}"
             )} AS w
      FROM u, (SELECT CAST(unnest(range({_BOOT_B})) AS BIGINT) AS rep) r
    ),
    rmean AS (
      SELECT rep,
             CAST(sum(CAST(w * m AS DECIMAL(25,6))) AS DOUBLE)
               / sum(w) AS bm
      FROM reps GROUP BY rep HAVING sum(w) > 0
    ),
    ranked AS (
      SELECT bm, row_number() OVER (ORDER BY bm, rep) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n_reps
      FROM rmean
    ),
    mom AS (
      SELECT n_reps,
             CAST(sum(CAST(bm AS DECIMAL(25,6))) AS DOUBLE) AS s,
             max(CASE WHEN rn = {_K_LO} THEN bm END) AS lo,
             max(CASE WHEN rn = {_K_HI} THEN bm END) AS hi
      FROM ranked GROUP BY n_reps
    ),
    dev AS (
      SELECT r.bm, m.n_reps, m.s, m.lo, m.hi,
             {sql_dround("r.bm - m.s / m.n_reps", 6)} AS d
      FROM ranked r CROSS JOIN mom m
    )
    SELECT o.n_users, d.n_reps, {sql_dround("o.obs_mean", 6)} AS obs_mean,
           {sql_dround("d.s / d.n_reps", 6)} AS boot_mean,
           {sql_dround(
               "sqrt(greatest(sum(CAST(d.d * d.d AS DECIMAL(38,12)))"
               " / (d.n_reps - 1), 0))", 6,
           )} AS boot_se,
           {sql_dround("d.lo", 6)} AS ci_lo,
           {sql_dround("d.hi", 6)} AS ci_hi
    FROM dev d CROSS JOIN obs o
    GROUP BY o.n_users, d.n_reps, o.obs_mean, d.s, d.lo, d.hi
    """,
)
def q_ab_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean per-user engagement (the
    per-user value sum): each of the 200 replicates reweights every
    user by an independent deterministic Poisson(1) draw (md5 uniform
    through the spelled-literal inverse CDF — the streaming-bootstrap
    construction that resamples WITHOUT global coordination), scores
    the weighted mean, and the CI is the exact rank-5 / rank-195 pick
    of the replicate distribution, alongside its mean and SE.

    Plan: event volume collapses to the per-USER frame once; the
    B=200 grid expands that aggregate (never raw events) into one
    rep-keyed hash aggregate; the rank pick runs over the 200-row
    replicate frame (bounded by the literal B — allowlisted global
    window). At 100 TB the replicate fan-out is aggregate-sized and
    tunable. Determinism: md5 uniforms on identical strings, literal
    CDF thresholds, decimal-detour means, e6-rounded deviations
    squared on the 1e-12 grid, e6 closings; a zero total weight
    (impossible beyond toy user counts) drops the replicate on both
    sides via the HAVING guard."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("m")
    )
    obs = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (
            F.sum(F.col("m").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("obs_mean"),
    )
    grid = spark.range(_BOOT_B).select(
        F.col("id").cast("bigint").alias("rep")
    )
    uni = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit(":"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        / _U_DEN
    )
    reps = u.crossJoin(F.broadcast(grid)).select(
        "user_id", "m", "rep", _pois_weight(uni).alias("w")
    )
    rmean = (
        reps.groupBy("rep")
        .agg(
            F.sum((F.col("w") * F.col("m")).cast("decimal(25,6)"))
            .cast("double")
            .alias("wm"),
            F.sum("w").alias("wsum"),
        )
        .filter(F.col("wsum") > 0)
        .select("rep", (F.col("wm") / F.col("wsum")).alias("bm"))
    )
    wr = Window.orderBy("bm", "rep")
    ranked = rmean.select(
        "bm",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias(
            "n_reps"
        ),
    )
    mom = ranked.groupBy("n_reps").agg(
        F.sum(F.col("bm").cast("decimal(25,6)")).cast("double").alias("s"),
        F.max(F.when(F.col("rn") == _K_LO, F.col("bm"))).alias("lo"),
        F.max(F.when(F.col("rn") == _K_HI, F.col("bm"))).alias("hi"),
    )
    dev = ranked.select("bm").crossJoin(F.broadcast(mom)).select(
        "bm",
        "n_reps",
        "s",
        "lo",
        "hi",
        dround(F.col("bm") - F.col("s") / F.col("n_reps"), 6).alias("d"),
    )
    joined = dev.crossJoin(F.broadcast(obs))
    return joined.groupBy(
        "n_users", "n_reps", "obs_mean", "s", "lo", "hi"
    ).agg(
        dround(
            F.sqrt(
                F.greatest(
                    F.sum((F.col("d") * F.col("d")).cast("decimal(38,12)"))
                    .cast("double")
                    / (F.col("n_reps") - 1),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("boot_se")
    ).select(
        "n_users",
        "n_reps",
        dround(F.col("obs_mean"), 6).alias("obs_mean"),
        dround(F.col("s") / F.col("n_reps"), 6).alias("boot_mean"),
        "boot_se",
        dround(F.col("lo"), 6).alias("ci_lo"),
        dround(F.col("hi"), 6).alias("ci_hi"),
    )


@register(
    "q_agg_jackknife_variance",
    oracle=f"""
    WITH tot AS (
      SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS s_all,
             CAST(count(*) AS BIGINT) AS n_all
      FROM orders
    ),
    byday AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS s_d,
             CAST(count(*) AS BIGINT) AS n_d
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    loo AS (
      SELECT b.day, t.s_all, t.n_all,
             (t.s_all - b.s_d) / (t.n_all - b.n_d) AS lm
      FROM byday b CROSS JOIN tot t
    ),
    bar AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(lm AS DECIMAL(25,6))) AS DOUBLE) AS ls
      FROM loo
    ),
    dev AS (
      SELECT l.s_all, l.n_all, b.n_days,
             {sql_dround("l.lm - b.ls / b.n_days", 6)} AS d
      FROM loo l CROSS JOIN bar b
    )
    SELECT n_days, n_all AS n_orders,
           {sql_dround("s_all / n_all", 6)} AS grand_mean,
           {sql_dround(
               "sqrt(greatest((n_days - 1.0) / n_days"
               " * sum(CAST(d * d AS DECIMAL(38,12))), 0))", 6,
           )} AS jack_se
    FROM dev GROUP BY n_days, n_all, s_all
    """,
)
def q_agg_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife standard error of the mean order
    value, with DAYS as the blocks: each leave-one-day-out mean is
    (S − s_d)/(N − n_d) from the day-grain aggregate plus the one-row
    total, and se = sqrt((D−1)/D · Σ(loo_d − loo_bar)²) — the
    dependence-robust uncertainty readout (blocks absorb within-day
    correlation that a plain per-row SE understates).

    Plan: one day-grain hash aggregate + one one-row total, broadcast
    together — the leave-one-out frame is |days| rows (time-grain
    bounded), never a per-row expansion or second scan. Determinism:
    day/total sums ride the decimal detour, leave-one-out means are
    single double divisions of exact sums, deviations from the
    decimal-mean are e6-rounded before the decimal(38,12) square sum,
    and the closing sqrt is zero-clamped and e6-rounded."""
    o = load_table(spark, sf_dir, "orders")
    tot = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("s_all"),
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
    )
    byday = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("s_d"),
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
    )
    loo = byday.crossJoin(F.broadcast(tot)).select(
        "day",
        "s_all",
        "n_all",
        (
            (F.col("s_all") - F.col("s_d"))
            / (F.col("n_all") - F.col("n_d"))
        ).alias("lm"),
    )
    bar = loo.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("lm").cast("decimal(25,6)")).cast("double").alias("ls"),
    )
    dev = loo.crossJoin(F.broadcast(bar)).select(
        "s_all",
        "n_all",
        "n_days",
        dround(F.col("lm") - F.col("ls") / F.col("n_days"), 6).alias("d"),
    )
    return dev.groupBy("n_days", "n_all", "s_all").agg(
        dround(
            F.sqrt(
                F.greatest(
                    (F.col("n_days") - F.lit(1.0))
                    / F.col("n_days")
                    * F.sum(
                        (F.col("d") * F.col("d")).cast("decimal(38,12)")
                    ).cast("double"),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("jack_se")
    ).select(
        "n_days",
        F.col("n_all").alias("n_orders"),
        dround(F.col("s_all") / F.col("n_all"), 6).alias("grand_mean"),
        "jack_se",
    )
