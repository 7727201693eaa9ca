"""Time-series diagnostics battery over the densified hourly spine:
unit-root (ADF-lite), random-walk variance-ratio, Wald–Wolfowitz runs,
AR(1) mean-reversion half-life, and the turning-point randomness test
— the "is this metric drifting / trending / mean-reverting / random?"
panel a monitoring platform runs over its hourly counters before
alerting on them.

Plan discipline (the q_ts_granger_lite class, drift.py): event volume
enters ONLY through per-hour count aggregates; every lag/lead pass
runs over the fixed 720-row month spine (bounded global window — the
frame is |hours|, which grows with retention, never with traffic), and
each test closes from a handful of exact BIGINT moments.

Determinism: counts and their products are exact BIGINTs; closing
products cast each moment to DOUBLE BEFORE multiplying (the granger
overflow discipline — int64 n·s / s·s products wrap at s ≳ 3e9 on
Spark while DuckDB raises; double products are exact below 2^53 and
identical IEEE expressions beyond); every libm call (sqrt, ln) is
e6-rounded on both engines, as is each final ratio.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no diagnostics surface; these derive from
the driver's analytics mandate and the classical time-series
literature (Dickey–Fuller 1979; Lo–MacKinlay 1988 variance ratio;
Wald–Wolfowitz 1940 runs test; turning-point test per Kendall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# 2024-01-01T00:00Z in hours-since-epoch; the events table spans the
# 720-hour month at every SF (drift.py's spine constants).
_EPOCH_H = 473352
_N_HOURS = 720
# Variance-ratio horizon, in hours.
_VR_Q = 4

# Densified hourly PURCHASE-count series on the month spine (SQL CTE
# body; the Spark twin is _purchase_spine below).
_SQL_PURCHASE_SPINE = f"""
      SELECT s.h, CAST(coalesce(o.y, 0) AS BIGINT) AS y
      FROM (SELECT CAST(unnest(range({_EPOCH_H}, {_EPOCH_H + _N_HOURS}))
                   AS BIGINT) AS h) s
      LEFT JOIN (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1
      ) o ON o.h = s.h
"""


# Densified hourly TOTAL-event-count series (all types) on the month
# spine: the runs test wants a series whose median splits the hours
# (the sparse purchase series has median 0 at small SF — every
# non-median hour sits above it and the statistic degenerates).
_SQL_TOTAL_SPINE = f"""
      SELECT s.h, CAST(coalesce(o.y, 0) AS BIGINT) AS y
      FROM (SELECT CAST(unnest(range({_EPOCH_H}, {_EPOCH_H + _N_HOURS}))
                   AS BIGINT) AS h) s
      LEFT JOIN (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1
      ) o ON o.h = s.h
"""


def _total_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly total event counts densified onto the fixed month spine."""
    e = load_table(spark, sf_dir, "events")
    hy = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    spine = spark.range(_N_HOURS).select(
        (F.col("id") + F.lit(_EPOCH_H)).cast("bigint").alias("h")
    )
    return spine.join(hy, "h", "left").select(
        "h", F.coalesce("y", F.lit(0)).cast("bigint").alias("y")
    )


def _purchase_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly purchase counts densified onto the fixed month spine."""
    e = load_table(spark, sf_dir, "events")
    hy = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 3600)
            .cast("bigint")
            .alias("h")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    spine = spark.range(_N_HOURS).select(
        (F.col("id") + F.lit(_EPOCH_H)).cast("bigint").alias("h")
    )
    return spine.join(hy, "h", "left").select(
        "h", F.coalesce("y", F.lit(0)).cast("bigint").alias("y")
    )


def _dcol(c: str) -> F.Column:  # type: ignore[name-defined]
    return F.col(c).cast("double")


@register(
    "q_ts_adf_lite",
    oracle=f"""
    WITH series AS ({_SQL_PURCHASE_SPINE}),
    lagged AS (
      SELECT y - lag(y) OVER (ORDER BY h) AS dy,
             lag(y) OVER (ORDER BY h) AS yl
      FROM series
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(yl) AS BIGINT) AS sx,
             CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(yl * yl) AS BIGINT) AS sxx,
             CAST(sum(yl * dy) AS BIGINT) AS sxy,
             CAST(sum(dy * dy) AS BIGINT) AS syy
      FROM lagged WHERE yl IS NOT NULL
    ),
    c AS (
      SELECT n,
             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS dxx,
             CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS dxy,
             CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS dyy
      FROM m
    ),
    b AS (
      SELECT n, dxx, dyy,
             CASE WHEN dxx = 0 THEN NULL ELSE dxy / dxx END AS beta,
             CASE WHEN dxx = 0 THEN NULL ELSE dxy END AS dxy
      FROM c
    )
    SELECT n AS n_obs,
           {sql_dround("beta", 6)} AS beta,
           {sql_dround("1.0 + beta", 6)} AS rho,
           CASE WHEN beta IS NULL OR dxx = 0 THEN NULL ELSE
             {sql_dround(
                 "beta / ("
                 + sql_dround(
                     "sqrt(greatest((dyy - beta * dxy) / (n - 2) / dxx,"
                     " 0.0))", 6)
                 + ")", 6)}
           END AS df_stat
    FROM b
    """,
)
def q_ts_adf_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey–Fuller unit-root probe (lag-0 ADF with intercept) on the
    hourly purchase-count series: regress Δy_t on y_{t−1} and report
    β̂, the implied AR root ρ = 1 + β̂, and the DF t-statistic
    β̂/se(β̂) — strongly negative rejects the unit root (the series
    mean-reverts; a counter stuck near ρ = 1 drifts). The n−2
    denominator is the two-parameter (intercept + slope) OLS residual
    variance.

    Plan: one filtered hourly hash aggregate densified onto the
    720-row month spine, one lag pass over that bounded global window
    (the q_ts_xcorr class), ONE integer moment aggregate, scalar
    closing. Determinism: the six moments are exact BIGINTs of
    integer counts; centered products cast moments to double FIRST
    (the granger overflow discipline); the one sqrt is e6-rounded, as
    are β̂, ρ, and the t-ratio; degenerate variance (dxx = 0) yields
    NULLs on both engines."""
    wo = Window.orderBy("h")
    series = _purchase_spine(spark, sf_dir)
    lagged = series.select(
        (F.col("y") - F.lag("y").over(wo)).alias("dy"),
        F.lag("y").over(wo).alias("yl"),
    ).filter(F.col("yl").isNotNull())
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yl").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("yl") * F.col("yl")).cast("bigint").alias("sxx"),
        F.sum(F.col("yl") * F.col("dy")).cast("bigint").alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"),
    )
    c = m.select(
        "n",
        (_dcol("n") * _dcol("sxx") - _dcol("sx") * _dcol("sx")).alias(
            "dxx"
        ),
        (_dcol("n") * _dcol("sxy") - _dcol("sx") * _dcol("sy")).alias(
            "dxy"
        ),
        (_dcol("n") * _dcol("syy") - _dcol("sy") * _dcol("sy")).alias(
            "dyy"
        ),
    )
    b = c.select(
        "n",
        "dxx",
        "dyy",
        F.when(F.col("dxx") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("dxy") / F.col("dxx"))
        .alias("beta"),
        F.when(F.col("dxx") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("dxy"))
        .alias("dxy"),
    )
    beta = F.col("beta")
    se_den = dround(
        F.sqrt(
            F.greatest(
                (F.col("dyy") - beta * F.col("dxy"))
                / (F.col("n") - 2)
                / F.col("dxx"),
                F.lit(0.0),
            )
        ),
        6,
    )
    return b.select(
        F.col("n").alias("n_obs"),
        dround(beta, 6).alias("beta"),
        dround(1.0 + beta, 6).alias("rho"),
        F.when(
            beta.isNull() | (F.col("dxx") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(dround(beta / se_den, 6))
        .alias("df_stat"),
    )


@register(
    "q_ts_variance_ratio",
    oracle=f"""
    WITH series AS ({_SQL_PURCHASE_SPINE}),
    diffs AS (
      SELECT y - lag(y, 1) OVER (ORDER BY h) AS d1,
             y - lag(y, {_VR_Q}) OVER (ORDER BY h) AS dq
      FROM series
    ),
    m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(d1) AS BIGINT) AS s1,
             CAST(sum(d1 * d1) AS BIGINT) AS s11
      FROM diffs WHERE d1 IS NOT NULL
    ),
    mq AS (
      SELECT CAST(count(*) AS BIGINT) AS nq,
             CAST(sum(dq) AS BIGINT) AS sq,
             CAST(sum(dq * dq) AS BIGINT) AS sqq
      FROM diffs WHERE dq IS NOT NULL
    ),
    v AS (
      SELECT n1, nq,
             (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / n1
               AS var1,
             (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / nq) / nq
               AS varq
      FROM m1, mq
    )
    SELECT n1 AS n_diff1, nq AS n_diffq,
           {sql_dround("var1", 6)} AS var1,
           {sql_dround("varq", 6)} AS varq,
           CASE WHEN var1 = 0 THEN NULL ELSE
             {sql_dround(f"varq / ({_VR_Q} * var1)", 6)}
           END AS vr
    FROM v
    """,
)
def q_ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo–MacKinlay variance ratio VR(q=4) on the hourly
    purchase-count series: the variance of 4-hour changes over 4× the
    variance of 1-hour changes — 1 for a random walk, < 1 for
    mean-reversion (hourly shocks cancel within the window), > 1 for
    trending/persistent load. Both variances are biased (÷n)
    maximum-likelihood estimates over all overlapping differences,
    the standard VR construction.

    Plan: the densified spine, ONE lag pass producing both difference
    columns in the same bounded global window sort, two tiny moment
    aggregates, scalar closing. Determinism: differences and their
    squares are exact BIGINTs; closings cast moments to double before
    the products (granger discipline), e6-round both variances and
    the ratio, and NULL out the degenerate flat-series case on both
    engines."""
    wo = Window.orderBy("h")
    series = _purchase_spine(spark, sf_dir)
    diffs = series.select(
        (F.col("y") - F.lag("y", 1).over(wo)).alias("d1"),
        (F.col("y") - F.lag("y", _VR_Q).over(wo)).alias("dq"),
    ).localCheckpoint(eager=False)
    m1 = diffs.filter(F.col("d1").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n1"),
        F.sum("d1").cast("bigint").alias("s1"),
        F.sum(F.col("d1") * F.col("d1")).cast("bigint").alias("s11"),
    )
    mq = diffs.filter(F.col("dq").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("nq"),
        F.sum("dq").cast("bigint").alias("sq"),
        F.sum(F.col("dq") * F.col("dq")).cast("bigint").alias("sqq"),
    )
    v = m1.crossJoin(mq).select(
        "n1",
        "nq",
        (
            (_dcol("s11") - _dcol("s1") * _dcol("s1") / F.col("n1"))
            / F.col("n1")
        ).alias("var1"),
        (
            (_dcol("sqq") - _dcol("sq") * _dcol("sq") / F.col("nq"))
            / F.col("nq")
        ).alias("varq"),
    )
    return v.select(
        F.col("n1").alias("n_diff1"),
        F.col("nq").alias("n_diffq"),
        dround(F.col("var1"), 6).alias("var1"),
        dround(F.col("varq"), 6).alias("varq"),
        F.when(F.col("var1") == 0, F.lit(None).cast("double"))
        .otherwise(dround(F.col("varq") / (_VR_Q * F.col("var1")), 6))
        .alias("vr"),
    )


@register(
    "q_ts_runs_test",
    oracle=f"""
    WITH series AS ({_SQL_TOTAL_SPINE}),
    vc AS (
      SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM series GROUP BY y
    ),
    cumv AS (
      SELECT y, CAST(sum(cnt) OVER (ORDER BY y
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS cum
      FROM vc
    ),
    med AS (
      SELECT ((SELECT min(y) FROM cumv
               WHERE cum >= CAST(floor(({_N_HOURS} + 1) / 2.0) AS BIGINT))
              + (SELECT min(y) FROM cumv
                 WHERE cum >= CAST(floor({_N_HOURS} / 2.0) AS BIGINT) + 1)
             ) / 2.0 AS med
    ),
    signs AS (
      SELECT h, med, CASE WHEN y > med THEN 1 ELSE -1 END AS s
      FROM series, med WHERE y <> med
    ),
    runs AS (
      SELECT med, s, lag(s) OVER (ORDER BY h) AS ps FROM signs
    ),
    agg AS (
      SELECT max(med) AS median_y,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps
                               THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM runs
    )
    SELECT median_y,
           n1 AS n_above, n2 AS n_below, r AS n_runs,
           CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
             {sql_dround(
                 "(r - (1.0 + 2.0 * n1 * n2 / (n1 + n2))) / ("
                 + sql_dround(
                     "sqrt(greatest("
                     "2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
                     " / ((CAST(n1 + n2 AS DOUBLE)) *"
                     " (n1 + n2) * (n1 + n2 - 1)), 0.0))", 6)
                 + ")", 6)}
           END AS z_stat
    FROM agg
    """,
)
def q_ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of the hourly TOTAL
    event-count series (all types — the sparse single-type series has
    median 0 at small volume and the test degenerates one-sided):
    hours are marked above/below the series
    MEDIAN (exact two-middle-pick median of the 720 spine values;
    ties AT the median drop, the textbook convention), runs of equal
    sign are counted, and the run count is z-scored against its
    null mean 1 + 2n₁n₂/n — too FEW runs means clustering/trending
    load, too many means oscillation.

    Plan: the densified spine, a per-value count aggregate (the
    value dimension is tiny — counts are small integers) cumulated
    for the two median picks, one sign + lag pass over the bounded
    720-row global window, one scalar closing. Determinism: median is
    an exact half-sum of integers, run/sign counts are exact BIGINTs,
    and the one sqrt and the z-ratio are e6-rounded; a one-sided
    series (n₁ or n₂ = 0) yields NULL on both engines."""
    series = _total_spine(spark, sf_dir).localCheckpoint(eager=False)
    vc = series.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wv = Window.orderBy("y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumv = vc.select("y", F.sum("cnt").over(wv).cast("bigint").alias("cum"))
    # r16: both middle picks in one conditional aggregate (min ignores
    # when()-nulls) — one pass over the cum subtree, no lo⋈hi join.
    med = cumv.agg(
        F.min(
            F.when(F.col("cum") >= (_N_HOURS + 1) // 2, F.col("y"))
        ).alias("v_lo"),
        F.min(
            F.when(F.col("cum") >= _N_HOURS // 2 + 1, F.col("y"))
        ).alias("v_hi"),
    ).select(((F.col("v_lo") + F.col("v_hi")) / 2.0).alias("med"))
    signs = (
        series.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("med"))
        .select(
            "h",
            "med",
            F.when(F.col("y") > F.col("med"), 1).otherwise(-1).alias("s"),
        )
    )
    wo = Window.orderBy("h")
    runs = signs.select(
        "med", "s", F.lag("s").over(wo).alias("ps")
    )
    agg = runs.agg(
        F.max("med").alias("med"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("ps").isNotNull()
                    & (F.col("s") != F.col("ps")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("r"),
    )
    n1, n2, r = _dcol("n1"), _dcol("n2"), F.col("r")
    n = n1 + n2
    sigma = dround(
        F.sqrt(
            F.greatest(
                2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                / (n * n * (n - 1)),
                F.lit(0.0),
            )
        ),
        6,
    )
    return agg.select(
        F.col("med").alias("median_y"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        r.alias("n_runs"),
        F.when(
            (F.col("n1") == 0) | (F.col("n2") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(dround((r - (1.0 + 2.0 * n1 * n2 / n)) / sigma, 6))
        .alias("z_stat"),
    )


@register(
    "q_ts_ar1_half_life",
    oracle=f"""
    WITH series AS ({_SQL_PURCHASE_SPINE}),
    lagged AS (
      SELECT y, lag(y) OVER (ORDER BY h) AS yl FROM series
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(yl) AS BIGINT) AS sl,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(yl * yl) AS BIGINT) AS sll,
             CAST(sum(y * yl) AS BIGINT) AS syl
      FROM lagged WHERE yl IS NOT NULL
    ),
    c AS (
      SELECT n,
             {sql_dround(
                 "(CAST(n AS DOUBLE) * syl - CAST(sy AS DOUBLE) * sl) / ("
                 + sql_dround(
                     "sqrt(greatest(CAST(n AS DOUBLE) * syy"
                     " - CAST(sy AS DOUBLE) * sy, 0.0)"
                     " * greatest(CAST(n AS DOUBLE) * sll"
                     " - CAST(sl AS DOUBLE) * sl, 0.0))", 6)
                 + ")", 6)} AS rho
      FROM m
    )
    SELECT n AS n_obs, rho,
           CASE WHEN rho > 0 AND rho < 1 THEN
             {sql_dround(
                 "-" + sql_dround("ln(2.0)", 6) + " / ("
                 + sql_dround("ln(rho)", 6) + ")", 6)}
           ELSE NULL END AS half_life_hours
    FROM c
    """,
)
def q_ts_ar1_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) mean-reversion half-life of the hourly purchase-count
    series: ρ = lag-1 autocorrelation, half-life = −ln2/ln ρ hours —
    how long a demand shock takes to decay halfway back to the mean
    (the capacity-planning companion to q_ts_adf_lite's unit-root
    verdict). Outside 0 < ρ < 1 (anti-persistent or non-reverting)
    the half-life is undefined and reads NULL.

    Plan: spine densify, one lag pass (bounded 720-row global
    window), one integer moment aggregate, scalar closing.
    Determinism: BIGINT moments, double-cast closing products
    (granger discipline), every libm call (sqrt, both ln) e6-rounded,
    e6-rounded ratios, NULL guard identical on both engines."""
    wo = Window.orderBy("h")
    series = _purchase_spine(spark, sf_dir)
    lagged = series.select(
        "y", F.lag("y").over(wo).alias("yl")
    ).filter(F.col("yl").isNotNull())
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("yl").cast("bigint").alias("sl"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("yl") * F.col("yl")).cast("bigint").alias("sll"),
        F.sum(F.col("y") * F.col("yl")).cast("bigint").alias("syl"),
    )
    den = dround(
        F.sqrt(
            F.greatest(
                _dcol("n") * _dcol("syy") - _dcol("sy") * _dcol("sy"),
                F.lit(0.0),
            )
            * F.greatest(
                _dcol("n") * _dcol("sll") - _dcol("sl") * _dcol("sl"),
                F.lit(0.0),
            )
        ),
        6,
    )
    c = m.select(
        "n",
        dround(
            (_dcol("n") * _dcol("syl") - _dcol("sy") * _dcol("sl")) / den,
            6,
        ).alias("rho"),
    )
    rho = F.col("rho")
    return c.select(
        F.col("n").alias("n_obs"),
        rho,
        F.when(
            (rho > 0) & (rho < 1),
            dround(-dround(F.log(F.lit(2.0)), 6) / dround(F.log(rho), 6), 6),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("half_life_hours"),
    )


@register(
    "q_ts_turning_points",
    oracle=f"""
    WITH series AS ({_SQL_PURCHASE_SPINE}),
    tri AS (
      SELECT y,
             lag(y) OVER (ORDER BY h) AS yp,
             lead(y) OVER (ORDER BY h) AS yn
      FROM series
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN yp < y AND y > yn THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_peaks,
             CAST(sum(CASE WHEN yp > y AND y < yn THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_troughs
      FROM tri WHERE yp IS NOT NULL AND yn IS NOT NULL
    )
    SELECT CAST({_N_HOURS} AS BIGINT) AS n_hours, n_peaks, n_troughs,
           n_peaks + n_troughs AS n_turning,
           {sql_dround(
               f"(n_peaks + n_troughs - 2.0 * ({_N_HOURS} - 2) / 3.0) / ("
               + sql_dround(
                   f"sqrt((16.0 * {_N_HOURS} - 29.0) / 90.0)", 6)
               + ")", 6)} AS z_stat
    FROM agg
    """,
)
def q_ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness test on the hourly purchase-count
    series: count strict local maxima (yₜ₋₁ < yₜ > yₜ₊₁) and minima
    over the 720-hour spine and z-score the total against the i.i.d.
    null (mean 2(n−2)/3, variance (16n−29)/90, Kendall) — too few
    turning points means momentum/trend, too many means alternation;
    ties produce neither (strict inequalities), so flat stretches
    damp the count on both engines identically.

    Plan: spine densify, ONE lag+lead pass over the bounded 720-row
    global window (single sort serves both), one scalar aggregate.
    Determinism: strict integer comparisons, BIGINT counts, one
    e6-rounded sqrt of a constant and one e6-rounded ratio."""
    wo = Window.orderBy("h")
    series = _purchase_spine(spark, sf_dir)
    tri = series.select(
        "y",
        F.lag("y").over(wo).alias("yp"),
        F.lead("y").over(wo).alias("yn"),
    ).filter(F.col("yp").isNotNull() & F.col("yn").isNotNull())
    agg = tri.agg(
        F.sum(
            F.when(
                (F.col("yp") < F.col("y")) & (F.col("y") > F.col("yn")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_peaks"),
        F.sum(
            F.when(
                (F.col("yp") > F.col("y")) & (F.col("y") < F.col("yn")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_troughs"),
    )
    t = F.col("n_peaks") + F.col("n_troughs")
    sigma = dround(F.sqrt(F.lit((16.0 * _N_HOURS - 29.0) / 90.0)), 6)
    return agg.select(
        F.lit(_N_HOURS).cast("bigint").alias("n_hours"),
        "n_peaks",
        "n_troughs",
        t.alias("n_turning"),
        dround((t - 2.0 * (_N_HOURS - 2) / 3.0) / sigma, 6).alias(
            "z_stat"
        ),
    )


# AR(1) backtest split: fit on the month's first half, score on the
# second. Relative-deviation transform base (SCALE.md second-moment
# lesson): deviations are taken against the integer-floored H1 mean.
_BT_SPLIT = _EPOCH_H + _N_HOURS // 2


@register(
    "q_ts_ar1_backtest",
    oracle=f"""
    WITH spine AS ({_SQL_TOTAL_SPINE}),
    base AS (
      SELECT CAST(floor(CAST(sum(CASE WHEN h < {_BT_SPLIT} THEN y END)
                              AS DOUBLE)
                        / sum(CASE WHEN h < {_BT_SPLIT} THEN 1 END))
                  AS BIGINT) AS b
      FROM spine
    ),
    d AS (
      SELECT h, {sql_dround(
          "(CAST(y AS DOUBLE) - b) / b", 6)} AS d
      FROM spine CROSS JOIN base
    ),
    mu AS (
      SELECT CAST(sum(CASE WHEN h < {_BT_SPLIT}
                           THEN CAST(d AS DECIMAL(25,6)) END) AS DOUBLE)
               / sum(CASE WHEN h < {_BT_SPLIT} THEN 1 END) AS mu
      FROM d
    ),
    lagd AS (
      SELECT h, d, lag(d) OVER (ORDER BY h) AS pd
      FROM d
    ),
    fit AS (
      SELECT {sql_dround(
          "CAST(sum(CASE WHEN h < " + str(_BT_SPLIT) + " THEN CAST("
          + sql_dround("(d - mu) * (pd - mu)", 12)
          + " AS DECIMAL(38,12)) END) AS DOUBLE)"
          " / CAST(sum(CASE WHEN h < " + str(_BT_SPLIT) + " THEN CAST("
          + sql_dround("(pd - mu) * (pd - mu)", 12)
          + " AS DECIMAL(38,12)) END) AS DOUBLE)", 6,
      )} AS phi
      FROM lagd CROSS JOIN mu WHERE pd IS NOT NULL
    ),
    err AS (
      SELECT l.h,
             {sql_dround("l.d - (mu.mu + fit.phi * (l.pd - mu.mu))", 6)}
               AS e_ar1,
             {sql_dround("l.d - l.pd", 6)} AS e_naive
      FROM lagd l CROSS JOIN mu CROSS JOIN fit
      WHERE l.h >= {_BT_SPLIT}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_test,
           (SELECT phi FROM fit) AS phi,
           {sql_dround(
               "CAST(sum(CAST(abs(e_ar1) AS DECIMAL(25,6))) AS DOUBLE)"
               " / count(*)", 6)} AS mae_ar1,
           {sql_dround(
               "sqrt(CAST(sum(CAST(e_ar1 * e_ar1 AS DECIMAL(38,12)))"
               " AS DOUBLE) / count(*))", 6)} AS rmse_ar1,
           {sql_dround(
               "CAST(sum(CAST(abs(e_naive) AS DECIMAL(25,6))) AS DOUBLE)"
               " / count(*)", 6)} AS mae_naive,
           {sql_dround(
               "1.0 - (CAST(sum(CAST(abs(e_ar1) AS DECIMAL(25,6)))"
               " AS DOUBLE) / count(*))"
               " / (CAST(sum(CAST(abs(e_naive) AS DECIMAL(25,6)))"
               " AS DOUBLE) / count(*))", 6)} AS skill
    FROM err
    """,
)
def q_ts_ar1_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward AR(1) forecast backtest on the hourly total-event
    series: fit phi on the month's FIRST half (OLS slope of the
    mean-centered lag regression), one-step-forecast every
    second-half hour as μ + φ·(x_{t−1} − μ), and score MAE/RMSE
    against the naive x_{t−1} persistence baseline —
    skill = 1 − MAE_ar1/MAE_naive > 0 says the mean-reverting
    structure is real and exploitable (the honest-out-of-sample
    upgrade of q_ts_backtest_naive, fit and test never overlapping).

    Plan: the q_ts_kpss_lite spine discipline — one hash aggregate
    densified onto the fixed 720-row month spine, ONE non-partitioned
    lag over the bounded spine (allowlisted class), two scalar
    broadcast closings. Determinism: the series is transformed to
    e6-rounded RELATIVE deviations from the integer-floored H1 mean
    (shift/scale-invariant for phi, and it pins every second moment
    O(1) at ANY traffic volume — the SCALE.md Bollinger lesson);
    cross/square products are e12-rounded into decimal(38,12) sums;
    phi, the per-hour errors, and all closings are e6-rounded."""
    spine = _total_spine(spark, sf_dir).localCheckpoint(
        eager=False
    )  # base + deviations: one pass
    in_h1 = F.col("h") < _BT_SPLIT
    base = spine.agg(
        F.floor(
            F.sum(F.when(in_h1, F.col("y"))).cast("double")
            / F.sum(F.when(in_h1, 1))
        )
        .cast("bigint")
        .alias("b")
    )
    d = spine.crossJoin(F.broadcast(base)).select(
        "h",
        dround(
            (F.col("y").cast("double") - F.col("b")) / F.col("b"), 6
        ).alias("d"),
    )
    mu = d.agg(
        (
            F.sum(F.when(in_h1, F.col("d").cast("decimal(25,6)"))).cast(
                "double"
            )
            / F.sum(F.when(in_h1, 1))
        ).alias("mu")
    )
    lagd = d.select(
        "h", "d", F.lag("d").over(Window.orderBy("h")).alias("pd")
    ).localCheckpoint(eager=False)  # fit + scoring: one window pass
    fit = (
        lagd.filter(F.col("pd").isNotNull() & in_h1)
        .crossJoin(F.broadcast(mu))
        .agg(
            dround(
                F.sum(
                    dround(
                        (F.col("d") - F.col("mu"))
                        * (F.col("pd") - F.col("mu")),
                        12,
                    ).cast("decimal(38,12)")
                ).cast("double")
                / F.sum(
                    dround(
                        (F.col("pd") - F.col("mu"))
                        * (F.col("pd") - F.col("mu")),
                        12,
                    ).cast("decimal(38,12)")
                ).cast("double"),
                6,
            ).alias("phi")
        )
    )
    err = (
        lagd.filter(F.col("h") >= _BT_SPLIT)
        .crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(fit))
        .select(
            dround(
                F.col("d")
                - (
                    F.col("mu")
                    + F.col("phi") * (F.col("pd") - F.col("mu"))
                ),
                6,
            ).alias("e_ar1"),
            dround(F.col("d") - F.col("pd"), 6).alias("e_naive"),
            "phi",
        )
    )
    mae_ar1 = (
        F.sum(F.abs(F.col("e_ar1")).cast("decimal(25,6)")).cast("double")
        / F.count(F.lit(1))
    )
    mae_naive = (
        F.sum(F.abs(F.col("e_naive")).cast("decimal(25,6)")).cast(
            "double"
        )
        / F.count(F.lit(1))
    )
    return err.groupBy("phi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        dround(mae_ar1, 6).alias("mae_ar1"),
        dround(
            F.sqrt(
                F.sum(
                    (F.col("e_ar1") * F.col("e_ar1")).cast(
                        "decimal(38,12)"
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ),
            6,
        ).alias("rmse_ar1"),
        dround(mae_naive, 6).alias("mae_naive"),
        dround(1.0 - mae_ar1 / mae_naive, 6).alias("skill"),
    ).select(
        "n_test", "phi", "mae_ar1", "rmse_ar1", "mae_naive", "skill"
    )


@register(
    "q_ts_diff_stationarity",
    oracle=f"""
    WITH spine AS ({_SQL_TOTAL_SPINE}),
    base AS (
      SELECT CAST(floor(CAST(sum(y) AS DOUBLE) / count(*)) AS BIGINT)
               AS b
      FROM spine
    ),
    d AS (
      SELECT h, {sql_dround("(CAST(y AS DOUBLE) - b) / b", 6)} AS d
      FROM spine CROSS JOIN base
    ),
    lagd AS (
      SELECT h, d,
             {sql_dround("d - lag(d) OVER (ORDER BY h)", 6)} AS d1
      FROM d
    ),
    lag2 AS (
      SELECT h, d, d1,
             {sql_dround("d1 - lag(d1) OVER (ORDER BY h)", 6)} AS d2
      FROM lagd
    ),
    m AS (
      SELECT
        CAST(count(d) AS BIGINT) AS n0,
        CAST(sum(CAST(d AS DECIMAL(25,6))) AS DOUBLE) AS s0,
        CAST(sum(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE) AS ss0,
        CAST(count(d1) AS BIGINT) AS n1,
        CAST(sum(CAST(d1 AS DECIMAL(25,6))) AS DOUBLE) AS s1,
        CAST(sum(CAST(d1 * d1 AS DECIMAL(38,12))) AS DOUBLE) AS ss1,
        CAST(count(d2) AS BIGINT) AS n2,
        CAST(sum(CAST(d2 AS DECIMAL(25,6))) AS DOUBLE) AS s2,
        CAST(sum(CAST(d2 * d2 AS DECIMAL(38,12))) AS DOUBLE) AS ss2
      FROM lag2
    )
    SELECT
      {sql_dround("(ss0 - s0 * s0 / n0) / (n0 - 1)", 6)} AS var_level,
      {sql_dround("(ss1 - s1 * s1 / n1) / (n1 - 1)", 6)} AS var_diff1,
      {sql_dround("(ss2 - s2 * s2 / n2) / (n2 - 1)", 6)} AS var_diff2,
      {sql_dround(
          "((ss1 - s1 * s1 / n1) / (n1 - 1))"
          " / ((ss0 - s0 * s0 / n0) / (n0 - 1))", 6)} AS ratio1,
      {sql_dround(
          "((ss2 - s2 * s2 / n2) / (n2 - 1))"
          " / ((ss1 - s1 * s1 / n1) / (n1 - 1))", 6)} AS ratio2
    FROM m
    """,
)
def q_ts_diff_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differencing-order diagnostic on the hourly total-event series:
    sample variances of the level, the first difference, and the
    second difference (all as relative deviations from the integer
    month-mean base), plus the two variance ratios — the standard
    "how many differences until stationarity" readout (ratio1 ≪ 1:
    difference once; ratio2 > 1: you over-differenced and introduced
    the MA(1) signature). The pragmatic companion to q_ts_adf_lite /
    q_ts_kpss_lite's formal tests.

    Plan: the 720-row month spine, TWO chained non-partitioned lags
    over it (allowlisted bounded class), one moments aggregate.
    Determinism: the relative-deviation transform (integer-floored
    base — the SCALE.md magnitude lesson), each difference e6-rounded
    at the source so squares sit on the 1e-12 grid in decimal(38,12)
    sums, e6-rounded closings."""
    spine = _total_spine(spark, sf_dir).localCheckpoint(
        eager=False
    )  # r16 wave 8: base + deviations share one events pass
    base = spine.agg(
        F.floor(F.sum("y").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("b")
    )
    d = spine.crossJoin(F.broadcast(base)).select(
        "h",
        dround(
            (F.col("y").cast("double") - F.col("b")) / F.col("b"), 6
        ).alias("d"),
    )
    w = Window.orderBy("h")
    lagd = d.select(
        "h", "d", dround(F.col("d") - F.lag("d").over(w), 6).alias("d1")
    )
    lag2 = lagd.select(
        "h",
        "d",
        "d1",
        dround(F.col("d1") - F.lag("d1").over(w), 6).alias("d2"),
    )

    def mom(c: str, i: int):
        col = F.col(c)
        return [
            F.count(col).cast("bigint").alias(f"n{i}"),
            F.sum(col.cast("decimal(25,6)")).cast("double").alias(f"s{i}"),
            F.sum((col * col).cast("decimal(38,12)"))
            .cast("double")
            .alias(f"ss{i}"),
        ]

    m = lag2.agg(*(mom("d", 0) + mom("d1", 1) + mom("d2", 2)))

    def var(i: int):
        n = F.col(f"n{i}")
        return (
            F.col(f"ss{i}") - F.col(f"s{i}") * F.col(f"s{i}") / n
        ) / (n - 1)

    return m.select(
        dround(var(0), 6).alias("var_level"),
        dround(var(1), 6).alias("var_diff1"),
        dround(var(2), 6).alias("var_diff2"),
        dround(var(1) / var(0), 6).alias("ratio1"),
        dround(var(2) / var(1), 6).alias("ratio2"),
    )


@register(
    "q_ts_seasonal_index",
    oracle=f"""
    WITH spine AS ({_SQL_TOTAL_SPINE}),
    hod AS (
      SELECT CAST((h % 24) AS BIGINT) AS hour_of_day,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(y) AS BIGINT) AS y_sum
      FROM spine GROUP BY h % 24
    ),
    tot AS (
      SELECT CAST(sum(y_sum) AS DOUBLE) / sum(n_hours) AS grand_mean
      FROM hod
    )
    SELECT hour_of_day, n_hours,
           {sql_dround("CAST(y_sum AS DOUBLE) / n_hours", 6)} AS hod_mean,
           {sql_dround(
               "(CAST(y_sum AS DOUBLE) / n_hours) / grand_mean", 6,
           )} AS seasonal_index
    FROM hod CROSS JOIN tot
    """,
)
def q_ts_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative seasonal index of the daily cycle:
    each hour-of-day's mean total-event count (over the month's 30
    occurrences, empty hours counted as 0 via the densified spine)
    divided by the grand hourly mean — index 1.3 reads "this hour
    runs 30% hot". The ratio-to-moving-average decomposition's
    seasonal factor at the fixed daily period, the index-form
    companion to q_ts_diurnal_percentiles' distributional view and
    q_ts_seasonal_decompose's additive split.

    Plan: the 720-row spine collapses to the 24-row hour-of-day frame
    in one aggregate; the grand mean is its one-row closing broadcast
    back. Determinism: integer count sums; two e6-rounded divisions
    (epoch hour 0 is midnight UTC, so h % 24 IS the hour of day —
    exact integer arithmetic)."""
    spine = _total_spine(spark, sf_dir)
    hod = spine.groupBy((F.col("h") % 24).alias("hour_of_day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("y").cast("bigint").alias("y_sum"),
    ).localCheckpoint(eager=False)  # r16 wave 8: the 24-row frame
    # feeds the grand mean AND the output — one events pass
    tot = hod.agg(
        (F.sum("y_sum").cast("double") / F.sum("n_hours")).alias(
            "grand_mean"
        )
    )
    return hod.crossJoin(F.broadcast(tot)).select(
        F.col("hour_of_day").cast("bigint").alias("hour_of_day"),
        "n_hours",
        dround(
            F.col("y_sum").cast("double") / F.col("n_hours"), 6
        ).alias("hod_mean"),
        dround(
            (F.col("y_sum").cast("double") / F.col("n_hours"))
            / F.col("grand_mean"),
            6,
        ).alias("seasonal_index"),
    )


# 2024-01-01 (epoch day 19723) was a MONDAY: day_index % 7 of 5 or 6
# lands on Saturday/Sunday.
_EPOCH_DAY = 19723


@register(
    "q_ts_weekend_effect",
    oracle=f"""
    WITH spine AS ({_SQL_TOTAL_SPINE}),
    d AS (
      SELECT CAST(floor(h / 24) - {_EPOCH_DAY} AS BIGINT) % 7 AS dow,
             y
      FROM spine
    ),
    g AS (
      SELECT CASE WHEN dow IN (5, 6) THEN 1 ELSE 0 END AS is_weekend,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ss
      FROM d GROUP BY 1
    ),
    w AS (
      SELECT
        max(CASE WHEN is_weekend = 0 THEN n END) AS n_wd,
        max(CASE WHEN is_weekend = 0 THEN s END) AS s_wd,
        max(CASE WHEN is_weekend = 0 THEN ss END) AS ss_wd,
        max(CASE WHEN is_weekend = 1 THEN n END) AS n_we,
        max(CASE WHEN is_weekend = 1 THEN s END) AS s_we,
        max(CASE WHEN is_weekend = 1 THEN ss END) AS ss_we
      FROM g
    )
    SELECT n_wd AS n_weekday_hours, n_we AS n_weekend_hours,
           {sql_dround("CAST(s_wd AS DOUBLE) / n_wd", 6)} AS weekday_mean,
           {sql_dround("CAST(s_we AS DOUBLE) / n_we", 6)} AS weekend_mean,
           {sql_dround(
               "CAST(s_we AS DOUBLE) / n_we"
               " - CAST(s_wd AS DOUBLE) / n_wd", 6)} AS diff,
           {sql_dround(
               "(CAST(s_we AS DOUBLE) / n_we"
               " - CAST(s_wd AS DOUBLE) / n_wd)"
               " / sqrt(greatest("
               "   (CAST(ss_we AS DOUBLE) - CAST(s_we AS DOUBLE) * s_we"
               "      / n_we) / (n_we - 1) / n_we"
               " + (CAST(ss_wd AS DOUBLE) - CAST(s_wd AS DOUBLE) * s_wd"
               "      / n_wd) / (n_wd - 1) / n_wd, 1e-300))", 6,
           )} AS welch_z
    FROM w
    """,
)
def q_ts_weekend_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend effect on hourly traffic: mean total-event count per
    weekend hour vs per weekday hour over the fixed month (2024-01-01
    is a Monday — day-of-week is exact integer arithmetic on the day
    index, no calendar library), their difference, and the Welch z
    for the difference — the calendar-seasonality readout next to
    q_ts_seasonal_index's daily cycle.

    Plan: the 720-row spine collapses to a 2-group moment aggregate;
    one 1-row pivot closes it. Determinism: hourly counts are exact
    integers (y² sums stay integer — bounded by 720·max_count²,
    safely inside bigint at any plausible hourly rate; the decimal
    detour is unnecessary because the sums are EXACT integer
    arithmetic), e6-rounded closings with the variance clamped away
    from zero."""
    spine = _total_spine(spark, sf_dir)
    d = spine.select(
        (
            (F.floor(F.col("h") / 24) - _EPOCH_DAY).cast("bigint") % 7
        ).alias("dow"),
        "y",
    )
    g = d.groupBy(
        F.when(F.col("dow").isin(5, 6), 1).otherwise(0).alias("is_weekend")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("ss"),
    )
    w = g.agg(
        *[
            F.max(
                F.when(F.col("is_weekend") == flag, F.col(c))
            ).alias(f"{c}_{suf}")
            for flag, suf in ((0, "wd"), (1, "we"))
            for c in ("n", "s", "ss")
        ]
    )
    mwd = F.col("s_wd").cast("double") / F.col("n_wd")
    mwe = F.col("s_we").cast("double") / F.col("n_we")
    vwd = (
        F.col("ss_wd").cast("double")
        - F.col("s_wd").cast("double") * F.col("s_wd") / F.col("n_wd")
    ) / (F.col("n_wd") - 1)
    vwe = (
        F.col("ss_we").cast("double")
        - F.col("s_we").cast("double") * F.col("s_we") / F.col("n_we")
    ) / (F.col("n_we") - 1)
    return w.select(
        F.col("n_wd").alias("n_weekday_hours"),
        F.col("n_we").alias("n_weekend_hours"),
        dround(mwd, 6).alias("weekday_mean"),
        dround(mwe, 6).alias("weekend_mean"),
        dround(mwe - mwd, 6).alias("diff"),
        dround(
            (mwe - mwd)
            / F.sqrt(
                F.greatest(
                    vwe / F.col("n_we") + vwd / F.col("n_wd"),
                    F.lit(1e-300),
                )
            ),
            6,
        ).alias("welch_z"),
    )


@register(
    "q_ts_durbin_watson",
    oracle=f"""
    WITH series AS ({_SQL_PURCHASE_SPINE}),
    lagged AS (
      SELECT h - {_EPOCH_H} AS t, y,
             y - lag(y) OVER (ORDER BY h) AS d
      FROM series
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS st,
             CAST(sum(t * t) AS BIGINT) AS stt,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(t * y) AS BIGINT) AS sty,
             CAST(sum(d) AS BIGINT) AS sd,
             CAST(sum(d * d) AS BIGINT) AS sdd
      FROM lagged
    ),
    fit AS (
      SELECT n, sy, syy, sty, st, stt, sd, sdd,
             {sql_dround(
                 "(CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)"
                 " / (CAST(n AS DOUBLE) * stt"
                 " - CAST(st AS DOUBLE) * st)", 6)} AS b
      FROM m
    ),
    ab AS (
      SELECT n, sy, syy, sty, st, stt, sd, sdd, b,
             {sql_dround("(CAST(sy AS DOUBLE) - b * st) / n", 6)} AS a
      FROM fit
    ),
    nd AS (
      SELECT n, b, a,
             CAST(sdd AS DOUBLE) - 2.0 * b * CAST(sd AS DOUBLE)
               + (n - 1) * b * b AS num,
             CAST(syy AS DOUBLE) - 2.0 * a * CAST(sy AS DOUBLE)
               - 2.0 * b * CAST(sty AS DOUBLE) + n * a * a
               + 2.0 * a * b * CAST(st AS DOUBLE)
               + b * b * CAST(stt AS DOUBLE) AS den
      FROM ab
    )
    SELECT n AS n_obs, b AS beta, a AS alpha,
           CASE WHEN den <= 0 THEN NULL
                ELSE {sql_dround("num / den", 6)} END AS dw,
           CASE WHEN den <= 0 THEN NULL
                ELSE {sql_dround("1.0 - num / den / 2.0", 6)}
           END AS rho_implied
    FROM nd
    """,
)
def q_ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson autocorrelation test on the residuals of the
    hourly purchase-count trend fit: OLS of y_t on t over the 720-hour
    month spine, then DW = Σ(e_t−e_{t−1})² / Σe_t² — ≈2 means the
    detrended counts are serially independent, →0 flags positive
    autocorrelation (the "trend line fits but errors cluster" failure
    every naive forecast monitor needs to catch), →4 negative. Also
    reports the implied lag-1 residual correlation ρ ≈ 1 − DW/2.

    Plan: one filtered hourly hash aggregate densified onto the
    720-row month spine, one lag pass over that bounded global window
    (the q_ts_adf_lite class), ONE integer moment aggregate — then the
    entire test closes IN CLOSED FORM from eight exact BIGINT moments:
    e_t − e_{t−1} = Δy_t − β̂ and Σe² expands in (n, Σt, Σt², Σy, Σy²,
    Σty, Σd, Σd²), so no per-row residual is ever materialized (the
    closed-form rank-sum discipline). Determinism: moments are exact
    BIGINTs; β̂ and α̂ are e6-rounded scalars; both quadratic closings
    cast each moment to DOUBLE before multiplying (the granger
    overflow discipline) in identical IEEE order; a degenerate
    (perfect-fit) denominator reads NULL on both engines."""
    wo = Window.orderBy("h")
    series = _purchase_spine(spark, sf_dir)
    lagged = series.select(
        (F.col("h") - _EPOCH_H).alias("t"),
        "y",
        (F.col("y") - F.lag("y").over(wo)).alias("d"),
    )
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
    )
    fit = m.select(
        "*",
        dround(
            (_dcol("n") * F.col("sty") - _dcol("st") * F.col("sy"))
            / (_dcol("n") * F.col("stt") - _dcol("st") * F.col("st")),
            6,
        ).alias("b"),
    )
    ab = fit.select(
        "*",
        dround(
            (_dcol("sy") - F.col("b") * F.col("st")) / F.col("n"), 6
        ).alias("a"),
    )
    b, a = F.col("b"), F.col("a")
    nd = ab.select(
        "n",
        "b",
        "a",
        (
            _dcol("sdd")
            - 2.0 * b * _dcol("sd")
            + (F.col("n") - 1) * b * b
        ).alias("num"),
        (
            _dcol("syy")
            - 2.0 * a * _dcol("sy")
            - 2.0 * b * _dcol("sty")
            + F.col("n") * a * a
            + 2.0 * a * b * _dcol("st")
            + b * b * _dcol("stt")
        ).alias("den"),
    )
    num, den = F.col("num"), F.col("den")
    return nd.select(
        F.col("n").alias("n_obs"),
        F.col("b").alias("beta"),
        F.col("a").alias("alpha"),
        F.when(den <= 0, F.lit(None).cast("double"))
        .otherwise(dround(num / den, 6))
        .alias("dw"),
        F.when(den <= 0, F.lit(None).cast("double"))
        .otherwise(dround(1.0 - num / den / 2.0, 6))
        .alias("rho_implied"),
    )


_CS_HALF = _N_HOURS // 2


@register(
    "q_ts_cox_stuart",
    oracle=f"""
    WITH series AS ({_SQL_TOTAL_SPINE}),
    pairs AS (
      SELECT (h - {_EPOCH_H}) % {_CS_HALF} AS pid,
             max(CASE WHEN h - {_EPOCH_H} < {_CS_HALF} THEN y END) AS y1,
             max(CASE WHEN h - {_EPOCH_H} >= {_CS_HALF} THEN y END) AS y2
      FROM series GROUP BY 1
    ),
    cnt AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN y2 > y1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN y2 < y1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_neg,
             CAST(sum(CASE WHEN y2 = y1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_tie
      FROM pairs
    )
    SELECT n_pairs, n_pos, n_neg, n_tie,
           CASE WHEN n_pos + n_neg = 0 THEN NULL
                ELSE {sql_dround(
                    "(CAST(n_pos AS DOUBLE)"
                    " - CAST(n_pos + n_neg AS DOUBLE) / 2.0) / ("
                    + sql_dround(
                        "sqrt(CAST(n_pos + n_neg AS DOUBLE) / 4.0)", 6)
                    + ")", 6)}
           END AS z
    FROM cnt
    """,
)
def q_ts_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox–Stuart trend test on the hourly total-event series: pair
    hour i of the month's first half with hour i+360 of the second,
    count strict rises vs falls (ties dropped), and close the sign
    test z = (S⁺ − n/2)/√(n/4) — a distribution-free "is traffic
    drifting?" probe that needs no trend shape assumption (monotone
    in ANY form moves z; compare q_ts_mann_kendall's all-pairs
    statistic, which this approximates at 1/360th the pair count).

    Plan: one hourly hash aggregate densified onto the 720-row month
    spine, then the half-vs-half pairing is ONE more hash aggregate
    keyed by pair index (pid = hour mod 360, a conditional min/max
    fold) — no self-join and no window at all, so nothing here grows
    past |hours| rows or funnels a single partition. Determinism:
    counts are exact BIGINTs end-to-end; the sign-test closing is an
    IEEE chain of two integers with the √ e6-rounded before the
    e6-rounded z; an all-tie month reads NULL on both engines."""
    series = _total_spine(spark, sf_dir)
    t = F.col("h") - _EPOCH_H
    pairs = series.groupBy((t % _CS_HALF).alias("pid")).agg(
        F.max(F.when(t < _CS_HALF, F.col("y"))).alias("y1"),
        F.max(F.when(t >= _CS_HALF, F.col("y"))).alias("y2"),
    )
    y1, y2 = F.col("y1"), F.col("y2")
    cnt = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(y2 > y1, 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.sum(F.when(y2 < y1, 1).otherwise(0)).cast("bigint").alias("n_neg"),
        F.sum(F.when(y2 == y1, 1).otherwise(0)).cast("bigint").alias("n_tie"),
    )
    npos, nneg = F.col("n_pos"), F.col("n_neg")
    eff = npos + nneg
    return cnt.select(
        "n_pairs",
        "n_pos",
        "n_neg",
        "n_tie",
        F.when(eff == 0, F.lit(None).cast("double"))
        .otherwise(
            dround(
                (npos.cast("double") - eff.cast("double") / 2.0)
                / dround(F.sqrt(eff.cast("double") / 4.0), 6),
                6,
            )
        )
        .alias("z"),
    )


@register(
    "q_ts_bartels_rank",
    oracle=f"""
    WITH series AS ({_SQL_TOTAL_SPINE}),
    rk AS (
      SELECT h,
             CAST(rank() OVER (ORDER BY y) AS DOUBLE)
               + (CAST(count(*) OVER (PARTITION BY y) AS DOUBLE) - 1)
                 / 2.0 AS r
      FROM series
    ),
    dif AS (
      SELECT r,
             r - lead(r) OVER (ORDER BY h) AS dr,
             r - (CAST({_N_HOURS} AS DOUBLE) + 1.0) / 2.0 AS cr
      FROM rk
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(dr * dr AS DECIMAL(25,6))) AS DOUBLE) AS num,
             CAST(sum(CAST(cr * cr AS DECIMAL(25,6))) AS DOUBLE) AS den
      FROM dif
    ),
    s AS (
      SELECT n, num, den,
             CASE WHEN den <= 0 THEN NULL
                  ELSE {sql_dround("num / den", 6)} END AS rvn,
             4.0 * (CAST(n AS DOUBLE) - 2.0)
               * (5.0 * CAST(n AS DOUBLE) * n
                  - 2.0 * CAST(n AS DOUBLE) - 9.0)
               / (5.0 * CAST(n AS DOUBLE) * (n + 1) * (n - 1)
                  * (n - 1)) AS v
      FROM m
    )
    SELECT n AS n_obs, rvn,
           {sql_dround("v", 6)} AS var_rvn,
           CASE WHEN rvn IS NULL OR v <= 0 THEN NULL
                ELSE {sql_dround(
                    "(rvn - 2.0) / (" + sql_dround("sqrt(v)", 6)
                    + ")", 6)}
           END AS z
    FROM s
    """,
)
def q_ts_bartels_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels' rank von Neumann randomness test on the hourly total-
    event series: RVN = Σ(r_t − r_{t+1})² / Σ(r_t − r̄)² over the
    pooled midranks — the nonparametric twin of q_ts_durbin_watson
    (outlier-immune: a single 100× traffic spike moves DW wildly but
    shifts ranks by one slot). RVN ≈ 2 is random; < 2 flags positive
    serial dependence (sticky traffic levels), > 2 alternation; z
    closes against Bartels' exact variance
    4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²).

    Plan: one hourly hash aggregate densified onto the 720-row month
    spine; the midrank and the successor-lead windows run over that
    bounded global frame (allowlisted, the q_ts_adf_lite class; the
    tie-count window is value-partitioned). Determinism: midranks are
    exact .5-grid rationals, so the squared diffs and deviations are
    exact .25-grid values summed through the decimal detour (≤ n³ ≈
    3.7e8 — far inside the 2⁵³ unscaled bound); r̄ = (n+1)/2 exactly
    under midranks; the variance closes from n in one IEEE chain; √
    is e6-rounded before the e6-rounded z; an all-tied (constant)
    series reads NULL on both engines."""
    series = _total_spine(spark, sf_dir)
    wr = Window.orderBy("y")
    wt = Window.partitionBy("y")
    wh = Window.orderBy("h")
    rk = series.select(
        "h",
        (
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(wt).cast("double") - 1) / 2.0
        ).alias("r"),
    )
    dif = rk.select(
        (F.col("r") - F.lead("r").over(wh)).alias("dr"),
        (F.col("r") - (float(_N_HOURS) + 1.0) / 2.0).alias("cr"),
    )
    dec = "decimal(25,6)"
    m = dif.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("dr") * F.col("dr")).cast(dec))
        .cast("double")
        .alias("num"),
        F.sum((F.col("cr") * F.col("cr")).cast(dec))
        .cast("double")
        .alias("den"),
    )
    n = F.col("n")
    s = m.select(
        "n",
        F.when(F.col("den") <= 0, F.lit(None).cast("double"))
        .otherwise(dround(F.col("num") / F.col("den"), 6))
        .alias("rvn"),
        (
            4.0
            * (n - 2)
            * (5.0 * n * n - 2.0 * n - 9.0)
            / (5.0 * n * (n + 1) * (n - 1) * (n - 1))
        ).alias("v"),
    )
    rvn, v = F.col("rvn"), F.col("v")
    return s.select(
        n.alias("n_obs"),
        "rvn",
        dround(v, 6).alias("var_rvn"),
        F.when(rvn.isNull() | (v <= 0), F.lit(None).cast("double"))
        .otherwise(dround((rvn - 2.0) / dround(F.sqrt(v), 6), 6))
        .alias("z"),
    )


@register(
    "q_ts_runs_updown",
    oracle=f"""
    WITH series AS ({_SQL_TOTAL_SPINE}),
    d AS (
      SELECT h, y - lag(y) OVER (ORDER BY h) AS d FROM series
    ),
    nz AS (
      SELECT h, CASE WHEN d > 0 THEN 1 ELSE -1 END AS s
      FROM d WHERE d IS NOT NULL AND d <> 0
    ),
    ch AS (
      SELECT s, lag(s) OVER (ORDER BY h) AS ps FROM nz
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CASE WHEN ps IS NOT NULL AND s <> ps
                      THEN 1 ELSE 0 END) AS BIGINT) AS chg,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_up
      FROM ch
    ),
    s AS (
      SELECT m, n_up, m - n_up AS n_down,
             CASE WHEN m = 0 THEN 0 ELSE chg + 1 END AS r,
             (2.0 * CAST(m AS DOUBLE) + 1.0) / 3.0 AS e_r,
             (16.0 * CAST(m AS DOUBLE) - 13.0) / 90.0 AS v_r
      FROM m
    )
    SELECT m AS n_moves, n_up, n_down, r AS n_runs,
           {sql_dround("e_r", 6)} AS e_runs,
           CASE WHEN m < 2 OR v_r <= 0 THEN NULL
                ELSE {sql_dround(
                    "(CAST(r AS DOUBLE) - e_r) / ("
                    + sql_dround("sqrt(v_r)", 6) + ")", 6)}
           END AS z
    FROM s
    """,
)
def q_ts_runs_updown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-sign runs test on the hourly total-event series:
    count maximal runs of consecutive rises/falls (zero diffs dropped
    — the documented tie convention; m = surviving moves) against the
    random-walk moments E[R] = (2m+1)/3, Var[R] = (16m−13)/90 — too
    FEW runs means momentum (rises follow rises), too many means
    oscillation. Complements q_ts_runs_test (above/below-median runs,
    level persistence) by testing DIRECTION persistence instead.

    Plan: one hourly hash aggregate onto the 720-row month spine, two
    lag passes over that bounded global frame (allowlisted, the
    q_ts_adf_lite class), one scalar aggregate. Determinism: signs,
    run-boundary counts and m are exact BIGINTs end-to-end; the
    closing moments are IEEE chains of m; √ is e6-rounded before the
    e6-rounded z; a too-short move sequence (m < 2) reads NULL z on
    both engines."""
    series = _total_spine(spark, sf_dir)
    wh = Window.orderBy("h")
    d = series.select(
        "h", (F.col("y") - F.lag("y").over(wh)).alias("d")
    ).filter(F.col("d").isNotNull() & (F.col("d") != 0))
    nz = d.select(
        "h", F.when(F.col("d") > 0, 1).otherwise(-1).alias("s")
    )
    ch = nz.select("s", F.lag("s").over(wh).alias("ps"))
    m = ch.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(
            F.when(
                F.col("ps").isNotNull() & (F.col("s") != F.col("ps")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("chg"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
    )
    mm = F.col("m")
    s = m.select(
        "m",
        "n_up",
        (mm - F.col("n_up")).alias("n_down"),
        F.when(mm == 0, F.lit(0).cast("bigint"))
        .otherwise(F.col("chg") + 1)
        .alias("r"),
        ((2.0 * mm + 1.0) / 3.0).alias("e_r"),
        ((16.0 * mm - 13.0) / 90.0).alias("v_r"),
    )
    return s.select(
        mm.alias("n_moves"),
        "n_up",
        "n_down",
        F.col("r").alias("n_runs"),
        dround(F.col("e_r"), 6).alias("e_runs"),
        F.when(
            (mm < 2) | (F.col("v_r") <= 0), F.lit(None).cast("double")
        )
        .otherwise(
            dround(
                (F.col("r").cast("double") - F.col("e_r"))
                / dround(F.sqrt(F.col("v_r")), 6),
                6,
            )
        )
        .alias("z"),
    )


@register(
    "q_ts_fano_factor",
    oracle=f"""
    WITH hy AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM hy GROUP BY event_type
    ),
    c AS (
      SELECT event_type, sy, syy,
             CAST(sy AS DOUBLE) / {_N_HOURS} AS mean,
             ({_N_HOURS}.0 * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * sy)
               / ({_N_HOURS}.0 * ({_N_HOURS} - 1)) AS var
      FROM m
    )
    SELECT event_type, sy AS n_events,
           {sql_dround("mean", 6)} AS mean_per_hour,
           {sql_dround("var", 6)} AS var_per_hour,
           CASE WHEN sy = 0 THEN NULL
                ELSE {sql_dround("var / mean", 6)} END AS fano,
           CASE WHEN sy = 0 THEN NULL
                ELSE {sql_dround("var / (mean * mean)", 6)}
           END AS cv2
    FROM c
    """,
)
def q_ts_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness panel per event type over the month's 720 hourly
    bins (zero hours included — they contribute nothing to the raw
    moments, so no densification join is needed; the bin count is the
    fixed literal): the Fano factor Var/Mean (1 for a Poisson arrival
    process, ≫1 bursty, <1 more regular than random) and the squared
    coefficient of variation Var/Mean². The arrivals-side twin of
    q_llm_term_burstiness, and the first statistic capacity planning
    asks for ("can we autoscale on the hourly mean or do bursts blow
    through it?").

    Plan: one (type, hour) hash aggregate, one ≤|types| moment
    aggregate — no window, no spine join (the zero-hour trick).
    Determinism: the two moments are exact BIGINTs; the sample
    variance over all 720 bins closes as an IEEE chain casting each
    moment to DOUBLE first (granger discipline); closings e6-round;
    an empty type reads NULL ratios."""
    e = load_table(spark, sf_dir, "events")
    hy = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    m = hy.groupBy("event_type").agg(
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    syd = F.col("sy").cast("double")
    c = m.select(
        "event_type",
        "sy",
        (syd / _N_HOURS).alias("mean"),
        (
            (float(_N_HOURS) * F.col("syy").cast("double") - syd * F.col("sy"))
            / (float(_N_HOURS) * (_N_HOURS - 1))
        ).alias("var"),
    )
    mean, var = F.col("mean"), F.col("var")
    return c.select(
        "event_type",
        F.col("sy").alias("n_events"),
        dround(mean, 6).alias("mean_per_hour"),
        dround(var, 6).alias("var_per_hour"),
        F.when(F.col("sy") == 0, F.lit(None).cast("double"))
        .otherwise(dround(var / mean, 6))
        .alias("fano"),
        F.when(F.col("sy") == 0, F.lit(None).cast("double"))
        .otherwise(dround(var / (mean * mean), 6))
        .alias("cv2"),
    )


# Rolling-correlation pair and frame width (hourly bars, one day).
_RC_G1 = "click"
_RC_G2 = "view"
_RC_WIN = 24


@register(
    "q_ts_rolling_corr",
    oracle=f"""
    WITH x AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(sum(CASE WHEN event_type = '{_RC_G1}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = '{_RC_G2}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events WHERE event_type IN ('{_RC_G1}', '{_RC_G2}')
      GROUP BY 1
    ),
    spine AS (
      SELECT s.h, CAST(coalesce(x.x, 0) AS BIGINT) AS x,
             CAST(coalesce(x.y, 0) AS BIGINT) AS y
      FROM (SELECT CAST(unnest(range({_EPOCH_H},
                                     {_EPOCH_H + _N_HOURS}))
                   AS BIGINT) AS h) s
      LEFT JOIN x ON x.h = s.h
    ),
    roll AS (
      SELECT h,
             CAST(count(*) OVER w AS BIGINT) AS cnt,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
             CAST(sum(y * y) OVER w AS BIGINT) AS syy,
             CAST(sum(x * y) OVER w AS BIGINT) AS sxy
      FROM spine
      WINDOW w AS (ORDER BY h ROWS BETWEEN {_RC_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    c AS (
      SELECT h,
             {_RC_WIN}.0 * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * sy AS cxy,
             {_RC_WIN}.0 * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * sx AS cxx,
             {_RC_WIN}.0 * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * sy AS cyy
      FROM roll WHERE cnt = {_RC_WIN}
    )
    SELECT h AS hour_id,
           CASE WHEN cxx <= 0 OR cyy <= 0 THEN NULL
                ELSE {sql_dround(
                    "cxy / (" + sql_dround("sqrt(cxx)", 6) + ") / ("
                    + sql_dround("sqrt(cyy)", 6) + ")", 6)}
           END AS corr24
    FROM c
    """,
)
def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling one-day Pearson correlation between the click and view
    hourly count series on the densified month spine — the coupling
    monitor behind "did the funnel decouple?" alerts (clicks and views
    normally co-move; a correlation collapse while both stay
    individually healthy is exactly the regression q_ts_xcorr's single
    whole-month estimate can't localize in time). Full 24-hour frames
    only; a flat window on either side reads NULL.

    Plan: ONE conditional hash aggregate builds both series (a single
    events pass), densified onto the 720-row month spine; all six
    rolling moments share one bounded global window pass (allowlisted,
    the q_ts_adf_lite class); the closing is per-row arithmetic.
    Determinism: counts and their frame sums are exact BIGINTs
    (products ≤ counts² · 24 ≪ 2⁵³); centered closings cast each
    moment to DOUBLE before multiplying (granger discipline); both √
    terms e6-round before the e6-rounded r."""
    e = load_table(spark, sf_dir, "events")
    hx = (
        e.filter(F.col("event_type").isin(_RC_G1, _RC_G2))
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 3600)
            .cast("bigint")
            .alias("h")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == _RC_G1, 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == _RC_G2, 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    spine = (
        spark.range(_N_HOURS)
        .select((F.col("id") + F.lit(_EPOCH_H)).cast("bigint").alias("h"))
        .join(hx, "h", "left")
        .select(
            "h",
            F.coalesce("x", F.lit(0)).cast("bigint").alias("x"),
            F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    w = Window.orderBy("h").rowsBetween(-(_RC_WIN - 1), Window.currentRow)
    x, y = F.col("x"), F.col("y")
    roll = spine.select(
        "h",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt"),
        F.sum(x).over(w).cast("bigint").alias("sx"),
        F.sum(y).over(w).cast("bigint").alias("sy"),
        F.sum(x * x).over(w).cast("bigint").alias("sxx"),
        F.sum(y * y).over(w).cast("bigint").alias("syy"),
        F.sum(x * y).over(w).cast("bigint").alias("sxy"),
    ).filter(F.col("cnt") == _RC_WIN)
    win = float(_RC_WIN)
    c = roll.select(
        "h",
        (win * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")).alias("cxy"),
        (win * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")).alias("cxx"),
        (win * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")).alias("cyy"),
    )
    cxy, cxx, cyy = F.col("cxy"), F.col("cxx"), F.col("cyy")
    return c.select(
        F.col("h").alias("hour_id"),
        F.when((cxx <= 0) | (cyy <= 0), F.lit(None).cast("double"))
        .otherwise(
            dround(
                cxy / dround(F.sqrt(cxx), 6) / dround(F.sqrt(cyy), 6), 6
            )
        )
        .alias("corr24"),
    )


@register(
    "q_ts_diurnal_entropy",
    oracle=f"""
    WITH hod AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hh,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(sum(y) AS BIGINT) AS n
      FROM hod GROUP BY event_type
    ),
    terms AS (
      SELECT hod.event_type, tot.n,
             {sql_dround(
                 "-(CAST(y AS DOUBLE) / n)"
                 " * ln(CAST(y AS DOUBLE) / n)", 6)} AS term
      FROM hod JOIN tot ON hod.event_type = tot.event_type
    ),
    ent AS (
      SELECT event_type, max(n) AS n_events,
             CAST(count(*) AS BIGINT) AS n_active_hours,
             CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE) AS h
      FROM terms GROUP BY event_type
    )
    SELECT event_type, n_events, n_active_hours,
           {sql_dround("h", 6)} AS entropy,
           {sql_dround(
               "h / (" + sql_dround("ln(24.0)", 6) + ")",
               6)} AS uniformity
    FROM ent
    """,
)
def q_ts_diurnal_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal concentration per event type: Shannon entropy of the
    hour-of-day distribution (empty hours contribute zero mass, the
    0·ln0 = 0 convention) and the uniformity index H/ln 24 — 1.0 is a
    flat 24/7 profile, →0 a single rush hour. The single-number
    summary of q_ts_diurnal_percentiles' full profile, and the
    seasonality-strength gauge autoscaling policy actually keys on.

    Plan: one (type, hour-of-day) hash aggregate (≤24·|types| rows),
    per-type totals joined back (aggregate-sized), one entropy fold.
    Determinism: counts are exact BIGINTs; each −p·ln p term uses the
    identical IEEE share and is e6-rounded before the decimal-detour
    sum (the libm discipline); ln 24 is e6-rounded before the
    e6-rounded uniformity ratio."""
    e = load_table(spark, sf_dir, "events")
    hod = e.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600).cast("bigint") % 24).alias(
            "hh"
        ),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    tot = hod.groupBy(F.col("event_type").alias("tt")).agg(
        F.sum("y").cast("bigint").alias("n")
    )
    p = F.col("y").cast("double") / F.col("n")
    terms = hod.join(
        F.broadcast(tot), F.col("event_type") == F.col("tt")
    ).select(
        "event_type",
        "n",
        dround(-p * F.log(p), 6).alias("term"),
    )
    ent = terms.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_active_hours"),
        F.sum(F.col("term").cast("decimal(25,6)"))
        .cast("double")
        .alias("h"),
    )
    ln24 = dround(F.log(F.lit(24.0)), 6)
    return ent.select(
        "event_type",
        "n_events",
        "n_active_hours",
        dround(F.col("h"), 6).alias("entropy"),
        dround(F.col("h") / ln24, 6).alias("uniformity"),
    )


# Permutation-entropy embedding (Bandt–Pompe order m=3: six ordinal
# patterns) and ln(3!) for the normalized statistic — spelled as a
# double literal so both engines parse the identical IEEE value.
_PE_LN6 = 1.791759469228055


@register(
    "q_ts_permutation_entropy",
    oracle=f"""
    WITH spine AS ({_SQL_TOTAL_SPINE}),
    emb AS (
      SELECT y AS a,
             lead(y, 1) OVER (ORDER BY h) AS b,
             lead(y, 2) OVER (ORDER BY h) AS c
      FROM spine
    ),
    pat AS (
      SELECT CASE
               WHEN a <= b AND b <= c THEN 0
               WHEN a <= c AND c < b  THEN 1
               WHEN b < a AND a <= c  THEN 2
               WHEN b <= c AND c < a  THEN 3
               WHEN c < a AND a <= b  THEN 4
               ELSE 5
             END AS p
      FROM emb WHERE b IS NOT NULL AND c IS NOT NULL
    ),
    cnt AS (
      SELECT p, CAST(count(*) AS BIGINT) AS c FROM pat GROUP BY p
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
    terms AS (
      SELECT {sql_dround(
          "(CAST(c AS DOUBLE) / n) * ("
          + sql_dround("ln(CAST(c AS DOUBLE) / n)", 6) + ")", 6,
      )} AS term, n
      FROM cnt CROSS JOIN tot
    )
    SELECT max(n) AS n_windows,
           CAST(count(*) AS BIGINT) AS n_patterns,
           {sql_dround(
               "-CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE)", 6,
           )} AS h_perm,
           {sql_dround(
               "-CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE)"
               f" / {_PE_LN6}", 6,
           )} AS h_perm_norm
    FROM terms
    """,
)
def q_ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandt–Pompe permutation entropy (order m=3) of the hourly
    total-count series: embed each hour with its two successors,
    classify the triple into one of 3! ordinal patterns
    (ties broken by POSITION — the stable-argsort convention, so
    integer-count plateaus classify deterministically), and take the
    Shannon entropy of the pattern histogram. H → ln 6 for white
    noise, low for monotone/periodic structure — the
    complexity-vs-predictability readout that complements
    q_ts_entropy_rate (symbol dynamics) and q_ts_acf (linear memory)
    with an ORDINAL, outlier-robust statistic.

    Plan: the densified 720-row spine, two lead windows over it, one
    ≤6-row pattern histogram, a one-row closing — event volume
    touches only the spine's hash aggregate. The spine windows are
    single-partition but spine-bounded (720 rows at any SF — the
    documented grain bound of this module). Determinism: patterns
    are exact integer comparisons; p = c/n is one exact division;
    each ln e6-rounds, the p·ln p product e6-rounds before its
    decimal sum; closings e6-round; ln 6 enters as a spelled double
    literal."""
    spine = _total_spine(spark, sf_dir)
    w = Window.orderBy("h")
    emb = spine.select(
        F.col("y").alias("a"),
        F.lead("y", 1).over(w).alias("b"),
        F.lead("y", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    pat = emb.select(
        F.when((a <= b) & (b <= c), 0)
        .when((a <= c) & (c < b), 1)
        .when((b < a) & (a <= c), 2)
        .when((b <= c) & (c < a), 3)
        .when((c < a) & (a <= b), 4)
        .otherwise(5)
        .alias("p")
    )
    cnt = pat.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # r17: A/B-tested BOTH a single-partition-window total (jobs 5->4
    # but min 0.79->0.92 s: two extra stages cost more than the removed
    # broadcast job at gate SF) and a localCheckpoint pin (wall wash,
    # jobs 5->7) against this double-pass form — neither beat it
    # locally, so the r16 shape stays (the broadcast total recomputes
    # the lag-window pass, but the two passes are only ~0.4 s here).
    tot = cnt.agg(F.sum("c").cast("bigint").alias("n"))
    pr = F.col("c").cast("double") / F.col("n")
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        dround(pr * dround(F.log(pr), 6), 6).alias("term"), "n"
    )
    h = -F.sum(F.col("term").cast("decimal(25,6)")).cast("double")
    return terms.agg(
        F.max("n").alias("n_windows"),
        F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
        dround(h, 6).alias("h_perm"),
        dround(h / _PE_LN6, 6).alias("h_perm_norm"),
    )


# DFA block sizes (powers of two, the q_ts_hurst_rs grid) and the
# profile scale factor: Ỹ_t = N·Y_t = N·cumsum(x) − t·Σx is an EXACT
# integer (Y itself is cumsum(x − Σx/N), a rational), so every block
# moment is exact int64 and the OLS closing runs on identically-cast
# doubles. 720² un-scales the residual SS at the end.
_DFA_SIZES = (8, 16, 32, 64)
_DFA_SCALE2 = float(720 * 720)


@register(
    "q_ts_dfa_alpha",
    oracle=f"""
    WITH obs AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) - {_EPOCH_H} AS hoff,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    hourly AS (
      SELECT t.event_type, g.hoff, CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS hoff
                  FROM range({_N_HOURS})) g
      LEFT JOIN obs o
        ON o.event_type = t.event_type AND o.hoff = g.hoff
    ),
    prof AS (
      SELECT event_type, hoff,
             CAST({_N_HOURS} * sum(x) OVER (PARTITION BY event_type
                                            ORDER BY hoff
                                            ROWS BETWEEN UNBOUNDED
                                            PRECEDING AND CURRENT ROW)
                  - (hoff + 1) * (sum(x) OVER (PARTITION BY event_type))
                  AS BIGINT) AS yt
      FROM hourly
    ),
    sized AS (
      SELECT p.event_type, s.n,
             CAST(floor(p.hoff / s.n) AS BIGINT) AS blk,
             p.hoff % s.n + 1 AS i, p.yt
      FROM prof p
      CROSS JOIN (SELECT unnest([{", ".join(str(n) for n in _DFA_SIZES)}])
                    AS n) s
    ),
    blocks AS (
      SELECT event_type, n, blk,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(yt) AS BIGINT) AS sy,
             CAST(sum(i * yt) AS BIGINT) AS siy,
             -- exact-int detour mirrors the Spark side's decimal(38,0)
             -- square (see below): a raw BIGINT yt*yt would raise
             -- out-of-range past int64 at large SF, making the two
             -- engines fail at different stages (r13 ADVICE)
             CAST(sum(CAST(yt AS HUGEINT) * yt) AS BIGINT) AS syy
      FROM sized GROUP BY event_type, n, blk
    ),
    resid AS (
      SELECT event_type, n,
             greatest(CAST(floor(
               (CAST(syy AS DOUBLE)
                - ((CAST(sy AS DOUBLE)
                    - (CAST(n AS DOUBLE) * siy
                       - (n * (n + 1) / 2.0) * sy)
                      / (n * n * (CAST(n AS DOUBLE) * n - 1) / 12.0)
                      * (n * (n + 1) / 2.0)) / n) * sy
                - (CAST(n AS DOUBLE) * siy
                   - (n * (n + 1) / 2.0) * sy)
                  / (n * n * (CAST(n AS DOUBLE) * n - 1) / 12.0)
                  * siy)
               / {_DFA_SCALE2} + 0.5) AS BIGINT), 0) AS ss0
      FROM blocks WHERE cnt = n
    ),
    fn AS (
      SELECT event_type, n,
             CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(CAST(ss0 AS DECIMAL(38,0))) AS DOUBLE) AS sst
      FROM resid GROUP BY event_type, n
    ),
    pts AS (
      SELECT event_type, n_blocks,
             {sql_dround("ln(CAST(n AS DOUBLE))", 6)} AS lx,
             {sql_dround(
                 "ln(sqrt(sst / (n_blocks * CAST(n AS DOUBLE))))", 6,
             )} AS ly
      FROM fn WHERE sst > 0
    ),
    fit AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_blocks) AS BIGINT) AS n_blocks_total,
             CAST(sum(CAST(lx AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(ly AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(lx * ly AS DECIMAL(25,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(lx * lx AS DECIMAL(25,6))) AS DOUBLE) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n_blocks_total,
           CASE WHEN k < 2 OR k * sxx - sx * sx = 0 THEN NULL
                ELSE {sql_dround(
                    "(k * sxy - sx * sy) / (k * sxx - sx * sx)", 6)}
           END AS dfa_alpha
    FROM fit
    """,
)
def q_ts_dfa_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended Fluctuation Analysis α of the hourly count series per
    type: integrate the mean-centered series into the profile Y, split
    into blocks of 8/16/32/64 hours, linearly DETREND each block (OLS
    on the in-block index), and regress ln F(n) on ln n where F(n) is
    the RMS residual — the robust Hurst estimator (α ≈ 0.5 white
    noise, > 0.5 persistent, and unlike q_ts_hurst_rs' R/S it is
    unbiased under nonstationary trends, which hourly product traffic
    always has). Partial tail blocks drop (the hurst convention); a
    degenerate all-zero profile takes the NULL branch.

    Plan: the densified per-type spine, one type-partitioned cumsum,
    one (type, size, block) integer-moment aggregate, 4-point closing
    OLS — event volume touches only the first hash aggregate.

    Magnitude discipline (the bollinger/f-test lesson): the profile is
    carried as the EXACT integer Ỹ = 720·cumsum − t·Σx (Y itself is
    rational), so the block moments (Σỹ, Σiỹ, Σỹ² ≤ ~3e17 at the test
    SFs) are exact and both engines cast them to double identically;
    Σỹ² is accumulated at decimal(38,0) (not int64 — |ỹ| grows with
    the per-type monthly count S as 720·S, and ỹ² would wrap int64
    silently past S ≈ 1.3e5 ≈ sf1 while DuckDB promotes to HUGEINT),
    so past-int64 totals fail LOUDLY at the closing bigint cast in
    both engines instead of diverging; the
    per-block residual SS un-scales by 720² and rounds to an INTEGER
    (its ~1e-15 relative closing error sits far from the 0.5 grid),
    then sums at decimal(38,0) whose total (~1e13) casts to double
    EXACTLY below 2^53 — no scaled-decimal cast of a large value
    anywhere. ln/sqrt e6-round per the libm convention."""
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type",
        (
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
            - _EPOCH_H
        ).alias("hoff"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    types = e.select("event_type").distinct()
    spine = spark.range(_N_HOURS).select(F.col("id").cast("bigint").alias("hoff"))
    hourly = (
        types.crossJoin(spine)
        .join(obs, ["event_type", "hoff"], "left")
        .select(
            "event_type", "hoff", F.coalesce("x", F.lit(0)).alias("x")
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("hoff")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    prof = hourly.select(
        "event_type",
        "hoff",
        (
            F.lit(_N_HOURS) * F.sum("x").over(wcum)
            - (F.col("hoff") + 1) * F.sum("x").over(wall)
        )
        .cast("bigint")
        .alias("yt"),
    )
    sizes = spark.createDataFrame([(n,) for n in _DFA_SIZES], "n bigint")
    sized = prof.crossJoin(F.broadcast(sizes)).select(
        "event_type",
        "n",
        F.floor(F.col("hoff") / F.col("n")).cast("bigint").alias("blk"),
        (F.col("hoff") % F.col("n") + 1).alias("i"),
        "yt",
    )
    blocks = sized.groupBy("event_type", "n", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("yt").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("yt")).cast("bigint").alias("siy"),
        # Square through decimal(38,0): int64 yt*yt would WRAP silently
        # in non-ANSI Spark once |yt| (≤ 720·monthly-count) passes
        # ~1.3e5 events/type-month (~sf1), while DuckDB promotes to
        # HUGEINT. The decimal product/sum is exact, and the closing
        # bigint cast fails loudly on overflow in both engines.
        F.sum(
            F.col("yt").cast("decimal(38,0)")
            * F.col("yt").cast("decimal(38,0)")
        )
        .cast("bigint")
        .alias("syy"),
    ).filter(F.col("cnt") == F.col("n"))
    nd = F.col("n").cast("double")
    si = F.col("n") * (F.col("n") + 1) / 2.0
    denom = F.col("n") * F.col("n") * (nd * F.col("n") - 1) / 12.0
    slope = (nd * F.col("siy") - si * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * si) / F.col("n")
    ss_scaled = (
        F.col("syy").cast("double")
        - intercept * F.col("sy")
        - slope * F.col("siy")
    )
    resid = blocks.select(
        "event_type",
        "n",
        F.greatest(
            F.floor(ss_scaled / _DFA_SCALE2 + 0.5).cast("bigint"), F.lit(0)
        ).alias("ss0"),
    )
    fn = resid.groupBy("event_type", "n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(F.col("ss0").cast("decimal(38,0)")).cast("double").alias("sst"),
    ).filter(F.col("sst") > 0)
    pts = fn.select(
        "event_type",
        "n_blocks",
        dround(F.log(nd), 6).alias("lx"),
        dround(
            F.log(
                F.sqrt(F.col("sst") / (F.col("n_blocks") * nd))
            ),
            6,
        ).alias("ly"),
    )
    d6 = "decimal(25,6)"
    fit = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_blocks").cast("bigint").alias("n_blocks_total"),
        F.sum(F.col("lx").cast(d6)).cast("double").alias("sx"),
        F.sum(F.col("ly").cast(d6)).cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast(d6)).cast("double").alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast(d6)).cast("double").alias("sxx"),
    )
    k = F.col("k")
    det = k * F.col("sxx") - F.col("sx") * F.col("sx")
    return fit.select(
        "event_type",
        "n_blocks_total",
        F.when((k < 2) | (det == 0), F.lit(None).cast("double"))
        .otherwise(
            dround(
                (k * F.col("sxy") - F.col("sx") * F.col("sy")) / det, 6
            )
        )
        .alias("dfa_alpha"),
    )


# Binary-segmentation margin: candidate splits keep >= 24 hours on
# each side so segment means are day-scale stable.
_BSEG_MARGIN = 24


@register(
    "q_ts_binary_segmentation",
    oracle=f"""
    WITH spine AS ({_SQL_TOTAL_SPINE}),
    cum AS (
      SELECT h - {_EPOCH_H} + 1 AS t,
             CAST(sum(y) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS BIGINT)
               AS ct,
             CAST(sum(y) OVER () AS BIGINT) AS s
      FROM spine
    ),
    gains AS (
      SELECT t, ct, s,
             {sql_dround(
                 f"(CAST(t AS DOUBLE) * ({_N_HOURS} - t) / {_N_HOURS})"
                 " * (CAST(ct AS DOUBLE) / t"
                 f"    - CAST(s - ct AS DOUBLE) / ({_N_HOURS} - t))"
                 " * (CAST(ct AS DOUBLE) / t"
                 f"    - CAST(s - ct AS DOUBLE) / ({_N_HOURS} - t))",
                 6)} AS gain
      FROM cum
      WHERE t >= {_BSEG_MARGIN} AND t <= {_N_HOURS - _BSEG_MARGIN}
    ),
    best AS (
      SELECT t, ct, s, gain,
             row_number() OVER (ORDER BY gain DESC, t) AS rn
      FROM gains
    )
    SELECT CAST(t AS BIGINT) AS split_hour,
           gain AS sse_gain,
           {sql_dround("CAST(ct AS DOUBLE) / t", 6)} AS mean_left,
           {sql_dround(
               f"CAST(s - ct AS DOUBLE) / ({_N_HOURS} - t)", 6,
           )} AS mean_right,
           s AS n_events
    FROM best WHERE rn = 1
    """,
)
def q_ts_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One step of binary-segmentation changepoint detection on the
    hourly TOTAL-count series: the split hour t* maximizing the SSE
    reduction gain(t) = (t(N−t)/N)·(μ_left − μ_right)², with the two
    segment means — the exact-argmax counterpart to
    q_ts_cusum_changepoint's sequential detector (CUSUM finds WHEN a
    drift started online; binary segmentation finds the single best
    retrospective break, and iterating it on the halves is the
    classic full changepoint algorithm). Candidate splits keep ≥ 24
    hours per side; ties on gain break to the EARLIEST hour.

    Plan: one cumulative window over the densified 720-row spine
    (time-grain bounded), a per-candidate closed-form gain from the
    exact integer (C_t, S) pair — no per-split re-scan, the prefix
    trick — and a bounded rank-1 pick. Determinism: gains are pure
    double arithmetic on exact int64 cumulative counts, e6-rounded;
    the argmax orders on (gain DESC, t) so exact double ties are
    broken deterministically; means e6-round."""
    spine = _total_spine(spark, sf_dir)
    w = Window.orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = spine.select(
        (F.col("h") - _EPOCH_H + 1).alias("t"),
        F.sum("y").over(w).cast("bigint").alias("ct"),
        F.sum("y").over(wall).cast("bigint").alias("s"),
    ).filter(
        (F.col("t") >= _BSEG_MARGIN)
        & (F.col("t") <= _N_HOURS - _BSEG_MARGIN)
    )
    td = F.col("t").cast("double")
    ml = F.col("ct").cast("double") / F.col("t")
    mr = (F.col("s") - F.col("ct")).cast("double") / (_N_HOURS - F.col("t"))
    gains = cum.select(
        "t",
        "ct",
        "s",
        dround(
            (td * (_N_HOURS - F.col("t")) / float(_N_HOURS))
            * (ml - mr)
            * (ml - mr),
            6,
        ).alias("gain"),
    )
    wr = Window.orderBy(F.col("gain").desc(), "t")
    best = gains.select(
        "*", F.row_number().over(wr).alias("rn")
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("t").cast("bigint").alias("split_hour"),
        F.col("gain").alias("sse_gain"),
        dround(ml, 6).alias("mean_left"),
        dround(mr, 6).alias("mean_right"),
        F.col("s").alias("n_events"),
    )


@register(
    "q_ts_cusum_detect",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    tot AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY event_type
    ),
    walk AS (
      SELECT d.event_type, d.day, tot.n, tot.total,
             CAST(row_number() OVER (PARTITION BY d.event_type
                                     ORDER BY d.day) AS BIGINT) AS t,
             CAST(sum(d.c) OVER (PARTITION BY d.event_type ORDER BY d.day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS s
      FROM d JOIN tot USING (event_type)
    ),
    dev AS (
      SELECT event_type, day, n, total, t,
             abs(n * s - t * total) AS absd
      FROM walk
    ),
    best AS (
      SELECT event_type, n, total,
             max(struct_pack(absd := absd, negt := -t, t := t,
                             day := day)) AS b
      FROM dev GROUP BY event_type, n, total
    )
    SELECT event_type,
           n AS n_days, total AS n_events,
           b.day AS cp_day,
           CAST(b.absd AS BIGINT) AS cusum_peak,
           floor(CAST(b.absd AS DOUBLE) / (CAST(n AS DOUBLE) * total)
                 * 1000000.0 + 0.5) / 1000000.0 AS rel_peak
    FROM best
    """,
)
def q_ts_cusum_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detector on each event type's daily count
    series: the day t* maximizing |S_t − t·μ| (the classic
    cumulative-sum drift statistic, Page 1954), reported with the
    peak deviation and its mean-relative size — the single-shift
    companion to q_ts_binary_segmentation's recursive splits.

    ALL-INTEGER core: the deviation is computed as |n·S_t − t·total|
    (multiplying through by n clears the mean's division), so the
    walk, the argmax, and the peak are exact BIGINTs in both engines
    — n·total stays far inside int64 at any realistic SF. Ties break
    toward the EARLIEST day via the (absd, −t) struct-max. The only
    rounding is the e6 mean-relative closing.

    Plan: one hash aggregate to the (type, day) grain, one per-type
    prefix-sum/rank window (time-grain bounded), a struct-argmax hash
    aggregate — no global window, no collect."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = d.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    ws = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walk = (
        d.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            "total",
            F.row_number().over(wo).cast("bigint").alias("t"),
            F.sum("c").over(ws).cast("bigint").alias("s"),
        )
    )
    dev = walk.select(
        "event_type",
        "day",
        "n",
        "total",
        "t",
        F.abs(
            F.col("n") * F.col("s") - F.col("t") * F.col("total")
        ).alias("absd"),
    )
    best = dev.groupBy("event_type", "n", "total").agg(
        F.max(
            F.struct(
                F.col("absd"),
                (-F.col("t")).alias("negt"),
                F.col("t"),
                F.col("day"),
            )
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("total").alias("n_events"),
        F.col("b.day").alias("cp_day"),
        F.col("b.absd").cast("bigint").alias("cusum_peak"),
        dround(
            F.col("b.absd").cast("double")
            / (F.col("n").cast("double") * F.col("total")),
            6,
        ).alias("rel_peak"),
    )
