"""Time-series feature extraction over the densified hourly spine:
KPSS level-stationarity, Haar wavelet energy by scale, seasonal/trend
strength (STL-lite), the paired sign test, and the z-normalized
matrix profile (all-pairs subsequence similarity) — the stationarity /
scale-decomposition / seasonality-strength / motif-discovery panel
that complements the tsdiag battery (ADF, runs, variance-ratio,
AR(1), turning points).

All operate on the q_ts_granger_lite spine class: events
pre-aggregate to hourly counts FIRST, densified onto the fixed 720-hour
month via a range spine — every downstream frame is |hours| rows,
time-grain bounded and traffic-invariant, so the plans hold at any
event volume (the month's hour count never grows with data size; at
multi-year retention the spine grows with TIME, and the single bounded
window would be partitioned by, e.g., month).

Determinism: hourly counts are exact BIGINTs; means over them are
single exact IEEE divisions; every residual that feeds an aggregate is
e6-rounded first and summed via the decimal detour; each sqrt/division
closing a statistic is e6-rounded on both sides.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no time-series surface; these derive from
the driver's analytics mandate and standard econometrics practice
(KPSS 1992 level test with lag-0 long-run variance; Haar 1910
multiresolution energy; Hyndman's seasonal/trend strength from
"Forecasting: Principles and Practice"; the classic paired sign test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.tsdiag import (
    _EPOCH_H,
    _N_HOURS,
    _SQL_TOTAL_SPINE,
    _total_spine,
)
from ex_hivent_spark.plans.registry import register

# KPSS 5% critical value for the level-stationarity test (eta-mu).
_KPSS_CRIT_5 = 0.463
# Haar energy levels: block sizes 2^k; 16 is the largest power of two
# dividing the 720-hour month evenly (720 = 16 * 45).
_HAAR_LEVELS = (1, 2, 3, 4)


@register(
    "q_ts_kpss_lite",
    oracle=f"""
    WITH series AS ({_SQL_TOTAL_SPINE}),
    m AS (
      SELECT CAST(sum(y) AS DOUBLE) / {_N_HOURS} AS mu FROM series
    ),
    resid AS (
      SELECT h, {sql_dround("y - mu", 6)} AS e FROM series, m
    ),
    cs AS (
      SELECT h, e,
             CAST(sum(CAST(e AS DECIMAL(25,6))) OVER (
               ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS DOUBLE) AS s
      FROM resid
    ),
    agg AS (
      SELECT CAST(sum(CAST(e * e AS DECIMAL(25,6))) AS DOUBLE)
                 / {_N_HOURS} AS s2,
             CAST(sum(CAST((s / {_N_HOURS}) * (s / {_N_HOURS})
                           AS DECIMAL(25,6))) AS DOUBLE) AS ss
      FROM cs
    )
    SELECT CAST({_N_HOURS} AS BIGINT) AS n_hours,
           (SELECT {sql_dround("mu", 6)} FROM m) AS mean_y,
           {sql_dround("s2", 6)} AS resid_var,
           CASE WHEN s2 = 0 THEN NULL
                ELSE {sql_dround("ss / s2", 6)} END AS eta_kpss,
           CASE WHEN s2 = 0 THEN NULL
                ELSE {sql_dround("ss / s2", 6)} < {_KPSS_CRIT_5} END
               AS level_stationary_5pct
    FROM agg
    """,
)
def q_ts_kpss_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic (lag-0 "lite" long-run
    variance) for the hourly TOTAL event-count series: residuals from
    the level, their running partial sums S_t, and
    eta = Sigma S_t^2 / (n^2 * sigma-hat^2) — the stationarity
    complement of q_ts_adf_lite (KPSS's null IS stationarity, ADF's
    null is a unit root; agreeing verdicts from both is the standard
    econometric sanity pair). eta below the 5% critical value 0.463
    reads level-stationary.

    Plan: hourly pre-agg densified on the range spine, one bounded
    720-row cumulative-sum window (the q_ts_granger_lite class), one
    scalar aggregate. Determinism: the mean is one exact division of
    a BIGINT sum; residuals are e6-rounded before the decimal-detour
    cumsum; partial sums are scaled by 1/n BEFORE squaring so the
    decimal-summed addends stay far inside the 2^53 unscaled bound;
    the closing ratio is e6-rounded; a constant series (sigma-hat = 0)
    yields NULL on both engines."""
    series = _total_spine(spark, sf_dir)
    m = series.agg(
        (F.sum("y").cast("double") / _N_HOURS).alias("mu")
    )
    resid = series.crossJoin(F.broadcast(m)).select(
        "h", dround(F.col("y") - F.col("mu"), 6).alias("e"), "mu"
    )
    wc = Window.orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cs = resid.select(
        "e",
        "mu",
        F.sum(F.col("e").cast("decimal(25,6)"))
        .over(wc)
        .cast("double")
        .alias("s"),
    )
    sn = F.col("s") / _N_HOURS
    agg = cs.agg(
        F.max("mu").alias("mu"),
        (
            F.sum((F.col("e") * F.col("e")).cast("decimal(25,6)"))
            .cast("double")
            / _N_HOURS
        ).alias("s2"),
        F.sum((sn * sn).cast("decimal(25,6)")).cast("double").alias("ss"),
    )
    eta = dround(F.col("ss") / F.col("s2"), 6)
    return agg.select(
        F.lit(_N_HOURS).cast("bigint").alias("n_hours"),
        dround(F.col("mu"), 6).alias("mean_y"),
        dround(F.col("s2"), 6).alias("resid_var"),
        F.when(F.col("s2") == 0, F.lit(None).cast("double"))
        .otherwise(eta)
        .alias("eta_kpss"),
        F.when(F.col("s2") == 0, F.lit(None).cast("boolean"))
        .otherwise(eta < _KPSS_CRIT_5)
        .alias("level_stationary_5pct"),
    )


def _haar_level_sql(k: int) -> str:
    b = 2**k
    half = b // 2
    return f"""
      SELECT CAST({k} AS INT) AS level,
             CAST({b} AS BIGINT) AS block_size,
             CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(d * d) AS DOUBLE) / {b * b}.0 AS energy
      FROM (
        SELECT CAST(sum(CASE WHEN CAST(floor((h - {_EPOCH_H}) / {half}.0)
                                  AS BIGINT) % 2 = 0
                             THEN y ELSE -y END) AS BIGINT) AS d
        FROM series
        GROUP BY CAST(floor((h - {_EPOCH_H}) / {b}.0) AS BIGINT)
      )
    """


@register(
    "q_ts_wavelet_haar",
    oracle=f"""
    WITH series AS ({_SQL_TOTAL_SPINE})
    {" UNION ALL ".join(_haar_level_sql(k) for k in _HAAR_LEVELS)}
    """,
)
def q_ts_wavelet_haar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy by scale for the hourly TOTAL event-count
    series: at level k (block of 2^k hours) the detail coefficient of
    each block is the left-half mean minus the right-half mean over
    two, d = (S_L - S_R) / 2^k, and the level's energy is Sigma d^2 —
    the multiresolution variance decomposition ("is the volatility in
    2-hour jitter or 16-hour regimes?") that locates WHICH time scale
    carries the variance, where q_ts_spectral_peaks locates which
    frequency. Levels 1..4 (block 2..16 hours); 16 is the largest
    power of two dividing the 720-hour month.

    Plan: hourly pre-agg densified on the range spine, then one tiny
    hash aggregate per level (block key = integer division of the
    spine index — at most 360 groups) unioned; no windows, no sorts.
    Determinism: block sums and signed differences are exact BIGINTs
    (integer counts), each level's energy sum is an exact integer
    aggregate, and the single closing division by 4^k is one exact
    IEEE operation — no libm, no rounding needed anywhere."""
    series = _total_spine(spark, sf_dir).localCheckpoint(eager=False)
    return haar_energies(series, _EPOCH_H)


def haar_energies(series: DataFrame, origin_h: int) -> DataFrame:
    """Per-level Haar detail energy of an (h, y) hourly series whose
    spine starts at ``origin_h`` (exposed so tests can feed synthetic
    series: a constant series must read zero energy at every level)."""
    t = F.col("h") - origin_h
    out = None
    for k in _HAAR_LEVELS:
        b = 2**k
        half = b // 2
        signed = F.when((t / half).cast("bigint") % 2 == 0, F.col("y")).otherwise(
            -F.col("y")
        )
        lvl = (
            series.groupBy((t / b).cast("bigint").alias("blk"))
            .agg(F.sum(signed).cast("bigint").alias("d"))
            .agg(
                F.lit(k).cast("int").alias("level"),
                F.lit(b).cast("bigint").alias("block_size"),
                F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                (
                    F.sum(F.col("d") * F.col("d")).cast("double")
                    / float(b * b)
                ).alias("energy"),
            )
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out


@register(
    "q_ts_stl_strength",
    oracle=f"""
    WITH series AS ({_SQL_TOTAL_SPINE}),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum((h - {_EPOCH_H})) AS BIGINT) AS st,
             CAST(sum((h - {_EPOCH_H}) * (h - {_EPOCH_H})) AS BIGINT)
               AS stt,
             CAST(sum((h - {_EPOCH_H}) * y) AS BIGINT) AS sty
      FROM series
    ),
    hod AS (
      SELECT h % 24 AS hr, CAST(sum(y) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM series GROUP BY h % 24
    ),
    des AS (
      SELECT {sql_dround("s.y - d.s / CAST(d.c AS DOUBLE)", 6)} AS r
      FROM series s JOIN hod d ON s.h % 24 = d.hr
    ),
    des_var AS (
      SELECT CAST(sum(CAST(r AS DECIMAL(25,6))) AS DOUBLE) AS sr,
             CAST(sum(CAST(r * r AS DECIMAL(25,6))) AS DOUBLE) AS srr
      FROM des
    ),
    fit AS (
      SELECT n, sy, syy,
             CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b
      FROM base
    ),
    det AS (
      SELECT {sql_dround(
                 "s.y - (CAST(f.sy AS DOUBLE) / f.n"
                 " - f.b * (CAST(b2.st AS DOUBLE) / b2.n))"
                 " - f.b * (s.h - " + str(_EPOCH_H) + ")", 6)} AS r
      FROM series s, fit f, base b2
    ),
    det_var AS (
      SELECT CAST(sum(CAST(r AS DECIMAL(25,6))) AS DOUBLE) AS sr,
             CAST(sum(CAST(r * r AS DECIMAL(25,6))) AS DOUBLE) AS srr
      FROM det
    ),
    vy AS (
      SELECT (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n
               AS var_y, n
      FROM base
    )
    SELECT CAST(vy.n AS BIGINT) AS n_hours,
           {sql_dround("vy.var_y", 6)} AS var_y,
           {sql_dround("(dv.srr - dv.sr * dv.sr / vy.n) / vy.n", 6)}
               AS var_deseasoned,
           {sql_dround("(tv.srr - tv.sr * tv.sr / vy.n) / vy.n", 6)}
               AS var_detrended,
           CASE WHEN vy.var_y = 0 THEN NULL ELSE
             {sql_dround(
                 "greatest(0.0, 1.0 - ((dv.srr - dv.sr * dv.sr / vy.n)"
                 " / vy.n) / vy.var_y)", 6)} END AS seasonal_strength,
           CASE WHEN vy.var_y = 0 THEN NULL ELSE
             {sql_dround(
                 "greatest(0.0, 1.0 - ((tv.srr - tv.sr * tv.sr / vy.n)"
                 " / vy.n) / vy.var_y)", 6)} END AS trend_strength
    FROM vy, des_var dv, det_var tv
    """,
)
def q_ts_stl_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal and trend strength (STL-lite, Hyndman's variance-ratio
    definition) of the hourly TOTAL event-count series: seasonal
    strength = max(0, 1 - Var(y - diurnal profile)/Var(y)) with the
    profile being the per-hour-of-day mean (q_ts_seasonal_decompose's
    component), trend strength = max(0, 1 - Var(OLS residual)/Var(y))
    with a straight-line fit over the month — the two scalars that
    decide whether a forecasting pipeline needs a seasonal term, a
    trend term, both, or neither.

    Plan: hourly pre-agg densified on the range spine; one scalar
    moment aggregate (all-integer sums: Sigma y, Sigma y^2, Sigma t,
    Sigma t^2, Sigma t*y over the 720-row spine), one 24-row diurnal
    aggregate broadcast back, two residual-variance aggregates — no
    windows, no sorts. Determinism: slope and intercept come from
    exact BIGINT moment sums (one IEEE division each); residuals are
    e6-rounded before their decimal-detour variance sums; every
    emitted float is e6-rounded; a constant series (Var(y) = 0)
    yields NULL strengths on both engines."""
    series = _total_spine(spark, sf_dir).localCheckpoint(eager=False)
    t = F.col("h") - _EPOCH_H
    base = series.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(t).cast("bigint").alias("st"),
        F.sum(t * t).cast("bigint").alias("stt"),
        F.sum(t * F.col("y")).cast("bigint").alias("sty"),
    )
    hod = series.groupBy((F.col("h") % 24).alias("hr")).agg(
        F.sum("y").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    des = (
        series.join(F.broadcast(hod), F.col("h") % 24 == F.col("hr"))
        .select(
            dround(
                F.col("y") - F.col("s") / F.col("c").cast("double"), 6
            ).alias("r")
        )
        .agg(
            F.sum(F.col("r").cast("decimal(25,6)"))
            .cast("double")
            .alias("sr"),
            F.sum((F.col("r") * F.col("r")).cast("decimal(25,6)"))
            .cast("double")
            .alias("srr"),
        )
    )
    n = F.col("n").cast("double")
    b = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    fit = base.select(
        "n",
        "sy",
        "syy",
        "st",
        b.alias("b"),
    )
    a = F.col("sy").cast("double") / n - F.col("b") * (
        F.col("st").cast("double") / n
    )
    det = (
        series.crossJoin(F.broadcast(fit))
        .select(dround(F.col("y") - a - F.col("b") * t, 6).alias("r"))
        .agg(
            F.sum(F.col("r").cast("decimal(25,6)"))
            .cast("double")
            .alias("sr"),
            F.sum((F.col("r") * F.col("r")).cast("decimal(25,6)"))
            .cast("double")
            .alias("srr"),
        )
    )
    var_y = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy") / n
    ) / n
    vy = base.select(F.col("n").alias("n_hours"), var_y.alias("var_y"))
    joined = (
        vy.crossJoin(des.select(F.col("sr").alias("dsr"), F.col("srr").alias("dsrr")))
        .crossJoin(det.select(F.col("sr").alias("tsr"), F.col("srr").alias("tsrr")))
    )
    nn = F.col("n_hours").cast("double")
    var_des = (F.col("dsrr") - F.col("dsr") * F.col("dsr") / nn) / nn
    var_det = (F.col("tsrr") - F.col("tsr") * F.col("tsr") / nn) / nn
    zero = F.col("var_y") == 0
    return joined.select(
        F.col("n_hours").cast("bigint").alias("n_hours"),
        dround(F.col("var_y"), 6).alias("var_y"),
        dround(var_des, 6).alias("var_deseasoned"),
        dround(var_det, 6).alias("var_detrended"),
        F.when(zero, F.lit(None).cast("double"))
        .otherwise(dround(F.greatest(F.lit(0.0), 1.0 - var_des / F.col("var_y")), 6))
        .alias("seasonal_strength"),
        F.when(zero, F.lit(None).cast("double"))
        .otherwise(dround(F.greatest(F.lit(0.0), 1.0 - var_det / F.col("var_y")), 6))
        .alias("trend_strength"),
    )


@register(
    "q_stats_sign_test",
    oracle=f"""
    WITH spine AS (
      SELECT CAST(unnest(range({_EPOCH_H}, {_EPOCH_H + _N_HOURS}))
                  AS BIGINT) AS h
    ),
    counts AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
    ),
    paired AS (
      SELECT coalesce(c.a, 0) - coalesce(c.b, 0) AS d
      FROM spine s LEFT JOIN counts c ON c.h = s.h
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
             CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neg,
             CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tie
      FROM paired
    )
    SELECT n_pos, n_neg, n_tie,
           CASE WHEN n_pos + n_neg = 0 THEN NULL ELSE
             {sql_dround(
                 "(n_pos - CAST(n_pos + n_neg AS DOUBLE) / 2.0) / ("
                 + sql_dround(
                     "sqrt(CAST(n_pos + n_neg AS DOUBLE)) / 2.0", 6)
                 + ")", 6)}
           END AS z_stat
    FROM agg
    """,
)
def q_stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: clicks vs views per hour over the month
    spine — how many hours had more clicks than views (n_pos), fewer
    (n_neg), equal (n_tie, dropped per the textbook convention), and
    the normal-approximation z-statistic of n_pos against Binomial(n,
    1/2) — the distribution-free "is stream A systematically above
    stream B?" check that needs no variance model, the nonparametric
    sibling of q_agg_welch_ttest.

    Plan: one filtered hash aggregate of the two event types to the
    hourly grain (conditional counts in a single pass), densified on
    the range spine, one scalar sign-count aggregate — no windows, no
    sorts, no per-event shuffle beyond the hourly pre-agg.
    Determinism: signs of exact BIGINT differences; the one sqrt is
    e6-rounded before the e6-rounded closing ratio; an all-tie series
    yields NULL on both engines."""
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 3600)
            .cast("bigint")
            .alias("h")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("b"),
        )
    )
    spine = spark.range(_N_HOURS).select(
        (F.col("id") + F.lit(_EPOCH_H)).cast("bigint").alias("h")
    )
    paired = spine.join(counts, "h", "left").select(
        (F.coalesce("a", F.lit(0)) - F.coalesce("b", F.lit(0))).alias("d")
    )
    agg = paired.agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_tie"),
    )
    m = (F.col("n_pos") + F.col("n_neg")).cast("double")
    sigma = dround(F.sqrt(m) / 2.0, 6)
    return agg.select(
        "n_pos",
        "n_neg",
        "n_tie",
        F.when(F.col("n_pos") + F.col("n_neg") == 0, F.lit(None).cast("double"))
        .otherwise(dround((F.col("n_pos") - m / 2.0) / sigma, 6))
        .alias("z_stat"),
    )


# Matrix-profile subsequence length (one diurnal cycle) and the
# exclusion zone (no self-overlapping "trivial" matches).
_MP_M = 24
# Window start offsets 0..696 on the 720-hour spine.
_MP_STARTS = _N_HOURS - _MP_M + 1

_SQL_MP_CORE = f"""
    s0 AS (SELECT h - {_EPOCH_H} AS t, y FROM series),
    wstat AS (
      SELECT t,
             CAST(count(*) OVER wl AS BIGINT) AS nw,
             CAST(sum(y) OVER wl AS BIGINT) AS s,
             CAST(sum(y * y) OVER wl AS BIGINT) AS q
      FROM s0
      WINDOW wl AS (ORDER BY t ROWS BETWEEN CURRENT ROW
                    AND {_MP_M - 1} FOLLOWING)
    ),
    ws AS (
      SELECT t, s, {_MP_M} * q - s * s AS den
      FROM wstat WHERE nw = {_MP_M}
    ),
    lags AS (SELECT CAST(unnest(range({_MP_M}, {_MP_STARTS})) AS BIGINT)
             AS d),
    prod AS (
      SELECT l.d, a.t, a.y * b.y AS z
      FROM lags l, s0 a, s0 b
      WHERE b.t = a.t + l.d
    ),
    rolled AS (
      SELECT d, t,
             CAST(count(*) OVER wp AS BIGINT) AS np,
             CAST(sum(z) OVER wp AS BIGINT) AS p
      FROM prod
      WINDOW wp AS (PARTITION BY d ORDER BY t
                    ROWS BETWEEN CURRENT ROW
                    AND {_MP_M - 1} FOLLOWING)
    ),
    pairs AS (
      SELECT r.t AS i, r.t + r.d AS j,
             CAST({_MP_M} * r.p - wi.s * wj.s AS DOUBLE) AS num,
             CAST(wi.den AS DOUBLE) AS di,
             CAST(wj.den AS DOUBLE) AS dj
      FROM (SELECT d, t, p FROM rolled WHERE np = {_MP_M}) r
      JOIN ws wi ON wi.t = r.t
      JOIN ws wj ON wj.t = r.t + r.d
      WHERE wi.den > 0 AND wj.den > 0
    ),
    directed AS (
      SELECT i AS src, j AS dst, num,
             di AS den_src, dj AS den_dst FROM pairs
      UNION ALL
      SELECT j, i, num, dj, di FROM pairs
    ),
    keyed AS (
      SELECT src, dst, num, den_src, den_dst,
             CASE WHEN num >= 0 THEN num * num / den_dst
                  ELSE -(num * num) / den_dst END AS g
      FROM directed
    ),
    best AS (
      SELECT src, dst, num, den_src, den_dst,
             row_number() OVER (PARTITION BY src
                                ORDER BY g DESC, dst ASC) AS rn
      FROM keyed
    )
"""


@register(
    "q_ts_matrix_profile",
    oracle=f"""
    WITH series AS ({_SQL_TOTAL_SPINE}),
    {_SQL_MP_CORE}
    SELECT src + {_EPOCH_H} AS h,
           dst + {_EPOCH_H} AS match_h,
           {sql_dround("num / sqrt(den_src * den_dst)", 6)} AS r,
           {sql_dround(
               f"sqrt(greatest(2.0 * {_MP_M} * (1.0 - ("
               + sql_dround("num / sqrt(den_src * den_dst)", 6)
               + ")), 0.0))", 6)} AS nn_dist
    FROM best WHERE rn = 1
    """,
)
def q_ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile (STOMP-style, z-normalized) of the hourly TOTAL
    event-count series with subsequence length 24 (one diurnal cycle):
    for every window start h, the nearest OTHER window (exclusion zone
    |Δ| ≥ 24, so a motif can't trivially match its own overlap), its
    Pearson correlation r, and the z-normalized Euclidean distance
    sqrt(2m(1−r)). Low-distance rows are recurring motifs (a day that
    repeats); high-distance rows are discords — the month's most
    anomalous day-shaped window, the Yeh et al. 2016 all-pairs
    similarity view that q_ts_anomaly's pointwise z-score can't see.

    Plan: the O(|windows|²) pair space is generated as (lag, start)
    products of the FIXED 720-hour month spine (the q_ts_theil_sen
    bounded-pre-agg discipline — event volume only enters through the
    hourly hash aggregate; at longer retention the profile would be
    computed per bounded period). Cross terms come from ONE broadcast
    self-join of the 720-row series onto the lag grid and a rolling
    24-sum PARTITIONED BY LAG (≤720 rows per partition); window
    moments ride one bounded 720-row pass; the argmax per start is a
    row_number over ≤2·|windows| rows per partition.

    Determinism: all sums (S, Q, cross products P) are exact BIGINTs;
    the match selection key sign(num)·num²/den_dst is a monotone image
    of r built from exact integers with two IEEE ops — both engines
    pick identical matches with a dst-ascending tie-break — and the
    two libm closings (the r ratio's sqrt, then the distance sqrt on
    the e6-rounded r) are e6-rounded on both sides. Flat windows
    (den = 0, possible at tiny SF during zero-traffic stretches) have
    undefined z-norm and are excluded from both roles identically."""
    series = _total_spine(spark, sf_dir)
    s0 = series.select(
        (F.col("h") - _EPOCH_H).cast("bigint").alias("t"), "y"
    ).localCheckpoint(eager=False)
    wl = Window.orderBy("t").rowsBetween(0, _MP_M - 1)
    wstat = s0.select(
        "t",
        F.count(F.lit(1)).over(wl).cast("bigint").alias("nw"),
        F.sum("y").over(wl).cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).over(wl).cast("bigint").alias("q"),
    )
    ws = wstat.filter(F.col("nw") == _MP_M).select(
        "t",
        "s",
        (_MP_M * F.col("q") - F.col("s") * F.col("s")).alias("den"),
    )
    lags = spark.range(_MP_M, _MP_STARTS).select(
        F.col("id").cast("bigint").alias("d")
    )
    a = s0.select(F.col("t"), F.col("y").alias("ya"))
    b = s0.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    prod = (
        lags.crossJoin(a)
        .join(F.broadcast(b), F.col("tb") == F.col("t") + F.col("d"))
        .select("d", "t", (F.col("ya") * F.col("yb")).alias("z"))
    )
    wp = (
        Window.partitionBy("d")
        .orderBy("t")
        .rowsBetween(0, _MP_M - 1)
    )
    rolled = prod.select(
        "d",
        "t",
        F.count(F.lit(1)).over(wp).cast("bigint").alias("np"),
        F.sum("z").over(wp).cast("bigint").alias("p"),
    ).filter(F.col("np") == _MP_M)
    wi = ws.select(
        F.col("t").alias("i"),
        F.col("s").alias("si"),
        F.col("den").alias("di"),
    )
    wj = ws.select(
        F.col("t").alias("j"),
        F.col("s").alias("sj"),
        F.col("den").alias("dj"),
    )
    pairs = (
        rolled.select(
            F.col("t").alias("i"),
            (F.col("t") + F.col("d")).alias("j"),
            "p",
        )
        .join(F.broadcast(wi), "i")
        .join(F.broadcast(wj), "j")
        .filter((F.col("di") > 0) & (F.col("dj") > 0))
        .select(
            "i",
            "j",
            (_MP_M * F.col("p") - F.col("si") * F.col("sj"))
            .cast("double")
            .alias("num"),
            F.col("di").cast("double").alias("di"),
            F.col("dj").cast("double").alias("dj"),
        )
        # The union below reads the pair frame in BOTH directions; the
        # lazy checkpoint computes the whole (lag, start) pipeline once
        # instead of once per union branch (~225k rows pinned).
        .localCheckpoint(eager=False)
    )
    directed = pairs.select(
        F.col("i").alias("src"),
        F.col("j").alias("dst"),
        "num",
        F.col("di").alias("den_src"),
        F.col("dj").alias("den_dst"),
    ).unionByName(
        pairs.select(
            F.col("j").alias("src"),
            F.col("i").alias("dst"),
            "num",
            F.col("dj").alias("den_src"),
            F.col("di").alias("den_dst"),
        )
    )
    keyed = directed.select(
        "*",
        F.when(
            F.col("num") >= 0,
            F.col("num") * F.col("num") / F.col("den_dst"),
        )
        .otherwise(-(F.col("num") * F.col("num")) / F.col("den_dst"))
        .alias("g"),
    )
    wrn = Window.partitionBy("src").orderBy(
        F.col("g").desc(), F.col("dst").asc()
    )
    best = keyed.select(
        "*", F.row_number().over(wrn).alias("rn")
    ).filter(F.col("rn") == 1)
    r6 = dround(
        F.col("num") / F.sqrt(F.col("den_src") * F.col("den_dst")), 6
    )
    return best.select(
        (F.col("src") + _EPOCH_H).cast("bigint").alias("h"),
        (F.col("dst") + _EPOCH_H).cast("bigint").alias("match_h"),
        r6.alias("r"),
        dround(
            F.sqrt(
                F.greatest(
                    2.0 * _MP_M * (1.0 - r6), F.lit(0.0)
                )
            ),
            6,
        ).alias("nn_dist"),
    )


@register(
    "q_ts_cid_ce",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    d AS (
      SELECT event_type,
             c - lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS df
      FROM h
    )
    SELECT event_type,
           CAST(count(df) AS BIGINT) AS n_steps,
           CAST(sum(df * df) AS BIGINT) AS energy,
           floor(sqrt(CAST(sum(df * df) AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS ce
    FROM d WHERE df IS NOT NULL GROUP BY event_type
    """,
)
def q_ts_cid_ce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complexity-invariant distance complexity estimate (Batista et
    al. 2014) per event type: CE = √Σ(Δc)² over the hourly count
    series — the "stretched length" of the series that CID uses to
    normalize distances so erratic series don't look artificially far
    from smooth ones; here it ranks event types by traffic-shape
    complexity (spiky ingest vs steady heartbeat) for anomaly-budget
    allocation. Hours with no events contribute no bar (observed-grain
    convention, the q_ts_fano_factor precedent); the diff spans the
    gap.

    Plan: one partial-aggregated hash aggregate to the (type, hour)
    grain, one partitioned lag (time-grain-bounded window), one
    closing aggregate. All-integer until the final sqrt: counts,
    diffs, and the energy Σ(Δc)² are exact BIGINTs on both engines
    (hourly counts keep the squared sum far below 2^63), so the only
    rounding is the closing e6 sqrt."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.partitionBy("event_type").orderBy("hr")
    d = h.select(
        "event_type", (F.col("c") - F.lag("c").over(w)).alias("df")
    )
    return (
        d.filter(F.col("df").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("df").cast("bigint").alias("n_steps"),
            F.sum(F.col("df") * F.col("df")).cast("bigint").alias("energy"),
            dround(
                F.sqrt(F.sum(F.col("df") * F.col("df")).cast("double")), 6
            ).alias("ce"),
        )
    )
