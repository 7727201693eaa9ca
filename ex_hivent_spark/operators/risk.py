"""Risk / volatility analytics battery over the engine's two canonical
price-like series: the daily revenue per return flag (the
q_ts_log_returns stationarity transform) and the hourly event-value
bars (the finance.py OHLC family). Five readouts every
portfolio/telemetry risk console ships: Sharpe & Sortino ratios
(reward per unit of total / downside dispersion), historical VaR +
expected shortfall (tail loss quantile and its conditional mean),
CAPM beta/alpha against the pooled "market" series, and the
range-based Parkinson and Garman–Klass volatility estimators (which
extract intrabar information a close-to-close sigma throws away).

Plan discipline: event/lineitem volume only ever enters through hash
aggregates to the daily or hourly grain; every window is partitioned
by the flag/type key over time-grain-bounded frames (|days| ≈ 2.5k,
|hours| = 720) — traffic-invariant at any SF. No global sorts, no
driver collects.

Determinism (the drift.py discipline): grain sums ride the
decimal(25,6) detour; each ln (libm) is e6-rounded at the source so
squared terms are exact 1e-12-grid values summed at decimal(38,12);
closing sqrt/ratios are e6-rounded and zero-clamped; quantile picks
use the exact (ret, day) total order, never a percentile builtin.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no risk surface; these derive from the
driver's analytics mandate and standard risk-management practice
(Sharpe 1966 / Sortino, RiskMetrics historical VaR/ES, the CAPM
market model, Parkinson 1980, Garman–Klass 1980).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# Range-volatility lookback, in hourly bars (one trading "day").
_RANGE_WIN = 24
# Tail probability for historical VaR / expected shortfall.
_VAR_ALPHA = 0.05
# Exact double literals for the Parkinson / Garman–Klass constants —
# spelled as literals (not computed via log()) so both engines parse
# the identical IEEE value.
_FOUR_LN2 = 2.772588722239781  # 4·ln 2
_GK_C = 0.3862943611198906  # 2·ln 2 − 1

# Shared daily log-return CTE (q_ts_log_returns' transform): per-flag
# daily revenue via the decimal detour, then the e6-rounded ln ratio
# over the flag's own day sequence.
_SQL_DAILY_RETS = f"""
      SELECT rf, day,
             {sql_dround(
                 "ln(rev / lag(rev) OVER (PARTITION BY rf ORDER BY day))",
                 6,
             )} AS ret
      FROM (
        SELECT l_returnflag AS rf, CAST(l_shipdate AS DATE) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
                 AS rev
        FROM lineitem GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
      )
"""


def _daily_flag_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rf, day, ret) — e6-rounded daily log returns per return flag;
    first day per flag carries NULL ret."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.partitionBy("rf").orderBy("day")
    return daily.select(
        "rf",
        "day",
        dround(F.log(F.col("rev") / F.lag("rev").over(w)), 6).alias("ret"),
    )


@register(
    "q_agg_sharpe_sortino",
    oracle=f"""
    WITH r AS ({_SQL_DAILY_RETS}),
    m AS (
      SELECT rf, CAST(count(ret) AS BIGINT) AS n_rets,
             CAST(sum(CAST(ret AS DECIMAL(25,6))) AS DOUBLE) AS s,
             CAST(sum(CAST(ret * ret AS DECIMAL(38,12))) AS DOUBLE) AS ss,
             CAST(sum(CAST(CASE WHEN ret < 0 THEN ret * ret ELSE 0.0 END
                           AS DECIMAL(38,12))) AS DOUBLE) AS dss
      FROM r WHERE ret IS NOT NULL GROUP BY rf
    )
    SELECT rf AS l_returnflag, n_rets,
           s / n_rets AS mean_ret,
           {sql_dround(
               "sqrt(greatest((ss - s * s / n_rets) / (n_rets - 1), 0))",
               6,
           )} AS vol,
           {sql_dround("sqrt(dss / n_rets)", 6)} AS downside_dev,
           {sql_dround(
               "(s / n_rets)"
               " / sqrt(greatest((ss - s * s / n_rets) / (n_rets - 1),"
               " 0))",
               6,
           )} AS sharpe,
           CASE WHEN dss = 0 THEN NULL ELSE
             {sql_dround("(s / n_rets) / sqrt(dss / n_rets)", 6)}
           END AS sortino
    FROM m
    """,
)
def q_agg_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of the daily revenue log-return series
    per return flag (risk-free rate 0): sharpe = mean / sample-sigma,
    sortino = mean / downside deviation, where downside deviation is
    the POPULATION root-mean-square of the negative returns only
    (min(ret,0) convention, full n in the denominator — the standard
    Sortino/target-semideviation definition). Sortino > Sharpe says
    the dispersion is mostly upside.

    Plan: one hash aggregate to the daily grain, one per-flag lag
    window over |days| rows, one moment aggregate — time-grain bounded
    throughout. Determinism: e6 ln at the source so ret² / downside
    ret² are exact 1e-12-grid values summed at decimal(38,12); both
    closing ratios and sigmas are e6-rounded, variance zero-clamped,
    and the sortino takes the NULL branch when no negative return
    exists (degenerate-window lesson)."""
    r = _daily_flag_returns(spark, sf_dir)
    ret = F.col("ret")
    m = (
        r.filter(ret.isNotNull())
        .groupBy(F.col("rf").alias("l_returnflag"))
        .agg(
            F.count("ret").cast("bigint").alias("n_rets"),
            F.sum(ret.cast("decimal(25,6)")).cast("double").alias("s"),
            F.sum((ret * ret).cast("decimal(38,12)"))
            .cast("double")
            .alias("ss"),
            F.sum(
                F.when(ret < 0, ret * ret)
                .otherwise(F.lit(0.0))
                .cast("decimal(38,12)")
            )
            .cast("double")
            .alias("dss"),
        )
    )
    n = F.col("n_rets")
    mean = F.col("s") / n
    var = F.greatest(
        (F.col("ss") - F.col("s") * F.col("s") / n) / (n - 1), F.lit(0.0)
    )
    dd = F.sqrt(F.col("dss") / n)
    return m.select(
        "l_returnflag",
        "n_rets",
        mean.alias("mean_ret"),
        dround(F.sqrt(var), 6).alias("vol"),
        dround(dd, 6).alias("downside_dev"),
        dround(mean / F.sqrt(var), 6).alias("sharpe"),
        F.when(F.col("dss") == 0, F.lit(None).cast("double"))
        .otherwise(dround(mean / dd, 6))
        .alias("sortino"),
    )


@register(
    "q_agg_var_es",
    oracle=f"""
    WITH r AS ({_SQL_DAILY_RETS}),
    ranked AS (
      SELECT rf, ret,
             row_number() OVER (PARTITION BY rf ORDER BY ret, day)
               AS rn,
             CAST(count(*) OVER (PARTITION BY rf) AS BIGINT) AS n_rets
      FROM r WHERE ret IS NOT NULL
    ),
    tail AS (
      SELECT rf, n_rets,
             CAST(ceil({_VAR_ALPHA} * n_rets) AS BIGINT) AS k_tail,
             max(ret) AS kth_ret,
             CAST(sum(CAST(ret AS DECIMAL(25,6))) AS DOUBLE) AS tail_sum
      FROM ranked
      WHERE rn <= CAST(ceil({_VAR_ALPHA} * n_rets) AS BIGINT)
      GROUP BY rf, n_rets
    )
    SELECT rf AS l_returnflag, n_rets, k_tail,
           {sql_dround("-kth_ret", 6)} AS var95,
           {sql_dround("-(tail_sum / k_tail)", 6)} AS es95
    FROM tail
    """,
)
def q_agg_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% value-at-risk and expected shortfall of the
    daily revenue log returns per return flag: VaR = −(k-th smallest
    return) with k = ⌈0.05·n⌉ (the exact-rank historical-simulation
    convention, no interpolation), ES = −mean of the k tail returns —
    the coherent tail-loss companion the Basel/RiskMetrics stack pairs
    with VaR.

    Plan: the ranking window is PARTITIONED by flag over |days| rows
    (time-grain bounded — never event volume); one tail aggregate
    closes it. Determinism: returns are e6-rounded at the source, the
    tail pick orders by the exact (ret, day) pair (day breaks ties
    identically in both engines), the tail mean rides the decimal
    detour, and both outputs are e6-rounded."""
    r = _daily_flag_returns(spark, sf_dir).filter(F.col("ret").isNotNull())
    w = Window.partitionBy("rf").orderBy("ret", "day")
    wn = Window.partitionBy("rf")
    ranked = r.select(
        "rf",
        "ret",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n_rets"),
    )
    k = F.ceil(_VAR_ALPHA * F.col("n_rets")).cast("bigint")
    tail = (
        ranked.filter(F.col("rn") <= k)
        .groupBy(F.col("rf").alias("l_returnflag"), "n_rets")
        .agg(
            F.ceil(_VAR_ALPHA * F.col("n_rets"))
            .cast("bigint")
            .alias("k_tail"),
            F.max("ret").alias("kth_ret"),
            F.sum(F.col("ret").cast("decimal(25,6)"))
            .cast("double")
            .alias("tail_sum"),
        )
    )
    return tail.select(
        "l_returnflag",
        "n_rets",
        "k_tail",
        dround(-F.col("kth_ret"), 6).alias("var95"),
        dround(-(F.col("tail_sum") / F.col("k_tail")), 6).alias("es95"),
    )


@register(
    "q_agg_beta_capm",
    oracle=f"""
    WITH r AS ({_SQL_DAILY_RETS}),
    mkt AS (
      SELECT day,
             {sql_dround(
                 "ln(rev / lag(rev) OVER (ORDER BY day))", 6,
             )} AS mret
      FROM (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
                 AS rev
        FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
      )
    ),
    j AS (
      SELECT r.rf, r.ret, mkt.mret
      FROM r JOIN mkt ON r.day = mkt.day
      WHERE r.ret IS NOT NULL AND mkt.mret IS NOT NULL
    ),
    m AS (
      SELECT rf, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(ret AS DECIMAL(25,6))) AS DOUBLE) AS si,
             CAST(sum(CAST(mret AS DECIMAL(25,6))) AS DOUBLE) AS sm,
             CAST(sum(CAST(ret * mret AS DECIMAL(38,12))) AS DOUBLE)
               AS sim,
             CAST(sum(CAST(ret * ret AS DECIMAL(38,12))) AS DOUBLE) AS sii,
             CAST(sum(CAST(mret * mret AS DECIMAL(38,12))) AS DOUBLE)
               AS smm
      FROM j GROUP BY rf
    )
    SELECT rf AS l_returnflag, n_days,
           {sql_dround("(sim - si * sm / n_days) / (smm - sm * sm / n_days)",
                       6)} AS beta,
           {sql_dround(
               "si / n_days - (sim - si * sm / n_days)"
               " / (smm - sm * sm / n_days) * (sm / n_days)", 6,
           )} AS alpha,
           {sql_dround(
               "(sim - si * sm / n_days)"
               " / sqrt(greatest((sii - si * si / n_days)"
               " * (smm - sm * sm / n_days), 0))", 6,
           )} AS corr
    FROM m
    """,
)
def q_agg_beta_capm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM market-model fit of each return flag's daily revenue log
    returns against the pooled all-flag "market" series: beta =
    cov(rᵢ, rₘ)/var(rₘ), alpha = mean(rᵢ) − beta·mean(rₘ), plus the
    Pearson correlation — the is-this-segment-amplifying-or-damping-
    the-aggregate decomposition (beta > 1: amplifies market swings).

    Plan: two hash aggregates to the daily grain (per-flag and
    pooled), two partitioned/1-partition-safe lag windows over |days|
    rows — the market lag is a single-sequence window over the
    bounded day spine (allowlisted class), the flag lag is
    partitioned — then one day-keyed join (|days| rows a side) and a
    per-flag moment aggregate. Determinism: e6 ln at the source makes
    every cross/square product an exact 1e-12-grid value summed at
    decimal(38,12); beta/alpha/corr closings are e6-rounded with the
    corr denominator zero-clamped under the sqrt."""
    r = _daily_flag_returns(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    mdaily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("rev")
    )
    wm = Window.orderBy("day")
    mkt = mdaily.select(
        "day",
        dround(F.log(F.col("rev") / F.lag("rev").over(wm)), 6).alias(
            "mret"
        ),
    )
    j = (
        r.filter(F.col("ret").isNotNull())
        .join(mkt.filter(F.col("mret").isNotNull()), "day")
        .select("rf", "ret", "mret")
    )
    ret, mret = F.col("ret"), F.col("mret")
    m = j.groupBy(F.col("rf").alias("l_returnflag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(ret.cast("decimal(25,6)")).cast("double").alias("si"),
        F.sum(mret.cast("decimal(25,6)")).cast("double").alias("sm"),
        F.sum((ret * mret).cast("decimal(38,12)"))
        .cast("double")
        .alias("sim"),
        F.sum((ret * ret).cast("decimal(38,12)"))
        .cast("double")
        .alias("sii"),
        F.sum((mret * mret).cast("decimal(38,12)"))
        .cast("double")
        .alias("smm"),
    )
    n = F.col("n_days")
    cov = F.col("sim") - F.col("si") * F.col("sm") / n
    varm = F.col("smm") - F.col("sm") * F.col("sm") / n
    vari = F.col("sii") - F.col("si") * F.col("si") / n
    beta = cov / varm
    return m.select(
        "l_returnflag",
        "n_days",
        dround(beta, 6).alias("beta"),
        dround(F.col("si") / n - beta * (F.col("sm") / n), 6).alias(
            "alpha"
        ),
        dround(
            cov / F.sqrt(F.greatest(vari * varm, F.lit(0.0))), 6
        ).alias("corr"),
    )


# Open-carrying hourly bars: finance.py's _hourly_vbars pick plus the
# bar OPEN (first value by the (ts, event_id) total order) that the
# Garman–Klass estimator needs.
_SQL_OBARS = """
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             max(CASE WHEN rnd = 1 THEN value END) AS close,
             max(CASE WHEN rna = 1 THEN value END) AS open,
             max(value) AS high, min(value) AS low
      FROM (
        SELECT event_type, ts, event_id, value,
               row_number() OVER (
                 PARTITION BY event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                 ORDER BY ts DESC, event_id DESC) AS rnd,
               row_number() OVER (
                 PARTITION BY event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                 ORDER BY ts ASC, event_id ASC) AS rna
        FROM events
      )
      GROUP BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
"""


def _hourly_obars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hour_id, close, open, high, low) bars — the
    finance.py extreme/close picks plus the first-event open. Both
    row_number passes share one (event_type, hour_id) sort."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600)
        .cast("bigint")
        .alias("hour_id"),
        "ts",
        "event_id",
        "value",
    )
    pd_ = Window.partitionBy("event_type", "hour_id")
    wd = pd_.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    wa = pd_.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    rn = base.select(
        "*",
        F.row_number().over(wd).alias("rnd"),
        F.row_number().over(wa).alias("rna"),
    )
    return rn.groupBy("event_type", "hour_id").agg(
        F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        F.max(F.when(F.col("rna") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
    )


@register(
    "q_win_parkinson_vol",
    oracle=f"""
    WITH bars AS ({_SQL_OBARS}),
    u AS (
      SELECT event_type, hour_id,
             CASE WHEN low <= 0 THEN 0.0
                  ELSE {sql_dround("ln(high / low)", 6)} END AS lnhl
      FROM bars
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             CAST(sum(CAST(lnhl * lnhl AS DECIMAL(38,12))) OVER w
                  AS DOUBLE) AS ssq
      FROM u
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_RANGE_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, ssq,
           {sql_dround(
               f"sqrt(ssq / ({_FOUR_LN2} * {_RANGE_WIN}))", 6,
           )} AS parkinson24
    FROM rolled WHERE nbar = {_RANGE_WIN}
    """,
)
def q_win_parkinson_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson range volatility per event type: sigma estimated from
    the 24 trailing hourly bars' high/low ranges alone,
    sqrt( Σ ln(H/L)² / (4·ln2·n) ) — ~5× more statistically efficient
    than close-to-close sigma on the same bar count because every
    bar's full excursion contributes, not just its endpoint
    (Parkinson 1980). Zero-range bars contribute exactly 0, and bars
    touching value = 0 (present from sf0.1 up) take the same
    zero-information branch on both sides — the geometric-mean guard
    convention, keeping the ln total.

    Plan: one bar aggregate, one constant-width rows-frame per type
    over |hours| rows — time-grain bounded, traffic-invariant.
    Determinism: values are strictly positive (high ≥ low > 0) so the
    ln is total; it is e6-rounded at the source making each square an
    exact 1e-12-grid value summed at decimal(38,12); the 4ln2 constant
    is a spelled literal; the closing sqrt is e6-rounded."""
    bars = _hourly_obars(spark, sf_dir)
    u = bars.select(
        "event_type",
        "hour_id",
        F.when(F.col("low") <= 0, F.lit(0.0))
        .otherwise(dround(F.log(F.col("high") / F.col("low")), 6))
        .alias("lnhl"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_RANGE_WIN - 1), Window.currentRow)
    )
    rolled = u.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.sum((F.col("lnhl") * F.col("lnhl")).cast("decimal(38,12)"))
        .over(w)
        .cast("double")
        .alias("ssq"),
    ).filter(F.col("nbar") == _RANGE_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        "ssq",
        dround(
            F.sqrt(F.col("ssq") / (_FOUR_LN2 * _RANGE_WIN)), 6
        ).alias("parkinson24"),
    )


@register(
    "q_win_garman_klass",
    oracle=f"""
    WITH bars AS ({_SQL_OBARS}),
    t AS (
      SELECT event_type, hour_id,
             CASE WHEN low <= 0 THEN 0.0
                  ELSE {sql_dround("ln(high / low)", 6)} END AS u,
             CASE WHEN open <= 0 OR close <= 0 THEN 0.0
                  ELSE {sql_dround("ln(close / open)", 6)} END AS c
      FROM bars
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             CAST(sum(CAST(0.5 * u * u - {_GK_C} * c * c
                           AS DECIMAL(38,12))) OVER w AS DOUBLE) AS st
      FROM t
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_RANGE_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id,
           {sql_dround("st", 6)} AS gk_sum,
           {sql_dround(
               f"sqrt(greatest(st / {_RANGE_WIN}, 0))", 6,
           )} AS gk24
    FROM rolled WHERE nbar = {_RANGE_WIN}
    """,
)
def q_win_garman_klass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman–Klass range volatility per event type over 24 trailing
    hourly bars: sqrt( mean( 0.5·ln(H/L)² − (2ln2−1)·ln(C/O)² ) ) —
    the minimum-variance unbiased combination of the bar's range and
    its open-to-close drift (Garman–Klass 1980); ~7.4× the efficiency
    of close-to-close sigma. The per-window mean is clamped at 0
    before the sqrt (the estimator can go negative on strongly
    drifting windows — documented branch on both sides); bars touching
    value = 0 (present from sf0.1 up) contribute zero information to
    both terms (the geometric-mean guard convention).

    Plan: ONE bar aggregate carrying open+close+extremes (the two
    row_number picks share a single (type, hour) sort → one
    exchange), one constant-width rows-frame per type over |hours|
    rows. Determinism: strictly positive values make both lns total;
    each is e6-rounded at the source so the per-bar term is built from
    exact 1e-12-grid squares with spelled-literal constants, summed at
    decimal(38,12); the closing mean is zero-clamped and the sqrt
    e6-rounded."""
    bars = _hourly_obars(spark, sf_dir)
    t = bars.select(
        "event_type",
        "hour_id",
        F.when(F.col("low") <= 0, F.lit(0.0))
        .otherwise(dround(F.log(F.col("high") / F.col("low")), 6))
        .alias("u"),
        F.when((F.col("open") <= 0) | (F.col("close") <= 0), F.lit(0.0))
        .otherwise(dround(F.log(F.col("close") / F.col("open")), 6))
        .alias("c"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_RANGE_WIN - 1), Window.currentRow)
    )
    term = 0.5 * F.col("u") * F.col("u") - _GK_C * F.col("c") * F.col("c")
    rolled = t.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.sum(term.cast("decimal(38,12)"))
        .over(w)
        .cast("double")
        .alias("st"),
    ).filter(F.col("nbar") == _RANGE_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        dround(F.col("st"), 6).alias("gk_sum"),
        dround(
            F.sqrt(F.greatest(F.col("st") / _RANGE_WIN, F.lit(0.0))), 6
        ).alias("gk24"),
    )


@register(
    "q_agg_ulcer_index",
    oracle=f"""
    WITH d AS (
      SELECT l_returnflag AS rf, CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
               AS rev
      FROM lineitem GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
    ),
    r AS (
      SELECT rf, day, rev,
             max(rev) OVER (PARTITION BY rf ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS runmax
      FROM d
    ),
    dd AS (
      SELECT rf, {sql_dround("rev / runmax - 1.0", 6)} AS dd FROM r
    )
    SELECT rf,
           CAST(count(*) AS BIGINT) AS n_days,
           min(dd) AS max_drawdown,
           {sql_dround(
               "sqrt(CAST(sum(CAST(dd * dd AS DECIMAL(38,12)))"
               " AS DOUBLE) / count(*))", 6,
           )} AS ulcer
    FROM dd GROUP BY rf
    """,
)
def q_agg_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index of the per-flag daily revenue series: the RMS of
    the running drawdown dd_t = rev_t / runmax_t − 1 (≤ 0), plus the
    deepest drawdown — the path-dependent risk readout Sharpe/VaR
    can't see (Martin & McCann 1989): two series with identical return
    moments but different drawdown PERSISTENCE get different ulcers.
    Drawdowns stay as fractions (never ×100) so the squared sums
    remain ≤ |days| — inside the 2^53 unscaled-decimal(38,12) bound.

    Plan: one hash aggregate to the daily grain, a per-flag running
    max (partitioned, time-grain-bounded window), one closing
    aggregate. Determinism: revenue rides the decimal detour; runmax
    is an exact pick; dd is one IEEE division e6-rounded, so dd² is
    exact on the 1e-12 grid and the decimal(38,12) sum is exact; the
    closing sqrt-of-mean e6-rounds; min(dd) is already on the e6
    grid."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("rev")
    )
    w = (
        Window.partitionBy("rf")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = d.select(
        "rf",
        dround(F.col("rev") / F.max("rev").over(w) - 1.0, 6).alias("dd"),
    )
    return dd.groupBy("rf").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.min("dd").alias("max_drawdown"),
        dround(
            F.sqrt(
                F.sum(
                    (F.col("dd") * F.col("dd")).cast("decimal(38,12)")
                ).cast("double")
                / F.count(F.lit(1))
            ),
            6,
        ).alias("ulcer"),
    )
