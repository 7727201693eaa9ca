"""Momentum-indicator tail over the hourly bars: the Ultimate
Oscillator (Williams' three-horizon buying-pressure blend — momentum
confirmed across 7/14/28-bar windows at once), the Know Sure Thing
(Pring's weighted sum of four smoothed rates of change — the
long-swing momentum gauge), and the Detrended Price Oscillator
(price minus its displaced moving average — the cycle extractor that
removes the trend component). Together with volumeflow.py's
AO/PPO/TRIX they complete the classic momentum family.

All smoothing is SIMPLE averaging over constant-width rows-frames
(the q_win_rsi convention — SMA rides the decimal detour exactly
where EMA recursion would accumulate engine-ordered double error),
and the DPO displacement is the standard n/2+1 ROW shift (row-based,
the q_win_ichimoku displacement convention).

Plan discipline (finance.py's): ONE bar aggregate per query, then
constant-width windows partitioned by event_type over |hours| rows —
time-grain bounded, traffic-invariant. Chained windows share one
(event_type, hour_id) sort.

Determinism: bar picks are exact; every ratio/ln-free computed double
is e6-rounded before any decimal re-aggregation; divisions are
per-row IEEE ops; zero-range denominators take documented branches.

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no indicator surface; these
derive from the driver's analytics mandate and standard
technical-analysis practice (Williams' Ultimate Oscillator, Pring's
KST, the standard DPO construction).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.finance import (
    _SQL_BARS,
    _SQL_VBARS,
    _hourly_close,
)
from ex_hivent_spark.operators.risk import _SQL_OBARS
from ex_hivent_spark.plans.registry import register

# Ultimate Oscillator horizons and weights (Williams' 7/14/28 + 4/2/1).
_UO_WINS = (7, 14, 28)
_UO_WEIGHTS = (4.0, 2.0, 1.0)
# KST ROC horizons, their SMA smoothers, and weights (Pring's daily
# parameterization).
_KST_ROCS = (10, 15, 20, 30)
_KST_SMAS = (10, 10, 10, 15)
_KST_WEIGHTS = (1.0, 2.0, 3.0, 4.0)
# DPO lookback and its standard displacement (n/2 + 1 rows back).
_DPO_WIN = 20
_DPO_SHIFT = _DPO_WIN // 2 + 1


def _w(lo: int) -> Window:
    return (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(lo, Window.currentRow)
    )


@register(
    "q_win_ultimate_osc",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    tr AS (
      SELECT event_type, hour_id,
             lag(close) OVER w AS pc, high, low, close
      FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    bp AS (
      SELECT event_type, hour_id,
             {sql_dround("close - least(low, pc)", 6)} AS bp,
             {sql_dround(
                 "greatest(high, pc) - least(low, pc)", 6)} AS rng
      FROM tr WHERE pc IS NOT NULL
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w28 AS BIGINT) AS nbar,
             {" , ".join(
                 f'''CAST(sum(CAST(bp AS DECIMAL(25,6))) OVER w{n}
                       AS DOUBLE) AS bp{n},
                     CAST(sum(CAST(rng AS DECIMAL(25,6))) OVER w{n}
                       AS DOUBLE) AS rng{n}'''
                 for n in _UO_WINS
             )}
      FROM bp
      WINDOW {" , ".join(
          f'''w{n} AS (PARTITION BY event_type ORDER BY hour_id
                      ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)'''
          for n in _UO_WINS
      )}
    )
    SELECT event_type, hour_id,
           {sql_dround(
               "100.0 * ("
               "4.0 * (CASE WHEN rng7 = 0 THEN 0.0 ELSE bp7 / rng7 END)"
               " + 2.0 * (CASE WHEN rng14 = 0 THEN 0.0"
               "          ELSE bp14 / rng14 END)"
               " + 1.0 * (CASE WHEN rng28 = 0 THEN 0.0"
               "          ELSE bp28 / rng28 END)) / 7.0", 6,
           )} AS uo
    FROM rolled WHERE nbar = {_UO_WINS[-1]}
    """,
)
def q_win_ultimate_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams' Ultimate Oscillator per event type: buying pressure
    BP = close − min(low, prev close) and true range
    TR = max(high, prev close) − min(low, prev close), summed over the
    trailing 7/14/28 bars, blended 4:2:1 and scaled to [0, 100] —
    the three-horizon momentum confirmation that filters the
    single-window whipsaws RSI is prone to. A zero true-range sum
    (flat channel) contributes 0 on both sides (documented branch).

    Plan: one bar aggregate, one lag + three constant-width
    rolling-sum windows per type sharing ONE (event_type, hour_id)
    sort — time-grain bounded. Determinism: BP/TR are e6-rounded
    exact-pick arithmetic; the six rolling sums ride the decimal
    detour; the closing blend is e6-rounded with literal weights."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    tr = bars.select(
        "event_type",
        "hour_id",
        F.lag("close").over(wl).alias("pc"),
        "high",
        "low",
        "close",
    ).filter(F.col("pc").isNotNull())
    bp = tr.select(
        "event_type",
        "hour_id",
        dround(
            F.col("close") - F.least(F.col("low"), F.col("pc")), 6
        ).alias("bp"),
        dround(
            F.greatest(F.col("high"), F.col("pc"))
            - F.least(F.col("low"), F.col("pc")),
            6,
        ).alias("rng"),
    )
    cols = [F.col("event_type"), F.col("hour_id")]
    cols.append(
        F.count(F.lit(1))
        .over(_w(-(_UO_WINS[-1] - 1)))
        .cast("bigint")
        .alias("nbar")
    )
    for n in _UO_WINS:
        w = _w(-(n - 1))
        cols.append(
            F.sum(F.col("bp").cast("decimal(25,6)"))
            .over(w)
            .cast("double")
            .alias(f"bp{n}")
        )
        cols.append(
            F.sum(F.col("rng").cast("decimal(25,6)"))
            .over(w)
            .cast("double")
            .alias(f"rng{n}")
        )
    rolled = bp.select(*cols).filter(F.col("nbar") == _UO_WINS[-1])

    def ratio(n: int):
        return F.when(F.col(f"rng{n}") == 0, F.lit(0.0)).otherwise(
            F.col(f"bp{n}") / F.col(f"rng{n}")
        )

    blend = (
        _UO_WEIGHTS[0] * ratio(7)
        + _UO_WEIGHTS[1] * ratio(14)
        + _UO_WEIGHTS[2] * ratio(28)
    ) / sum(_UO_WEIGHTS)
    return rolled.select(
        "event_type",
        "hour_id",
        dround(100.0 * blend, 6).alias("uo"),
    )


@register(
    "q_win_kst",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    roc AS (
      SELECT event_type, hour_id,
             {" , ".join(
                 f"CASE WHEN lag(close, {r}) OVER w = 0 THEN NULL ELSE "
                 + sql_dround(
                     f"100.0 * (close / lag(close, {r}) OVER w - 1.0)", 6
                 )
                 + f" END AS roc{r}"
                 for r in _KST_ROCS
             )}
      FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    sm AS (
      SELECT event_type, hour_id,
             {" , ".join(
                 f'''CAST(count(roc{r}) OVER s{m} AS BIGINT) AS n{r},
                     CAST(sum(CAST(roc{r} AS DECIMAL(25,6))) OVER s{m}
                       AS DOUBLE) / {m} AS sma{r}'''
                 for r, m in zip(_KST_ROCS, _KST_SMAS)
             )}
      FROM roc
      WINDOW {" , ".join(
          f'''s{m} AS (PARTITION BY event_type ORDER BY hour_id
                      ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW)'''
          for m in sorted(set(_KST_SMAS))
      )}
    )
    SELECT event_type, hour_id,
           {sql_dround(
               " + ".join(
                   f"{wt} * sma{r}"
                   for r, wt in zip(_KST_ROCS, _KST_WEIGHTS)
               ), 6,
           )} AS kst
    FROM sm
    WHERE {" AND ".join(
        f"n{r} = {m}" for r, m in zip(_KST_ROCS, _KST_SMAS)
    )}
    """,
)
def q_win_kst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pring's Know Sure Thing per event type: four percentage rates
    of change (10/15/20/30 bars back), each SMA-smoothed
    (10/10/10/15), combined 1:2:3:4 — the long-swing momentum
    summation whose zero-line crossings time cycle turns. Emitted
    only where every smoother window is full (the q_win_macd
    full-window convention).

    Plan: one bar aggregate, four lag picks + four constant-width
    SMA windows per type, ALL sharing one (event_type, hour_id)
    sort → one exchange. Determinism: each ROC is an e6-rounded
    exact-pick ratio; a zero reference close (value = 0 bars exist
    from sf0.1 up) NULLs that ROC on both sides, and the full-window
    count filter then drops the affected rows identically; SMA sums
    ride the decimal detour; the weighted closing is e6-rounded with
    literal weights."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    roc_cols = [F.col("event_type"), F.col("hour_id")]
    for r in _KST_ROCS:
        lagc = F.lag("close", r).over(wl)
        roc_cols.append(
            F.when(lagc == 0, F.lit(None).cast("double"))
            .otherwise(dround(100.0 * (F.col("close") / lagc - 1.0), 6))
            .alias(f"roc{r}")
        )
    roc = bars.select(*roc_cols)
    sm_cols = [F.col("event_type"), F.col("hour_id")]
    for r, m in zip(_KST_ROCS, _KST_SMAS):
        w = _w(-(m - 1))
        sm_cols.append(
            F.count(F.col(f"roc{r}")).over(w).cast("bigint").alias(f"n{r}")
        )
        sm_cols.append(
            (
                F.sum(F.col(f"roc{r}").cast("decimal(25,6)"))
                .over(w)
                .cast("double")
                / m
            ).alias(f"sma{r}")
        )
    sm = roc.select(*sm_cols)
    cond = None
    for r, m in zip(_KST_ROCS, _KST_SMAS):
        c = F.col(f"n{r}") == m
        cond = c if cond is None else (cond & c)
    blend = None
    for r, wt in zip(_KST_ROCS, _KST_WEIGHTS):
        t = wt * F.col(f"sma{r}")
        blend = t if blend is None else (blend + t)
    return sm.filter(cond).select(
        "event_type", "hour_id", dround(blend, 6).alias("kst")
    )


@register(
    "q_win_dpo",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    sma AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER s AS BIGINT) AS nbar,
             CAST(sum(CAST(close AS DECIMAL(25,6))) OVER s AS DOUBLE)
               / {_DPO_WIN} AS sma20
      FROM bars
      WINDOW s AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_DPO_WIN - 1} PRECEDING AND CURRENT ROW)
    ),
    disp AS (
      SELECT event_type, hour_id, close, nbar,
             lag(sma20, {_DPO_SHIFT}) OVER w AS sma_disp,
             lag(nbar, {_DPO_SHIFT}) OVER w AS nbar_disp
      FROM sma WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    )
    SELECT event_type, hour_id,
           {sql_dround("sma_disp", 6)} AS sma_disp,
           {sql_dround("close - sma_disp", 6)} AS dpo
    FROM disp WHERE nbar_disp = {_DPO_WIN}
    """,
)
def q_win_dpo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended Price Oscillator per event type: the close minus the
    20-bar SMA displaced 11 rows back (n/2 + 1 — the standard
    construction that centers the average on the cycle it removes),
    isolating the sub-20-bar cycle component from the trend. Emitted
    only where the displaced window was full.

    Plan: one bar aggregate, one constant-width SMA window + one lag
    pick per type sharing one (event_type, hour_id) sort. ROW-based
    displacement (the q_win_ichimoku convention — deterministic on
    the bar sequence, no calendar arithmetic). Determinism: the SMA
    rides the decimal detour; the displaced pick is exact; the
    closing difference is e6-rounded."""
    bars = _hourly_close(spark, sf_dir)
    s = _w(-(_DPO_WIN - 1))
    sma = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(s).cast("bigint").alias("nbar"),
        (
            F.sum(F.col("close").cast("decimal(25,6)"))
            .over(s)
            .cast("double")
            / _DPO_WIN
        ).alias("sma20"),
    )
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    disp = sma.select(
        "event_type",
        "hour_id",
        "close",
        F.lag("sma20", _DPO_SHIFT).over(wl).alias("sma_disp"),
        F.lag("nbar", _DPO_SHIFT).over(wl).alias("nbar_disp"),
    ).filter(F.col("nbar_disp") == _DPO_WIN)
    return disp.select(
        "event_type",
        "hour_id",
        dround(F.col("sma_disp"), 6).alias("sma_disp"),
        dround(F.col("close") - F.col("sma_disp"), 6).alias("dpo"),
    )


# Fisher transform parameters: channel lookback and the clamp that
# keeps the transform finite on channel-edge bars.
_FISH_WIN = 10
_FISH_CLAMP = 0.999


@register(
    "q_win_fisher_transform",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    ch AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             max(high) OVER w AS hh, min(low) OVER w AS ll
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_FISH_WIN - 1} PRECEDING AND CURRENT ROW)
    ),
    x AS (
      SELECT event_type, hour_id,
             CASE WHEN hh = ll THEN 0.0 ELSE
               greatest(-{_FISH_CLAMP}, least({_FISH_CLAMP},
                 {sql_dround(
                     "2.0 * (close - ll) / (hh - ll) - 1.0", 6)}))
             END AS x
      FROM ch WHERE nbar = {_FISH_WIN}
    )
    SELECT event_type, hour_id, x,
           {sql_dround("0.5 * ln((1.0 + x) / (1.0 - x))", 6)} AS fisher
    FROM x
    """,
)
def q_win_fisher_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher transform of the close's position inside its 10-bar
    high/low channel per event type: x = 2·(C−LL)/(HH−LL) − 1 clamped
    to ±0.999, fisher = ½·ln((1+x)/(1−x)) — Ehlers' construction that
    maps the bounded channel position onto an approximately Gaussian
    variable, making extreme readings (|fisher| ≳ 2) genuine tail
    signals rather than artifacts of the bounded range. This is the
    UNSMOOTHED single-pass variant (the recursive EMA smoothing of
    the charting version would accumulate engine-ordered double
    error — the q_win_rsi Cutler-convention rationale, documented
    deviation).

    Plan: one bar aggregate, one constant-width channel window per
    type on the shared (event_type, hour_id) sort. Determinism: the
    channel position is e6-rounded then clamped with literal bounds
    (flat channels take the 0 branch), so the ln argument is exact
    and bounded away from 0; the closing ln is e6-rounded."""
    bars = _hourly_close(spark, sf_dir)
    w = _w(-(_FISH_WIN - 1))
    ch = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.max("high").over(w).alias("hh"),
        F.min("low").over(w).alias("ll"),
    ).filter(F.col("nbar") == _FISH_WIN)
    x = ch.select(
        "event_type",
        "hour_id",
        F.when(F.col("hh") == F.col("ll"), F.lit(0.0))
        .otherwise(
            F.greatest(
                F.lit(-_FISH_CLAMP),
                F.least(
                    F.lit(_FISH_CLAMP),
                    dround(
                        2.0
                        * (F.col("close") - F.col("ll"))
                        / (F.col("hh") - F.col("ll"))
                        - 1.0,
                        6,
                    ),
                ),
            )
        )
        .alias("x"),
    )
    return x.select(
        "event_type",
        "hour_id",
        "x",
        dround(
            0.5 * F.log((1.0 + F.col("x")) / (1.0 - F.col("x"))), 6
        ).alias("fisher"),
    )


# Choppiness lookback and the exact double literal for ln(2) (log2
# arrives as ln-ratio with a spelled constant).
_CHOP_WIN = 14
_LN2 = 0.6931471805599453


@register(
    "q_win_choppiness",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    tr AS (
      SELECT event_type, hour_id,
             {sql_dround(
                 "greatest(high, lag(close) OVER w)"
                 " - least(low, lag(close) OVER w)", 6)} AS tr,
             high, low
      FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(tr) OVER r AS BIGINT) AS nbar,
             CAST(sum(CAST(tr AS DECIMAL(25,6))) OVER r AS DOUBLE)
               AS tr_sum,
             max(high) OVER r AS hh, min(low) OVER r AS ll
      FROM tr
      WINDOW r AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_CHOP_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour_id,
           CASE WHEN hh = ll OR tr_sum <= 0 THEN NULL ELSE
             {sql_dround(
                 f"100.0 * (ln(tr_sum / (hh - ll)) / {_LN2})"
                 f" / (ln({float(_CHOP_WIN)}) / {_LN2})", 6)}
           END AS chop14
    FROM rolled WHERE nbar = {_CHOP_WIN}
    """,
)
def q_win_choppiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Choppiness Index per event type over 14 hourly bars:
    100·log₂(ΣTR / (HH−LL)) / log₂(14) — near 100 when the series
    churns sideways (true-range path ≫ net range), near 0 when it
    trends (path ≈ range). Dreiss' regime filter: the signal that
    tells the momentum family (KST/AO/UO) when NOT to trust itself.
    Flat channels (HH = LL — possible on constant-value hours) take
    the NULL branch on both sides. The series-first bar's TR is its
    plain high−low (greatest/least skip the NULL lag identically in
    both engines — and that IS the textbook first-bar True Range),
    so emission starts at the 14th bar.

    Plan: one bar aggregate, one lag + one constant-width window per
    type on the shared (event_type, hour_id) sort. Determinism: true
    ranges are e6-rounded exact picks summed via the decimal detour;
    log₂ is ln/ln2 with a spelled literal; the closing is e6-rounded."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    pc = F.lag("close").over(wl)
    tr = bars.select(
        "event_type",
        "hour_id",
        dround(
            F.greatest(F.col("high"), pc) - F.least(F.col("low"), pc), 6
        ).alias("tr"),
        "high",
        "low",
    )
    r = _w(-(_CHOP_WIN - 1))
    rolled = tr.select(
        "event_type",
        "hour_id",
        F.count("tr").over(r).cast("bigint").alias("nbar"),
        F.sum(F.col("tr").cast("decimal(25,6)"))
        .over(r)
        .cast("double")
        .alias("tr_sum"),
        F.max("high").over(r).alias("hh"),
        F.min("low").over(r).alias("ll"),
    ).filter(F.col("nbar") == _CHOP_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        F.when(
            (F.col("hh") == F.col("ll")) | (F.col("tr_sum") <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            dround(
                100.0
                * (
                    F.log(F.col("tr_sum") / (F.col("hh") - F.col("ll")))
                    / _LN2
                )
                / (math.log(float(_CHOP_WIN)) / _LN2),
                6,
            )
        )
        .alias("chop14"),
    )


@register(
    "q_win_ad_line",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    mf AS (
      SELECT event_type, hour_id,
             CASE WHEN high = low THEN 0.0
                  ELSE {sql_dround(
                      "((close - low) - (high - close)) / (high - low)"
                      " * vol", 6)}
             END AS mfv
      FROM bars
    )
    SELECT event_type, hour_id,
           CAST(sum(CAST(mfv AS DECIMAL(25,6))) OVER (
                  PARTITION BY event_type ORDER BY hour_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS ad_line
    FROM mf
    """,
)
def q_win_ad_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaikin Accumulation/Distribution line per event type: the
    running sum of each bar's money-flow volume
    ((C−L)−(H−C))/(H−L)·V — the cumulative companion to q_win_cmf's
    windowed ratio; price/A-D divergence is the classic distribution
    warning. Zero-range bars contribute exactly 0.

    Plan: one volume-carrying bar aggregate, ONE unbounded-preceding
    running sum PARTITIONED by type over |hours| rows (time-grain
    bounded — the q_win_running_frame class). Determinism: the
    money-flow term is e6-rounded before the decimal running sum, so
    every prefix is an exact decimal cast back to double."""
    from ex_hivent_spark.operators.finance import _hourly_vbars

    bars = _hourly_vbars(spark, sf_dir)
    mf = bars.select(
        "event_type",
        "hour_id",
        F.when(F.col("high") == F.col("low"), F.lit(0.0))
        .otherwise(
            dround(
                (
                    (F.col("close") - F.col("low"))
                    - (F.col("high") - F.col("close"))
                )
                / (F.col("high") - F.col("low"))
                * F.col("vol"),
                6,
            )
        )
        .alias("mfv"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return mf.select(
        "event_type",
        "hour_id",
        F.sum(F.col("mfv").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("ad_line"),
    )


# Relative Vigor Index lookback (SMA variant — the engine's
# no-EMA-recursion convention).
_RVI_WIN = 4


@register(
    "q_win_rvi",
    oracle=f"""
    WITH bars AS ({_SQL_OBARS}),
    t AS (
      SELECT event_type, hour_id,
             {sql_dround("close - open", 6)} AS co,
             {sql_dround("high - low", 6)} AS hl
      FROM bars
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER r AS BIGINT) AS nbar,
             CAST(sum(CAST(co AS DECIMAL(25,6))) OVER r AS DOUBLE)
               AS co_sum,
             CAST(sum(CAST(hl AS DECIMAL(25,6))) OVER r AS DOUBLE)
               AS hl_sum
      FROM t
      WINDOW r AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_RVI_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour_id, co_sum, hl_sum,
           CASE WHEN hl_sum <= 0 THEN NULL ELSE
             {sql_dround("co_sum / hl_sum", 6)}
           END AS rvi4
    FROM rolled WHERE nbar = {_RVI_WIN}
    """,
)
def q_win_rvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Vigor Index (SMA-4 variant) per event type: the ratio
    of the 4-bar close-minus-open sum to the 4-bar high-minus-low
    sum — "how much of the available range did the bulls actually
    capture". Positive and rising says closes keep beating opens
    (vigor); the sign-flip is Ehlers' entry trigger. The standard
    symmetric-weighted smoothing is replaced by the plain 4-bar SMA
    (the engine's q_win_rsi no-recursion convention, documented
    deviation). An all-flat window (ΣHL = 0) takes the NULL branch.

    Plan: ONE open-carrying bar aggregate (the q_win_garman_klass
    two-pick helper — both row_numbers share one sort), one
    constant-width window per type. Determinism: per-bar terms are
    e6-rounded exact picks; both rolling sums ride the decimal
    detour; the closing ratio is e6-rounded."""
    from ex_hivent_spark.operators.risk import _hourly_obars

    bars = _hourly_obars(spark, sf_dir)
    t = bars.select(
        "event_type",
        "hour_id",
        dround(F.col("close") - F.col("open"), 6).alias("co"),
        dround(F.col("high") - F.col("low"), 6).alias("hl"),
    )
    r = _w(-(_RVI_WIN - 1))
    rolled = t.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(r).cast("bigint").alias("nbar"),
        F.sum(F.col("co").cast("decimal(25,6)"))
        .over(r)
        .cast("double")
        .alias("co_sum"),
        F.sum(F.col("hl").cast("decimal(25,6)"))
        .over(r)
        .cast("double")
        .alias("hl_sum"),
    ).filter(F.col("nbar") == _RVI_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        "co_sum",
        "hl_sum",
        F.when(F.col("hl_sum") <= 0, F.lit(None).cast("double"))
        .otherwise(dround(F.col("co_sum") / F.col("hl_sum"), 6))
        .alias("rvi4"),
    )


# Kaufman efficiency-ratio lookback.
_ER_WIN = 10


@register(
    "q_win_efficiency_ratio",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    chg AS (
      SELECT event_type, hour_id, close,
             {sql_dround(
                 "abs(close - lag(close) OVER w)", 6)} AS step,
             lag(close, {_ER_WIN}) OVER w AS ref
      FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    rolled AS (
      SELECT event_type, hour_id, close, ref,
             CAST(count(step) OVER r AS BIGINT) AS nstep,
             CAST(sum(CAST(step AS DECIMAL(25,6))) OVER r AS DOUBLE)
               AS path
      FROM chg
      WINDOW r AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_ER_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour_id,
           {sql_dround("abs(close - ref)", 6)} AS net_move,
           {sql_dround("path", 6)} AS path_len,
           CASE WHEN path = 0 THEN NULL ELSE
             {sql_dround("abs(close - ref) / path", 6)}
           END AS er10
    FROM rolled WHERE nstep = {_ER_WIN} AND ref IS NOT NULL
    """,
)
def q_win_efficiency_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaufman Efficiency Ratio per event type over 10 hourly bars:
    |close_t − close_{{t−10}}| / Σ|Δclose| — 1 when price moved in a
    straight line, →0 when it churned — the signal-to-noise gauge
    that drives KAMA's adaptive smoothing (published here as the raw
    ratio: the engine's no-EMA-recursion convention). A zero path
    (ten identical closes) takes the NULL branch on both sides.

    Plan: one bar aggregate, one lag pair + one constant-width
    rolling-sum window per type on the shared (event_type, hour_id)
    sort. Determinism: per-bar steps are e6-rounded exact picks
    summed via the decimal detour; the net move is an exact-pick
    difference; the closing ratio is e6-rounded."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    chg = bars.select(
        "event_type",
        "hour_id",
        "close",
        dround(F.abs(F.col("close") - F.lag("close").over(wl)), 6).alias(
            "step"
        ),
        F.lag("close", _ER_WIN).over(wl).alias("ref"),
    )
    r = _w(-(_ER_WIN - 1))
    rolled = chg.select(
        "event_type",
        "hour_id",
        "close",
        "ref",
        F.count("step").over(r).cast("bigint").alias("nstep"),
        F.sum(F.col("step").cast("decimal(25,6)"))
        .over(r)
        .cast("double")
        .alias("path"),
    ).filter((F.col("nstep") == _ER_WIN) & F.col("ref").isNotNull())
    return rolled.select(
        "event_type",
        "hour_id",
        dround(F.abs(F.col("close") - F.col("ref")), 6).alias("net_move"),
        dround(F.col("path"), 6).alias("path_len"),
        F.when(F.col("path") == 0, F.lit(None).cast("double"))
        .otherwise(
            dround(F.abs(F.col("close") - F.col("ref")) / F.col("path"), 6)
        )
        .alias("er10"),
    )


# Stochastic-RSI lookback (textbook: same 14 as the RSI itself) and
# the Mass Index smoothing/summation windows (Dorsey's 9 and 25).
_SRSI_WIN = 14
_MI_SMA = 9
_MI_SUM = 25

# SQL twin of q_win_rsi's output frame (finance.py keeps the RSI
# oracle inline; this re-renders the identical CTE chain from the
# same _SQL_BARS + window constants so the two cannot drift in data,
# only — at worst — in text).
_SQL_RSI14 = f"""
    bars AS ({_SQL_BARS}),
    chg AS (
      SELECT event_type, hour_id, close,
             close - lag(close) OVER (PARTITION BY event_type
                                      ORDER BY hour_id) AS chg
      FROM bars
    ),
    gl AS (
      SELECT event_type, hour_id, close,
             CAST(count(chg) OVER w AS BIGINT) AS nchg,
             CAST(sum(CAST(greatest(chg, 0.0) AS DECIMAL(25,6)))
                  OVER w AS DOUBLE) AS ag,
             CAST(sum(CAST(greatest(-chg, 0.0) AS DECIMAL(25,6)))
                  OVER w AS DOUBLE) AS al
      FROM chg
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_SRSI_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    rsi AS (
      SELECT event_type, hour_id,
             CASE WHEN ag + al = 0 THEN 50.0
                  ELSE 100.0 * ag / (ag + al) END AS rsi14
      FROM gl WHERE nchg = {_SRSI_WIN}
    )
"""


@register(
    "q_win_stoch_rsi",
    oracle=f"""
    WITH {_SQL_RSI14},
    roll AS (
      SELECT event_type, hour_id, rsi14,
             CAST(count(*) OVER w AS BIGINT) AS nr,
             min(rsi14) OVER w AS lo,
             max(rsi14) OVER w AS hi
      FROM rsi
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_SRSI_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, rsi14,
           CASE WHEN hi = lo THEN 0.5
                ELSE {sql_dround("(rsi14 - lo) / (hi - lo)", 6)}
           END AS stoch_rsi14
    FROM roll WHERE nr = {_SRSI_WIN}
    """,
)
def q_win_stoch_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic RSI: the %K stochastic applied to the RSI series
    itself — (RSI − min₁₄RSI)/(max₁₄RSI − min₁₄RSI) — Chande &
    Kroll's normalization that reads momentum RELATIVE to its own
    recent range, firing overbought/oversold far earlier than raw RSI
    on range-bound series. A flat RSI window (max = min) reads
    neutral 0.5 (the q_win_rsi 50-convention carried through). Rows
    emit only where 14 RSI values fill the frame.

    Plan: composes q_win_rsi's frame directly (the same bar aggregate
    + chg/rolling windows — one extra min/max window over the
    already-|hours|-bounded RSI rows, sharing the (event_type,
    hour_id) sort). Determinism: rsi14 is a deterministic double
    (decimal-detour sums + one division); min/max picks are exact;
    the flat-window equality compares identical doubles; the closing
    ratio e6-rounds."""
    from ex_hivent_spark.operators.finance import q_win_rsi

    rsi = q_win_rsi(spark, sf_dir).select("event_type", "hour_id", "rsi14")
    w = _w(-(_SRSI_WIN - 1))
    roll = rsi.select(
        "event_type",
        "hour_id",
        "rsi14",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nr"),
        F.min("rsi14").over(w).alias("lo"),
        F.max("rsi14").over(w).alias("hi"),
    ).filter(F.col("nr") == _SRSI_WIN)
    lo, hi = F.col("lo"), F.col("hi")
    return roll.select(
        "event_type",
        "hour_id",
        "rsi14",
        F.when(hi == lo, F.lit(0.5))
        .otherwise(dround((F.col("rsi14") - lo) / (hi - lo), 6))
        .alias("stoch_rsi14"),
    )


@register(
    "q_win_mass_index",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    s1 AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS nb1,
             {sql_dround(
                 "CAST(sum(CAST(high - low AS DECIMAL(25,6))) OVER w"
                 f" AS DOUBLE) / {_MI_SMA}", 6)} AS sma1
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_MI_SMA - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    f1 AS (SELECT * FROM s1 WHERE nb1 = {_MI_SMA}),
    s2 AS (
      SELECT event_type, hour_id, sma1,
             CAST(count(*) OVER w AS BIGINT) AS nb2,
             {sql_dround(
                 "CAST(sum(CAST(sma1 AS DECIMAL(25,6))) OVER w"
                 f" AS DOUBLE) / {_MI_SMA}", 6)} AS sma2
      FROM f1
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_MI_SMA - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    f2 AS (
      SELECT event_type, hour_id,
             CASE WHEN sma2 = 0 THEN 1.0
                  ELSE {sql_dround("sma1 / sma2", 6)} END AS ratio
      FROM s2 WHERE nb2 = {_MI_SMA}
    ),
    s3 AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS nb3,
             {sql_dround(
                 "CAST(sum(CAST(ratio AS DECIMAL(25,6))) OVER w"
                 " AS DOUBLE)", 6)} AS mass25
      FROM f2
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_MI_SUM - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, mass25
    FROM s3 WHERE nb3 = {_MI_SUM}
    """,
)
def q_win_mass_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass Index (Dorsey) over the hourly bars, SMA variant: smooth
    the bar range (high − low) twice with 9-bar simple averages,
    take the smoothing ratio SMA₉(range)/SMA₉(SMA₉(range)), and sum
    it over 25 bars — range-expansion "bulges" above ~27 flag
    reversal setups regardless of direction. Dorsey's original uses
    EMAs; this engine's indicator family standardizes on SIMPLE
    averaging (the q_win_rsi/q_win_macd convention — SMA rides the
    decimal detour exactly where EMA recursion would accumulate
    engine-ordered double error), so the threshold calibrates
    slightly differently but the bulge shape is identical. An
    all-zero-range window (sma2 = 0, hence sma1 = 0) reads the
    neutral ratio 1.0. Rows emit only where every stage's frame is
    full (9 + 9 + 25 bars of warm-up).

    Plan: one bar aggregate, three chained constant-width windows
    over |hours| rows per type sharing one (event_type, hour_id)
    sort — time-grain bounded, traffic-invariant. Determinism: each
    stage e6-rounds BEFORE the next decimal re-aggregation; the ratio
    guard compares identically-derived doubles."""
    bars = _hourly_close(spark, sf_dir)
    w9 = _w(-(_MI_SMA - 1))
    rng = (F.col("high") - F.col("low")).cast("decimal(25,6)")
    s1 = bars.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(w9).cast("bigint").alias("nb1"),
        dround(
            F.sum(rng).over(w9).cast("double") / _MI_SMA, 6
        ).alias("sma1"),
    ).filter(F.col("nb1") == _MI_SMA)
    s2 = s1.select(
        "event_type",
        "hour_id",
        "sma1",
        F.count(F.lit(1)).over(w9).cast("bigint").alias("nb2"),
        dround(
            F.sum(F.col("sma1").cast("decimal(25,6)")).over(w9).cast("double")
            / _MI_SMA,
            6,
        ).alias("sma2"),
    ).filter(F.col("nb2") == _MI_SMA)
    f2 = s2.select(
        "event_type",
        "hour_id",
        F.when(F.col("sma2") == 0, F.lit(1.0))
        .otherwise(dround(F.col("sma1") / F.col("sma2"), 6))
        .alias("ratio"),
    )
    w25 = _w(-(_MI_SUM - 1))
    s3 = f2.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(w25).cast("bigint").alias("nb3"),
        dround(
            F.sum(F.col("ratio").cast("decimal(25,6)"))
            .over(w25)
            .cast("double"),
            6,
        ).alias("mass25"),
    ).filter(F.col("nb3") == _MI_SUM)
    return s3.select("event_type", "hour_id", "mass25")


# QStick SMA lookback (Chande's default 8) and the BOP smoother.
_QSTICK_WIN = 8
_BOP_WIN = 14


@register(
    "q_win_qstick",
    oracle=f"""
    WITH bars AS ({_SQL_OBARS}),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             {sql_dround(
                 "CAST(sum(CAST(close - open AS DECIMAL(25,6))) OVER w"
                 f" AS DOUBLE) / {_QSTICK_WIN}", 6)} AS qstick8
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_QSTICK_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, qstick8
    FROM rolled WHERE nbar = {_QSTICK_WIN}
    """,
)
def q_win_qstick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QStick (Chande): the 8-bar simple average of (close − open) —
    the candle-body momentum gauge: persistently positive bodies
    (closes above opens) read buying pressure regardless of the
    high/low wicks, the quantified version of "mostly green candles".
    Zero is the signal line.

    Plan: one open-carrying bar aggregate (risk.py's obars — both
    row_number picks share a sort), one constant-width rolling window
    per type over |hours| rows. Determinism: open/close are exact
    total-order picks, the body is one exact double subtraction, and
    the rolling mean rides the decimal detour then divides by the
    window literal and e6-rounds."""
    from ex_hivent_spark.operators.risk import _hourly_obars

    bars = _hourly_obars(spark, sf_dir)
    w = _w(-(_QSTICK_WIN - 1))
    body = (F.col("close") - F.col("open")).cast("decimal(25,6)")
    rolled = bars.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        dround(
            F.sum(body).over(w).cast("double") / _QSTICK_WIN, 6
        ).alias("qstick8"),
    ).filter(F.col("nbar") == _QSTICK_WIN)
    return rolled.select("event_type", "hour_id", "qstick8")


@register(
    "q_win_bop",
    oracle=f"""
    WITH bars AS ({_SQL_OBARS}),
    raw AS (
      SELECT event_type, hour_id,
             CASE WHEN high = low THEN 0.0
                  ELSE {sql_dround("(close - open) / (high - low)", 6)}
             END AS bop
      FROM bars
    ),
    rolled AS (
      SELECT event_type, hour_id, bop,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             {sql_dround(
                 "CAST(sum(CAST(bop AS DECIMAL(25,6))) OVER w"
                 f" AS DOUBLE) / {_BOP_WIN}", 6)} AS bop_sma14
      FROM raw
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_BOP_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, bop, bop_sma14
    FROM rolled WHERE nbar = {_BOP_WIN}
    """,
)
def q_win_bop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance of Power (Livermore/Arms): per bar,
    (close − open)/(high − low) — how much of the bar's full range
    the body captured, signed by direction (+1 = opened at the low
    and closed at the high) — with its standard 14-bar SMA smoothing.
    The intra-bar twin of q_win_cmf's multiplier (CMF weights the
    CLOSE's position by volume; BOP reads the OPEN→CLOSE traversal).
    A zero-range bar takes the documented 0.0 branch.

    Plan: one open-carrying bar aggregate, a per-row map, one rolling
    window per type — time-grain bounded. Determinism: the ratio is
    e6-rounded per row before its decimal rolling mean; the
    zero-range guard compares exact picks; the SMA divides by the
    window literal and e6-rounds."""
    from ex_hivent_spark.operators.risk import _hourly_obars

    bars = _hourly_obars(spark, sf_dir)
    raw = bars.select(
        "event_type",
        "hour_id",
        F.when(F.col("high") == F.col("low"), F.lit(0.0))
        .otherwise(
            dround(
                (F.col("close") - F.col("open"))
                / (F.col("high") - F.col("low")),
                6,
            )
        )
        .alias("bop"),
    )
    w = _w(-(_BOP_WIN - 1))
    rolled = raw.select(
        "event_type",
        "hour_id",
        "bop",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        dround(
            F.sum(F.col("bop").cast("decimal(25,6)")).over(w).cast("double")
            / _BOP_WIN,
            6,
        ).alias("bop_sma14"),
    ).filter(F.col("nbar") == _BOP_WIN)
    return rolled.select("event_type", "hour_id", "bop", "bop_sma14")
