"""Technical-indicator / long-memory diagnostics over the hourly bar
series: Cutler's RSI (simple-average relative strength), the Average
True Range volatility band, and the rescaled-range (R/S) Hurst
exponent — the indicator layer a metrics platform computes over the
OHLC bars that q_ts_ohlc_bars (operators/windows.py) produces, and the
classical "does this series have long memory?" probe (Hurst ≈ 0.5 for
a random walk, > 0.5 for trending load).

Plan discipline: every series is pre-aggregated to the (event_type,
hour) grain FIRST — windows run over time-grain-bounded frames
partitioned by event_type, never a global sort, so the plans hold at
any event volume (hours grow with retention, not traffic).

Determinism: bar closes are unique picks by the (ts, event_id) total
order; rolling sums ride the decimal detour INSIDE the window frame
(a 14-term double sum is still order-sensitive across engines);
cumulative deviations build on exact integer cumulative counts; each
libm call (sqrt, ln) is e6-rounded on both sides.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no indicator surface; these derive from the
driver's analytics mandate and standard technical-analysis practice
(RSI per Cutler's SMA variant; R/S per Hurst/Mandelbrot).
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
# The events table spans this fixed 720-hour month at every SF.
_N_HOURS = 720
# Indicator lookback, in hourly bars (the textbook default period).
_RSI_WIN = 14
# R/S block sizes: powers of two so log2(n) is an exact small integer
# on the regression x-axis.
_HURST_SIZES = (8, 16, 32, 64)


def _hourly_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, hour) bar close/high/low — last value by the
    (ts, event_id) total order, exactly q_ts_ohlc_bars' pick."""
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
    wd = Window.partitionBy("event_type", "hour_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rn = base.select("*", F.row_number().over(wd).alias("rnd"))
    return rn.groupBy("event_type", "hour_id").agg(
        F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
    )


_SQL_BARS = """
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             max(CASE WHEN rnd = 1 THEN value END) AS close,
             max(value) AS high, min(value) AS low
      FROM (
        SELECT event_type, ts, event_id, value,
               row_number() OVER (
                 PARTITION BY event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                 ORDER BY ts DESC, event_id DESC) AS rnd
        FROM events
      )
      GROUP BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
"""


@register(
    "q_win_rsi",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
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
                   ROWS BETWEEN {_RSI_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close,
           CASE WHEN ag + al = 0 THEN 50.0
                ELSE 100.0 * ag / (ag + al) END AS rsi14
    FROM gl WHERE nchg = {_RSI_WIN}
    """,
)
def q_win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI-14 over the hourly close series per event type:
    RSI = 100·ΣGain₁₄ / (ΣGain₁₄ + ΣLoss₁₄) on simple (not Wilder
    recursive) averages — the momentum oscillator flagging overbought
    (>70) / oversold (<30) hours, SMA-based so the statistic is a pure
    sliding-window expression with no unbounded recursion. Rows only
    where 14 one-hour changes fill the frame; a flat window (all
    changes zero) reads neutral 50.

    Plan: events collapse to hourly bars first (the q_ts_ohlc_bars
    hash aggregate); the change lag and the rolling gain/loss sums run
    over |hours| rows partitioned by type — time-grain bounded, never
    a global window. Determinism: closes are unique total-order picks,
    gains/losses are exact double subtractions, and the 14-term
    rolling sums ride the decimal detour inside the frame; the closing
    ratio is a single deterministic double division (no libm)."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    chg = bars.select(
        "event_type",
        "hour_id",
        "close",
        (F.col("close") - F.lag("close").over(wl)).alias("chg"),
    )
    w = wl.rowsBetween(-(_RSI_WIN - 1), Window.currentRow)
    c = F.col("chg")
    gl = chg.select(
        "event_type",
        "hour_id",
        "close",
        F.count("chg").over(w).cast("bigint").alias("nchg"),
        F.sum(F.greatest(c, F.lit(0.0)).cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("ag"),
        F.sum(F.greatest(-c, F.lit(0.0)).cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("al"),
    ).filter(F.col("nchg") == _RSI_WIN)
    ag, al = F.col("ag"), F.col("al")
    return gl.select(
        "event_type",
        "hour_id",
        "close",
        F.when(ag + al == 0, F.lit(50.0))
        .otherwise(100.0 * ag / (ag + al))
        .alias("rsi14"),
    )


@register(
    "q_win_atr",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    tr AS (
      SELECT event_type, hour_id,
             CASE WHEN lag(close) OVER w IS NULL THEN high - low
                  ELSE greatest(high - low,
                                abs(high - lag(close) OVER w),
                                abs(low - lag(close) OVER w)) END AS tr
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    rolled AS (
      SELECT event_type, hour_id, tr,
             CAST(count(*) OVER f AS BIGINT) AS n,
             CAST(sum(CAST(tr AS DECIMAL(25,6))) OVER f AS DOUBLE) AS s
      FROM tr
      WINDOW f AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_RSI_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, tr, s / n AS atr14
    FROM rolled WHERE n = {_RSI_WIN}
    """,
)
def q_win_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range (ATR-14) over the hourly bars per event
    type: TR = max(high−low, |high−prevClose|, |low−prevClose|) — the
    gap-aware volatility measure (an intra-bar range alone misses
    overnight jumps) — smoothed by a simple 14-bar average. The first
    bar's TR degrades to high−low (no previous close), the textbook
    convention.

    Plan: hourly-bar aggregate, then one lag and one rolling sum over
    |hours| rows partitioned by type (time-grain bounded). Determinism:
    TR is exact double max/abs arithmetic on unique bar picks; the
    rolling sum rides the decimal detour; ATR is one deterministic
    division (no libm)."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    pc = F.lag("close").over(wl)
    tr = bars.select(
        "event_type",
        "hour_id",
        F.when(pc.isNull(), F.col("high") - F.col("low"))
        .otherwise(
            F.greatest(
                F.col("high") - F.col("low"),
                F.abs(F.col("high") - pc),
                F.abs(F.col("low") - pc),
            )
        )
        .alias("tr"),
    )
    f = wl.rowsBetween(-(_RSI_WIN - 1), Window.currentRow)
    rolled = tr.select(
        "event_type",
        "hour_id",
        "tr",
        F.count(F.lit(1)).over(f).cast("bigint").alias("n"),
        F.sum(F.col("tr").cast("decimal(25,6)"))
        .over(f)
        .cast("double")
        .alias("s"),
    ).filter(F.col("n") == _RSI_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        "tr",
        (F.col("s") / F.col("n")).alias("atr14"),
    )


@register(
    "q_ts_hurst_rs",
    oracle=f"""
    WITH obs AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) - {_EPOCH_H}
               AS hoff,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    hourly AS (
      SELECT t.event_type, g.hoff,
             CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS hoff
                  FROM range({_N_HOURS})) g
      LEFT JOIN obs o
        ON o.event_type = t.event_type AND o.hoff = g.hoff
    ),
    sized AS (
      SELECT h.event_type, h.hoff, h.x, s.n,
             CAST(floor(h.hoff / s.n) AS BIGINT) AS blk,
             h.hoff % s.n + 1 AS i
      FROM hourly h
      CROSS JOIN (SELECT unnest([{", ".join(str(n) for n in _HURST_SIZES)}])
                    AS n) s
    ),
    cum AS (
      SELECT event_type, n, blk, i, x,
             CAST(sum(x) OVER (PARTITION BY event_type, n, blk
                               ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cx,
             CAST(sum(x) OVER (PARTITION BY event_type, n, blk)
                  AS BIGINT) AS sx,
             CAST(sum(x * x) OVER (PARTITION BY event_type, n, blk)
                  AS BIGINT) AS sxx,
             CAST(count(*) OVER (PARTITION BY event_type, n, blk)
                  AS BIGINT) AS cnt
      FROM sized
    ),
    dev AS (
      SELECT event_type, n, blk,
             CAST(cx AS DOUBLE)
               - i * (CAST(sx AS DOUBLE) / n) AS d,
             CAST(sx AS DOUBLE) / n AS mu,
             CAST(sxx AS DOUBLE) / n AS msq
      FROM cum WHERE cnt = n
    ),
    blocks AS (
      SELECT event_type, n, blk,
             max(d) - min(d) AS r,
             {sql_dround(
                 "sqrt(greatest(max(msq) - max(mu) * max(mu), 0))", 6
             )} AS s
      FROM dev GROUP BY event_type, n, blk
    ),
    rs AS (
      SELECT event_type, n,
             CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(CAST(r / s AS DECIMAL(25,6))) AS DOUBLE)
               / count(*) AS avg_rs
      FROM blocks WHERE s > 0 GROUP BY event_type, n
    ),
    pts AS (
      SELECT event_type, n_blocks,
             {sql_dround("ln(CAST(n AS DOUBLE))", 6)} AS lx,
             {sql_dround("ln(avg_rs)", 6)} AS ly
      FROM rs
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
           {sql_dround(
               "(k * sxy - sx * sy) / (k * sxx - sx * sx)", 6
           )} AS hurst
    FROM fit ORDER BY event_type
    """,
)
def q_ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) Hurst exponent of the hourly event-count
    series per type — the long-memory diagnostic (H ≈ 0.5 random walk,
    H > 0.5 persistent/trending load, H < 0.5 mean-reverting): for
    block sizes n ∈ {8,16,32,64} hours, each COMPLETE block's range of
    mean-adjusted cumulative deviations R is divided by its population
    sigma S; H is the OLS slope of ln(avg R/S) against ln(n).

    Plan: the stream collapses to the hourly count grain, DENSIFIED
    onto the fixed 720-hour month spine with zero fill (the
    q_ts_spearman_corr spine discipline — gap hours are real zero
    observations of the load series, and complete blocks exist at
    every SF); the 4× size fan-out and the per-(type, n, block)
    cumulative windows run over |hours|·4 rows — time-grain bounded,
    every window partitioned by (type, n, block). The spine-tail
    blocks that 720/n leaves incomplete are dropped via the per-block
    count, zero-sigma (dead) blocks via s > 0 — both sides
    identically. Determinism: cumulative sums are exact integers;
    deviations are per-row double arithmetic on them; the sigma sqrt
    and both logs (the only libm) are e6-rounded; block averages and
    the 4-point OLS sums ride the decimal detour."""
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type",
        (
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
            - F.lit(_EPOCH_H)
        ).alias("hoff"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(_N_HOURS).select(
                    F.col("id").cast("bigint").alias("hoff")
                )
            )
        )
    )
    hourly = spine.join(obs, ["event_type", "hoff"], "left").select(
        "event_type",
        "hoff",
        F.coalesce("x", F.lit(0)).cast("bigint").alias("x"),
    )
    sizes = F.array(*[F.lit(n) for n in _HURST_SIZES])
    sized = hourly.select(
        "*", F.explode(sizes).alias("n")
    ).select(
        "event_type",
        "n",
        F.floor(F.col("hoff") / F.col("n")).cast("bigint").alias("blk"),
        (F.col("hoff") % F.col("n") + 1).alias("i"),
        "x",
    )
    wb = Window.partitionBy("event_type", "n", "blk")
    wc = wb.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sized.select(
        "event_type",
        "n",
        "blk",
        "i",
        F.sum("x").over(wc).cast("bigint").alias("cx"),
        F.sum("x").over(wb).cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(wb).cast("bigint").alias("sxx"),
        F.count(F.lit(1)).over(wb).cast("bigint").alias("cnt"),
    ).filter(F.col("cnt") == F.col("n"))
    mu = F.col("sx").cast("double") / F.col("n")
    dev = cum.select(
        "event_type",
        "n",
        "blk",
        (F.col("cx").cast("double") - F.col("i") * mu).alias("d"),
        mu.alias("mu"),
        (F.col("sxx").cast("double") / F.col("n")).alias("msq"),
    )
    blocks = dev.groupBy("event_type", "n", "blk").agg(
        (F.max("d") - F.min("d")).alias("r"),
        dround(
            F.sqrt(
                F.greatest(
                    F.max("msq") - F.max("mu") * F.max("mu"),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("s"),
    )
    rs = (
        blocks.filter(F.col("s") > 0)
        .groupBy("event_type", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            (
                F.sum(
                    (F.col("r") / F.col("s")).cast("decimal(25,6)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_rs"),
        )
    )
    pts = rs.select(
        "event_type",
        "n_blocks",
        dround(F.log(F.col("n").cast("double")), 6).alias("lx"),
        dround(F.log(F.col("avg_rs")), 6).alias("ly"),
    )
    d6 = "decimal(25,6)"
    fit = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_blocks").cast("bigint").alias("n_blocks_total"),
        F.sum(F.col("lx").cast(d6)).cast("double").alias("sx"),
        F.sum(F.col("ly").cast(d6)).cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast(d6))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast(d6))
        .cast("double")
        .alias("sxx"),
    )
    k = F.col("k")
    return fit.select(
        "event_type",
        "n_blocks_total",
        dround(
            (k * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (k * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("hurst"),
    ).orderBy("event_type")


# VWAP trailing window, in hourly bars.
_VWAP_WIN = 24


@register(
    "q_win_vwap",
    oracle=f"""
    WITH bars AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             CAST(count(*) AS BIGINT) AS vol,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS pv
      FROM events GROUP BY 1, 2
    ),
    rolled AS (
      SELECT event_type, hour_id, vol, pv,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             CAST(sum(CAST(pv AS DECIMAL(25,6))) OVER w AS DOUBLE) AS spv,
             CAST(sum(vol) OVER w AS BIGINT) AS svol
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_VWAP_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, vol,
           spv / svol AS vwap24,
           pv / vol AS bar_avg
    FROM rolled WHERE nbar = {_VWAP_WIN}
    """,
)
def q_win_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-bar volume-weighted average price per event type:
    VWAP = Σ(Σvalue per bar) / Σ(count per bar) over the trailing day
    of hourly bars — the execution-quality benchmark (is the current
    bar's average rich or cheap against the day's flow?), emitted next
    to the single-bar average for the spread readout. Rows only where
    the trailing frame is full.

    Plan: one hash aggregate to hourly (value-sum, count) bars, one
    rolling window over |hours| rows partitioned by type (time-grain
    bounded). Determinism: bar sums and the rolling value-sum ride the
    decimal detour, volumes are exact integers, and both closings are
    single deterministic double divisions (no libm)."""
    e = load_table(spark, sf_dir, "events")
    bars = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600)
        .cast("bigint")
        .alias("hour_id"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("vol"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("pv"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_VWAP_WIN - 1), Window.currentRow)
    )
    rolled = bars.select(
        "event_type",
        "hour_id",
        "vol",
        "pv",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.sum(F.col("pv").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("spv"),
        F.sum("vol").over(w).cast("bigint").alias("svol"),
    ).filter(F.col("nbar") == _VWAP_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        "vol",
        (F.col("spv") / F.col("svol")).alias("vwap24"),
        (F.col("pv") / F.col("vol")).alias("bar_avg"),
    )


@register(
    "q_win_pivot_points",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             max(value) AS high, min(value) AS low,
             max(CASE WHEN rnd = 1 THEN value END) AS close
      FROM (
        SELECT event_type, ts, value,
               row_number() OVER (
                 PARTITION BY event_type, CAST(ts AS DATE)
                 ORDER BY ts DESC, event_id DESC) AS rnd
        FROM events
      )
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    shifted AS (
      SELECT event_type, day,
             lag(high) OVER w AS ph,
             lag(low) OVER w AS pl,
             lag(close) OVER w AS pc
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day,
           (ph + pl + pc) / 3.0 AS pivot,
           2.0 * ((ph + pl + pc) / 3.0) - pl AS r1,
           2.0 * ((ph + pl + pc) / 3.0) - ph AS s1,
           (ph + pl + pc) / 3.0 + (ph - pl) AS r2,
           (ph + pl + pc) / 3.0 - (ph - pl) AS s2
    FROM shifted WHERE ph IS NOT NULL
    ORDER BY event_type, day
    """,
)
def q_win_pivot_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic floor-trader pivot levels per (event type, day) from the
    PREVIOUS day's high/low/close: P = (H+L+C)/3, first/second
    resistance and support bands — the pre-computed intraday reference
    grid a monitoring dashboard draws before the day starts (the
    static twin of q_win_bollinger_bands' rolling bands).

    Plan: one hash aggregate to daily bars (close picked by the
    (ts, event_id) total order), one lag over |days| rows partitioned
    by type. Determinism: bar extrema and the unique close pick are
    exact; every level is per-row IEEE arithmetic written identically
    both sides (no libm, no aggregation of doubles)."""
    e = load_table(spark, sf_dir, "events")
    wd = Window.partitionBy(
        "event_type", F.col("ts").cast("date")
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    daily = (
        e.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            "value",
            F.row_number().over(wd).alias("rnd"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias(
                "close"
            ),
        )
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    shifted = daily.select(
        "event_type",
        "day",
        F.lag("high").over(wl).alias("ph"),
        F.lag("low").over(wl).alias("pl"),
        F.lag("close").over(wl).alias("pc"),
    ).filter(F.col("ph").isNotNull())
    p = (F.col("ph") + F.col("pl") + F.col("pc")) / 3.0
    return shifted.select(
        "event_type",
        "day",
        p.alias("pivot"),
        (2.0 * p - F.col("pl")).alias("r1"),
        (2.0 * p - F.col("ph")).alias("s1"),
        (p + (F.col("ph") - F.col("pl"))).alias("r2"),
        (p - (F.col("ph") - F.col("pl"))).alias("s2"),
    ).orderBy("event_type", "day")


# Donchian channel lookback, in hourly bars.
_DON_WIN = 20


@register(
    "q_win_donchian",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    chan AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             max(high) OVER w AS upper_ch,
             min(low) OVER w AS lower_ch
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_DON_WIN} PRECEDING
                   AND 1 PRECEDING)
    )
    SELECT event_type, hour_id, close, upper_ch, lower_ch,
           (upper_ch + lower_ch) / 2.0 AS mid_ch,
           CAST(CASE WHEN close > upper_ch THEN 1
                     WHEN close < lower_ch THEN -1
                     ELSE 0 END AS INTEGER) AS breakout
    FROM chan WHERE nbar = {_DON_WIN}
    """,
)
def q_win_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel breakout per event type: the 20-bar trailing
    high/low channel EXCLUDING the current bar (frame [-20, -1] — the
    channel a breakout is judged against must not contain the bar
    being judged), the mid line, and a +1/−1/0 breakout signal when
    the close escapes the channel — the classic turtle-trader
    volatility-regime detector, useful on metric streams as a
    distribution-free "new local extreme" alarm.

    Plan: hourly-bar aggregate, one rolling extremes window over
    |hours| rows partitioned by type (time-grain bounded).
    Determinism: extremes of exact bar values, one exact mid-point
    division, integer signal — no libm, no double aggregation."""
    bars = _hourly_close(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-_DON_WIN, -1)
    )
    chan = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.max("high").over(w).alias("upper_ch"),
        F.min("low").over(w).alias("lower_ch"),
    ).filter(F.col("nbar") == _DON_WIN)
    return chan.select(
        "event_type",
        "hour_id",
        "close",
        "upper_ch",
        "lower_ch",
        ((F.col("upper_ch") + F.col("lower_ch")) / 2.0).alias("mid_ch"),
        F.when(F.col("close") > F.col("upper_ch"), 1)
        .when(F.col("close") < F.col("lower_ch"), -1)
        .otherwise(0)
        .cast("int")
        .alias("breakout"),
    )


# MACD lookbacks, in hourly bars (fast/slow/signal periods).
_MACD_FAST = 8
_MACD_SLOW = 24
_MACD_SIG = 9


@register(
    "q_win_macd",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    ma AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER ws AS BIGINT) AS nslow,
             CAST(sum(CAST(close AS DECIMAL(25,6))) OVER wf AS DOUBLE)
                 / {_MACD_FAST} AS fast_ma,
             CAST(sum(CAST(close AS DECIMAL(25,6))) OVER ws AS DOUBLE)
                 / {_MACD_SLOW} AS slow_ma
      FROM bars
      WINDOW wf AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_MACD_FAST - 1} PRECEDING
                    AND CURRENT ROW),
             ws AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_MACD_SLOW - 1} PRECEDING
                    AND CURRENT ROW)
    ),
    line AS (
      SELECT event_type, hour_id, close,
             {sql_dround("fast_ma - slow_ma", 6)} AS macd
      FROM ma WHERE nslow = {_MACD_SLOW}
    ),
    sig AS (
      SELECT event_type, hour_id, close, macd,
             CAST(count(*) OVER w AS BIGINT) AS nsig,
             CAST(sum(CAST(macd AS DECIMAL(25,6))) OVER w AS DOUBLE)
                 / {_MACD_SIG} AS sig_raw
      FROM line
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_MACD_SIG - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close, macd,
           {sql_dround("sig_raw", 6)} AS signal_line,
           {sql_dround(f"macd - ({sql_dround('sig_raw', 6)})", 6)}
               AS histogram
    FROM sig WHERE nsig = {_MACD_SIG}
    """,
)
def q_win_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD oscillator per event type over the hourly close series —
    Cutler-style SIMPLE-average variant (fast SMA-8 minus slow SMA-24,
    signal = SMA-9 of the line, histogram = line minus signal), the
    same SMA-for-EMA substitution q_win_rsi makes: simple averages
    ride the decimal detour exactly, where Wilder's recursive EMA
    would accumulate engine-ordered double error. The histogram's sign
    flip is the classic momentum-crossover alarm on a metric stream.

    Plan: hourly-bar hash aggregate, then two window passes over the
    SAME (event_type, hour_id) sort — Catalyst plans one exchange and
    reuses the sort; frames are constant-width rows-frames over
    |hours| rows per type (time-grain bounded, traffic-invariant).
    Determinism: bar closes are unique total-order picks; every
    rolling sum is decimal-cast; divisions are by integer literals;
    every emitted float is e6-rounded on both sides (macd is rounded
    BEFORE the signal window, so both engines aggregate identical
    inputs). Rows emit only where both frames are full."""
    bars = _hourly_close(spark, sf_dir)
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_MACD_FAST - 1), Window.currentRow)
    )
    ws = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_MACD_SLOW - 1), Window.currentRow)
    )
    ma = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(ws).cast("bigint").alias("nslow"),
        (
            F.sum(F.col("close").cast("decimal(25,6)")).over(wf).cast("double")
            / _MACD_FAST
        ).alias("fast_ma"),
        (
            F.sum(F.col("close").cast("decimal(25,6)")).over(ws).cast("double")
            / _MACD_SLOW
        ).alias("slow_ma"),
    )
    line = ma.filter(F.col("nslow") == _MACD_SLOW).select(
        "event_type",
        "hour_id",
        "close",
        dround(F.col("fast_ma") - F.col("slow_ma"), 6).alias("macd"),
    )
    wsig = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_MACD_SIG - 1), Window.currentRow)
    )
    sig = line.select(
        "event_type",
        "hour_id",
        "close",
        "macd",
        F.count(F.lit(1)).over(wsig).cast("bigint").alias("nsig"),
        (
            F.sum(F.col("macd").cast("decimal(25,6)"))
            .over(wsig)
            .cast("double")
            / _MACD_SIG
        ).alias("sig_raw"),
    ).filter(F.col("nsig") == _MACD_SIG)
    sig_r = dround(F.col("sig_raw"), 6)
    return sig.select(
        "event_type",
        "hour_id",
        "close",
        "macd",
        sig_r.alias("signal_line"),
        dround(F.col("macd") - sig_r, 6).alias("histogram"),
    )


# Stochastic-oscillator lookbacks, in hourly bars (%K period, %D SMA).
_STOCH_K = 14
_STOCH_D = 3


@register(
    "q_win_stochastic",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    chan AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             max(high) OVER w AS hh,
             min(low) OVER w AS ll
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_STOCH_K - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    pk AS (
      SELECT event_type, hour_id, close,
             CASE WHEN hh = ll THEN 50.0
                  ELSE {sql_dround(
                      "100.0 * (close - ll) / (hh - ll)", 6)}
             END AS pct_k
      FROM chan WHERE nbar = {_STOCH_K}
    ),
    pd AS (
      SELECT event_type, hour_id, close, pct_k,
             CAST(count(*) OVER w AS BIGINT) AS nd,
             CAST(sum(CAST(pct_k AS DECIMAL(25,6))) OVER w AS DOUBLE)
                 / {_STOCH_D} AS pd_raw
      FROM pk
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_STOCH_D - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close, pct_k,
           {sql_dround("pd_raw", 6)} AS pct_d
    FROM pd WHERE nd = {_STOCH_D}
    """,
)
def q_win_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator per event type: %K = 100·(close − LL₁₄) /
    (HH₁₄ − LL₁₄) over the trailing 14 hourly bars (50.0 on a flat
    channel, the indifference convention) and %D = SMA-3 of %K — the
    range-position momentum gauge (where in its recent range did the
    series close?), distribution-free like q_win_donchian but graded
    rather than binary.

    Plan: hourly-bar hash aggregate, two window passes over the same
    (event_type, hour_id) sort — one exchange, constant rows-frames,
    |hours|-bounded per type. Determinism: channel extrema are exact
    picks of bar values, %K is one e6-rounded IEEE expression (the
    flat-channel case never divides), %D decimal-sums the ALREADY
    e6-rounded %K so both engines aggregate identical inputs. Rows
    emit only where both frames are full."""
    bars = _hourly_close(spark, sf_dir)
    wk = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_STOCH_K - 1), Window.currentRow)
    )
    chan = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(wk).cast("bigint").alias("nbar"),
        F.max("high").over(wk).alias("hh"),
        F.min("low").over(wk).alias("ll"),
    ).filter(F.col("nbar") == _STOCH_K)
    pk = chan.select(
        "event_type",
        "hour_id",
        "close",
        F.when(F.col("hh") == F.col("ll"), F.lit(50.0))
        .otherwise(
            dround(
                100.0
                * (F.col("close") - F.col("ll"))
                / (F.col("hh") - F.col("ll")),
                6,
            )
        )
        .alias("pct_k"),
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_STOCH_D - 1), Window.currentRow)
    )
    pd = pk.select(
        "event_type",
        "hour_id",
        "close",
        "pct_k",
        F.count(F.lit(1)).over(wd).cast("bigint").alias("nd"),
        (
            F.sum(F.col("pct_k").cast("decimal(25,6)"))
            .over(wd)
            .cast("double")
            / _STOCH_D
        ).alias("pd_raw"),
    ).filter(F.col("nd") == _STOCH_D)
    return pd.select(
        "event_type",
        "hour_id",
        "close",
        "pct_k",
        dround(F.col("pd_raw"), 6).alias("pct_d"),
    )


@register(
    "q_ts_obv",
    oracle="""
    WITH bars AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             CAST(count(*) AS BIGINT) AS vol,
             max(CASE WHEN rnd = 1 THEN value END) AS close
      FROM (
        SELECT event_type, ts, event_id, value,
               row_number() OVER (
                 PARTITION BY event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                 ORDER BY ts DESC, event_id DESC) AS rnd
        FROM events
      )
      GROUP BY 1, 2
    ),
    flow AS (
      SELECT event_type, hour_id, vol, close,
             CAST(CASE
               WHEN lag(close) OVER w IS NULL THEN 0
               WHEN close > lag(close) OVER w THEN vol
               WHEN close < lag(close) OVER w THEN -vol
               ELSE 0 END AS BIGINT) AS signed_flow
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    )
    SELECT event_type, hour_id, vol, signed_flow,
           CAST(sum(signed_flow) OVER (
             PARTITION BY event_type ORDER BY hour_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS obv
    FROM flow
    """,
)
def q_ts_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume per event type over hourly bars: each bar
    contributes +volume / −volume / 0 by the sign of its close-to-close
    change (first bar contributes 0), cumulated into the running OBV —
    the classic does-volume-confirm-the-trend accumulation gauge, here
    reading 'is rising metric level carried by rising event flow?'.

    Plan: hourly-bar hash aggregate (count + total-order close pick),
    one lag + one running integer sum over the SAME (event_type,
    hour_id) sort — one exchange; the cumulative frame is bounded by
    the time grain (|hours| rows per type grows with retention, not
    traffic; at multi-year retention the prefix fold in
    operators/prefix.py is the drop-in replacement, cf.
    q_quality_sequence_gaps). Determinism: volumes are exact integers,
    the sign compares exact bar closes, and the running sum is pure
    BIGINT arithmetic — no floats anywhere past the close pick."""
    e = load_table(spark, sf_dir, "events")
    wd = Window.partitionBy("event_type", "hour_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = e.select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hour_id"),
        "ts",
        "event_id",
        "value",
    )
    bars = (
        base.select("*", F.row_number().over(wd).alias("rnd"))
        .groupBy("event_type", "hour_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vol"),
            F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        )
    )
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    prev = F.lag("close").over(wl)
    flow = bars.select(
        "event_type",
        "hour_id",
        "vol",
        "close",
        F.when(prev.isNull(), F.lit(0))
        .when(F.col("close") > prev, F.col("vol"))
        .when(F.col("close") < prev, -F.col("vol"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("signed_flow"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flow.select(
        "event_type",
        "hour_id",
        "vol",
        "signed_flow",
        F.sum("signed_flow").over(wc).cast("bigint").alias("obv"),
    )


# Ichimoku periods, in hourly bars (tenkan/kijun/senkou-B), and the
# cloud displacement.
_ICHI_T = 9
_ICHI_K = 26
_ICHI_B = 52
_ICHI_SHIFT = 26


@register(
    "q_win_ichimoku",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    mids AS (
      SELECT event_type, hour_id, close,
             CASE WHEN CAST(count(*) OVER wt AS BIGINT) = {_ICHI_T}
                  THEN (max(high) OVER wt + min(low) OVER wt) / 2.0
             END AS tenkan,
             CASE WHEN CAST(count(*) OVER wk AS BIGINT) = {_ICHI_K}
                  THEN (max(high) OVER wk + min(low) OVER wk) / 2.0
             END AS kijun,
             CASE WHEN CAST(count(*) OVER wb AS BIGINT) = {_ICHI_B}
                  THEN (max(high) OVER wb + min(low) OVER wb) / 2.0
             END AS mid_b
      FROM bars
      WINDOW wt AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_ICHI_T - 1} PRECEDING AND CURRENT ROW),
             wk AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_ICHI_K - 1} PRECEDING AND CURRENT ROW),
             wb AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_ICHI_B - 1} PRECEDING AND CURRENT ROW)
    ),
    shifted AS (
      SELECT event_type, hour_id, close, tenkan, kijun,
             lag((tenkan + kijun) / 2.0, {_ICHI_SHIFT}) OVER w AS senkou_a,
             lag(mid_b, {_ICHI_SHIFT}) OVER w AS senkou_b,
             lead(close, {_ICHI_SHIFT}) OVER w AS chikou
      FROM mids
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    )
    SELECT event_type, hour_id, close, tenkan, kijun,
           senkou_a, senkou_b, chikou
    FROM shifted
    WHERE tenkan IS NOT NULL AND kijun IS NOT NULL
      AND senkou_a IS NOT NULL AND senkou_b IS NOT NULL
      AND chikou IS NOT NULL
    """,
)
def q_win_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ichimoku cloud per event type over hourly bars: tenkan (9-bar
    channel midpoint), kijun (26-bar), senkou A = midpoint of the two
    displaced 26 bars forward, senkou B = 52-bar midpoint displaced 26
    forward, and the chikou lagging close (close displaced 26 back) —
    the one-glance trend/support summary whose cloud (senkou A vs B
    band) reads as dynamic support/resistance on a metric stream.
    Rows emit only where every component is defined (all frames full,
    both displacements in range).

    Plan: hourly-bar hash aggregate, one window pass computing the
    three channel midpoints over the SAME (event_type, hour_id) sort
    (three frames, one sort), then one lag/lead pass — Catalyst plans
    a single exchange; all frames are constant-width over
    |hours|-bounded partitions. Determinism: channel midpoints are
    exact extrema picks with one /2.0 each, displacement is row
    motion, no sums, no libm — nothing to round."""
    bars = _hourly_close(spark, sf_dir)

    def _mid(n: int):
        w = (
            Window.partitionBy("event_type")
            .orderBy("hour_id")
            .rowsBetween(-(n - 1), Window.currentRow)
        )
        return F.when(
            F.count(F.lit(1)).over(w).cast("bigint") == n,
            (F.max("high").over(w) + F.min("low").over(w)) / 2.0,
        )

    mids = bars.select(
        "event_type",
        "hour_id",
        "close",
        _mid(_ICHI_T).alias("tenkan"),
        _mid(_ICHI_K).alias("kijun"),
        _mid(_ICHI_B).alias("mid_b"),
    )
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    shifted = mids.select(
        "event_type",
        "hour_id",
        "close",
        "tenkan",
        "kijun",
        F.lag((F.col("tenkan") + F.col("kijun")) / 2.0, _ICHI_SHIFT)
        .over(wl)
        .alias("senkou_a"),
        F.lag("mid_b", _ICHI_SHIFT).over(wl).alias("senkou_b"),
        F.lead("close", _ICHI_SHIFT).over(wl).alias("chikou"),
    )
    return shifted.filter(
        F.col("tenkan").isNotNull()
        & F.col("kijun").isNotNull()
        & F.col("senkou_a").isNotNull()
        & F.col("senkou_b").isNotNull()
        & F.col("chikou").isNotNull()
    )


# Ulcer-index lookback, in hourly bars.
_ULCER_WIN = 14


@register(
    "q_win_ulcer_index",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    dd AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             {sql_dround(
                 "100.0 * (close - max(close) OVER w)"
                 " / max(close) OVER w", 6)} AS drawdown_pct
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_ULCER_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    sq AS (
      SELECT event_type, hour_id, close, drawdown_pct,
             CAST(count(*) OVER w AS BIGINT) AS ndd,
             CAST(sum(CAST(drawdown_pct * drawdown_pct AS DECIMAL(25,9)))
                  OVER w AS DOUBLE) AS ssq
      FROM dd WHERE nbar = {_ULCER_WIN}
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_ULCER_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close, drawdown_pct,
           {sql_dround(f"sqrt(ssq / {_ULCER_WIN})", 6)} AS ulcer_index
    FROM sq WHERE ndd = {_ULCER_WIN}
    """,
)
def q_win_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index per event type over hourly bars: the
    root-mean-square of the trailing 14-bar percentage drawdown from
    the rolling 14-bar high — the downside-only volatility gauge
    (Bollinger's sigma penalizes upside wiggle equally; the ulcer
    index hurts only while the series sits below its recent high),
    emitted next to the instantaneous drawdown itself. Complements
    q_win_drawdown's cumulative-peak view with the windowed one.

    Plan: hourly-bar hash aggregate, two constant-frame window passes
    over the SAME (event_type, hour_id) sort (drawdown needs to
    materialize before its square aggregates) — one exchange,
    |hours|-bounded partitions. Determinism: the rolling high is an
    exact pick; drawdown is one e6-rounded IEEE expression; squares
    of the e6-grid land on DECIMAL(25,9) for the order-insensitive
    window sum; the closing sqrt (libm) is e6-rounded. Rows emit only
    where both frames are full."""
    bars = _hourly_close(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_ULCER_WIN - 1), Window.currentRow)
    )
    rmax = F.max("close").over(w)
    dd = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        dround(100.0 * (F.col("close") - rmax) / rmax, 6).alias(
            "drawdown_pct"
        ),
    ).filter(F.col("nbar") == _ULCER_WIN)
    sq = dd.select(
        "event_type",
        "hour_id",
        "close",
        "drawdown_pct",
        F.count(F.lit(1)).over(w).cast("bigint").alias("ndd"),
        F.sum(
            (F.col("drawdown_pct") * F.col("drawdown_pct")).cast(
                "decimal(25,9)"
            )
        )
        .over(w)
        .cast("double")
        .alias("ssq"),
    ).filter(F.col("ndd") == _ULCER_WIN)
    return sq.select(
        "event_type",
        "hour_id",
        "close",
        "drawdown_pct",
        dround(F.sqrt(F.col("ssq") / _ULCER_WIN), 6).alias("ulcer_index"),
    )


@register(
    "q_ts_max_subarray",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    rets AS (
      SELECT event_type, hour_id,
             CAST({sql_dround(
                 "ln(close / lag(close) OVER (PARTITION BY event_type"
                 " ORDER BY hour_id))", 6)} AS DECIMAL(25,6)) AS ret
      FROM bars
    ),
    psum AS (
      SELECT event_type, hour_id, ret,
             CAST(sum(ret) OVER (PARTITION BY event_type
                                 ORDER BY hour_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
                  AS DECIMAL(25,6)) AS p
      FROM rets WHERE ret IS NOT NULL
    ),
    pfx AS (
      SELECT event_type, hour_id, ret, p,
             min(p) OVER w AS minp,
             max(p) OVER w AS maxp
      FROM psum
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_id,
           CAST(ret AS DOUBLE) AS log_ret,
           -- least/greatest on decimals returns DOUBLE in DuckDB, so the
           -- 0-floor is a CASE to stay in exact decimal arithmetic
           CAST(p - (CASE WHEN minp IS NULL OR minp > 0
                          THEN CAST(0 AS DECIMAL(25,6)) ELSE minp END)
                AS DOUBLE) AS best_gain_ending_here,
           CAST(p - (CASE WHEN maxp IS NULL OR maxp < 0
                          THEN CAST(0 AS DECIMAL(25,6)) ELSE maxp END)
                AS DOUBLE) AS worst_loss_ending_here
    FROM pfx
    """,
)
def q_ts_max_subarray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kadane's maximum-subarray quantities on the hourly log-return
    series per event type: for each bar, the best cumulative gain and
    worst cumulative loss of ANY window ENDING at that bar — via the
    prefix-sum identity best(t) = P(t) − min(0, min_{s<t} P(s)) — the
    distribution-free 'largest run-up / run-down so far' momentum
    panel (its per-type max is the classic maximum drawup; the
    symmetric min is q_win_drawdown's windowed twin from the other
    side).

    Plan: bar aggregate, then ONE sort per type serves the lag, the
    prefix sum, and both running extrema (nested window over the same
    (event_type, hour_id) order — Catalyst plans a single exchange);
    frames are |hours|-bounded. Determinism: log returns (libm) are
    e6-rounded per row, then EVERYTHING stays in DECIMAL(25,6) — the
    prefix sums, running extrema, and both closings are exact decimal
    arithmetic; the only double conversions are the final casts. The prefix
    sum re-narrows to DECIMAL(25,6) (value-bounded by the hour
    grain) so neither engine's decimal arithmetic overflows
    precision 38 and silently promotes the closing subtraction
    to double."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    rets = bars.select(
        "event_type",
        "hour_id",
        dround(F.log(F.col("close") / F.lag("close").over(wl)), 6)
        .cast("decimal(25,6)")
        .alias("ret"),
    ).filter(F.col("ret").isNotNull())
    wc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wb = wl.rowsBetween(Window.unboundedPreceding, -1)
    psum = rets.select(
        "event_type",
        "hour_id",
        "ret",
        F.sum("ret").over(wc).cast("decimal(25,6)").alias("p"),
    )
    pfx = psum.select(
        "event_type",
        "hour_id",
        "ret",
        "p",
        F.min("p").over(wb).alias("minp"),
        F.max("p").over(wb).alias("maxp"),
    )
    zero = F.lit(0).cast("decimal(25,6)")
    floor_min = F.when(
        F.col("minp").isNull() | (F.col("minp") > 0), zero
    ).otherwise(F.col("minp"))
    cap_max = F.when(
        F.col("maxp").isNull() | (F.col("maxp") < 0), zero
    ).otherwise(F.col("maxp"))
    return pfx.select(
        "event_type",
        "hour_id",
        F.col("ret").cast("double").alias("log_ret"),
        (F.col("p") - floor_min).cast("double").alias(
            "best_gain_ending_here"
        ),
        (F.col("p") - cap_max).cast("double").alias(
            "worst_loss_ending_here"
        ),
    )


# Aroon lookback, in hourly bars.
_AROON_WIN = 14


@register(
    "q_win_aroon",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    rn AS (
      SELECT event_type, hour_id, close, high, low,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY hour_id) AS BIGINT) AS rn
      FROM bars
    ),
    ar AS (
      SELECT event_type, hour_id, close, rn,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             (max({{'v': high, 'rn': rn}}) OVER w).rn AS rn_high,
             -(min({{'v': low, 'nrn': -rn}}) OVER w).nrn AS rn_low
      FROM rn
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_AROON_WIN} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close,
           CAST(rn - rn_high AS BIGINT) AS bars_since_high,
           CAST(rn - rn_low AS BIGINT) AS bars_since_low,
           100.0 * ({_AROON_WIN} - (rn - rn_high)) / {_AROON_WIN}
               AS aroon_up,
           100.0 * ({_AROON_WIN} - (rn - rn_low)) / {_AROON_WIN}
               AS aroon_down
    FROM ar WHERE nbar = {_AROON_WIN + 1}
    """,
)
def q_win_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aroon oscillator components per event type: bars since the
    trailing extreme over the textbook N+1-point lookback (N=14 → a
    15-bar frame, so bars_since spans 0..N) and the Aroon up/down
    readings 100·(N − since)/N — the time-since-extreme trend gauge
    spanning the full 0..100 range (a fresh high pins aroon_up at
    100; an extreme N bars back reads exactly 0), the
    when-counterpart of q_win_donchian's how-far channel. Ties at the
    extreme resolve to the MOST RECENT bar on both engines (struct
    lexicographic max on (value, rn); the low side negates rn so the
    min picks the larger rn).

    Plan: bar aggregate, one row_number pass and one rolling
    struct-extrema pass over the SAME (event_type, hour_id) sort —
    single exchange, constant frames, |hours|-bounded partitions.
    Determinism: extrema of exact bar values with integer tiebreak,
    integer bar distances, and one small-integer IEEE division each
    — no libm, no float aggregation."""
    bars = _hourly_close(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("hour_id")
    rn = bars.select(
        "event_type",
        "hour_id",
        "close",
        "high",
        "low",
        F.row_number().over(wo).cast("bigint").alias("rn"),
    )
    w = wo.rowsBetween(-_AROON_WIN, Window.currentRow)
    ar = rn.select(
        "event_type",
        "hour_id",
        "close",
        "rn",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.max(F.struct(F.col("high").alias("v"), F.col("rn").alias("rn")))
        .over(w)["rn"]
        .alias("rn_high"),
        (
            -F.min(
                F.struct(F.col("low").alias("v"), (-F.col("rn")).alias("nrn"))
            ).over(w)["nrn"]
        ).alias("rn_low"),
    ).filter(F.col("nbar") == _AROON_WIN + 1)
    return ar.select(
        "event_type",
        "hour_id",
        "close",
        (F.col("rn") - F.col("rn_high")).cast("bigint").alias(
            "bars_since_high"
        ),
        (F.col("rn") - F.col("rn_low")).cast("bigint").alias(
            "bars_since_low"
        ),
        (
            100.0
            * (_AROON_WIN - (F.col("rn") - F.col("rn_high")))
            / _AROON_WIN
        ).alias("aroon_up"),
        (
            100.0
            * (_AROON_WIN - (F.col("rn") - F.col("rn_low")))
            / _AROON_WIN
        ).alias("aroon_down"),
    )


# Chandelier-exit lookback, in hourly bars, and the ATR multiple.
_CHAND_WIN = 22
_CHAND_MULT = 3.0


@register(
    "q_win_chandelier_exit",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    tr AS (
      SELECT event_type, hour_id, close, high, low,
             CASE WHEN lag(close) OVER w IS NULL THEN high - low
                  ELSE greatest(high - low,
                                abs(high - lag(close) OVER w),
                                abs(low - lag(close) OVER w)) END AS tr
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    rolled AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER f AS BIGINT) AS n,
             max(high) OVER f AS hh,
             min(low) OVER f AS ll,
             CAST(sum(CAST(tr AS DECIMAL(25,6))) OVER f AS DOUBLE)
                 / {_CHAND_WIN} AS atr
      FROM tr
      WINDOW f AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_CHAND_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close,
           {sql_dround(f"hh - {_CHAND_MULT} * atr", 6)} AS long_stop,
           {sql_dround(f"ll + {_CHAND_MULT} * atr", 6)} AS short_stop,
           CAST(CASE WHEN close
                       > {sql_dround(f"hh - {_CHAND_MULT} * atr", 6)}
                     THEN 1 ELSE 0 END AS INTEGER) AS above_long_stop
    FROM rolled WHERE n = {_CHAND_WIN}
    """,
)
def q_win_chandelier_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chandelier exit per event type: the volatility-trailing stop
    hung from the 22-bar extreme — long stop = HH₂₂ − 3·ATR₂₂, short
    stop = LL₂₂ + 3·ATR₂₂ — plus the close-above-long-stop regime
    flag. The adaptive companion to q_win_donchian's fixed channel:
    the stop backs off exactly as far as recent TRUE range (gap-aware,
    q_win_atr's TR) says noise reaches, the classic trend-following
    exit discipline applied to a metric stream as a self-scaling
    'trend intact?' alarm.

    Plan: bar aggregate, one lag pass for TR and one rolling pass for
    the extrema + ATR sum over the SAME (event_type, hour_id) sort —
    one exchange, constant frames, |hours|-bounded. Determinism: TR
    is per-row IEEE on exact bar values, its rolling sum rides the
    decimal detour, ATR divides by the integer period, and each stop
    is one e6-rounded closing (the flag compares against the SAME
    rounded stop both sides)."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    prev = F.lag("close").over(wl)
    tr_col = F.when(
        prev.isNull(), F.col("high") - F.col("low")
    ).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prev),
            F.abs(F.col("low") - prev),
        )
    )
    tr = bars.select(
        "event_type", "hour_id", "close", "high", "low", tr_col.alias("tr")
    )
    f = wl.rowsBetween(-(_CHAND_WIN - 1), Window.currentRow)
    rolled = tr.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(f).cast("bigint").alias("n"),
        F.max("high").over(f).alias("hh"),
        F.min("low").over(f).alias("ll"),
        (
            F.sum(F.col("tr").cast("decimal(25,6)")).over(f).cast("double")
            / _CHAND_WIN
        ).alias("atr"),
    ).filter(F.col("n") == _CHAND_WIN)
    long_stop = dround(F.col("hh") - _CHAND_MULT * F.col("atr"), 6)
    short_stop = dround(F.col("ll") + _CHAND_MULT * F.col("atr"), 6)
    return rolled.select(
        "event_type",
        "hour_id",
        "close",
        long_stop.alias("long_stop"),
        short_stop.alias("short_stop"),
        F.when(F.col("close") > long_stop, 1)
        .otherwise(0)
        .cast("int")
        .alias("above_long_stop"),
    )


# Williams %R lookback, in hourly bars (textbook default period).
_WPR_WIN = 14


@register(
    "q_win_williams_r",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    rolled AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             max(high) OVER w AS hh14,
             min(low) OVER w AS ll14
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_WPR_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close, hh14, ll14,
           CASE WHEN hh14 = ll14 THEN -50.0
                ELSE {sql_dround(
                    "-100.0 * (hh14 - close) / (hh14 - ll14)", 6)}
           END AS williams_r
    FROM rolled WHERE nbar = {_WPR_WIN}
    """,
)
def q_win_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams %R-14 per event type: −100·(HH₁₄ − close)/(HH₁₄ − LL₁₄)
    over the trailing 14 hourly bars — the fast stochastic's inverted
    twin reading 0 at a fresh frame high and −100 at a fresh low
    (overbought above −20, oversold below −80). A flat frame
    (HH = LL) reads the −50 midline, the q_win_stochastic convention
    mirrored.

    Plan: hourly-bar aggregate, then ONE rolling extrema window over
    |hours| rows partitioned by type (time-grain bounded — the frame
    never grows with event volume). Determinism: extrema of exact
    unique bar picks, one subtraction ratio e6-rounded on both
    engines; no libm, no float aggregation."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    w = wl.rowsBetween(-(_WPR_WIN - 1), Window.currentRow)
    rolled = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.max("high").over(w).alias("hh14"),
        F.min("low").over(w).alias("ll14"),
    ).filter(F.col("nbar") == _WPR_WIN)
    hh, ll = F.col("hh14"), F.col("ll14")
    return rolled.select(
        "event_type",
        "hour_id",
        "close",
        "hh14",
        "ll14",
        F.when(hh == ll, F.lit(-50.0))
        .otherwise(dround(-100.0 * (hh - F.col("close")) / (hh - ll), 6))
        .alias("williams_r"),
    )


# CCI lookback, in hourly bars (textbook default period), and the
# Lambert scaling constant.
_CCI_WIN = 20


@register(
    "q_win_cci",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    tp AS (
      SELECT event_type, hour_id,
             {sql_dround("(high + low + close) / 3.0", 6)} AS tp,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY hour_id) AS BIGINT) AS rn
      FROM bars
    ),
    sma AS (
      SELECT event_type, hour_id, tp, rn,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             {sql_dround(
                 f"CAST(sum(CAST(tp AS DECIMAL(25,6))) OVER w AS DOUBLE)"
                 f" / {_CCI_WIN}", 6)} AS sma
      FROM tp
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_CCI_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    keys AS (
      SELECT event_type, hour_id, tp, rn, sma,
             unnest(generate_series(rn - {_CCI_WIN - 1}, rn)) AS rnj
      FROM sma WHERE nbar = {_CCI_WIN}
    ),
    md AS (
      SELECT k.event_type, k.hour_id, k.tp, k.sma,
             {sql_dround(
                 f"CAST(sum(CAST("
                 + sql_dround("abs(j.tp - k.sma)", 6)
                 + f" AS DECIMAL(25,6))) AS DOUBLE) / {_CCI_WIN}", 6)}
               AS mean_dev
      FROM keys k
      JOIN tp j ON j.event_type = k.event_type AND j.rn = k.rnj
      GROUP BY 1, 2, 3, 4
    )
    SELECT event_type, hour_id, tp, sma, mean_dev,
           CASE WHEN mean_dev = 0 THEN 0.0
                ELSE {sql_dround(
                    "(tp - sma) / (CAST(0.015 AS DOUBLE) * mean_dev)", 6)}
           END AS cci20
    FROM md
    """,
)
def q_win_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commodity Channel Index (CCI-20) per event type over the hourly
    typical price tp = (high+low+close)/3: CCI = (tp − SMA₂₀(tp)) /
    (0.015·MD₂₀) where MD₂₀ is the mean absolute deviation of the
    frame's typical prices around the frame's OWN mean — Lambert's
    original definition (the deviation re-reads all 20 bars against
    the current frame's SMA, so it is NOT a plain rolling sum of a
    per-row quantity). A flat frame (MD = 0) reads 0.

    Plan: bar aggregate, one rolling SMA window, then the frame
    re-read as an EXPLODE(sequence) + hash equi-join on (type, bar#) —
    a constant 20× fan-out at the hour grain, never a nested-loop
    range join, so the plan holds at any retention (rows grow with
    hours, not traffic) and shuffles on small integer keys.
    Determinism: tp and every deviation are e6-rounded per row, frame
    sums ride the decimal detour, the two closings are e6-rounded;
    no libm."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    tp = bars.select(
        "event_type",
        "hour_id",
        dround((F.col("high") + F.col("low") + F.col("close")) / 3.0, 6)
        .alias("tp"),
        F.row_number().over(wl).cast("bigint").alias("rn"),
    )
    w = wl.rowsBetween(-(_CCI_WIN - 1), Window.currentRow)
    sma = tp.select(
        "event_type",
        "hour_id",
        "tp",
        "rn",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        dround(
            F.sum(F.col("tp").cast("decimal(25,6)")).over(w).cast("double")
            / _CCI_WIN,
            6,
        ).alias("sma"),
    ).filter(F.col("nbar") == _CCI_WIN)
    keys = sma.select(
        "event_type",
        "hour_id",
        "tp",
        "sma",
        F.explode(
            F.sequence(F.col("rn") - (_CCI_WIN - 1), F.col("rn"))
        ).alias("rnj"),
    )
    j = tp.select("event_type", F.col("rn").alias("rnj"),
                  F.col("tp").alias("tpj"))
    md = (
        keys.join(j, ["event_type", "rnj"])
        .groupBy("event_type", "hour_id", "tp", "sma")
        .agg(
            dround(
                F.sum(
                    dround(F.abs(F.col("tpj") - F.col("sma")), 6).cast(
                        "decimal(25,6)"
                    )
                ).cast("double")
                / _CCI_WIN,
                6,
            ).alias("mean_dev")
        )
    )
    return md.select(
        "event_type",
        "hour_id",
        "tp",
        "sma",
        "mean_dev",
        F.when(F.col("mean_dev") == 0, F.lit(0.0))
        .otherwise(
            dround(
                (F.col("tp") - F.col("sma"))
                / (F.lit(0.015) * F.col("mean_dev")),
                6,
            )
        )
        .alias("cci20"),
    )


# Money Flow Index lookback, in hourly bars (textbook default).
_MFI_WIN = 14

# Volume-carrying bar CTE: _SQL_BARS plus the per-bar event count.
_SQL_VBARS = """
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             max(CASE WHEN rnd = 1 THEN value END) AS close,
             max(value) AS high, min(value) AS low,
             CAST(count(*) AS BIGINT) AS vol
      FROM (
        SELECT event_type, ts, event_id, value,
               row_number() OVER (
                 PARTITION BY event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                 ORDER BY ts DESC, event_id DESC) AS rnd
        FROM events
      )
      GROUP BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
"""


def _hourly_vbars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_hourly_close plus per-bar volume (event count)."""
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
    wd = Window.partitionBy("event_type", "hour_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rn = base.select("*", F.row_number().over(wd).alias("rnd"))
    return rn.groupBy("event_type", "hour_id").agg(
        F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).cast("bigint").alias("vol"),
    )


@register(
    "q_win_mfi",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    tp AS (
      SELECT event_type, hour_id,
             {sql_dround("(high + low + close) / 3.0", 6)} AS tp, vol
      FROM bars
    ),
    dirs AS (
      SELECT event_type, hour_id, tp, vol,
             lag(tp) OVER (PARTITION BY event_type
                           ORDER BY hour_id) AS ptp
      FROM tp
    ),
    flows AS (
      SELECT event_type, hour_id,
             CASE WHEN tp > ptp
                  THEN {sql_dround("tp * vol", 6)} ELSE 0.0 END AS pos_f,
             CASE WHEN tp < ptp
                  THEN {sql_dround("tp * vol", 6)} ELSE 0.0 END AS neg_f
      FROM dirs WHERE ptp IS NOT NULL
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             CAST(sum(CAST(pos_f AS DECIMAL(25,6))) OVER w AS DOUBLE)
               AS pos_mf,
             CAST(sum(CAST(neg_f AS DECIMAL(25,6))) OVER w AS DOUBLE)
               AS neg_mf
      FROM flows
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_MFI_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, pos_mf, neg_mf,
           CASE WHEN pos_mf + neg_mf = 0 THEN 50.0
                ELSE {sql_dround(
                    "100.0 * pos_mf / (pos_mf + neg_mf)", 6)}
           END AS mfi14
    FROM rolled WHERE nbar = {_MFI_WIN}
    """,
)
def q_win_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money Flow Index (MFI-14) per event type: the volume-weighted
    RSI. Each bar's raw money flow tp·vol (typical price × event
    count) counts as POSITIVE if tp rose vs the previous bar, NEGATIVE
    if it fell, and is dropped on a tie (the textbook convention);
    MFI = 100·ΣposMF / (ΣposMF + ΣnegMF) over the trailing 14 bars —
    the does-volume-back-the-price-move gauge next to q_win_rsi's
    price-only reading. An all-tied frame (both sums 0) reads the 50
    midline, q_win_rsi's convention.

    Plan: ONE volume-carrying bar aggregate, one lag + one rolling sum
    window over |hours| rows partitioned by type — time-grain bounded,
    volume enters only as the per-bar count. Determinism: tp and the
    per-bar flow are e6-rounded doubles, frame sums ride the decimal
    detour, tie direction compares e6-grid values; one e6-rounded
    closing ratio, no libm."""
    bars = _hourly_vbars(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    tp = bars.select(
        "event_type",
        "hour_id",
        dround((F.col("high") + F.col("low") + F.col("close")) / 3.0, 6)
        .alias("tp"),
        "vol",
    )
    dirs = tp.select(
        "event_type",
        "hour_id",
        "tp",
        "vol",
        F.lag("tp").over(wl).alias("ptp"),
    ).filter(F.col("ptp").isNotNull())
    flow = dround(F.col("tp") * F.col("vol"), 6)
    flows = dirs.select(
        "event_type",
        "hour_id",
        F.when(F.col("tp") > F.col("ptp"), flow)
        .otherwise(F.lit(0.0))
        .alias("pos_f"),
        F.when(F.col("tp") < F.col("ptp"), flow)
        .otherwise(F.lit(0.0))
        .alias("neg_f"),
    )
    w = wl.rowsBetween(-(_MFI_WIN - 1), Window.currentRow)
    rolled = flows.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.sum(F.col("pos_f").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("pos_mf"),
        F.sum(F.col("neg_f").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("neg_mf"),
    ).filter(F.col("nbar") == _MFI_WIN)
    pos, neg = F.col("pos_mf"), F.col("neg_mf")
    return rolled.select(
        "event_type",
        "hour_id",
        "pos_mf",
        "neg_mf",
        F.when(pos + neg == 0, F.lit(50.0))
        .otherwise(dround(100.0 * pos / (pos + neg), 6))
        .alias("mfi14"),
    )


# Keltner-channel lookback, in hourly bars, and the ATR band multiple.
_KELT_WIN = 20
_KELT_MULT = 2.0


@register(
    "q_win_keltner",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    tr AS (
      SELECT event_type, hour_id, close,
             {sql_dround("(high + low + close) / 3.0", 6)} AS tp,
             CASE WHEN lag(close) OVER w IS NULL THEN high - low
                  ELSE greatest(high - low,
                                abs(high - lag(close) OVER w),
                                abs(low - lag(close) OVER w)) END AS tr
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    rolled AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER f AS BIGINT) AS nbar,
             {sql_dround(
                 f"CAST(sum(CAST(tp AS DECIMAL(25,6))) OVER f AS DOUBLE)"
                 f" / {_KELT_WIN}", 6)} AS center,
             {sql_dround(
                 f"CAST(sum(CAST(tr AS DECIMAL(25,6))) OVER f AS DOUBLE)"
                 f" / {_KELT_WIN}", 6)} AS atr20
      FROM tr
      WINDOW f AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_KELT_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close, center, atr20,
           {sql_dround(f"center + {_KELT_MULT} * atr20", 6)} AS upper_band,
           {sql_dround(f"center - {_KELT_MULT} * atr20", 6)} AS lower_band,
           CASE WHEN close > {sql_dround(
                    f"center + {_KELT_MULT} * atr20", 6)} THEN 1
                WHEN close < {sql_dround(
                    f"center - {_KELT_MULT} * atr20", 6)} THEN -1
                ELSE 0 END AS breakout
    FROM rolled WHERE nbar = {_KELT_WIN}
    """,
)
def q_win_keltner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keltner channel (SMA variant) per event type: centerline =
    SMA₂₀ of the typical price, bands at ±2·ATR₂₀ (the gap-aware true
    range, q_win_atr's TR) — the volatility envelope whose breakout
    flag (+1 above the upper band, −1 below the lower) marks
    trend-initiation hours; the ATR-width twin of
    q_win_bollinger_bands' stdev envelope.

    Plan: bar aggregate, then ONE sort per type serves the lag, both
    rolling sums, and the closing projection (nested windows over the
    same (event_type, hour_id) order — single exchange); frames are
    |hours|-bounded. Determinism: tp e6-rounded per row, TR exact
    double max/abs on unique bar picks, both frame sums ride the
    decimal detour, center/ATR/bands e6-rounded; the breakout flag
    compares close against the same e6-grid bands the output carries;
    no libm."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    pc = F.lag("close").over(wl)
    tr = bars.select(
        "event_type",
        "hour_id",
        "close",
        dround((F.col("high") + F.col("low") + F.col("close")) / 3.0, 6)
        .alias("tp"),
        F.when(pc.isNull(), F.col("high") - F.col("low"))
        .otherwise(
            F.greatest(
                F.col("high") - F.col("low"),
                F.abs(F.col("high") - pc),
                F.abs(F.col("low") - pc),
            )
        )
        .alias("tr"),
    )
    f = wl.rowsBetween(-(_KELT_WIN - 1), Window.currentRow)
    rolled = tr.select(
        "event_type",
        "hour_id",
        "close",
        F.count(F.lit(1)).over(f).cast("bigint").alias("nbar"),
        dround(
            F.sum(F.col("tp").cast("decimal(25,6)")).over(f).cast("double")
            / _KELT_WIN,
            6,
        ).alias("center"),
        dround(
            F.sum(F.col("tr").cast("decimal(25,6)")).over(f).cast("double")
            / _KELT_WIN,
            6,
        ).alias("atr20"),
    ).filter(F.col("nbar") == _KELT_WIN)
    upper = dround(F.col("center") + _KELT_MULT * F.col("atr20"), 6)
    lower = dround(F.col("center") - _KELT_MULT * F.col("atr20"), 6)
    return rolled.select(
        "event_type",
        "hour_id",
        "close",
        "center",
        "atr20",
        upper.alias("upper_band"),
        lower.alias("lower_band"),
        F.when(F.col("close") > upper, 1)
        .when(F.col("close") < lower, -1)
        .otherwise(0)
        .cast("int")
        .alias("breakout"),
    )


# Directional-movement / Elder-Ray / Vortex lookbacks, in hourly bars.
_ADX_WIN = 14
_ER_WIN = 13
_VTX_WIN = 14

# Shared lag CTE for the directional ops: previous bar's high/low/close
# per event type, first bar dropped (no prior bar to move against).
_SQL_LAGGED_BARS = f"""
      SELECT * FROM (
        SELECT event_type, hour_id, close, high, low,
               lag(high)  OVER w AS ph,
               lag(low)   OVER w AS pl,
               lag(close) OVER w AS pc
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
      ) WHERE ph IS NOT NULL
"""


@register(
    "q_win_adx",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    lagd AS ({_SQL_LAGGED_BARS}),
    dm AS (
      SELECT event_type, hour_id,
             CASE WHEN high - ph > pl - low AND high - ph > 0
                  THEN high - ph ELSE 0.0 END AS dmp,
             CASE WHEN pl - low > high - ph AND pl - low > 0
                  THEN pl - low ELSE 0.0 END AS dmm,
             greatest(high - low, abs(high - pc), abs(low - pc)) AS tr
      FROM lagd
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER f AS BIGINT) AS n,
             CAST(sum(CAST(dmp AS DECIMAL(25,6))) OVER f AS DOUBLE) AS sp,
             CAST(sum(CAST(dmm AS DECIMAL(25,6))) OVER f AS DOUBLE) AS sm,
             CAST(sum(CAST(tr  AS DECIMAL(25,6))) OVER f AS DOUBLE) AS st
      FROM dm
      WINDOW f AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_ADX_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    di AS (
      SELECT event_type, hour_id,
             {sql_dround("CASE WHEN st = 0 THEN 0.0"
                         " ELSE 100.0 * sp / st END", 6)} AS di_plus,
             {sql_dround("CASE WHEN st = 0 THEN 0.0"
                         " ELSE 100.0 * sm / st END", 6)} AS di_minus
      FROM rolled WHERE n = {_ADX_WIN}
    ),
    dx AS (
      SELECT event_type, hour_id, di_plus, di_minus,
             {sql_dround("CASE WHEN di_plus + di_minus = 0 THEN 0.0"
                         " ELSE 100.0 * abs(di_plus - di_minus)"
                         " / (di_plus + di_minus) END", 6)} AS dx
      FROM di
    ),
    sm2 AS (
      SELECT event_type, hour_id, di_plus, di_minus, dx,
             CAST(count(*) OVER f AS BIGINT) AS nx,
             CAST(sum(CAST(dx AS DECIMAL(25,6))) OVER f AS DOUBLE) AS sx
      FROM dx
      WINDOW f AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_ADX_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, di_plus, di_minus, dx,
           {sql_dround(f"sx / {_ADX_WIN}", 6)} AS adx14
    FROM sm2 WHERE nx = {_ADX_WIN}
    """,
)
def q_win_adx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Directional Index (ADX-14, Cutler-style SMA variant)
    per event type over the hourly bars: +DM/−DM pick the dominant
    bar-to-bar directional move, ±DI normalize their 14-bar sums by
    the 14-bar true-range sum, DX measures their imbalance, and ADX
    smooths DX by a second simple 14-bar average — the trend-STRENGTH
    gauge (direction-agnostic: ADX > 25 reads "trending", whichever
    way) that complements the q_win_rsi/q_win_macd direction signals;
    Wilder's recursive smoothing is substituted by SMA exactly as in
    q_win_rsi, keeping the statistic a pure sliding-window expression.

    Plan: hourly-bar hash aggregate, one lag pass and two rolling-sum
    passes all over the SAME (event_type, hour_id) sort — |hours| rows
    per type, time-grain bounded, traffic-invariant. Determinism: DM
    and TR are exact double comparisons/differences of unique bar
    picks; every rolling sum rides the decimal detour; DI and DX are
    e6-rounded BEFORE feeding the next window so both engines
    aggregate identical inputs; zero-TR and flat (DI+ + DI− = 0)
    frames read 0 by convention instead of dividing by zero."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    lagd = bars.select(
        "event_type",
        "hour_id",
        "close",
        "high",
        "low",
        F.lag("high").over(wl).alias("ph"),
        F.lag("low").over(wl).alias("pl"),
        F.lag("close").over(wl).alias("pc"),
    ).filter(F.col("ph").isNotNull())
    up = F.col("high") - F.col("ph")
    dn = F.col("pl") - F.col("low")
    dm = lagd.select(
        "event_type",
        "hour_id",
        F.when((up > dn) & (up > 0), up).otherwise(F.lit(0.0)).alias("dmp"),
        F.when((dn > up) & (dn > 0), dn).otherwise(F.lit(0.0)).alias("dmm"),
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - F.col("pc")),
            F.abs(F.col("low") - F.col("pc")),
        ).alias("tr"),
    )
    f = wl.rowsBetween(-(_ADX_WIN - 1), Window.currentRow)
    rolled = dm.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(f).cast("bigint").alias("n"),
        F.sum(F.col("dmp").cast("decimal(25,6)")).over(f).cast("double").alias("sp"),
        F.sum(F.col("dmm").cast("decimal(25,6)")).over(f).cast("double").alias("sm"),
        F.sum(F.col("tr").cast("decimal(25,6)")).over(f).cast("double").alias("st"),
    ).filter(F.col("n") == _ADX_WIN)
    st = F.col("st")
    di = rolled.select(
        "event_type",
        "hour_id",
        dround(
            F.when(st == 0, F.lit(0.0)).otherwise(100.0 * F.col("sp") / st), 6
        ).alias("di_plus"),
        dround(
            F.when(st == 0, F.lit(0.0)).otherwise(100.0 * F.col("sm") / st), 6
        ).alias("di_minus"),
    )
    dsumdi = F.col("di_plus") + F.col("di_minus")
    dx = di.select(
        "event_type",
        "hour_id",
        "di_plus",
        "di_minus",
        dround(
            F.when(dsumdi == 0, F.lit(0.0)).otherwise(
                100.0 * F.abs(F.col("di_plus") - F.col("di_minus")) / dsumdi
            ),
            6,
        ).alias("dx"),
    )
    sm2 = dx.select(
        "event_type",
        "hour_id",
        "di_plus",
        "di_minus",
        "dx",
        F.count(F.lit(1)).over(f).cast("bigint").alias("nx"),
        F.sum(F.col("dx").cast("decimal(25,6)")).over(f).cast("double").alias("sx"),
    ).filter(F.col("nx") == _ADX_WIN)
    return sm2.select(
        "event_type",
        "hour_id",
        "di_plus",
        "di_minus",
        "dx",
        dround(F.col("sx") / _ADX_WIN, 6).alias("adx14"),
    )


@register(
    "q_win_elder_ray",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    ma AS (
      SELECT event_type, hour_id, close, high, low,
             CAST(count(*) OVER f AS BIGINT) AS n,
             CAST(sum(CAST(close AS DECIMAL(25,6))) OVER f AS DOUBLE)
                 / {_ER_WIN} AS sma13
      FROM bars
      WINDOW f AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_ER_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, close, sma13,
           high - sma13 AS bull_power,
           low - sma13 AS bear_power
    FROM ma WHERE n = {_ER_WIN}
    """,
)
def q_win_elder_ray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elder-Ray bull/bear power per event type: the hourly bar's high
    (resp. low) minus the 13-bar simple moving average of the close —
    how far the strongest buyers (sellers) pushed the bar beyond the
    local consensus value. Positive bear power with a rising average
    is Elder's classic strength confirmation; on a metric stream the
    pair reads as signed headroom of each hour's extremes over the
    local trend. EMA-13 is substituted by SMA-13 (the q_win_rsi/
    q_win_macd convention) so the baseline is a pure sliding window.

    Plan: hourly-bar hash aggregate, one full-frame rolling mean over
    |hours| rows partitioned by type (time-grain bounded). Determinism:
    the rolling sum rides the decimal detour, the mean is one division
    by an integer literal, and both powers are single exact double
    subtractions — no libm, no rounding needed."""
    bars = _hourly_close(spark, sf_dir)
    f = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_ER_WIN - 1), Window.currentRow)
    )
    ma = bars.select(
        "event_type",
        "hour_id",
        "close",
        "high",
        "low",
        F.count(F.lit(1)).over(f).cast("bigint").alias("n"),
        (
            F.sum(F.col("close").cast("decimal(25,6)")).over(f).cast("double")
            / _ER_WIN
        ).alias("sma13"),
    ).filter(F.col("n") == _ER_WIN)
    return ma.select(
        "event_type",
        "hour_id",
        "close",
        "sma13",
        (F.col("high") - F.col("sma13")).alias("bull_power"),
        (F.col("low") - F.col("sma13")).alias("bear_power"),
    )


@register(
    "q_win_vortex",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    lagd AS ({_SQL_LAGGED_BARS}),
    vm AS (
      SELECT event_type, hour_id,
             abs(high - pl) AS vmp,
             abs(low - ph) AS vmm,
             greatest(high - low, abs(high - pc), abs(low - pc)) AS tr
      FROM lagd
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER f AS BIGINT) AS n,
             CAST(sum(CAST(vmp AS DECIMAL(25,6))) OVER f AS DOUBLE) AS svp,
             CAST(sum(CAST(vmm AS DECIMAL(25,6))) OVER f AS DOUBLE) AS svm,
             CAST(sum(CAST(tr  AS DECIMAL(25,6))) OVER f AS DOUBLE) AS st
      FROM vm
      WINDOW f AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_VTX_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id,
           CASE WHEN st = 0 THEN 0.0 ELSE svp / st END AS vi_plus,
           CASE WHEN st = 0 THEN 0.0 ELSE svm / st END AS vi_minus,
           (CASE WHEN st = 0 THEN 0.0 ELSE svp / st END)
             - (CASE WHEN st = 0 THEN 0.0 ELSE svm / st END) AS vi_diff
    FROM rolled WHERE n = {_VTX_WIN}
    """,
)
def q_win_vortex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vortex indicator (VI+/VI−, 14 bars) per event type: upward
    vortex movement |high − prevLow| and downward |low − prevHigh|,
    each summed over 14 bars and normalized by the 14-bar true-range
    sum. A VI+/VI− crossover is the trend-reversal signal; vi_diff's
    sign gives the current regime at a glance. Fully window-shaped
    (sums of exact per-bar terms), no recursion to substitute.

    Plan: hourly-bar hash aggregate, one lag pass and one rolling-sum
    pass over the same (event_type, hour_id) sort — |hours| rows per
    type, time-grain bounded. Determinism: VM and TR are exact double
    abs/max arithmetic on unique bar picks; rolling sums ride the
    decimal detour; the VI ratios are single deterministic double
    divisions with the zero-TR frame reading 0 by convention."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    lagd = bars.select(
        "event_type",
        "hour_id",
        "high",
        "low",
        F.lag("high").over(wl).alias("ph"),
        F.lag("low").over(wl).alias("pl"),
        F.lag("close").over(wl).alias("pc"),
    ).filter(F.col("ph").isNotNull())
    vm = lagd.select(
        "event_type",
        "hour_id",
        F.abs(F.col("high") - F.col("pl")).alias("vmp"),
        F.abs(F.col("low") - F.col("ph")).alias("vmm"),
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - F.col("pc")),
            F.abs(F.col("low") - F.col("pc")),
        ).alias("tr"),
    )
    f = wl.rowsBetween(-(_VTX_WIN - 1), Window.currentRow)
    rolled = vm.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(f).cast("bigint").alias("n"),
        F.sum(F.col("vmp").cast("decimal(25,6)")).over(f).cast("double").alias("svp"),
        F.sum(F.col("vmm").cast("decimal(25,6)")).over(f).cast("double").alias("svm"),
        F.sum(F.col("tr").cast("decimal(25,6)")).over(f).cast("double").alias("st"),
    ).filter(F.col("n") == _VTX_WIN)
    st = F.col("st")
    vip = F.when(st == 0, F.lit(0.0)).otherwise(F.col("svp") / st)
    vim = F.when(st == 0, F.lit(0.0)).otherwise(F.col("svm") / st)
    return rolled.select(
        "event_type",
        "hour_id",
        vip.alias("vi_plus"),
        vim.alias("vi_minus"),
        (vip - vim).alias("vi_diff"),
    )


# Hull MA geometry: HMA(9) = WMA(3) of [2·WMA(4) − WMA(9)] — the
# period, its half, and its square root (Hull 2005's standard triple).
_HMA_N = 9
_HMA_HALF = 4
_HMA_ROOT = 3


def _sql_wma(cols: list[str], denom: float) -> str:
    """Linear-weight MA numerator over lag columns (most recent
    first), in the exact left-assoc order the Spark twin builds."""
    k = len(cols)
    terms = " + ".join(
        f"{float(k - i):.1f} * {c}" for i, c in enumerate(cols)
    )
    return f"({terms}) / {denom:.1f}"


def _col_wma(cols: list, denom: float):
    k = len(cols)
    num = None
    for i, c in enumerate(cols):
        term = float(k - i) * c
        num = term if num is None else num + term
    return num / denom


_HMA_X = ["close"] + [f"x{i}" for i in range(1, _HMA_N)]


@register(
    "q_win_hull_ma",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    lagged AS (
      SELECT event_type, hour_id, close,
             row_number() OVER w AS rn,
             {", ".join(
                 f"lag(close, {i}) OVER w AS x{i}"
                 for i in range(1, _HMA_N))}
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    wmas AS (
      SELECT event_type, hour_id, close, rn,
             2.0 * ({_sql_wma(_HMA_X[:_HMA_HALF], 10.0)})
               - ({_sql_wma(_HMA_X, 45.0)}) AS hraw
      FROM lagged
    ),
    hl AS (
      SELECT event_type, hour_id, close, rn, hraw,
             lag(hraw, 1) OVER w AS h1,
             lag(hraw, 2) OVER w AS h2
      FROM wmas
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    )
    SELECT event_type, hour_id, close,
           {sql_dround(_sql_wma(["hraw", "h1", "h2"], 6.0), 6)} AS hma9
    FROM hl WHERE rn >= {_HMA_N + _HMA_ROOT - 1}
    """,
)
def q_win_hull_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hull moving average HMA(9) over the hourly close series per
    event type: WMA(3) of the de-lagged series 2·WMA(4) − WMA(9) —
    the trend-following average that cuts SMA lag by extrapolating the
    half-period WMA, while the final short WMA smooths the overshoot
    (Hull 2005). The responsive-yet-smooth baseline a signals desk
    plots under q_win_macd/q_win_rsi. Rows only where the full
    9+2-bar lookback exists (bar-INDEX lags on the per-type bar
    sequence, the q_win_rsi convention).

    Plan: events collapse to hourly bars first (the q_ts_ohlc_bars
    hash aggregate); two lag passes partitioned by event type over
    |hours| rows each (time-grain bounded) — all three WMAs are
    FIXED-weight lag combinations, so no weighted-frame aggregate or
    UDF is ever needed. Determinism: every WMA is a per-row IEEE
    chain over ≤9 lag terms built in identical left-assoc order on
    both engines (no aggregation → no decimal detour needed); only
    the final HMA is e6-rounded; completeness gates on the exact
    row_number, so both engines emit exactly the same rows."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    lagged = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.row_number().over(wl).alias("rn"),
        *[
            F.lag("close", i).over(wl).alias(f"x{i}")
            for i in range(1, _HMA_N)
        ],
    )
    xcols = [F.col(c) for c in _HMA_X]
    wmas = lagged.select(
        "event_type",
        "hour_id",
        "close",
        "rn",
        (
            2.0 * _col_wma(xcols[:_HMA_HALF], 10.0)
            - _col_wma(xcols, 45.0)
        ).alias("hraw"),
    )
    hl = wmas.select(
        "event_type",
        "hour_id",
        "close",
        "rn",
        "hraw",
        F.lag("hraw", 1).over(wl).alias("h1"),
        F.lag("hraw", 2).over(wl).alias("h2"),
    )
    return hl.filter(F.col("rn") >= _HMA_N + _HMA_ROOT - 1).select(
        "event_type",
        "hour_id",
        "close",
        dround(
            _col_wma([F.col("hraw"), F.col("h1"), F.col("h2")], 6.0), 6
        ).alias("hma9"),
    )


@register(
    "q_win_fractal_points",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    ctx AS (
      SELECT event_type, hour_id, high, low,
             lag(high, 1) OVER w AS hb1, lag(high, 2) OVER w AS hb2,
             lead(high, 1) OVER w AS hf1, lead(high, 2) OVER w AS hf2,
             lag(low, 1) OVER w AS lb1, lag(low, 2) OVER w AS lb2,
             lead(low, 1) OVER w AS lf1, lead(low, 2) OVER w AS lf2
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    f AS (
      SELECT event_type, hour_id, high, low,
             CASE WHEN high > hb1 AND high > hb2
                   AND high > hf1 AND high > hf2
                  THEN 1 ELSE 0 END AS is_fractal_high,
             CASE WHEN low < lb1 AND low < lb2
                   AND low < lf1 AND low < lf2
                  THEN 1 ELSE 0 END AS is_fractal_low
      FROM ctx
    )
    SELECT event_type, hour_id, high, low,
           CAST(is_fractal_high AS INTEGER) AS is_fractal_high,
           CAST(is_fractal_low AS INTEGER) AS is_fractal_low
    FROM f WHERE is_fractal_high = 1 OR is_fractal_low = 1
    """,
)
def q_win_fractal_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams fractal points over the hourly bars per event type: a
    bar is a fractal HIGH when its high STRICTLY exceeds the highs of
    the two bars on each side (mirror for fractal lows) — the local
    swing-point extraction behind support/resistance levels and the
    entry anchors of breakout systems (Williams 1998). Strict
    comparison means plateaus never mark (documented; a window at a
    series edge with missing neighbors can't mark either — NULL
    comparisons read false on both engines).

    Plan: events collapse to hourly bars first (the q_ts_ohlc_bars
    hash aggregate); one window pass partitioned by event type emits
    all eight neighbor columns together (Spark fuses same-spec
    lag/lead into ONE Window node — |hours| rows, time-grain
    bounded); the fractal predicate is a per-row comparison, and only
    marked rows survive. Determinism: highs/lows are exact parquet
    doubles compared for strict inequality — no arithmetic at all, so
    both engines emit exactly the same rows."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    h, lo = F.col("high"), F.col("low")
    ctx = bars.select(
        "event_type",
        "hour_id",
        "high",
        "low",
        F.lag("high", 1).over(wl).alias("hb1"),
        F.lag("high", 2).over(wl).alias("hb2"),
        F.lead("high", 1).over(wl).alias("hf1"),
        F.lead("high", 2).over(wl).alias("hf2"),
        F.lag("low", 1).over(wl).alias("lb1"),
        F.lag("low", 2).over(wl).alias("lb2"),
        F.lead("low", 1).over(wl).alias("lf1"),
        F.lead("low", 2).over(wl).alias("lf2"),
    )
    is_fh = F.when(
        (h > F.col("hb1"))
        & (h > F.col("hb2"))
        & (h > F.col("hf1"))
        & (h > F.col("hf2")),
        1,
    ).otherwise(0)
    is_fl = F.when(
        (lo < F.col("lb1"))
        & (lo < F.col("lb2"))
        & (lo < F.col("lf1"))
        & (lo < F.col("lf2")),
        1,
    ).otherwise(0)
    f = ctx.select(
        "event_type",
        "hour_id",
        "high",
        "low",
        is_fh.cast("int").alias("is_fractal_high"),
        is_fl.cast("int").alias("is_fractal_low"),
    )
    return f.filter(
        (F.col("is_fractal_high") == 1) | (F.col("is_fractal_low") == 1)
    )


# Crossover pair: the classic fast/slow simple-MA periods, in hourly
# bars.
_XO_FAST = 5
_XO_SLOW = 20


@register(
    "q_win_sma_crossover",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    ma AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER wf AS BIGINT) AS nf,
             CAST(count(*) OVER ws AS BIGINT) AS ns,
             CAST(sum(CAST(close AS DECIMAL(25,6))) OVER wf AS DOUBLE)
               / {_XO_FAST} AS fast,
             CAST(sum(CAST(close AS DECIMAL(25,6))) OVER ws AS DOUBLE)
               / {_XO_SLOW} AS slow
      FROM bars
      WINDOW wf AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_XO_FAST - 1} PRECEDING
                    AND CURRENT ROW),
             ws AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_XO_SLOW - 1} PRECEDING
                    AND CURRENT ROW)
    ),
    sgn AS (
      SELECT event_type, hour_id,
             CASE WHEN fast > slow THEN 1
                  WHEN fast < slow THEN -1 ELSE 0 END AS s
      FROM ma WHERE nf = {_XO_FAST} AND ns = {_XO_SLOW}
    ),
    x AS (
      SELECT event_type, hour_id, s,
             lag(s) OVER (PARTITION BY event_type
                          ORDER BY hour_id) AS ps
      FROM sgn
    )
    SELECT event_type,
           CAST(sum(CASE WHEN ps < 0 AND s > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_golden,
           CAST(sum(CASE WHEN ps > 0 AND s < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_death,
           max(CASE WHEN ps < 0 AND s > 0 THEN hour_id END)
             AS last_golden_hour,
           max(CASE WHEN ps > 0 AND s < 0 THEN hour_id END)
             AS last_death_hour
    FROM x GROUP BY event_type
    """,
)
def q_win_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden/death cross census per event type: SMA(5) vs SMA(20)
    over the hourly closes, counting strict sign flips of the spread
    (golden = fast crosses from below to above, death the reverse;
    a bar where the MAs are EXACTLY equal carries sign 0 and, being
    measure-zero for real closes, neither counts nor resets a cross —
    documented), plus the most recent hour of each. The trend-regime
    summary a signals desk reads before q_win_macd's per-bar detail.

    Plan: bars from the q_ts_ohlc_bars hash aggregate; both rolling
    means share one type-partitioned window pass (frames differ, spec
    matches — |hours| rows, time-grain bounded); one lag pass; one
    ≤|types| aggregate. Determinism: the rolling sums ride the decimal
    detour inside their frames (full-frame rows only); the sign is an
    exact three-way comparison of identical doubles; counts and hour
    picks are exact integers — no rounding anywhere."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    wf = wl.rowsBetween(-(_XO_FAST - 1), Window.currentRow)
    ws = wl.rowsBetween(-(_XO_SLOW - 1), Window.currentRow)
    dec = "decimal(25,6)"
    ma = bars.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(wf).cast("bigint").alias("nf"),
        F.count(F.lit(1)).over(ws).cast("bigint").alias("ns"),
        (
            F.sum(F.col("close").cast(dec)).over(wf).cast("double")
            / _XO_FAST
        ).alias("fast"),
        (
            F.sum(F.col("close").cast(dec)).over(ws).cast("double")
            / _XO_SLOW
        ).alias("slow"),
    ).filter((F.col("nf") == _XO_FAST) & (F.col("ns") == _XO_SLOW))
    sgn = ma.select(
        "event_type",
        "hour_id",
        F.when(F.col("fast") > F.col("slow"), 1)
        .when(F.col("fast") < F.col("slow"), -1)
        .otherwise(0)
        .alias("s"),
    )
    x = sgn.select(
        "event_type",
        "hour_id",
        "s",
        F.lag("s").over(wl).alias("ps"),
    )
    golden = (F.col("ps") < 0) & (F.col("s") > 0)
    death = (F.col("ps") > 0) & (F.col("s") < 0)
    return x.groupBy("event_type").agg(
        F.sum(F.when(golden, 1).otherwise(0)).cast("bigint").alias("n_golden"),
        F.sum(F.when(death, 1).otherwise(0)).cast("bigint").alias("n_death"),
        F.max(F.when(golden, F.col("hour_id"))).alias("last_golden_hour"),
        F.max(F.when(death, F.col("hour_id"))).alias("last_death_hour"),
    )


# Volume-profile price bucket width (value units; the events value
# column spans ~[0, 500], so ~20 buckets per type).
_VP_BUCKET = 25.0


@register(
    "q_win_volume_profile",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CAST(floor(value / {_VP_BUCKET}) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    t0 AS (
      SELECT event_type, bucket, n_events,
             CAST(sum(n_events) OVER (PARTITION BY event_type)
                  AS BIGINT) AS total,
             CAST(max(n_events) OVER (PARTITION BY event_type)
                  AS BIGINT) AS mx
      FROM b
    ),
    t AS (
      SELECT event_type, bucket, n_events, total,
             CAST(min(CASE WHEN n_events = mx THEN bucket END)
                  OVER (PARTITION BY event_type) AS BIGINT) AS poc
      FROM t0
    )
    SELECT event_type, bucket, n_events,
           {sql_dround(
               "CAST(n_events AS DOUBLE) / total", 6)} AS share,
           CAST(CASE WHEN bucket = poc THEN 1 ELSE 0 END
                AS INTEGER) AS is_poc
    FROM t
    """,
)
def q_win_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume profile per event type: activity bucketed by VALUE level
    (width-25 price bins), each bin's share of the type's volume, and
    the point of control (POC — the most-populated bin, lowest bucket
    on ties) marked. The volume-at-price view a trading desk reads
    sideways against q_ts_ohlc_bars' time series — and, generically,
    the per-group modal-bin histogram with in-row share/mode marking.

    Plan: one (type, bucket) hash aggregate (corpus collapses before
    any window), then the total / max / POC annotations ride windows
    partitioned BY TYPE over the ≤|types|·|buckets| frame (bounded by
    the literal bucket grid, never data-sized). Determinism: buckets
    are exact floor(value/width) integers on identical doubles; counts
    are BIGINTs; the POC tie-break is the exact integer min over
    max-count bins; the share is one IEEE division e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    b = e.groupBy(
        "event_type",
        F.floor(F.col("value") / _VP_BUCKET).cast("bigint").alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    wt = Window.partitionBy("event_type")
    t0 = b.select(
        "event_type",
        "bucket",
        "n_events",
        F.sum("n_events").over(wt).cast("bigint").alias("total"),
        F.max("n_events").over(wt).cast("bigint").alias("mx"),
    )
    t = t0.select(
        "event_type",
        "bucket",
        "n_events",
        "total",
        F.min(
            F.when(F.col("n_events") == F.col("mx"), F.col("bucket"))
        )
        .over(wt)
        .cast("bigint")
        .alias("poc"),
    )
    return t.select(
        "event_type",
        "bucket",
        "n_events",
        dround(F.col("n_events").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        F.when(F.col("bucket") == F.col("poc"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_poc"),
    )


# TD Setup lookback and completion length (DeMark's sequential count).
_TD_LAG = 4
_TD_LEN = 9


@register(
    "q_win_td_setup",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    flg AS (
      SELECT event_type, hour_id, close,
             row_number() OVER w AS rn,
             CASE WHEN close < lag(close, {_TD_LAG}) OVER w
                  THEN 1 ELSE 0 END AS fb,
             CASE WHEN close > lag(close, {_TD_LAG}) OVER w
                  THEN 1 ELSE 0 END AS fs
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    run AS (
      SELECT event_type, rn, fb, fs,
             CAST(rn - coalesce(max(CASE WHEN fb = 0 THEN rn END)
                   OVER (PARTITION BY event_type ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW), 0) AS BIGINT) AS buy_streak,
             CAST(rn - coalesce(max(CASE WHEN fs = 0 THEN rn END)
                   OVER (PARTITION BY event_type ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW), 0) AS BIGINT) AS sell_streak
      FROM flg
    )
    SELECT event_type,
           CAST(sum(CASE WHEN buy_streak > 0
                     AND buy_streak % {_TD_LEN} = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_buy_setups,
           CAST(sum(CASE WHEN sell_streak > 0
                     AND sell_streak % {_TD_LEN} = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sell_setups,
           CAST(max(buy_streak) AS BIGINT) AS max_buy_streak,
           CAST(max(sell_streak) AS BIGINT) AS max_sell_streak
    FROM run GROUP BY event_type
    """,
)
def q_win_td_setup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TD Sequential setup census per event type (DeMark): a BUY setup
    completes on every 9th CONSECUTIVE bar closing strictly below the
    close 4 bars earlier (sell mirror: above) — an 18-bar run counts
    two completions, exactly DeMark's restart rule. Early bars with no
    4-back close compare against NULL, read false, and break streaks
    (documented). Reported per type with the longest run of each side
    — the exhaustion-count summary next to q_win_sma_crossover's
    regime flips.

    Plan: bars from the q_ts_ohlc_bars hash aggregate; the streak is
    the classic "rows since last failure" rewrite — a running MAX of
    the last failing row number, NOT a recursive state — so everything
    is two window passes partitioned by type over |hours| rows.
    Determinism: flags are strict comparisons of identical doubles;
    streaks, completions and maxima are exact integer arithmetic — no
    rounding anywhere."""
    bars = _hourly_close(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    prior = F.lag("close", _TD_LAG).over(wl)
    flg = bars.select(
        "event_type",
        F.row_number().over(wl).alias("rn"),
        F.when(F.col("close") < prior, 1).otherwise(0).alias("fb"),
        F.when(F.col("close") > prior, 1).otherwise(0).alias("fs"),
    )
    wrun = Window.partitionBy("event_type").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = flg.select(
        "event_type",
        (
            F.col("rn")
            - F.coalesce(
                F.max(
                    F.when(F.col("fb") == 0, F.col("rn"))
                ).over(wrun),
                F.lit(0),
            )
        )
        .cast("bigint")
        .alias("buy_streak"),
        (
            F.col("rn")
            - F.coalesce(
                F.max(
                    F.when(F.col("fs") == 0, F.col("rn"))
                ).over(wrun),
                F.lit(0),
            )
        )
        .cast("bigint")
        .alias("sell_streak"),
    )
    bs, ss = F.col("buy_streak"), F.col("sell_streak")
    return run.groupBy("event_type").agg(
        F.sum(F.when((bs > 0) & (bs % _TD_LEN == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_buy_setups"),
        F.sum(F.when((ss > 0) & (ss % _TD_LEN == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sell_setups"),
        F.max(bs).cast("bigint").alias("max_buy_streak"),
        F.max(ss).cast("bigint").alias("max_sell_streak"),
    )


# Opening-range width, in hours of the trading day.
_OR_HOURS = 2


@register(
    "q_win_opening_range",
    oracle=f"""
    WITH bars AS ({_SQL_BARS}),
    db AS (
      SELECT event_type, hour_id, close, high, low,
             hour_id // 24 AS day_id,
             hour_id % 24 AS hod
      FROM bars
    ),
    orng AS (
      SELECT event_type, day_id,
             max(CASE WHEN hod < {_OR_HOURS} THEN high END) AS or_high,
             min(CASE WHEN hod < {_OR_HOURS} THEN low END) AS or_low
      FROM db GROUP BY event_type, day_id
    )
    SELECT db.event_type, db.day_id,
           orng.or_high, orng.or_low,
           CAST(sum(CASE WHEN db.hod >= {_OR_HOURS}
                    AND db.close > orng.or_high
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           CAST(sum(CASE WHEN db.hod >= {_OR_HOURS}
                    AND db.close < orng.or_low
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_below
    FROM db JOIN orng
      ON db.event_type = orng.event_type AND db.day_id = orng.day_id
    WHERE orng.or_high IS NOT NULL
    GROUP BY db.event_type, db.day_id, orng.or_high, orng.or_low
    """,
)
def q_win_opening_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opening-range breakout census per (event type, day): the first
    two hours' high/low band, then how many later hourly closes broke
    above and below it — the ORB day-structure readout (many closes
    above = trend day up; closes on both sides = chop). Days whose
    opening window has no bars are dropped (documented — no band to
    break).

    Plan: bars from the q_ts_ohlc_bars hash aggregate; the opening
    band is a conditional MIN/MAX aggregate per (type, day) — integer
    hour-of-day arithmetic, no window at all — joined back to the
    day's bars (both sides ≤|types|·|days| after the bar collapse);
    one counting aggregate closes. Determinism: day and hour-of-day
    are exact integer div/mod; band bounds and closes compare as
    identical strict-inequality doubles; counts are BIGINTs — no
    rounding anywhere."""
    bars = _hourly_close(spark, sf_dir)
    db = bars.select(
        "event_type",
        "close",
        "high",
        "low",
        (F.col("hour_id") / 24).cast("bigint").alias("day_id"),
        (F.col("hour_id") % 24).alias("hod"),
    )
    orng = db.groupBy("event_type", "day_id").agg(
        F.max(F.when(F.col("hod") < _OR_HOURS, F.col("high"))).alias(
            "or_high"
        ),
        F.min(F.when(F.col("hod") < _OR_HOURS, F.col("low"))).alias(
            "or_low"
        ),
    ).filter(F.col("or_high").isNotNull())
    j = db.join(
        orng.select(
            F.col("event_type").alias("ot"),
            F.col("day_id").alias("od"),
            "or_high",
            "or_low",
        ),
        (F.col("event_type") == F.col("ot"))
        & (F.col("day_id") == F.col("od")),
    )
    later = F.col("hod") >= _OR_HOURS
    return j.groupBy("event_type", "day_id", "or_high", "or_low").agg(
        F.sum(
            F.when(later & (F.col("close") > F.col("or_high")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_above"),
        F.sum(
            F.when(later & (F.col("close") < F.col("or_low")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_below"),
    )


# Candle-pattern thresholds (fractions of the bar range / body).
_DOJI_FRAC = 0.1
_SHADOW_MULT = 2.0

_SQL_OHLC = """
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             max(CASE WHEN rna = 1 THEN value END) AS open,
             max(CASE WHEN rnd = 1 THEN value END) AS close,
             max(value) AS high, min(value) AS low
      FROM (
        SELECT event_type, ts, event_id, value,
               row_number() OVER (
                 PARTITION BY event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                 ORDER BY ts, event_id) AS rna,
               row_number() OVER (
                 PARTITION BY event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                 ORDER BY ts DESC, event_id DESC) AS rnd
        FROM events
      )
      GROUP BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
"""


@register(
    "q_win_candle_census",
    oracle=f"""
    WITH bars AS ({_SQL_OHLC}),
    c AS (
      SELECT event_type,
             high - low AS rng,
             abs(close - open) AS body,
             least(open, close) - low AS lower_sh,
             high - greatest(open, close) AS upper_sh,
             close, open
      FROM bars
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_bars,
           CAST(sum(CASE WHEN close > open THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bull,
           CAST(sum(CASE WHEN close < open THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bear,
           CAST(sum(CASE WHEN rng > 0.0
                    AND body <= {_DOJI_FRAC} * rng
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_doji,
           CAST(sum(CASE WHEN lower_sh >= {_SHADOW_MULT} * body
                    AND upper_sh <= body AND body > 0.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_hammer,
           CAST(sum(CASE WHEN upper_sh >= {_SHADOW_MULT} * body
                    AND lower_sh <= body AND body > 0.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_shooting
    FROM c GROUP BY event_type
    """,
)
def q_win_candle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick-pattern census per event type over full hourly OHLC
    bars (open = first value, close = last, by the (ts, event_id)
    total order): bull/bear bar counts plus three classic shapes —
    doji (body ≤ 10% of range, range > 0), hammer (lower shadow ≥ 2×
    a nonzero body, upper ≤ body) and shooting star (the mirror). The
    shape-vocabulary summary a pattern screener runs before any
    sequence rules; thresholds are the documented literals, strict
    comparisons, no lookback.

    Plan: one window pass computes BOTH edge picks (the two
    row_numbers share the (type, hour) partition — one exchange),
    then one (type, hour) hash aggregate to bars and one ≤|types|
    census fold. Determinism: opens/closes are unique total-order
    picks; every pattern predicate is IEEE comparisons and one
    multiply on identical doubles (least/greatest on plain DOUBLEs is
    safe — the decimal caveat doesn't apply); all outputs exact
    BIGINTs — no rounding anywhere."""
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
    wp = Window.partitionBy("event_type", "hour_id")
    wa = wp.orderBy("ts", "event_id")
    wd = wp.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    rn = base.select(
        "*",
        F.row_number().over(wa).alias("rna"),
        F.row_number().over(wd).alias("rnd"),
    )
    bars = rn.groupBy("event_type", "hour_id").agg(
        F.max(F.when(F.col("rna") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
    )
    o, cl, hi, lo = (
        F.col("open"),
        F.col("close"),
        F.col("high"),
        F.col("low"),
    )
    c = bars.select(
        "event_type",
        (hi - lo).alias("rng"),
        F.abs(cl - o).alias("body"),
        (F.least(o, cl) - lo).alias("lower_sh"),
        (hi - F.greatest(o, cl)).alias("upper_sh"),
        "close",
        "open",
    )
    body, rng = F.col("body"), F.col("rng")
    lsh, ush = F.col("lower_sh"), F.col("upper_sh")
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bars"),
        F.sum(F.when(cl > o, 1).otherwise(0)).cast("bigint").alias("n_bull"),
        F.sum(F.when(cl < o, 1).otherwise(0)).cast("bigint").alias("n_bear"),
        F.sum(
            F.when((rng > 0.0) & (body <= _DOJI_FRAC * rng), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_doji"),
        F.sum(
            F.when(
                (lsh >= _SHADOW_MULT * body)
                & (ush <= body)
                & (body > 0.0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hammer"),
        F.sum(
            F.when(
                (ush >= _SHADOW_MULT * body)
                & (lsh <= body)
                & (body > 0.0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_shooting"),
    )
