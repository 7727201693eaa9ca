"""Volume-flow / rate-of-change indicator tail over the hourly bars:
Chaikin Money Flow (is volume backing the close's position in the
range?), Elder's Force Index (how much volume is behind each close
move?), Ease of Movement (how far does price travel per unit of
volume?), the Awesome Oscillator (fast-vs-slow median-price momentum),
the Percentage Price Oscillator (MACD normalized to a percentage so
series of different levels compare), and TRIX (triple-smoothed
rate-of-change) — the remaining volume-confirmation half of the
indicator layer next to finance.py's RSI/MACD/MFI/ADX family.

All smoothing is Cutler-style SIMPLE averaging (the q_win_rsi /
q_win_macd convention): SMA rides the decimal detour exactly, where
Wilder/EMA recursion would accumulate engine-ordered double error.

Plan discipline (finance.py's): ONE volume-carrying bar aggregate per
query, then constant-width rows-frames partitioned by event_type over
|hours| rows — time-grain bounded, traffic-invariant, no global sort.
Chained windows share the same (event_type, hour_id) sort so Catalyst
plans one exchange.

Determinism: bar extremes/closes are exact picks, volumes exact
integer counts, every computed double is e6-rounded BEFORE any decimal
re-aggregation, divisions are per-row IEEE ops, zero-range /
zero-denominator bars take the documented 0/NULL branch on both sides.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no indicator surface; these derive from the
driver's analytics mandate and standard technical-analysis practice
(Chaikin's CMF/A-D line, Elder's Force Index, Arms' EMV, Williams' AO,
PPO per standard charting references, Hutson's TRIX).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.finance import _SQL_VBARS, _hourly_vbars
from ex_hivent_spark.plans.registry import register

# Lookbacks, in hourly bars (textbook defaults).
_CMF_WIN = 20
_FI_WIN = 13
_EMV_WIN = 14
_AO_FAST = 5
_AO_SLOW = 34
_PPO_FAST = 12
_PPO_SLOW = 26
_PPO_SIG = 9
_TRIX_WIN = 15


def _type_hour_window(lo: int, hi: int = Window.currentRow):
    return (
        Window.partitionBy("event_type").orderBy("hour_id").rowsBetween(lo, hi)
    )


@register(
    "q_win_cmf",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    mf AS (
      SELECT event_type, hour_id, vol,
             CASE WHEN high = low THEN 0.0
                  ELSE {sql_dround(
                      "((close - low) - (high - close)) / (high - low)"
                      " * vol", 6)}
             END AS mfv
      FROM bars
    ),
    rolled AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             CAST(sum(CAST(mfv AS DECIMAL(25,6))) OVER w AS DOUBLE)
               AS mfv_sum,
             CAST(sum(vol) OVER w AS BIGINT) AS vol_sum
      FROM mf
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_CMF_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, mfv_sum,
           CAST(vol_sum AS BIGINT) AS vol_sum,
           {sql_dround("mfv_sum / vol_sum", 6)} AS cmf20
    FROM rolled WHERE nbar = {_CMF_WIN}
    """,
)
def q_win_cmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaikin Money Flow (CMF-20) per event type: each bar's money
    flow multiplier ((C−L)−(H−C))/(H−L) — +1 when the close pins the
    high, −1 when it pins the low, 0 on a zero-range bar (textbook
    convention) — times volume, summed over the trailing 20 bars and
    normalized by the 20-bar volume sum. CMF > 0 says volume is
    concentrating on strong closes (accumulation), < 0 on weak ones
    (distribution) — the does-volume-back-the-level gauge next to
    q_win_mfi's does-volume-back-the-move.

    Plan: one volume-carrying bar aggregate, one rolling-sum window
    over |hours| rows per type (time-grain bounded). Determinism: the
    multiplier×volume product is e6-rounded before its decimal rolling
    sum, the volume sum is an exact integer, and the closing ratio is
    e6-rounded; vol_sum ≥ 1 whenever a bar exists so the division
    cannot hit zero."""
    bars = _hourly_vbars(spark, sf_dir)
    mfv = bars.select(
        "event_type",
        "hour_id",
        "vol",
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
    w = _type_hour_window(-(_CMF_WIN - 1))
    rolled = mfv.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        F.sum(F.col("mfv").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("mfv_sum"),
        F.sum("vol").over(w).cast("bigint").alias("vol_sum"),
    ).filter(F.col("nbar") == _CMF_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        "mfv_sum",
        "vol_sum",
        dround(F.col("mfv_sum") / F.col("vol_sum"), 6).alias("cmf20"),
    )


@register(
    "q_win_force_index",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    chg AS (
      SELECT event_type, hour_id,
             {sql_dround(
                 "(close - lag(close) OVER (PARTITION BY event_type"
                 " ORDER BY hour_id)) * vol", 6)} AS fi_raw
      FROM bars
    ),
    rolled AS (
      SELECT event_type, hour_id, fi_raw,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             CAST(sum(CAST(fi_raw AS DECIMAL(25,6))) OVER w AS DOUBLE)
                 / {_FI_WIN} AS fi_ma
      FROM chg WHERE fi_raw IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_FI_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, fi_raw,
           {sql_dround("fi_ma", 6)} AS fi13
    FROM rolled WHERE nbar = {_FI_WIN}
    """,
)
def q_win_force_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elder's Force Index per event type: raw force = (close −
    prev close) × volume — the size of the move weighted by how many
    events drove it — smoothed with an SMA-13 (Cutler substitution for
    Elder's EMA-13). Sign flips of the smoothed line mark
    volume-confirmed momentum reversals on a metric stream.

    Plan: one volume-carrying bar aggregate, a lag and one rolling
    mean over the same per-type hour sort (one exchange, time-grain
    bounded frames). Determinism: the close-change×volume product is
    e6-rounded before the decimal rolling sum; the mean divides by an
    integer literal; the closing is e6-rounded."""
    bars = _hourly_vbars(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    chg = bars.select(
        "event_type",
        "hour_id",
        dround(
            (F.col("close") - F.lag("close").over(wl)) * F.col("vol"), 6
        ).alias("fi_raw"),
    ).filter(F.col("fi_raw").isNotNull())
    w = _type_hour_window(-(_FI_WIN - 1))
    rolled = chg.select(
        "event_type",
        "hour_id",
        "fi_raw",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        (
            F.sum(F.col("fi_raw").cast("decimal(25,6)"))
            .over(w)
            .cast("double")
            / _FI_WIN
        ).alias("fi_ma"),
    ).filter(F.col("nbar") == _FI_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        "fi_raw",
        dround(F.col("fi_ma"), 6).alias("fi13"),
    )


@register(
    "q_win_emv",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    mid AS (
      SELECT event_type, hour_id, high, low, vol,
             (high + low) / 2.0 AS mp
      FROM bars
    ),
    raw AS (
      SELECT event_type, hour_id,
             CASE WHEN high = low THEN 0.0
                  ELSE {sql_dround(
                      "(mp - lag(mp) OVER (PARTITION BY event_type"
                      " ORDER BY hour_id)) * (high - low) / vol", 6)}
             END AS emv_raw
      FROM mid
      QUALIFY lag(mp) OVER (PARTITION BY event_type
                            ORDER BY hour_id) IS NOT NULL
    ),
    rolled AS (
      SELECT event_type, hour_id, emv_raw,
             CAST(count(*) OVER w AS BIGINT) AS nbar,
             CAST(sum(CAST(emv_raw AS DECIMAL(25,6))) OVER w AS DOUBLE)
                 / {_EMV_WIN} AS emv_ma
      FROM raw
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_EMV_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, emv_raw,
           {sql_dround("emv_ma", 6)} AS emv14
    FROM rolled WHERE nbar = {_EMV_WIN}
    """,
)
def q_win_emv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arms' Ease of Movement (EMV-14) per event type: distance moved
    (midpoint change) divided by the box ratio (volume per unit of
    range), i.e. Δmid × (high − low) / volume — how far the level
    travels per event of effort; a zero-range bar reads 0 (no box).
    High EMV = the metric drifts on thin traffic; near-zero = heavy
    traffic pins it. SMA-14 smoothing per the textbook.

    Plan: one volume-carrying bar aggregate, a lag + one rolling mean
    over the per-type hour sort (one exchange, bounded frames).
    Determinism: midpoints are exact IEEE halves of exact bar
    extremes, the per-row Δmid×range/vol chain is IEEE-deterministic
    and e6-rounded before the decimal rolling sum; vol ≥ 1 whenever a
    bar exists."""
    bars = _hourly_vbars(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    mid = bars.select(
        "event_type",
        "hour_id",
        "high",
        "low",
        "vol",
        ((F.col("high") + F.col("low")) / 2.0).alias("mp"),
    )
    raw = (
        mid.select(
            "event_type",
            "hour_id",
            "high",
            "low",
            "vol",
            "mp",
            F.lag("mp").over(wl).alias("pmp"),
        )
        .filter(F.col("pmp").isNotNull())
        .select(
            "event_type",
            "hour_id",
            F.when(F.col("high") == F.col("low"), F.lit(0.0))
            .otherwise(
                dround(
                    (F.col("mp") - F.col("pmp"))
                    * (F.col("high") - F.col("low"))
                    / F.col("vol"),
                    6,
                )
            )
            .alias("emv_raw"),
        )
    )
    w = _type_hour_window(-(_EMV_WIN - 1))
    rolled = raw.select(
        "event_type",
        "hour_id",
        "emv_raw",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nbar"),
        (
            F.sum(F.col("emv_raw").cast("decimal(25,6)"))
            .over(w)
            .cast("double")
            / _EMV_WIN
        ).alias("emv_ma"),
    ).filter(F.col("nbar") == _EMV_WIN)
    return rolled.select(
        "event_type",
        "hour_id",
        "emv_raw",
        dround(F.col("emv_ma"), 6).alias("emv14"),
    )


@register(
    "q_win_awesome_osc",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    mid AS (
      SELECT event_type, hour_id,
             {sql_dround("(high + low) / 2.0", 6)} AS mp
      FROM bars
    ),
    ma AS (
      SELECT event_type, hour_id, mp,
             CAST(count(*) OVER ws AS BIGINT) AS nslow,
             CAST(sum(CAST(mp AS DECIMAL(25,6))) OVER wf AS DOUBLE)
                 / {_AO_FAST} AS fast_ma,
             CAST(sum(CAST(mp AS DECIMAL(25,6))) OVER ws AS DOUBLE)
                 / {_AO_SLOW} AS slow_ma
      FROM mid
      WINDOW wf AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_AO_FAST - 1} PRECEDING
                    AND CURRENT ROW),
             ws AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_AO_SLOW - 1} PRECEDING
                    AND CURRENT ROW)
    ),
    ao AS (
      SELECT event_type, hour_id,
             {sql_dround("fast_ma - slow_ma", 6)} AS ao
      FROM ma WHERE nslow = {_AO_SLOW}
    )
    SELECT event_type, hour_id, ao,
           CASE WHEN ao > lag(ao) OVER w THEN 1
                WHEN ao < lag(ao) OVER w THEN -1 ELSE 0 END AS ao_color
    FROM ao
    WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    QUALIFY lag(ao) OVER (PARTITION BY event_type
                          ORDER BY hour_id) IS NOT NULL
    """,
)
def q_win_awesome_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams' Awesome Oscillator per event type: SMA-5 minus SMA-34
    of the bar midpoint (H+L)/2 — fast-vs-slow momentum of the level
    itself rather than the close, with the classic bar "color" (+1
    rising, −1 falling, 0 flat vs the previous AO value) that drives
    the saucer/twin-peaks signals.

    Plan: one bar aggregate, two rolling means + one lag over the SAME
    per-type hour sort — one exchange, constant-width frames.
    Determinism: midpoints e6-rounded before their decimal rolling
    sums, both means divide by integer literals, AO is e6-rounded
    before the lag comparison so both engines color identical values."""
    bars = _hourly_vbars(spark, sf_dir)
    mid = bars.select(
        "event_type",
        "hour_id",
        dround((F.col("high") + F.col("low")) / 2.0, 6).alias("mp"),
    )
    wf = _type_hour_window(-(_AO_FAST - 1))
    ws = _type_hour_window(-(_AO_SLOW - 1))
    ma = mid.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(ws).cast("bigint").alias("nslow"),
        (
            F.sum(F.col("mp").cast("decimal(25,6)")).over(wf).cast("double")
            / _AO_FAST
        ).alias("fast_ma"),
        (
            F.sum(F.col("mp").cast("decimal(25,6)")).over(ws).cast("double")
            / _AO_SLOW
        ).alias("slow_ma"),
    )
    ao = ma.filter(F.col("nslow") == _AO_SLOW).select(
        "event_type",
        "hour_id",
        dround(F.col("fast_ma") - F.col("slow_ma"), 6).alias("ao"),
    )
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    out = ao.select(
        "event_type",
        "hour_id",
        "ao",
        F.lag("ao").over(wl).alias("pao"),
    ).filter(F.col("pao").isNotNull())
    return out.select(
        "event_type",
        "hour_id",
        "ao",
        F.when(F.col("ao") > F.col("pao"), 1)
        .when(F.col("ao") < F.col("pao"), -1)
        .otherwise(0)
        .cast("int")
        .alias("ao_color"),
    )


@register(
    "q_win_ppo",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    ma AS (
      SELECT event_type, hour_id, close,
             CAST(count(*) OVER ws AS BIGINT) AS nslow,
             CAST(sum(CAST(close AS DECIMAL(25,6))) OVER wf AS DOUBLE)
                 / {_PPO_FAST} AS fast_ma,
             CAST(sum(CAST(close AS DECIMAL(25,6))) OVER ws AS DOUBLE)
                 / {_PPO_SLOW} AS slow_ma
      FROM bars
      WINDOW wf AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_PPO_FAST - 1} PRECEDING
                    AND CURRENT ROW),
             ws AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_PPO_SLOW - 1} PRECEDING
                    AND CURRENT ROW)
    ),
    line AS (
      SELECT event_type, hour_id,
             {sql_dround("100.0 * (fast_ma - slow_ma) / slow_ma", 6)}
               AS ppo
      FROM ma WHERE nslow = {_PPO_SLOW} AND slow_ma <> 0
    ),
    sig AS (
      SELECT event_type, hour_id, ppo,
             CAST(count(*) OVER w AS BIGINT) AS nsig,
             CAST(sum(CAST(ppo AS DECIMAL(25,6))) OVER w AS DOUBLE)
                 / {_PPO_SIG} AS sig_raw
      FROM line
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_PPO_SIG - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, ppo,
           {sql_dround("sig_raw", 6)} AS signal_line,
           {sql_dround(f"ppo - ({sql_dround('sig_raw', 6)})", 6)}
               AS histogram
    FROM sig WHERE nsig = {_PPO_SIG}
    """,
)
def q_win_ppo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage Price Oscillator per event type: 100·(SMA-12 −
    SMA-26)/SMA-26 of the close — q_win_macd's spread normalized by
    the slow average so oscillations compare ACROSS event types whose
    levels differ by orders of magnitude; signal = SMA-9 of the line,
    histogram = line − signal. Cutler-style SMA substitution
    throughout. Bars where the slow average is exactly zero (a
    26-hour run of zero closes) are dropped — the percentage is
    undefined there — identically on both sides.

    Plan: one bar aggregate, two window passes over the same per-type
    hour sort (one exchange; constant-width frames). Determinism:
    decimal rolling sums over exact closes, integer-literal divisors,
    ppo e6-rounded BEFORE the signal window so both engines aggregate
    identical inputs."""
    bars = _hourly_vbars(spark, sf_dir)
    wf = _type_hour_window(-(_PPO_FAST - 1))
    ws = _type_hour_window(-(_PPO_SLOW - 1))
    ma = bars.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(ws).cast("bigint").alias("nslow"),
        (
            F.sum(F.col("close").cast("decimal(25,6)"))
            .over(wf)
            .cast("double")
            / _PPO_FAST
        ).alias("fast_ma"),
        (
            F.sum(F.col("close").cast("decimal(25,6)"))
            .over(ws)
            .cast("double")
            / _PPO_SLOW
        ).alias("slow_ma"),
    )
    line = ma.filter(
        (F.col("nslow") == _PPO_SLOW) & (F.col("slow_ma") != 0)
    ).select(
        "event_type",
        "hour_id",
        dround(
            100.0 * (F.col("fast_ma") - F.col("slow_ma")) / F.col("slow_ma"),
            6,
        ).alias("ppo"),
    )
    wsig = _type_hour_window(-(_PPO_SIG - 1))
    sig = line.select(
        "event_type",
        "hour_id",
        "ppo",
        F.count(F.lit(1)).over(wsig).cast("bigint").alias("nsig"),
        (
            F.sum(F.col("ppo").cast("decimal(25,6)"))
            .over(wsig)
            .cast("double")
            / _PPO_SIG
        ).alias("sig_raw"),
    ).filter(F.col("nsig") == _PPO_SIG)
    sig_r = dround(F.col("sig_raw"), 6)
    return sig.select(
        "event_type",
        "hour_id",
        "ppo",
        sig_r.alias("signal_line"),
        dround(F.col("ppo") - sig_r, 6).alias("histogram"),
    )


@register(
    "q_win_trix",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    s1 AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS n1,
             {sql_dround(
                 f"CAST(sum(CAST(close AS DECIMAL(25,6))) OVER w"
                 f" AS DOUBLE) / {_TRIX_WIN}", 6)} AS m1
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_TRIX_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    s2 AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS n2,
             {sql_dround(
                 f"CAST(sum(CAST(m1 AS DECIMAL(25,6))) OVER w"
                 f" AS DOUBLE) / {_TRIX_WIN}", 6)} AS m2
      FROM s1 WHERE n1 = {_TRIX_WIN}
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_TRIX_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    ),
    s3 AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER w AS BIGINT) AS n3,
             {sql_dround(
                 f"CAST(sum(CAST(m2 AS DECIMAL(25,6))) OVER w"
                 f" AS DOUBLE) / {_TRIX_WIN}", 6)} AS m3
      FROM s2 WHERE n2 = {_TRIX_WIN}
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_TRIX_WIN - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, m3 AS smooth3,
           {sql_dround(
               "10000.0 * (m3 - lag(m3) OVER (PARTITION BY event_type"
               " ORDER BY hour_id))"
               " / lag(m3) OVER (PARTITION BY event_type"
               " ORDER BY hour_id)", 6)} AS trix_bp
    FROM s3 WHERE n3 = {_TRIX_WIN}
    QUALIFY lag(m3) OVER (PARTITION BY event_type ORDER BY hour_id)
              IS NOT NULL
        AND lag(m3) OVER (PARTITION BY event_type ORDER BY hour_id) <> 0
    """,
)
def q_win_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIX per event type: one-bar rate of change (in basis points)
    of the TRIPLE-smoothed close, SMA-15 applied three times (Cutler
    substitution for Hutson's triple EMA). The triple pass strips
    cycles shorter than the window so the sign of TRIX is a heavily
    de-noised trend direction; bars whose previous triple-smooth is
    zero are dropped (undefined ratio) on both sides.

    Plan: one bar aggregate then three chained rolling means + one lag
    over the SAME per-type hour sort — Catalyst plans one exchange and
    sorts once; every frame is constant-width over |hours| rows per
    type. Determinism: each smoothing stage is e6-rounded before the
    next stage's decimal sum (both engines re-aggregate identical
    inputs); the closing ratio is one IEEE chain, e6-rounded."""
    bars = _hourly_vbars(spark, sf_dir)
    w = _type_hour_window(-(_TRIX_WIN - 1))

    def _sma(frame: DataFrame, src: str, n_alias: str, m_alias: str):
        return frame.select(
            "event_type",
            "hour_id",
            F.count(F.lit(1)).over(w).cast("bigint").alias(n_alias),
            dround(
                F.sum(F.col(src).cast("decimal(25,6)"))
                .over(w)
                .cast("double")
                / _TRIX_WIN,
                6,
            ).alias(m_alias),
        ).filter(F.col(n_alias) == _TRIX_WIN)

    s1 = _sma(bars.select("event_type", "hour_id", "close"), "close", "n1", "m1")
    s2 = _sma(s1, "m1", "n2", "m2")
    s3 = _sma(s2, "m2", "n3", "m3")
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    lagged = s3.select(
        "event_type",
        "hour_id",
        "m3",
        F.lag("m3").over(wl).alias("pm3"),
    ).filter(F.col("pm3").isNotNull() & (F.col("pm3") != 0))
    return lagged.select(
        "event_type",
        "hour_id",
        F.col("m3").alias("smooth3"),
        dround(
            10000.0 * (F.col("m3") - F.col("pm3")) / F.col("pm3"), 6
        ).alias("trix_bp"),
    )


# Coppock curve lookbacks: ROC periods and the WMA length.
_COP_ROC_A = 14
_COP_ROC_B = 11
_COP_WMA = 10
# Triangular weight total: 10+9+...+1.
_COP_WSUM = _COP_WMA * (_COP_WMA + 1) // 2

# Left-associative weighted-sum spelling shared by both engines: the
# per-row chain 10*x + 9*lag1 + ... + 1*lag9 is fixed-order IEEE
# arithmetic, so no aggregation (and no decimal detour) is needed.
_COP_SQL_WSUM = " + ".join(
    f"{_COP_WMA - k} * l{k}" if k else f"{_COP_WMA} * roc_sum"
    for k in range(_COP_WMA)
)


@register(
    "q_win_coppock",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    roc AS (
      SELECT event_type, hour_id,
             lag(close, {_COP_ROC_A}) OVER w AS ca,
             lag(close, {_COP_ROC_B}) OVER w AS cb,
             close
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    ),
    rs AS (
      SELECT event_type, hour_id,
             {sql_dround(
                 "100.0 * (close / ca - 1.0)"
                 " + 100.0 * (close / cb - 1.0)", 6)} AS roc_sum
      FROM roc WHERE ca IS NOT NULL AND ca > 0
                 AND cb IS NOT NULL AND cb > 0
    ),
    lagged AS (
      SELECT event_type, hour_id, roc_sum,
             {", ".join(
                 f"lag(roc_sum, {k}) OVER w AS l{k}"
                 for k in range(1, _COP_WMA))}
      FROM rs
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id)
    )
    SELECT event_type, hour_id, roc_sum,
           {sql_dround(f"({_COP_SQL_WSUM}) / {_COP_WSUM}.0", 6)}
             AS coppock
    FROM lagged WHERE l{_COP_WMA - 1} IS NOT NULL
    """,
)
def q_win_coppock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coppock curve per event type: the 10-bar LINEARLY-weighted
    moving average (weights 10..1, newest heaviest) of ROC-14 + ROC-11
    of the close — the long-horizon momentum gauge whose upturn from
    negative territory is the classic buy signal, here a recovery
    detector on a metric stream. Bars whose 14- or 11-back close is
    missing or zero (undefined ratio) are dropped identically on both
    sides; the WMA runs over the SURVIVING rate-of-change series.

    Plan: one volume-carrying bar aggregate, then lag windows over the
    same per-type hour sort (one exchange; the triangular weighting is
    9 lags, constant per row — no frame aggregation at all).
    Determinism: the ROC sum is one IEEE chain e6-rounded; the
    weighted sum is a FIXED-ORDER left-associative chain of
    integer-weighted e6 values (identical in both engines, no
    summation-order freedom), closed by one division and e6-rounded."""
    bars = _hourly_vbars(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    roc = bars.select(
        "event_type",
        "hour_id",
        "close",
        F.lag("close", _COP_ROC_A).over(wl).alias("ca"),
        F.lag("close", _COP_ROC_B).over(wl).alias("cb"),
    )
    rs = roc.filter(
        F.col("ca").isNotNull()
        & (F.col("ca") > 0)
        & F.col("cb").isNotNull()
        & (F.col("cb") > 0)
    ).select(
        "event_type",
        "hour_id",
        dround(
            100.0 * (F.col("close") / F.col("ca") - 1.0)
            + 100.0 * (F.col("close") / F.col("cb") - 1.0),
            6,
        ).alias("roc_sum"),
    )
    lag_cols = [
        F.lag("roc_sum", k).over(wl).alias(f"l{k}")
        for k in range(1, _COP_WMA)
    ]
    lagged = rs.select("event_type", "hour_id", "roc_sum", *lag_cols)
    wsum = F.lit(float(_COP_WMA)) * F.col("roc_sum")
    for k in range(1, _COP_WMA):
        wsum = wsum + F.lit(float(_COP_WMA - k)) * F.col(f"l{k}")
    return lagged.filter(
        F.col(f"l{_COP_WMA - 1}").isNotNull()
    ).select(
        "event_type",
        "hour_id",
        "roc_sum",
        dround(wsum / float(_COP_WSUM), 6).alias("coppock"),
    )


# PVO fast/slow/signal lookbacks (the PPO/MACD 12/26/9 applied to
# volume).
_PVO_FAST = 12
_PVO_SLOW = 26
_PVO_SIG = 9


@register(
    "q_win_pvo",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    sm AS (
      SELECT event_type, hour_id,
             CAST(count(*) OVER ws AS BIGINT) AS nbar,
             CAST(sum(vol) OVER wf AS BIGINT) AS vf,
             CAST(sum(vol) OVER ws AS BIGINT) AS vs
      FROM bars
      WINDOW wf AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_PVO_FAST - 1} PRECEDING
                    AND CURRENT ROW),
             ws AS (PARTITION BY event_type ORDER BY hour_id
                    ROWS BETWEEN {_PVO_SLOW - 1} PRECEDING
                    AND CURRENT ROW)
    ),
    pv AS (
      SELECT event_type, hour_id,
             {sql_dround(
                 f"100.0 * (CAST(vf AS DOUBLE) / {_PVO_FAST}"
                 f" - CAST(vs AS DOUBLE) / {_PVO_SLOW})"
                 f" / (CAST(vs AS DOUBLE) / {_PVO_SLOW})", 6)} AS pvo
      FROM sm WHERE nbar = {_PVO_SLOW}
    ),
    sg AS (
      SELECT event_type, hour_id, pvo,
             CAST(count(*) OVER w AS BIGINT) AS nsig,
             {sql_dround(
                 "CAST(sum(CAST(pvo AS DECIMAL(25,6))) OVER w"
                 f" AS DOUBLE) / {_PVO_SIG}", 6)} AS signal
      FROM pv
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN {_PVO_SIG - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, hour_id, pvo, signal,
           {sql_dround("pvo - signal", 6)} AS pvo_hist
    FROM sg WHERE nsig = {_PVO_SIG}
    """,
)
def q_win_pvo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage Volume Oscillator: the PPO construction applied to
    per-bar VOLUME — 100·(SMA₁₂(vol) − SMA₂₆(vol))/SMA₂₆(vol), with
    its 9-bar signal line and histogram. PVO > 0 says volume is
    running above its own baseline (participation confirms whatever
    price is doing); the volume twin of q_win_ppo. Simple averaging
    throughout (the module convention). The denominator cannot be
    zero: every bar has vol ≥ 1 by construction (a bar exists only
    where events did), so a full 26-bar window sums ≥ 26.

    Plan: one volume-carrying bar aggregate, two same-sort rolling
    windows + one signal window over |hours| rows per type.
    Determinism: volume sums are exact integers; the SMA divisions
    are deterministic double ops; pvo e6-rounds before the decimal
    signal average; signal and histogram e6-round."""
    bars = _hourly_vbars(spark, sf_dir)
    wf = _type_hour_window(-(_PVO_FAST - 1))
    ws = _type_hour_window(-(_PVO_SLOW - 1))
    sm = bars.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(ws).cast("bigint").alias("nbar"),
        F.sum("vol").over(wf).cast("bigint").alias("vf"),
        F.sum("vol").over(ws).cast("bigint").alias("vs"),
    ).filter(F.col("nbar") == _PVO_SLOW)
    fast = F.col("vf").cast("double") / _PVO_FAST
    slow = F.col("vs").cast("double") / _PVO_SLOW
    pv = sm.select(
        "event_type",
        "hour_id",
        dround(100.0 * (fast - slow) / slow, 6).alias("pvo"),
    )
    wsig = _type_hour_window(-(_PVO_SIG - 1))
    sg = pv.select(
        "event_type",
        "hour_id",
        "pvo",
        F.count(F.lit(1)).over(wsig).cast("bigint").alias("nsig"),
        dround(
            F.sum(F.col("pvo").cast("decimal(25,6)"))
            .over(wsig)
            .cast("double")
            / _PVO_SIG,
            6,
        ).alias("signal"),
    ).filter(F.col("nsig") == _PVO_SIG)
    return sg.select(
        "event_type",
        "hour_id",
        "pvo",
        "signal",
        dround(F.col("pvo") - F.col("signal"), 6).alias("pvo_hist"),
    )


@register(
    "q_win_nvi",
    oracle=f"""
    WITH bars AS ({_SQL_VBARS}),
    lagged AS (
      SELECT event_type, hour_id, close, vol,
             lag(close) OVER (PARTITION BY event_type
                              ORDER BY hour_id) AS pc,
             lag(vol) OVER (PARTITION BY event_type
                            ORDER BY hour_id) AS pv
      FROM bars
    ),
    terms AS (
      SELECT event_type, hour_id,
             CASE WHEN pv IS NOT NULL AND vol < pv
                       AND close > 0 AND pc > 0
                  THEN {sql_dround("ln(close / pc)", 6)}
                  ELSE 0.0 END AS term,
             CASE WHEN pv IS NOT NULL AND vol < pv THEN 1
                  ELSE 0 END AS is_down_vol
      FROM lagged
    ),
    cum AS (
      SELECT event_type, hour_id,
             CAST(sum(CAST(term AS DECIMAL(25,6))) OVER w AS DOUBLE)
               AS nvi_log,
             CAST(sum(is_down_vol) OVER w AS BIGINT) AS n_down_vol
      FROM terms
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour_id, n_down_vol,
           {sql_dround("nvi_log", 6)} AS nvi_log
    FROM cum
    """,
)
def q_win_nvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative Volume Index (Fosback): a cumulative index that
    applies the bar's close-to-close return ONLY on falling-volume
    bars — the "what the smart money does on quiet hours" tracker
    (its mirror, PVI, moves on rising volume). Computed in LOG space
    so the cumulative product becomes an exact prefix SUM:
    log-NVI = Σ ln(cₜ/cₜ₋₁)·[volₜ < volₜ₋₁], reported as the log
    level plus the count of down-volume bars. The exponentiated
    1000·exp(·) display level is deliberately NOT emitted: on this
    synthetic series the log level reaches ~18, where the level's
    magnitude (~1e10) puts the e6 rounding grid BELOW one double ulp
    of exp() — un-hash-checkable; clients exponentiate at render
    time (order-preserving, so every signal reads off the log level
    directly). Bars with a
    non-positive close on either side of the step contribute 0 (the
    value = 0 rows that first appear at sf0.1 have no log-return —
    the q_agg_geometric_mean guard convention).

    Plan: one volume-carrying bar aggregate, one lag + one cumulative
    window per type over |hours| rows (hour_id is unique per type —
    the ROWS frame is deterministic without a tiebreaker).
    Determinism: each ln is e6-rounded per row; the prefix sum rides
    decimal(25,6) (|Σ| bounded by bars × max|ln-step|, far inside
    2^53)."""
    bars = _hourly_vbars(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("hour_id")
    lagged = bars.select(
        "event_type",
        "hour_id",
        "close",
        "vol",
        F.lag("close").over(wl).alias("pc"),
        F.lag("vol").over(wl).alias("pv"),
    )
    down = F.col("pv").isNotNull() & (F.col("vol") < F.col("pv"))
    terms = lagged.select(
        "event_type",
        "hour_id",
        F.when(
            down & (F.col("close") > 0) & (F.col("pc") > 0),
            dround(F.log(F.col("close") / F.col("pc")), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("term"),
        F.when(down, 1).otherwise(0).alias("is_down_vol"),
    )
    wc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = terms.select(
        "event_type",
        "hour_id",
        F.sum(F.col("term").cast("decimal(25,6)"))
        .over(wc)
        .cast("double")
        .alias("nvi_log"),
        F.sum("is_down_vol").over(wc).cast("bigint").alias("n_down_vol"),
    )
    return cum.select(
        "event_type",
        "hour_id",
        "n_down_vol",
        dround(F.col("nvi_log"), 6).alias("nvi_log"),
    )
