"""Streaming window aggregations + watermark/late-data + streaming
dedup — the "event stream aggregation" north star on Structured
Streaming.

Each builder takes an *unbounded* events DataFrame (schema of the
``events`` testdata table or the envelope) and returns the windowed
aggregate; the same code path works on a static DataFrame thanks to
Structured Streaming's batch/stream unification, which is exactly how
the batch twins in operators/windows.py verify these semantics.

Scale notes: watermarks bound the aggregation state (late rows beyond
the delay are dropped, state for closed windows is evicted);
``dropDuplicatesWithinWatermark`` bounds dedup state the same way —
without a watermark, streaming state grows without bound and a 100 TB/day
stream eventually OOMs its state store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ex_hivent_spark.functions.decimals import dsum


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per key (batch twin:
    q_win_tumbling_batch via date_trunc)."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.window(ts_col, window), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding-window counts per key (each event lands in
    window/slide overlapping windows)."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.window(ts_col, window, slide), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap — the
    streaming twin of q_win_sessionize (gaps-and-islands); equality on
    static data is asserted in tests (SURVEY.md §5.2.3)."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.session_window(ts_col, gap), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            "n_events",
            (F.unix_micros("last_ts") - F.unix_micros("first_ts")).alias(
                "duration_us"
            ),
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming dedup on event identity (≙ meta.uuid, memory.ex:90)
    with state bounded by the watermark."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def ohlc_bars(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Streaming OHLC candlestick bars per (key, tumbling window):
    open/close via min_by/max_by over the (ts, event_id) total order,
    high/low/volume as plain aggregates — the streaming twin of
    q_ts_ohlc_bars (operators/windows.py), which verifies these
    semantics on static data (min_by over the total order picks the
    same row the batch twin's row_number=1 does).

    State: one row per open (key, window) — min_by/max_by carry a
    single (value, ord) pair each, so state is O(1) per window, and
    the watermark evicts closed windows."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    ord_key = F.struct(F.col(ts_col), F.col("event_id"))
    return (
        src.groupBy(F.window(ts_col, window), key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min_by("value", ord_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ord_key).alias("close"),
            dsum("value", "volume"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            key_col,
            "n_events",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )
