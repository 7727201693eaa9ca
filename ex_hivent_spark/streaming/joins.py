"""Stream-stream joins with event-time bounds.

The reference consumes one topic per consumer (consumer.ex:105-107);
correlating two event streams (e.g. view→click attribution) is the
natural extension a stream analytics engine needs. On Structured
Streaming, a stream-stream inner join is stateful: each side buffers
rows until the watermark plus the join's time bound proves no future
match can arrive, so BOTH watermarks and a range condition on event
time are mandatory — without them state grows forever (the 100 TB/day
failure mode).

The same builder works on static DataFrames (batch/stream unification),
which is how tests assert the streaming result equals the batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    watermark: str | None = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event happens
    within ``(left_ts, left_ts + within]``.

    ``how='inner'`` emits matches as they are found; ``how='leftOuter'``
    additionally emits each unmatched left row — with null right
    columns — once the watermark proves no matching right event can
    still arrive (standard stream-stream outer-join semantics: the
    null result is DELAYED until the time bound expires, it cannot be
    retracted later). Outer joins therefore require a watermark.

    Columns must be pre-renamed so the two sides don't collide (the
    caller picks ``left_ts``/``right_ts`` names). State retention per
    side is bounded by ``watermark + within``.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"interval_join: unsupported how={how!r}")
    if how == "leftOuter" and watermark is None:
        raise ValueError(
            "interval_join: leftOuter requires a watermark — without "
            "one the engine can never prove a left row is unmatched"
        )
    l_src = left.withWatermark(left_ts, watermark) if watermark else left
    r_src = right.withWatermark(right_ts, watermark) if watermark else right
    cond = (
        (l_src[key] == r_src[key])
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l_src.join(r_src, cond, how).select(
        l_src[key].alias(key),
        F.col(left_ts),
        F.col(right_ts),
        (F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts))).alias(
            "lag_us"
        ),
    )
