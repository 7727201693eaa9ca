"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` within the same key group.

Spark has no native ASOF JOIN. The scalable implementation here avoids
the naive inequality-join + row_number (which materializes every
(left, right) candidate pair — quadratic within a key) and instead uses
the union + ordered-window approach:

1. union left and right rows tagged by side, carrying the right payload
   as a nullable struct;
2. one shuffle on the key, one sort by (ts, side, seq) within each key —
   right rows sort *before* left rows at equal ts (inclusive match);
3. ``last(right_struct, ignorenulls=True)`` over rows
   unboundedPreceding..currentRow picks, for each left row, the most
   recent right row at-or-before it.

Cost: one shuffle + one sort over |L|+|R| rows — O(n log n), no pair
blow-up, skew handled by AQE. This is the plan you'd want at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_seq: str | None = None,
) -> DataFrame:
    """Left as-of (backward, inclusive) join.

    Returns every ``left`` row plus one struct column ``asof`` holding the
    matched right row's columns (null struct if no right row precedes).
    ``right_seq`` breaks ties among right rows sharing a timestamp
    (largest wins, matching ``ORDER BY ts DESC, seq DESC LIMIT 1``).
    """
    r_struct = F.struct(*[F.col(c) for c in right.columns]).alias("__r")
    r_side = right.select(
        F.col(by).alias("__by"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(right_seq) if right_seq else F.lit(0)).cast("long").alias("__seq"),
        r_struct,
    )
    r_struct_type = r_side.schema["__r"].dataType

    l_side = left.select(
        F.col(by).alias("__by"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__seq"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r_side = r_side.withColumn("__l", F.lit(None).cast(l_side.schema["__l"].dataType))

    unioned = l_side.unionByName(r_side)
    w = (
        Window.partitionBy("__by")
        .orderBy("__ts", "__side", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("asof", F.last("__r", ignorenulls=True).over(w))
    return matched.filter(F.col("__side") == 1).select("__l.*", "asof")
