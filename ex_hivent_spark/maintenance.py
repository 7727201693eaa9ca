"""Table maintenance: small-file compaction.

Streaming sinks and partitioned appends accumulate small files (one per
micro-batch per partition); at 100 TB the resulting file-listing and
per-file open costs dominate scan time long before data volume does.
Compaction rewrites a table directory into ~target-sized files — the
routine maintenance job every file-based lakehouse runs.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    min_files: int = 1,
) -> int:
    """Rewrite ``path`` into ceil(bytes / target) parquet files.

    Returns the output file count. Uses a staging-dir swap so a crash
    mid-compaction never leaves the table truncated: readers see either
    the old layout or the new one.
    """
    sc = spark.sparkContext
    hadoop = sc._jvm.org.apache.hadoop
    conf = sc._jsc.hadoopConfiguration()
    fs = hadoop.fs.FileSystem.get(conf)
    p = hadoop.fs.Path(path)
    size = fs.getContentSummary(p).getLength()
    n_files = max(min_files, math.ceil(size / (target_file_mb * 1024 * 1024)))

    staging = f"{path}__compacting"
    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("overwrite").parquet(staging)

    backup = hadoop.fs.Path(f"{path}__old")
    fs.delete(backup, True)
    fs.rename(p, backup)
    fs.rename(hadoop.fs.Path(staging), p)
    fs.delete(backup, True)
    return n_files


def zorder_write(
    spark: SparkSession,
    df,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` z-ordered on two numeric columns: rows are sorted
    along a Morton (bit-interleaved) space-filling curve, so parquet
    min/max footer stats become selective on BOTH columns at once —
    2-D predicate data skipping, where a plain sort only skips on its
    leading column. The standard lakehouse OPTIMIZE ZORDER layout,
    expressed as: normalize each column to ``bits`` levels, interleave
    bits JVM-side, range-partition on the z-value, drop it.

    One tiny pre-pass collects the two min/max pairs (4 scalars); the
    write itself is one range exchange + local sort.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).collect()[0]
    x_min, x_max, y_min, y_max = (float(v) for v in stats)
    levels = (1 << bits) - 1

    def _norm(col: str, lo: float, hi: float):
        span = (hi - lo) or 1.0
        return F.least(
            F.lit(levels),
            F.floor((F.col(col).cast("double") - lo) / span * levels),
        ).cast("long")

    zx, zy = _norm(col_x, x_min, x_max), _norm(col_y, y_min, y_max)
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(zx, b).bitwiseAND(1), 2 * b))
        terms.append(F.shiftleft(F.shiftright(zy, b).bitwiseAND(1), 2 * b + 1))
    zval = terms[0]
    for t in terms[1:]:
        zval = zval + t

    (
        df.withColumn("__z", zval)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def refresh_time_rollup(
    spark: SparkSession,
    events_path: str,
    rollup_path: str,
    processed_marker: str,
) -> int:
    """Incrementally maintain an hourly (window_start, event_type) →
    (n_events, sum_value) rollup: aggregate only source files not yet
    recorded in the marker file, merge into the existing rollup by
    SUMMING partials (count and decimal-sum are both associative, so
    merging partial aggregates is exact), and publish via staging swap.

    This is the batch form of a continuous aggregate: cost per refresh
    is O(new data) + O(|rollup|), never O(all history) — the property
    that keeps a 100 TB/day rollup maintainable. Returns the number of
    newly processed files.
    """
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    done: set[str] = set()
    if os.path.exists(processed_marker):
        with open(processed_marker) as f:
            done = set(json.load(f))
    all_files = sorted(glob.glob(f"{events_path}/*.parquet"))
    new_files = [f for f in all_files if f not in done]
    if not new_files:
        return 0

    partial = (
        spark.read.parquet(*new_files)
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("sum_value_dec"),
        )
    )
    try:
        current = spark.read.parquet(rollup_path)
        merged = (
            current.unionByName(partial)
            .groupBy("window_start", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value_dec").alias("sum_value_dec"),
            )
        )
    except Exception:  # first refresh
        merged = partial

    staging = f"{rollup_path}__staging"
    merged.write.mode("overwrite").parquet(staging)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(conf)
    Path = jvm.org.apache.hadoop.fs.Path
    old = Path(f"{rollup_path}__old")
    fs.delete(old, True)
    if fs.exists(Path(rollup_path)):
        fs.rename(Path(rollup_path), old)
    fs.rename(Path(staging), Path(rollup_path))
    fs.delete(old, True)

    with open(processed_marker, "w") as f:
        json.dump(sorted(done | set(new_files)), f)
    return len(new_files)
