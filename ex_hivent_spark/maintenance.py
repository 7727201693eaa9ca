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
