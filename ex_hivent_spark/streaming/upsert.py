"""Streaming upsert sink: a foreachBatch-maintained materialized view
holding the LATEST row per key.

The batch twin is ``q_last_event`` (max-ts row per user); this is its
continuously-maintained form — the reference's Memory.last-per-key
semantics (memory.ex:123) turned into a serving table. Plain parquet
has no MERGE, so each micro-batch rewrites the view via
read-union-reduce-overwrite staged through the crash-safe swap in
:mod:`ex_hivent_spark.fsutil` (ready-marker + explicit roll-forward /
roll-back recovery); on a lakehouse format (Delta/Iceberg) the reduce
becomes a keyed MERGE and the plan below is unchanged.

Scale notes: the rewrite cost is O(|view|) per batch, which is the
honest cost of parquet-as-serving-table; the reduce itself is one
max(struct) hash aggregate — no window sort, map-side partials. State
correctness does not depend on batch replay: the reduce is idempotent
(max of a set is unaffected by re-delivery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def latest_per_key(df: DataFrame, key: str, ts_col: str, cols: list[str]) -> DataFrame:
    """Reduce to the latest row per key via one max(struct) aggregate —
    (ts, tie-break cols...) ordered lexicographically, no sort."""
    payload = F.struct(F.col(ts_col), *[F.col(c) for c in cols])
    out = df.groupBy(key).agg(F.max(payload).alias("b"))
    return out.select(
        key,
        F.col(f"b.{ts_col}").alias(ts_col),
        *[F.col(f"b.{c}").alias(c) for c in cols],
    )


class UpsertView:
    """Continuously-maintained latest-per-key parquet view."""

    def __init__(
        self,
        spark: SparkSession,
        view_dir: str,
        key: str,
        ts_col: str,
        cols: list[str],
    ):
        self.spark = spark
        self.view_dir = view_dir
        self.key = key
        self.ts_col = ts_col
        self.cols = cols

    def _merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ex_hivent_spark import fsutil

        spark = self.spark
        incoming = latest_per_key(batch, self.key, self.ts_col, self.cols)
        # Explicit recovery instead of except-Exception: a half-completed
        # prior swap is rolled forward/back first, and only a verified
        # absence of the view means "first batch" — any real read error
        # (permissions, corrupt footer) propagates and fails the batch so
        # the checkpoint retries it rather than silently resetting state.
        if fsutil.recover_swap(spark, self.view_dir):
            current = spark.read.parquet(self.view_dir).select(
                self.key, self.ts_col, *self.cols
            )
            merged = latest_per_key(
                current.unionByName(incoming), self.key, self.ts_col, self.cols
            )
        else:
            merged = incoming
        merged.write.mode("overwrite").parquet(fsutil.staging_path(self.view_dir))
        fsutil.publish_swap(spark, self.view_dir)

    def start(self, stream: DataFrame, checkpoint_dir: str) -> StreamingQuery:
        return (
            stream.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.view_dir)
