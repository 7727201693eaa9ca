"""Streaming distribution-drift monitor: per-micro-batch PSI against a
committed baseline histogram — the online form of q_ts_psi_drift
(operators/drift.py).

The production loop this models: a reference window's value histogram
is committed once (model-training time, or a known-good week); every
micro-batch of the live stream is bucketed on the SAME fixed grid and
scored with the population stability index against that baseline; the
per-batch (batch_id, n, psi, drifted) rows land in a batch_id-keyed
sink the alerting layer tails. Fixed grid + add-one smoothing mean an
empty or skewed batch scores high PSI instead of dividing by zero.

Scale shape: the baseline is a ≤|buckets|-row parquet re-read and
broadcast per trigger (the enrich.py dimension-refresh pattern, so a
re-committed baseline is picked up mid-stream without a restart); the
batch-side work is one conditional aggregate to |buckets| rows; the
PSI fold happens on that tiny frame. State: NONE — each batch is
scored independently, so there is no watermark, no state store, and
replay is handled by the batch_id-keyed idempotent overwrite
(consumer.py's effectively-once sink discipline).

Determinism: identical to the batch twin — integer counts, exact
smoothed-ratio divisions, one e6-rounded ln per bucket, decimal-summed
terms — so a batch scored online and the same rows scored by the batch
operator produce the SAME psi (asserted by the parity test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ex_hivent_spark.functions.decimals import dround

DEFAULT_WIDTH = 50.0
DEFAULT_BUCKETS = 10


def _bucket(col, width: float, n_buckets: int):
    return F.least(
        F.floor(col / F.lit(width)).cast("bigint"),
        F.lit(n_buckets - 1).cast("bigint"),
    )


def write_baseline(
    df: DataFrame,
    value_col: str,
    path: str,
    width: float = DEFAULT_WIDTH,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Commit the reference histogram: (bucket, cnt) over the fixed
    grid. One hash aggregate over the reference window; the artifact
    is ≤ n_buckets rows regardless of input size."""
    (
        df.select(_bucket(F.col(value_col), width, n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .write.mode("overwrite")
        .parquet(path)
    )


def psi_of(
    batch_df: DataFrame,
    baseline: DataFrame,
    value_col: str,
    width: float = DEFAULT_WIDTH,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Score ONE frame against the baseline histogram; returns a 1-row
    (n_events, psi) frame. Shared by the streaming monitor and any
    ad-hoc batch caller, so online and offline scores agree bit-exactly.

    The full-outer join keeps buckets that only one side populated —
    with add-one smoothing those still contribute drift mass (a batch
    concentrated in a bucket the baseline never saw is exactly the
    signal PSI exists to raise)."""
    counts = (
        batch_df.select(
            _bucket(F.col(value_col), width, n_buckets).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bcnt"))
    )
    merged = (
        counts.join(F.broadcast(baseline), "bucket", "full_outer")
        .select(
            F.coalesce(F.col("bcnt"), F.lit(0)).alias("bcnt"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
        .crossJoin(
            F.broadcast(
                counts.agg(
                    F.coalesce(F.sum("bcnt"), F.lit(0)).alias("nb")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                baseline.agg(
                    F.coalesce(F.sum("cnt"), F.lit(0)).alias("na")
                )
            )
        )
    )
    pb = (F.col("bcnt") + 1).cast("double") / (F.col("nb") + n_buckets)
    pa = (F.col("cnt") + 1).cast("double") / (F.col("na") + n_buckets)
    term = (pb - pa) * dround(F.log(pb / pa), 6)
    return merged.select(
        "nb", term.alias("term")
    ).agg(
        F.any_value("nb").alias("n_events"),
        F.sum(F.col("term").cast("decimal(25,6)"))
        .cast("double")
        .alias("psi"),
    )


def psi_monitor(
    spark: SparkSession,
    stream_df: DataFrame,
    baseline_path: str,
    value_col: str,
    out_dir: str,
    checkpoint_dir: str,
    width: float = DEFAULT_WIDTH,
    n_buckets: int = DEFAULT_BUCKETS,
    threshold: float = 0.25,
) -> StreamingQuery:
    """Start (and return) the monitor: each micro-batch is PSI-scored
    against the CURRENT committed baseline and one
    (batch_id, n_events, psi, drifted) row lands at
    ``out_dir/batch_id=N`` (idempotent overwrite on replay)."""

    def score(batch_df: DataFrame, batch_id: int) -> None:
        baseline = spark.read.parquet(baseline_path)
        row = psi_of(
            batch_df, baseline, value_col, width, n_buckets
        ).collect()[0]
        spark.createDataFrame(
            [
                (
                    batch_id,
                    row["n_events"],
                    row["psi"],
                    bool(row["psi"] is not None and row["psi"] > threshold),
                )
            ],
            "batch_id bigint, n_events bigint, psi double, drifted boolean",
        ).write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
