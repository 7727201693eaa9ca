"""Event sources beyond parquet: JSON / CSV batch readers with the
envelope schema, file-streaming readers, and a rate-source generator
for load tests.

The reference's wire format is JSON → MessagePack → gzip
(message_pack_serializer.ex:10-33) — transport, not semantics; at rest
the engine reads JSON lines directly (Spark decompresses .gz
transparently, which subsumes the >1KB gzip threshold idea). All
readers take explicit schemas: schema inference is a full extra pass at
100 TB and non-deterministic under schema drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.envelope import EVENT_SCHEMA
from ex_hivent_spark.streaming.consumer import INGRESS_SCHEMA

EVENTS_TABLE_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch JSON-lines reader for envelope events (explicit schema;
    .json or .json.gz)."""
    return spark.read.schema(EVENT_SCHEMA).json(path)


def read_events_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """Batch CSV reader for the flat events-table shape."""
    return (
        spark.read.schema(EVENTS_TABLE_SCHEMA)
        .option("header", str(header).lower())
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def stream_ingress(
    spark: SparkSession, path: str, fmt: str = "parquet", max_files: int = 1
) -> DataFrame:
    """File-streaming source over an ingress directory (the consumer's
    subscription feed; see streaming/consumer.py). ``fmt`` is parquet or
    json — at scale this becomes a Kafka source with the same downstream
    plan."""
    reader = spark.readStream.schema(INGRESS_SCHEMA).option(
        "maxFilesPerTrigger", max_files
    )
    return reader.parquet(path) if fmt == "parquet" else reader.json(path)


def rate_events(
    spark: SparkSession, rows_per_second: int = 100, n_users: int = 16
) -> DataFrame:
    """Synthetic unbounded event stream from the rate source — for
    soak/load tests of consumers without any storage."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value"), F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(
                F.lit("click"), F.lit("view"), F.lit("purchase"),
                F.lit("signup"), F.lit("error"),
            ),
            (F.pmod(F.col("value"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value") * 37, F.lit(500)) / 1.0).alias("value"),
    )


CORRUPT_COL = "_corrupt_record"


def read_events_json_permissive(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """JSON reader with source-level quarantine: PERMISSIVE parsing
    keeps malformed lines in a corrupt-record column instead of failing
    the job (FAILFAST) or silently dropping rows (DROPMALFORMED) — the
    batch-source twin of the consumer's process-callback quarantine
    (consumer.ex:98-100). Returns (ok, quarantined).

    At 100 TB a single bad producer line must never kill a pipeline or
    vanish unaccounted; the quarantine side keeps the raw line for
    redrive after the producer is fixed.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [*EVENT_SCHEMA.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark requires a checkpoint/cache boundary before filtering on
        # the corrupt column (the parser is lazy per-column otherwise)
        .cache()
    )
    ok = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return ok, quarantined


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    """Batch ORC reader for the events table (explicit schema — same
    no-inference rule as the JSON/CSV readers). ORC is the second
    columnar at-rest format warehouses commonly hand us besides
    parquet; Spark's native reader gives predicate pushdown and column
    pruning on it just like parquet, so downstream plans are format-
    agnostic."""
    return spark.read.schema(EVENTS_TABLE_SCHEMA).orc(path)


def write_events_orc(df: DataFrame, path: str, codec: str = "zlib") -> None:
    """ORC writer twin (zlib default — ORC's widest-compatibility
    codec; snappy/zstd accepted)."""
    df.write.mode("overwrite").option("compression", codec).orc(path)
