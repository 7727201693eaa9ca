"""Table catalog over the driver-generated parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file/dir per table
under a scale-factor directory.

Timestamp normalization: the testdata's timestamp columns (``events.ts``,
``lineitem.l_shipdate``, ``orders.o_orderdate``) are parquet
``TIMESTAMP(MICROS, isAdjustedToUTC=false)`` — naive wall-clock values.
Spark 4 infers those as TIMESTAMP_NTZ by default, but several epoch
functions (``unix_micros``/``unix_millis``) and struct unions reject NTZ,
and the DuckDB oracle treats the same values as plain (session-naive)
TIMESTAMP.  We therefore disable ``spark.sql.parquet.inferTimestampNTZ``
on whatever session we are handed so the scan itself produces TIMESTAMP
(session tz pinned to UTC — identical wall clock AND identical epoch to
the oracle), with a cast fallback if the conf cannot apply.  Disabling at
the scan — rather than casting after the read — keeps predicate pushdown
on timestamp columns intact (PushedFilters reach the parquet reader).

Earlier driver rounds shipped the same columns as TIMESTAMP(NANOS); the
``nanosAsLong`` conf + bigint conversion below is kept for compatibility
with that layout.

At 100 TB these reads are plain distributed parquet scans: predicate
pushdown and column pruning apply to every column.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns written as TIMESTAMP(NANOS) that need the nanos->micros fix.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# Runtime-settable SQL confs every query in this engine depends on.  The
# driver harness supplies its OWN SparkSession (not our session.get_session
# factory), so these must be applied to whatever session we are handed:
#  - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark's
#    reader rejects outright without this flag.
#  - UTC timezone: parquet naive timestamps must agree with the DuckDB
#    oracle's UTC interpretation or every date/timestamp hash drifts.
#  - Arrow: the pandas-UDF ops assume Arrow batch transfer.
_SESSION_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


# Per-session memo of normalized table DataFrames.  A DataFrame is an
# immutable logical plan, so reusing one across queries is semantically
# free — what the memo actually saves is the per-read driver work
# (InMemoryFileIndex listing + parquet footer/schema inference + the
# conf round-trips), which showed up as a fixed ~0.3-0.5 s floor on
# EVERY query of a 55-query bench suite.  The testdata directories are
# read-only for the life of a round, so the cached file listing cannot
# go stale; `clear_table_cache` exists for anyone who rewrites a table
# in place.  Keyed weakly by session so a stopped session's plans are
# collectable.
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def clear_table_cache(spark: SparkSession | None = None) -> None:
    """Drop memoized table reads (one session's, or all), plus the
    dedup-label frames memoized on top of them."""
    if spark is None:
        _DF_CACHE.clear()
    else:
        _DF_CACHE.pop(spark, None)
    # Lazy import: clusters imports the registry which imports widely;
    # catalog must stay import-light for the driver's first touch.
    from ex_hivent_spark.llm.clusters import clear_labels_cache
    from ex_hivent_spark.session_memo import clear_session_memos

    clear_labels_cache(spark)
    clear_session_memos(spark)


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime SQL confs to any session."""
    for key, value in _SESSION_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf not recognised
            spark.conf.set(key, value)
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nano-timestamps."""
    per_session = _DF_CACHE.setdefault(spark, {})
    cached = per_session.get((sf_dir, name))
    if cached is not None:
        return cached
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    # Fallback: if the NTZ-inference conf did not apply to this scan (e.g.
    # a session that rejects runtime conf writes), reinterpret NTZ columns
    # as session-tz timestamps.  Under the UTC session tz this is the same
    # wall clock and the same epoch the oracle computes.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for col in ntz_cols:
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    per_session[(sf_dir, name)] = df
    return df


def spread_table(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """``load_table`` plus a SCALE-ADAPTIVE hash repartition on ``key``
    (r16 optimization, guide §2.5/§6): the driver testdata ships each
    table as ONE single-row-group parquet file, and a parquet reader
    can only parallelize across row groups — so every scan stage runs
    as one task, and any expensive map-side work before the first
    exchange (tokenization, md5/xxhash window hashing, shingle builds,
    per-row HOF transforms) is single-threaded no matter how many
    cores the session has.

    The repartition fires ONLY when the scan's split count is below
    the session's default parallelism — derived from the input, not a
    constant tuned for local mode. At 100 TB a table scan yields
    thousands of splits, the condition is false, and this is exactly
    ``load_table`` (zero added shuffle).

    r17: the fan-out target is SIZE-AWARE — ``ceil(uncompressed_bytes /
    spread_split_bytes)`` capped at defaultParallelism, instead of a
    flat defaultParallelism (r16's form fanned an 11 MB table to 32
    tasks at 32 cores, maximizing scheduler overhead exactly where
    there is no data to spread; the driver's 8-core run beat its
    32-core run on the spread adopters). Bytes come from the local
    parquet footers — metadata only, no Spark job, deterministic. The
    per-task quantum (default 64 KiB raw) is deliberately far below a
    plain-scan split size because every adopter does per-row work
    (tokenize/regex/HOF folds) that costs orders of magnitude more CPU
    per byte than a scan; it is env-tunable (SPARK_GRAFT_SPREAD_SPLIT_BYTES)
    for clusters.

    Correctness: hash partitioning on a stable data key is
    deterministic (no round-robin, SPARK-38388 does not apply), and
    row order within a partition is irrelevant to the callers — this
    helper is only used by ops whose downstream operators are
    order-insensitive (hash aggregates, equi-joins, windows that sort
    their own partitions); each adoption is oracle-verified at 3 SFs.
    Memoized per (sf_dir, table, key) like the base reads."""
    per_session = _DF_CACHE.setdefault(spark, {})
    cache_key = (sf_dir, name, "spread", key)
    cached = per_session.get(cache_key)
    if cached is not None:
        return cached
    df = load_table(spark, sf_dir, name)
    para = spark.sparkContext.defaultParallelism
    splits = df.rdd.getNumPartitions()
    if splits < para:
        from ex_hivent_spark.config import setting_integer

        quantum = max(1, setting_integer("spread_split_bytes", 1 << 16))
        nbytes = _table_input_bytes(sf_dir, name)
        target = min(para, max(1, -(-nbytes // quantum)))
        if target > splits:
            df = df.repartition(target, F.col(key))
    per_session[cache_key] = df
    return df


# Raw-byte sizes of table inputs, from parquet footers (metadata-only).
_TABLE_BYTES: dict[tuple, int] = {}


def _table_input_bytes(sf_dir: str, name: str) -> int:
    """Uncompressed bytes of one table's parquet data, read from the
    local footer(s). Metadata-only (no Spark job, no data read) and
    deterministic for a read-only testdata dir. Returns 0 when the
    path is not locally inspectable (object stores) — spread then
    stays a no-op, which is the correct call at that scale anyway."""
    key = (sf_dir, name)
    cached = _TABLE_BYTES.get(key)
    if cached is not None:
        return cached
    path = f"{sf_dir}/{name}.parquet"
    total = 0
    try:
        import os

        import pyarrow.parquet as pq

        files = [path]
        if os.path.isdir(path):
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        for f in files:
            meta = pq.ParquetFile(f).metadata
            total += sum(
                meta.row_group(i).total_byte_size
                for i in range(meta.num_row_groups)
            )
    except Exception:  # pragma: no cover - non-local or unreadable path
        total = 0
    _TABLE_BYTES[key] = total
    return total


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-based plans)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


class Catalog:
    """Convenience handle bundling a session and a scale-factor dir."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        register_views(self.spark, self.sf_dir)
