"""Table catalog over the driver-generated parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file/dir per table
under a scale-factor directory.

The ``events`` table stores its ``ts`` column as parquet TIMESTAMP(NANOS),
which Spark cannot read natively; with
``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as a bigint of
nanoseconds and we convert with ``timestamp_micros(ts div 1000)`` —
truncation to microseconds, exactly matching how DuckDB (and any
microsecond-resolution engine) reads the same file.

At 100 TB these reads are plain distributed parquet scans: predicate
pushdown and column pruning still apply to every column except the
converted ``ts`` (whose source column is a bigint — range filters on it
can be pushed as nanos if ever needed).
"""

from __future__ import annotations

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
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


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
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


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
