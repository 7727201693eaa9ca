"""SparkSession factory tuned for this engine.

Defaults chosen for correctness parity with the DuckDB oracle and for
scale-out behavior:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- UTC session timezone so parquet naive timestamps agree with DuckDB.
- ``spark.sql.legacy.parquet.nanosAsLong`` because the testdata `events`
  table stores TIMESTAMP(NANOS), which Spark's vectorized reader rejects;
  the catalog layer converts the raw nanos back to a timestamp column.
- Arrow enabled for any pandas interchange (LLM ops use vectorized paths).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ex_hivent_spark.config import setting, setting_integer


def _default_shuffle_partitions() -> int:
    return setting_integer("cpus", 32)


def get_session(
    app_name: str = "ex-hivent-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster the ``master``/resource configs come from
    spark-submit; everything set here is allocation-independent.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        # Static confs (master, driver memory) cannot change on a live
        # session, but every conf correctness depends on is runtime-settable
        # — apply those instead of silently returning a drifted session.
        from ex_hivent_spark.catalog import ensure_session_confs

        ensure_session_confs(active)
        active.conf.set("spark.sql.adaptive.enabled", "true")
        active.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        active.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        active.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        )
        active.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m"
        )
        if shuffle_partitions is not None:
            active.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        for k, v in (extra_conf or {}).items():
            active.conf.set(k, v)
        return active

    cpus = setting("cpus", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or setting("master") or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Coalesce shuffle partitions to the advisory size instead of
        # preserving max parallelism: measured 33% suite speedup at
        # sf0.1/local[32] (scheduling overhead dominates 1 MB tasks),
        # and on a tuned cluster right-sized reducers are best practice
        # (parallelismFirst=true is Spark's regression-avoidance
        # default, not its recommendation).
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or _default_shuffle_partitions()),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", setting("driver_memory", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
