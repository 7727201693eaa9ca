"""Custom Python DataSource tests: deterministic batch reads across
partition layouts, and the incremental stream reader reaching its
finite end exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from ex_hivent_spark.sources.pydatasource import HiventEventsDataSource


def _register(spark):
    spark.dataSource.register(HiventEventsDataSource)


def test_batch_read_deterministic_and_partitioned(spark):
    _register(spark)
    df = (
        spark.read.format("hivent_events")
        .option("n_rows", 200)
        .option("n_partitions", 8)
        .load()
    )
    assert df.count() == 200
    # same rows regardless of partition layout (minus the partition_id)
    df2 = (
        spark.read.format("hivent_events")
        .option("n_rows", 200)
        .option("n_partitions", 3)
        .load()
    )
    a = sorted(map(repr, df.drop("partition_id").collect()))
    b = sorted(map(repr, df2.drop("partition_id").collect()))
    assert a == b
    # event_ids are a complete range, once each
    ids = [r.event_id for r in df.select("event_id").collect()]
    assert sorted(ids) == list(range(200))


def test_batch_read_composes_with_engine_ops(spark):
    _register(spark)
    df = (
        spark.read.format("hivent_events")
        .option("n_rows", 500)
        .load()
    )
    agg = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert agg.count() == 5
    assert sum(r.n for r in agg.collect()) == 500


def test_stream_reader_reaches_finite_end_exactly_once(spark, tmp_path):
    _register(spark)
    stream = (
        spark.readStream.format("hivent_events")
        .option("total_rows", 300)
        .option("rows_per_batch", 100)
        .option("n_partitions", 2)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    got = spark.sql("SELECT event_id FROM pyds_out").collect()
    assert sorted(r.event_id for r in got) == list(range(300))


def test_json_sink_two_phase_commit(spark, tmp_path):
    """Writer stages per task, commit publishes atomically with a
    manifest; round-trip preserves every row."""
    import json
    import os

    from ex_hivent_spark.sources.pydatasource import HiventJsonSinkDataSource

    spark.dataSource.register(HiventJsonSinkDataSource)
    out = str(tmp_path / "sink")
    os.makedirs(out, exist_ok=True)
    df = spark.range(100).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "CAST(id * 1.5 AS DOUBLE) AS value"
    )
    df.repartition(4).write.format("hivent_sink").option("path", out).mode(
        "append"
    ).save()

    with open(os.path.join(out, "_MANIFEST")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 100
    assert not os.path.exists(os.path.join(out, "_staging"))

    rows = []
    for name in os.listdir(out):
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                rows += [json.loads(line) for line in f]
    assert sorted(r["event_id"] for r in rows) == list(range(100))


def test_orc_round_trip_matches_parquet(spark, sf_dir):
    """ORC at-rest twin: events written to ORC and read back with the
    explicit schema are row-identical to the parquet source (formats
    interchangeable under one schema — sources/readers.py)."""
    import tempfile

    from ex_hivent_spark.catalog import load_table
    from ex_hivent_spark.sources.readers import (
        read_events_orc,
        write_events_orc,
    )

    src = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/events_orc"
        write_events_orc(src, path)
        back = read_events_orc(spark, path)
        assert back.schema == src.schema
        a = sorted(map(tuple, src.collect()), key=repr)
        b = sorted(map(tuple, back.collect()), key=repr)
        assert a == b
