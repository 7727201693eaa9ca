"""Streaming observability: the progress listener captures per-batch
metrics from a live query and exposes them as a DataFrame."""

from __future__ import annotations

import time

from ex_hivent_spark.streaming import monitor


def test_progress_monitor_captures_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(500).selectExpr("id", "id % 7 AS k").write.json(src)

    m = monitor.attach(spark)
    try:
        q = (
            spark.readStream.schema("id LONG, k LONG")
            .json(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .queryName("monitored_ingest")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        # the listener bus delivers asynchronously; give it a moment
        deadline = time.time() + 30
        while time.time() < deadline and m.total_input_rows() < 500:
            time.sleep(0.2)
    finally:
        monitor.detach(spark, m)

    assert m.started, "start event not delivered"
    assert m.total_input_rows("monitored_ingest") == 500
    df = m.metrics_df(spark)
    rows = df.filter("query_name = 'monitored_ingest'").collect()
    assert rows and all(r.batch_duration_ms >= 0 for r in rows)
    assert sum(r.num_input_rows for r in rows) == 500
    # a healthy local run should not be flagged as lagging everywhere:
    # lagging() must at least not crash and returns a list
    assert isinstance(m.lagging(), list)


def test_metrics_df_empty_capture_has_schema(spark):
    m = monitor.ProgressMonitor()
    df = m.metrics_df(spark)
    assert df.count() == 0
    assert "processed_rows_per_second" in df.columns
