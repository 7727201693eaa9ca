"""Streaming continuous aggregate views: every micro-batch fold must
land on exactly the batch-aggregate of all data seen so far (bit-equal
decimal sums), survive restarts from the checkpoint without double
counting, and skip replayed batch ids (exactly-once fencing)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ex_hivent_spark import matview
from ex_hivent_spark.sources import versioned
from ex_hivent_spark.streaming.continuous_view import ContinuousAggregateView

SCHEMA = "cat string, val double"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()], key=repr
    )


def _write_file(tmp_path, name, rows):
    with open(f"{tmp_path}/src/{name}", "w") as f:
        for cat, val in rows:
            f.write(json.dumps({"cat": cat, "val": val}) + "\n")


def _expected(spark, tmp_path):
    all_df = spark.read.schema(SCHEMA).json(f"{tmp_path}/src")
    return matview._aggregate(all_df, ["cat"], ["val"])


def _make(spark, tmp_path):
    import os

    os.makedirs(f"{tmp_path}/src", exist_ok=True)
    view = ContinuousAggregateView(
        spark, f"{tmp_path}/view", ["cat"], ["val"]
    )
    stream = spark.readStream.schema(SCHEMA).json(f"{tmp_path}/src")
    return view, stream


def test_folds_match_batch_aggregate_across_batches(spark, tmp_path):
    view, stream = _make(spark, tmp_path)
    _write_file(tmp_path, "a.json", [("x", 1.5), ("x", 2.25), ("y", 3.0)])
    q = view.start(stream, f"{tmp_path}/chk")
    try:
        q.processAllAvailable()
        assert _rows(view.read()) == _rows(_expected(spark, tmp_path))

        _write_file(tmp_path, "b.json", [("x", 10.0), ("z", 0.125)])
        q.processAllAvailable()
        assert _rows(view.read()) == _rows(_expected(spark, tmp_path))
    finally:
        q.stop()


def test_restart_from_checkpoint_no_double_count(spark, tmp_path):
    view, stream = _make(spark, tmp_path)
    _write_file(tmp_path, "a.json", [("x", 1.0), ("y", 2.0)])
    q = view.start(stream, f"{tmp_path}/chk")
    q.processAllAvailable()
    q.stop()

    _write_file(tmp_path, "b.json", [("x", 4.0)])
    view2, stream2 = _make(spark, tmp_path)
    q2 = view2.start(stream2, f"{tmp_path}/chk")
    try:
        q2.processAllAvailable()
        assert _rows(view2.read()) == _rows(_expected(spark, tmp_path))
    finally:
        q2.stop()


def test_replayed_batch_id_is_fenced(spark, tmp_path):
    view, stream = _make(spark, tmp_path)
    _write_file(tmp_path, "a.json", [("x", 1.0), ("y", 2.0)])
    q = view.start(stream, f"{tmp_path}/chk")
    q.processAllAvailable()
    q.stop()

    head_before = versioned.current_version(spark, f"{tmp_path}/view")
    state_before = _rows(view.read())
    # simulate the crash-replay delivery of batch 0
    replay = spark.createDataFrame([("x", 99.0)], SCHEMA)
    view._fold_batch(replay, 0)
    assert versioned.current_version(spark, f"{tmp_path}/view") == head_before
    assert _rows(view.read()) == state_before
    # a genuinely NEW batch id still folds
    view._fold_batch(replay, 1)
    assert _rows(view.read()) != state_before


def test_state_history_is_time_travelable(spark, tmp_path):
    view, stream = _make(spark, tmp_path)
    _write_file(tmp_path, "a.json", [("x", 1.0)])
    q = view.start(stream, f"{tmp_path}/chk")
    q.processAllAvailable()
    q.stop()
    _write_file(tmp_path, "b.json", [("x", 1.0)])
    q2 = view.start(
        spark.readStream.schema(SCHEMA).json(f"{tmp_path}/src"),
        f"{tmp_path}/chk",
    )
    q2.processAllAvailable()
    q2.stop()
    v0 = versioned.read_snapshot(spark, f"{tmp_path}/view", 0)
    v1 = versioned.read_snapshot(spark, f"{tmp_path}/view", 1)
    assert v0.agg(F.sum("n_rows")).first()[0] == 1
    assert v1.agg(F.sum("n_rows")).first()[0] == 2


def test_streaming_minmax_folds_monotonically(spark, tmp_path):
    """Append-only batches fold min/max with least/greatest — across
    two batches the state must equal the batch aggregate of all data,
    extremes included."""
    import os

    from ex_hivent_spark.streaming.continuous_view import (
        ContinuousAggregateView,
    )

    os.makedirs(f"{tmp_path}/src", exist_ok=True)
    view = ContinuousAggregateView(
        spark, f"{tmp_path}/view", ["cat"], ["val"], minmax_cols=["val"]
    )
    stream = spark.readStream.schema(SCHEMA).json(f"{tmp_path}/src")
    _write_file(tmp_path, "a.json", [("x", 5.0), ("x", 1.0), ("y", 3.0)])
    q = view.start(stream, f"{tmp_path}/chk")
    try:
        q.processAllAvailable()
        _write_file(tmp_path, "b.json", [("x", 9.5), ("x", 0.25)])
        q.processAllAvailable()
        all_df = spark.read.schema(SCHEMA).json(f"{tmp_path}/src")
        want = _rows(matview._aggregate(all_df, ["cat"], ["val"], ["val"]))
        assert _rows(view.read()) == want
        row = view.read().filter(F.col("cat") == "x").first()
        assert row["min_val"] == 0.25 and row["max_val"] == 9.5
    finally:
        q.stop()


def test_new_checkpoint_restart_is_not_fenced_out(spark, tmp_path):
    """Restarting the stream with a NEW checkpoint directory resets
    batch ids to 0. A bare batch-id fence would silently drop every
    restarted batch whose id is <= the old fence (data loss); the
    (query identity, batch id) pair fence must fold them instead."""
    import os

    view, stream = _make(spark, tmp_path)
    _write_file(tmp_path, "a.json", [("x", 1.0)])
    _write_file(tmp_path, "b.json", [("x", 2.0)])
    q = view.start(stream, f"{tmp_path}/chk1")
    q.processAllAvailable()
    q.stop()
    committed = versioned.current_version(spark, f"{tmp_path}/view")
    assert committed is not None  # fence is now at some batch id >= 0

    # new source file, NEW checkpoint -> batch ids restart from 0
    os.makedirs(f"{tmp_path}/src2", exist_ok=True)
    with open(f"{tmp_path}/src2/c.json", "w") as f:
        f.write(json.dumps({"cat": "y", "val": 7.5}) + "\n")
    stream2 = spark.readStream.schema(SCHEMA).json(f"{tmp_path}/src2")
    q2 = view.start(stream2, f"{tmp_path}/chk2")
    q2.processAllAvailable()
    q2.stop()

    state = view.read()
    assert state.filter(F.col("cat") == "y").count() == 1  # not dropped
    got_sum = state.agg(F.sum("n_rows")).first()[0]
    assert got_sum == 3  # 2 from the first query + 1 from the restart

    # and a true replay under the SAME identity still fences
    replay = spark.createDataFrame([("y", 7.5)], SCHEMA)
    before = _rows(view.read())
    view._fold_batch(replay, 0)  # chk2 already committed batch 0
    assert _rows(view.read()) == before
