"""Crash-safety of the staging-swap publish protocol (fsutil) and its
users (upsert view, incremental rollup, two-phase-commit sink).

Each test constructs the on-disk state a crash at a specific protocol
step leaves behind, then asserts recovery restores a consistent view
with no loss and no double-counting.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ex_hivent_spark import fsutil


def _write_view(spark, path, ids):
    spark.createDataFrame([(i,) for i in ids], "id long").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def _ids(spark, path):
    return sorted(r.id for r in spark.read.parquet(path).collect())


class TestRecoverSwap:
    def test_completed_publish_cleans_leftovers(self, spark, tmp_path):
        target = str(tmp_path / "view")
        _write_view(spark, target, [1, 2])
        os.makedirs(f"{target}__old")
        os.makedirs(fsutil.staging_path(target))
        assert fsutil.recover_swap(spark, target)
        assert _ids(spark, target) == [1, 2]
        assert not os.path.exists(f"{target}__old")
        assert not os.path.exists(fsutil.staging_path(target))

    def test_roll_forward_ready_staging(self, spark, tmp_path):
        """Crash between backup-rename and staging-rename: target is
        gone, staging is COMMIT_READY → staged data wins."""
        target = str(tmp_path / "view")
        staging = fsutil.staging_path(target)
        _write_view(spark, staging, [10, 11, 12])
        fsutil.write_text_file(
            spark, f"{staging}/{fsutil.READY_MARKER}", "ready\n"
        )
        shutil.move(staging, staging)  # no-op; state already as desired
        assert fsutil.recover_swap(spark, target)
        assert _ids(spark, target) == [10, 11, 12]

    def test_roll_back_unready_staging(self, spark, tmp_path):
        """Crash while staging was still being written (no ready
        marker), after target moved aside → previous view restored,
        partial staging discarded."""
        target = str(tmp_path / "view")
        _write_view(spark, f"{target}__old", [1, 2, 3])
        os.makedirs(fsutil.staging_path(target))
        with open(f"{fsutil.staging_path(target)}/part-junk", "w") as f:
            f.write("partial")
        assert fsutil.recover_swap(spark, target)
        assert _ids(spark, target) == [1, 2, 3]
        assert not os.path.exists(fsutil.staging_path(target))

    def test_first_write_crash_reports_absent(self, spark, tmp_path):
        target = str(tmp_path / "view")
        os.makedirs(fsutil.staging_path(target))  # partial first write
        assert not fsutil.recover_swap(spark, target)
        assert not os.path.exists(fsutil.staging_path(target))

    def test_publish_swap_round_trip(self, spark, tmp_path):
        target = str(tmp_path / "view")
        _write_view(spark, target, [1])
        _write_view(spark, fsutil.staging_path(target), [2, 3])
        fsutil.publish_swap(spark, target)
        assert _ids(spark, target) == [2, 3]
        assert not os.path.exists(f"{target}__old")


class TestRollupAtomicMarker:
    def test_manifest_travels_with_data(self, spark, sf_dir, tmp_path):
        from ex_hivent_spark.catalog import load_table
        from ex_hivent_spark.maintenance import (
            PROCESSED_MANIFEST,
            refresh_time_rollup,
        )

        events = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        src = str(tmp_path / "src")
        events.coalesce(1).write.mode("append").parquet(src)
        rollup = str(tmp_path / "rollup")

        assert refresh_time_rollup(spark, src, rollup) >= 1
        manifest = json.loads(
            fsutil.read_text_file(spark, f"{rollup}/{PROCESSED_MANIFEST}")
        )
        assert manifest  # inputs recorded inside the published dir
        # replay with no new files: nothing re-merged, no double count
        assert refresh_time_rollup(spark, src, rollup) == 0

    def test_half_swap_replay_does_not_double_count(
        self, spark, sf_dir, tmp_path
    ):
        """Simulate a crash mid-swap (target moved aside, ready staging
        not yet promoted): the next refresh must roll forward and still
        see the manifest, so totals equal a single clean run."""
        from ex_hivent_spark.catalog import load_table
        from ex_hivent_spark.maintenance import refresh_time_rollup

        events = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        src = str(tmp_path / "src")
        events.coalesce(1).write.mode("append").parquet(src)
        rollup = str(tmp_path / "rollup")
        assert refresh_time_rollup(spark, src, rollup) >= 1
        clean = (
            spark.read.parquet(rollup)
            .agg(F.sum("n_events").alias("n"))
            .collect()[0]["n"]
        )

        # reconstruct the mid-swap crash state from the published dir
        staging = fsutil.staging_path(rollup)
        shutil.copytree(rollup, staging)
        fsutil.write_text_file(
            spark, f"{staging}/{fsutil.READY_MARKER}", "ready\n"
        )
        shutil.move(rollup, f"{rollup}__old")

        assert refresh_time_rollup(spark, src, rollup) == 0
        after = (
            spark.read.parquet(rollup)
            .agg(F.sum("n_events").alias("n"))
            .collect()[0]["n"]
        )
        assert after == clean


class TestSinkAppend:
    def test_second_append_preserves_first_commit(self, spark, tmp_path):
        from ex_hivent_spark.sources.pydatasource import (
            HiventJsonSinkDataSource,
        )

        spark.dataSource.register(HiventJsonSinkDataSource)
        out = str(tmp_path / "sink")
        os.makedirs(out, exist_ok=True)

        def write(lo, hi):
            (
                spark.range(lo, hi)
                .selectExpr("id AS event_id")
                .repartition(2)
                .write.format("hivent_sink")
                .option("path", out)
                .mode("append")
                .save()
            )

        write(0, 100)
        write(100, 150)

        rows = []
        for name in os.listdir(out):
            if name.endswith(".jsonl"):
                with open(os.path.join(out, name)) as f:
                    rows += [json.loads(line) for line in f]
        assert sorted(r["event_id"] for r in rows) == list(range(150))
        with open(os.path.join(out, "_MANIFEST")) as f:
            manifest = json.load(f)
        assert manifest["n_rows"] == 150
        assert len(manifest["commits"]) == 2


class TestStreamReaderOffsets:
    def test_latest_offset_never_regresses_after_restart(self):
        """A fresh reader instance (as after checkpoint recovery) that
        is shown a committed offset must never report an end offset
        below it."""
        from ex_hivent_spark.sources.pydatasource import (
            HiventEventsStreamReader,
        )

        r = HiventEventsStreamReader(
            {"total_rows": "500", "rows_per_batch": "100"}
        )
        # Spark replays the last uncommitted batch from the checkpoint:
        r.partitions({"offset": 200}, {"offset": 300})
        assert r.latestOffset()["offset"] >= 300
        r2 = HiventEventsStreamReader(
            {"total_rows": "500", "rows_per_batch": "100"}
        )
        r2.commit({"offset": 400})
        assert r2.latestOffset()["offset"] >= 400


class TestSaltedJoinHow:
    def test_outer_types_rejected(self, spark):
        from ex_hivent_spark.operators.skew import salted_join

        fact = spark.range(10).selectExpr("id AS k", "id AS row_id")
        build = spark.range(5).selectExpr("id AS k", "id * 2 AS v")
        for how in ("right", "full", "full_outer", "cross"):
            with pytest.raises(ValueError, match="salted_join"):
                salted_join(fact, build, "k", "row_id", how=how)

    def test_left_and_anti_still_equal_plain(self, spark):
        from ex_hivent_spark.operators.skew import salted_join

        fact = spark.range(20).selectExpr("id AS k2", "id AS row_id")
        build = spark.range(5).selectExpr("id * 3 AS k2", "id AS v")
        for how in ("left", "left_anti"):
            got = salted_join(fact, build, "k2", "row_id", how=how)
            want = fact.join(build, "k2", how)
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, want.collect())
            )
