"""Distributed prefix sums / running max (operators/prefix.py): the
partition-offset decomposition must be bit-equal to the single-partition
global window it replaces, across partition counts, and the operators
rebuilt on it (sequence gaps, late audit) must match their naive forms
on data that actually exercises partition boundaries."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ex_hivent_spark.operators.prefix import running_max, running_totals


def _df(spark, n=5000, seed=11):
    rng = random.Random(seed)
    rows = [(i * 3 + rng.randint(0, 1), float(rng.randint(0, 99))) for i in range(n)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "k long, v double")


def test_running_totals_matches_global_window(spark):
    df = _df(spark)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: (r["cv"], r["cn"])
        for r in df.select(
            "k",
            F.sum("v").over(w).alias("cv"),
            F.count(F.lit(1)).over(w).alias("cn"),
        ).collect()
    }
    got_df = running_totals(
        df.withColumn("one", F.lit(1).cast("bigint")),
        ["k"],
        {"v": "cv", "one": "cn"},
        num_partitions=7,
    )
    got = {r["k"]: (r["cv"], r["cn"]) for r in got_df.collect()}
    assert got == want  # bit-equal sums AND exact integer ranks


def test_running_totals_single_partition_degenerate(spark):
    df = _df(spark, n=50)
    got = running_totals(
        df, ["k"], {"v": "cv"}, num_partitions=1
    ).orderBy("k")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select("k", F.sum("v").over(w).alias("cv")).orderBy("k")
    assert [tuple(r) for r in got.select("k", "cv").collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_running_max_matches_global_window_incl_exclusive(spark):
    df = _df(spark, n=3000, seed=5)
    for exclusive in (False, True):
        hi = -1 if exclusive else 0
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
        want = {
            r["k"]: r["m"]
            for r in df.select("k", F.max("v").over(w).alias("m")).collect()
        }
        got = {
            r["k"]: r["hw"]
            for r in running_max(
                df, ["k"], "v", "hw", exclusive=exclusive, num_partitions=9
            ).collect()
        }
        assert got == want, f"exclusive={exclusive}"


def test_sequence_gaps_finds_boundary_spanning_gaps(spark, tmp_path):
    """Feed the registered gap query a sequence with known holes —
    including ones engineered to span range-partition boundaries — and
    check against the directly computed gap list."""
    import os

    from ex_hivent_spark.plans.registry import all_specs

    ids = [i for i in range(1, 20001) if i % 97 != 0 and not 5000 < i < 5400]
    # the r13 rewrite audits the purchase subsequence; tag every id
    # as a purchase so the expected gap list is unchanged
    df = spark.createDataFrame(
        [(i, "purchase") for i in ids], "event_id long, event_type string"
    )
    os.makedirs(f"{tmp_path}/sf", exist_ok=True)
    df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")

    out = all_specs()["q_quality_sequence_gaps"].spark(spark, str(tmp_path) + "/sf")
    got = sorted(
        (r["gap_start"], r["gap_end"], r["n_missing"]) for r in out.collect()
    )
    want = [
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(ids, ids[1:])
        if b - a > 1
    ]
    assert got == sorted(want)
    assert (5001, 5399, 399) in got  # the wide hole survives stitching


def test_sequence_gaps_through_recursive_fold(spark, monkeypatch, tmp_path):
    """The gap query now routes its boundary stitch through the blocked
    prefix fold — force the recursive distributed path (budget 1,
    fanout 4) and require the identical gap list, including a hole
    spanning a super-block boundary."""
    import os

    from ex_hivent_spark.operators import prefix
    from ex_hivent_spark.plans.registry import all_specs

    # ids span ~40 DIV-8192 blocks; drop ranges so gaps cross block
    # AND super-block boundaries at fanout 4
    ids = [
        i
        for i in range(1, 330001)
        if i % 101 != 0 and not 98300 < i < 99200
    ]
    df = spark.createDataFrame(
        [(i, "purchase") for i in ids], "event_id long, event_type string"
    )
    os.makedirs(f"{tmp_path}/sf", exist_ok=True)
    df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")

    spec = all_specs()["q_quality_sequence_gaps"]
    want = [
        (a + 1, b - 1, b - a - 1) for a, b in zip(ids, ids[1:]) if b - a > 1
    ]
    monkeypatch.setattr(prefix, "_MAX_DRIVER_BLOCKS", 1)
    monkeypatch.setattr(prefix, "_FANOUT", 4)
    got = sorted(
        (r["gap_start"], r["gap_end"], r["n_missing"])
        for r in spec.spark(spark, str(tmp_path) + "/sf").collect()
    )
    assert got == sorted(want)
    assert (98301, 99199, 899) in got  # the wide hole survives the fold


def test_blocked_totals_match_global_window(spark):
    df = _df(spark, n=4000, seed=3).withColumn(
        "blk", F.expr("k DIV 100")
    )
    from ex_hivent_spark.operators.prefix import running_totals_blocked

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["cv"]
        for r in df.select("k", F.sum("v").over(w).alias("cv")).collect()
    }
    got = {
        r["k"]: r["cv"]
        for r in running_totals_blocked(
            df, ["k"], ["blk"], {"v": "cv"}
        ).collect()
    }
    assert got == want


def test_blocked_max_matches_global_window(spark):
    from ex_hivent_spark.operators.prefix import running_max_blocked

    df = _df(spark, n=3000, seed=9).withColumn("blk", F.expr("k DIV 64"))
    for exclusive in (False, True):
        hi = -1 if exclusive else 0
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
        want = {
            r["k"]: r["m"]
            for r in df.select("k", F.max("v").over(w).alias("m")).collect()
        }
        got = {
            r["k"]: r["hw"]
            for r in running_max_blocked(
                df, ["k"], ["blk"], "v", "hw", exclusive=exclusive
            ).collect()
        }
        assert got == want, f"exclusive={exclusive}"


def test_blocked_totals_multi_block_key_resets_correctly(spark):
    """Composite (group, bucket) blocks with a group-major order — the
    offsets fold crosses group boundaries in sort order, matching the
    global window over (g, k)."""
    from ex_hivent_spark.operators.prefix import running_totals_blocked

    rows = [(g, k, float((ord(g) + 1) * k % 7)) for g in ("a", "b", "c")
            for k in range(500)]
    df = spark.createDataFrame(rows, "g string, k long, v double").withColumn(
        "blk", F.expr("k DIV 50")
    )
    w = Window.orderBy("g", "k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["g"], r["k"]): r["cv"]
        for r in df.select("g", "k", F.sum("v").over(w).alias("cv")).collect()
    }
    got = {
        (r["g"], r["k"]): r["cv"]
        for r in running_totals_blocked(
            df, ["k"], ["g", "blk"], {"v": "cv"}
        ).collect()
    }
    assert got == want


def test_recursive_offsets_single_distributed_level(spark, monkeypatch):
    """Force the block count over the driver budget: the super-block
    fold must reproduce the driver fold bit-exactly, and the offsets
    frame must flag itself non-broadcastable. Fanout shrunk so the
    ~940 test blocks can actually split (at the production 8192 they
    all share one cell and the termination guard correctly falls back
    to the driver fold)."""
    from ex_hivent_spark.operators import prefix

    monkeypatch.setattr(prefix, "_FANOUT", 64)
    from ex_hivent_spark.operators.prefix import (
        running_max_blocked,
        running_totals_blocked,
    )

    df = _df(spark, n=4000, seed=3).withColumn(
        "blk", F.expr("k DIV 16")
    ).withColumn("one", F.lit(1).cast("bigint"))
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: (r["cv"], r["cn"])
        for r in df.select(
            "k",
            F.sum("v").over(w).alias("cv"),
            F.count(F.lit(1)).over(w).alias("cn"),
        ).collect()
    }
    got = {
        r["k"]: (r["cv"], r["cn"])
        for r in running_totals_blocked(
            df, ["k"], ["blk"], {"v": "cv", "one": "cn"},
            max_driver_blocks=5,
        ).collect()
    }
    assert got == want

    # the offsets frame itself: distributed path => not broadcastable
    off = prefix._blocked_offsets(
        df,
        ["blk"],
        [F.sum("one").alias("one")],
        lambda acc, r: {"__off_one": (acc["__off_one"] or 0) + (r["one"] or 0)},
        {"__off_one": "bigint"},
        combine={"__off_one": ("one", "sum")},
        max_driver_blocks=5,
    )
    assert not prefix._broadcastable(off)


def test_recursive_offsets_two_distributed_levels(spark, monkeypatch):
    """Shrink the fanout so the super-block totals ALSO exceed the
    driver budget: >1 recursive fold level, sums and max both exact,
    including the NULL offset for the globally-first block under an
    exclusive running max."""
    from ex_hivent_spark.operators import prefix
    from ex_hivent_spark.operators.prefix import (
        running_max_blocked,
        running_totals_blocked,
    )

    monkeypatch.setattr(prefix, "_FANOUT", 8)
    df = _df(spark, n=3000, seed=21).withColumn(
        "blk", F.expr("k DIV 16")
    )  # ~560 blocks -> ~70 supers -> ~9 super-supers (3 levels @ cap 4)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["cv"]
        for r in df.select("k", F.sum("v").over(w).alias("cv")).collect()
    }
    got = {
        r["k"]: r["cv"]
        for r in running_totals_blocked(
            df, ["k"], ["blk"], {"v": "cv"}, max_driver_blocks=4
        ).collect()
    }
    assert got == want

    we = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want_m = {
        r["k"]: r["m"]
        for r in df.select("k", F.max("v").over(we).alias("m")).collect()
    }
    got_m = {
        r["k"]: r["hw"]
        for r in running_max_blocked(
            df, ["k"], ["blk"], "v", "hw", exclusive=True,
            max_driver_blocks=4,
        ).collect()
    }
    assert got_m == want_m
    first_k = min(want_m)
    assert got_m[first_k] is None  # globally-first row keeps NULL


def test_registered_query_through_recursive_fold(spark, monkeypatch, tmp_path):
    """Drive a REGISTERED blocked-prefix consumer (the late-data audit)
    through the recursive fold end-to-end: synthetic events span
    enough 8192-id blocks to actually split at the shrunken fanout,
    and the budget is forced to 1 — output must be identical to the
    default driver-folded path. (The testdata SFs fit in one or two
    blocks, where the termination guard correctly keeps the driver
    fold — hence the synthetic wide id range.)"""
    import datetime
    import os

    from ex_hivent_spark.operators import prefix
    from ex_hivent_spark.plans.registry import all_specs

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i * 3,  # ids span ~120k -> ~15 blocks of 8192
            ("click", "view", "error")[i % 3],
            # event time mostly advances, every 11th event arrives LATE
            base
            + datetime.timedelta(
                minutes=i - (500 if i % 11 == 0 else 0)
            ),
            float(i % 97),
            i % 13,
        )
        for i in range(40_000)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, value double,"
        " user_id long",
    )
    os.makedirs(f"{tmp_path}/sf", exist_ok=True)
    df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")

    spec = all_specs()["q_stream_late_audit"]
    want = sorted(map(repr, spec.spark(spark, str(tmp_path) + "/sf").collect()))
    assert want  # the late pattern produces audit rows
    monkeypatch.setattr(prefix, "_MAX_DRIVER_BLOCKS", 1)
    monkeypatch.setattr(prefix, "_FANOUT", 4)  # force >1 level too
    got = sorted(map(repr, spec.spark(spark, str(tmp_path) + "/sf").collect()))
    assert got == want


def test_recursive_offsets_composite_block_key(spark, monkeypatch):
    """Composite (group, bucket) blocks through the recursive fold:
    the cross-group carry must flow through the super levels exactly
    (no zero-sum-per-group assumption) — compare against the global
    window over (g, k), with budget 2 and fanout 4 forcing multiple
    recursion levels."""
    from ex_hivent_spark.operators import prefix
    from ex_hivent_spark.operators.prefix import running_totals_blocked

    rows = [(g, k, float((ord(g) + 1) * k % 7)) for g in ("a", "b", "c")
            for k in range(400)]
    df = spark.createDataFrame(rows, "g string, k long, v double").withColumn(
        "blk", F.expr("k DIV 16")
    )
    w = Window.orderBy("g", "k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["g"], r["k"]): r["cv"]
        for r in df.select("g", "k", F.sum("v").over(w).alias("cv")).collect()
    }
    monkeypatch.setattr(prefix, "_FANOUT", 4)
    got = {
        (r["g"], r["k"]): r["cv"]
        for r in running_totals_blocked(
            df, ["k"], ["g", "blk"], {"v": "cv"}, max_driver_blocks=2
        ).collect()
    }
    assert got == want


def test_sliding_distinct_through_recursive_fold(spark, monkeypatch):
    """q_win_sliding_distinct's (event_type, hour-block) composite
    blocking end-to-end through the recursive path must match the
    default driver-folded path."""
    from ex_hivent_spark.operators import prefix
    from ex_hivent_spark.plans.registry import all_specs

    sf = "/root/testdata/sf0.001"
    spec = all_specs()["q_win_sliding_distinct"]
    want = sorted(map(repr, spec.spark(spark, sf).collect()))
    monkeypatch.setattr(prefix, "_MAX_DRIVER_BLOCKS", 1)
    monkeypatch.setattr(prefix, "_FANOUT", 4)
    got = sorted(map(repr, spec.spark(spark, sf).collect()))
    assert got == want
