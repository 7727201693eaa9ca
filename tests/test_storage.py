"""Storage-layout plan evidence: partition pruning on partitioned
writes and shuffle-free joins on bucketed tables — the two write-time
layouts that pay for themselves at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.sources.sinks import write_bucketed_table, write_partitioned


def _plan(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])

    back = spark.read.parquet(out).filter(F.col("lang") == "de")
    plan = _plan(back)
    # the lang predicate must be a partition filter, not a data filter
    assert "PartitionFilters" in plan
    pf_line = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "lang" in pf_line
    # row parity with the unpartitioned source
    assert back.count() == docs.filter(F.col("lang") == "de").count()


def test_partitioned_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_rt")
    write_partitioned(docs, out, ["lang", "source"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """orders ⋈ lineitem on the bucket key must plan with no Exchange —
    the co-located layout replaces the per-query shuffle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed_table(
        spark, o, "t_orders_b", str(tmp_path / "ob"), "o_orderkey", 4,
        sort_col="o_orderkey",
    )
    write_bucketed_table(
        spark, li, "t_lineitem_b", str(tmp_path / "lb"), "l_orderkey", 4,
        sort_col="l_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try:
        # disable broadcast so the planner exercises the bucketed
        # sort-merge path (at real fact-table sizes broadcast is off the
        # table anyway — this test models that regime)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = _plan(joined, mode="simple")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is the same join
        plain = o.join(li, o.o_orderkey == li.l_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appends with a widened schema read back losslessly under
    mergeSchema (old rows surface NULL for the new column) — the
    additive-evolution contract a long-lived event table needs."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.mode("append").parquet(out)
    spark.createDataFrame(
        [(3, "c", 3.5)], "id long, name string, score double"
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert sorted(merged.columns) == ["id", "name", "score"]
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 3.5)}


# ---------------------------------------------------------------------------
# snapshot-versioned tables (time travel)
# ---------------------------------------------------------------------------
def test_versioned_table_time_travel(spark, tmp_path):
    """Each write commits a new immutable snapshot; old versions stay
    readable until vacuumed and the pointer always names the newest."""
    from ex_hivent_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    assert V.current_version(spark, t) is None
    v0 = V.write_snapshot(spark, spark.range(0, 10), t, note="initial")
    v1 = V.write_snapshot(spark, spark.range(0, 25), t, note="append batch")
    assert (v0, v1) == (0, 1)
    assert V.current_version(spark, t) == 1
    assert V.read_snapshot(spark, t).count() == 25
    assert V.read_snapshot(spark, t, version=0).count() == 10
    hist = V.history(spark, t)
    assert [h["version"] for h in hist] == [1, 0]
    assert hist[0]["rows"] == 25 and hist[0]["parent"] == 0
    assert hist[1]["note"] == "initial"


def test_versioned_table_vacuum_and_orphans(spark, tmp_path):
    """Vacuum removes old snapshots beyond the retention window AND
    uncommitted orphan directories above the head; the head survives."""
    import shutil

    from ex_hivent_spark.sources import versioned as V

    t = str(tmp_path / "tbl2")
    for n in (5, 6, 7, 8):
        V.write_snapshot(spark, spark.range(0, n), t)
    # simulate a crashed writer: v=99 exists but pointer still says 3
    shutil.copytree(f"{t}/v=3", f"{t}/v=99")
    removed = V.vacuum(spark, t, keep_last=2)
    assert removed == [0, 1, 99]
    assert V.read_snapshot(spark, t).count() == 8
    assert V.read_snapshot(spark, t, version=2).count() == 7
    import pytest

    with pytest.raises(FileNotFoundError):
        V.read_snapshot(spark, t, version=0)
    # history skips vacuumed versions without error
    assert [h["version"] for h in V.history(spark, t)] == [3, 2]


def test_versioned_pointer_commit_is_crash_safe(spark, tmp_path):
    """A fully-written but uncommitted snapshot (crash before the
    pointer rename) is invisible to readers: the pointer still resolves
    the previous version."""
    from ex_hivent_spark.sources import versioned as V

    t = str(tmp_path / "tbl3")
    V.write_snapshot(spark, spark.range(0, 4), t)
    # hand-write v=1 WITHOUT committing the pointer (simulates a crash
    # between data write and pointer rename)
    spark.range(0, 999).write.parquet(f"{t}/v=1")
    assert V.current_version(spark, t) == 0
    assert V.read_snapshot(spark, t).count() == 4
    # the next real write claims version 1... but v=1 dir exists from
    # the crash; write_snapshot overwrites it (mode=overwrite) and
    # commits cleanly
    v = V.write_snapshot(spark, spark.range(0, 6), t)
    assert v == 1 and V.read_snapshot(spark, t).count() == 6


def test_dynamic_partition_pruning_on_join(spark, sf_dir, tmp_path):
    """Catalyst's dynamic partition pruning must kick in when a
    partitioned fact table is joined against a filtered dim: the fact
    scan's PartitionFilters gains a dynamicpruning subquery, so at
    100 TB only the joined partitions are read at all."""
    from ex_hivent_spark.catalog import load_table

    fact = str(tmp_path / "events_by_type")
    load_table(spark, sf_dir, "events").write.partitionBy(
        "event_type"
    ).mode("overwrite").parquet(fact)

    dim = spark.createDataFrame(
        [("purchase", 1.0), ("view", 0.5)], ["event_type", "weight"]
    )
    joined = (
        spark.read.parquet(fact)
        .join(dim.filter("weight > 0.9"), "event_type")
    )
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan
    # semantics: only the surviving partition's rows come back
    n_purchase = (
        spark.read.parquet(fact)
        .filter("event_type = 'purchase'")
        .count()
    )
    assert joined.count() == n_purchase


def test_snapshot_diff_cdc(spark, tmp_path):
    """snapshot_diff emits exactly the inserted/deleted/updated keys
    between two committed versions — the change feed an incremental
    consumer applies instead of reprocessing the snapshot."""
    from ex_hivent_spark.sources import versioned as V

    t = str(tmp_path / "cdc_tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "val"]
    )
    V.write_snapshot(spark, base, t, note="v0")
    nxt = spark.createDataFrame(
        # 1 unchanged, 2 updated, 3 deleted, 4 inserted
        [(1, "a", 10), (2, "b", 99), (4, "d", 40)], ["k", "name", "val"]
    )
    V.write_snapshot(spark, nxt, t, note="v1")

    diff = {
        r.k: (r.change, r.name, r.val)
        for r in V.snapshot_diff(spark, t, 0, 1, "k").collect()
    }
    assert diff == {
        2: ("update", "b", 99),
        3: ("delete", "c", 30),
        4: ("insert", "d", 40),
    }
    # applying the diff via merge semantics reproduces v1 exactly:
    # unchanged keys never appear in the feed
    assert 1 not in diff


def test_streaming_publishes_versioned_snapshots(spark, tmp_path):
    """Composition: a streaming consumer publishing each micro-batch's
    derived state as a committed snapshot — readers time-travel across
    batch boundaries and always see a fully-committed version, never a
    half-written one."""
    from ex_hivent_spark.sources import versioned as V

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "versioned_out")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(src)

    def publish(batch_df, batch_id):
        agg = batch_df.groupBy("k").count()
        V.write_snapshot(spark, agg, tbl, note=f"batch {batch_id}")

    # data exists before the stream starts, so batch 0 is never empty
    # (an empty pre-append batch 0 would make the version bookkeeping
    # below timing-dependent)
    spark.range(100).selectExpr("id", "id % 3 AS k").write.mode(
        "append"
    ).json(src)
    q = (
        spark.readStream.schema("id LONG, k LONG")
        .json(src)
        .writeStream.foreachBatch(publish)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        v_after_first = V.current_version(spark, tbl)
        spark.range(100, 160).selectExpr("id", "id % 3 AS k").write.mode(
            "append"
        ).json(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert v_after_first is not None
    head = V.current_version(spark, tbl)
    assert head > v_after_first
    # the first committed snapshot is still time-travelable and
    # reflects only the first batch's rows
    first = V.read_snapshot(spark, tbl, version=v_after_first)
    assert sum(r["count"] for r in first.collect()) == 100
    assert V.history(spark, tbl)[0]["version"] == head


def test_snapshot_diff_across_schema_evolution(spark, tmp_path):
    """Adding a column between snapshots must not break the change
    feed: the diff runs over the NEW schema, the old side reads null
    for the added column, and rows that gained a value classify as
    updates (what an incremental consumer must reprocess)."""
    from pyspark.sql import functions as F

    from ex_hivent_spark.sources import versioned

    tdir = f"{tmp_path}/evolving"
    v0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, s string"
    )
    versioned.write_snapshot(spark, v0, tdir)
    # v1: adds column `extra`, backfilled for id=1 only; id=3 deleted;
    # id=4 inserted
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (4, "d", None)],
        "id long, s string, extra int",
    )
    versioned.write_snapshot(spark, v1, tdir)

    diff = versioned.snapshot_diff(spark, tdir, 0, 1, "id")
    by_id = {r["id"]: r for r in diff.collect()}
    assert by_id[1]["change"] == "update" and by_id[1]["extra"] == 10
    assert by_id[3]["change"] == "delete"
    assert by_id[4]["change"] == "insert"
    # id=2: extra stayed null, s unchanged -> genuinely unchanged...
    # except the null-vs-null struct compare: nulls are not unequal,
    # so the row must NOT appear in the feed
    assert 2 not in by_id

    # include_old carries the retraction payload with the added column
    # null on the old side
    diff_old = versioned.snapshot_diff(
        spark, tdir, 0, 1, "id", include_old=True
    )
    row1 = diff_old.filter(F.col("id") == 1).first()
    assert row1["old_extra"] is None and row1["old_s"] == "a"
