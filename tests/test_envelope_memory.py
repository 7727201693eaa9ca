"""Unit tests for the envelope + Memory surface, mirroring the
reference's own suites (FIXTURES.md §2):

- emit enrichment defaults ≙ emitter_test.exs:53-72
- version guard ≙ emitter.ex:64
- partition assignment determinism ≙ emitter.ex:53 / consumer.ex:105
- Memory all/last/clear/empty?/include? ≙ memory_test.exs:12-92
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ex_hivent_spark.envelope import (
    enrich,
    include_filter,
    partition_id,
    validate_version,
)
from ex_hivent_spark.memory import MemoryEmitter


@pytest.fixture()
def mem(spark):
    return MemoryEmitter(spark, producer="order_service")


class TestEmitEnrichment:
    def test_emit_stamps_all_meta(self, mem):
        # ≙ emitter_test.exs:53-64
        ev = mem.emit("an:event", {"foo": "bar"}, version=1, cid="a_cid", key="a_key")
        assert ev.meta.version == 1
        assert ev.meta.cid == "a_cid"
        assert ev.meta.key == "a_key"
        assert ev.meta.producer == "order_service"
        assert ev.meta.uuid and len(ev.meta.uuid) == 36
        assert ev.meta.created_at is not None

    def test_ack_equals_stored_event(self, mem):
        # ≙ emitter_test.exs:66-72: the ack IS the stored event
        ev = mem.emit("an:event", {"foo": "bar"}, version=1)
        assert mem.all()[-1] == ev

    def test_missing_cid_generated(self, mem):
        ev = mem.emit("an:event", {}, version=1)
        assert ev.meta.cid and len(ev.meta.cid) == 36

    def test_version_guard(self, mem):
        # ≙ emitter.ex:64 `when is_integer(version)`
        with pytest.raises(TypeError):
            mem.emit("an:event", {}, version="1")
        with pytest.raises(TypeError):
            mem.emit("an:event", {}, version=1.5)

    def test_payload_keys_stringified(self, mem):
        # ≙ consumer_test.exs:24 — JSON round-trip stringifies keys
        ev = mem.emit("an:event", {1: "x"}, version=1)
        assert ev.payload == {"1": "x"}


class TestEnrichDataFrame:
    def test_enrich_projection(self, spark):
        df = spark.createDataFrame(
            [("order:confirmed", '{"item": 55}', 1, None, "k1")],
            "name string, payload string, version int, cid string, key string",
        )
        out = enrich(df, producer="order_service", partition_count=4)
        row = out.take(1)[0]
        assert row.name == "order:confirmed"
        assert row.meta.producer == "order_service"
        assert row.meta.version == 1
        assert row.meta.cid is not None  # defaulted to a uuid
        assert row.meta.key == "k1"
        assert 0 <= row.partition_id < 4

    def test_key_derived_from_payload_when_missing(self, spark):
        # ≙ emitter.ex:53 — key defaults to a payload-derived value
        df = spark.createDataFrame(
            [("e", '{"a": 1}', 1, None, None), ("e", '{"a": 1}', 1, None, None),
             ("e", '{"b": 2}', 1, None, None)],
            "name string, payload string, version int, cid string, key string",
        )
        keys = [r.meta.key for r in enrich(df, "p").collect()]
        assert keys[0] == keys[1]  # same payload -> same derived key
        assert keys[0] != keys[2]
        assert all(k is not None for k in keys)

    def test_partition_assignment_deterministic(self, spark):
        df = spark.range(100).select(F.col("id").cast("string").alias("k"))
        a = [r.p for r in df.select(partition_id(F.col("k"), 4).alias("p")).collect()]
        b = [r.p for r in df.select(partition_id(F.col("k"), 4).alias("p")).collect()]
        assert a == b
        assert set(a) == {0, 1, 2, 3}  # all partitions used over 100 keys


class TestMemoryQueries:
    def test_all_insertion_order(self, mem):
        # ≙ memory_test.exs — all/1 returns insertion order
        mem.emit("a", {"i": 1}, version=1)
        mem.emit("b", {"i": 2}, version=1)
        assert [e.name for e in mem.all()] == ["a", "b"]

    def test_last(self, mem):
        assert mem.last() is None
        mem.emit("a", {}, version=1)
        mem.emit("b", {}, version=1)
        assert mem.last().name == "b"

    def test_clear_empty(self, mem):
        assert mem.empty()
        mem.emit("a", {}, version=1)
        assert not mem.empty()
        mem.clear()
        assert mem.empty()

    def test_include_subset_semantics(self, mem):
        # ≙ memory_test.exs:72-91 (FIXTURES.md §2.4)
        mem.emit("an:event", {"foo": "bar"}, version=2)
        assert not mem.include({"foo": "bar"}, {"version": 1})
        assert mem.include({"foo": "bar"}, {"version": 2})
        assert mem.include({}, {"name": "an:event"})
        # real payload matching (deviation from the vacuous reference arm)
        assert not mem.include({"foo": "nope"}, {"version": 2})

    def test_include_filter_on_events_table(self, spark, sf_dir):
        from ex_hivent_spark.catalog import load_table

        e = load_table(spark, sf_dir, "events").select(
            F.col("event_type").alias("name"),
            F.col("props").alias("payload"),
            F.struct(F.col("event_type").alias("name")).alias("meta"),
        )
        hits = include_filter(e, meta={"name": "signup"})
        assert hits.count() > 0
        assert hits.filter(F.col("name") != "signup").count() == 0
