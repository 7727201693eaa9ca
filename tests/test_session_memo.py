"""session_memo: per-(session, sf_dir) memoization + the explicit
eviction contract (weak keys alone never fire — values reference the
session; catalog.clear_table_cache must clear through)."""

from __future__ import annotations

from ex_hivent_spark.session_memo import clear_session_memos, session_memo


def test_memoizes_per_session_and_sfdir(spark):
    calls = []

    @session_memo
    def frame(sp, sf_dir):
        calls.append(sf_dir)
        return sp.range(3)

    a1 = frame(spark, "/a")
    a2 = frame(spark, "/a")
    b1 = frame(spark, "/b")
    assert a1 is a2
    assert b1 is not a1
    assert calls == ["/a", "/b"]


def test_clear_evicts_one_session_or_all(spark):
    calls = []

    @session_memo
    def frame(sp, sf_dir):
        calls.append(sf_dir)
        return sp.range(1)

    frame(spark, "/x")
    clear_session_memos(spark)
    frame(spark, "/x")
    assert calls == ["/x", "/x"]
    clear_session_memos()
    frame(spark, "/x")
    assert calls == ["/x", "/x", "/x"]


def test_catalog_clear_table_cache_clears_memos(spark):
    from ex_hivent_spark.catalog import clear_table_cache

    calls = []

    @session_memo
    def frame(sp, sf_dir):
        calls.append(sf_dir)
        return sp.range(1)

    frame(spark, "/y")
    clear_table_cache(spark)
    frame(spark, "/y")
    assert calls == ["/y", "/y"]


def test_minhash_family_shares_one_signature_frame(spark, sf_dir):
    from ex_hivent_spark.llm.dedup import minhash_frames

    clear_session_memos(spark)
    sh1, mins1 = minhash_frames(spark, sf_dir)
    sh2, mins2 = minhash_frames(spark, sf_dir)
    assert sh1 is sh2 and mins1 is mins2
    clear_session_memos(spark)
