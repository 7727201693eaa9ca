"""Multimodal-column plumbing tests: schema, mapInPandas batch shapes,
deterministic stub decode, resize/frame-sample semantics."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.llm.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, "/root/testdata/sf0.001")


def test_media_schema_and_determinism(spark, media):
    row = media.filter(F.col("media_id") == 0).take(1)[0]
    assert row.kind == "image"
    # payload = md5(text) bytes repeated (doc_id % 7 + 1) = 1 time
    doc = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") == 0
    ).take(1)[0]
    assert bytes(row.payload) == hashlib.md5(doc.text.encode()).digest()
    assert row.meta.width == 1 and row.meta.height == 1
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_metadata_filter_prunes_payload(media):
    # predicate on typed metadata only — check it doesn't error and the
    # analyzed plan doesn't require payload for the filter
    audio = media.filter(F.col("kind") == "audio").select("media_id", "meta.sample_rate")
    rates = {r.sample_rate for r in audio.collect()}
    assert rates == {16000}


def test_extract_features_values(media):
    feats = extract_features(media)
    row = feats.filter(F.col("media_id") == 0).take(1)[0]
    import numpy as np

    raw = np.frombuffer(
        bytes(media.filter(F.col("media_id") == 0).take(1)[0].payload), dtype=np.uint8
    )
    assert row.n_bytes == len(raw) == 16
    assert row.mean_byte == pytest.approx(float(raw.mean()))
    assert len(row.histogram) == 8
    assert sum(row.histogram) == len(raw)


def test_resize_images(media):
    resized = resize_images(media, width=4, height=3)
    rows = resized.collect()
    assert rows, "no image rows"
    for r in rows:
        assert len(bytes(r.payload)) == 12
        assert r.meta.width == 4 and r.meta.height == 3
        assert r.kind == "image"


def test_sample_frames(media):
    frames = sample_frames(media, every_nth=2)
    per = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per, "no video rows"
    vids = {r.media_id: r.meta.n_frames for r in media.filter(F.col("kind") == "video").collect()}
    for r in per:
        n_frames = vids[r.media_id]
        assert r.n == (n_frames + 1) // 2  # every 2nd frame


def test_decode_pil_branch_with_fake_library(monkeypatch):
    """Exercise the real-decode branch without the library installed:
    inject a minimal fake PIL into sys.modules and check that an
    'encoded image' payload comes back as decoded pixel bytes while a
    payload the decoder rejects falls back to the deterministic path.
    (The genuine-PIL test below runs wherever PIL exists.)"""
    import sys
    import types

    from ex_hivent_spark.llm.multimodal import _decode_payload

    PIXELS = bytes(range(12))

    class FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return self

        def tobytes(self):
            return PIXELS

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeImageModule:
        @staticmethod
        def open(buf):
            if buf.read(4) != b"\x89PNG":
                raise OSError("cannot identify image file")
            return FakeImg()

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = FakeImageModule
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", FakeImageModule)

    # encoded-image payload → decoded pixels from the library
    assert _decode_payload(b"\x89PNGxxxx", "image") == PIXELS
    # undecodable payload → deterministic fallback (payload bytes)
    assert _decode_payload(b"notapng", "image") == b"notapng"
    # non-image kinds never consult the image library
    assert _decode_payload(b"\x89PNGxxxx", "audio") == b"\x89PNGxxxx"


def test_decode_real_pil_when_available():
    """Decode a genuine encoded PNG via the real library. Skips (with
    reason) in containers without PIL — the fake-library test above
    still covers the branch there."""
    PIL = pytest.importorskip("PIL", reason="PIL not installed in this container")
    import io

    from PIL import Image

    from ex_hivent_spark.llm.multimodal import _decode_payload

    img = Image.frombytes("L", (2, 2), bytes([10, 20, 30, 40]))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    assert _decode_payload(buf.getvalue(), "image") == bytes([10, 20, 30, 40])


def test_empty_payload_raises_not_implemented(spark):
    df = spark.createDataFrame(
        [(1, "image", b"", (1, 1, None, 1, "image"))],
        "media_id long, kind string, payload binary, "
        "meta struct<width int, height int, sample_rate int, n_frames int, format string>",
    )
    with pytest.raises(Exception, match="NotImplementedError|no decodable"):
        extract_features(df).collect()
