"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas functions over
``mapInPandas``.

The pattern this module makes real (and tests):
- schema: ``media_id BIGINT, kind STRING, payload BINARY,
  meta STRUCT<width INT, height INT, sample_rate INT, n_frames INT,
  format STRING>`` — the payload is opaque to Spark; all pruning /
  predicate work happens on the typed metadata columns, so a filter on
  ``kind`` or ``meta.width`` never deserializes a byte of payload.
- compute: ``mapInPandas`` — each Arrow batch arrives as a pandas
  DataFrame whose ``payload`` column is ``bytes``; output is an
  iterator of pandas DataFrames matching the declared result schema.
  Batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
  at 100 TB the same code runs unchanged, parallelism = input partitions.
- the *decode* step tries the real image library first:
  ``_decode_payload`` decodes encoded images to pixel bytes via PIL
  when it is importable, and falls back to deterministic fake
  pixels/samples (the payload bytes) when the library is absent or the
  payload isn't an encoded image — so the same code runs real decodes
  in a full deployment and stays reproducible in this container (which
  has no media libraries). Audio/video decode (torchaudio/av) sits
  behind the same try-import pattern. The Spark-side plumbing (schema,
  partitioning, UDF signatures, batch shapes) is identical either way
  and is what these operators verify.

Media for the testdata is synthesized deterministically from the
``documents`` table (payload = repeated md5 bytes of the text), so every
operator is reproducible without binary fixtures.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.plans.registry import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

_KINDS = ("image", "audio", "video")


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from ``documents``:
    payload bytes = md5(text) repeated (1 + doc_id mod 7) times; kind
    cycles image/audio/video; metadata consistent with the kind. Pure
    built-in expressions — scales like any projection."""
    d = load_table(spark, sf_dir, "documents")
    payload_hex = F.repeat(F.md5("text"), (F.col("doc_id") % 7 + 1).cast("int"))
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    meta = F.struct(
        F.when(kind != "audio", (F.col("doc_id") % 64 + 1).cast("int")).alias("width"),
        F.when(kind != "audio", (F.col("doc_id") % 48 + 1).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind == "video", (F.col("doc_id") % 30 + 2).cast("int"))
        .otherwise(F.lit(1))
        .alias("n_frames"),
        kind.alias("format"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.to_binary(payload_hex, F.lit("hex")).alias("payload"),
        meta.alias("meta"),
    )


def _decode_payload(payload: bytes, kind: str | None = None) -> bytes:
    """Decode a media payload to raw sample bytes.

    Image path: when the optional image library (PIL) is importable AND
    the payload is a real encoded image, returns the decoded grayscale
    pixel bytes — the real decode.  Everything else (no library, or a
    payload PIL rejects — the synthetic testdata payloads are md5
    streams, not encoded images) falls back to the payload bytes
    themselves, a deterministic stand-in that keeps every downstream
    feature reproducible across environments.  Audio/video would slot
    in the same way with torchaudio/av; those libraries have no
    pure-python fallback so they stay behind the same try-import.

    Raises NotImplementedError for empty payloads — no decodable
    stream in any real decoder either."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload: no decodable stream")
    if kind == "image":
        try:
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                return img.convert("L").tobytes()
        except ImportError:
            pass  # no image library in this environment: fallback
        except Exception:
            pass  # not an encoded image (synthetic payload): fallback
    return payload


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean_byte double, "
    "byte_entropy double, histogram array<int>"
)


def extract_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """Decode + feature-extract over mapInPandas: per media item, byte
    statistics and an n-bin byte histogram (stand-ins for pixel stats /
    MFCCs). Vectorized with numpy inside each Arrow batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            decoded = [
                np.frombuffer(_decode_payload(p, k), dtype=np.uint8)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(a) for a in decoded],
                    "mean_byte": [float(a.mean()) for a in decoded],
                    "byte_entropy": [
                        float(
                            -(
                                (np.bincount(a, minlength=256) / len(a))
                                * np.log2(
                                    np.bincount(a, minlength=256) / len(a) + 1e-12
                                )
                            ).sum()
                        )
                        for a in decoded
                    ],
                    "histogram": [
                        np.bincount(a // (256 // n_bins), minlength=n_bins)
                        .astype("int32")
                        .tolist()
                        for a in decoded
                    ],
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: images only; payload truncated/tiled to the target
    pixel count (a real impl calls the image library here), metadata
    updated to the new dimensions — demonstrates a payload-rewriting
    mapInPandas with a binary output column."""
    out_schema = MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            payloads = []
            metas = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                raw = _decode_payload(p, "image")
                scaled = (raw * (target // len(raw) + 1))[:target]
                payloads.append(scaled)
                m = dict(m)
                m["width"], m["height"] = width, height
                metas.append(m)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(gen, out_schema)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling stub for video: emits one row per sampled frame
    (1->N mapInPandas, the UDTF shape); frame payload is the
    corresponding slice of the fake stream."""
    schema = "media_id long, frame_idx int, frame_payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                raw = _decode_payload(p, "video")
                n = max(int(m["n_frames"] or 1), 1)
                size = max(len(raw) // n, 1)
                for i in range(0, n, every_nth):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * size : (i + 1) * size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(gen, schema)


@register(
    "q_mm_decode_features",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             (['image','audio','video'])[(doc_id % 3 + 1)] AS kind,
             md5(text) AS h,
             (doc_id % 7 + 1) AS reps
      FROM documents
    ),
    bytes AS (
      SELECT media_id, kind, reps,
             ('0x' || substr(h, CAST(2 * i + 1 AS INT), 2))::BIGINT AS b
      FROM m, unnest(range(0, 16)) AS r(i)
    )
    SELECT media_id, any_value(kind) AS kind,
           CAST(any_value(reps) * 16 AS INT) AS n_bytes,
           CAST(floor((sum(b) / 16.0) * 10000.0 + 0.5) AS BIGINT)
               AS mean_byte_e4,
           CAST(sum(CASE WHEN b < 32 THEN 1 ELSE 0 END)
                * any_value(reps) AS INT) AS hist_bin0
    FROM bytes GROUP BY media_id
    """,
)
def q_mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + feature extraction end-to-end: synthesize the
    media table from documents, extract byte features via mapInPandas
    (numpy over Arrow batches — the real decode plumbing).

    Hash-checked against a pure-SQL oracle even though the Python path
    runs numpy on binary payloads: the synthetic payload is the md5
    byte stream repeated (1 + doc_id mod 7) times, so every reported
    feature is derivable from the 16 md5 bytes alone — the mean over
    the repeated stream equals the mean over one period (the rational
    (reps*s)/(reps*16) is the SAME number as s/16, hence the same
    correctly-rounded double), and the first histogram bin scales by
    reps. Byte sums are exact in float64 (< 2^53), so the e4-floored
    mean is bit-identical cross-engine. The decode fallback is also
    environment-stable: even with PIL installed, an md5 stream is not
    a decodable image, so the deterministic fallback path runs
    everywhere (tests/test_multimodal.py exercises the real-PIL branch
    separately)."""
    # r16 wave 10 NOTE: spreading the synthesized media frame before
    # the decode was A/B-tested THREE times and REVERTED (mins 0.53-
    # 0.66 plain vs 0.76-0.78 spread): the repartition ships the
    # repeated binary payloads, which costs more than the decode —
    # the guide §8 lesson (never shuffle heavy opaque bytes to buy
    # map parallelism).
    feats = extract_features(synth_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.floor(F.col("mean_byte") * 1e4 + F.lit(0.5)).alias("mean_byte_e4"),
        F.element_at("histogram", 1).alias("hist_bin0"),
    )


@register(
    "q_mm_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id,
             (doc_id % 30 + 2) AS n,
             16 * (doc_id % 7 + 1) AS nbytes
      FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
      SELECT media_id, n, nbytes,
             greatest(nbytes // n, 1) AS sz,
             unnest(range(0, n, 2)) AS i
      FROM v
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(max(i) AS INT) AS max_frame_idx,
           CAST(sum(CASE WHEN (i + 1) * sz <= nbytes THEN sz
                         WHEN i * sz >= nbytes THEN 0
                         ELSE nbytes - i * sz END) AS BIGINT)
               AS sampled_bytes
    FROM f GROUP BY media_id
    """,
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 2nd frame) + per-video frame counts —
    the 1->N multimodal mapInPandas shape.

    Hash-checked: the Python slicing arithmetic (frame size =
    max(len//n, 1), clamped tail slice) is mirrored exactly as integer
    SQL over the synthetic payload's known length (16 bytes per md5
    repeat), so the oracle verifies the UDTF's per-frame byte
    accounting, not just its row count."""
    frames = sample_frames(synth_media(spark, sf_dir), every_nth=2)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.max("frame_idx").alias("max_frame_idx"),
        F.sum(F.length("frame_payload")).alias("sampled_bytes"),
    )


SHARD_TARGET_BYTES = 4096  # test-scale stand-in for the ~512 MB prod shard


@register(
    "q_mm_shard_pack",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
             CAST(len(md5(text)) // 2 * (doc_id % 7 + 1) AS BIGINT) AS n_bytes
      FROM documents
    ),
    packed AS (
      SELECT kind, media_id, n_bytes,
             CAST((CAST(sum(n_bytes) OVER (PARTITION BY kind ORDER BY media_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT) - n_bytes)
                 // {SHARD_TARGET_BYTES} AS BIGINT) AS shard_id
      FROM media
    )
    SELECT kind, shard_id, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
           min(media_id) AS first_media_id, max(media_id) AS last_media_id
    FROM packed GROUP BY kind, shard_id
    """,
)
def q_mm_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard packing for multimodal training data: assign media items to
    fixed-size output shards (WebDataset/tar-shard style) by greedy
    sequential fill — shard = floor(bytes-before-me / target) within
    each kind, i.e. a new shard starts once the running payload size
    crosses the target. One window cumsum + one aggregate, all-integer.

    The payload itself is never shuffled for the PLAN of the packing —
    only (kind, media_id, n_bytes) flows through the window; the writer
    stage later repartitions by (kind, shard_id) so each task streams
    exactly one shard. ``octet_length`` on the binary column prunes to
    parquet column statistics at scale; the test target is 4 KB standing
    in for the ~512 MB production shard.

    Hardened after the r4 driver hash mismatch: the oracle now derives
    n_bytes from the SAME construction as the Spark side
    (``len(md5(text)) // 2 * reps`` — the payload is the md5 digest
    repeated), not the `16*(doc_id%7+1)` data-shape shortcut, so a data
    generator change cannot split the two; every integer window/agg
    output is CAST(... AS BIGINT) so DuckDB's HUGEINT sums can't
    hash-diverge from Spark's BIGINT."""
    media = synth_media(spark, sf_dir)
    from pyspark.sql import Window

    sized = media.select(
        "kind", "media_id", F.octet_length("payload").alias("n_bytes")
    )
    w = (
        Window.partitionBy("kind")
        .orderBy("media_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "shard_id",
        F.floor(
            (F.sum("n_bytes").over(w) - F.col("n_bytes"))
            / F.lit(SHARD_TARGET_BYTES)
        ),
    )
    return packed.groupBy("kind", "shard_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
        F.min("media_id").alias("first_media_id"),
        F.max("media_id").alias("last_media_id"),
    )


PATCH = 8  # ViT patch edge (pixels)
PATCH_BUDGET = 1024  # patches per packed training batch


@register(
    "q_mm_resolution_bucket",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             CAST(doc_id % 64 + 1 AS BIGINT) AS w,
             CAST(doc_id % 48 + 1 AS BIGINT) AS h
      FROM documents
    ),
    visual AS (
      SELECT media_id, kind, w, h,
             (w * 16) // h AS ar_bucket,
             ((w + {PATCH - 1}) // {PATCH})
               * ((h + {PATCH - 1}) // {PATCH}) AS n_patches
      FROM media WHERE kind <> 'audio'
    )
    SELECT kind, ar_bucket,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(w * h) AS BIGINT) AS total_pixels,
           CAST(max(w) AS BIGINT) AS max_w,
           CAST(max(h) AS BIGINT) AS max_h,
           CAST(sum(n_patches) AS BIGINT) AS total_patches,
           CAST((sum(n_patches) + {PATCH_BUDGET - 1}) // {PATCH_BUDGET}
                AS BIGINT) AS n_batches
    FROM visual GROUP BY kind, ar_bucket
    """,
)
def q_mm_resolution_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing for variable-resolution batch packing
    (the NaViT / bucketed-dataloader prep step): group visual media by
    a 16-grain integer aspect-ratio bucket, count ViT patches per item
    (⌈w/8⌉·⌈h/8⌉), and size the per-bucket batch plan against a fixed
    patch budget — the metadata pass that decides how many packed
    batches each shape class yields BEFORE any pixel is decoded.

    Plan: metadata-only projection over the media table (the payload
    binary column is never read — column pruning keeps it out of the
    scan), one hash aggregate on (kind, bucket). All-integer
    arithmetic; the oracle derives w/h from the same deterministic
    construction as synth_media."""
    media = synth_media(spark, sf_dir)
    visual = media.filter(F.col("kind") != "audio").select(
        "media_id",
        "kind",
        F.col("meta.width").cast("bigint").alias("w"),
        F.col("meta.height").cast("bigint").alias("h"),
    )
    visual = visual.select(
        "kind",
        "w",
        "h",
        F.expr("(w * 16) DIV h").alias("ar_bucket"),
        (
            F.expr(f"(w + {PATCH - 1}) DIV {PATCH}")
            * F.expr(f"(h + {PATCH - 1}) DIV {PATCH}")
        ).alias("n_patches"),
    )
    return visual.groupBy("kind", "ar_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.col("w") * F.col("h")).cast("bigint").alias("total_pixels"),
        F.max("w").cast("bigint").alias("max_w"),
        F.max("h").cast("bigint").alias("max_h"),
        F.sum("n_patches").cast("bigint").alias("total_patches"),
        F.expr(
            f"CAST((sum(n_patches) + {PATCH_BUDGET - 1})"
            f" DIV {PATCH_BUDGET} AS BIGINT)"
        ).alias("n_batches"),
    )


_CHUNK_WIN = 8  # bytes per audio chunk (test-scale stand-in for the
_CHUNK_HOP = 4  # ~30s window / 50% hop of a real ASR chunker)


def chunk_audio(
    media: DataFrame, win: int = _CHUNK_WIN, hop: int = _CHUNK_HOP
) -> DataFrame:
    """Overlapping audio chunking stub: one row per (win, hop) sliding
    window over the decoded sample stream — the 1->N mapInPandas shape
    ASR/diarization pipelines feed their per-chunk models with. Tail
    windows are shorter (clamped slice), matching torchaudio-style
    framing without padding."""
    schema = (
        "media_id long, chunk_idx int, start_byte int, chunk_payload binary"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, chunks = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = _decode_payload(p, "audio")
                for j, s in enumerate(range(0, len(raw), hop)):
                    ids.append(mid)
                    idxs.append(j)
                    starts.append(s)
                    chunks.append(raw[s : s + win])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_idx": idxs,
                    "start_byte": starts,
                    "chunk_payload": chunks,
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(gen, schema)


@register(
    "q_mm_audio_chunks",
    oracle=f"""
    WITH a AS (
      SELECT doc_id AS media_id,
             CAST(16 * (doc_id % 7 + 1) AS BIGINT) AS nbytes
      FROM documents WHERE doc_id % 3 = 1
    ),
    c AS (
      SELECT media_id, nbytes, unnest(range(0, nbytes, {_CHUNK_HOP})) AS s
      FROM a
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(max(s) AS INT) AS last_start,
           CAST(sum(least({_CHUNK_WIN}, nbytes - s)) AS BIGINT)
               AS chunk_bytes
    FROM c GROUP BY media_id
    """,
)
def q_mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window audio chunking (win 8, hop 4 — 50% overlap)
    + per-item chunk accounting: the windowed 1->N multimodal shape
    behind ASR/diarization feature extraction, with overlap — the bit
    q_mm_frame_sample's disjoint frames don't cover.

    Hash-checked: the Python slice arithmetic (start grid at the hop,
    clamped tail slices) is mirrored exactly as integer SQL over the
    synthetic payload's known length (16 bytes per md5 repeat), so the
    oracle verifies the chunker's byte accounting, not just row
    counts. Plan: metadata-pruned scan (kind filter never touches
    payload bytes of other kinds), Arrow-batched mapInPandas, one hash
    aggregate — parallelism = input partitions at any scale."""
    chunks = chunk_audio(synth_media(spark, sf_dir))
    return chunks.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.max("start_byte").cast("int").alias("last_start"),
        F.sum(F.length("chunk_payload")).cast("bigint").alias("chunk_bytes"),
    )


# Perceptual-hash near-dup banding: 48-bit hash, 4 bands x 12 bits,
# Hamming acceptance radius (of 48).
_PHASH_BANDS = 4
_PHASH_BAND_BITS = 12
_PHASH_MAX_HAMMING = 8


@register(
    "q_mm_phash_neardup",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             repeat(md5(text), CAST(doc_id % 7 + 1 AS INT)) AS payload_hex
      FROM documents WHERE doc_id % 3 = 0
    ),
    ph AS (
      SELECT media_id,
             ('0x' || substr(md5(payload_hex), 1, 12))::BIGINT AS phash
      FROM media
    ),
    bands AS (
      -- divisors as BIGINT literals: DuckDB's ** returns DOUBLE and
      -- // with a double divisor does NOT floor (latent bug exposed
      -- by the census rewrite; the empty pair output had masked it)
      SELECT media_id, phash, b.band_id,
             (phash // b.divisor) % 4096 AS band_val
      FROM ph CROSS JOIN
           (SELECT * FROM (VALUES {", ".join(
               f"({i}, {4096 ** i})" for i in range(_PHASH_BANDS)
           )}) AS t(band_id, divisor)) b
    ),
    buckets AS (
      SELECT band_id, band_val, CAST(count(*) AS BIGINT) AS c
      FROM bands GROUP BY band_id, band_val
    ),
    census AS (
      SELECT band_id,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(max(c) AS BIGINT) AS max_bucket_size,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_candidate_pairs
      FROM buckets GROUP BY band_id
    ),
    matched AS (
      SELECT a.band_id, CAST(count(*) AS BIGINT) AS n_matched_pairs
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.media_id < b.media_id
      WHERE bit_count(xor(a.phash, b.phash)) <= {_PHASH_MAX_HAMMING}
      GROUP BY a.band_id
    )
    SELECT c.band_id, c.n_buckets, c.max_bucket_size,
           c.n_candidate_pairs,
           CAST(coalesce(m.n_matched_pairs, 0) AS BIGINT)
             AS n_matched_pairs
    FROM census c LEFT JOIN matched m ON m.band_id = c.band_id
    """,
)
def q_mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection via perceptual-hash LSH banding,
    reported as the per-band BANDING CENSUS — the image twin of
    MinHash text dedup: a 48-bit pHash per image, split into 4×12-bit
    bands; images sharing any band become candidates (equi-join on
    (band_id, band_val) — never an all-pairs product), verified by
    full-hash Hamming distance ≤ 8/48. Each band reports its bucket
    count, largest bucket, candidate-pair volume (Σ c·(c−1)/2 — the
    quantity that bounds join cost at scale), and how many candidates
    VERIFIED — so the report is the tuning readout an image-dedup run
    ships even when it finds zero dups ("n candidates tried, 0
    verified" is a real audit; on this synthetic corpus true matches
    exist only where whole payloads repeat).

    The pHash here is the md5-prefix int48 of the payload's hex (this
    container has no image libs; a real deployment swaps in a DCT
    pHash inside the same mapInPandas decode stage —
    _decode_payload's try-import pattern — leaving every band/join/
    verify step unchanged, which is exactly the plumbing this query
    verifies). Payloads are the synth_media bytes, so the oracle
    re-derives the identical hash from repeat(md5(text), k).

    Determinism: all-integer — md5-prefix hashes, arithmetic band
    extraction (floor-div by powers of two is exact in doubles),
    exact xor + bit_count; no rounding anywhere."""
    media = synth_media(spark, sf_dir).filter(F.col("kind") == "image")
    ph = media.select(
        "media_id",
        F.conv(
            F.substring(F.md5(F.lower(F.hex("payload"))), 1, 12), 16, 10
        )
        .cast("long")
        .alias("phash"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                (
                    (F.col("phash") / F.lit(4096 ** i)).cast("long")
                    % 4096
                ).alias("band_val"),
            )
            for i in range(_PHASH_BANDS)
        ]
    )
    bands = ph.select(
        "media_id", "phash", F.explode(band_structs).alias("b")
    ).select(
        "media_id", "phash", "b.band_id", "b.band_val"
    ).localCheckpoint(eager=False)  # feeds the census AND the verify join
    buckets = bands.groupBy("band_id", "band_val").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    census = buckets.groupBy("band_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("c").cast("bigint").alias("max_bucket_size"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2)
        .cast("bigint")
        .alias("n_candidate_pairs"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    matched = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .filter(
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            )
            <= _PHASH_MAX_HAMMING
        )
        .groupBy(F.col("a.band_id").alias("band_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matched_pairs"))
    )
    return census.join(matched, "band_id", "left").select(
        "band_id",
        "n_buckets",
        "max_bucket_size",
        "n_candidate_pairs",
        F.coalesce("n_matched_pairs", F.lit(0))
        .cast("bigint")
        .alias("n_matched_pairs"),
    )


# Windowed RMS framing: full 16-byte windows at 50% overlap (tail
# windows shorter than the full width are dropped — RMS of a ragged
# frame is not comparable).
_RMS_WIN = 16
_RMS_HOP = 8


@register(
    "q_mm_audio_rms_windows",
    oracle=f"""
    WITH a AS (
      SELECT doc_id AS media_id,
             repeat(md5(text), CAST(doc_id % 7 + 1 AS INT)) AS payload_hex,
             CAST(16 * (doc_id % 7 + 1) AS BIGINT) AS nbytes
      FROM documents WHERE doc_id % 3 = 1
    ),
    w AS (
      SELECT media_id, payload_hex,
             unnest(range(0, nbytes - {_RMS_WIN} + 1, {_RMS_HOP})) AS s
      FROM a
    ),
    b AS (
      SELECT media_id, payload_hex, s,
             unnest(range(0, {_RMS_WIN})) AS i
      FROM w
    ),
    v AS (
      SELECT media_id, s,
             ('0x' || substr(payload_hex, CAST(2 * (s + i) + 1 AS INT), 2))
               ::BIGINT AS byte
      FROM b
    ),
    g AS (
      SELECT media_id, s,
             CAST(sum(byte) AS BIGINT) AS sb,
             CAST(sum(byte * byte) AS BIGINT) AS ssq
      FROM v GROUP BY media_id, s
    )
    SELECT media_id, CAST(s AS INT) AS win_start,
           sb AS amp_sum,
           floor(sqrt(CAST(ssq AS DOUBLE) / {_RMS_WIN}.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS rms,
           floor(CAST(sb AS DOUBLE) / {_RMS_WIN}.0
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_amp
    FROM g
    """,
)
def q_mm_audio_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy profile: per full 16-byte frame at 50%
    overlap, the RMS amplitude and DC mean of the decoded sample
    stream (u8 samples) — the VAD/loudness feature every audio
    curation pipeline computes before segmenting (silence trimming,
    clipping detection); the numeric companion to q_mm_audio_chunks'
    byte accounting.

    Hash-checked end to end: frame starts are integer hop arithmetic,
    per-frame Σb and Σb² are exact integers (≤ 16·255² — tiny), and
    the oracle re-derives the identical sample bytes from the
    synthetic payload's hex form, so RMS/mean agree on the e6 grid.
    Plan: metadata-pruned scan (only audio payloads are ever decoded),
    one Arrow-batched mapInPandas emitting exact integer frame sums
    (parallelism = input partitions at any scale), one JVM-side
    projection for the rounded readouts — no shuffle at all."""
    schema = "media_id long, win_start int, sb long, ssq long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, starts, sbs, ssqs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = _decode_payload(p, "audio")
                b = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                for s in range(0, len(b) - _RMS_WIN + 1, _RMS_HOP):
                    fr = b[s : s + _RMS_WIN]
                    ids.append(mid)
                    starts.append(s)
                    sbs.append(int(fr.sum()))
                    ssqs.append(int((fr * fr).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "win_start": starts,
                    "sb": sbs,
                    "ssq": ssqs,
                }
            )

    media = synth_media(spark, sf_dir)
    frames = media.filter(F.col("kind") == "audio").mapInPandas(gen, schema)
    from ex_hivent_spark.functions.decimals import dround

    return frames.select(
        "media_id",
        "win_start",
        F.col("sb").alias("amp_sum"),
        dround(
            F.sqrt(F.col("ssq").cast("double") / float(_RMS_WIN)), 6
        ).alias("rms"),
        dround(F.col("sb").cast("double") / float(_RMS_WIN), 6).alias(
            "mean_amp"
        ),
    )


@register(
    "q_mm_pixel_stats",
    oracle="""
    WITH a AS (
      SELECT doc_id AS media_id,
             repeat(md5(text), CAST(doc_id % 7 + 1 AS INT)) AS payload_hex,
             CAST(16 * (doc_id % 7 + 1) AS BIGINT) AS n_px
      FROM documents WHERE doc_id % 3 = 0
    ),
    b AS (
      SELECT media_id, n_px,
             ('0x' || substr(payload_hex, CAST(2 * i + 1 AS INT), 2))::BIGINT
               AS byte
      FROM a, unnest(range(0, n_px)) t(i)
    ),
    g AS (
      SELECT media_id,
             CAST(any_value(n_px) AS BIGINT) AS n_px,
             CAST(sum(byte) AS BIGINT) AS sb,
             CAST(sum(byte * byte) AS BIGINT) AS ssq,
             CAST(min(byte) AS BIGINT) AS px_min,
             CAST(max(byte) AS BIGINT) AS px_max
      FROM b GROUP BY media_id
    )
    SELECT media_id, n_px, px_min, px_max,
           px_max - px_min AS px_range,
           floor(CAST(sb AS DOUBLE) / n_px * 1000000.0 + 0.5)
               / 1000000.0 AS mean_px,
           floor((CAST(ssq AS DOUBLE) / n_px
                  - (CAST(sb AS DOUBLE) / n_px)
                    * (CAST(sb AS DOUBLE) / n_px)) * 1000000.0 + 0.5)
               / 1000000.0 AS var_px
    FROM g
    """,
)
def q_mm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image pixel statistics over the decoded (grayscale) buffer:
    exact min/max/range plus e6-rounded mean and population variance —
    the brightness/contrast screen an image-curation pipeline runs
    before training (all-black frames, blown-out scans, low-dynamic-
    range crops all gate on exactly these), the image companion to
    q_mm_audio_rms_windows' energy profile.

    Hash-checked end to end: per-image Σb, Σb², min, max are exact
    integers (≤ 112·255² — tiny) computed in one Arrow-batched
    mapInPandas pass over the metadata-pruned scan (only image-kind
    payloads decode; at 100 TB parallelism = input partitions, no
    shuffle before the final tiny projection), and the oracle
    re-derives the identical bytes from the synthetic payload's hex
    form, so mean/variance agree on the e6 grid (the variance is the
    same div/div/mul/sub expression tree in both engines)."""
    schema = "media_id long, n_px long, sb long, ssq long, mn long, mx long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ns, sbs, ssqs, mns, mxs = [], [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = _decode_payload(p, "image")
                b = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                ids.append(mid)
                ns.append(int(b.size))
                sbs.append(int(b.sum()))
                ssqs.append(int((b * b).sum()))
                mns.append(int(b.min()))
                mxs.append(int(b.max()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_px": ns,
                    "sb": sbs,
                    "ssq": ssqs,
                    "mn": mns,
                    "mx": mxs,
                }
            )

    media = synth_media(spark, sf_dir)
    stats = media.filter(F.col("kind") == "image").mapInPandas(gen, schema)
    from ex_hivent_spark.functions.decimals import dround

    mean_raw = F.col("sb").cast("double") / F.col("n_px")
    return stats.select(
        "media_id",
        "n_px",
        F.col("mn").alias("px_min"),
        F.col("mx").alias("px_max"),
        (F.col("mx") - F.col("mn")).alias("px_range"),
        dround(mean_raw, 6).alias("mean_px"),
        dround(
            F.col("ssq").cast("double") / F.col("n_px")
            - mean_raw * mean_raw,
            6,
        ).alias("var_px"),
    )


_ASPECT_BATCH = 32


@register(
    "q_mm_aspect_bucket_pack",
    oracle=f"""
    WITH m AS (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image' ELSE 'video' END AS kind,
             CAST(doc_id % 64 + 1 AS BIGINT) AS w,
             CAST(doc_id % 48 + 1 AS BIGINT) AS h
      FROM documents WHERE doc_id % 3 <> 1
    ),
    g AS (
      SELECT kind, w * 4 // h AS aspect_bucket,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(w * h) AS BIGINT) AS total_px
      FROM m GROUP BY kind, w * 4 // h
    )
    SELECT kind, CAST(aspect_bucket AS BIGINT) AS aspect_bucket,
           n_items, total_px,
           (n_items + {_ASPECT_BATCH - 1}) // {_ASPECT_BATCH} AS n_batches,
           ((n_items + {_ASPECT_BATCH - 1}) // {_ASPECT_BATCH})
               * {_ASPECT_BATCH} - n_items AS pad_waste
    FROM g
    """,
)
def q_mm_aspect_bucket_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing for batched vision training: visual
    media (image/video) group into integer quarter-aspect buckets
    (⌊4·w/h⌋ — the standard trick so a batch shares one crop shape),
    and each bucket reports its item count, total pixel budget, the
    number of fixed-size batches it fills, and the padding waste of
    the last partial batch — the planning readout a multimodal
    dataloader uses to pick bucket boundaries.

    Plan: pure typed-metadata arithmetic — the payload column is
    never touched (the module's metadata-pruning contract), one
    JVM-side hash aggregate; integers end-to-end, no rounding."""
    media = synth_media(spark, sf_dir)
    m = media.filter(F.col("kind") != "audio").select(
        "kind",
        F.col("meta.width").cast("bigint").alias("w"),
        F.col("meta.height").cast("bigint").alias("h"),
    )
    g = (
        m.select(
            "kind", F.expr("w * 4 DIV h").alias("aspect_bucket"), "w", "h"
        )
        .groupBy("kind", "aspect_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("w") * F.col("h")).cast("bigint").alias("total_px"),
        )
    )
    n_batches = F.expr(f"(n_items + {_ASPECT_BATCH - 1}) DIV {_ASPECT_BATCH}")
    return g.select(
        "kind",
        "aspect_bucket",
        "n_items",
        "total_px",
        n_batches.alias("n_batches"),
        (n_batches * _ASPECT_BATCH - F.col("n_items")).alias("pad_waste"),
    )
