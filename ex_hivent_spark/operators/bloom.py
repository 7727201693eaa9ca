"""Bloom-filter join pruning: a runtime semi-filter that drops fact
rows whose key CANNOT match the build side, before the join shuffle.

The scale problem: a selective dimension filter (say 2% of orders)
still forces the full fact table through the join shuffle — the rows
that will not match are only discovered AFTER being hashed, serialized
and shuffled. Engines solve this with runtime filters (Spark's
row-level runtime filtering / DPP, Trino's dynamic filters); this
module is that mechanism as an explicit, composable library op:

1. BUILD: hash each build-side key k times into an m-bit Bloom filter,
   kept as a (word_index -> 64-bit word) bitmap table of at most m/64
   rows — O(m) size no matter how many keys, which is the advantage
   over broadcasting the distinct key set itself.
2. PROBE: each fact row recomputes the k hashes and checks the bits
   via a BROADCAST join on word_index (the bitmap is KBs). Rows with
   any unset bit are dropped map-side — they never reach the shuffle.
3. JOIN: the surviving (possible-match) rows take the ordinary join.

Bloom filters have false positives but NO false negatives, so the
pruned join returns EXACTLY the rows of the unpruned join — which is
why ``q_join_bloom_prefilter``'s oracle is the plain join SQL: the
correctness check proves the no-false-negative property end to end.

Hashing is Spark-side xxhash64 (never crosses to the oracle — the
filter is transparent to results, so the oracle needn't reproduce it).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Static defaults: the no-manifest path (and the driver harness, where
# no table is ever ANALYZEd). When a _STATS.json manifest exists,
# ``stats_bloom_params`` sizes m and k from the key's approx ndv
# instead — the same stats wiring as planner.stats_broadcast.
BLOOM_M = 1 << 16  # filter bits
BLOOM_SEEDS = (101, 202)  # k = 2 hash functions
BLOOM_FPP = 0.01  # target false-positive rate for stats-derived sizing
# bitmap ceiling: 2^27 bits = 16 MB of words — stays broadcastable
BLOOM_M_MAX = 1 << 27
_SEED_POOL = (101, 202, 303, 404, 505, 606, 707, 808)


def bloom_params(ndv: int, fpp: float = BLOOM_FPP) -> tuple[int, tuple[int, ...]]:
    """Textbook Bloom sizing for ``ndv`` expected keys at false-positive
    rate ``fpp``: m = ⌈−n·ln p / (ln 2)²⌉ bits and k = round(m/n · ln 2)
    hash functions, clamped to [BLOOM_M, BLOOM_M_MAX] bits and the
    available seed pool. Returns (m, seeds)."""
    n = max(1, int(ndv))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(BLOOM_M, min(BLOOM_M_MAX, m))
    k = max(1, min(len(_SEED_POOL), round(m / n * math.log(2))))
    return m, _SEED_POOL[:k]


def stats_bloom_params(
    spark,
    table_path: str,
    key_col: str,
    fpp: float = BLOOM_FPP,
) -> tuple[int, tuple[int, ...]]:
    """ANALYZE-informed Bloom sizing (the planner.stats_broadcast
    pattern): when ``table_path`` carries a ``_STATS.json`` manifest
    (maintenance.analyze_table), size the filter from the key column's
    approx ndv; otherwise fall back to the static (BLOOM_M,
    BLOOM_SEEDS) defaults — also the driver-harness path, where no
    manifests exist, so registered-query plans are unchanged there.
    The manifest ndv is an upper bound on the build side's key count
    when the build is a filtered slice of the table — conservative
    (larger m, never an inflated false-positive rate)."""
    from ex_hivent_spark.maintenance import read_table_stats

    stats = read_table_stats(spark, table_path)
    if not stats or key_col not in stats.get("columns", {}):
        return BLOOM_M, BLOOM_SEEDS
    return bloom_params(stats["columns"][key_col]["approx_ndv"], fpp)


def _hash(col_name: str, m: int, seed: int):
    """Bloom bit position: pmod(xxhash64(seed, key), m), as a Column
    plus the word index / in-word mask derived from it."""
    h = F.pmod(F.xxhash64(F.lit(seed).cast("long"), F.col(col_name)), F.lit(m))
    word = F.shiftright(h, 6)  # h DIV 64
    mask = F.expr(
        f"shiftleft(1L, cast(pmod(xxhash64(CAST({seed} AS BIGINT), "
        f"{col_name}), {m}) % 64 AS int))"
    )
    return word, mask


def bloom_bitmap(
    keys: DataFrame, key_col: str, m: int, seed: int
) -> DataFrame:
    """Aggregate the build side's keys into the (word -> bits) bitmap:
    one narrow shuffle keyed on word index, ≤ m/64 output rows."""
    word, mask = _hash(key_col, m, seed)
    return (
        keys.select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    build_key: str,
    m: int = BLOOM_M,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> DataFrame:
    """Drop fact rows that cannot join ``keys`` on the key columns:
    for each hash seed, a broadcast join against that seed's bitmap
    word plus a bit test. Never drops a true match (no false
    negatives); false positives pass through to the real join, which
    re-checks exactly. Probe cost: k broadcast-hash lookups per row,
    all map-side."""
    out = fact
    for i, seed in enumerate(seeds):
        bm = F.broadcast(
            bloom_bitmap(keys, build_key, m, seed)
            .withColumnRenamed("word", f"__w{i}")
            .withColumnRenamed("bits", f"__bits{i}")
        )
        word, mask = _hash(fact_key, m, seed)
        out = (
            out.withColumn(f"__pw{i}", word)
            .join(bm, F.col(f"__pw{i}") == F.col(f"__w{i}"), "inner")
            .filter((F.col(f"__bits{i}").bitwiseAND(mask)) != 0)
            .drop(f"__pw{i}", f"__w{i}", f"__bits{i}")
        )
    return out
