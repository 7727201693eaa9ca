"""LLM-pipeline deduplication operators: exact (hash-groupBy) and
MinHash-LSH near-duplicate detection.

Everything is built-in Spark expressions (xxhash64 / md5 / higher-order
array functions) — no Python UDFs, so the whole pipeline stays in
whole-stage codegen and scales linearly:

- exact dedup: one shuffle on the content hash.
- MinHash LSH: per-doc signature computation is map-only; candidate
  generation is an equi-join on (band_id, band_hash) buckets — the only
  shuffle is by bucket key, never an all-pairs product; candidates are
  then verified with exact token-set Jaccard (join back + array
  intersect), so output quality doesn't depend on the sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.plans.registry import register

# MinHash parameters: 16 bands x 2 rows = 32 permutations.
N_PERM = 32
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5

# Mersenne prime for universal hashing h_i(x) = (a_i * x + b_i) mod p.
# 2^31-1 keeps a*x well inside int64 (a <= 63, x mod p < 2^31).
_P = (1 << 31) - 1


@register(
    "q_llm_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_md5,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: md5(text) → keep the smallest doc_id per
    hash. At 100 TB this is the standard first pass — one shuffle on a
    16-byte key instead of the full text."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles of a whitespace-tokenized text, each
    hashed to a 64-bit int with xxhash64. Pure built-ins: split +
    transform over an index sequence + slice + concat."""
    tokens = F.split(text, " ")
    n = F.greatest(F.size(tokens) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, k))),
        )
    )


def _perm_hasher(a: int, b: int):
    # NB: returns a 1-arg lambda — pyspark's higher-order-function
    # binding counts *all* parameters (including defaults), so the usual
    # `lambda x, a=a` closure trick breaks arity detection.
    return lambda x: F.pmod(a * F.pmod(x, F.lit(_P)) + b, F.lit(_P))


def minhash_signature(shingle_hashes: Column, n_perm: int = N_PERM) -> Column:
    """MinHash signature: for permutation i, min over shingles of the
    universal hash (a_i*x + b_i) mod p. Coefficients are fixed odd
    constants — fully deterministic across runs and partitionings."""
    sigs = []
    for i in range(n_perm):
        a = 2 * i + 1  # odd multiplier
        b = 1_000_003 * (i + 1)
        sigs.append(F.array_min(F.transform(shingle_hashes, _perm_hasher(a, b))))
    return F.array(*sigs)


@register("q_llm_minhash_neardup", oracle=None)
def q_llm_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate document pairs via MinHash + LSH banding, verified
    with exact token-set Jaccard >= 0.5. Output: (doc_a, doc_b, jaccard).

    Not SQL-expressible for the oracle (sketch-based candidate
    generation); result is deterministic, the driver records rows-only.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = d.select(
        "doc_id",
        F.split("text", " ").alias("tokens"),
        minhash_signature(shingles(F.col("text"))).alias("sig"),
    )

    # LSH: hash each band of the signature; docs sharing any band bucket
    # become candidate pairs.
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("sig", i * ROWS_PER_BAND + j + 1)
                            for j in range(ROWS_PER_BAND)
                        ]
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    left = bands.alias("a")
    right = bands.alias("b")
    candidates = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # Exact verification: token-set Jaccard on the candidate pairs only.
    toks = sig.select("doc_id", F.array_distinct("tokens").alias("tok_set"))
    verified = (
        candidates.join(toks.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("tok_set", "tok_a")
        .join(toks.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("tok_set", "tok_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("tok_a", "tok_b"))
                / F.size(F.array_union("tok_a", "tok_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


@register(
    "q_llm_simhash_groups",
    oracle=None,
)
def q_llm_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprinting: 16-bit simhash over token hashes; groups
    documents by fingerprint (candidate near-dup clusters). Deterministic
    but sketch-based → rows-only check. Output: (simhash, n_docs,
    min_doc_id)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = F.array_distinct(F.split("text", " "))
    th = F.transform(tokens, lambda t: F.xxhash64(t))

    def _bit_vote(b: int):
        # 2-arg merge lambda (see _perm_hasher note on arity detection)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    # For each of 16 bits: sum(+1/-1 per token) >= 0 -> bit set.
    bits = []
    for b in range(16):
        bit_votes = F.aggregate(th, F.lit(0), _bit_vote(b))
        bits.append(F.when(bit_votes >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
    simhash = sum(bits[1:], bits[0])
    return (
        d.select("doc_id", simhash.alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )
