"""LLM-pipeline similarity search over the embeddings table
(``embedding: array<float>``, dim=64).

- ``q_llm_embed_norm``: L2 norms via the higher-order ``aggregate``
  fold — JVM-side, no UDF.
- ``q_llm_multimodal_join``: text ⋈ embedding on doc_id=vec_id — the
  multimodal-column pattern (typed metadata next to an opaque payload).
- ``q_llm_cosine_topk``: brute-force cosine top-k (the correctness
  baseline). The scale path is ``q_llm_lsh_topk``: sign-random-projection
  LSH buckets from deterministic hash-derived hyperplanes; candidates
  only ever join within a bucket, so cost is Σ bucket² ≪ n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround
from ex_hivent_spark.plans.registry import register

TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns (sequential fold — order
    deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


@register(
    "q_llm_embed_norm",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS n_dims,
           floor(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000.0 + 0.5)
               / 1000000.0 AS l2_norm
    FROM embeddings
    """,
)
def q_llm_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm (rounded to 6 — engines may associate the
    64-term float sum differently) + dimensionality check."""
    em = load_table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        dround(l2_norm(F.col("embedding")), 6).alias("l2_norm"),
    )


@register(
    "q_llm_multimodal_join",
    oracle="""
    SELECT doc_id, lang, source, n_chars, label,
           CAST(len(embedding) AS INTEGER) AS n_dims
    FROM documents JOIN embeddings ON doc_id = vec_id
    """,
)
def q_llm_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column join: document text/metadata ⋈ its embedding
    vector (doc_id = vec_id). The general pattern for image/audio
    payloads too — opaque column + typed metadata joined on id."""
    d = load_table(spark, sf_dir, "documents")
    em = load_table(spark, sf_dir, "embeddings")
    return d.join(em, d.doc_id == em.vec_id).select(
        "doc_id", "lang", "source", "n_chars", "label",
        F.size("embedding").alias("n_dims"),
    )


def _normalized(em: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Unit-normalize embeddings so cosine reduces to a dot product."""
    norm = l2_norm(F.col("embedding"))
    return em.select(
        F.col(id_col),
        F.transform("embedding", lambda x: x.cast("double") / norm).alias("unit"),
    )


@register("q_llm_cosine_topk", oracle=None)
def q_llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors for a deterministic query
    subset (vec_id % 50 == 0): normalize once, broadcast the query side,
    dot-product join, per-query top-k via window. Rows-only check
    (float-order sensitivity makes a SQL oracle hash unstable).
    """
    from pyspark.sql import Window

    em = load_table(spark, sf_dir, "embeddings")
    unit = _normalized(em)
    queries = unit.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("unit").alias("q_unit")
    )
    pairs = unit.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(dot(F.col("q_unit"), F.col("unit")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


@register("q_llm_embedding_neardup", oracle=None)
def q_llm_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label metadata
    (pairs compared within a label bucket), reporting the top-100 closest
    pairs with cosine >= 0.35. Rows-only check (pair scores are
    float-order sensitive); deterministic via fixed tie-breaks."""
    em = load_table(spark, sf_dir, "embeddings")
    unit = em.select("vec_id", "label", "embedding")
    norm = l2_norm(F.col("embedding"))
    unit = unit.withColumn(
        "unit", F.transform("embedding", lambda x: x.cast("double") / norm)
    ).drop("embedding").repartition("label")
    a = unit.alias("a")
    b = unit.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.label").alias("label"),
        F.round(dot(F.col("a.unit"), F.col("b.unit")), 6).alias("cosine"),
    )
    return (
        pairs.filter(F.col("cosine") >= 0.35)
        .orderBy(F.col("cosine").desc(), "vec_a", "vec_b")
        .limit(100)
    )


N_HYPERPLANES = 8


@register("q_llm_lsh_topk", oracle=None)
def q_llm_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate neighbor candidates via sign-random-projection LSH:
    8 deterministic pseudo-random hyperplanes (values derived from
    xxhash64(dim, plane) — no RNG, reproducible on any cluster) bucket
    every vector by an 8-bit sign signature; cosine is computed only
    within buckets. This is the 100 TB path: shuffle by bucket key,
    Σ bucket² work instead of n².  Output: per-vector best in-bucket
    neighbor."""
    em = load_table(spark, sf_dir, "embeddings")
    unit = _normalized(em)

    # Deterministic hyperplane component for (dim i, plane p):
    # map xxhash64 of (i, p) to [-1, 1).
    def plane_component(i: Column, p: int) -> Column:
        h = F.xxhash64(i, F.lit(p))
        return (F.pmod(h, F.lit(2_000_003)) / F.lit(1_000_001.5)) - F.lit(1.0)

    def _plane_fn(p: int):
        # 1-arg lambda factory: pyspark HOF binding counts default args,
        # so `lambda i, p=p` would be (mis)bound as a 2-arg (value, index)
        # lambda — the index would silently replace p.
        return lambda i: plane_component(i, p)

    idx = F.sequence(F.lit(0), F.size("unit") - 1)
    sig_bits = []
    for p in range(N_HYPERPLANES):
        proj = F.aggregate(
            F.zip_with(F.col("unit"), F.transform(idx, _plane_fn(p)),
                       lambda x, h: x * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig_bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    signature = sum(sig_bits[1:], sig_bits[0])

    bucketed = unit.withColumn("bucket", signature)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(dot(F.col("a.unit"), F.col("b.unit")), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 1)
        .select("query_id", "neighbor_id", "cosine")
    )


N_CELLS = 16
N_PROBE = 4


@register("q_llm_ivf_topk", oracle=None)
def q_llm_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors — the coarse-
    quantizer scale path complementing sign-LSH (q_llm_lsh_topk):

    1. centroids: a deterministic training-free coarse codebook — the
       unit vectors with ``vec_id % (n/N_CELLS-ish stride) == 0``
       (at scale: KMeans fit on a sample; the *assignment/probe plan
       below is identical either way*);
    2. assign every vector to its nearest centroid (broadcast the tiny
       codebook, argmax over dot products — one narrow pass, no shuffle
       of the vector side beyond the final cell-key exchange);
    3. queries probe their N_PROBE nearest cells; candidate scoring
       joins query→cell→members, so compared pairs are
       Σ_probed |cell| ≪ n per query — the IVF inverted-list pruning.

    Rows-only check (float-order sensitive); recall vs the brute-force
    baseline is asserted in tests/test_llm_ops.py.
    """
    from pyspark.sql import Window

    em = load_table(spark, sf_dir, "embeddings")
    unit = _normalized(em)

    # Deterministic stride-sample of the codebook; orderBy+limit is a
    # TakeOrdered (per-partition top-N + driver merge), never a global sort.
    cents = (
        unit.filter(F.col("vec_id") % 37 == 1)
        .orderBy("vec_id")
        .limit(N_CELLS)
        .select(F.col("vec_id").alias("cell_id"), F.col("unit").alias("centroid"))
    )

    # Nearest cell per vector: broadcast codebook, keep argmax via window.
    sims = unit.join(F.broadcast(cents)).select(
        "vec_id",
        "unit",
        "cell_id",
        dot(F.col("unit"), F.col("centroid")).alias("csim"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell_id")
    )
    ranked = sims.withColumn("crn", F.row_number().over(w_assign))
    members = ranked.filter(F.col("crn") == 1).select("vec_id", "unit", "cell_id")

    # Query subset probes its N_PROBE nearest cells.
    probes = (
        ranked.filter(F.col("vec_id") % 50 == 0)
        .filter(F.col("crn") <= N_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("unit").alias("q_unit"),
            "cell_id",
        )
    )

    scored = (
        probes.join(members, on="cell_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("q_unit"), F.col("unit")), 6).alias("cosine"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )
