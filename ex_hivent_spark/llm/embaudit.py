"""Embedding-stability audits: the per-label CENTROID SHIFT between
the corpus's two id-parity halves — the "did the embedding space move
between two snapshots / producers" readout (cosine ≈ 1 and small L2
shift per label say the two halves agree; a drifting encoder or a
contaminated batch shows up as a label whose halves disagree). The
split-half design needs no second corpus: id parity is a
deterministic 50/50 assignment of the SAME table, so the statistic is
a null-calibrated baseline for real snapshot-vs-snapshot runs.

Plan discipline: vectors collapse to per-(label, half, dim) centroid
accumulators in ONE posexplode + hash aggregate (map-side combined —
the shuffle carries |labels|·2·64 accumulator rows, never vectors);
the half-vs-half comparison is a dim-keyed join of two
64-row-per-label frames. No windows, no collects.

Determinism: float32 lanes widen to float64 identically; centroid
sums ride the decimal detour; each centroid coordinate is e6-rounded
BEFORE the cross/square products (exact 1e-12-grid values summed at
decimal(38,12)); closing sqrt/ratios are e6-rounded.

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no embedding surface; this
derives from the driver's analytics mandate and standard
embedding-drift monitoring practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register


@register(
    "q_emb_centroid_shift",
    oracle=f"""
    WITH x AS (
      SELECT label, vec_id % 2 AS half, i - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    cent AS (
      SELECT label, half, dim,
             CAST(count(*) AS BIGINT) AS n,
             {sql_dround(
                 "CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE)"
                 " / count(*)", 6,
             )} AS c
      FROM x GROUP BY label, half, dim
    ),
    j AS (
      SELECT e.label, e.dim, e.c AS ce, o.c AS co,
             e.n AS ne, o.n AS no
      FROM (SELECT * FROM cent WHERE half = 0) e
      JOIN (SELECT * FROM cent WHERE half = 1) o
        ON e.label = o.label AND e.dim = o.dim
    ),
    agg AS (
      SELECT label,
             CAST(max(ne) AS BIGINT) AS n_even,
             CAST(max(no) AS BIGINT) AS n_odd,
             CAST(sum(CAST((ce - co) * (ce - co) AS DECIMAL(38,12)))
                  AS DOUBLE) AS ss_diff,
             CAST(sum(CAST(ce * co AS DECIMAL(38,12))) AS DOUBLE) AS dot,
             CAST(sum(CAST(ce * ce AS DECIMAL(38,12))) AS DOUBLE) AS ne2,
             CAST(sum(CAST(co * co AS DECIMAL(38,12))) AS DOUBLE) AS no2
      FROM j GROUP BY label
    )
    SELECT label, n_even, n_odd,
           {sql_dround("sqrt(ss_diff)", 6)} AS l2_shift,
           {sql_dround("dot / sqrt(ne2 * no2)", 6)} AS centroid_cos
    FROM agg
    """,
)
def q_emb_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid agreement between the two vec_id-parity
    halves of the embedding corpus: the L2 distance and cosine between
    each label's even-half and odd-half centroids, plus both half
    sizes. The split-half null baseline for embedding-drift
    monitoring — on a healthy static corpus cosine ≈ 1; re-pointing
    one half at a new encoder snapshot turns this into the actual
    drift test with the same plan.

    Plan: one posexplode + hash aggregate to per-(label, half, dim)
    accumulators (map-side combined; the shuffle carries
    |labels|·2·64 rows, never vectors), then a (label, dim)-keyed
    join of the two half frames and a per-label closing aggregate.
    Determinism: centroid coordinates are decimal-sum/count doubles
    e6-rounded BEFORE differencing/products, so every summed term
    lies on the exact 1e-12 grid (decimal(38,12)); closing sqrt and
    cosine are e6-rounded. Labels are balanced across parities at
    every SF, so the inner join never drops a label."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "v32"),
    ).select(
        "label",
        "half",
        F.col("dim").cast("bigint").alias("dim"),
        F.col("v32").cast("double").alias("v"),
    )
    cent = x.groupBy("label", "half", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dround(
            F.sum(F.col("v").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("c"),
    )
    ev = cent.filter(F.col("half") == 0).select(
        "label",
        "dim",
        F.col("c").alias("ce"),
        F.col("n").alias("ne"),
    )
    od = cent.filter(F.col("half") == 1).select(
        "label",
        "dim",
        F.col("c").alias("co"),
        F.col("n").alias("no"),
    )
    j = ev.join(od, ["label", "dim"])
    diff = F.col("ce") - F.col("co")
    agg = j.groupBy("label").agg(
        F.max("ne").cast("bigint").alias("n_even"),
        F.max("no").cast("bigint").alias("n_odd"),
        F.sum((diff * diff).cast("decimal(38,12)"))
        .cast("double")
        .alias("ss_diff"),
        F.sum((F.col("ce") * F.col("co")).cast("decimal(38,12)"))
        .cast("double")
        .alias("dot"),
        F.sum((F.col("ce") * F.col("ce")).cast("decimal(38,12)"))
        .cast("double")
        .alias("ne2"),
        F.sum((F.col("co") * F.col("co")).cast("decimal(38,12)"))
        .cast("double")
        .alias("no2"),
    )
    return agg.select(
        "label",
        "n_even",
        "n_odd",
        dround(F.sqrt(F.col("ss_diff")), 6).alias("l2_shift"),
        dround(
            F.col("dot") / F.sqrt(F.col("ne2") * F.col("no2")), 6
        ).alias("centroid_cos"),
    )


# Hamming-recall audit parameters: probe count, neighbor depth, and
# the fixed embedding dimensionality split into two 32-bit sign masks
# (a single 64-bit mask would collide with the bigint sign bit).
_HAM_Q = 64
_HAM_K = 10
_DIM = 64


def _sql_mask(lo: int, hi: int) -> str:
    """Literal sum-of-powers sign mask over dims [lo, hi) (1-based
    array access on the DuckDB side)."""
    terms = " + ".join(
        f"(CASE WHEN embedding[{j + 1}] >= 0 THEN CAST({1 << (j - lo)}"
        f" AS BIGINT) ELSE 0 END)"
        for j in range(lo, hi)
    )
    return f"({terms})"


def _probe_scores(spark: SparkSession, sf_dir: str, mod: int, cap: int):
    """Exact probe-vs-corpus cosine scoring shared by the audit family:
    the ≤``cap`` probe set (vec_id % mod == 0, TakeOrdered — bounded by
    construction) is collected, unit-normalized driver-side with the
    engine arithmetic (similarity.np_unit), and scored against ONE
    streaming corpus pass via similarity.exact_scores — self-pairs
    excluded, cosines e6-rounded sequential folds. Returns
    (scores_df(query_id, neighbor_id, cosine), n_probes).

    r14 shape: replaces the per-op broadcast-join + per-pair dot()
    whose Arrow traffic carried both 64-dim vectors for every pair."""
    from ex_hivent_spark.llm.similarity import exact_scores, np_unit

    em = load_table(spark, sf_dir, "embeddings")
    q_rows = (
        em.filter(F.col("vec_id") % mod == 0)
        .orderBy("vec_id")
        .limit(cap)
        .select("vec_id", "embedding")
        .collect()
    )
    scores = (
        exact_scores(
            em,
            "vec_id",
            "embedding",
            [(r["vec_id"], np_unit(r["embedding"])) for r in q_rows],
            normalize=True,
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            dround(F.col("dot"), 6).alias("cosine"),
        )
    )
    return scores, len(q_rows)


def _mask(lo: int, hi: int):
    col = None
    for j in range(lo, hi):
        term = F.when(
            F.col("embedding").getItem(j) >= 0,
            F.lit(1 << (j - lo)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        col = term if col is None else col + term
    return col


@register(
    "q_emb_hamming_recall",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             {_sql_mask(0, 32)} AS mlo, {_sql_mask(32, 64)} AS mhi
      FROM embeddings
    ),
    unit AS (
      SELECT vec_id, mlo, mhi,
             list_transform(e,
               x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS u
      FROM emb
    ),
    q AS (
      SELECT vec_id AS query_id, u AS qu, mlo AS qlo, mhi AS qhi
      FROM unit WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {_HAM_Q}
    ),
    scored AS (
      SELECT q.query_id, unit.vec_id AS neighbor_id,
             floor(list_dot_product(q.qu, unit.u) * 1000000.0 + 0.5)
                 / 1000000.0 AS cosine,
             CAST(bit_count(xor(q.qlo, unit.mlo))
                  + bit_count(xor(q.qhi, unit.mhi)) AS BIGINT) AS hamming
      FROM q JOIN unit ON unit.vec_id <> q.query_id
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= {_HAM_K}
    ),
    ham AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY hamming ASC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= {_HAM_K}
    )
    SELECT e.query_id,
           CAST(coalesce(sum(CASE WHEN h.neighbor_id IS NOT NULL
                                  THEN 1 END), 0) AS BIGINT) AS n_overlap,
           {sql_dround(
               "coalesce(sum(CASE WHEN h.neighbor_id IS NOT NULL"
               f" THEN 1 END), 0) / CAST({_HAM_K} AS DOUBLE)", 6,
           )} AS recall
    FROM exact e LEFT JOIN ham h
      ON e.query_id = h.query_id AND e.neighbor_id = h.neighbor_id
    GROUP BY e.query_id
    """,
)
def q_emb_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit binarization quality audit: per probe, the recall@10 of
    sign-bit Hamming search against the exact cosine top-10 — the
    go/no-go measurement for shipping 64×-compressed binary embeddings
    into the retrieval tier (the binary-quantization companion to
    q_emb_pq_distortion's codebook audit and q_llm_ann_recall's IVF
    probe).

    Plan: sign masks are two map-only 32-term literal folds per vector
    (no shuffle — a 64-bit mask would collide with the bigint sign
    bit, so the distance is bit_count(xor) over two 32-bit halves);
    the probe side is a TakeOrdered-capped broadcast (the
    q_llm_cosine_topk discipline), one dot+xor pass scores the corpus
    stream against it, and two bounded per-probe rank windows pick
    both top-10 lists. At 100 TB the scale path replaces the exact
    arm with LSH/IVF and keeps the Hamming arm unchanged — binary
    masks shuffle 8 bytes/vector, never the vectors. Determinism:
    cosines are e6-rounded sequential-fold dots, Hamming distances
    are exact integers, both ranks tie-break on neighbor_id, and
    recall is an exact count over a 10-row frame.

    r14 shape: scoring runs through similarity.exact_scores — the
    probe matrix rides inside one mapInPandas closure over a single
    corpus pass (sign masks carried per pair as plain bigints), so the
    per-pair Arrow traffic is 3 scalars, never two 64-dim vectors."""
    from ex_hivent_spark.llm.similarity import exact_scores, np_unit

    em = load_table(spark, sf_dir, "embeddings")
    corpus = em.select(
        "vec_id",
        "embedding",
        _mask(0, 32).alias("mlo"),
        _mask(32, _DIM).alias("mhi"),
    )
    q_rows = (
        corpus.filter(F.col("vec_id") % 50 == 0)
        .orderBy("vec_id")
        .limit(_HAM_Q)
        .collect()
    )  # bounded probe set (TakeOrdered, ≤ _HAM_Q rows)
    qmasks = spark.createDataFrame(
        [(r["vec_id"], r["mlo"], r["mhi"]) for r in q_rows],
        "query_id bigint, qlo bigint, qhi bigint",
    )
    from pyspark.sql import Window

    scored = (
        exact_scores(
            corpus,
            "vec_id",
            "embedding",
            [(r["vec_id"], np_unit(r["embedding"])) for r in q_rows],
            normalize=True,
            carry=(("mlo", "bigint"), ("mhi", "bigint")),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(qmasks), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            dround(F.col("dot"), 6).alias("cosine"),
            (
                F.bit_count(F.col("qlo").bitwiseXOR(F.col("mlo")))
                + F.bit_count(F.col("qhi").bitwiseXOR(F.col("mhi")))
            )
            .cast("bigint")
            .alias("hamming"),
        )
        .localCheckpoint(eager=False)
    )  # both rank arms: one scoring pass
    wex = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    wham = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id")
    )
    # r16: both rank columns STACK on one frame (same partition key →
    # Spark plans one exchange + two sorts, not two window subtrees),
    # and the exact∩ham overlap is a conditional count per query —
    # the two filtered arms and their (query_id, neighbor_id) left
    # join are gone. Equivalence: n_overlap = |{rows in both top-K}|
    # either way, and every query_id groups over its full neighbor
    # set, so no query row can disappear.
    both = scored.select(
        "query_id",
        F.row_number().over(wex).alias("rn_ex"),
        F.row_number().over(wham).alias("rn_ham"),
    )
    hit = F.sum(
        F.when((F.col("rn_ex") <= _HAM_K) & (F.col("rn_ham") <= _HAM_K), 1)
        .otherwise(0)
    )
    return both.groupBy("query_id").agg(
        hit.cast("bigint").alias("n_overlap"),
        dround(hit / float(_HAM_K), 6).alias("recall"),
    )


# Hubness audit parameters: probe cap and neighbor depth.
_HUB_Q = 256
_HUB_K = 10


@register(
    "q_emb_hubness_audit",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    unit AS (
      SELECT vec_id,
             list_transform(e,
               x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS u
      FROM emb
    ),
    q AS (
      SELECT vec_id AS query_id, u AS qu FROM unit
      WHERE vec_id % 5 = 0 ORDER BY vec_id LIMIT {_HUB_Q}
    ),
    scored AS (
      SELECT q.query_id, unit.vec_id AS neighbor_id,
             floor(list_dot_product(q.qu, unit.u) * 1000000.0 + 0.5)
                 / 1000000.0 AS cosine
      FROM q JOIN unit ON unit.vec_id <> q.query_id
    ),
    topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= {_HUB_K}
    ),
    kocc AS (
      SELECT neighbor_id, CAST(count(*) AS BIGINT) AS occ
      FROM topk GROUP BY neighbor_id
    ),
    nq AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM q)
    SELECT occ AS n_occurrences,
           CAST(count(*) AS BIGINT) AS n_vectors,
           {sql_dround(
               f"CAST(count(*) * occ AS DOUBLE)"
               f" / (CAST(n_probes AS DOUBLE) * {_HUB_K})", 6,
           )} AS slot_share
    FROM kocc CROSS JOIN nq
    GROUP BY occ, n_probes
    """,
)
def q_emb_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the embedding space: the k-occurrence
    histogram — for the ≤256-probe sample, how many distinct vectors
    appear in exactly c of the probes' cosine top-10 lists, and what
    share of all top-10 slots that occurrence class absorbs. A heavy
    right tail (a few "hub" vectors soaking up a large slot share) is
    the classic high-dimensional pathology that silently degrades
    kNN-based dedup/retrieval — the diagnostic one runs before
    trusting q_llm_semdedup / q_emb_knn_label_accuracy readouts.

    Plan: the q_llm_cosine_topk discipline — a TakeOrdered-capped
    broadcast probe side, one dot-product pass over the corpus
    stream, a per-probe bounded rank window — then the k-occurrence
    hash aggregate collapses the |probes|·k picks to an occurrence
    histogram of ≤ k·|probes| rows (in practice ≤ ~10). At 100 TB the
    probe cap keeps the scoring pass one narrow map stage.
    Determinism: e6-rounded sequential-fold cosines, neighbor_id
    tie-breaks, exact integer occurrence counts, e6-rounded shares."""
    from pyspark.sql import Window

    scored, n_probes = _probe_scores(spark, sf_dir, 5, _HUB_Q)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HUB_K)
        .select("query_id", "neighbor_id")
    )
    kocc = topk.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("occ")
    )
    return (
        kocc.withColumn("n_probes", F.lit(n_probes).cast("bigint"))
        .groupBy(F.col("occ").alias("n_occurrences"), "n_probes")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .select(
            "n_occurrences",
            "n_vectors",
            dround(
                (F.col("n_vectors") * F.col("n_occurrences")).cast(
                    "double"
                )
                / (F.col("n_probes").cast("double") * _HUB_K),
                6,
            ).alias("slot_share"),
        )
    )


@register(
    "q_emb_intrinsic_dim",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    unit AS (
      SELECT vec_id,
             list_transform(e,
               x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS u
      FROM emb
    ),
    q AS (
      SELECT vec_id AS query_id, u AS qu FROM unit
      WHERE vec_id % 5 = 0 ORDER BY vec_id LIMIT {_HUB_Q}
    ),
    scored AS (
      SELECT q.query_id, unit.vec_id AS neighbor_id,
             floor(list_dot_product(q.qu, unit.u) * 1000000.0 + 0.5)
                 / 1000000.0 AS cosine
      FROM q JOIN unit ON unit.vec_id <> q.query_id
    ),
    nn2 AS (
      SELECT query_id,
             max(CASE WHEN rn = 1 THEN cosine END) AS c1,
             max(CASE WHEN rn = 2 THEN cosine END) AS c2
      FROM (
        SELECT query_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= 2 GROUP BY query_id
    ),
    mu AS (
      SELECT query_id,
             {sql_dround("0.5 * ln((1.0 - c2) / (1.0 - c1))", 6)} AS lnmu
      FROM nn2 WHERE c1 < 1.0 AND c2 < c1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes_used,
           {sql_dround(
               "count(*) / CAST(sum(CAST(lnmu AS DECIMAL(25,6)))"
               " AS DOUBLE)", 6)} AS id_mle
    FROM mu
    """,
)
def q_emb_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-NN maximum-likelihood intrinsic dimension of the embedding
    manifold (Facco et al.'s TwoNN): per probe, µ = d₂/d₁ of the two
    nearest chordal distances (d = sqrt(2−2cos) on unit vectors, so
    ln µ = ½·ln((1−c₂)/(1−c₁))), and ID = n / Σ ln µ — ID ≪ ambient
    64 says the vectors live on a much lower-dimensional manifold
    (retrieval/dedup indexes can be far smaller than the ambient
    dimension suggests). Probes whose nearest neighbor is an exact
    duplicate (c₁ = 1) or tied (c₂ = c₁) are dropped on both sides —
    ln µ is undefined there (documented branch).

    Plan: the q_emb_hubness_audit probe machinery — TakeOrdered
    broadcast probes, one dot pass, a bounded per-probe rank window
    keeping only ranks 1-2 — then a one-row MLE closing. Determinism:
    e6 cosines with neighbor_id tie-breaks, e6-rounded ln µ summed
    via the decimal detour, e6-rounded closing."""
    from pyspark.sql import Window

    scored, _ = _probe_scores(spark, sf_dir, 5, _HUB_Q)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    nn2 = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cosine"))).alias("c1"),
            F.max(F.when(F.col("rn") == 2, F.col("cosine"))).alias("c2"),
        )
    )
    mu = nn2.filter(
        (F.col("c1") < 1.0) & (F.col("c2") < F.col("c1"))
    ).select(
        dround(
            0.5 * F.log((1.0 - F.col("c2")) / (1.0 - F.col("c1"))), 6
        ).alias("lnmu")
    )
    return mu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes_used"),
        dround(
            F.count(F.lit(1))
            / F.sum(F.col("lnmu").cast("decimal(25,6)")).cast("double"),
            6,
        ).alias("id_mle"),
    )


# Pairwise-cosine histogram bin width over [-1, 1): 10 bins of 0.2.
_PAIR_BINS = 10


@register(
    "q_emb_pair_cosine_hist",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    unit AS (
      SELECT vec_id,
             list_transform(e,
               x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS u
      FROM emb
    ),
    q AS (
      SELECT vec_id AS query_id, u AS qu FROM unit
      WHERE vec_id % 5 = 0 ORDER BY vec_id LIMIT {_HUB_Q}
    ),
    scored AS (
      SELECT least(CAST(floor((floor(list_dot_product(q.qu, unit.u)
                                     * 1000000.0 + 0.5) / 1000000.0
                               + 1.0) * 5.0) AS BIGINT),
                   {_PAIR_BINS - 1}) AS bin
      FROM q JOIN unit ON unit.vec_id <> q.query_id
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs_total FROM scored)
    SELECT bin,
           floor((bin / 5.0 - 1.0) * 1000000.0 + 0.5) / 1000000.0
             AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_pairs,
           floor(CAST(count(*) AS DOUBLE) / n_pairs_total
                 * 1000000.0 + 0.5) / 1000000.0 AS share
    FROM scored CROSS JOIN nt GROUP BY bin, n_pairs_total
    """,
)
def q_emb_pair_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram (10 bins of width 0.2 over [−1, 1])
    between the ≤256-probe sample and the whole corpus — the
    concentration-of-measure audit: a healthy high-dimensional corpus
    piles its mass near 0; mass in the rightmost bins means
    near-duplicates or a collapsed encoder (and calibrates every
    cosine threshold used by the semdedup/neardup family).

    Plan: the probe machinery — TakeOrdered broadcast probes, one dot
    pass — collapsing straight into a ≤10-row histogram aggregate (no
    rank window at all). Determinism: e6-rounded sequential-fold
    cosines, exact integer bin arithmetic (the +1 shift and ×5 are
    exact on the e6 grid; cosine = 1.0 clamps into the top bin),
    e6-rounded shares."""
    from pyspark.sql import Window

    pair_scores, _ = _probe_scores(spark, sf_dir, 5, _HUB_Q)
    scored = pair_scores.select(
        F.least(
            F.floor((F.col("cosine") + 1.0) * 5.0).cast("bigint"),
            F.lit(_PAIR_BINS - 1),
        ).alias("bin")
    )
    # r17 (the ndcg_eval fix, guide §2.4): the pair total used to ride
    # as crossJoin(broadcast(scored.agg(count))) — a broadcast job that
    # recomputed the ENTIRE probe dot pass before the main job could
    # start. The total is just the sum of the ≤10 histogram counts, so
    # derive it with a single-partition window over the tiny aggregate:
    # the dot pass now runs exactly once.
    hist = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    wall = Window.partitionBy()
    return hist.select(
        "bin",
        dround(F.col("bin") / 5.0 - 1.0, 6).alias("bin_lo"),
        "n_pairs",
        dround(
            F.col("n_pairs").cast("double") / F.sum("n_pairs").over(wall),
            6,
        ).alias("share"),
    )


_SQL_NORM_L2_E6 = (
    "floor(sqrt(list_sum(list_transform(embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000.0 + 0.5)"
    " / 1000000.0"
)
_SQL_NORM_L1_E6 = (
    "floor(list_sum(list_transform(embedding,"
    " x -> abs(CAST(x AS DOUBLE)))) * 1000000.0 + 0.5)"
    " / 1000000.0"
)


@register(
    "q_emb_norm_length_corr",
    oracle=f"""
    WITH j AS (
      SELECT {_SQL_NORM_L2_E6} AS x2,
             {_SQL_NORM_L1_E6} AS x1,
             CAST(d.n_chars AS BIGINT) AS y
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x2 AS DECIMAL(25,6))) AS DOUBLE) AS sx2,
             CAST(sum(CAST(x2 * x2 AS DECIMAL(25,6))) AS DOUBLE) AS sxx2,
             CAST(sum(CAST(x2 * y AS DECIMAL(25,6))) AS DOUBLE) AS sxy2,
             CAST(sum(CAST(x1 AS DECIMAL(25,6))) AS DOUBLE) AS sx1,
             CAST(sum(CAST(x1 * x1 AS DECIMAL(25,6))) AS DOUBLE) AS sxx1,
             CAST(sum(CAST(x1 * y AS DECIMAL(25,6))) AS DOUBLE) AS sxy1,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM j
    ),
    c AS (
      SELECT n, sx2, sx1, sy,
             CAST(n AS DOUBLE) * sxy2 - sx2 * CAST(sy AS DOUBLE) AS cxy2,
             CAST(n AS DOUBLE) * sxx2 - sx2 * sx2 AS cxx2,
             CAST(n AS DOUBLE) * sxy1 - sx1 * CAST(sy AS DOUBLE) AS cxy1,
             CAST(n AS DOUBLE) * sxx1 - sx1 * sx1 AS cxx1,
             CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS cyy
      FROM m
    )
    SELECT n AS n_vecs,
           {sql_dround("sx2 / n", 6)} AS mean_l2,
           {sql_dround("sx1 / n", 6)} AS mean_l1,
           {sql_dround("CAST(sy AS DOUBLE) / n", 6)} AS mean_chars,
           CASE WHEN cxx2 <= 0 OR cyy <= 0 THEN NULL
                ELSE {sql_dround(
                    "cxy2 / (" + sql_dround("sqrt(cxx2)", 6) + ") / ("
                    + sql_dround("sqrt(cyy)", 6) + ")", 6)}
           END AS corr_l2,
           CASE WHEN cxx1 <= 0 OR cyy <= 0 THEN NULL
                ELSE {sql_dround(
                    "cxy1 / (" + sql_dround("sqrt(cxx1)", 6) + ") / ("
                    + sql_dround("sqrt(cyy)", 6) + ")", 6)}
           END AS corr_l1
    FROM c
    """,
)
def q_emb_norm_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm vs document-length audit: join each vector to its
    document (doc_id = vec_id) and Pearson-correlate BOTH the L2 norm
    and the L1 norm with n_chars — the "is my encoder length-biased?"
    check. On an unnormalized encoder, corr_l2 > 0 flags norm growth
    with input length (cosine-vs-dot choices then matter). On a
    UNIT-normalized corpus — this testdata — every L2 norm is exactly
    1.0, so corr_l2 reads the documented degenerate NULL and mean_l2
    reads 1.0: the audit's confirmation that normalization held. The
    L1 norm still varies on the unit sphere (it measures how SPREAD
    each vector is across dimensions, √ participation), so corr_l1
    answers whether longer documents produce more distributed — less
    peaked — embeddings.

    Plan: one id-equi join (both norms reduce per-row BEFORE the
    shuffle, so the 64-float payload never moves), one scalar moment
    aggregate. Determinism: norms are sequential-fold sums (+
    IEEE-exact sqrt for L2) e6-rounded per vector — the
    q_llm_embed_norm convention; char counts are exact BIGINTs; the
    double moments ride the decimal detour; centered closings cast to
    DOUBLE before multiplying in identical IEEE order; every √ is
    e6-rounded before its e6-rounded ratio; zero-variance sides read
    NULL on both engines."""
    from ex_hivent_spark.llm.similarity import l2_norm_expr

    l1 = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + F.abs(x.cast("double")),
    )
    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        dround(l2_norm_expr(F.col("embedding")), 6).alias("x2"),
        dround(l1, 6).alias("x1"),
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("y")
    )
    j = em.join(d, em["vec_id"] == d["doc_id"]).select("x2", "x1", "y")
    x2, x1, y = F.col("x2"), F.col("x1"), F.col("y")
    dec = "decimal(25,6)"
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x2.cast(dec)).cast("double").alias("sx2"),
        F.sum((x2 * x2).cast(dec)).cast("double").alias("sxx2"),
        F.sum((x2 * y).cast(dec)).cast("double").alias("sxy2"),
        F.sum(x1.cast(dec)).cast("double").alias("sx1"),
        F.sum((x1 * x1).cast(dec)).cast("double").alias("sxx1"),
        F.sum((x1 * y).cast(dec)).cast("double").alias("sxy1"),
        F.sum(y).cast("bigint").alias("sy"),
        F.sum(y * y).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    syd = F.col("sy").cast("double")
    c = m.select(
        "n",
        "sx2",
        "sx1",
        "sy",
        (nd * F.col("sxy2") - F.col("sx2") * syd).alias("cxy2"),
        (nd * F.col("sxx2") - F.col("sx2") * F.col("sx2")).alias("cxx2"),
        (nd * F.col("sxy1") - F.col("sx1") * syd).alias("cxy1"),
        (nd * F.col("sxx1") - F.col("sx1") * F.col("sx1")).alias("cxx1"),
        (nd * F.col("syy") - syd * F.col("sy")).alias("cyy"),
    )

    def corr(cxy, cxx):
        return F.when(
            (F.col(cxx) <= 0) | (F.col("cyy") <= 0),
            F.lit(None).cast("double"),
        ).otherwise(
            dround(
                F.col(cxy)
                / dround(F.sqrt(F.col(cxx)), 6)
                / dround(F.sqrt(F.col("cyy")), 6),
                6,
            )
        )

    return c.select(
        F.col("n").alias("n_vecs"),
        dround(F.col("sx2") / F.col("n"), 6).alias("mean_l2"),
        dround(F.col("sx1") / F.col("n"), 6).alias("mean_l1"),
        dround(F.col("sy").cast("double") / F.col("n"), 6).alias(
            "mean_chars"
        ),
        corr("cxy2", "cxx2").alias("corr_l2"),
        corr("cxy1", "cxx1").alias("corr_l1"),
    )
