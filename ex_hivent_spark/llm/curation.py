"""Corpus-curation reweighting and novelty metrics.

Training-data curation beyond hard dedup: SoftDeDup-style inverse-
commonness sampling weights (reweight common content instead of
dropping it), first-occurrence n-gram novelty (how much genuinely new
text a document contributes), and subword-fertility statistics (the
tokenizer-efficiency metric that decides byte budgets per language).

Reference parity note: the reference event client (lib/hivent) has no
text surface; these operators extend the driver's LLM-pipeline north
star alongside ex_hivent_spark/llm/dedup.py. All plans are one explode
+ hash aggregate (+ one hash join-back) — the shape that survives
100 TB: shuffles carry (doc_id, 64-bit gram hash) pairs, never text,
and every aggregate partially combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_davg
from ex_hivent_spark.llm.dedup import shingles
from ex_hivent_spark.plans.registry import register
from ex_hivent_spark.session_memo import session_memo

# Shared DuckDB CTE: per-doc distinct token-3-gram list, the string
# twin of ``shingles()`` (the Spark side hashes each gram with xxhash64;
# the oracles below compare per-gram COUNTS and memberships, which are
# identical unless two distinct grams in the corpus collide at 64 bits).
_SQL_GRAMS = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh)
"""


@session_memo
def _exploded_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gram-hash) pairs, one row per distinct 3-gram per doc.
    Lazily localCheckpointed: both consumers (the per-gram aggregate and
    the join-back) read the one materialization instead of re-running
    the scan+shingle+explode per branch — the pattern proven 2x on
    q_llm_ngram_jaccard. Session-memoized: q_llm_softdedup_weights and
    q_llm_ngram_novelty consume the identical frame, so a session
    running both pays the shingle pass once (each query still
    standalone — first caller computes)."""
    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id",
        F.explode(shingles(F.col("text"), hasher=F.xxhash64)).alias("h"),
    )
    return ex.localCheckpoint(eager=False)


@register(
    "q_llm_softdedup_weights",
    oracle=_SQL_GRAMS
    + """,
    df AS (SELECT g, count(*) AS gram_df FROM ex GROUP BY g)
    SELECT e.doc_id,
           count(*) AS n_grams,
           CAST(sum(d.gram_df) AS BIGINT) AS sum_df,
           CAST(sum(d.gram_df) AS DOUBLE) / count(*) AS commonness,
           CAST(count(*) AS DOUBLE) / sum(d.gram_df) AS soft_weight,
           CAST(sum(d.gram_df) AS DOUBLE) / count(*) >= 2.0
               AS downweighted
    FROM ex e JOIN df d ON e.g = d.g
    GROUP BY e.doc_id
    """,
)
def q_llm_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup-style sampling reweighting (He et al. 2024): instead of
    DROPPING near-duplicate text, downweight it — each document gets a
    sampling weight inversely proportional to its *commonness*, the mean
    corpus document-frequency of its distinct 3-grams. A doc made of
    grams nobody else uses has commonness 1.0 and weight 1.0; a doc
    whose grams each appear in k docs gets weight 1/k.

    Plan: ONE gram explode feeds a (gram -> df) hash aggregate, joined
    back onto the same exploded stream, then a per-doc aggregate —
    shuffles carry (doc_id, int64) pairs only. Commonness and weight are
    single integer-ratio double divisions (exact in both engines; no
    rounding detour needed), so even the downweighted flag hash-matches.
    At 100 TB the df table is |distinct grams| rows of two ints and the
    join-back is a plain shuffled equi-join on the gram hash — the exact
    shape of the passage-dedup op already proven at r4."""
    ex = _exploded_grams(spark, sf_dir)
    df = ex.groupBy("h").agg(F.count(F.lit(1)).alias("gram_df"))
    joined = ex.join(df, "h")
    out = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("gram_df").alias("sum_df"),
    )
    commonness = F.col("sum_df").cast("double") / F.col("n_grams")
    weight = F.col("n_grams").cast("double") / F.col("sum_df")
    return out.select(
        "doc_id",
        "n_grams",
        "sum_df",
        commonness.alias("commonness"),
        weight.alias("soft_weight"),
        (commonness >= 2.0).alias("downweighted"),
    )


@register(
    "q_llm_ngram_novelty",
    oracle=_SQL_GRAMS
    + """,
    firsts AS (SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g)
    SELECT e.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS novelty
    FROM ex e JOIN firsts f ON e.g = f.g
    GROUP BY e.doc_id
    """,
)
def q_llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence n-gram novelty: for each document, the fraction
    of its distinct 3-grams whose FIRST corpus occurrence (minimum
    doc_id over containing docs) is this document — the standard
    measure of how much new content each source contributes in
    ingestion order (a crawl snapshot that re-serves old pages scores
    near zero and can be cut before tokenization).

    Plan: the softdedup explode reused with min(doc_id) instead of
    count as the per-gram aggregate, then the same narrow join-back.
    The novelty ratio is a single integer-ratio division — exact."""
    ex = _exploded_grams(spark, sf_dir)
    firsts = ex.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    joined = ex.join(firsts, "h")
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        novel.alias("n_novel"),
        (novel.cast("double") / F.count(F.lit(1))).alias("novelty"),
    )


@register(
    "q_llm_tokenizer_fertility",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, lang,
             count(*) AS n_words,
             sum(CAST(ceil(length(word) / 4.0) AS BIGINT)) AS n_subwords
      FROM w GROUP BY doc_id, lang
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_subwords) AS BIGINT) AS total_subwords,
           CAST(sum(n_subwords) AS DOUBLE) / sum(n_words)
               AS corpus_fertility,
           {sql_davg("CAST(n_subwords AS DOUBLE) / n_words",
                     "avg_doc_fertility")}
    FROM per_doc GROUP BY lang
    """,
)
def q_llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword units emitted per
    whitespace word, under a fixed-width subword proxy (a word of L
    chars splits into ceil(L/4) units — the budget model for a
    byte-fallback BPE with ~4-char average merges; the real tokenizer
    is a vocab lookup with the same per-word map shape). Fertility is
    THE metric that decides per-language byte budgets when mixing a
    multilingual corpus — high-fertility languages consume more context
    window per word.

    Plan: map-only per-doc word fold (higher-order aggregate over the
    split array — no explode, no shuffle of words), then one per-lang
    hash aggregate. Corpus fertility is an exact integer ratio; the
    per-doc mean goes through the decimal-sum convention."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_subwords = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )
    per_doc = d.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_words"),
        n_subwords.alias("n_subwords"),
    )
    doc_fert = F.col("n_subwords").cast("double") / F.col("n_words")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_subwords").alias("total_subwords"),
        (F.sum("n_subwords").cast("double") / F.sum("n_words")).alias(
            "corpus_fertility"
        ),
        (
            F.sum(doc_fert.cast("decimal(25,6)")).cast("double")
            / F.count(doc_fert)
        ).alias("avg_doc_fertility"),
    )


# Min-token thresholds swept by the length-filter tuning pass.
_LEN_THRESHOLDS = (10, 20, 50, 100, 200, 500)


@register(
    "q_llm_length_filter_sweep",
    oracle=f"""
    WITH ntoks AS (
      SELECT CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                 AS ntok
      FROM documents
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(ntok) AS BIGINT) AS tok_total
      FROM ntoks
    ),
    thr AS (
      SELECT CAST(unnest([{", ".join(str(t) for t in _LEN_THRESHOLDS)}])
                  AS BIGINT) AS min_tokens
    )
    SELECT min_tokens,
           CAST(sum(CASE WHEN ntok >= min_tokens THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN ntok >= min_tokens THEN ntok ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           CAST(sum(CASE WHEN ntok >= min_tokens THEN 1 ELSE 0 END)
                AS DOUBLE) / max(n_total) AS doc_share,
           CAST(sum(CASE WHEN ntok >= min_tokens THEN ntok ELSE 0 END)
                AS DOUBLE) / max(tok_total) AS token_share
    FROM thr CROSS JOIN ntoks CROSS JOIN tot
    GROUP BY min_tokens
    """,
)
def q_llm_length_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-filter threshold sweep: for each candidate min-token
    cutoff, the documents and tokens the corpus would KEEP — the
    curve a curation run reads before committing to a length gate
    (q_llm_quality_score's fixed 20..1000 gate, generalized to the
    tuning sweep; the same shape as q_llm_dedup_threshold_sweep for
    the dedup knob). Doc share falling much faster than token share
    marks a short-doc-heavy corpus where the gate is cheap.

    Plan: ONE map pass computes per-doc token counts (no text leaves
    the scan), a 6-row literal threshold frame broadcast-fans each
    count (map-side nested-loop against a literal — no shuffle), one
    hash aggregate per threshold, and the one-row totals frame joins
    back broadcast. Shuffle traffic: 6 rows per map partition.
    Determinism: all-integer counts; the two shares are single IEEE
    divisions of exact integers."""
    d = load_table(spark, sf_dir, "documents")
    ntoks = d.select(
        F.size(F.split("text", r"\s+")).cast("bigint").alias("ntok")
    )
    tot = ntoks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("ntok").cast("bigint").alias("tok_total"),
    )
    thr = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in _LEN_THRESHOLDS])).alias("t")
    ).select(F.col("t").cast("bigint").alias("min_tokens"))
    fanned = ntoks.crossJoin(F.broadcast(thr))
    kept = fanned.groupBy("min_tokens").agg(
        F.sum(F.when(F.col("ntok") >= F.col("min_tokens"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_kept"),
        F.sum(
            F.when(F.col("ntok") >= F.col("min_tokens"), F.col("ntok"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("tokens_kept"),
    )
    return kept.crossJoin(F.broadcast(tot)).select(
        "min_tokens",
        "n_docs_kept",
        "tokens_kept",
        (F.col("n_docs_kept").cast("double") / F.col("n_total")).alias(
            "doc_share"
        ),
        (F.col("tokens_kept").cast("double") / F.col("tok_total")).alias(
            "token_share"
        ),
    )


# Context-window token budget for training-sequence packing (tokens
# here = whitespace tokens, the q_llm_token_histogram convention).
_PACK_BUDGET = 2048


@register(
    "q_llm_sequence_pack",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS BIGINT) AS tok
      FROM documents
    ),
    off AS (
      SELECT source, doc_id, tok,
             CAST(coalesce(sum(tok) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS off
      FROM t
    )
    SELECT source, off // {_PACK_BUDGET} AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc,
           floor(CAST(sum(tok) AS DOUBLE) / {_PACK_BUDGET}.0
                 * 1000000.0 + 0.5) / 1000000.0 AS fill_ratio
    FROM off GROUP BY source, off // {_PACK_BUDGET}
    """,
)
def q_llm_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing plan: per source, documents in doc_id
    order are packed into {_PACK_BUDGET}-token context windows by
    CUMULATIVE OFFSET — a document belongs to the bin its start offset
    falls in (the q_maint_compaction_bins / Spark FilePartition model:
    deterministic and prefix-sum expressible, where first-fit bin
    closing needs sequential state). Output: the per-(source, bin)
    manifest — doc count, token count, id span, fill ratio — that a
    packed-pretraining writer would execute; fill_ratio > 1 marks
    straddling documents (real packers split those).

    Plan: one map-side token count (whitespace tokens, the
    token-histogram convention), a source-partitioned prefix sum, one
    closing hash aggregate on the bin grain. All-integer until the
    e6-rounded fill ratio. At 100 TB the prefix sum is the only
    ordered stage and it partitions by source — the packing of
    different sources is embarrassingly parallel."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    t = d.select(
        "source",
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("bigint")
        .alias("tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = t.withColumn(
        "off", F.coalesce(F.sum("tok").over(w), F.lit(0)).cast("bigint")
    )
    return off.groupBy(
        "source", F.expr(f"off DIV {_PACK_BUDGET}").alias("bin_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("n_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
        dround(
            F.sum("tok").cast("double") / float(_PACK_BUDGET), 6
        ).alias("fill_ratio"),
    )
