"""Benchmark decontamination: flag training documents that share long
word n-grams with a held-out evaluation set.

The standard pretraining-hygiene pass (GPT-2/3-style n-gram overlap):
any training doc sharing at least one N-token gram with a benchmark doc
is contaminated and must be dropped or scrubbed before training. Here
the "benchmark" is a deterministic slice of the documents table
(``doc_id % 97 == 0``) so the op is self-contained and oracle-checkable;
in production the benchmark grams come from the eval suites.

Scale design: the benchmark side is tiny relative to the corpus (eval
suites are MBs, the corpus is TBs), so its distinct gram set is
broadcast — the corpus side then streams through one explode + hash
semi-match + per-doc count with NO shuffle of corpus grams (the only
shuffle is the final groupBy doc_id, |contaminated docs| rows). With a
larger benchmark, hash grams to 64 bits (xxhash64) and fall back to a
shuffle join on the hash — the plan shape is unchanged. Grams are kept
as raw strings here so the DuckDB oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.letbind import let1
from ex_hivent_spark.plans.registry import register
from ex_hivent_spark.session_memo import session_memo

# Production decontamination uses 8-13-token grams (GPT-3 used 13);
# the synthetic corpus' near-dups only share shorter runs, so the
# registered demo uses 4 to produce a non-empty, hash-checkable report.
# The plan is length-independent: N only changes the gram expression.
NGRAM_N = 4
BENCH_MOD = 97


def word_ngrams(text: Column, n: int = NGRAM_N) -> Column:
    """Distinct n-token word grams (as strings) of a space-tokenized
    text; docs shorter than n tokens contribute their whole text as one
    gram. Pure built-ins: split + transform over an index sequence."""
    # let-bound split: HOF lambda bodies are outside codegen CSE, so an
    # unbound split re-runs per gram (functions/letbind.py).
    return let1(
        F.split(text, " "),
        lambda toks: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(toks) - (n - 1), F.lit(1)),
                ),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    )


@session_memo
def word_gram_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, g): the exploded word-NGRAM_N-gram stream over
    documents, lazily localCheckpointed + session-memoized —
    q_llm_decontaminate and corpus.tagged_corpus (q_llm_corpus_audit)
    derive from the identical frame, so a session running both pays
    the split+gram map once. Checkpoint trade: locally this stores raw
    gram strings once and reads them twice; a 100 TB run would keep
    the map-only streaming shape (drop the checkpoint) or hash grams
    to 64 bits first — the consumers' join logic is unchanged either
    way."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(word_ngrams(F.col("text"))).alias("g")
    ).localCheckpoint(eager=False)


@register(
    "q_llm_decontaminate",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - {NGRAM_N - 1}, 1) + 1),
               i -> array_to_string(t[i:i+{NGRAM_N - 1}], ' '))) AS gs
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % {BENCH_MOD} = 0
    ),
    corp AS (
      SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % {BENCH_MOD} <> 0
    )
    SELECT c.doc_id, count(DISTINCT c.g) AS n_contaminated_grams
    FROM corp c JOIN bench b USING (g)
    GROUP BY c.doc_id
    """,
)
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing >= 1 N-token gram with the benchmark slice
    (doc_id % 97 == 0), with the count of distinct shared grams — the
    contamination report a pretraining pipeline acts on (drop doc, or
    scrub the overlapping spans)."""
    grams = word_gram_frame(spark, sf_dir)
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0).select("g").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_contaminated_grams"))
    )


# The cross-corpus split uses a coarser modulus than decontamination:
# near-dup pairs are rare in the synthetic corpus, and a 1/97 benchmark
# slice intersects none of them — 1/7 yields a small non-empty report.
CROSS_MOD = 7


@register(
    "q_llm_cross_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ),
    pairs AS (
      SELECT a.doc_id AS bench_id, b.doc_id AS doc_id,
             len(list_intersect(a.s, b.s)) AS n_common,
             len(a.s) AS la, len(b.s) AS lb
      FROM sh a JOIN sh b
        ON a.lang = b.lang
       AND a.doc_id % {CROSS_MOD} = 0
       AND b.doc_id % {CROSS_MOD} <> 0
    )
    SELECT bench_id, doc_id,
           CAST(n_common AS DOUBLE) / (la + lb - n_common) AS jaccard
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / (la + lb - n_common) >= 0.5
    """,
)
def q_llm_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination / cross-corpus dedup: training docs whose
    token-3-gram Jaccard vs ANY benchmark-slice doc is >= 0.5 — catches
    paraphrased/reformatted eval leakage that exact-gram matching
    (q_llm_decontaminate) misses, and is equally the "dedup new crawl
    against the previous snapshot" op.

    Same lossless prefix-filter plan as q_llm_ngram_jaccard (equi-join
    on (lang, prefix-shingle hash), exact verification on candidates,
    never an all-pairs product) — but across the bench/corpus split, so
    candidate volume is |bench grams| ∩ |corpus grams| rather than a
    full self-join. The oracle brute-forces the split within lang,
    which sf0.01 DuckDB can afford."""
    from ex_hivent_spark.llm.dedup import shingles

    # r16: A/B-tested spread_table (the dedup-family precedent) and
    # REVERTED — a measured wash (1.47 plain vs 1.51 spread median):
    # the bench-side shingle set is small and the corpus-side work is
    # dominated by the candidate equi-join, not the map phase.
    d = load_table(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id",
        "lang",
        F.explode(shingles(F.col("text"), hasher=F.xxhash64)).alias("h"),
    )
    hs = tk.groupBy("doc_id", "lang").agg(
        F.array_sort(F.collect_set("h")).alias("hs")
    )
    hs = hs.localCheckpoint(eager=False)

    n = F.size("hs")
    prefix_len = n - F.ceil(n * F.lit(0.5)).cast("int") + 1
    prefix = hs.select(
        "doc_id", "lang", F.explode(F.slice("hs", 1, prefix_len)).alias("ph")
    )
    pa = prefix.filter(F.col("doc_id") % CROSS_MOD == 0).alias("pa")
    pb = prefix.filter(F.col("doc_id") % CROSS_MOD != 0).alias("pb")
    candidates = (
        pa.join(
            pb,
            (F.col("pa.lang") == F.col("pb.lang"))
            & (F.col("pa.ph") == F.col("pb.ph")),
        )
        .select(
            F.col("pa.doc_id").alias("bench_id"),
            F.col("pb.doc_id").alias("doc_id"),
        )
        .distinct()
    )

    sets = hs.select("doc_id", "hs")
    a = sets.withColumnRenamed("doc_id", "bench_id").withColumnRenamed(
        "hs", "ha"
    )
    b = sets.withColumnRenamed("hs", "hb")
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    union = F.size("ha") + F.size("hb") - inter
    jac = inter.cast("double") / union
    return (
        candidates.join(a, "bench_id")
        .join(b, "doc_id")
        .select("bench_id", "doc_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )
