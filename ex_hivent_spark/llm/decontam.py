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
from ex_hivent_spark.plans.registry import register

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
    toks = F.split(text, " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


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
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(word_ngrams(F.col("text"))).alias("g")
    )
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0).select("g").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_contaminated_grams"))
    )
