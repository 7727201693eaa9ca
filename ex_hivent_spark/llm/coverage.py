"""Vocabulary coverage curve: what share of all token OCCURRENCES the
top-k unigrams cover at k ∈ {10, 100, 1000} — the Zipf-head readout
behind tokenizer vocab sizing and stop-list design (if 100 terms
cover 60% of the stream, the long tail is where the information is,
and a k-sized cache/stop-list has a known hit rate). Complements
q_llm_zipf_fit (the exponent) and q_llm_topk_ngrams (the head
itself).

Plan discipline: the corpus collapses to per-term counts in one hash
aggregate (map-side combined); the head is a TakeOrdered-capped
1000-row frame (orderBy+limit — never a global sort materialization);
the coverage cuts are conditional sums over that bounded frame plus a
broadcast one-row total. The only window is a rank over the ≤1000-row
head (allowlisted bounded class).

Determinism: pure integer counts; ranking tie-breaks on the term
string; the three closing shares are e6-rounded.

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no corpus surface; this
derives from the driver's analytics mandate and standard
corpus-statistics practice (Zipf-coverage tables à la WIMBD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# Coverage cut grid and the head cap (= the largest cut).
_COV_KS = (10, 100, 1000)


@register(
    "q_llm_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tc AS (
      SELECT term, CAST(count(*) AS BIGINT) AS n
      FROM toks WHERE term <> '' GROUP BY term
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_vocab
      FROM tc
    ),
    head AS (
      SELECT term, n,
             row_number() OVER (ORDER BY n DESC, term) AS rn
      FROM (SELECT term, n FROM tc ORDER BY n DESC, term
            LIMIT {_COV_KS[-1]})
    )
    {" UNION ALL ".join(
        f'''SELECT CAST({k} AS BIGINT) AS k, t.n_total, t.n_vocab,
               CAST(coalesce(sum(CASE WHEN h.rn <= {k} THEN h.n END), 0)
                    AS BIGINT) AS covered,
               {sql_dround(
                   f"CAST(coalesce(sum(CASE WHEN h.rn <= {k} THEN h.n END),"
                   f" 0) AS DOUBLE) / t.n_total", 6)} AS coverage
        FROM head h CROSS JOIN tot t GROUP BY t.n_total, t.n_vocab'''
        for k in _COV_KS
    )}
    """,
)
def q_llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-occurrence coverage of the top-k unigram head at
    k = 10 / 100 / 1000 (whitespace tokens, empty strings dropped —
    the q_llm_topk_ngrams convention), with the corpus total and the
    vocabulary size alongside.

    Plan: one explode + hash aggregate to per-term counts (map-side
    combined — the shuffle carries the vocabulary, sublinear in the
    corpus); the head is a TakeOrdered 1000-row frame; each coverage
    cut is a conditional sum over that bounded frame against the
    broadcast one-row total. Determinism: integer counts, term-string
    tie-breaks in the head rank, e6-rounded closing shares."""
    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)  # head + total: one pass
    )
    tot = tc.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
    )
    head = (
        tc.orderBy(F.col("n").desc(), "term")
        .limit(_COV_KS[-1])
        .select(
            "term",
            "n",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "term"))
            .alias("rn"),
        )
    )
    j = head.crossJoin(F.broadcast(tot))
    cut_aggs = [
        F.coalesce(F.sum(F.when(F.col("rn") <= k, F.col("n"))), F.lit(0))
        .cast("bigint")
        .alias(f"cov{k}")
        for k in _COV_KS
    ]
    one = j.groupBy("n_total", "n_vocab").agg(*cut_aggs)
    # One aggregate pass computes every cut; explode the literal cut
    # grid into rows (no per-cut re-scan of the head).
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).cast("bigint").alias("k"),
                    F.col(f"cov{k}").alias("covered"),
                )
                for k in _COV_KS
            ]
        )
    ).alias("cut")
    return one.select("n_total", "n_vocab", rows).select(
        F.col("cut.k").alias("k"),
        "n_total",
        "n_vocab",
        F.col("cut.covered").alias("covered"),
        dround(
            F.col("cut.covered").cast("double") / F.col("n_total"), 6
        ).alias("coverage"),
    )
