"""Per-source document-length inequality: the Gini coefficient of
``n_chars`` within each source — the "is this source a mix of stubs
and monsters or homogeneous documents" readout that complements
q_llm_corpus_audit's moments and q_llm_length_filter_sweep's
thresholds (a high-Gini source needs per-band sampling before
training, or its short tail dominates the document count while its
long tail dominates the token count).

Plan discipline: documents collapse to per-(source, n_chars)
DISTINCT-value counts in one hash aggregate; the rank structure comes
from the DETERMINISTIC blocked prefix fold (operators/prefix.py) over
that bounded frame with the q_stats_brown_forsythe
preceding-group-offset subtraction — no data-volume window, no
global sort.

Determinism: lengths and counts are exact integers, so the grouped
rank·value sum 2·S = Σ c·(2C+c+1)·v is EXACT integer arithmetic
widened to decimal(38,0) (count² ·length can pass 2^63 at extreme
scale); only the two closing divisions are doubles, e6-rounded.

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no corpus surface; this
derives from the driver's analytics mandate and standard
corpus-curation practice (length-distribution audits à la Gopher /
CCNet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.prefix import running_totals_blocked
from ex_hivent_spark.plans.registry import register

# Length-ranking grid: n_chars lives in the hundreds — width-100
# blocks keep the prefix fold at a handful of blocks per source.
_LEN_BLOCK = 100


@register(
    "q_llm_length_gini",
    oracle=f"""
    WITH vc AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY source, n_chars
    ),
    cum AS (
      SELECT source, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - cnt AS BIGINT) AS cb
      FROM vc
    ),
    g AS (
      SELECT source,
             CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST(sum(CAST(cnt AS DECIMAL(38,0))
                      * CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sx,
             CAST(sum(CAST(cnt AS DECIMAL(38,0))
                      * CAST(2 * cb + cnt + 1 AS DECIMAL(38,0))
                      * CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS s2rx
      FROM cum GROUP BY source
    )
    SELECT source, n_docs,
           {sql_dround("CAST(sx AS DOUBLE) / n_docs", 6)} AS mean_chars,
           {sql_dround(
               "CAST(s2rx AS DOUBLE)"
               " / (CAST(n_docs AS DOUBLE) * CAST(sx AS DOUBLE))"
               " - (CAST(n_docs AS DOUBLE) + 1) / n_docs", 6,
           )} AS gini
    FROM g
    """,
)
def q_llm_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source, from the
    grouped midrank identity G = 2·Σᵢ rᵢxᵢ/(n·Σx) − (n+1)/n with
    2·Σ rᵢxᵢ = Σ_values c·(2C+c+1)·v over the distinct-length frame
    (C = cumulative count of shorter docs) — 0 for perfectly uniform
    lengths, →1 when a few giants carry all the characters.

    Plan: one hash aggregate to per-(source, length) distinct counts,
    the blocked prefix fold for per-source cumulatives (the
    q_stats_brown_forsythe offset machinery — length blocks are
    width-100, a handful per source at any scale), one per-source
    closing aggregate. Determinism: the rank·value sum is EXACT
    integer arithmetic in decimal(38,0) (no rounding anywhere before
    the closings); the two closing divisions are e6-rounded."""
    d = load_table(spark, sf_dir, "documents")
    vc = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )  # wave-9 pin A/B-tested and REVERTED (1.01 -> 1.12 s: the
    # duplicated documents subtrees overlap within one job)
    blocked = vc.withColumn(
        "blk", F.floor(F.col("v") / F.lit(_LEN_BLOCK))
    )
    cum = running_totals_blocked(
        blocked,
        order_cols=["v"],
        block_cols=["source", "blk"],
        sum_cols={"cnt": "gcum"},
    )
    # The fold is global over the (source, blk) lexicographic order;
    # subtract each source's preceding-sources total to get the
    # per-source cumulative (the q_stats_brown_forsythe machinery).
    st = vc.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("ns")
    )
    a = st.select(
        F.col("source").alias("src_a"), F.col("ns").alias("ns_a")
    )
    off = (
        a.join(
            st.select("source", "ns"),
            F.col("source") < F.col("src_a"),
            "left",
        )
        .groupBy(F.col("src_a").alias("source"))
        .agg(F.coalesce(F.sum("ns"), F.lit(0)).cast("bigint").alias("off"))
    )
    cum = cum.join(F.broadcast(off), "source").select(
        "source",
        "v",
        "cnt",
        (F.col("gcum") - F.col("off") - F.col("cnt"))
        .cast("bigint")
        .alias("cb"),
    )
    d38 = "decimal(38,0)"
    g = cum.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.sum(F.col("cnt").cast(d38) * F.col("v").cast(d38))
        .cast(d38)
        .alias("sx"),
        F.sum(
            F.col("cnt").cast(d38)
            * (2 * F.col("cb") + F.col("cnt") + 1).cast(d38)
            * F.col("v").cast(d38)
        )
        .cast(d38)
        .alias("s2rx"),
    )
    n = F.col("n_docs")
    return g.select(
        "source",
        "n_docs",
        dround(F.col("sx").cast("double") / n, 6).alias("mean_chars"),
        dround(
            F.col("s2rx").cast("double")
            / (n.cast("double") * F.col("sx").cast("double"))
            - (n.cast("double") + 1) / n,
            6,
        ).alias("gini"),
    )


@register(
    "q_llm_char_class_profile",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             CAST(length(text) AS BIGINT) AS n_all,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                  AS BIGINT) AS n_alpha,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                  AS BIGINT) AS n_digit,
             CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
                  AS BIGINT) AS n_space
      FROM documents
    ),
    g AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_all) AS BIGINT) AS n_chars,
             CAST(sum(n_alpha) AS BIGINT) AS n_alpha,
             CAST(sum(n_digit) AS BIGINT) AS n_digit,
             CAST(sum(n_space) AS BIGINT) AS n_space
      FROM per_doc GROUP BY lang
    )
    SELECT lang, n_docs, n_chars,
           {sql_dround("CAST(n_alpha AS DOUBLE) / n_chars", 6)}
             AS alpha_ratio,
           {sql_dround("CAST(n_digit AS DOUBLE) / n_chars", 6)}
             AS digit_ratio,
           {sql_dround("CAST(n_space AS DOUBLE) / n_chars", 6)}
             AS space_ratio,
           {sql_dround(
               "1.0 - (CAST(n_alpha AS DOUBLE) + n_digit + n_space)"
               " / n_chars", 6)} AS other_ratio
    FROM g
    """,
)
def q_llm_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level character-class profile per language: the ASCII
    letter / digit / space / other shares of all characters — the
    first-order "is this slice prose, tables, or markup" signature
    (CJK text shows near-zero alpha_ratio with high other_ratio;
    number-heavy boilerplate shows a digit spike). The corpus-level
    companion to q_llm_quality_score's per-document ratios, grouped
    where the mixture decisions are made.

    Plan: class counts are per-row regexp strips (map-only, no
    explode — length(regexp_replace(…, '', 'g')) counts a class in
    one pass), one hash aggregate per language. Determinism: pure
    integer counts, literal ASCII classes identical in both regex
    engines, e6-rounded closing shares; n_chars ≥ 1 for every
    document, so the divisions are total."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        F.length("text").cast("bigint").alias("n_all"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
        .cast("bigint")
        .alias("n_alpha"),
        F.length(F.regexp_replace("text", "[^0-9]", ""))
        .cast("bigint")
        .alias("n_digit"),
        F.length(F.regexp_replace("text", "[^ ]", ""))
        .cast("bigint")
        .alias("n_space"),
    )
    g = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_all").cast("bigint").alias("n_chars"),
        F.sum("n_alpha").cast("bigint").alias("n_alpha"),
        F.sum("n_digit").cast("bigint").alias("n_digit"),
        F.sum("n_space").cast("bigint").alias("n_space"),
    )
    nc = F.col("n_chars").cast("double")
    return g.select(
        "lang",
        "n_docs",
        "n_chars",
        dround(F.col("n_alpha") / nc, 6).alias("alpha_ratio"),
        dround(F.col("n_digit") / nc, 6).alias("digit_ratio"),
        dround(F.col("n_space") / nc, 6).alias("space_ratio"),
        dround(
            1.0
            - (
                F.col("n_alpha").cast("double")
                + F.col("n_digit")
                + F.col("n_space")
            )
            / nc,
            6,
        ).alias("other_ratio"),
    )


# Token-histogram bucket boundaries: exact integer power-of-2 ladder
# (never floor(log2(..)) — libm at exact powers is a cross-engine
# coin flip). 2^12 tokens caps the synthetic corpus at every SF.
_TOK_BUCKETS = 12


def _sql_tok_bucket(expr: str) -> str:
    branches = "".join(
        f" WHEN {expr} < {1 << (b + 1)} THEN {b}"
        for b in range(_TOK_BUCKETS)
    )
    return f"CASE{branches} ELSE {_TOK_BUCKETS} END"


@register(
    "q_llm_token_histogram",
    oracle=f"""
    WITH t AS (
      SELECT source,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT source,
             CAST({_sql_tok_bucket("n_tok")} AS BIGINT) AS bucket,
             n_tok
      FROM t
    ),
    st AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM t
      GROUP BY source
    )
    SELECT b.source, b.bucket,
           CAST(power(2.0, b.bucket) AS BIGINT) AS bucket_min_tokens,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.n_tok) AS BIGINT) AS n_tokens,
           floor(CAST(count(*) AS DOUBLE) / any_value(st.n_src)
                 * 1000000.0 + 0.5) / 1000000.0 AS doc_share
    FROM b JOIN st ON b.source = st.source
    GROUP BY b.source, b.bucket
    """,
)
def q_llm_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-count histogram in power-of-2 length buckets
    (bucket b holds docs with 2^b ≤ tokens < 2^(b+1); whitespace
    tokens, empties dropped — the q_llm_topk_ngrams convention): doc
    count, token mass and doc share per (source, bucket) — the
    curation view that shows WHERE each source's token mass lives
    (packing/chunking policy reads straight off it, and a bimodal
    histogram flags a mixed-template source).

    Plan: token counts are per-row map-only array ops (no explode);
    one hash aggregate to the ≤ |sources|·13 bucket grid plus one
    per-source total broadcast back. Determinism: bucket assignment
    is an exact INTEGER comparison ladder (never floor(log2()) —
    libm at exact powers of two is a cross-engine coin flip);
    counts are integers; the share is one e6-rounded division."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split("text", " "), lambda x: x != "")
    ).cast("bigint")
    t = d.select("source", n_tok.alias("n_tok")).localCheckpoint(
        eager=False
    )  # histogram + totals: one tokenize pass
    bucket = F.when(F.col("n_tok") < 2, 0)
    for b in range(1, _TOK_BUCKETS):
        bucket = bucket.when(F.col("n_tok") < (1 << (b + 1)), b)
    bucket = bucket.otherwise(_TOK_BUCKETS).cast("bigint")
    b = t.select("source", bucket.alias("bucket"), "n_tok")
    st = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_src")
    )
    g = (
        b.join(F.broadcast(st), "source")
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.first("n_src").alias("n_src"),
        )
    )
    return g.select(
        "source",
        "bucket",
        F.pow(F.lit(2.0), F.col("bucket")).cast("bigint").alias(
            "bucket_min_tokens"
        ),
        "n_docs",
        "n_tokens",
        dround(
            F.col("n_docs").cast("double") / F.col("n_src"), 6
        ).alias("doc_share"),
    )


@register(
    "q_llm_source_dup_rate",
    oracle="""
    WITH h AS (
      SELECT source, md5(text) AS hsh FROM documents
    ),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT hsh) AS BIGINT) AS n_distinct
      FROM h GROUP BY source
    )
    SELECT source, n_docs, n_distinct,
           n_docs - n_distinct AS n_dup_docs,
           floor((1.0 - CAST(n_distinct AS DOUBLE) / n_docs)
                 * 1000000.0 + 0.5) / 1000000.0 AS dup_rate
    FROM g
    """,
)
def q_llm_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source: md5(text) distinct counts
    against doc counts — the per-source accountability view of
    q_llm_exact_dedup's corpus-wide pass (a single high-dup-rate
    source usually means one crawler looping, and should be fixed at
    the source rather than absorbed by dedup downstream).

    Plan: map-only md5, one hash aggregate per source with an exact
    distinct (the shuffle carries hashes, never text — at 100 TB this
    is the standard hash-only dedup-audit shuffle shape).
    Determinism: md5 on identical bytes, integer counts, one
    e6-rounded closing rate."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("hsh"))
    g = h.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("hsh").cast("bigint").alias("n_distinct"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_distinct",
        (F.col("n_docs") - F.col("n_distinct")).alias("n_dup_docs"),
        dround(
            1.0 - F.col("n_distinct").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
    )
