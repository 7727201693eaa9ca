"""End-to-end pretraining-corpus curation pipeline with a per-stage
audit — the composition the individual llm/ operators exist for.

A production data pipeline is not one operator but a funnel: quality
gate → exact dedup → benchmark decontamination → per-language mixture
cap, each stage feeding the next, each drop accounted for. This module
runs the whole funnel as ONE Spark job over a single tagged frame
(per-doc survival flags computed with windows and one broadcast
semi-match — no stage materializes an intermediate table) and reports
the funnel audit every curation run ships with: docs in, docs out,
docs dropped, per stage.

Scale shape: the flags frame shuffles twice (once on md5(text) for the
dedup window, once on lang for the cap window); contamination is the
proven broadcast-gram semi-match from decontam.py; the audit itself is
one conditional aggregate. Nothing re-scans the corpus per stage — at
100 TB the funnel costs ~2 shuffles total, not 4 jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.llm.decontam import BENCH_MOD, NGRAM_N, word_gram_frame
from ex_hivent_spark.plans.registry import register

MIN_WORDS = 20
MAX_CHARS = 3000
CAP_PER_LANG = 60

_STAGES = (
    (0, "raw"),
    (1, "quality_gate"),
    (2, "exact_dedup"),
    (3, "decontaminate"),
    (4, "lang_cap"),
)


def tagged_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with per-stage survival flags (q, keep_d, keep_c,
    keep_f). The final corpus is ``filter(keep_f)``; the audit
    aggregates the flags. Kept separate so both consumers share one
    definition."""
    d = load_table(spark, sf_dir, "documents")

    # Contaminated docs: share >= 1 NGRAM_N-token gram with the
    # held-out slice (doc_id % BENCH_MOD == 0). Broadcast the bench
    # gram set; corpus grams stream map-only into the semi-match. The
    # gram frame is the session-memoized one shared with
    # q_llm_decontaminate (decontam.word_gram_frame).
    grams = word_gram_frame(spark, sf_dir)
    bench_grams = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("g")
        .distinct()
    )
    contaminated = (
        grams.join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )

    n_words = F.size(F.split(F.col("text"), " "))
    base = (
        d.join(contaminated, "doc_id", "left")
        .na.fill({"contaminated": False})
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "contaminated",
            F.md5("text").alias("h"),
            F.md5(F.col("doc_id").cast("string")).alias("rkey"),
            ((n_words >= MIN_WORDS) & (F.col("n_chars") <= MAX_CHARS)).alias(
                "q"
            ),
            (F.col("doc_id") % BENCH_MOD == 0).alias("bench_doc"),
        )
    )

    dedup_w = Window.partitionBy("h")
    keep_d = F.col("q") & (
        F.col("doc_id")
        == F.min(F.when(F.col("q"), F.col("doc_id"))).over(dedup_w)
    )
    with_d = base.withColumn("keep_d", keep_d)
    keep_c = (
        F.col("keep_d") & ~F.col("bench_doc") & ~F.col("contaminated")
    )
    with_c = with_d.withColumn("keep_c", keep_c)

    cap_w = (
        Window.partitionBy("lang")
        .orderBy("rkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    survivors_so_far = F.sum(
        F.when(F.col("keep_c"), 1).otherwise(0)
    ).over(cap_w)
    keep_f = F.col("keep_c") & (survivors_so_far <= CAP_PER_LANG)
    return with_c.withColumn("keep_f", keep_f)


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final curated corpus (doc ids + lang): quality-gated,
    exact-deduped, decontaminated, per-language capped."""
    return tagged_corpus(spark, sf_dir).filter("keep_f").select(
        "doc_id", "lang"
    )


@register(
    "q_llm_corpus_audit",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - {NGRAM_N - 1}, 1) + 1),
               i -> array_to_string(t[i:i+{NGRAM_N - 1}], ' '))) AS gs
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams
      WHERE doc_id % {BENCH_MOD} = 0
    ),
    contam AS (
      SELECT DISTINCT c.doc_id
      FROM (SELECT doc_id, unnest(gs) AS g FROM grams) c
      JOIN bench b USING (g)
    ),
    flags0 AS (
      SELECT d.doc_id, d.lang, md5(d.text) AS h,
             md5(CAST(d.doc_id AS VARCHAR)) AS rkey,
             (len(string_split(d.text, ' ')) >= {MIN_WORDS}
              AND d.n_chars <= {MAX_CHARS}) AS q,
             (d.doc_id % {BENCH_MOD} = 0) AS bench_doc,
             (ct.doc_id IS NOT NULL) AS contaminated
      FROM documents d LEFT JOIN contam ct ON d.doc_id = ct.doc_id
    ),
    flags1 AS (
      SELECT *, (q AND doc_id = min(CASE WHEN q THEN doc_id END)
                          OVER (PARTITION BY h)) AS keep_d
      FROM flags0
    ),
    flags2 AS (
      SELECT *, (keep_d AND NOT bench_doc AND NOT contaminated) AS keep_c
      FROM flags1
    ),
    flags3 AS (
      SELECT *, (keep_c AND
                 sum(CASE WHEN keep_c THEN 1 ELSE 0 END)
                   OVER (PARTITION BY lang ORDER BY rkey, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 <= {CAP_PER_LANG}) AS keep_f
      FROM flags2
    ),
    agg AS (
      SELECT count(*) AS n_raw,
             CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_q,
             CAST(sum(CASE WHEN keep_d THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
             CAST(sum(CASE WHEN keep_c THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN keep_f THEN 1 ELSE 0 END) AS BIGINT) AS n_f
      FROM flags3
    )
    SELECT stage_id, stage, n_in, n_out, n_in - n_out AS n_dropped
    FROM (
      SELECT 0 AS stage_id, 'raw' AS stage, n_raw AS n_in, n_raw AS n_out
      FROM agg
      UNION ALL SELECT 1, 'quality_gate', n_raw, n_q FROM agg
      UNION ALL SELECT 2, 'exact_dedup', n_q, n_d FROM agg
      UNION ALL SELECT 3, 'decontaminate', n_d, n_c FROM agg
      UNION ALL SELECT 4, 'lang_cap', n_c, n_f FROM agg
    )
    """,
)
def q_llm_corpus_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel audit: one row per pipeline stage with docs
    in / out / dropped — quality gate (>= {MIN_WORDS} words, <=
    {MAX_CHARS} chars), exact dedup (keep min doc_id per md5), holdout
    removal + 4-gram benchmark decontamination, deterministic
    per-language mixture cap (md5-rank order, first {CAP_PER_LANG}).
    This is the report every corpus build ships with, and the
    composition proof for the stage operators (q_llm_quality_score,
    q_llm_exact_dedup, q_llm_decontaminate, q_llm_reservoir_sample)
    running as ONE job instead of four.

    Everything is integer counting over deterministic flags, so the
    whole funnel hash-matches the oracle with no rounding anywhere."""
    tagged = tagged_corpus(spark, sf_dir)
    agg = tagged.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("q"), 1).otherwise(0)).alias("n_q"),
        F.sum(F.when(F.col("keep_d"), 1).otherwise(0)).alias("n_d"),
        F.sum(F.when(F.col("keep_c"), 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("keep_f"), 1).otherwise(0)).alias("n_f"),
    )
    outs = {"raw": "n_raw", "quality_gate": "n_q", "exact_dedup": "n_d",
            "decontaminate": "n_c", "lang_cap": "n_f"}
    ins = {"raw": "n_raw", "quality_gate": "n_raw", "exact_dedup": "n_q",
           "decontaminate": "n_d", "lang_cap": "n_c"}
    rows = F.array(
        *[
            F.struct(
                F.lit(sid).alias("stage_id"),
                F.lit(name).alias("stage"),
                F.col(ins[name]).alias("n_in"),
                F.col(outs[name]).alias("n_out"),
            )
            for sid, name in _STAGES
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.stage_id", "r.stage", "r.n_in", "r.n_out")
        .withColumn("n_dropped", F.col("n_in") - F.col("n_out"))
    )
