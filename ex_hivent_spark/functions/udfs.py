"""User-defined-function surface (SURVEY.md §2.B UDF table).

The reference's only user-code hooks are the per-event ``process/1``
callback (consumer.ex:25) and subscription matcher/mapper closures
(channel_client.ex:146-149) — row-level functions. This module provides
the engine's full UDF ladder, fastest first:

1. native Column expressions (everything in functions/scalar.py) —
   always preferred;
2. Arrow-vectorized scalar ``pandas_udf`` — the acceptable Python path
   (~10-100x over row-at-a-time UDFs);
3. ``pandas_udf`` GROUPED_AGG — custom aggregates;
4. ``applyInPandas`` — grouped-map transforms (per-key model-ish logic);
(5. per-row Python UDFs exist only in streaming/consumer.py, where the
   reference's semantics are literally a per-event callback.)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.plans.registry import register


# pandas_udf parses its return-type string against the active session,
# so construction must be lazy (module import happens before any Spark
# session exists in the driver harness).
from functools import lru_cache


@lru_cache(maxsize=None)
def token_count_pudf():
    """Vectorized whitespace token count (Arrow batch in, batch out)."""

    @pandas_udf("int")
    def _token_count(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int32")

    return _token_count


@lru_cache(maxsize=None)
def p90_pudf():
    """GROUPED_AGG pandas UDF: 90th percentile (linear interpolation)."""

    @pandas_udf("double")
    def _p90(values: pd.Series) -> float:
        import numpy as np

        return float(np.percentile(values.to_numpy(), 90))

    return _p90


def zscore_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """applyInPandas grouped-map: z-score of ``value`` within each key
    group. Equivalent to the window-function formulation (tested against
    it) but demonstrates the per-group pandas path used when logic
    genuinely needs a dataframe per key (model scoring, curve fits)."""
    schema = f"{', '.join(f'{c} {t}' for c, t in df.dtypes)}, zscore double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value]
        std = v.std(ddof=1)
        pdf = pdf.copy()
        # Degenerate groups (one row -> std NaN; constant -> std 0) yield
        # NaN, matching the window twin where stddev_samp is NULL / the
        # division is by zero (Spark returns NULL for both; NaN is the
        # closest Arrow-representable value on the pandas path).
        pdf["zscore"] = (v - v.mean()) / std if std and std > 0 else float("nan")
        return pdf

    return df.groupBy(key).applyInPandas(norm, schema)


@register(
    "q_udf_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def q_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF with exact split semantics — hash-matches the
    SQL oracle, proving the Arrow path is lossless."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", token_count_pudf()("text").alias("n_tokens"))


@register(
    "q_udf_grouped_p90",
    oracle="""
    SELECT event_type,
           CAST(floor(quantile_cont(value, 0.9) * 1000000.0 + 0.5) AS BIGINT)
               AS p90_e6
    FROM events
    GROUP BY event_type
    """,
)
def q_udf_grouped_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: p90 of event value per type, rounded to
    1e-6 — np.percentile and DuckDB quantile_cont share the linear-
    interpolation definition, so the rounded values hash-match."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.floor(p90_pudf()("value") * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("p90_e6")
    )


@register(
    "q_udf_zscore",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor((value - avg(value) OVER w) / stddev_samp(value) OVER w
                      * 1000000.0 + 0.5) AS BIGINT) AS zscore_e6
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def q_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values, rounded to 1e-6.

    r16 OPTIMIZATION: computed with the native window formulation (one
    hash-partitioned window, whole-stage codegen, zero Python boundary)
    instead of the ``applyInPandas`` grouped-map it launched with — the
    grouped-map shipped EVERY event row JVM→Python→JVM per user group
    (guide §4.1/§2.3) and was the suite's slowest query (4.25 s; the
    window form runs the same one shuffle without the Arrow round-trip).
    The two paths are equivalence-tested (tests/test_udfs.py
    test_zscore_matches_window_twin); :func:`zscore_per_group` remains
    the engine's grouped-map surface for logic that genuinely needs a
    pandas frame per key. Degenerate groups (single-row → stddev_samp
    NULL; constant → 0/0) surface as NULL via try_divide, matching the
    pandas twin's NaN→NULL mapping and the oracle."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    z = F.try_divide(
        F.col("value") - F.avg("value").over(w),
        F.stddev_samp("value").over(w),
    )
    return e.select(
        "event_id",
        "user_id",
        F.floor(z * 1e6 + F.lit(0.5)).cast("bigint").alias("zscore_e6"),
    )


@lru_cache(maxsize=None)
def chunk_spans_udtf():
    """Python UDTF (1→N rows): emit chunk spans (64-token windows every
    48) for one document — the table-function escape hatch for logic
    that genuinely must run as Python per input row. The arithmetic
    twin of the pure-expression chunker (llm/pipeline.py), kept so the
    UDTF surface is exercised and oracle-checked."""
    from pyspark.sql.functions import udtf

    class ChunkSpans:
        def eval(self, doc_id, n_tokens: int):
            start, idx = 1, 0
            while start <= n_tokens:
                yield doc_id, idx, start, min(64, n_tokens - start + 1)
                idx += 1
                start += 48

    return udtf(
        ChunkSpans,
        returnType=(
            "doc_id bigint, chunk_idx int, start_token int, n_chunk_tokens int"
        ),
    )


@register(
    "q_udtf_chunk_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) / 48 AS INTEGER) AS chunk_idx,
           CAST(s AS INTEGER) AS start_token,
           CAST(least(64, n - s + 1) AS INTEGER) AS n_chunk_tokens
    FROM toks, unnest(range(1, n + 1, 48)) AS u(s)
    """,
)
def q_udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join: one input row (doc) → N output
    rows (chunk spans). Slow path by design — the pure-expression
    chunker (q_llm_doc_chunks) is the production plan; this query
    proves the UDTF surface end-to-end against the same arithmetic."""
    from ex_hivent_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("chunk_spans", chunk_spans_udtf())
    return spark.sql(
        """
        SELECT s.doc_id, s.chunk_idx, s.start_token, s.n_chunk_tokens
        FROM documents,
             LATERAL chunk_spans(doc_id, size(split(text, ' '))) s
        """
    )
