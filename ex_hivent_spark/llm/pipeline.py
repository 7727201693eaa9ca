"""LLM training-data pipeline operators beyond dedup/similarity:
chunking, PII scrubbing, deterministic sampling and train/test splits,
context packing, and embedding quantization.

Determinism convention: outputs are integers, md5 digests, or
decimal-rounded values, so every op here is hash-exact against its SQL
oracle — no float tolerance anywhere. Sampling/splitting is
content-hash based (md5 of the key), never RNG-based: the same row
lands in the same split on any cluster, any partitioning, any retry —
the property a 100 TB pipeline needs for reproducible dataset builds.

Scale notes: everything is built-in expressions (split/slice/md5/
regexp), map-only except where a groupBy/window is the semantic
(packing, split summary); chunk explosion multiplies rows by ~n_tokens/
stride — the chunker keeps only (ids, hash, counts) per chunk, never
duplicating the text payload into every chunk row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import (
    DEC,
    davg,
    dround,
    dsum,
    sql_dround,
    sql_dsum,
)
from ex_hivent_spark.plans.registry import register

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "q_llm_doc_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(least({CHUNK_TOKENS}, len(t) - s + 1) AS BIGINT)
               AS n_chunk_tokens,
           md5(array_to_string(t[s:s + {CHUNK_TOKENS - 1}], ' ')) AS chunk_md5
    FROM toks, unnest(range(1, len(t) + 1, {CHUNK_STRIDE})) AS u(s)
    """,
)
def q_llm_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 64-token chunks every 48 tokens
    (16-token overlap), the standard pre-tokenization shape for LLM
    training. Pure expressions (split + sequence + slice + explode);
    each chunk row carries only its md5 and token count, not the text —
    at scale the chunk table is narrow even though rows multiply."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(tokens), F.lit(CHUNK_STRIDE))
    return (
        d.select("doc_id", tokens.alias("t"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.least(
                F.lit(CHUNK_TOKENS), F.size("t") - F.col("s") + 1
            ).cast("bigint").alias("n_chunk_tokens"),
            F.md5(
                F.concat_ws(" ", F.slice("t", F.col("s"), CHUNK_TOKENS))
            ).alias("chunk_md5"),
        )
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_NUM_RE = "[0-9]+"


@register(
    "q_llm_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_NUM_RE}')) AS BIGINT)
               AS n_numbers,
           md5(regexp_replace(
                 regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_NUM_RE}', '<NUM>', 'g')) AS scrubbed_md5
    FROM documents
    """,
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: replace email-shaped tokens and digit runs
    with placeholder tags, reporting match counts and the digest of the
    scrubbed text. Patterns stay in the regex subset Java and RE2 treat
    identically (character classes + quantifiers — no backrefs or
    lookaround). Map-only, whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _NUM_RE, "<NUM>"
    )
    return d.select(
        "doc_id",
        # group idx 0 (whole match) must be explicit: pyspark's
        # regexp_extract_all defaults to group 1, which errors at
        # evaluation time the moment a group-less pattern matches
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_NUM_RE), F.lit(0)))
        .cast("bigint").alias("n_numbers"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "q_llm_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) = '0'
    """,
)
def q_llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample: keep docs whose md5(doc_id) ends in
    the hex digit '0'. Content-hash sampling is reproducible across
    clusters/partitionings/retries (unlike rand()-based .sample), and
    stratification is inherent — the hash is independent of lang/source,
    so every stratum is sampled at the same rate. Map-only filter that
    pushes nothing to the driver."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1) == "0"
    ).select("doc_id", "lang", "source", "n_chars")


_TRAIN_DIGITS = tuple("0123456789ab")  # 12/16 = 75% train


@register(
    "q_llm_train_test_split",
    oracle=f"""
    SELECT lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN {_TRAIN_DIGITS} THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_llm_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based 75/25 train/test assignment (first md5 hex digit of
    doc_id), summarized per (lang, split). The assignment is a pure
    function of the row key — stable under reshuffles and incremental
    re-runs, which rand()-seeded splits are not."""
    d = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            *_TRAIN_DIGITS
        ),
        F.lit("train"),
    ).otherwise(F.lit("test"))
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


PACK_BUDGET = 2048  # tokens per training context


@register(
    "q_llm_context_pack",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    runs AS (
      SELECT lang, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT lang,
           -- explicit floor: DuckDB CAST(double AS BIGINT) rounds, Spark truncates
           CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc_id
    FROM runs
    GROUP BY 1, 2
    """,
)
def q_llm_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential context packing: per language, docs in doc_id order
    are packed into ~2048-token contexts — a doc starts a new pack when
    the running total before it crosses the budget boundary. One window
    sum (shuffle by lang, sort by doc_id) + one aggregate; the exact
    streaming-concat shape a tokenized-dataset builder uses."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    runs = d.select("doc_id", "lang", n_tokens.alias("n_tokens")).withColumn(
        "cum", F.sum("n_tokens").over(w)
    )
    return (
        runs.withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / PACK_BUDGET)
            .cast("bigint"),
        )
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


@register(
    "q_llm_embed_quantize",
    oracle="""
    WITH scaled AS (
      SELECT vec_id, label,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS maxabs,
             embedding
      FROM embeddings
    )
    SELECT vec_id, label,
           CAST(floor(maxabs * 1000000.0 + 0.5) AS BIGINT) AS maxabs_e6,
           CAST(list_sum(list_transform(embedding,
                x -> floor(CAST(x AS DOUBLE) / maxabs * 127.0 + 0.5)))
               AS BIGINT) AS q_checksum
    FROM scaled
    """,
)
def q_llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings: per-vector max-abs
    scale, each component mapped to round(x/maxabs*127). Emits the
    e6-rounded scale and the integer checksum of the quantized vector —
    integers, so the float->int boundary is the only rounding and it is
    the same floor(x+0.5) formula on both engines. Map-only; the
    quantized representation is what a 100 TB vector store would
    actually persist (4x smaller + SIMD-friendly)."""
    em = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    maxabs = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    q = F.transform(
        "embedding",
        lambda x: F.floor(xd(x) / F.col("maxabs") * 127.0 + F.lit(0.5)),
    )
    return (
        em.withColumn("maxabs", maxabs)
        .select(
            "vec_id",
            "label",
            F.floor(F.col("maxabs") * 1e6 + F.lit(0.5))
            .cast("bigint").alias("maxabs_e6"),
            F.aggregate(q, F.lit(0).cast("bigint"), lambda acc, v: acc + v)
            .alias("q_checksum"),
        )
    )


# Per-source sampling weights for corpus mixing (doc-level Bernoulli
# with a deterministic uniform — no RNG, reproducible across clusters).
_SOURCE_WEIGHTS = {"src0": 1.0, "src1": 1.0, "src2": 0.5, "src3": 0.5}
_DEFAULT_WEIGHT = 0.25
_KNUTH = 2654435761  # multiplicative-hash constant
_MOD = 1 << 32


def _sql_weight_case() -> str:
    whens = "\n".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in _SOURCE_WEIGHTS.items()
    )
    return f"CASE {whens} ELSE {_DEFAULT_WEIGHT} END"


@register(
    "q_llm_weighted_sample",
    oracle=f"""
    WITH u AS (
      SELECT source, doc_id,
             CAST((doc_id * {_KNUTH}) % {_MOD} AS DOUBLE) / {_MOD} AS unif,
             {_sql_weight_case()} AS w
      FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           count(*) FILTER (unif < w) AS n_kept,
           CAST(floor(any_value(w) * 10000.0 + 0.5) AS BIGINT) AS weight_e4
    FROM u
    GROUP BY source
    """,
)
def q_llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: per-source Bernoulli keep-rates applied
    via a deterministic uniform (Knuth multiplicative hash of doc_id —
    pure integer arithmetic, identical on every engine/cluster/retry;
    the reproducibility property rand()-based sampling lacks). Reports
    per-source totals/kept so the realized mixture is auditable."""
    d = load_table(spark, sf_dir, "documents")
    unif = ((F.col("doc_id") * _KNUTH) % _MOD).cast("double") / _MOD
    w = F.lit(_DEFAULT_WEIGHT)
    for s, wt in reversed(list(_SOURCE_WEIGHTS.items())):
        w = F.when(F.col("source") == s, F.lit(wt)).otherwise(w)
    return (
        d.select("source", unif.alias("unif"), w.alias("w"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(F.col("unif") < F.col("w")).alias("n_kept"),
            F.floor(F.any_value("w") * 1e4 + F.lit(0.5))
            .cast("bigint").alias("weight_e4"),
        )
    )


# Target language shares for the mixture planner (sums to 1).
_TARGET_SHARES = {"en": 0.4, "zh": 0.2, "de": 0.15, "fr": 0.15, "es": 0.1}


def _sql_target_case() -> str:
    whens = "\n".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in _TARGET_SHARES.items()
    )
    return f"CASE {whens} ELSE 0.0 END"


@register(
    "q_llm_mixture_rates",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n, {_sql_target_case()} AS target_share
      FROM documents GROUP BY lang
    ),
    scaled AS (
      SELECT lang, n, target_share,
             -- largest corpus size achievable under the targets given
             -- each lang's supply: min over langs of n/target
             (SELECT min(n / target_share) FROM counts WHERE target_share > 0)
                 AS feasible_total
      FROM counts
    )
    SELECT lang, n AS n_available,
           CAST(floor(target_share * feasible_total + 0.5) AS BIGINT)
               AS n_to_take,
           CAST(floor(least(1.0, target_share * feasible_total / n) * 1000000.0
                      + 0.5) AS BIGINT) AS rate_e6
    FROM scaled
    """,
)
def q_llm_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: given target language shares, compute per-lang
    take counts and sampling rates for the LARGEST corpus achievable
    without upsampling — feasible_total = min(n_lang / share_lang), the
    standard data-mixing feasibility bound. One aggregate + a broadcast
    scalar; the plan every multilingual dataset build starts from."""
    d = load_table(spark, sf_dir, "documents")
    target = F.lit(0.0)
    for k, v in reversed(list(_TARGET_SHARES.items())):
        target = F.when(F.col("lang") == k, F.lit(v)).otherwise(target)
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "target_share", target
    )
    feasible = counts.filter(F.col("target_share") > 0).agg(
        F.min(F.col("n") / F.col("target_share")).alias("feasible_total")
    )
    return (
        counts.join(F.broadcast(feasible))
        .select(
            "lang",
            F.col("n").alias("n_available"),
            F.floor(F.col("target_share") * F.col("feasible_total") + F.lit(0.5))
            .cast("bigint").alias("n_to_take"),
            F.floor(
                F.least(
                    F.lit(1.0),
                    F.col("target_share") * F.col("feasible_total") / F.col("n"),
                )
                * 1e6
                + F.lit(0.5)
            ).cast("bigint").alias("rate_e6"),
        )
    )


RESERVOIR_K = 10


@register(
    "q_llm_reservoir_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS h,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rn
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars, rn
    FROM ranked WHERE rn <= {RESERVOIR_K}
    """,
)
def q_llm_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE per-stratum sample (the reservoir-sampling contract:
    exactly K docs per language, every doc equally likely) made
    deterministic: rank docs inside each stratum by md5(doc_id) — a
    uniform pseudo-random order that is reproducible across clusters,
    partitionings, and retries, unlike rand()-reservoirs — and keep the
    first K. Complements q_llm_stratified_sample (fixed RATE): fixed
    size is what eval-set carving and per-domain caps need.

    Plan: one window rank per stratum. At 100 TB the same contract runs
    as groupBy(lang).agg(min_by-K) — a partial-aggregating top-K — but
    the window form keeps the driver-checkable rank column."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.select(
            "doc_id", "lang", "source", "n_chars",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= RESERVOIR_K)
    )


PASSAGE_TOKENS = 32  # disjoint windows for passage-level dedup


@register(
    "q_llm_passage_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pas AS (
      SELECT doc_id,
             md5(array_to_string(t[s:s + {PASSAGE_TOKENS - 1}], ' '))
                 AS passage_md5
      FROM toks, unnest(range(1, len(t) + 1, {PASSAGE_TOKENS})) AS u(s)
    ), dup AS (
      SELECT passage_md5 FROM pas
      GROUP BY passage_md5 HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT p.doc_id,
           count(*) AS n_passages,
           count(d.passage_md5) AS n_dup_passages,
           CAST(count(d.passage_md5) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS dup_frac
    FROM pas p LEFT JOIN dup d ON p.passage_md5 = d.passage_md5
    GROUP BY p.doc_id
    """,
)
def q_llm_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level duplication audit (RefinedWeb/Dolma-style): split
    each doc into disjoint 32-token passages, mark passages whose md5
    occurs in >= 2 distinct docs, and report the per-doc duplicated-
    passage fraction — the signal for paragraph-level dedup decisions
    that document-level hashing misses (boilerplate, quoted headers).

    Plan: explode to the narrow (doc_id, md5) passage table, one hash
    aggregate keyed on passage_md5 (high cardinality — no skew), equi-
    join the duplicate keys back, one aggregate keyed on doc_id.  At
    100 TB both shuffles carry 16-byte keys + counts, never text."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(tokens), F.lit(PASSAGE_TOKENS))
    pas = d.select(
        "doc_id", tokens.alias("t"), F.explode(starts).alias("s")
    ).select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice("t", F.col("s"), PASSAGE_TOKENS))
        ).alias("passage_md5"),
    )
    dup = (
        pas.groupBy("passage_md5")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("passage_md5", F.lit(1).alias("is_dup"))
    )
    return (
        pas.join(dup, "passage_md5", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.count("is_dup").alias("n_dup_passages"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            (
                F.col("n_dup_passages").cast("double")
                / F.col("n_passages").cast("double")
            ).alias("dup_frac"),
        )
    )


DOMAIN_MIN_DOCS = 20  # under-represented-domain flag threshold


@register(
    "q_llm_domain_stats",
    oracle=f"""
    SELECT source,
           n_docs,
           total_tokens,
           {sql_dround('avg_chars_raw', 6)} AS avg_chars,
           {sql_dround('CAST(n_docs AS DOUBLE) / sum(n_docs) OVER ()', 6)}
             AS corpus_share,
           n_docs < {DOMAIN_MIN_DOCS} AS flagged
    FROM (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                  AS BIGINT) AS total_tokens,
             CAST(sum(CAST(n_chars AS DECIMAL(25,6))) AS DOUBLE)
               / count(n_chars) AS avg_chars_raw
      FROM documents
      GROUP BY source
    ) per_domain
    """,
)
def q_llm_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation report (CCNet/Gopher rules run per source
    domain, not per doc): doc count, token volume, mean length, share
    of corpus, and an under-represented flag per `source`.  Domain
    granularity is where crawl filtering decisions actually happen —
    a domain is kept/dropped/capped as a unit.

    Plan: one hash aggregate keyed on source; the corpus share divides
    by a window total over the *aggregated* frame (|domains| rows, not
    |docs| — a one-partition window over domain counts is trivially
    small even at 100 TB where |domains| ~ 10^8 rows of 3 numbers).

    Hardened after the r4 driver hash mismatch: avg_chars and
    corpus_share are e6-rounded via :func:`dround` on BOTH engines (they
    were the only headline floats skipping the repo's decimals
    convention), and the oracle's token sum is CAST(... AS BIGINT) so
    DuckDB's HUGEINT sum type can't diverge from Spark's BIGINT."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("total_tokens"),
        davg("n_chars", "avg_chars"),
    )
    # Grand total as a broadcast one-row aggregate, NOT an empty-spec
    # window: the window form funnels the whole |domains| frame through
    # one task, while the scalar agg stays partially-aggregated and
    # distributed at any domain cardinality.
    total = per.agg(F.sum("n_docs").alias("__corpus_docs"))
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "total_tokens",
        dround(F.col("avg_chars"), 6).alias("avg_chars"),
        dround(
            F.col("n_docs").cast("double") / F.col("__corpus_docs"),
            6,
        ).alias("corpus_share"),
        (F.col("n_docs") < DOMAIN_MIN_DOCS).alias("flagged"),
    )


# --------------------------------------------------------------------------
# DSIR: data selection via importance resampling (hashed n-gram proxy)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed feature space (Xie et al. use 10k; scale-free)
DSIR_TARGET_SOURCE = "src0"  # literal stand-in for the curated target domain


@register(
    "q_llm_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(tok), 1, 12))::BIGINT % {DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
    ),
    src_cnt AS (SELECT b, count(*) AS cs FROM toks GROUP BY b),
    tgt_cnt AS (SELECT b, count(*) AS ct FROM toks
                WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY b),
    tot AS (
      SELECT count(*) AS ts,
             count(*) FILTER (WHERE source = '{DSIR_TARGET_SOURCE}') AS tt
      FROM toks
    ),
    stats AS (
      SELECT s.b, s.cs, coalesce(t.ct, 0) AS ct
      FROM src_cnt s LEFT JOIN tgt_cnt t USING (b)
    ),
    scored AS (
      SELECT doc_id,
             {sql_dround(
                 "ln((CAST(ct + 1 AS DOUBLE) * CAST(ts + " + str(DSIR_BUCKETS) + " AS DOUBLE))"
                 " / (CAST(cs + 1 AS DOUBLE) * CAST(tt + " + str(DSIR_BUCKETS) + " AS DOUBLE)))",
                 6,
             )} AS lr
      FROM toks JOIN stats USING (b) CROSS JOIN tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           {sql_dsum("lr", "dsir_logweight")},
           CAST(sum(CAST(lr AS DECIMAL(25,6))) AS DOUBLE) > 0 AS selected
    FROM scored GROUP BY doc_id
    """,
)
def q_llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    over hashed unigram features: per document, the log importance
    weight ln(p_target/p_source) summed over its tokens, where both
    distributions are Laplace-smoothed histograms over
    ``md5_int48(token) % 256`` feature buckets. Documents with positive
    weight look more like the target domain (literal 'src0' here — a
    curated-domain stand-in) than the general corpus, the standard
    pretraining-data-selection signal.

    Plan: ONE token explode builds BOTH histograms in a single 256-row
    hash aggregate (target = conditional count over the same grouped
    stream); the ts/tt totals fold from that pinned histogram and ride
    back as a one-row broadcast, so the corpus side never shuffles:
    one tiny hash-agg + one broadcast join + one per-doc aggregate,
    linear at 100 TB. Determinism: the smoothed ratio is
    computed as exact-integer-to-double casts multiplied THEN divided
    (never bigint products that could overflow at corpus scale), ln is
    the single libm op e6-rounded per token (the q_llm_unigram_logprob
    contract), and the per-doc sum is the decimal-sum trick — so the
    driver hash matches DuckDB bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("tok"))
        .select(
            "doc_id",
            "source",
            F.pmod(
                F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long"),
                F.lit(DSIR_BUCKETS),
            ).alias("b"),
        )
    )
    # r16 wave 8: BOTH histograms in ONE tokenize pass (the target
    # side is a conditional count over the same grouped stream), and
    # the ts/tt totals fold from the pinned 256-row histogram instead
    # of two plan-build-time .count() jobs that each re-ran the full
    # explode (the before profile showed 5 tokenize passes; now 2 —
    # the histogram and the per-doc scoring join).
    hist = (
        toks.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("cs"),
            F.count(
                F.when(F.col("source") == DSIR_TARGET_SOURCE, 1)
            ).alias("ct"),
        )
        .localCheckpoint(eager=False)
    )
    tot = hist.agg(
        F.sum("cs").cast("bigint").alias("ts_tot"),
        F.sum("ct").cast("bigint").alias("tt_tot"),
    )
    stats = hist.crossJoin(F.broadcast(tot))

    lr = dround(
        F.log(
            (
                (F.col("ct") + 1).cast("double")
                * (F.col("ts_tot") + DSIR_BUCKETS).cast("double")
            )
            / (
                (F.col("cs") + 1).cast("double")
                * (F.col("tt_tot") + DSIR_BUCKETS).cast("double")
            )
        ),
        6,
    ).alias("lr")
    per_doc = (
        toks.join(F.broadcast(stats), "b")
        .select("doc_id", lr)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            dsum("lr", "dsir_logweight"),
            (F.sum(F.col("lr").cast(DEC)).cast("double") > 0).alias("selected"),
        )
    )
    return per_doc


# --------------------------------------------------------------------------
# CCNet perplexity buckets (head / middle / tail per language)
# --------------------------------------------------------------------------
@register(
    "q_llm_ccnet_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT count(*) AS t FROM toks),
    scored AS (
      SELECT doc_id, lang,
             floor(ln(CAST(t AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000.0
                   + 0.5) / 1000000.0 AS nll
      FROM toks JOIN freq USING (tok) CROSS JOIN tot
    ),
    per_doc AS (
      SELECT doc_id, lang,
             CAST(sum(CAST(nll AS DECIMAL(25,6))) AS DOUBLE) / count(*)
                 AS avg_surprisal
      FROM scored GROUP BY doc_id, lang
    ),
    tiled AS (
      SELECT doc_id, lang, avg_surprisal,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY avg_surprisal, doc_id) AS tile
      FROM per_doc
    )
    SELECT doc_id, lang, avg_surprisal,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS bucket
    FROM tiled
    """,
)
def q_llm_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score each
    document with the corpus-unigram LM surprisal, then split every
    language into head / middle / tail terciles of fluency — the
    standard mixture knob ("train on head+middle, drop tail") of web-
    corpus curation.  The tercile is ntile(3) over (surprisal, doc_id),
    a total order, so assignment is deterministic cross-engine.

    Plan: one vocab-sized hash aggregate broadcast back onto the token
    stream, one per-doc aggregate, then a per-language window.  The
    window's sort is the only per-language serial step; at 100 TB the
    rank would come from a two-pass distributed quantile cut
    (approx thresholds -> map-side bucket label), which this plan
    degrades to without changing the output contract."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = toks.count()
    nll = dround(F.log(F.lit(float(total)) / F.col("c").cast("double")), 6)
    per_doc = (
        toks.join(F.broadcast(freq), "tok")
        .select("doc_id", "lang", nll.alias("nll"))
        .groupBy("doc_id", "lang")
        .agg(davg("nll", "avg_surprisal"))
    )
    w = Window.partitionBy("lang").orderBy("avg_surprisal", "doc_id")
    tile = F.ntile(3).over(w)
    return per_doc.select(
        "doc_id",
        "lang",
        "avg_surprisal",
        F.when(tile == 1, "head")
        .when(tile == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# --------------------------------------------------------------------------
# Temperature-scaled source mixing (UniMax / mT5 alpha sampling)
# --------------------------------------------------------------------------
_MIX_ALPHA = 0.3  # p^alpha; alpha<1 flattens toward uniform


@register(
    "q_llm_temperature_mix",
    oracle=f"""
    WITH per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM per_src),
    shares AS (
      SELECT source, n_docs, n_tokens,
             floor(n_tokens / t * 1000000.0 + 0.5) / 1000000.0 AS p
      FROM per_src CROSS JOIN tot
    ),
    powed AS (
      SELECT source, n_docs, n_tokens, p,
             floor(exp({_MIX_ALPHA} *
                       (floor(ln(p) * 1000000.0 + 0.5) / 1000000.0))
                   * 1000000.0 + 0.5) / 1000000.0 AS p_alpha
      FROM shares
    ),
    norm AS (SELECT CAST(sum(CAST(p_alpha AS DECIMAL(25,6))) AS DOUBLE)
                 AS z FROM powed)
    SELECT source, n_docs, n_tokens, p,
           floor(p_alpha / z * 1000000.0 + 0.5) / 1000000.0 AS mix_weight,
           floor((p_alpha / z) / p * 1000000.0 + 0.5) / 1000000.0
               AS upsample_factor
    FROM powed CROSS JOIN norm
    """,
)
def q_llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing weights (the mT5/UniMax
    multilingual sampling rule): per source, the token share p and the
    renormalized p^alpha sampling weight (alpha = 0.3 flattens the
    distribution so low-resource sources are upsampled), plus the
    realized upsample factor weight/p that a mixture builder applies.

    p^alpha is computed as exp(alpha * ln p) with BOTH intermediate
    libm results e6-rounded — ln and exp are the two primitives already
    proven bit-stable cross-engine in this repo (unigram LM, quality
    classifier); a direct pow() would introduce a third libm surface
    with no such evidence.  Shape: one hash aggregate (|sources| rows),
    then scalar normalization over the aggregated frame — the corpus is
    read once; everything after is O(|sources|)."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    total = float(per_src.agg(F.sum("n_tokens")).first()[0])
    p = dround(F.col("n_tokens") / F.lit(total), 6)
    shares = per_src.withColumn("p", p)
    p_alpha = dround(
        F.exp(F.lit(_MIX_ALPHA) * dround(F.log("p"), 6)), 6
    )
    powed = shares.withColumn("p_alpha", p_alpha)
    z = float(
        powed.agg(F.sum(F.col("p_alpha").cast(DEC)).cast("double")).first()[0]
    )
    return powed.select(
        "source",
        "n_docs",
        "n_tokens",
        "p",
        dround(F.col("p_alpha") / F.lit(z), 6).alias("mix_weight"),
        dround((F.col("p_alpha") / F.lit(z)) / F.col("p"), 6).alias(
            "upsample_factor"
        ),
    )
