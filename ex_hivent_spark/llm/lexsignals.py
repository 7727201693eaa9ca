"""Lexicon- and position-level curation signals over the documents
corpus: blocklist hit rates (the lexicon-filter stage every training
pipeline runs before expensive classifiers — spam/unsafe-term lists)
and positional token novelty (are documents front-loaded — do new
terms stop appearing after the first deciles? — the cheap structure
probe behind "boilerplate tail" detection).

Plan discipline: both are one pass over documents with per-row array
ops (whitespace split, the llm/text.py convention) feeding hash
aggregates; the novelty first-occurrence flag uses a window bounded by
a single document's repetitions of one term — never corpus-sized.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no text surface; these derive from the
driver's training-data mandate (lexicon filtering per the C4/Gopher
blocklist stage; positional novelty per boilerplate-structure audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, spread_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# The audit lexicon (terms from the corpus vocabulary so rates are
# non-trivial at every SF; a production list is just a longer literal
# or a broadcast-joined side table).
_BLOCKLIST = ("slow", "dup", "big")

_SQL_BL = "', '".join(_BLOCKLIST)


@register(
    "q_llm_blocklist_rate",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN ('{_SQL_BL}'))) AS BIGINT)
               AS n_hit
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_hit) AS BIGINT) AS n_hits,
           {sql_dround(
               "1000.0 * sum(n_hit) / sum(n_tok)", 6)} AS hits_per_1k,
           {sql_dround(
               "CAST(sum(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END)"
               " AS DOUBLE) / count(*)", 6)} AS flag_share
    FROM per_doc GROUP BY source
    """,
)
def q_llm_blocklist_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist audit per source: documents containing at least one
    lexicon term, total lexicon hits, hits per 1k tokens, and the
    flagged-document share — the readout that decides whether a source
    gets dropped wholesale or document-filtered (the C4-style
    bad-words stage, run as a cheap array predicate long before any
    model-based quality classifier).

    Plan: one documents scan; the hit count is a per-row higher-order
    array filter (JVM-side, no explode — the token list never leaves
    the row) feeding a per-source hash aggregate. A longer production
    lexicon would broadcast-join a side table instead of the inline
    literal; the shape is unchanged. Determinism: pure integer token
    and hit counts; the two closing ratios are single IEEE divisions,
    e6-rounded."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*_BLOCKLIST))
    ).cast("bigint")
    per_doc = d.select(
        "source",
        F.size(toks).cast("bigint").alias("n_tok"),
        hits.alias("n_hit"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_hit") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("n_hit").cast("bigint").alias("n_hits"),
        dround(1000.0 * F.sum("n_hit") / F.sum("n_tok"), 6).alias(
            "hits_per_1k"
        ),
        dround(
            F.sum(F.when(F.col("n_hit") > 0, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("flag_share"),
    )


@register(
    "q_llm_position_bias",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             unnest(string_split(text, ' ')) AS term,
             CAST(unnest(range(len(string_split(text, ' '))))
                  AS BIGINT) AS pos
      FROM documents
    ),
    flagged AS (
      SELECT doc_id, term, pos, n,
             CASE WHEN row_number() OVER (PARTITION BY doc_id, term
                                          ORDER BY pos) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM toks
    )
    SELECT CAST(pos * 10 // n AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(is_first) AS BIGINT) AS n_first,
           floor((CAST(sum(is_first) AS DOUBLE) / count(*)) * 1000000.0
                 + 0.5) / 1000000.0 AS novelty_rate
    FROM flagged
    GROUP BY CAST(pos * 10 // n AS INT)
    """,
)
def q_llm_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional token novelty over the corpus: tokens bucketed into
    position deciles within their document, and per decile the share
    that is the FIRST occurrence of its term in that document. A
    healthy prose-like profile decays smoothly (new vocabulary keeps
    arriving); a cliff after decile 0 flags template/boilerplate
    bodies whose tail repeats the head — structure the bag-of-words
    quality scores (q_llm_text_stats, q_llm_mattr_diversity) cannot
    see because they ignore position.

    Plan: one documents scan posexploded to (doc, term, pos); the
    first-occurrence flag is a row_number over the (doc_id, term)
    partition — bounded by one document's repetitions of one term —
    and the decile rollup is a 10-row hash aggregate. Determinism:
    the decile is exact integer arithmetic (pos·10 div n), counts are
    integers, the closing share is one IEEE division e6-rounded.
    r16: spread_table parallelizes the posexplode map side (one-task
    single-row-group scan otherwise); HashPartitioning(doc_id) also
    satisfies the (doc_id, term) window clustering, so the windowed
    token stream never re-shuffles."""
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    ).select(
        "doc_id", "n", "term", F.col("pos").cast("bigint").alias("pos")
    )
    w = Window.partitionBy("doc_id", "term").orderBy("pos")
    flagged = toks.select(
        "doc_id",
        "term",
        "pos",
        "n",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias(
            "is_first"
        ),
    )
    decile = ((F.col("pos") * 10) / F.col("n")).cast("bigint").cast("int")
    return flagged.groupBy(decile.alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("is_first").cast("bigint").alias("n_first"),
        dround(
            F.sum("is_first").cast("double") / F.count(F.lit(1)), 6
        ).alias("novelty_rate"),
    )


# RRF probe terms (the q_llm_bm25_topk query set) and the standard
# fusion constant.
_RRF_TERMS = ("join", "stream", "filter")
_RRF_K = 60
_RRF_TOP = 10
# Prefix-fold block widths: probe-term hits and distinct-token counts
# are small integers, so value-grid blocks stay tiny at any scale.
_RRF_BLOCK = 5.0

_RRF_SQL_TERMS = "', '".join(_RRF_TERMS)


@register(
    "q_llm_rrf_fusion",
    oracle=f"""
    WITH cand AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN ('{_RRF_SQL_TERMS}')))
                  AS BIGINT) AS hits,
             CAST(len(list_distinct(string_split(text, ' ')))
                  AS BIGINT) AS n_vocab
      FROM documents
      WHERE len(list_filter(string_split(text, ' '),
                            t -> t IN ('{_RRF_SQL_TERMS}'))) > 0
    ),
    ranked AS (
      SELECT doc_id, hits, n_vocab,
             row_number() OVER (ORDER BY hits DESC, doc_id) AS r_rel,
             row_number() OVER (ORDER BY n_vocab DESC, doc_id) AS r_rich
      FROM cand
    ),
    fused AS (
      SELECT doc_id, hits, n_vocab,
             CAST(r_rel AS BIGINT) AS r_rel,
             CAST(r_rich AS BIGINT) AS r_rich,
             {sql_dround(
                 f"1.0 / ({_RRF_K} + r_rel) + 1.0 / ({_RRF_K} + r_rich)",
                 6)} AS rrf
      FROM ranked
    )
    SELECT doc_id, hits, n_vocab, r_rel, r_rich, rrf
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {_RRF_TOP}
    """,
)
def q_llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two document rankings — the standard
    way to combine retrieval signals without score calibration: each
    candidate (a doc containing ≥1 probe term) is ranked by probe-term
    relevance (hit count) and by lexical richness (distinct vocabulary)
    and fused as Σ 1/(60 + rank); the top-10 by fused score is the
    "relevant AND substantive" training-data selection a RAG/data-
    curation pipeline makes from BM25 + quality signals (the two
    metrics here are deliberately integer-exact so the op pins the
    FUSION machinery, not float calibration).

    Plan: one documents scan computes both per-row metrics as
    higher-order array ops (no explode); each global rank comes from
    the DETERMINISTIC blocked prefix fold (operators/prefix.py — the
    q_agg_rfm_scores discipline: value-grid blocks + doc_id
    tie-breaks, NO global row_number window); the fused top-10 is a
    TakeOrdered. Determinism: integer metrics and ranks; the fused
    score is two IEEE divisions of integers, e6-rounded."""
    from ex_hivent_spark.operators.prefix import running_totals_blocked

    # r16: A/B-tested spread_table here and REVERTED (1.30 plain vs
    # 1.52 spread median) — both per-row metrics flow straight into
    # few-key aggregates/prefix folds, so the scan-task partial
    # aggregate already reduces the data; the doc_id repartition only
    # added an exchange.
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    hits = F.size(F.filter(toks, lambda t: t.isin(*_RRF_TERMS))).cast(
        "bigint"
    )
    cand = (
        d.select(
            "doc_id",
            hits.alias("hits"),
            F.size(F.array_distinct(toks)).cast("bigint").alias("n_vocab"),
        )
        .filter(F.col("hits") > 0)
        .localCheckpoint(eager=False)  # two rank folds + the final join
        # fan out from this one candidate frame
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))

    def rank_desc(metric: str, out: str) -> DataFrame:
        """Descending dense-free unique rank via the ascending blocked
        prefix fold: rank_desc = n_cand + 1 - rank_asc, where the
        ascending order is (metric, -doc_id) so that descending ties
        break doc_id-ascending."""
        blocked = cand.select(
            "doc_id",
            metric,
            (-F.col("doc_id")).alias("neg_id"),
            F.floor(F.col(metric) / F.lit(_RRF_BLOCK)).alias("blk"),
            F.lit(1).cast("bigint").alias("one"),
        )
        ranked = running_totals_blocked(
            blocked,
            order_cols=[metric, "neg_id"],
            block_cols=["blk"],
            sum_cols={"one": "rnk"},
        )
        return ranked.crossJoin(F.broadcast(n_cand)).select(
            "doc_id",
            (F.col("n_cand") + 1 - F.col("rnk")).cast("bigint").alias(out),
        )

    r_rel = rank_desc("hits", "r_rel")
    r_rich = rank_desc("n_vocab", "r_rich")
    fused = (
        cand.join(r_rel, "doc_id")
        .join(r_rich, "doc_id")
        .select(
            "doc_id",
            "hits",
            "n_vocab",
            "r_rel",
            "r_rich",
            dround(
                1.0 / (_RRF_K + F.col("r_rel"))
                + 1.0 / (_RRF_K + F.col("r_rich")),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(_RRF_TOP)


@register(
    "q_llm_yule_k",
    oracle=f"""
    WITH tf AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS m
      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY source, tok
    ),
    g AS (
      SELECT source,
             CAST(sum(m) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS v,
             CAST(sum(m * m) AS BIGINT) AS smm
      FROM tf GROUP BY source
    )
    SELECT source, n AS n_tokens, v AS vocab,
           {sql_dround(
               "10000.0 * (CAST(smm AS DOUBLE) - n)"
               " / (CAST(n AS DOUBLE) * n)", 6)} AS yule_k,
           {sql_dround("CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE))",
                       6)} AS guiraud_r,
           CASE WHEN n <= 1 THEN NULL ELSE
             {sql_dround(
                 "(" + sql_dround("ln(CAST(v AS DOUBLE))", 6)
                 + ") / ("
                 + sql_dround("ln(CAST(n AS DOUBLE))", 6) + ")", 6)}
           END AS herdan_c
    FROM g
    """,
)
def q_llm_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness battery per source: Yule's K = 10⁴·(Σm²−N)/N²
    over the term-frequency spectrum (repeat-rate of tokens — high K
    means a few terms dominate, the boilerplate/template signal),
    Guiraud's R = V/√N and Herdan's C = ln V / ln N (size-adjusted
    vocabulary growth — LOW R/C flags sources whose vocabulary stopped
    growing, the classic synthetic/spun-text tell). The trio is the
    lexical-richness cut a corpus audit runs next to q_llm_mattr_diversity
    (windowed TTR) — these close from the frequency SPECTRUM, so they
    are one aggregate, not a sliding scan.

    Plan: whitespace tokenize → (source, token) hash aggregate (the
    corpus-sized shuffle, combiner-friendly) → per-source moment
    aggregate (≤|sources| rows). Determinism: N, V, Σm² are exact
    BIGINTs (Σm² stays < 2⁵³ until a single source×token count nears
    3e7 repeats of one term — document-bounded far below that); K's
    closing is an IEEE chain of those integers e6-rounded; sqrt is
    IEEE-correctly-rounded (identical both engines) and the two ln
    calls are e6-rounded before their ratio (the libm discipline);
    single-token degenerate sources read NULL C on both engines."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    g = tf.groupBy("source").agg(
        F.sum("m").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("smm"),
    )
    n_d = F.col("n").cast("double")
    v_d = F.col("v").cast("double")
    ln_v = dround(F.log(v_d), 6)
    ln_n = dround(F.log(n_d), 6)
    return g.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("vocab"),
        dround(
            10000.0 * (F.col("smm").cast("double") - F.col("n")) / (n_d * F.col("n")),
            6,
        ).alias("yule_k"),
        dround(v_d / F.sqrt(n_d), 6).alias("guiraud_r"),
        F.when(F.col("n") <= 1, F.lit(None).cast("double"))
        .otherwise(dround(ln_v / ln_n, 6))
        .alias("herdan_c"),
    )


@register(
    "q_llm_vocab_gini",
    oracle=f"""
    WITH tf AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS m
      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY source, tok
    ),
    rk AS (
      SELECT source, m,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY m, tok) AS BIGINT) AS i
      FROM tf
    ),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS v,
             CAST(sum(m) AS BIGINT) AS t,
             CAST(sum(i * m) AS BIGINT) AS s
      FROM rk GROUP BY source
    )
    SELECT source, v AS vocab, t AS n_tokens,
           {sql_dround(
               "(2.0 * CAST(s AS DOUBLE)"
               " - (CAST(v AS DOUBLE) + 1.0) * t)"
               " / (CAST(v AS DOUBLE) * t)", 6)} AS gini
    FROM g
    """,
)
def q_llm_vocab_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-usage Gini coefficient per source: with the V
    distinct tokens sorted by ascending frequency (token-spelling
    tiebreak — a total order, so the rank sum is well-defined), G =
    (2·Σi·mᵢ − (V+1)·N) / (V·N) — 0 means every token is used equally,
    →1 means a handful of terms carry the corpus. The inequality
    summary of the q_llm_zipf_fit power law and the vocabulary twin of
    q_llm_length_gini (which measures document-LENGTH inequality).

    Plan: whitespace tokenize → (source, token) hash aggregate (the
    corpus-sized shuffle), rank window partitioned BY SOURCE (one task
    per source holds its vocabulary — bounded by vocabulary size, not
    corpus size; a >10⁷-term vocabulary would move to the blocked
    prefix fold), one per-source moment aggregate. Determinism: ranks
    are exact integers from an unambiguous total order; Σi·mᵢ is an
    exact BIGINT (per-row product ≤ V·max-count ≪ 2⁶³); the single
    closing casts the integer moments to DOUBLE first (the granger
    discipline) and e6-rounds."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    wr = Window.partitionBy("source").orderBy("m", "tok")
    rk = tf.select(
        "source", "m", F.row_number().over(wr).cast("bigint").alias("i")
    )
    g = rk.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum("m").cast("bigint").alias("t"),
        F.sum(F.col("i") * F.col("m")).cast("bigint").alias("s"),
    )
    vd = F.col("v").cast("double")
    return g.select(
        "source",
        F.col("v").alias("vocab"),
        F.col("t").alias("n_tokens"),
        dround(
            (2.0 * F.col("s").cast("double") - (vd + 1.0) * F.col("t"))
            / (vd * F.col("t")),
            6,
        ).alias("gini"),
    )


@register(
    "q_llm_hapax_profile",
    oracle=f"""
    WITH tf AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS m
      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY source, tok
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(m) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS v1,
           CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS v2,
           {sql_dround(
               "CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END)"
               " AS DOUBLE) / count(*)", 6)} AS hapax_vocab_share,
           {sql_dround(
               "CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END)"
               " AS DOUBLE) / sum(m)", 6)} AS hapax_token_share
    FROM tf GROUP BY source
    """,
)
def q_llm_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax/dis-legomena profile per source: the count of once-seen
    (V₁) and twice-seen (V₂) vocabulary terms and the hapax shares of
    vocabulary and of token mass — the head of the frequency spectrum
    behind q_llm_good_turing's mass estimates and the growth side of
    the q_llm_yule_k repeat-rate (a crawl whose V₁/V collapses has
    stopped discovering language; one whose V₁/N explodes is likely
    OCR noise or ID spam).

    Plan: whitespace tokenize → (source, token) hash aggregate (the
    corpus-sized shuffle, combiner-friendly) → one spectrum fold to
    ≤|sources| rows. Determinism: every count is an exact BIGINT; the
    two closing shares cast one integer to DOUBLE and e6-round."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    v1 = F.sum(F.when(F.col("m") == 1, 1).otherwise(0))
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("m").cast("bigint").alias("n_tokens"),
        v1.cast("bigint").alias("v1"),
        F.sum(F.when(F.col("m") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("v2"),
        dround(v1.cast("double") / F.count(F.lit(1)), 6).alias(
            "hapax_vocab_share"
        ),
        dround(v1.cast("double") / F.sum("m"), 6).alias(
            "hapax_token_share"
        ),
    )


@register(
    "q_llm_token_len_profile",
    oracle=f"""
    WITH toks AS (
      SELECT source, len(tok) AS tok_len
      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
    ),
    g AS (
      SELECT source, CAST(tok_len AS BIGINT) AS tok_len,
             CAST(count(*) AS BIGINT) AS n_toks
      FROM toks GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(sum(n_toks) AS BIGINT) AS n,
             CAST(sum(tok_len * n_toks) AS BIGINT) AS s
      FROM g GROUP BY source
    )
    SELECT g.source, g.tok_len, g.n_toks,
           {sql_dround(
               "CAST(g.n_toks AS DOUBLE) / tot.n", 6)} AS share,
           {sql_dround(
               "CAST(tot.s AS DOUBLE) / tot.n", 6)} AS mean_len
    FROM g JOIN tot ON g.source = tot.source
    """,
)
def q_llm_token_len_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length profile per source: the word-length histogram
    (count + share per character length, mean length carried on every
    row for one-pass reading) — the cheapest morphology fingerprint
    there is: OCR noise fattens length 1-2, URL/ID contamination grows
    a >20 tail, and a mean-length drift between crawls flags a
    tokenizer or boilerplate change before any model-based score
    moves. Complements q_llm_char_class_profile (which classes
    CHARACTERS; this measures WORD shapes).

    Plan: whitespace tokenize → (source, length) hash aggregate (the
    corpus-sized shuffle collapses to ≤|sources|·max-len rows), per-
    source totals joined back broadcastable. Determinism: lengths and
    counts are exact BIGINTs (Σ len·count < 2⁵³ until ~10¹⁵ chars per
    source); the two closings are single IEEE divisions e6-rounded."""
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select(
            "source",
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .select("source", F.length("tok").cast("bigint").alias("tok_len"))
        .groupBy("source", "tok_len")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_toks"))
    )
    tot = g.groupBy(F.col("source").alias("ts")).agg(
        F.sum("n_toks").cast("bigint").alias("n"),
        F.sum(F.col("tok_len") * F.col("n_toks"))
        .cast("bigint")
        .alias("s"),
    )
    j = g.join(F.broadcast(tot), F.col("source") == F.col("ts"))
    return j.select(
        "source",
        "tok_len",
        "n_toks",
        dround(F.col("n_toks").cast("double") / F.col("n"), 6).alias(
            "share"
        ),
        dround(F.col("s").cast("double") / F.col("n"), 6).alias(
            "mean_len"
        ),
    )


# Burrows' Delta panel size: the K most frequent corpus terms
# (classic stylometry uses 30-150 MFW; 20 keeps the per-pair panel
# trivially broadcastable at any corpus scale).
_DELTA_TOP_K = 20


@register(
    "q_llm_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    stot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_tok
      FROM toks GROUP BY source
    ),
    tf AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, term
    ),
    top AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY sum(c) DESC, term) AS rn
        FROM tf GROUP BY term
      ) WHERE rn <= {_DELTA_TOP_K}
    ),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM stot),
    f AS (
      SELECT s.source, t.term,
             {sql_dround(
                 "coalesce(tf.c, 0) * 1000000.0 / s.n_tok", 6)} AS fr
      FROM stot s CROSS JOIN top t
      LEFT JOIN tf ON tf.source = s.source AND tf.term = t.term
    ),
    mo AS (
      SELECT term,
             CAST(sum(CAST(fr AS DECIMAL(25,6))) AS DOUBLE) AS sf,
             CAST(sum(CAST({sql_dround("fr * fr", 6)}
                           AS DECIMAL(38,6))) AS DOUBLE) AS sff
      FROM f GROUP BY term
    ),
    z AS (
      SELECT f.source, f.term,
             CASE WHEN (mo.sff - mo.sf * mo.sf / ns.k) / ns.k <= 0
                    OR ({sql_dround(
                        "sqrt((mo.sff - mo.sf * mo.sf / ns.k) / ns.k)",
                        6)}) <= 0
                  THEN 0.0
                  ELSE {sql_dround(
                      "(f.fr - mo.sf / ns.k) / ("
                      + sql_dround(
                          "sqrt((mo.sff - mo.sf * mo.sf / ns.k) / ns.k)",
                          6) + ")", 6)}
             END AS z
      FROM f JOIN mo USING (term) CROSS JOIN ns
    )
    SELECT a.source AS source_a, b.source AS source_b,
           {sql_dround(
               "CAST(sum(CAST(" + sql_dround("abs(a.z - b.z)", 6)
               + f" AS DECIMAL(25,6))) AS DOUBLE) / {_DELTA_TOP_K}",
               6)} AS delta
    FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def q_llm_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between every source pair:
    for the {_DELTA_TOP_K} most frequent corpus terms, each source's
    term rate (per million tokens) is z-scored across sources, and
    Δ(a,b) = mean |z_a − z_b| over the panel — THE authorship /
    style-drift measure (two crawls of the same template family score
    near 0; a source whose function-word profile diverges stands
    out). Complements the content-level q_llm_jsd_sources (JSD reads
    topic mix; Delta reads style via the most-COMMON words).

    Plan: one token explode feeds the per-source totals, the
    per-(source, term) counts, and the top-K pick (TakeOrdered over the
    |vocab|-row aggregate — distributed partial top-Ks, no global
    window); the z panel is |sources|×K rows — tiny at
    any scale — and the pair join is over the K-row term key with an
    a<b filter (|sources|² pairs of scalars, never documents).
    Determinism: rates are e6-rounded per-million ratios (integer
    counts / integer totals); the cross-source moment sums ride the
    decimal detour; the population sd e6-rounds its sqrt; a
    zero-variance term contributes z = 0 on both sides (documented
    degenerate branch); the final mean divides by the K literal and
    e6-rounds."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    )
    stot = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )  # wave-9 pin A/B-tested and REVERTED (wash-to-slower: the
    # duplicated tokenize subtrees overlap within one job)
    tf = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # feeds top-K and the rate panel
    # top-K via orderBy+limit (TakeOrderedAndProject — distributed
    # partial top-Ks, no global window over the |vocab|-row frame)
    top = (
        tf.groupBy("term")
        .agg(F.sum("c").cast("bigint").alias("tc"))
        .orderBy(F.col("tc").desc(), "term")
        .limit(_DELTA_TOP_K)
        .select("term")
    )
    ns = stot.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    f = (
        stot.crossJoin(F.broadcast(top))
        .join(tf, ["source", "term"], "left")
        .select(
            "source",
            "term",
            dround(
                F.coalesce(F.col("c"), F.lit(0)) * 1000000.0
                / F.col("n_tok"),
                6,
            ).alias("fr"),
        )
    )
    mo = f.groupBy("term").agg(
        F.sum(F.col("fr").cast("decimal(25,6)")).cast("double").alias("sf"),
        F.sum(dround(F.col("fr") * F.col("fr"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sff"),
    )
    var = (F.col("sff") - F.col("sf") * F.col("sf") / F.col("k")) / F.col(
        "k"
    )
    # Guard on the ROUNDED sd, not just var: dround(sqrt(var), 6)
    # collapses to 0.0 for 0 < var < 2.5e-13 (reachable on the e6 fr
    # grid), and dividing by a rounded-to-zero sd hits engine-specific
    # divide-by-zero semantics (Spark ANSI error/NULL vs DuckDB IEEE).
    sd = dround(F.sqrt(var), 6)
    z = (
        f.join(F.broadcast(mo), "term")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "term",
            F.when((var <= 0) | (sd <= 0), F.lit(0.0))
            .otherwise(
                dround(
                    (F.col("fr") - F.col("sf") / F.col("k")) / sd,
                    6,
                )
            )
            .alias("z"),
        )
    )
    za = z.select(
        F.col("source").alias("source_a"), "term", F.col("z").alias("za")
    )
    zb = z.select(
        F.col("source").alias("source_b"), "term", F.col("z").alias("zb")
    )
    pairs = za.join(zb, "term").filter(F.col("source_a") < F.col("source_b"))
    return pairs.groupBy("source_a", "source_b").agg(
        dround(
            F.sum(
                dround(F.abs(F.col("za") - F.col("zb")), 6).cast(
                    "decimal(25,6)"
                )
            ).cast("double")
            / _DELTA_TOP_K,
            6,
        ).alias("delta")
    )
