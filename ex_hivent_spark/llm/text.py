"""LLM-pipeline text analysis: corpus statistics, quality scoring,
language-ID heuristic, token counting, and document fingerprinting.

All built-in string/array expressions — codegen'd, no Python in the row
path. Quality/language scores are deterministic rule-based heuristics
(the container has no ML libs; the operator shape — per-doc scores
produced scalably — is what matters at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, spread_table
from ex_hivent_spark.functions.decimals import davg, dround, sql_davg, sql_dround
from ex_hivent_spark.functions.letbind import let1
from ex_hivent_spark.plans.registry import register

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish splitting on punctuation too
    would use the same regex-split shape)."""
    return F.size(F.split(text, r"\s+"))


_TOK = r"len(string_split_regex(text, '\s+'))"

@register(
    "q_llm_text_stats",
    oracle=(
        "SELECT lang, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars, "
        f"CAST(sum({_TOK}) AS DOUBLE) / count(*) AS avg_tokens, "
        + sql_davg(f"length(text) / {_TOK}", "avg_token_len")
        + " FROM documents GROUP BY lang"
    ),
)
def q_llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: doc count, avg chars, avg tokens,
    avg chars-per-token. Integer sums are exact; the one float mean goes
    through decimal summation."""
    d = load_table(spark, sf_dir, "documents")
    ntok = token_count(F.col("text"))
    chars_per_tok = F.length("text") / ntok
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        (F.sum(ntok).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        (
            F.sum(chars_per_tok.cast("decimal(25,6)")).cast("double")
            / F.count(chars_per_tok)
        ).alias("avg_token_len"),
    )


@register(
    "q_llm_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual,
           floor((CAST(len(list_filter(string_split_regex(text, '\\s+'),
                     t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
                     AS DOUBLE)
                 / len(string_split_regex(text, '\\s+'))) * 10000.0 + 0.5)
               / 10000.0 AS stopword_ratio,
           CASE WHEN len(string_split_regex(text, '\\s+')) BETWEEN 20 AND 1000
                THEN 1 ELSE 0 END AS length_ok
    FROM documents
    """,
)
def q_llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality signals: token count, char count, stopword ratio,
    length gate — the standard cheap pre-filters of a training-data
    pipeline."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    ntok = F.size(toks)
    return d.select(
        "doc_id",
        ntok.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        dround(n_stop.cast("double") / ntok, 4).alias("stopword_ratio"),
        F.when((ntok >= 20) & (ntok <= 1000), 1).otherwise(0).alias("length_ok"),
    )


LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "zh": ("zh",),
}

# SQL twin of langid_best(): the same struct-max argmax as a DuckDB
# list_aggregate over {'score', 'lang'} structs.
LANGID_BEST_SQL = """
        list_aggregate([
          {'score': len(list_intersect(t, ['the','and','of'])), 'lang': 'en'},
          {'score': len(list_intersect(t, ['el','la','de'])),  'lang': 'es'},
          {'score': len(list_intersect(t, ['der','die','und'])),'lang': 'de'},
          {'score': len(list_intersect(t, ['le','la','et'])),  'lang': 'fr'},
          {'score': len(list_intersect(t, ['zh'])),            'lang': 'zh'}
        ], 'max')"""


def langid_best() -> Column:
    """The language-ID argmax as a Column over a ``text`` field: marker
    overlap scores per language, struct-lexicographic max on
    (score, lang) — the deterministic tie-break shared with the SQL
    twin (LANGID_BEST_SQL). Used by q_llm_lang_id and the confusion
    matrix; factored so the heuristic cannot drift between its
    consumers."""
    toks = F.array_distinct(F.split(F.lower("text"), r"\s+"))
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        toks, F.array(*[F.lit(t) for t in ts])
                    )
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, ts in LANG_MARKERS.items()
        ]
    )
    return F.array_max(scores)


@register(
    "q_llm_lang_id",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(string_split_regex(lower(text), '\\s+')) AS t
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
        list_aggregate([
          {'score': len(list_intersect(t, ['the','and','of'])), 'lang': 'en'},
          {'score': len(list_intersect(t, ['el','la','de'])),  'lang': 'es'},
          {'score': len(list_intersect(t, ['der','die','und'])),'lang': 'de'},
          {'score': len(list_intersect(t, ['le','la','et'])),  'lang': 'fr'},
          {'score': len(list_intersect(t, ['zh'])),            'lang': 'zh'}
        ], 'max') AS best
      FROM toks
    )
    SELECT doc_id, lang AS declared_lang, best.lang AS predicted_lang,
           best.lang = lang AS agrees
    FROM scored
    """,
)
def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: score each doc against per-language marker
    token sets (deterministic n-gram-style heuristic; a real model would
    slot into the same mapInPandas shape). Output: doc_id, declared lang,
    predicted lang, agreement flag. The argmax tie-break is the struct
    lexicographic max on (score, lang) — identical on both engines, so
    the heuristic is fully hash-checked."""
    d = load_table(spark, sf_dir, "documents")
    best = langid_best()
    return d.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        best["lang"].alias("predicted_lang"),
        (best["lang"] == F.col("lang")).alias("agrees"),
    )


@register(
    "q_llm_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_md5,
           substring(md5(text), 1, 8) AS short_fp
    FROM documents
    """,
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full md5 + truncated fingerprint (rolling
    hash families live in llm/dedup.py as shingle hashes)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.substring(F.md5("text"), 1, 8).alias("short_fp"),
    )


# GPT-2-style pre-tokenizer shape: letter runs | single digits |
# punctuation runs. Same pattern string in both engines (RE2/Java
# agree on this subset — no lookarounds).
_BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"


@register(
    "q_llm_bpe_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+'))
                AS INTEGER) AS n_bpe_tokens,
           CAST(len(list_distinct(
                regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+')))
                AS INTEGER) AS n_unique_tokens
    FROM documents
    """,
)
def q_llm_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-pre-tokenizer-style regex (letter
    runs / digits / punctuation runs) extracted wholly JVM-side with
    ``regexp_extract_all`` — the exact-count twin of the whitespace
    tokenizer, hash-checked against the same regex in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


@register(
    "q_llm_repetition_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                            i -> array_to_string(t[i:i+1], ' ')) AS g
      FROM toks
    )
    SELECT doc_id, lang,
           CAST(len(g) AS BIGINT) AS n_2grams,
           CAST(len(list_distinct(g)) AS BIGINT) AS n_unique_2grams,
           1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
               AS dup_2gram_frac
    FROM grams
    """,
)
def q_llm_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (the Gopher/MassiveText-style filter):
    fraction of duplicated token 2-grams per document. High values mark
    boilerplate/templated text for exclusion from training sets. Pure
    integer ratio — hash-exact, map-only, codegen'd.

    r16 wave 10: spread_table — map-only gram building over the
    one-task scan (the variant_json pattern, §2.5)."""
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    # let-bound twice (functions/letbind.py): the gram array is
    # referenced by three projection fields and codegen does not CSE
    # across HOF-produced subtrees, so unbound it (and its inner
    # split) would be rebuilt per reference. stats is a per-row struct
    # built from ONE gram pass.
    grams = let1(
        F.split("text", " "),
        lambda tokens: F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(tokens) - 1, F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, 2)),
        ),
    )
    stats = let1(
        grams,
        lambda g: F.struct(
            F.size(g).cast("bigint").alias("n"),
            F.size(F.array_distinct(g)).cast("bigint").alias("u"),
        ),
    )
    return d.select(
        "doc_id",
        "lang",
        stats["n"].alias("n_2grams"),
        stats["u"].alias("n_unique_2grams"),
        (
            1.0 - stats["u"].cast("double") / stats["n"]
        ).alias("dup_2gram_frac"),
    )


@register(
    "q_llm_char_entropy",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, unnest(list_transform(range(1, len(text) + 1),
                                           i -> text[i:i])) AS ch
      FROM documents
    ),
    freq AS (
      SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
           {sql_dround(
               "log2(CAST(sum(c) AS DOUBLE))"
               " - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))"
               " / sum(c)", 6)} AS char_entropy
    FROM freq GROUP BY doc_id
    """,
)
def q_llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document — the cheap
    perplexity proxy for garbage detection (base64 blobs, key-mash, and
    repeated-char padding score far from natural-language entropy).
    Uses the identity H = log2(n) - (Σ c·log2 c)/n so one explode + two
    keyed aggregations suffice (no per-doc window); rounded to 1e-6
    because log2 is correctly-rounded on neither JVM nor libm.

    The char array comes from a codegen'd empty-pattern regex split
    (one JVM call per row) rather than transform(sequence, substring):
    HOF lambdas evaluate interpreted per ELEMENT, which made the
    per-character map the dominant cost (the r11 anchor measured this
    query 3.6x its DuckDB oracle at sf0.1 — the explode itself is
    cheap). The empty-text edge (split('','') -> ['']) is filtered;
    1-char outputs can never be ''."""
    # r16 wave 9: spread_table — the per-CHARACTER explode is the
    # heaviest map fan-out in the text family and collapses to
    # (doc, char) keys in the partial aggregate; it ran single-task
    # (the dedup-family spread pattern, §2.5).
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    chars = d.select(
        "doc_id",
        F.explode(F.split("text", "")).alias("ch"),
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    c = F.col("c").cast("double")
    return freq.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        dround(
            F.log2(F.sum("c").cast("double"))
            - F.sum(c * F.log2(c)) / F.sum("c"),
            6,
        ).alias("char_entropy"),
    )


@register(
    "q_llm_tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tfc AS (
      SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tfc GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tfc.doc_id, tfc.term,
             tfc.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score
      FROM tfc JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, {sql_dround("score", 6)} AS tfidf_e6, rn
    FROM ranked WHERE rn <= 3
    """,
)
def q_llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document under
    smoothed idf = ln((N+1)/(df+1)) + 1 (the sklearn formulation).
    Three keyed aggregations + one broadcast-scalar join; the doc-freq
    side is |vocab| rows — tiny next to the corpus, so the join
    broadcast-resolves at any scale. Scores e6-rounded (ln is the only
    non-exact step)."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # one scalar; reused as a literal

    terms = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tfc = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tfc.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tfc.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        (
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0)
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", dround(F.col("score"), 6).alias("tfidf_e6"), "rn")
    )


@register(
    "q_llm_bpe_merge_counts",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    pairs AS (
      SELECT tok, unnest(range(1, len(tok))) AS i FROM toks WHERE len(tok) >= 2
    )
    SELECT tok[i:i+1] AS merge_pair, count(*) AS n_occurrences
    FROM pairs
    GROUP BY 1
    ORDER BY n_occurrences DESC, merge_pair
    LIMIT 50
    """,
)
def q_llm_bpe_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, round one: count every adjacent
    character pair inside tokens and rank the top-50 merge candidates —
    the inner loop of byte-pair-encoding training, as one explode +
    hash aggregate + TakeOrdered (deterministic tie-break on the pair).
    At 100 TB this is the exact shape each BPE merge iteration runs."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.substring(F.col("tok"), i, F.lit(2)),
            )
        ).alias("merge_pair")
    )
    return (
        pairs.groupBy("merge_pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "merge_pair")
        .limit(50)
    )


@register(
    "q_llm_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT count(*) AS t FROM toks),
    scored AS (
      SELECT doc_id,
             {sql_dround("ln(CAST(t AS DOUBLE) / CAST(c AS DOUBLE))", 6)}
                 AS nll
      FROM toks JOIN freq USING (tok) CROSS JOIN tot
    )
    SELECT doc_id, count(*) AS n_tokens,
           {sql_davg("nll", "avg_surprisal")}
    FROM scored GROUP BY doc_id
    """,
)
def q_llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (the CCNet / KenLM-style
    perplexity filter, with the corpus itself as the LM): per document,
    the mean token surprisal ``-ln p(w) = ln(total/freq)`` under the
    corpus unigram distribution. Low = repetitive/common boilerplate,
    high = rare-token noise; the standard mid-band keep rule.

    Two corpus passes: one hash aggregate for the |vocab|-row frequency
    table (tiny → broadcast back to the token stream, no shuffle of the
    corpus side), one per-doc aggregate. ``ln`` is the single libm op —
    e6-rounded per token, then decimal-summed, so the driver hash
    matches DuckDB exactly.

    r17: the corpus token total was a plan-build ``toks.count()`` — a
    FULL extra tokenize+explode job before execution even started (the
    exact antipattern r16 removed from bigram/dsir/basket_event_lift).
    Now it is a per-doc ``size(split(...))`` sum — one scan, no explode,
    no shuffle of the token stream — riding as a one-row broadcast
    crossJoin. Same numeric value (token count is integer-exact in a
    double), same e6-rounded nll."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = d.select(
        F.coalesce(F.size(F.split("text", " ")), F.lit(0)).alias("n")
    ).agg(F.sum("n").cast("double").alias("t_total"))

    nll = dround(
        F.log(F.col("t_total") / F.col("c").cast("double")), 6
    ).alias("nll")
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", nll)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), davg("nll", "avg_surprisal"))
    )


# Literal linear-model weights for the quality classifier: intercept +
# (stopword_ratio, mean_token_len, digit_ratio, log-length) coefficients.
# Stand-ins for a trained fasttext/logreg export — the *serving plan*
# (feature extraction + literal dot + sigmoid) is identical either way.
_QC_W0 = -1.5
_QC_W = (4.0, 0.25, -6.0, 0.35)


@register(
    "q_llm_quality_classifier",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS ntok,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                  t -> list_contains(['the','a','of','and','to','in','is','it'],
                                     t))) AS DOUBLE) AS nstop,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                 AS nchar,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 AS ndigit
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             {_QC_W0} + {_QC_W[0]} * (nstop / ntok)
                      + {_QC_W[1]} * (nchar / ntok)
                      + {_QC_W[2]} * (ndigit / nchar)
                      + {_QC_W[3]} * ln(ntok) AS z
      FROM feat
    )
    SELECT doc_id, lang,
           {sql_dround("1.0 / (1.0 + exp(-(floor(z * 1000000.0 + 0.5) / 1000000.0)))", 6)}
               AS quality_p,
           floor(1.0 / (1.0 + exp(-(floor(z * 1000000.0 + 0.5) / 1000000.0)))
                 * 1000000.0 + 0.5) / 1000000.0 >= 0.5 AS keep
    FROM scored
    """,
)
def q_llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the GPT-3/LLaMA-pipeline step after
    the cheap heuristics): a linear classifier over engineered features
    — stopword ratio, mean token length, digit ratio, log token count —
    with literal exported weights, sigmoid-calibrated, thresholded at
    0.5 into a keep decision.  In production the weight vector comes
    from a trained fasttext/logreg export; the serving plan is the same
    literal-constant dot product, entirely in codegen — no model server
    round-trip, no Python in the hot path.

    Determinism: per-row feature arithmetic is IEEE-identical in both
    engines; the logit is e6-rounded BEFORE the transcendental exp()
    (libm last-ulp drift is the one non-portable step), then the
    probability is e6-rounded again and the keep decision derives from
    the rounded value — bit-exact across engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    ntok = F.size(toks).cast("double")
    nstop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    )
    nchar = F.length(F.regexp_replace("text", r"\s", "")).cast("double")
    ndigit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
    z = (
        F.lit(_QC_W0)
        + _QC_W[0] * (nstop / ntok)
        + _QC_W[1] * (nchar / ntok)
        + _QC_W[2] * (ndigit / nchar)
        + _QC_W[3] * F.log(ntok)
    )
    z6 = F.floor(z * 1000000.0 + F.lit(0.5)) / 1000000.0
    p = dround(1.0 / (1.0 + F.exp(-z6)), 6)
    return d.select(
        "doc_id",
        "lang",
        p.alias("quality_p"),
        (p >= 0.5).alias("keep"),
    )


_BM25_TERMS = ("join", "stream", "filter")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 10


@register(
    "q_llm_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(CAST(doc_len AS DECIMAL(25,6))) AS DOUBLE)
               / count(doc_len) AS avg_len
      FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE tok IN {_BM25_TERMS} GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, count(DISTINCT doc_id) AS df FROM toks
      WHERE tok IN {_BM25_TERMS} GROUP BY tok
    ),
    idf AS (
      SELECT tok,
             floor(ln(((SELECT n_docs FROM stats) - df + 0.5) / (df + 0.5)
                      + 1.0) * 1000000.0 + 0.5) / 1000000.0 AS idf6
      FROM df
    ),
    terms AS (
      SELECT t.doc_id,
             i.idf6 * (t.tf * ({_BM25_K1} + 1.0))
               / (t.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * (d.doc_len / (SELECT avg_len FROM stats))))
                 AS s
      FROM tf t JOIN idf i USING (tok) JOIN dl d USING (doc_id)
    ),
    scored AS (
      SELECT doc_id,
             floor(CAST(sum(CAST(s AS DECIMAL(25,6))) AS DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 AS bm25
      FROM terms GROUP BY doc_id
    )
    SELECT doc_id, bm25 FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOP}
    """,
)
def q_llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval over the corpus for a literal query-term set —
    the lexical-search step behind benchmark-contamination sweeps and
    retrieval-based data selection (find the training docs most similar
    to a probe query).  Okapi BM25 with k1=1.2, b=0.75.

    Determinism: idf goes through ln() (the one libm-sensitive step) and
    is e6-rounded immediately; all other arithmetic is per-row IEEE with
    matching association order, term scores decimal-sum per doc, and the
    top-10 sorts on (score, doc_id).

    Plan: one token explode feeds doc lengths, term frequencies (the IN
    filter prunes the explode before either aggregate), and document
    frequencies; N/avg_len is a one-row broadcast; idf is a 3-row
    broadcast join.  At 100 TB everything shuffles on doc_id or tok —
    the probe-term filter keeps the tf/df tables tiny regardless of
    corpus size."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    # r16 wave 9 NOTE: pinning dl/qtoks was A/B-tested and REVERTED
    # (0.70 -> 0.78 s): the duplicated tokenize subtrees run
    # concurrently within one job (the kendall_w lesson).
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        davg("doc_len", "avg_len"),
    )
    qtoks = toks.filter(F.col("tok").isin(*_BM25_TERMS))
    tf = qtoks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = qtoks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    idf = df.join(F.broadcast(stats.select("n_docs"))).select(
        "tok",
        (
            F.floor(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("idf6"),
    )
    terms = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(stats.select("avg_len")))
        .select(
            "doc_id",
            (
                F.col("idf6")
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1.0
                        - _BM25_B
                        + _BM25_B * (F.col("doc_len") / F.col("avg_len"))
                    )
                )
            ).alias("s"),
        )
    )
    DEC = "decimal(25,6)"
    return (
        terms.groupBy("doc_id")
        .agg(
            (
                F.floor(
                    F.sum(F.col("s").cast(DEC)).cast("double") * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOP)
    )


# --------------------------------------------------------------------------
# Gopher-style rule battery (Rae et al. 2021, MassiveText filtering)
# --------------------------------------------------------------------------
_GOPHER_STOP_SQL = "['" + "','".join(_STOPWORDS) + "']"


@register(
    "q_llm_gopher_rules",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             string_split_regex(text, '\\s+') AS toks,
             length(regexp_replace(text, '\\s', '', 'g')) AS nonws_chars
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS BIGINT) AS n_words,
             floor(CAST(nonws_chars AS DOUBLE) / len(toks) * 10000.0 + 0.5)
                 / 10000.0 AS mean_word_len,
             floor(CAST(len(list_filter(toks,
                       t -> regexp_full_match(t, '[a-z]+'))) AS DOUBLE)
                   / len(toks) * 10000.0 + 0.5) / 10000.0 AS alpha_word_frac,
             CAST(len(list_intersect(list_distinct(toks),
                                     {_GOPHER_STOP_SQL})) AS BIGINT)
                 AS n_distinct_stop,
             floor((1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                          / len(toks)) * 10000.0 + 0.5) / 10000.0
                 AS dup_word_frac
      FROM w
    )
    SELECT doc_id, lang, n_words, mean_word_len, alpha_word_frac,
           n_distinct_stop, dup_word_frac,
           CASE WHEN n_words BETWEEN 50 AND 100000
                 AND mean_word_len BETWEEN 3.0 AND 10.0
                 AND alpha_word_frac >= 0.8
                 AND n_distinct_stop >= 2
                THEN 1 ELSE 0 END AS keep
    FROM feat
    """,
)
def q_llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText document-filter rule battery (Rae et al. 2021
    §A1.1): per document, word count, mean word length, fraction of
    purely-alphabetic words, number of distinct stopwords present, and
    duplicate-word fraction — plus the combined keep gate (word count in
    [50, 100k], mean word length in [3, 10], >=80% alphabetic words,
    >=2 distinct stopwords).  The gate compares the ALREADY-ROUNDED e4
    ratios in both engines so a boundary value can't flip the flag
    cross-engine.

    Map-only — one regex split per doc, all higher-order array
    expressions, no shuffle at all; at 100 TB this runs at scan speed
    and feeds the keep flag straight into a partition-pruned rewrite.

    r17: reverted the r16 wave-10 spread_table — it contradicted this
    docstring and tests/test_plans.py::test_gopher_rules_is_map_only
    (the map-only contract is the point of the operator; the ~0.1 s
    local win was marginal)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_words = F.size(toks)
    nonws = F.length(F.regexp_replace("text", r"\s", ""))
    mean_wl = dround(nonws.cast("double") / n_words, 4)
    alpha_frac = dround(
        F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).cast("double")
        / n_words,
        4,
    )
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    dup_frac = dround(
        1.0 - F.size(F.array_distinct(toks)).cast("double") / n_words, 4
    )
    out = d.select(
        "doc_id",
        "lang",
        n_words.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.cast("bigint").alias("n_distinct_stop"),
        dup_frac.alias("dup_word_frac"),
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_distinct_stop") >= 2)
    )
    return out.withColumn("keep", F.when(keep, 1).otherwise(0))


# --------------------------------------------------------------------------
# Interpolated bigram LM surprisal (KenLM-style fluency filter)
# --------------------------------------------------------------------------
_BG_LAMBDA = 0.7  # bigram weight; (1 - lambda) backs off to unigram


@register(
    "q_llm_bigram_logprob",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(2, len(t) + 1),
                                   i -> t[i-1] || ' ' || t[i])) AS bigram
      FROM w
    ),
    uni AS (
      SELECT tok, count(*) AS cu
      FROM (SELECT unnest(t) AS tok FROM w) GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS total FROM uni),
    bgc AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY bigram),
    ctx AS (
      SELECT split_part(bigram, ' ', 1) AS prev,
             CAST(sum(cb) AS BIGINT) AS cc
      FROM bgc GROUP BY 1
    ),
    scored AS (
      SELECT bg.doc_id,
             {sql_dround(
                 f"-ln({_BG_LAMBDA} * CAST(cb AS DOUBLE) / cc"
                 f" + {1.0 - _BG_LAMBDA} * CAST(cu AS DOUBLE) / total)", 6)}
                 AS nll
      FROM bg
      JOIN bgc USING (bigram)
      JOIN ctx ON split_part(bg.bigram, ' ', 1) = ctx.prev
      JOIN uni ON split_part(bg.bigram, ' ', 2) = uni.tok
      CROSS JOIN tot
    )
    SELECT doc_id, count(*) AS n_bigrams, {sql_davg("nll", "avg_surprisal")}
    FROM scored GROUP BY doc_id
    """,
)
def q_llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram language-model fluency score (the KenLM-style
    perplexity filter of CCNet/RefinedWeb, with the corpus itself as the
    LM): per document, the mean token surprisal under
    ``p(w|v) = 0.7 * c(v w)/c(v .) + 0.3 * c(w)/T``.  Unlike the
    unigram score (q_llm_unigram_logprob) this penalizes improbable
    word ORDER, the signal that actually separates fluent text from
    shuffled-word noise.

    Plan: one explode builds the bigram stream; the bigram-count table
    shuffles on the bigram key (the only wide exchange — at 100 TB it is
    a plain hash aggregation over ~vocab^2-bounded keys), while the
    context- and unigram-count tables are vocab-sized and broadcast.
    Per-instance nll is e6-rounded then decimal-averaged, so the driver
    hash matches DuckDB bit-for-bit.

    r16: spread_table parallelizes the three tokenize/explode map
    sides (single-row-group scan = one task otherwise), and the corpus
    token total rides as a one-row broadcast instead of a plan-build
    collect — that collect ran a FULL extra tokenize+aggregate job
    before execution even started."""
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    t = F.split("text", " ")
    w = d.select("doc_id", t.alias("t")).where(F.size("t") >= 2)
    bg = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(2), F.size("t")),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i - 1), F.element_at("t", i)
                ),
            )
        ).alias("bigram"),
    )
    # r16 wave 9 NOTE: pinning uni/bgc was A/B-tested and REVERTED
    # (1.23 -> 1.84 s): the five tokenize subtrees execute
    # concurrently inside one job, and the two checkpoints serialize
    # them into blocking jobs instead.
    uni = (
        w.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = uni.agg(F.sum("cu").cast("double").alias("total"))
    bgc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    ctx = (
        bgc.withColumn("prev", F.substring_index("bigram", " ", 1))
        .groupBy("prev")
        .agg(F.sum("cb").cast("bigint").alias("cc"))
    )
    p = (
        _BG_LAMBDA * F.col("cb").cast("double") / F.col("cc")
        + (1.0 - _BG_LAMBDA) * F.col("cu").cast("double") / F.col("total")
    )
    scored = (
        bg.join(bgc, "bigram")
        .crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(ctx),
            F.substring_index(F.col("bigram"), " ", 1) == F.col("prev"),
        )
        .join(
            F.broadcast(uni),
            F.substring_index(F.col("bigram"), " ", -1) == F.col("tok"),
        )
        .select("doc_id", dround(-F.log(p), 6).alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), davg("nll", "avg_surprisal")
    )


_BPE_ROUNDS = 5


def _bpe_train_oracle_sql() -> str:
    """The 5 merge rounds unrolled as CTEs (the PageRank-oracle
    technique): each round recomputes weighted pair counts over the
    current segmentations, picks the (count desc, left, right) argmax,
    and applies the merge with boundary-delimited replace."""
    parts = ["""
    WITH vocab0 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq,
             '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS repr
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    )"""]
    for r in range(1, _BPE_ROUNDS + 1):
        parts.append(f""",
    pairs{r} AS (
      SELECT t[i] AS l, t[i+1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq, list_filter(string_split(repr, '|'), x -> x <> '') AS t
        FROM vocab{r - 1}
      ), unnest(range(1, len(t))) AS u(i)
      GROUP BY t[i], t[i+1]
    ),
    top{r} AS (
      SELECT l, r, cnt FROM pairs{r}
      ORDER BY cnt DESC, l, r LIMIT 1
    ),
    vocab{r} AS (
      SELECT w, freq,
             replace(repr, '|' || t.l || '|' || t.r || '|',
                     '|' || t.l || t.r || '|') AS repr
      FROM vocab{r - 1}, top{r} t
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, l AS left_tok, r AS right_tok,"
        f" l || r AS merged, cnt FROM top{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    parts.append(f"\n    SELECT * FROM (\n      {unions}\n    )")
    return "".join(parts)


@register("q_llm_bpe_train", oracle=_bpe_train_oracle_sql())
def q_llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE TRAINING loop itself — {_BPE_ROUNDS} merge rounds, not
    just one round's candidate counts (q_llm_bpe_merge_counts): start
    from character-segmented words weighted by corpus frequency
    (Sennrich et al. 2016 train on exactly this word-frequency table,
    which is why the corpus is scanned ONCE — every round after runs on
    the vocabulary-sized frame), and per round (a) sum pair frequencies
    over current segmentations, (b) pick the most frequent pair with a
    total (count desc, left, right) tie order, (c) apply the merge to
    every word. Output: the learned merge table (round, pair, count) —
    the artifact a tokenizer ships.

    Segmentations travel as boundary-delimited strings ('|t|h|e|') so
    the merge is a plain non-overlapping string replace — both engines
    scan left-to-right and resume after the replacement, so repeated
    characters resolve identically (documented deviation from
    canonical BPE: a replaced occurrence consumes its trailing
    boundary, skipping an immediately-adjacent overlap; deterministic
    and engine-exact either way).

    Scale shape: one corpus scan -> |vocab| rows; each round is a
    vocab-sized explode + hash agg + a ONE-ROW broadcast equi-join
    (literal key, so it plans as BroadcastHashJoin, not a nested-loop
    scalar product) + map-only replace; per-round lazy localCheckpoint
    truncates the growing lineage exactly as the PageRank loop does.

    r16: spread_table parallelizes the corpus tokenize+explode map
    side (single-row-group scan = one task otherwise); the merge
    rounds themselves run on the vocabulary-sized frame and are
    unchanged."""
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    vocab = vocab.select(
        "w",
        "freq",
        F.concat(
            F.lit("|"), F.regexp_replace("w", "(.)", "$1|")
        ).alias("repr"),
    ).localCheckpoint(eager=False)

    tops = []
    for r in range(1, _BPE_ROUNDS + 1):
        toks = F.filter(
            F.split("repr", "[|]"), lambda x: x != F.lit("")
        )
        with_toks = vocab.select("w", "freq", "repr", toks.alias("t"))
        # guard: Spark's sequence(1, 0) DESCENDS for single-token words,
        # so build the index list only when a pair exists
        pair_array = F.when(
            F.size("t") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("l"),
                    F.element_at("t", i + 1).alias("r"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        pairs = with_toks.select(
            "freq", F.explode(pair_array).alias("p")
        ).select("freq", "p.l", "p.r")
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .withColumn("j", F.lit(1))
            .localCheckpoint(eager=False)
        )
        tops.append(
            top.select(
                F.lit(r).alias("round"),
                F.col("l").alias("left_tok"),
                F.col("r").alias("right_tok"),
                F.concat("l", "r").alias("merged"),
                "cnt",
            )
        )
        vocab = (
            vocab.withColumn("j", F.lit(1))
            .join(F.broadcast(top), "j")
            .select(
                "w",
                "freq",
                F.replace(
                    F.col("repr"),
                    F.concat(F.lit("|"), "l", F.lit("|"), "r", F.lit("|")),
                    F.concat(F.lit("|"), "l", "r", F.lit("|")),
                ).alias("repr"),
            )
            .localCheckpoint(eager=False)
        )

    out = tops[0]
    for t in tops[1:]:
        out = out.unionByName(t)
    return out


# Shared scored-CTE SQL for classifier-derived queries (identical to
# q_llm_quality_classifier's oracle through the e6-rounded sigmoid).
_QC_PROB_SQL = f"""
    feat AS (
      SELECT doc_id, n_chars,
             CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS ntok,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                  t -> list_contains(['the','a','of','and','to','in','is','it'],
                                     t))) AS DOUBLE) AS nstop,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                 AS nchar,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 AS ndigit
      FROM documents
    ), scored AS (
      SELECT doc_id, n_chars,
             floor(1.0 / (1.0 + exp(-(floor(
                 ({_QC_W0} + {_QC_W[0]} * (nstop / ntok)
                           + {_QC_W[1]} * (nchar / ntok)
                           + {_QC_W[2]} * (ndigit / nchar)
                           + {_QC_W[3]} * ln(ntok))
                 * 1000000.0 + 0.5) / 1000000.0)))
               * 1000000.0 + 0.5) / 1000000.0 AS p
      FROM feat
    )
"""


def _qc_probability() -> "Column":
    """The classifier probability column (e6-rounded logit + sigmoid),
    shared with q_llm_quality_classifier."""
    toks = F.split("text", r"\s+")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    ntok = F.size(toks).cast("double")
    nstop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop, t))
    ).cast("double")
    nchar = F.length(F.regexp_replace("text", r"\s", "")).cast("double")
    ndigit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
    z = (
        F.lit(_QC_W0)
        + _QC_W[0] * (nstop / ntok)
        + _QC_W[1] * (nchar / ntok)
        + _QC_W[2] * (ndigit / nchar)
        + _QC_W[3] * F.log(ntok)
    )
    z6 = F.floor(z * 1000000.0 + F.lit(0.5)) / 1000000.0
    return dround(1.0 / (1.0 + F.exp(-z6)), 6)


_EVAL_TRUTH_CHARS = 250  # ground-truth label: doc length >= this


@register(
    "q_llm_classifier_eval",
    oracle=f"""
    WITH {_QC_PROB_SQL},
    labeled AS (
      SELECT doc_id, p, (n_chars >= {_EVAL_TRUTH_CHARS}) AS y
      FROM scored
    ),
    ranked AS (
      SELECT y, p,
             row_number() OVER (ORDER BY p, doc_id) AS rn
      FROM labeled
    ),
    avg_ranked AS (
      SELECT y,
             CAST(sum(rn) OVER (PARTITION BY p) AS DOUBLE)
                 / count(*) OVER (PARTITION BY p) AS arank
      FROM ranked
    ),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        sum(CASE WHEN y THEN arank ELSE 0 END) AS pos_rank_sum
      FROM avg_ranked
    ),
    cm AS (
      SELECT
        CAST(sum(CASE WHEN y AND p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
            AS tp,
        CAST(sum(CASE WHEN NOT y AND p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
            AS fp,
        CAST(sum(CASE WHEN y AND p < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
            AS fn,
        CAST(sum(CASE WHEN NOT y AND p < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
            AS tn
      FROM labeled
    )
    SELECT a.n_pos, a.n_neg, c.tp, c.fp, c.fn, c.tn,
           CAST(c.tp AS DOUBLE) / (c.tp + c.fp) AS precision,
           CAST(c.tp AS DOUBLE) / (c.tp + c.fn) AS recall,
           CAST(2 * c.tp AS DOUBLE) / (2 * c.tp + c.fp + c.fn) AS f1,
           (a.pos_rank_sum - CAST(a.n_pos AS DOUBLE) * (a.n_pos + 1) / 2)
               / (CAST(a.n_pos AS DOUBLE) * a.n_neg) AS auc
    FROM agg a, cm c
    """,
)
def q_llm_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-model EVALUATION — the metrics every quality-classifier
    training loop reports before the filter ships: confusion matrix at
    the 0.5 threshold, precision/recall/F1, and EXACT ROC-AUC via the
    Mann-Whitney rank statistic with proper tie-averaged ranks (equal
    scores share the mean of their rank range). Ground truth here is
    the deterministic length label (n_chars >= {_EVAL_TRUTH_CHARS});
    in production it is the held-out human/benchmark label set joined
    on doc_id — same plan.

    Plan: the classifier's map-stage score collapses to ONE row per
    DISTINCT score (hash aggregate — this is the "histogram" of the
    two-pass histogram-cut rank), then the tie-averaged rank of each
    score bucket derives from the exact global running row count over
    the score order: arank = rows_below + (bucket_size + 1)/2. The
    running count comes from operators/prefix.running_totals_blocked
    over a fixed 4096-cell score grid (p is a probability, so the grid
    is a deterministic monotone blocking) — one block-keyed window +
    a ≤4096-row offset pre-pass — so NO single-partition window
    anywhere: the old global row_number funneled the whole corpus
    through one task. Determinism:
    bucket counts are integers, aranks exact half-integers (sums of
    halves are exact in doubles, so even the plain SUM is
    order-independent), every metric one final division — hash-exact,
    identical to the row-level Mann-Whitney statistic by algebra
    (ranks below+1..below+cnt have mean below+(cnt+1)/2)."""
    from ex_hivent_spark.operators.prefix import running_totals_blocked

    # r16: A/B-tested spread_table here and REVERTED — the groupBy
    # immediately after reduces to few distinct keys, so the scan-task
    # partial aggregate is the data reduction; a doc_id repartition
    # ships raw rows across an extra exchange and measured SLOWER
    # (classifier_eval 1.13 plain vs ~1.7 spread; same shape for
    # calibration_bins). Single-task map cost is below the exchange
    # cost for this op.
    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(
        "doc_id",
        _qc_probability().alias("p"),
        (F.col("n_chars") >= _EVAL_TRUTH_CHARS).alias("y"),
    )
    buckets = (
        labeled.groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.when(F.col("y"), 1).otherwise(0))
            .cast("bigint")
            .alias("pos_cnt"),
        )
        .withColumn(
            "grid", F.floor(F.col("p") * 4096).cast("bigint")  # p ∈ [0,1]
        )
        # the bucket frame (|distinct scores| rows) feeds the window,
        # the offsets probe AND the confusion aggregate — pin it so the
        # corpus is scanned exactly once
        .localCheckpoint(eager=False)
    )
    cum = running_totals_blocked(
        buckets, ["p"], ["grid"], {"cnt": "cum_cnt"}
    )
    arank = (
        (F.col("cum_cnt") - F.col("cnt")).cast("double")
        + (F.col("cnt") + 1).cast("double") / 2
    )
    rank_agg = cum.agg(
        F.sum(F.col("pos_cnt").cast("double") * arank).alias(
            "pos_rank_sum"
        )
    )
    neg_cnt = F.col("cnt") - F.col("pos_cnt")
    hi = F.col("p") >= 0.5  # bucket-level: every row in a bucket shares p
    conf = buckets.agg(
        F.sum("pos_cnt").alias("n_pos"),
        F.sum(neg_cnt).alias("n_neg"),
        F.sum(F.when(hi, F.col("pos_cnt")).otherwise(0)).alias("tp"),
        F.sum(F.when(hi, neg_cnt).otherwise(0)).alias("fp"),
        F.sum(F.when(~hi, F.col("pos_cnt")).otherwise(0)).alias("fn"),
        F.sum(F.when(~hi, neg_cnt).otherwise(0)).alias("tn"),
    )
    agg = conf.crossJoin(F.broadcast(rank_agg))  # two one-row frames
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    n_pos, n_neg = F.col("n_pos"), F.col("n_neg")
    return agg.select(
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        "fn",
        "tn",
        (tp.cast("double") / (tp + fp)).alias("precision"),
        (tp.cast("double") / (tp + fn)).alias("recall"),
        ((2 * tp).cast("double") / (2 * tp + fp + fn)).alias("f1"),
        (
            (
                F.col("pos_rank_sum")
                - n_pos.cast("double") * (n_pos + 1) / 2
            )
            / (n_pos.cast("double") * n_neg)
        ).alias("auc"),
    )


@register(
    "q_llm_langid_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(string_split_regex(lower(text), '\\s+')) AS t
      FROM documents
    ),
    pred AS (
      SELECT lang AS declared_lang,
             ({LANGID_BEST_SQL}).lang AS predicted_lang
      FROM toks
    ),
    c AS (
      SELECT declared_lang, predicted_lang,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY declared_lang, predicted_lang
    )
    SELECT declared_lang, predicted_lang, n_docs,
           CAST(n_docs AS DOUBLE)
               / sum(n_docs) OVER (PARTITION BY declared_lang)
               AS recall_share
    FROM c
    """,
)
def q_llm_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the language-ID heuristic against the
    declared labels: per (declared, predicted) cell, the document count
    and the within-declared-language share (the per-class recall
    decomposition). This is the eval report that decides whether a
    cheap classifier is good enough to gate a corpus slice — the
    categorical sibling of q_llm_classifier_eval's ROC-AUC.

    Plan: the prediction is the same in-row argmax as q_llm_lang_id
    (shared langid_best(), so query and eval can't diverge), one hash
    aggregate to the ≤|langs|² cell frame, and the recall window runs
    over that aggregated frame only. Determinism: counts are integers;
    the share is a single exact division."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("declared_lang"),
        langid_best()["lang"].alias("predicted_lang"),
    )
    c = pred.groupBy("declared_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy("declared_lang")
    return c.select(
        "declared_lang",
        "predicted_lang",
        "n_docs",
        (
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w)
        ).alias("recall_share"),
    )


@register(
    "q_llm_doc_perplexity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    dt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c_dt
      FROM toks GROUP BY doc_id, tok
    ),
    vocab AS (
      SELECT tok, CAST(sum(c_dt) AS BIGINT) AS c_t FROM dt GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM vocab),
    scored AS (
      SELECT dt.doc_id,
             dt.c_dt,
             dt.c_dt * ({sql_dround(
                 "ln(CAST(vocab.c_t AS DOUBLE) / tot.n)", 6
             )}) AS lp
      FROM dt JOIN vocab USING (tok) CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(sum(c_dt) AS BIGINT) AS n_tokens,
           {sql_dround(
               "-(CAST(sum(CAST(lp AS DECIMAL(25,6))) AS DOUBLE))"
               " / sum(c_dt)", 6
           )} AS cross_entropy,
           {sql_dround(
               "exp(" + sql_dround(
                   "-(CAST(sum(CAST(lp AS DECIMAL(25,6))) AS DOUBLE))"
                   " / sum(c_dt)", 6
               ) + ")", 6
           )} AS perplexity
    FROM scored
    GROUP BY doc_id
    """,
)
def q_llm_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus's own unigram language
    model: H(d) = −(1/n_d)·Σ_tok c_dt·ln(c_t/N) and ppl = e^H — the
    cheapest model-free fluency/typicality score (the same family
    CCNet uses with an external LM): documents whose vocabulary is
    corpus-typical score low, boilerplate of rare symbols scores high.
    A pretraining curation pass sorts or thresholds on this.

    Plan: one token explode → (doc, token) hash aggregate; the
    |vocab|-row count frame joins back hash-on-token (both sides are
    aggregates ≪ corpus); the total rides as a broadcast one-row
    frame; per-doc fold is a decimal-summed aggregate. Nothing wider
    than (doc_id, token) shuffles. Determinism: counts are integers,
    the per-token ln is e6-rounded before the integer multiply, the
    per-doc sum rides the decimal detour, the entropy division is one
    exact IEEE op (e6-rounded), and the single exp is e6-rounded —
    the one-libm-call-per-term convention throughout the suite."""
    d = load_table(spark, sf_dir, "documents")
    dt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_dt"))
        .localCheckpoint(eager=False)  # vocab + totals + scoring all
        # derive from dt: scan/explode the corpus once
    )
    vocab = dt.groupBy("tok").agg(F.sum("c_dt").alias("c_t"))
    tot = vocab.agg(F.sum("c_t").alias("n"))
    scored = (
        dt.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "c_dt",
            (
                F.col("c_dt")
                * dround(
                    F.log(F.col("c_t").cast("double") / F.col("n")), 6
                )
            ).alias("lp"),
        )
    )
    h = dround(
        -(F.sum(F.col("lp").cast("decimal(25,6)")).cast("double"))
        / F.sum("c_dt"),
        6,
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c_dt").alias("n_tokens"),
        h.alias("cross_entropy"),
        dround(F.exp(h), 6).alias("perplexity"),
    )


@register(
    "q_llm_calibration_bins",
    oracle=f"""
    WITH {_QC_PROB_SQL},
    labeled AS (
      SELECT doc_id, p,
             CASE WHEN n_chars >= {_EVAL_TRUTH_CHARS} THEN 1 ELSE 0 END AS y
      FROM scored
    ),
    buckets AS (
      SELECT p, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS pos_cnt
      FROM labeled GROUP BY p
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM buckets),
    cum AS (
      SELECT p, cnt, pos_cnt,
             CAST(sum(cnt) OVER (ORDER BY p) AS BIGINT) AS cum_cnt
      FROM buckets
    ),
    binned AS (
      SELECT least(((cum_cnt - 1) * 10) // n, 9) AS decile,
             cnt, pos_cnt, p
      FROM cum CROSS JOIN tot
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(sum(pos_cnt) AS BIGINT) AS n_pos,
           {sql_dround(
               "CAST(sum(CAST(p * cnt AS DECIMAL(25,6))) AS DOUBLE)"
               " / sum(cnt)", 6
           )} AS mean_score,
           {sql_dround(
               "CAST(sum(pos_cnt) AS DOUBLE) / sum(cnt)", 6
           )} AS pos_rate,
           {sql_dround(
               "CAST(sum(CAST(p * cnt AS DECIMAL(25,6))) AS DOUBLE)"
               " / sum(cnt)", 6
           )} - {sql_dround(
               "CAST(sum(pos_cnt) AS DOUBLE) / sum(cnt)", 6
           )} AS calibration_gap
    FROM binned GROUP BY decile
    """,
)
def q_llm_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration table for the quality classifier: bucket the
    corpus into score deciles and compare mean predicted probability
    against the observed positive rate per decile — the reliability
    diagram every shipped filter model is audited with (a well-
    calibrated model has gap ≈ 0 in every decile; a confident-but-
    wrong model shows large gaps at the extremes).

    Plan — NO ntile/global row_number: scores collapse to one row per
    DISTINCT score (hash aggregate), the exact cumulative count comes
    from operators/prefix.running_totals_blocked over the fixed
    4096-cell score grid (the q_llm_classifier_eval machinery), and a
    score bucket's decile is the decile of its LAST row's global rank
    (equal scores are never split across bins — deterministic under
    ties, unlike ntile). Final aggregate is 10 rows. Determinism:
    integer counts, decimal-summed score mass, e6-rounded outputs."""
    from ex_hivent_spark.operators.prefix import running_totals_blocked

    # r16: A/B-tested spread_table here and REVERTED — the groupBy
    # immediately after reduces to few distinct keys, so the scan-task
    # partial aggregate is the data reduction; a doc_id repartition
    # ships raw rows across an extra exchange and measured SLOWER
    # (classifier_eval 1.13 plain vs ~1.7 spread; same shape for
    # calibration_bins). Single-task map cost is below the exchange
    # cost for this op.
    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(
        "doc_id",
        _qc_probability().alias("p"),
        F.when(F.col("n_chars") >= _EVAL_TRUTH_CHARS, 1)
        .otherwise(0)
        .alias("y"),
    )
    buckets = (
        labeled.groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("y").cast("bigint").alias("pos_cnt"),
        )
        .withColumn("grid", F.floor(F.col("p") * 4096).cast("bigint"))
        .localCheckpoint(eager=False)  # window + totals probe: the
        # corpus is scored and bucketed once
    )
    tot = buckets.agg(F.sum("cnt").alias("n"))
    cum = running_totals_blocked(buckets, ["p"], ["grid"], {"cnt": "cum_cnt"})
    binned = cum.crossJoin(F.broadcast(tot)).select(
        F.least(
            F.expr("((cum_cnt - 1) * 10) DIV n"), F.lit(9).cast("bigint")
        ).alias("decile"),
        "cnt",
        "pos_cnt",
        "p",
    )
    dec = "decimal(25,6)"
    mean_score = dround(
        F.sum((F.col("p") * F.col("cnt")).cast(dec)).cast("double")
        / F.sum("cnt"),
        6,
    )
    pos_rate = dround(
        F.sum("pos_cnt").cast("double") / F.sum("cnt"), 6
    )
    return binned.groupBy("decile").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum("pos_cnt").cast("bigint").alias("n_pos"),
        mean_score.alias("mean_score"),
        pos_rate.alias("pos_rate"),
        (mean_score - pos_rate).alias("calibration_gap"),
    )


@register(
    "q_llm_flesch_readability",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             CAST({_TOK} AS BIGINT) AS w,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS syl
      FROM documents
    ),
    scored AS (
      SELECT source,
             CAST(206.835 AS DOUBLE)
             - CAST(1.015 AS DOUBLE) * (CAST(w AS DOUBLE) / s)
             - CAST(84.6 AS DOUBLE) * (CAST(syl AS DOUBLE) / w)
               AS flesch
      FROM per_doc WHERE w > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           {sql_davg("flesch", "avg_flesch")},
           CAST(sum(CASE WHEN flesch >= 60.0 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS easy_share
    FROM scored GROUP BY source
    """,
)
def q_llm_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source — the classical readability score
    (206.835 − 1.015·words/sentence − 84.6·syllables/word) used as a
    cheap curation signal: very low scores flag boilerplate/gibberish,
    the 60+ band ("plain English") is a common pretraining keep filter.
    Sentences = punctuation-ender runs (min 1), syllables = vowel-group
    runs — the standard regex approximations, deterministic and
    library-free.

    Plan: three regexp counters per doc (codegen'd JVM expressions, one
    scan, map-only) and one per-source hash aggregate. Determinism:
    counts are integers, the per-doc score is identically-written
    double arithmetic from integer ratios (no libm), and the mean rides
    the decimal detour; the 60-point band compare is exact."""
    d = load_table(spark, sf_dir, "documents")
    w = token_count(F.col("text")).cast("bigint")
    s = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("bigint")
    syl = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(r"[aeiouy]+"), F.lit(0))
    ).cast("bigint")
    per = d.select(
        "source", w.alias("w"), s.alias("s"), syl.alias("syl")
    ).filter(F.col("w") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("w").cast("double") / F.col("s"))
        - F.lit(84.6) * (F.col("syl").cast("double") / F.col("w"))
    )
    scored = per.select("source", flesch.alias("flesch"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        davg("flesch", "avg_flesch"),
        (
            F.sum(F.when(F.col("flesch") >= 60.0, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("easy_share"),
    )


# MATTR window width, in tokens (the standard 50-token variant; the
# 100-token variant just changes this constant).
_MATTR_W = 50


@register(
    "q_llm_mattr_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(i AS BIGINT) AS i,
             CAST(len(list_distinct(
               t[i:i + {_MATTR_W} - 1])) AS BIGINT) AS d
      FROM toks
      CROSS JOIN unnest(range(1, greatest(len(t) - {_MATTR_W} + 1, 1) + 1))
        AS u(i)
    )
    SELECT doc_id,
           CAST(max(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CAST(CAST(d AS DOUBLE)
                         / least(CAST(n_tokens AS DOUBLE), {_MATTR_W}.0)
                         AS DECIMAL(25,6))) AS DOUBLE) / count(*)
             AS mattr
    FROM wins GROUP BY doc_id
    """,
)
def q_llm_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-Average Type-Token Ratio (MATTR-50) per document — the
    length-independent lexical-diversity score (plain TTR collapses as
    documents grow; MATTR averages the TTR of every sliding 50-token
    window, so a 100-token and a 10k-token document are comparable):
    the repetition/diversity feature a pretraining curation pipeline
    keeps next to q_llm_repetition_score and q_llm_distinct_ngrams.
    Documents shorter than the window get their single whole-document
    TTR (the standard degenerate case).

    Plan (r16 OPTIMIZATION — was posexplode + 50-row window frame +
    broadcast join + hash aggregate, 3 Exchanges and a per-token
    collect_list array build): every sliding window lives inside one
    document's token array, so the whole computation is ROW-LOCAL —
    one projection computing size(array_distinct(slice(t, i, 50)))
    for each window start and folding the per-window TTRs through the
    decimal detour. ZERO exchanges, zero window state, no token
    shuffle at any scale; the only distributed step is the
    scale-adaptive scan spread (catalog.spread_table — a no-op at
    real scale, where the scan itself has enough splits).
    Determinism: distinct counts are exact integers; each window TTR
    is one exact double division cast to decimal(25,6) exactly like
    the oracle's per-window term; the fold's decimal additions are
    exact at scale 6 (oracle: SUM over the same terms — decimal
    addition is order-insensitive).

    Scale note: work is O(total_tokens × W) with W=50 fixed — linear
    in corpus size and embarrassingly parallel per document."""
    from ex_hivent_spark.catalog import spread_table

    d = spread_table(spark, sf_dir, "documents", "doc_id")
    t = F.split("text", " ")
    n = F.size(t)
    starts = F.sequence(F.lit(1), F.greatest(n - (_MATTR_W - 1), F.lit(1)))
    denom = F.least(n.cast("double"), F.lit(float(_MATTR_W)))
    ttrs = F.transform(
        starts,
        lambda i: (
            F.size(F.array_distinct(F.slice(t, i, _MATTR_W))).cast("double")
            / denom
        ).cast("decimal(25,6)"),
    )
    msum = F.aggregate(
        ttrs,
        F.lit(0).cast("decimal(25,6)"),
        lambda acc, v: (acc + v).cast("decimal(25,6)"),
    )
    return d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.size(starts).cast("bigint").alias("n_windows"),
        (msum.cast("double") / F.size(starts)).alias("mattr"),
    )


# Burstiness audit: top terms by corpus frequency.
_BURST_TOP = 50


@register(
    "q_llm_term_burstiness",
    oracle=f"""
    WITH td AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term, doc_id
    ),
    dd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    t AS (
      SELECT term,
             CAST(sum(c) AS BIGINT) AS tf,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c * c) AS BIGINT) AS ssq
      FROM td GROUP BY term
    )
    SELECT term, tf, df,
           CAST(tf AS DOUBLE) / n_docs AS mean_count,
           (CAST(ssq AS DOUBLE) - CAST(tf AS DOUBLE) * tf / n_docs)
             / (n_docs - 1) AS var_count,
           {sql_dround(
               "((CAST(ssq AS DOUBLE)"
               "  - CAST(tf AS DOUBLE) * tf / n_docs)"
               " / (n_docs - 1))"
               " / (CAST(tf AS DOUBLE) / n_docs)", 6)} AS fano
    FROM t CROSS JOIN dd
    ORDER BY tf DESC, term LIMIT {_BURST_TOP}
    """,
)
def q_llm_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Fano factor / index of dispersion) for the top
    50 corpus terms: variance-to-mean ratio of the per-document
    count ACROSS ALL documents, zeros included — Fano ≈ 1 means the
    term scatters Poisson-like (function words), Fano ≫ 1 means it
    bursts in few documents (topical/content words). The classic
    content-word detector a curation pipeline uses next to IDF, and a
    drift probe for template spam (a suddenly-bursty function word =
    boilerplate injection).

    Plan: one explode + two hash aggregates collapse the corpus to
    per-term moments (Σc, Σc², df) — zeros never materialize because
    the all-docs variance is computed from the total-docs scalar D:
    var = (Σc² − (Σc)²/D)/(D−1); the top-k is a TakeOrderedAndProject
    (distributed per-partition top-k + merge, never a global sort).
    Determinism: all moments are exact integers; the divisions are
    deterministic doubles; the Fano closing is e6-rounded against the
    division-order wobble; the (tf DESC, term) cutoff is a total
    order."""
    d = load_table(spark, sf_dir, "documents")
    td = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    dd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    t = td.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("tf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq"),
    )
    tf, ssq, nd = F.col("tf"), F.col("ssq"), F.col("n_docs")
    var = (ssq.cast("double") - tf.cast("double") * tf / nd) / (nd - 1)
    return (
        t.crossJoin(F.broadcast(dd))
        .select(
            "term",
            "tf",
            "df",
            (tf.cast("double") / nd).alias("mean_count"),
            var.alias("var_count"),
            dround(var / (tf.cast("double") / nd), 6).alias("fano"),
        )
        .orderBy(F.col("tf").desc(), "term")
        .limit(_BURST_TOP)
    )


@register(
    "q_llm_source_vocab_overlap",
    oracle="""
    WITH vocab AS (
      SELECT source, term
      FROM (SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY source, term
    ),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS v FROM vocab GROUP BY source
    ),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS common
      FROM vocab a JOIN vocab b
        ON a.term = b.term AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b, sa.v AS vocab_a, sb.v AS vocab_b, i.common,
           CAST(i.common AS DOUBLE) / (sa.v + sb.v - i.common)
             AS vocab_jaccard,
           CAST(i.common AS DOUBLE) / least(sa.v, sb.v)
             AS containment
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    ORDER BY src_a, src_b
    """,
)
def q_llm_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between corpus sources: for every
    source pair, the shared-type count with Jaccard and
    min-containment — the corpus-mixture diagnostic ("is source X
    just a subset of Y's language?") that guides dedup priorities and
    mixture weighting next to q_llm_jsd_sources' distributional
    divergence (types here, token masses there).

    Plan: one distinct hash aggregate to the (source, term) vocabulary
    frame (vocab-sized, ≪ token volume); the pairwise intersection is
    a TERM-keyed self-join — work Σ_term df(term)² bounded by
    |sources| per term (≤|sources|² pairs per term, with |sources|
    fixed and small), never an all-pairs document product; sizes join
    back broadcast. Determinism: all-integer counts, two exact
    integer-ratio divisions."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
        .localCheckpoint(eager=False)  # sizes + self-join: one pass
    )
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    a = vocab.select(F.col("source").alias("src_a"), "term")
    b = vocab.select(F.col("source").alias("src_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("v").alias("vocab_a")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("v").alias("vocab_b")
    )
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "vocab_a",
            "vocab_b",
            "common",
            (
                F.col("common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("common"))
            ).alias("vocab_jaccard"),
            (
                F.col("common").cast("double")
                / F.least(F.col("vocab_a"), F.col("vocab_b"))
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )


@register(
    "q_llm_quality_length_corr",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                 AS ntok,
             floor((CAST(len(list_filter(
                       string_split_regex(text, '\\s+'),
                       t -> list_contains(
                         ['the','a','of','and','to','in','is','it'], t)))
                     AS DOUBLE)
                   / len(string_split_regex(text, '\\s+')))
                   * 10000.0 + 0.5) / 10000.0 AS sw
      FROM documents
    ),
    agg AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS sx,
             CAST(sum(ntok * ntok) AS BIGINT) AS sxx,
             CAST(sum(CAST(sw AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(sw * sw AS DECIMAL(25,9))) AS DOUBLE) AS syy,
             CAST(sum(CAST(ntok * sw AS DECIMAL(25,6))) AS DOUBLE) AS sxy
      FROM per_doc GROUP BY lang
    ),
    closing AS (
      SELECT lang, n_docs,
             n_docs * sxy - sx * sy AS num,
             {sql_dround(
                 "sqrt(greatest(CAST(n_docs * sxx - sx * sx AS DOUBLE), 0.0)"
                 " * greatest(n_docs * syy - sy * sy, 0.0))", 6)} AS den
      FROM agg
    )
    SELECT lang, n_docs,
           CASE WHEN den = 0 THEN 0.0
                ELSE {sql_dround("num / den", 6)} END
               AS corr_tokens_stopword
    FROM closing
    """,
)
def q_llm_quality_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per language between document length (token
    count) and stopword ratio — the quality-signal collinearity probe
    a curation run checks before stacking filters (if the stopword
    gate mostly re-implements the length gate, the two filters are
    not independent evidence and the combined rejection rate is
    misread). Uses q_llm_quality_score's exact token/stopword
    definitions.

    Plan: ONE map pass computes both per-doc signals (text never
    leaves the scan), one hash aggregate per language carrying the
    five moment sums, and a per-row closing formula on the
    language-count-sized result. Partial aggregation applies
    throughout — the plan is flat in corpus size. Determinism: token
    moments are exact integers; stopword-ratio moments ride the
    decimal detour (e4-grid squares exact at scale 9); the closing
    cancellation clamps at 0 inside the e6-rounded sqrt (the ADVICE
    rule) and the final ratio is e6-rounded. Scale bound: the decimal
    sums stay under the 2^53 unscaled bound through ~1e9 docs per
    language; shard by (lang, doc_id bucket) first beyond that."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    ntok_i = F.size(toks)
    per_doc = d.select(
        "lang",
        ntok_i.cast("bigint").alias("ntok"),
        dround(n_stop.cast("double") / ntok_i, 4).alias("sw"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("sx"),
        F.sum(F.col("ntok") * F.col("ntok")).cast("bigint").alias("sxx"),
        F.sum(F.col("sw").cast("decimal(25,6)")).cast("double").alias("sy"),
        F.sum((F.col("sw") * F.col("sw")).cast("decimal(25,9)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("ntok") * F.col("sw")).cast("decimal(25,6)"))
        .cast("double")
        .alias("sxy"),
    )
    num = F.col("n_docs") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = dround(
        F.sqrt(
            F.greatest(
                (F.col("n_docs") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double"),
                F.lit(0.0),
            )
            * F.greatest(
                F.col("n_docs") * F.col("syy") - F.col("sy") * F.col("sy"),
                F.lit(0.0),
            )
        ),
        6,
    )
    closing = agg.select(
        "lang", "n_docs", num.alias("num"), den.alias("den")
    )
    return closing.select(
        "lang",
        "n_docs",
        F.when(F.col("den") == 0, F.lit(0.0))
        .otherwise(dround(F.col("num") / F.col("den"), 6))
        .alias("corr_tokens_stopword"),
    )


def _corr_oracle_sql() -> str:
    from ex_hivent_spark.plans.registry import _REGISTRY

    return _REGISTRY["q_llm_quality_length_corr"].oracle


@register(
    "q_llm_corr_fisher_ci",
    oracle=f"""
    WITH corr AS ({_corr_oracle_sql()}),
    z AS (
      SELECT lang, n_docs, corr_tokens_stopword AS r,
             {sql_dround(
                 "0.5 * ln((1.0 + corr_tokens_stopword)"
                 " / (1.0 - corr_tokens_stopword))", 6)} AS fz,
             {sql_dround("1.96 / sqrt(n_docs - 3.0)", 6)} AS hw
      FROM corr
      WHERE n_docs > 3 AND abs(corr_tokens_stopword) < 1.0
    ),
    ends AS (
      SELECT lang, n_docs, r,
             {sql_dround("exp(2.0 * (fz - hw))", 6)} AS tlo,
             {sql_dround("exp(2.0 * (fz + hw))", 6)} AS thi
      FROM z
    )
    SELECT lang, n_docs, r,
           {sql_dround("(tlo - 1.0) / (tlo + 1.0)", 6)} AS ci_lower,
           {sql_dround("(thi - 1.0) / (thi + 1.0)", 6)} AS ci_upper
    FROM ends
    """,
)
def q_llm_corr_fisher_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-z 95% confidence interval for the per-language
    length-vs-stopword correlation (q_llm_quality_length_corr's r):
    z = artanh(r), half-width 1.96/√(n−3), back-transformed through
    tanh — the standard way to put honest error bars on a correlation
    before acting on it (a segment's r of 0.3 over 40 docs and over
    40k docs are different claims). Degenerate rows (|r| = 1 or
    n ≤ 3, where the transform blows up) are excluded, documented.

    Plan: everything of the underlying correlation (one map pass, one
    per-lang moment aggregate), then per-row closings on the
    language-count-sized frame — no new shuffles. Determinism: the
    artanh ln, the interval sqrt, and each back-transform exp (the
    libm calls) are e6-rounded on both sides; every other step is
    exact IEEE on already-rounded inputs; both bounds e6-round last."""
    corr = q_llm_quality_length_corr(spark, sf_dir)
    base = corr.filter(
        (F.col("n_docs") > 3)
        & (F.abs(F.col("corr_tokens_stopword")) < 1.0)
    ).select(
        "lang", "n_docs", F.col("corr_tokens_stopword").alias("r")
    )
    fz = dround(
        0.5 * F.log((1.0 + F.col("r")) / (1.0 - F.col("r"))), 6
    )
    hw = dround(1.96 / F.sqrt(F.col("n_docs") - 3.0), 6)
    z = base.select("lang", "n_docs", "r", fz.alias("fz"), hw.alias("hw"))
    ends = z.select(
        "lang",
        "n_docs",
        "r",
        dround(F.exp(2.0 * (F.col("fz") - F.col("hw"))), 6).alias("tlo"),
        dround(F.exp(2.0 * (F.col("fz") + F.col("hw"))), 6).alias("thi"),
    )
    return ends.select(
        "lang",
        "n_docs",
        "r",
        dround((F.col("tlo") - 1.0) / (F.col("tlo") + 1.0), 6).alias(
            "ci_lower"
        ),
        dround((F.col("thi") - 1.0) / (F.col("thi") + 1.0), 6).alias(
            "ci_upper"
        ),
    )


# Perplexity-gate thresholds swept by the curation tuning pass (the
# corpus's unigram ppl sits in ~29-41 on this generator; the grid
# brackets the distribution so every SF produces a non-trivial curve).
_PPL_THRESHOLDS = (30.0, 31.0, 32.0, 34.0, 38.0)

# SQL twin of q_llm_doc_perplexity's per-doc frame (re-rendered from
# the same CTE chain so the sweep and the per-doc score cannot drift
# in data — the q_win_stoch_rsi convention).
_SQL_DOC_PPL = f"""
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    dt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c_dt
      FROM toks GROUP BY doc_id, tok
    ),
    vocab AS (
      SELECT tok, CAST(sum(c_dt) AS BIGINT) AS c_t FROM dt GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM vocab),
    scored AS (
      SELECT dt.doc_id,
             dt.c_dt,
             dt.c_dt * ({sql_dround(
                 "ln(CAST(vocab.c_t AS DOUBLE) / tot.n)", 6
             )}) AS lp
      FROM dt JOIN vocab USING (tok) CROSS JOIN tot
    ),
    ppl AS (
      SELECT doc_id,
             CAST(sum(c_dt) AS BIGINT) AS n_tokens,
             {sql_dround(
                 "exp(" + sql_dround(
                     "-(CAST(sum(CAST(lp AS DECIMAL(25,6))) AS DOUBLE))"
                     " / sum(c_dt)", 6) + ")", 6)} AS perplexity
      FROM scored GROUP BY doc_id
    )
"""


@register(
    "q_llm_perplexity_filter_sweep",
    oracle=f"""
    WITH {_SQL_DOC_PPL},
    thr AS (
      -- CAST to DOUBLE: DuckDB types the unnested float-literal list
      -- DECIMAL(3,1), while the Spark side emits DOUBLE; emit the
      -- identical type so parity doesn't lean on the harness's
      -- numeric coercion or the repr-keyed row sort.
      SELECT CAST(unnest([{", ".join(str(t) for t in _PPL_THRESHOLDS)}])
                  AS DOUBLE) AS max_ppl
    ),
    tot2 AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(n_tokens) AS BIGINT) AS tok_total
      FROM ppl
    )
    SELECT max_ppl,
           CAST(sum(CASE WHEN perplexity <= max_ppl THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN perplexity <= max_ppl THEN n_tokens
                         ELSE 0 END) AS BIGINT) AS tokens_kept,
           CAST(sum(CASE WHEN perplexity <= max_ppl THEN 1 ELSE 0 END)
                AS DOUBLE) / max(n_total) AS doc_share,
           CAST(sum(CASE WHEN perplexity <= max_ppl THEN n_tokens
                         ELSE 0 END) AS DOUBLE) / max(tok_total)
             AS token_share
    FROM thr CROSS JOIN ppl CROSS JOIN tot2
    GROUP BY max_ppl
    """,
)
def q_llm_perplexity_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-gate threshold sweep: for each candidate max-ppl
    cutoff, the documents and tokens the corpus would KEEP under the
    unigram-LM fluency gate — the CCNet-style curation knob read as a
    curve before committing (the q_llm_length_filter_sweep shape
    applied to q_llm_doc_perplexity's score; composing the per-doc
    query directly means the sweep and the score can never disagree).

    Plan: the per-doc perplexity frame (explode + two hash aggregates
    + a vocab join — all aggregate-sized) crossed with a 5-row literal
    threshold grid and one closing aggregate. Determinism: the gate
    compares the e6-ROUNDED perplexity against clean literals
    (identical on both sides); counts are integers; shares are exact
    integer-ratio divisions."""
    ppl = q_llm_doc_perplexity(spark, sf_dir).select(
        "doc_id", "n_tokens", "perplexity"
    )
    thr = F.explode(
        F.array(*[F.lit(t) for t in _PPL_THRESHOLDS])
    ).alias("max_ppl")
    tot = ppl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("n_tokens").cast("bigint").alias("tok_total"),
    )
    keep = F.col("perplexity") <= F.col("max_ppl")
    grid = ppl.select("n_tokens", "perplexity", thr)
    return (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("max_ppl")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_kept"),
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
            (
                F.sum(F.when(keep, 1).otherwise(0)).cast("double")
                / F.max("n_total")
            ).alias("doc_share"),
            (
                F.sum(F.when(keep, F.col("n_tokens")).otherwise(0)).cast(
                    "double"
                )
                / F.max("tok_total")
            ).alias("token_share"),
        )
    )
