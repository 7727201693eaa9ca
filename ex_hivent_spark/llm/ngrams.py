"""Corpus-level n-gram and vocabulary statistics — the WIMBD-style
"what's in my big data?" audit surface (Elazar et al. 2024): the most
frequent n-grams per corpus slice, a Zipf-law fit over the term
frequency distribution, and a per-document term-rarity score.

These are the analyses a pretraining team runs on a new crawl before
any filtering decision: dominant boilerplate n-grams reveal template
spam, the Zipf slope is a one-number sanity check that the corpus
looks like natural language (slope ~ -1), and IDF rarity separates
documents made of common filler from documents carrying rare content.

Scale shape: everything here is explode -> hash aggregate -> (small)
broadcast join or per-group window over an ALREADY AGGREGATED frame.
The exploded token stream is the only wide flow and it carries
(slice_key, token) pairs, never documents; the vocabulary and top-k
frames downstream are tiny relative to the corpus, so at 100 TB the
cost is one scan + one shuffle of narrow pairs — the same shape as
q_llm_unigram_logprob, which this module deliberately mirrors.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no corpus-statistics surface; these derive
from the driver's LLM-pipeline mandate and published corpus-audit
practice (WIMBD; Zipf fits in corpus linguistics; sklearn's smoothed
IDF used already by q_llm_tfidf_top_terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, spread_table
from ex_hivent_spark.functions.decimals import (
    davg,
    dround,
    sql_davg,
    sql_dround,
    sql_dsum,
)
from ex_hivent_spark.plans.registry import register

TOPK_NGRAMS = 10
ZIPF_TOP_TERMS = 100


@register(
    "q_llm_topk_ngrams",
    oracle=f"""
    WITH toks AS (
      SELECT lang, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT lang, t, unnest(range(1, len(t) - 1)) AS i
      FROM toks WHERE len(t) >= 3
    ),
    ng AS (
      SELECT lang, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS ngram
      FROM pos
    ),
    c AS (
      SELECT lang, ngram, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM ng GROUP BY lang, ngram
    ),
    r AS (
      SELECT lang, ngram, n_occurrences,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_occurrences DESC, ngram) AS rn
      FROM c
    )
    SELECT lang, ngram, n_occurrences, rn FROM r WHERE rn <= {TOPK_NGRAMS}
    """,
)
def q_llm_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIMBD-style dominant-n-gram audit: the top-10 word trigrams per
    language by occurrence count (ties broken lexicographically) — the
    first report run on any new crawl, because boilerplate ("click here
    to subscribe") dominates it and drives the template-filter rules.

    Plan: trigrams are built inside the row with one ``transform`` over
    a token index sequence (no self-join of exploded tokens — the
    classic n-gram-by-join formulation shuffles the corpus n times),
    then ONE explode feeds ONE hash aggregate on (lang, ngram);
    the ranking window runs over the aggregated counts frame, which is
    |distinct trigrams| — far smaller than the corpus. Counts are
    integers; fully deterministic, no rounding anywhere."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    d = d.select("lang", t.alias("t")).filter(F.size("t") >= 3)
    trigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + 1),
            F.element_at(F.col("t"), i + 2),
        ),
    )
    counts = (
        d.select("lang", F.explode(trigrams).alias("ngram"))
        .groupBy("lang", "ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("n_occurrences").desc(), "ngram"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_NGRAMS)
        .select("lang", "ngram", "n_occurrences", "rn")
    )


@register(
    "q_llm_zipf_fit",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY lang, tok
    ),
    ranked AS (
      SELECT lang, c,
             row_number() OVER (PARTITION BY lang
                                ORDER BY c DESC, tok) AS rank
      FROM freq
    ),
    xy AS (
      SELECT lang,
             {sql_dround("ln(CAST(rank AS DOUBLE))", 6)} AS x,
             {sql_dround("ln(CAST(c AS DOUBLE))", 6)} AS y
      FROM ranked WHERE rank <= {ZIPF_TOP_TERMS}
    ),
    sums AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
             {sql_dsum("x", "sx")}, {sql_dsum("y", "sy")},
             {sql_dsum(sql_dround("x * y", 6), "sxy")},
             {sql_dsum(sql_dround("x * x", 6), "sxx")}
      FROM xy GROUP BY lang
    )
    SELECT lang, n_terms,
           {sql_dround(
               "(n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)", 6
           )} AS zipf_slope,
           {sql_dround(
               "(sy - ((n_terms * sxy - sx * sy)"
               " / (n_terms * sxx - sx * sx)) * sx) / n_terms", 6
           )} AS zipf_intercept
    FROM sums
    """,
)
def q_llm_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per language: OLS of ln(frequency) on ln(rank) over
    each language's top-100 terms. Natural-language corpora fit a slope
    near -1 (Zipf 1949); a much flatter or steeper slope is the classic
    one-number flag for machine-generated or template-heavy text, so
    corpus audits report it per slice.

    Plan: one explode + hash aggregate builds the per-language term
    frequencies; the rank window and the OLS moment aggregate both run
    over frames no larger than |vocab| (and the fit itself over exactly
    100 rows per language) — at 100 TB only the (lang, token) pair
    stream is corpus-sized. Determinism: per-row ``ln`` is e6-rounded
    before the moment sums (the repo's libm-drift convention, same as
    q_llm_unigram_logprob), the cross/square products are e6-rounded
    BEFORE their decimal cast (a full-precision computed double cast
    straight to decimal(25,6) can land on a half-way tie the two
    engines round differently — the hazard q_ts_cusum_changepoint's
    docstring records as measured), the four moments are decimal sums,
    and the closed-form slope/intercept are single double expressions
    over those — e6-rounded for the final hash."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "tok")
    xy = (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ZIPF_TOP_TERMS)
        .select(
            "lang",
            dround(F.log(F.col("rank").cast("double")), 6).alias("x"),
            dround(F.log(F.col("c").cast("double")), 6).alias("y"),
        )
    )
    dec = "decimal(25,6)"
    sums = xy.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(dround(F.col("x") * F.col("y"), 6).cast(dec))
        .cast("double")
        .alias("sxy"),
        F.sum(dround(F.col("x") * F.col("x"), 6).cast(dec))
        .cast("double")
        .alias("sxx"),
    )
    slope = (
        F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx"))
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n_terms")
    return sums.select(
        "lang",
        "n_terms",
        dround(slope, 6).alias("zipf_slope"),
        dround(intercept, 6).alias("zipf_intercept"),
    )


@register(
    "q_llm_idf_rarity",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
      )
    ),
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT dt.doc_id,
             {sql_dround(
                 "ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0", 6
             )} AS idf,
             CASE WHEN df.df = 1 THEN 1 ELSE 0 END AS is_rare
      FROM dt JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct_terms,
           CAST(sum(is_rare) AS BIGINT) AS n_rare_terms,
           {sql_davg("idf", "rarity_score")}
    FROM scored GROUP BY doc_id
    """,
)
def q_llm_idf_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document term-rarity score: the mean smoothed IDF
    (ln((N+1)/(df+1)) + 1, sklearn's formulation — shared with
    q_llm_tfidf_top_terms) over each document's DISTINCT terms, plus
    how many of its terms are corpus-unique (df = 1). Data-selection
    pipelines use exactly this to separate documents carrying rare
    content worth keeping from documents made of high-frequency filler
    — the cheap lexical stand-in for DSIR-style importance weighting.

    Plan: one explode + distinct builds the (doc, term) incidence —
    computed ONCE and lazily checkpointed, because it feeds both the
    document-frequency aggregate and the score join-back (without the
    cut, Catalyst re-scans and re-explodes the corpus for each
    consumer — exactly the double work the shared-shingle-stream
    pattern in q_llm_minhash_error avoids). The df table aggregates it
    to |vocab| rows and joins back BROADCAST (the vocabulary is tiny
    next to the corpus at any scale), and the per-doc score is one
    hash aggregate. Determinism: idf is e6-rounded per row before the
    decimal-sum average; counts are integers."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # one scalar; reused as a literal
    dt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    df_ = dt.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf = dround(
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0, 6
    )
    scored = dt.join(F.broadcast(df_), "term").select(
        "doc_id",
        idf.alias("idf"),
        F.when(F.col("df") == 1, 1).otherwise(0).alias("is_rare"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_terms"),
        F.sum("is_rare").cast("bigint").alias("n_rare_terms"),
        davg("idf", "rarity_score"),
    )


@register(
    "q_llm_ctfidf_topics",
    oracle=f"""
    WITH dl AS (
      SELECT d.doc_id, e.label, d.text
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    toks AS (
      SELECT label, unnest(string_split(text, ' ')) AS term FROM dl
    ),
    tfc AS (
      SELECT label, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY label, term
    ),
    ft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY term
    ),
    tot AS (
      SELECT CAST(count(*) AS DOUBLE)
                 / (SELECT count(DISTINCT label) FROM dl) AS a
      FROM toks
    ),
    scored AS (
      SELECT label, term, tf,
             tf * {sql_dround("ln(1.0 + a / f)", 6)} AS w
      FROM tfc JOIN ft USING (term) CROSS JOIN tot
    ),
    ranked AS (
      SELECT label, term,
             {sql_dround("w", 6)} AS ctfidf_e6,
             row_number() OVER (PARTITION BY label
                                ORDER BY w DESC, term) AS rn
      FROM scored
    )
    SELECT label, term, ctfidf_e6, rn FROM ranked WHERE rn <= 3
    """,
)
def q_llm_ctfidf_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based TF-IDF cluster labeling (c-TF-IDF, Grootendorst 2022
    — the BERTopic topic-naming step): treat each embedding cluster
    (the label column) as ONE concatenated document, weight each term
    by tf_class * ln(1 + A / f_term) with A = average tokens per class
    and f = corpus-wide term frequency, and report the top-3 terms per
    cluster — the human-readable name of what each embedding cluster
    contains.

    Plan: the doc→label join broadcasts the |docs|-row label map, the
    token explode feeds TWO hash aggregates (per-class tf and
    corpus-wide f), the |vocab|-row f table joins back broadcast, and
    the ranking window runs over the per-class vocab frame.
    Determinism: tf/f are integers, A is one exact division, the idf
    log is e6-rounded per row, and ranking uses the bit-identical
    tf*idf product with a term tie-break."""
    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    dl = d.join(F.broadcast(emb), "doc_id").select("label", "text")
    toks = dl.select(
        "label", F.explode(F.split("text", " ")).alias("term")
    ).localCheckpoint(eager=False)  # reused: tf, f, and the two scalars
    tfc = toks.groupBy("label", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    ft = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    total_toks = toks.count()
    n_classes = toks.select("label").distinct().count()
    a = float(total_toks) / n_classes
    w_col = F.col("tf") * dround(F.log(1.0 + F.lit(a) / F.col("f")), 6)
    scored = tfc.join(F.broadcast(ft), "term").select(
        "label", "term", w_col.alias("w")
    )
    win = Window.partitionBy("label").orderBy(F.col("w").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .select(
            "label", "term", dround(F.col("w"), 6).alias("ctfidf_e6"), "rn"
        )
    )


@register(
    "q_llm_jsd_sources",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    st AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st
      FROM toks GROUP BY source, tok
    ),
    ct AS (
      SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM ct),
    ns AS (
      SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s
      FROM st GROUP BY source
    ),
    terms AS (
      SELECT st.source,
             (CAST(st.c_st AS DOUBLE) / ns.n_s) AS p,
             (CAST(ct.c_t AS DOUBLE) / tot.n) AS q,
             ct.c_t AS c_t,
             tot.n AS n
      FROM st JOIN ct USING (tok)
           JOIN ns ON st.source = ns.source
           CROSS JOIN tot
    ),
    contrib AS (
      SELECT source,
             0.5 * (p * ({sql_dround("ln(p / ((p + q) / 2))", 6)})
                    + q * ({sql_dround("ln(q / ((p + q) / 2))", 6)})) AS term,
             c_t,
             n
      FROM terms
    )
    SELECT c.source,
           CAST(any_value(ns.n_s) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(c.term AS DECIMAL(38,15))) AS DOUBLE)
           + 0.5 * 0.693147
             * (1 - CAST(sum(c.c_t) AS DOUBLE)
                    / CAST(any_value(c.n) AS DOUBLE))
             AS jsd
    FROM contrib c JOIN ns ON c.source = ns.source
    GROUP BY c.source
    """,
)
def q_llm_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between each source's unigram
    distribution and the corpus-wide distribution — the mixture-design
    number that says WHICH crawl slices are lexically unusual (high
    JSD = a source whose vocabulary usage diverges from the blend;
    the symmetric, bounded [0, ln2] cousin of KL used by data-mixture
    papers such as DoReMi/DSIR for domain weighting).

    The absent-token mass needs no |sources|×|vocab| densification:
    for tokens a source never uses, p = 0 and the JSD contribution is
    ½·q·ln 2, so JSD = ½·Σ_present[p·ln(p/m) + q·ln(q/m)]
    + ½·ln 2·(1 − Σ_present q) — only PRESENT (source, token) pairs are
    ever materialized.

    Plan: one token explode feeds the (source, token) hash aggregate;
    the |vocab|-row corpus-count frame joins back on token (hash join —
    both sides are aggregates, orders of magnitude smaller than the
    corpus); totals ride as broadcast one-row/|sources|-row aggregates.
    Determinism: p, q, m are exact integer-ratio arithmetic, each ln is
    e6-rounded before its multiply, the per-source term sum rides a
    decimal(38,15) detour (the sum is bounded by ln 2, so the unscaled
    value stays far below 2^53 and the closing decimal→double cast is
    exact in both engines), and the closing formula (including the
    e6-rounded ln 2 = 0.693147 literal) is written identically in both
    engines. The absent-q mass is summed as EXACT integer token counts
    (Σ c_t as bigint, divided by n once at the end) rather than a
    per-token decimal sum — a decimal(25,6) per-token q would quantize
    every q < 5e-7 to zero, silently dropping long-tail probability
    mass and inflating the absent-mass term as vocabulary grows at the
    100 TB design point."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_st")
    ).localCheckpoint(eager=False)  # ct/ns/tot all derive from st:
    # pin it so the corpus is scanned+exploded ONCE, not once per branch
    ct = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    tot = ct.agg(F.sum("c_t").alias("n"))
    ns = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    joined = (
        st.join(ct, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("c_st").cast("double") / F.col("n_s")
    q = F.col("c_t").cast("double") / F.col("n")
    m = (p + q) / 2
    contrib = joined.select(
        "source",
        "n_s",
        (
            0.5 * (p * dround(F.log(p / m), 6) + q * dround(F.log(q / m), 6))
        ).alias("term"),
        "c_t",
        "n",
    )
    return contrib.groupBy("source").agg(
        F.any_value("n_s").alias("n_tokens"),
        (
            F.sum(F.col("term").cast("decimal(38,15)")).cast("double")
            + 0.5
            * 0.693147
            * (
                1
                - F.sum("c_t").cast("double")
                / F.any_value("n").cast("double")
            )
        ).alias("jsd"),
    )


@register(
    "q_llm_good_turing",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    tc AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS r
      FROM toks GROUP BY lang, tok
    )
    SELECT lang,
           CAST(sum(r) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(r) AS p0_unseen,
           2.0 * sum(CASE WHEN r = 2 THEN 1 ELSE 0 END)
             / nullif(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END), 0)
             AS r_star_1
    FROM tc GROUP BY lang
    """,
)
def q_llm_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing vocabulary accounting per language: hapax (N1) and
    dis legomena (N2) counts, the Good–Turing unseen-mass estimate
    p0 = N1/N (how much probability a language model should reserve
    for words this corpus slice has never seen), and the smoothed
    adjusted singleton count r*₁ = 2·N2/N1 — the corpus-coverage
    number that tells a pretraining team whether a slice is large
    enough that its vocabulary has stopped growing.

    Plan: token explode → (lang, token) hash aggregate → per-lang
    conditional aggregate over the |vocab|-row frame; both aggregates
    combine map-side and nothing wider than (lang, token) ever
    shuffles. Determinism: everything is integer counts plus two exact
    IEEE divisions (N1=0 guarded by nullif/try_divide on both
    engines)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    tc = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return tc.groupBy("lang").agg(
        F.sum("r").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        one_if(F.col("r") == 1).cast("bigint").alias("n1"),
        one_if(F.col("r") == 2).cast("bigint").alias("n2"),
        (
            one_if(F.col("r") == 1).cast("double") / F.sum("r")
        ).alias("p0_unseen"),
        F.try_divide(
            2.0 * one_if(F.col("r") == 2),
            F.nullif(one_if(F.col("r") == 1), F.lit(0)),
        ).alias("r_star_1"),
    )


PMI_MIN_DOCS = 25  # min co-occurrence document frequency
PMI_TOP = 20


@register(
    "q_llm_pmi_collocations",
    oracle=f"""
    WITH dt AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY tok
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok
      HAVING count(*) >= {PMI_MIN_DOCS}
    ),
    scored AS (
      SELECT tok_a, tok_b, c_ab, da.c AS c_a, db.c AS c_b,
             {sql_dround(
                 "ln(CAST(tot.n AS DOUBLE) * c_ab / (da.c * db.c))", 6
             )} AS pmi
      FROM pairs JOIN df da ON da.tok = pairs.tok_a
                 JOIN df db ON db.tok = pairs.tok_b
                 CROSS JOIN tot
    )
    SELECT tok_a, tok_b, c_ab, c_a, c_b, pmi
    FROM scored
    ORDER BY pmi DESC, tok_a, tok_b
    LIMIT {PMI_TOP}
    """,
)
def q_llm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations at document
    granularity: for token pairs co-occurring in ≥ PMI_MIN_DOCS
    documents, PMI = ln(N·df(a,b) / (df(a)·df(b))) — the association
    measure that separates "genuinely travel together" pairs from
    merely-frequent ones (TF-style top-ngrams can't), used for phrase
    mining, tokenizer merge candidates, and template detection in
    crawl corpora. Top PMI_TOP pairs, deterministic order.

    Plan: per-doc DISTINCT tokens explode once, the within-doc pair
    frame is an equi-join on doc_id (quadratic only in per-doc
    VOCABULARY — bounded by document length, never corpus size), pair
    counts hash-aggregate with map-side combine, the two doc-frequency
    lookups are hash joins against the |vocab|-row frame, and the
    top-N is a TakeOrdered (per-partition top + driver merge, no
    global sort). Determinism: integer counts, one e6 ln, ties broken
    lexicographically."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split("text", " "))
        ).alias("tok"),
    ).localCheckpoint(eager=False)  # both pair-join sides + df derive
    # from one explode
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = dt.alias("a"), dt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_DOCS)
    )
    scored = (
        pairs.join(df.withColumnRenamed("c", "c_a"), pairs.tok_a == df.tok)
        .drop("tok")
        .join(
            df.withColumnRenamed("c", "c_b").withColumnRenamed(
                "tok", "tok2"
            ),
            F.col("tok_b") == F.col("tok2"),
        )
        .drop("tok2")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "c_a",
            "c_b",
            dround(
                F.log(
                    F.col("n").cast("double")
                    * F.col("c_ab")
                    / (F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "tok_a", "tok_b"
    ).limit(PMI_TOP)


KN_DISCOUNT = 0.75
KN_TOP = 30


@register(
    "q_llm_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS b
      FROM toks WHERE len(t) >= 2
    ),
    split AS (
      SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
      FROM bg
    ),
    c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM split GROUP BY w1, w2
    ),
    left_stats AS (
      SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS fanout
      FROM c12 GROUP BY w1
    ),
    cont AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n_cont
      FROM c12 GROUP BY w2
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM c12)
    SELECT c12.w1, c12.w2, c12.c AS c_bigram,
           ls.c1 AS c_left, ls.fanout, cont.n_cont,
           {sql_dround(
               "greatest(c12.c - " + str(KN_DISCOUNT) + ", 0) / ls.c1"
               " + (" + str(KN_DISCOUNT) + " * ls.fanout / ls.c1)"
               " * (CAST(cont.n_cont AS DOUBLE) / tot.t_types)", 6
           )} AS p_kn
    FROM c12 JOIN left_stats ls USING (w1)
             JOIN cont USING (w2)
             CROSS JOIN tot
    ORDER BY c_bigram DESC, w1, w2
    LIMIT {KN_TOP}
    """,
)
def q_llm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities for the corpus's
    top bigrams: P(w₂|w₁) = max(c(w₁w₂)−d, 0)/c(w₁) +
    d·fanout(w₁)/c(w₁) · P_cont(w₂), with the continuation probability
    P_cont(w₂) = |{{w₁ : c(w₁w₂)>0}}| / |bigram types| — the smoothing
    that made n-gram LMs work ("San Francisco" makes "Francisco"
    frequent but NOT diverse, so KN correctly refuses to predict it
    after arbitrary words). The classical LM counterpart to the
    Good–Turing mass estimate (q_llm_good_turing), and the statistic a
    KN-smoothed data-quality LM (CCNet-style) derives from a corpus.

    Plan: bigrams are built inside the row (one transform over a
    token-index sequence — no self-join), ONE explode feeds the
    (w₁,w₂) hash aggregate, and all three marginal frames (left
    counts+fanout, continuation counts, type total) are aggregates OF
    that frame — vocab-sized, hash-joined back. TakeOrdered top-30.
    Determinism: every input to the closed form is an integer count;
    one e6 rounding of the final probability."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    toks = d.select(t.alias("t")).filter(F.size("t") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("w1"),
            F.element_at(F.col("t"), i + 1).alias("w2"),
        ),
    )
    c12 = (
        toks.select(F.explode(bigrams).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # three marginal aggregates +
        # the final join all read this frame: one corpus explode
    )
    left_stats = c12.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("fanout"),
    )
    cont = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cont")
    )
    tot = c12.agg(F.count(F.lit(1)).cast("bigint").alias("t_types"))
    p_kn = dround(
        F.greatest(F.col("c") - KN_DISCOUNT, F.lit(0.0)) / F.col("c1")
        + (KN_DISCOUNT * F.col("fanout") / F.col("c1"))
        * (F.col("n_cont").cast("double") / F.col("t_types")),
        6,
    )
    return (
        c12.join(left_stats, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").alias("c_bigram"),
            F.col("c1").alias("c_left"),
            "fanout",
            "n_cont",
            p_kn.alias("p_kn"),
        )
        .orderBy(F.col("c_bigram").desc(), "w1", "w2")
        .limit(KN_TOP)
    )


LOGODDS_ALPHA = 0.01  # Dirichlet pseudo-count per term
LOGODDS_TOP = 15


@register(
    "q_llm_logodds_terms",
    oracle=f"""
    WITH toks AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    tc AS (
      SELECT tok,
             CAST(sum(grp) AS BIGINT) AS c1,
             CAST(sum(1 - grp) AS BIGINT) AS c2
      FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS v
      FROM tc
    ),
    scored AS (
      SELECT tok, c1, c2,
             ({sql_dround(
                 f"ln((c1 + {LOGODDS_ALPHA})"
                 f" / (n1 + {LOGODDS_ALPHA} * v - c1 - {LOGODDS_ALPHA}))", 6
             )})
             - ({sql_dround(
                 f"ln((c2 + {LOGODDS_ALPHA})"
                 f" / (n2 + {LOGODDS_ALPHA} * v - c2 - {LOGODDS_ALPHA}))", 6
             )}) AS delta,
             {sql_dround(
                 f"sqrt(1.0 / (c1 + {LOGODDS_ALPHA})"
                 f" + 1.0 / (c2 + {LOGODDS_ALPHA}))", 6
             )} AS se
      FROM tc CROSS JOIN tot
    )
    SELECT tok, c1, c2,
           {sql_dround("delta / se", 6)} AS z_logodds
    FROM scored
    ORDER BY abs({sql_dround("delta / se", 6)}) DESC, tok
    LIMIT {LOGODDS_TOP}
    """,
)
def q_llm_logodds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-odds-ratio with informative Dirichlet prior (Monroe et al.
    2008, "Fightin' Words"): which terms most distinguish the English
    slice from the rest of the corpus, by the z-scored smoothed
    log-odds delta — THE corpus-comparison statistic (raw frequency
    ratios over-rank rare terms; the prior + per-term variance fix
    exactly that), used for slice characterization and contamination
    triage ("what vocabulary makes this source different?").

    Plan: one token explode → per-term two-group conditional aggregate
    (map-side combining), totals broadcast as a one-row frame, per-term
    closed form, TakeOrdered top-|z|. Nothing wider than (token, two
    counts) shuffles. Determinism: integer counts; each ln and the
    sqrt are e6-rounded (one-libm-call convention); the final ratio is
    e6-rounded and ties break lexicographically."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    tc = toks.groupBy("tok").agg(
        F.sum("grp").cast("bigint").alias("c1"),
        F.sum(1 - F.col("grp")).cast("bigint").alias("c2"),
    ).localCheckpoint(eager=False)  # totals + scoring share one pass
    tot = tc.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("v"),
    )
    a = LOGODDS_ALPHA
    delta = dround(
        F.log(
            (F.col("c1") + a)
            / (F.col("n1") + a * F.col("v") - F.col("c1") - a)
        ),
        6,
    ) - dround(
        F.log(
            (F.col("c2") + a)
            / (F.col("n2") + a * F.col("v") - F.col("c2") - a)
        ),
        6,
    )
    se = dround(
        F.sqrt(1.0 / (F.col("c1") + a) + 1.0 / (F.col("c2") + a)), 6
    )
    z = dround(delta / se, 6)
    return (
        tc.crossJoin(F.broadcast(tot))
        .select("tok", "c1", "c2", z.alias("z_logodds"))
        .orderBy(F.abs(F.col("z_logodds")).desc(), "tok")
        .limit(LOGODDS_TOP)
    )


HEAPS_BLOCK = 64  # doc-id blocks for the cumulative prefix sums


@register(
    "q_llm_heaps_law",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
      FROM toks GROUP BY doc_id
    ),
    firsts AS (
      SELECT min(doc_id) AS first_doc FROM toks GROUP BY tok
    ),
    new_per_doc AS (
      SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS v_new
      FROM firsts GROUP BY first_doc
    ),
    cum AS (
      SELECT p.doc_id,
             CAST(sum(p.n_tok) OVER (ORDER BY p.doc_id) AS BIGINT) AS n,
             CAST(sum(coalesce(nv.v_new, 0)) OVER (ORDER BY p.doc_id)
                  AS BIGINT) AS v
      FROM per_doc p LEFT JOIN new_per_doc nv ON nv.doc_id = p.doc_id
    ),
    xy AS (
      SELECT {sql_dround("ln(CAST(n AS DOUBLE))", 6)} AS x,
             {sql_dround("ln(CAST(v AS DOUBLE))", 6)} AS y
      FROM cum
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             {sql_dsum("x", "sx")}, {sql_dsum("y", "sy")},
             {sql_dsum(sql_dround("x * y", 6), "sxy")},
             {sql_dsum(sql_dround("x * x", 6), "sxx")}
      FROM xy
    ),
    tot AS (
      SELECT CAST(max(n) AS BIGINT) AS total_tokens,
             CAST(max(v) AS BIGINT) AS vocab
      FROM cum
    )
    SELECT s.n_docs, t.total_tokens, t.vocab,
           {sql_dround(
               "(s.n_docs * s.sxy - s.sx * s.sy)"
               " / (s.n_docs * s.sxx - s.sx * s.sx)", 6
           )} AS heaps_beta,
           {sql_dround(
               "(s.sy - ((s.n_docs * s.sxy - s.sx * s.sy)"
               " / (s.n_docs * s.sxx - s.sx * s.sx)) * s.sx) / s.n_docs",
               6,
           )} AS heaps_lnk
    FROM sums s CROSS JOIN tot t
    """,
)
def q_llm_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(N) ≈ K·N^β, estimated by
    OLS of ln(cumulative vocabulary) on ln(cumulative tokens) over the
    doc-id-ordered corpus prefix — the companion to the Zipf fit
    (q_llm_zipf_fit): β ≈ 0.4–0.6 is natural language; β near 1 means
    the vocabulary never saturates (ids/hashes/noise in the text —
    tokenizer poison), near 0 means template spam. The growth-curve
    view of what Good–Turing (q_llm_good_turing) measures pointwise.

    Plan: a token's FIRST occurrence doc (one hash aggregate over the
    (token → min doc) frame) turns cumulative-distinct counting — the
    usually-hard part — into an ordinary cumulative SUM of per-doc
    new-token counts; both cumulative sums ride the deterministic
    blocked prefix machinery (operators/prefix.py, doc-id DIV 64
    blocks — no single-partition window; the recursive fold covers
    any doc count) and the OLS moments are one aggregate over the
    per-doc frame. Determinism: integer counts, e6 lns, e6-rounded
    products before the decimal moment sums (the Zipf conventions)."""
    from ex_hivent_spark.operators.prefix import running_totals_blocked

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).localCheckpoint(eager=False)  # per-doc counts + first-occurrence
    # frame share one explode
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    new_per_doc = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v_new"))
    )
    base = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce(F.col("v_new"), F.lit(0).cast("bigint")).alias(
                "v_new"
            ),
        )
        .withColumn("blk", F.expr(f"doc_id DIV {HEAPS_BLOCK}"))
    )
    cum = running_totals_blocked(
        base, ["doc_id"], ["blk"], {"n_tok": "n", "v_new": "v"}
    ).localCheckpoint(eager=False)  # OLS moments + totals probe
    xy = cum.select(
        dround(F.log(F.col("n").cast("double")), 6).alias("x"),
        dround(F.log(F.col("v").cast("double")), 6).alias("y"),
    )
    dec = "decimal(25,6)"
    sums = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(dround(F.col("x") * F.col("y"), 6).cast(dec))
        .cast("double")
        .alias("sxy"),
        F.sum(dround(F.col("x") * F.col("x"), 6).cast(dec))
        .cast("double")
        .alias("sxx"),
    )
    tot = cum.agg(
        F.max("n").cast("bigint").alias("total_tokens"),
        F.max("v").cast("bigint").alias("vocab"),
    )
    n = F.col("n_docs")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.crossJoin(F.broadcast(tot)).select(
        "n_docs",
        "total_tokens",
        "vocab",
        dround(slope, 6).alias("heaps_beta"),
        dround((F.col("sy") - slope * F.col("sx")) / n, 6).alias(
            "heaps_lnk"
        ),
    )


@register(
    "q_llm_distinct_ngrams",
    oracle="""
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
      SELECT source, unnest(t) AS g FROM toks
    ),
    uc AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS total_uni,
             CAST(count(DISTINCT g) AS BIGINT) AS distinct_uni
      FROM uni GROUP BY source
    ),
    bi AS (
      SELECT source, t[i] || ' ' || t[i + 1] AS g
      FROM (SELECT source, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2)
    ),
    bc AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS total_bi,
             CAST(count(DISTINCT g) AS BIGINT) AS distinct_bi
      FROM bi GROUP BY source
    )
    SELECT uc.source, total_uni, distinct_uni, total_bi, distinct_bi,
           CAST(distinct_uni AS DOUBLE) / total_uni AS distinct_1,
           CAST(distinct_bi AS DOUBLE) / total_bi AS distinct_2
    FROM uc JOIN bc ON uc.source = bc.source
    """,
)
def q_llm_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity per source — the generation-diversity /
    template-collapse audit (Li et al.'s distinct-1/distinct-2): the
    share of unigram and bigram OCCURRENCES that are distinct types. A
    crawl slice whose distinct-2 craters is boilerplate-dominated;
    synthetic data with low distinct-n is mode-collapsed.

    Plan: bigrams are built inside the row with one transform over a
    token index sequence (the q_llm_topk_ngrams pattern — no n-gram
    self-join), each n-gram stream collapses through a two-level
    (source, gram) → source hash aggregate (exact distinct without
    count(DISTINCT) over raw rows: the first level IS the distinct),
    and the two |sources|-row frames broadcast-join. All-integer
    counts; closing ratios are exact integer-ratio IEEE divisions."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.split("text", " ").alias("t"))
    uni = toks.select("source", F.explode("t").alias("g"))
    uc = (
        uni.groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("total_uni"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_uni"),
        )
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("t"), i), F.element_at(F.col("t"), i + 1)
        ),
    )
    bi = toks.filter(F.size("t") >= 2).select(
        "source", F.explode(bigrams).alias("g")
    )
    bc = (
        bi.groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("total_bi"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_bi"),
        )
    )
    return uc.join(F.broadcast(bc), "source").select(
        "source",
        "total_uni",
        "distinct_uni",
        "total_bi",
        "distinct_bi",
        (F.col("distinct_uni").cast("double") / F.col("total_uni")).alias(
            "distinct_1"
        ),
        (F.col("distinct_bi").cast("double") / F.col("total_bi")).alias(
            "distinct_2"
        ),
    )


def _entropy_sql(gram_cte: str) -> str:
    """H = e6( e6(log2(N)) - S/N ) with S = sum(c * e6(log2(c))) —
    the exact-integer-counts corpus entropy closing, shared by the
    unigram and bigram arms of q_llm_entropy_ladder."""
    return f"""
      SELECT CAST(sum(c) AS BIGINT) AS n_grams,
             CAST(count(*) AS BIGINT) AS n_distinct,
             {sql_dround(
                 "floor(log2(CAST(sum(c) AS DOUBLE)) * 1000000.0 + 0.5)"
                 " / 1000000.0"
                 " - CAST(sum(CAST(c * (floor(log2(CAST(c AS DOUBLE))"
                 " * 1000000.0 + 0.5) / 1000000.0) AS DECIMAL(25,6)))"
                 " AS DOUBLE) / sum(c)", 6)} AS h_bits
      FROM {gram_cte}
    """


@register(
    "q_llm_entropy_ladder",
    oracle=f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
      SELECT unnest(t) AS g FROM toks
    ),
    uc AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY g
    ),
    bipos AS (
      SELECT t, unnest(range(1, len(t))) AS i FROM toks
      WHERE len(t) >= 2
    ),
    bi AS (
      SELECT t[i] || ' ' || t[i + 1] AS g FROM bipos
    ),
    bc AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY g
    ),
    h1 AS ({_entropy_sql("uc")}),
    h2 AS ({_entropy_sql("bc")})
    SELECT h1.n_grams AS n_unigrams,
           h1.n_distinct AS n_distinct_unigrams,
           h1.h_bits AS h_unigram,
           h2.n_grams AS n_bigrams,
           h2.n_distinct AS n_distinct_bigrams,
           h2.h_bits AS h_bigram,
           h2.h_bits - h1.h_bits AS h_conditional
    FROM h1 CROSS JOIN h2
    """,
)
def q_llm_entropy_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus entropy ladder: Shannon entropy (bits) of the word
    unigram and bigram distributions plus the conditional
    next-word entropy H(w₂|w₁) = H₂ − H₁ — the information-theoretic
    redundancy audit (a boilerplate-heavy crawl shows low conditional
    entropy long before dedup finds the templates; the ladder is the
    corpus-level counterpart of q_llm_char_entropy's per-doc score and
    the model-free floor under q_llm_doc_perplexity).

    Plan: grams build inside the row (no token self-join), ONE explode
    feeds ONE hash aggregate per order, each collapsing to a one-row
    moment frame — two scans (the two orders), broadcast-joined at one
    row each. H = log2(N) − Σc·log2(c)/N needs only (c) counts, so no
    per-gram probabilities shuffle. Determinism: counts are exact
    integers; each log2 (libm) is e6-rounded per distinct gram on
    both sides; the weighted sum rides the decimal detour; the
    closing is e6-rounded. Scale bound: c·log2(c) stays under the
    2^53/1e6 decimal bound through ~1e11-token corpora."""
    # r16 OPTIMIZATION (guide §2.5/§6): spread the single-row-group
    # documents scan so the per-row shingle/window map work runs on
    # every core instead of one task; no-op on multi-split inputs.
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    t = F.split("text", " ")

    def entropy_of(grams: DataFrame) -> DataFrame:
        counts = grams.groupBy("g").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        lc = dround(F.log2(F.col("c").cast("double")), 6)
        return counts.agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            dround(
                dround(F.log2(F.sum("c").cast("double")), 6)
                - F.sum((F.col("c") * lc).cast("decimal(25,6)"))
                .cast("double")
                / F.sum("c"),
                6,
            ).alias("h_bits"),
        )

    uni = d.select(F.explode(t).alias("g"))
    big = d.filter(F.size(t) >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, i),
                    F.element_at(t, i + 1),
                ),
            )
        ).alias("g")
    )
    h1 = entropy_of(uni).select(
        F.col("n_grams").alias("n_unigrams"),
        F.col("n_distinct").alias("n_distinct_unigrams"),
        F.col("h_bits").alias("h_unigram"),
    )
    h2 = entropy_of(big).select(
        F.col("n_grams").alias("n_bigrams"),
        F.col("n_distinct").alias("n_distinct_bigrams"),
        F.col("h_bits").alias("h_bigram"),
    )
    return h1.crossJoin(F.broadcast(h2)).select(
        "n_unigrams",
        "n_distinct_unigrams",
        "h_unigram",
        "n_bigrams",
        "n_distinct_bigrams",
        "h_bigram",
        (F.col("h_bigram") - F.col("h_unigram")).alias("h_conditional"),
    )


@register(
    "q_llm_lexical_profile",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS f
      FROM toks GROUP BY source, tok
    ),
    m AS (
      SELECT source,
             CAST(sum(f) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS v,
             CAST(sum(f * f) AS BIGINT) AS s2
      FROM tf GROUP BY source
    )
    SELECT source, n AS n_tokens, v AS n_types,
           {sql_dround("CAST(v AS DOUBLE) / n", 6)} AS ttr,
           {sql_dround(
               "10000.0 * (CAST(s2 AS DOUBLE) - n)"
               " / (CAST(n AS DOUBLE) * n)", 6)} AS yule_k,
           CASE WHEN n <= 1 THEN NULL ELSE
             {sql_dround(
                 "(CAST(s2 AS DOUBLE) - n)"
                 " / (CAST(n AS DOUBLE) * (n - 1))", 6)}
           END AS simpson_d
    FROM m ORDER BY source
    """,
)
def q_llm_lexical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: type-token ratio, Yule's
    characteristic K = 10⁴·(Σf² − N)/N², and Simpson's repeat-rate
    D = Σf(f−1)/(N(N−1)) over the token frequency spectrum — the
    vocabulary-concentration fingerprint (K and D rise when a source
    leans on few words: boilerplate, templated spam, scraped nav
    chrome) that complements q_llm_zipf_fit's slope and
    q_llm_mattr_diversity's per-document reading with a per-SOURCE
    corpus-level one.

    Plan: one token explode + two nested hash aggregates ((source,
    token) term frequencies, then per-source moments) — map-side
    combine does the heavy lifting and only (source, token, count)
    triples shuffle. Determinism: frequencies and both moments are
    exact BIGINTs; closings cast each moment to double BEFORE the
    products (the granger overflow discipline — N² wraps int64 at
    N ≳ 3e9 tokens); three e6-rounded ratios; the single-token
    degenerate source reads NULL Simpson on both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    m = tf.groupBy("source").agg(
        F.sum("f").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("s2"),
    )
    n, v, s2 = (
        F.col("n").cast("double"),
        F.col("v").cast("double"),
        F.col("s2").cast("double"),
    )
    return m.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        dround(v / F.col("n"), 6).alias("ttr"),
        dround(10000.0 * (s2 - F.col("n")) / (n * F.col("n")), 6).alias(
            "yule_k"
        ),
        F.when(F.col("n") <= 1, F.lit(None).cast("double"))
        .otherwise(
            dround((s2 - F.col("n")) / (n * (F.col("n") - 1)), 6)
        )
        .alias("simpson_d"),
    ).orderBy("source")
