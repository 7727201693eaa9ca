"""LLM-pipeline deduplication operators: exact (hash-groupBy) and
MinHash-LSH near-duplicate detection.

Everything is built-in Spark expressions (md5-prefix integer hashing /
higher-order array functions) — no Python UDFs, so the whole pipeline stays in
whole-stage codegen and scales linearly:

- exact dedup: one shuffle on the content hash.
- MinHash LSH: per-doc signature computation is map-only; candidate
  generation is an equi-join on (band_id, band_hash) buckets — the only
  shuffle is by bucket key, never an all-pairs product; candidates are
  then verified with exact token-set Jaccard (join back + array
  intersect), so output quality doesn't depend on the sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, spread_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.functions.letbind import let1
from ex_hivent_spark.plans.registry import register
from ex_hivent_spark.session_memo import session_memo

# MinHash parameters: 16 bands x 2 rows = 32 permutations.
N_PERM = 32
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5

# Mersenne prime for universal hashing h_i(x) = (a_i * x + b_i) mod p.
# 2^31-1 keeps a*x well inside int64 (a <= 63, x mod p < 2^31).
_P = (1 << 31) - 1


@register(
    "q_llm_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_md5,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: md5(text) → keep the smallest doc_id per
    hash. At 100 TB this is the standard first pass — one shuffle on a
    16-byte key instead of the full text."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def md5_int48(col: Column) -> Column:
    """48-bit non-negative integer from the md5 hex prefix. md5 is the
    one hash every SQL engine shares, so these values are reproducible
    VERBATIM in the DuckDB oracle (``('0x' || substr(md5(x), 1, 12))::
    BIGINT``) — the property that lets sketch pipelines (MinHash bands,
    SimHash votes) be hash-checked end to end. xxhash64 would be ~5x
    cheaper per call but Spark-only; the explode+aggregate pipeline
    shape, which dominates cost, is unchanged."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def shingles(text: Column, k: int = SHINGLE_K, hasher=None) -> Column:
    """Distinct k-token shingles of a whitespace-tokenized text, each
    hashed to an int. Pure built-ins: split + transform over an index
    sequence + slice + concat.

    ``hasher`` picks the hash: the default :func:`md5_int48` is
    cross-engine-reproducible (required wherever the SQL oracle
    re-derives the hash values themselves — MinHash sketches), while
    queries whose hashes stay internal (the exact-Jaccard family: their
    oracles compare STRING shingle sets, so only set cardinalities
    matter) pass ``F.xxhash64`` — native, measured ~2x faster per
    shingle pass, and 64-bit so strictly fewer collisions than the
    48-bit md5 prefix."""
    h = hasher if hasher is not None else md5_int48
    # let-bind the split: codegen does NOT eliminate common
    # subexpressions inside HOF lambdas, so an unbound split re-runs
    # per shingle — measured 2.5x on the whole shingle pass
    # (functions/letbind.py).
    return let1(
        F.split(text, " "),
        lambda tokens: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(tokens) - (k - 1), F.lit(1)),
                ),
                lambda i: h(F.concat_ws(" ", F.slice(tokens, i, k))),
            )
        ),
    )


def perm_hash(shingle: Column, i: int) -> Column:
    """Permutation-i universal hash of a shingle hash:
    (a_i*x + b_i) mod p with a_i = 2i+1, b_i = 1000003(i+1). Fixed
    coefficients — fully deterministic across runs/partitionings."""
    return F.pmod(
        (2 * i + 1) * F.pmod(shingle, F.lit(_P)) + 1_000_003 * (i + 1), F.lit(_P)
    )


@session_memo
def minhash_frames(spark: SparkSession, sf_dir: str):
    """(sh, mins): the exploded (doc_id, shingle-hash) stream and the
    32-permutation signature table, both lazily localCheckpointed and
    session-memoized. Three queries derive from this identical pair
    (q_llm_minhash_neardup, q_llm_minhash_error via
    q_llm_dedup_threshold_sweep too) — shingling the text is the
    dominant map stage, so a session running the family back-to-back
    pays it once. Each query stays standalone: the first caller
    computes."""
    # r16 OPTIMIZATION (guide §2.5/§6): spread the single-row-group
    # documents scan so the per-row shingle/window map work runs on
    # every core instead of one task; no-op on multi-split inputs.
    d = spread_table(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", "text"
    )
    # Signature via explode + hash-aggregate, NOT per-row array folds:
    # Spark's higher-order functions evaluate lambdas interpreted
    # per-element (outside codegen), which measured ~25x slower here.
    # Exploding shingles and taking 32 mins in one groupBy keeps every
    # permutation hash inside whole-stage codegen, and partial (map-side)
    # aggregation means the shuffle carries only |docs| x 32 longs.
    sh = d.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("sh")
    ).localCheckpoint(eager=False)
    mins = sh.groupBy("doc_id").agg(
        *[F.min(perm_hash(F.col("sh"), i)).alias(f"mh{i}") for i in range(N_PERM)]
    ).localCheckpoint(eager=False)
    return sh, mins


def _lsh_candidates(mins: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs from LSH banding of the
    signature table. Band key: injective integer combination of the
    band's minima (each < 2^31, so a*2^31 + b < 2^62) — an exact join
    key both engines compute identically, where a hash of the pair
    would be engine-specific. The only shuffle is by bucket key, never
    an all-pairs product."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                (
                    F.col(f"mh{i * ROWS_PER_BAND}") * F.lit(1 << 31)
                    + F.col(f"mh{i * ROWS_PER_BAND + 1}")
                ).alias("band_hash"),
            )
            for i in range(N_BANDS)
        ]
    )
    bands = mins.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_id", "b.band_hash"
    )
    left, right = bands.alias("a"), bands.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _minhash_oracle_sql() -> str:
    """SQL twin of the FULL MinHash+LSH pipeline — md5-prefix shingle
    ints, the same 32 universal-hash minima, the same arithmetic band
    keys, the same verification ratio — so even the sketch's candidate
    set is reproduced exactly, not approximated."""
    mins = ",\n             ".join(
        f"min(({2 * i + 1} * (x % {_P}) + {1_000_003 * (i + 1)}) % {_P})"
        f" AS mh{i}"
        for i in range(N_PERM)
    )
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, {i} AS band_id,"
        f" mh{i * ROWS_PER_BAND} * {1 << 31} + mh{i * ROWS_PER_BAND + 1}"
        f" AS band_hash FROM mins"
        for i in range(N_BANDS)
    )
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')),
                                    1, 12))::BIGINT)) AS s
      FROM toks
    ),
    xs AS (SELECT doc_id, unnest(s) AS x FROM sh),
    mins AS (SELECT doc_id, {mins} FROM xs GROUP BY doc_id),
    bands AS (
      {bands}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    tok_sets AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
      FROM documents
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             floor(CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE)
                   / len(list_distinct(list_concat(ta.ts, tb.ts)))
                   * 10000.0 + 0.5) / 10000.0 AS jaccard
      FROM cand c JOIN tok_sets ta ON ta.doc_id = c.doc_a
                  JOIN tok_sets tb ON tb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.5
    """


@register("q_llm_minhash_neardup", oracle=_minhash_oracle_sql())
def q_llm_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate document pairs via MinHash + LSH banding, verified
    with exact token-set Jaccard >= 0.5. Output: (doc_a, doc_b, jaccard).

    HASH-CHECKED end to end: shingle ints are md5-prefix values shared
    with every SQL engine, the 32 permutation minima are exact integer
    arithmetic, and band keys are injective integer combinations — the
    oracle reproduces the sketch's candidate set exactly.

    Signature + banding come from the session-memoized
    :func:`minhash_frames` / :func:`_lsh_candidates` (shared with the
    sketch-audit pair) — first caller pays the shingle pass.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _, mins = minhash_frames(spark, sf_dir)
    candidates = _lsh_candidates(mins)

    # Exact verification: token-set Jaccard on the candidate pairs only.
    # Lazy-checkpointed: both sides of the candidate join read it.
    toks = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tok_set")
    ).localCheckpoint(eager=False)
    verified = (
        candidates.join(toks.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("tok_set", "tok_a")
        .join(toks.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("tok_set", "tok_b")
        .withColumn(
            "jaccard",
            dround(
                F.size(F.array_intersect("tok_a", "tok_b"))
                / F.size(F.array_union("tok_a", "tok_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


@register(
    "q_llm_ngram_jaccard",
    oracle="""
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
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.s, b.s)) AS n_common,
             len(a.s) AS la, len(b.s) AS lb
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (la + lb - n_common) AS jaccard
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / (la + lb - n_common) >= 0.5
    """,
)
def q_llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-3-gram Jaccard near-dup pairs within a language, via
    *prefix filtering* (the AllPairs/PPJoin bound): under any global
    total order on shingles, two sets with Jaccard >= t MUST share at
    least one of each other's |s| - ceil(t*|s|) + 1 smallest shingles.
    So candidate generation is an equi-join on (lang, prefix-shingle
    hash) — a high-cardinality content-derived key — followed by exact
    verification; never an all-pairs product within a lang block. The
    result set is IDENTICAL to the naive all-pairs-within-lang plan
    (the filter is lossless for t=0.5), which is what the SQL oracle
    computes; the sketch-free exact twin of q_llm_minhash_neardup.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) is a single integer-ratio double
    division — bit-deterministic, no rounding needed.

    Implementation notes: shingles are represented by 64-bit xxhash64
    ints throughout — the hashes never appear in the output, so only
    set CARDINALITIES must survive hashing (unchanged barring a
    collision, strictly rarer at 64 bits than the md5-prefix 48 bits
    the sketch ops use; the sf0.01 oracle hash-check agrees with the
    string-set SQL oracle, and the native hash measures ~2x faster
    than md5 per shingle pass). The per-doc hash set is built once with one explode +
    groupBy(collect_set) — the cheap exploded-hash pattern shared with
    MinHash — and both the prefix explode and the two verification
    join-backs read that one aggregate. Verification joins carry only
    (doc_id → hash array), so candidate-join shuffle rows stay narrow —
    the 100 TB-safe trade against carrying full sets into the pair join.
    DuckDB's all-pairs-within-lang plan on the identical sf0.1 input
    runs 159 s vs ~3.5 s for this plan (45x) — the blocking key, not
    the engine, is the win."""
    # r16 OPTIMIZATION (guide §2.5/§6): spread the single-row-group
    # documents scan so the per-row shingle/window map work runs on
    # every core instead of one task; no-op on multi-split inputs.
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    tk = d.select(
        "doc_id",
        "lang",
        F.explode(shingles(F.col("text"), hasher=F.xxhash64)).alias("h"),
    )
    hs = tk.groupBy("doc_id", "lang").agg(
        F.array_sort(F.collect_set("h")).alias("hs")
    )
    # Three consumers (prefix explode + both verification join-backs)
    # read this aggregate; a lazy localCheckpoint materializes it once
    # (measured 2x on the full query) instead of recomputing the
    # scan+explode+groupBy per branch. Storage cost: |docs| hash-set
    # rows on executor-local disk — far smaller than the text itself.
    hs = hs.localCheckpoint(eager=False)

    # Prefix under the hashed-shingle global order: |s| - ceil(0.5*|s|) + 1
    # smallest shingle hashes of each doc.
    n = F.size("hs")
    prefix_len = n - F.ceil(n * F.lit(0.5)).cast("int") + 1
    prefix = hs.select(
        "doc_id", "lang", F.explode(F.slice("hs", 1, prefix_len)).alias("ph")
    )
    pa = prefix.alias("pa")
    pb = prefix.alias("pb")
    candidates = (
        pa.join(
            pb,
            (F.col("pa.lang") == F.col("pb.lang"))
            & (F.col("pa.ph") == F.col("pb.ph"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b"))
        .distinct()
    )

    # Exact verification on candidates only.
    sets = hs.select("doc_id", "hs")
    a = sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hs", "ha")
    b = sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hs", "hb")
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    union = F.size("ha") + F.size("hb") - inter
    jac = inter.cast("double") / union
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


def _simhash_oracle_sql() -> str:
    """SQL twin of the 16-bit SimHash: md5-prefix token ints, the same
    per-bit +1/-1 votes, the same fingerprint assembly — all integer
    arithmetic, exact in any engine."""
    votes = ",\n             ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(16)
    )
    fp = " + ".join(
        f"CASE WHEN v{b} >= 0 THEN {1 << b} ELSE 0 END" for b in range(16)
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    h AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h FROM tk
    ),
    votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, {fp} AS simhash FROM votes)
    SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc_id
    FROM fp GROUP BY simhash
    """


@register(
    "q_llm_simhash_groups",
    oracle=_simhash_oracle_sql(),
)
def q_llm_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprinting: 16-bit simhash over token hashes; groups
    documents by fingerprint (candidate near-dup clusters). HASH-CHECKED:
    md5-prefix token ints and integer bit votes make the sketch itself
    cross-engine-exact. Output: (simhash, n_docs, min_doc_id)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Explode + codegen'd aggregate (same rationale as the MinHash
    # signature: per-element HOF lambdas are interpreted, exploded hash
    # aggregation is whole-stage codegen with map-side combine).
    tk = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).select("doc_id", md5_int48(F.col("tok")).alias("h"))
    # For each of 16 bits: sum(+1/-1 per token) >= 0 -> bit set.
    votes = tk.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(16)
        ]
    )
    bits = [
        F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(16)
    ]
    simhash = sum(bits[1:], bits[0])
    return (
        votes.select("doc_id", simhash.alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


# --------------------------------------------------------------------------
# Substring-level duplication (word-anchored character windows)
# --------------------------------------------------------------------------

SUBSTR_WIN_CHARS = 40  # duplicated-span detection granularity, in chars


@register(
    "q_llm_substring_dedup",
    oracle=f"""
    WITH wins AS (
      SELECT doc_id, list_distinct(list_transform(
        list_filter(range(1, len(text) - {SUBSTR_WIN_CHARS - 2}),
          p -> p = 1 OR substr(text, p - 1, 1) = ' '),
        p -> ('0x' || substr(md5(substr(text, p, {SUBSTR_WIN_CHARS})),
                             1, 12))::BIGINT)) AS ws
      FROM documents WHERE len(text) >= {SUBSTR_WIN_CHARS}
    ),
    hashed AS (
      SELECT doc_id, h FROM wins, unnest(ws) AS u(h)
    ),
    sharers AS (
      SELECT h, count(DISTINCT doc_id) AS nd FROM hashed GROUP BY h
    )
    SELECT hashed.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_windows,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS dup_frac
    FROM hashed JOIN sharers USING (h)
    GROUP BY hashed.doc_id
    """,
)
def q_llm_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication report (the exact-substring-dedup
    semantics of Lee et al.'s "Deduplicating Training Data Makes
    Language Models Better", re-expressed scalably): per document, how
    many of its K-char spans also occur verbatim in ANOTHER document,
    where spans are anchored at every word start. Word-boundary
    anchoring makes detection alignment-free — a region copied between
    two documents at different offsets still yields the IDENTICAL
    window set, because anchors derive from content, not position
    (the property a fixed-stride sampler lacks; a suffix array gives
    per-character exactness at far higher cost). Catches duplication
    that passage-aligned dedup (q_llm_passage_dedup) misses: spans
    crossing passage boundaries and partial-passage overlap.

    Plan shape: windows are taken straight out of the original text at
    space-anchored character positions (one O(len) anchor scan + one
    O(K) substring per window — never a per-window token-slice
    reassembly, which measured ~2x the whole query), each hashed
    map-side to a 48-bit md5-prefix int (md5_int48, reproduced verbatim
    in the oracle so hash collisions — the only lossy step — strike
    both engines identically) — so only (doc_id, 8-byte hash) rows
    shuffle, never window text. The aggregation is asymmetric on
    purpose: per-doc window counts come straight off the window array
    map-side (zero shuffle), and ONLY the hashes that are actually
    duplicated (sharer count > 1 — a tiny, data-proportional set)
    survive to the doc-attribution join, so the full window stream is
    shuffled exactly once (the sharer count), never joined back whole.
    No collect_list anywhere — a boilerplate window shared by millions
    of docs skews a shuffle partition at worst (AQE splits it), it
    cannot OOM an executor. dup_frac is a single bigint/bigint double
    division, bit-deterministic."""
    # r16 OPTIMIZATION (guide §2.5/§6): spread the single-row-group
    # documents scan so the per-row shingle/window map work runs on
    # every core instead of one task; no-op on multi-split inputs.
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    K = SUBSTR_WIN_CHARS
    text = F.col("text")
    anchors = F.filter(
        F.sequence(F.lit(1), F.length(text) - (K - 1)),
        lambda p: (p == 1) | (F.substring(text, p - 1, 1) == " "),
    )
    wins = F.array_distinct(
        F.transform(anchors, lambda p: md5_int48(F.substring(text, p, K)))
    )
    # Two consumers (map-side counts + the explode) read the window
    # arrays; lazy-localCheckpoint materializes the scan+window build
    # once, same rationale as the ngram-jaccard hash-set aggregate.
    base = (
        d.filter(F.length(text) >= K)
        .select("doc_id", wins.alias("ws"))
        .localCheckpoint(eager=False)
    )
    per_doc = base.select(
        "doc_id", F.size("ws").cast("bigint").alias("n_windows")
    )
    hashed = base.select("doc_id", F.explode("ws").alias("h"))
    dup_hashes = (
        hashed.groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))  # (doc,h) pairs are distinct
        .filter(F.col("nd") > 1)
        .select("h")
    )
    dup_counts = (
        hashed.join(dup_hashes, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_windows"))
    )
    return (
        per_doc.join(dup_counts, "doc_id", "left")
        .na.fill({"n_dup_windows": 0})
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            (
                F.col("n_dup_windows").cast("double")
                / F.col("n_windows").cast("double")
            ).alias("dup_frac"),
        )
    )


# Containment threshold tau = 4/5, kept as an integer ratio so the
# prefix-filter bound and the verification predicate are pure integer
# arithmetic (0.8 is not exactly representable in binary; ceil(n*0.8)
# in floats would round the bound differently per engine for n % 5 == 0).
_CONTAIN_NUM, _CONTAIN_DEN = 4, 5


@register(
    "q_llm_containment_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ),
    pairs AS (
      SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
             len(list_intersect(a.s, b.s)) AS n_common,
             len(a.s) AS la
      FROM sh a JOIN sh b
        ON (len(a.s) < len(b.s)
            OR (len(a.s) = len(b.s) AND a.doc_id < b.doc_id))
    )
    SELECT doc_small, doc_big,
           CAST(n_common AS DOUBLE) / la AS containment
    FROM pairs
    WHERE n_common * {_CONTAIN_DEN} >= la * {_CONTAIN_NUM}
    """,
)
def q_llm_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection by set containment: pairs where
    C(A,B) = |A intersect B| / |A| >= 4/5 for the smaller-gram-set doc A
    — the sub-document duplication Jaccard misses (a short doc fully
    embedded in a long one has high containment but low Jaccard because
    the union is dominated by the long doc). This is the
    crawl-boilerplate / quoted-reply / excerpt detector.

    Lossless prefix filter for containment (the PPJoin bound adapted to
    the asymmetric measure): C(A,B) >= t implies |A intersect B| >=
    ceil(t*|A|), so A has at most |A| - ceil(t*|A|) elements outside B —
    among A's (|A| - ceil(t*|A|) + 1) smallest gram hashes under the
    global order, at least one must be in B. Candidate generation is
    therefore A-prefix x B-FULL on the gram hash (the asymmetric price:
    the probed side explodes all grams — still linear in corpus gram
    count, the same volume the df aggregate in curation.py shuffles),
    then exact verification on candidates only. ceil(t*|A|) is computed
    as (4*|A| + 4) div 5 — integer, engine-independent. The candidate
    ordering key (|set| asc, doc_id asc) is content-derived and total,
    so each qualifying pair is emitted exactly once.

    Containment itself is one integer-ratio double division (exact);
    the threshold predicate compares integers. Result is IDENTICAL to
    the oracle's all-pairs plan, which runs quadratically in DuckDB —
    the blocking key is the 100 TB path, as with q_llm_ngram_jaccard."""
    # r16 OPTIMIZATION (guide §2.5/§6): spread the single-row-group
    # documents scan so the per-row shingle/window map work runs on
    # every core instead of one task; no-op on multi-split inputs.
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    tk = d.select(
        "doc_id",
        F.explode(shingles(F.col("text"), hasher=F.xxhash64)).alias("h"),
    )
    hs = tk.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("h")).alias("hs")
    )
    # Three consumers (A-prefix, B-full, verification join-backs) read
    # this one aggregate — same lazy-localCheckpoint reuse as jaccard.
    hs = hs.localCheckpoint(eager=False)
    sized = hs.select("doc_id", "hs", F.size("hs").alias("n"))

    # ceil(4n/5) = (4n + 4) div 5; prefix_len = n - ceil(4n/5) + 1.
    min_common = (
        F.col("n") * _CONTAIN_NUM + (_CONTAIN_DEN - 1)
    ).cast("long") / F.lit(_CONTAIN_DEN)
    min_common = F.floor(min_common).cast("int")
    prefix_len = F.col("n") - min_common + 1
    apre = sized.select(
        F.col("doc_id").alias("doc_small"),
        F.col("n").alias("la"),
        F.explode(F.slice("hs", F.lit(1), prefix_len)).alias("h"),
    )
    bfull = sized.select(
        F.col("doc_id").alias("doc_big"),
        F.col("n").alias("lb"),
        F.explode("hs").alias("h"),
    )
    candidates = (
        apre.join(
            bfull,
            (apre["h"] == bfull["h"])  # the equi key — hash-partitioned join
            & (
                (F.col("la") < F.col("lb"))
                | (
                    (F.col("la") == F.col("lb"))
                    & (F.col("doc_small") < F.col("doc_big"))
                )
            ),
        )
        .select("doc_small", "doc_big")
        .distinct()
    )

    a = hs.select(
        F.col("doc_id").alias("doc_small"), F.col("hs").alias("ha")
    )
    b = hs.select(F.col("doc_id").alias("doc_big"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    la = F.size("ha")
    return (
        candidates.join(a, "doc_small")
        .join(b, "doc_big")
        .filter(inter * _CONTAIN_DEN >= la * _CONTAIN_NUM)
        .select(
            "doc_small",
            "doc_big",
            (inter.cast("double") / la).alias("containment"),
        )
    )


def _minhash_error_oracle_sql() -> str:
    """SQL twin of the sketch-error audit: the same md5-prefix shingle
    ints, 32 minima, band candidates — then per pair the signature
    agreement fraction next to the exact shingle-set Jaccard."""
    mins = ",\n             ".join(
        f"min(({2 * i + 1} * (x % {_P}) + {1_000_003 * (i + 1)}) % {_P})"
        f" AS mh{i}"
        for i in range(N_PERM)
    )
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, {i} AS band_id,"
        f" mh{i * ROWS_PER_BAND} * {1 << 31} + mh{i * ROWS_PER_BAND + 1}"
        f" AS band_hash FROM mins"
        for i in range(N_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN ma.mh{i} = mb.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_PERM)
    )
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')),
                                    1, 12))::BIGINT)) AS s
      FROM toks
    ),
    xs AS (SELECT doc_id, unnest(s) AS x FROM sh),
    mins AS (SELECT doc_id, {mins} FROM xs GROUP BY doc_id),
    bands AS (
      {bands}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST({agree} AS BIGINT) AS n_agree,
           CAST({agree} AS DOUBLE) / {N_PERM} AS jaccard_est,
           CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
               / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
               AS jaccard_exact,
           abs(CAST({agree} AS DOUBLE) / {N_PERM}
               - CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))))
               AS abs_err
    FROM cand c
    JOIN mins ma ON ma.doc_id = c.doc_a
    JOIN mins mb ON mb.doc_id = c.doc_b
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
    """


@session_memo
def minhash_error_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized audit frame behind q_llm_minhash_error AND
    q_llm_dedup_threshold_sweep: every LSH candidate pair with its
    signature estimate, exact Jaccard and absolute error, lazily
    localCheckpointed. r12 anchor follow-up: memoizing only the
    signature frames still left the sweep re-running the candidate
    join + two shingle-set joins (the actually-expensive reduce side)
    on top of the audit — the whole PAIRS frame is the shared
    intermediate, and it's narrow (|candidates| rows of ids + four
    numbers), so pinning it is cheap at any scale. First caller pays;
    each query stays standalone."""
    sh, mins = minhash_frames(spark, sf_dir)
    candidates = _lsh_candidates(mins)

    ma = mins.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_PERM)],
    )
    mb = mins.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_PERM)],
    )
    sets = sh.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("sh")).alias("s")
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))

    n_agree = None
    for i in range(N_PERM):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        n_agree = term if n_agree is None else n_agree + term
    inter = F.size(F.array_intersect("sa", "sb"))
    exact = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    est = F.col("n_agree").cast("double") / N_PERM
    return (
        candidates.join(ma, "doc_a")
        .join(mb, "doc_b")
        .withColumn("n_agree", n_agree.cast("bigint"))
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            est.alias("jaccard_est"),
            exact.alias("jaccard_exact"),
            F.abs(est - exact).alias("abs_err"),
        )
        .localCheckpoint(eager=False)
    )


@register("q_llm_minhash_error", oracle=_minhash_error_oracle_sql())
def q_llm_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit for the MinHash pipeline — the dedup twin of
    q_llm_ann_recall: for every LSH-banded candidate pair, the
    signature-agreement estimate (matching minima / 32) next to the
    EXACT shingle-set Jaccard, and their absolute error. This is the
    measurement that tunes N_PERM / banding before trusting the sketch
    on a real corpus: E[estimate] = true Jaccard, and the observed error
    distribution tells you whether 32 permutations suffice at the
    chosen threshold.

    Plan: the same explode + 32-codegen-minima aggregate and banded
    equi-join as q_llm_minhash_neardup — literally the same frames, via
    the session-memoized :func:`minhash_frames` (ONE shingle explode
    feeds the signature minima AND the exact shingle sets; shingling
    the text is the expensive map stage, so the family pays it once
    per session). Exact Jaccard adds two narrow
    (doc_id -> shingle-hash-array) joins on the candidates only.
    Everything the audit shuffles is ids + fixed-width signatures.
    The pairs frame itself is session-memoized
    (:func:`minhash_error_pairs`) so the threshold sweep reads the
    one materialization instead of re-running the candidate + set
    joins. Determinism: agreement counts are integer; both ratios are
    single exact divisions; abs_err is IEEE on identically derived
    doubles — fully hash-checked, no tolerance."""
    return minhash_error_pairs(spark, sf_dir)


@register(
    "q_llm_dedup_threshold_sweep",
    oracle=f"""
    SELECT CAST(floor(jaccard_est * 5.0) AS BIGINT) AS est_bucket,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN jaccard_exact >= 0.5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true_dups,
           CAST(sum(CASE WHEN jaccard_exact >= 0.5 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS bucket_precision
    FROM ({_minhash_error_oracle_sql()})
    GROUP BY CAST(floor(jaccard_est * 5.0) AS BIGINT)
    """,
)
def q_llm_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuning sweep for the MinHash dedup pipeline: bucket
    every LSH candidate pair by its signature-estimated Jaccard
    (0.2-wide buckets) and report per bucket how many pairs are TRUE
    duplicates at the tau=0.5 exact-Jaccard bar — the
    precision-per-estimate curve that picks the production threshold
    (cut where precision collapses) before running dedup on a real
    corpus. Composes q_llm_minhash_error's audit output, so the sweep
    and the audit can never disagree.

    Determinism: the estimate is an exact multiple of 1/32, so the
    floor(est*5) bucket edge never lands on a representable boundary
    except the exact 0/1 endpoints (32|5k only for k in {{0, 32}} —
    both floor exactly); the tau compare is on identically-derived
    IEEE doubles; counts are integers and the precision is one exact
    division. Scale: one extra hash aggregate over the MATERIALIZED
    candidate-pairs frame (:func:`minhash_error_pairs`, session-
    memoized) — a warm call never re-runs the audit's joins."""
    pairs = minhash_error_pairs(spark, sf_dir)
    is_dup = F.when(F.col("jaccard_exact") >= 0.5, 1).otherwise(0)
    return (
        pairs.groupBy(
            F.floor(F.col("jaccard_est") * 5.0)
            .cast("bigint")
            .alias("est_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(is_dup).cast("bigint").alias("n_true_dups"),
        )
        .select(
            "est_bucket",
            "n_candidates",
            "n_true_dups",
            (
                F.col("n_true_dups").cast("double") / F.col("n_candidates")
            ).alias("bucket_precision"),
        )
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS)
# --------------------------------------------------------------------------

WINNOW_K = 3  # tokens per gram
WINNOW_W = 4  # grams per winnowing window


@register(
    "q_llm_winnowing_fingerprint",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(len(string_split(text, ' ')) - {WINNOW_K - 1},
                                 1) + 1),
               i -> ('0x' || substr(md5(array_to_string(
                        (string_split(text, ' '))[i:i+{WINNOW_K - 1}], ' ')),
                        1, 12))::BIGINT
             ) AS hs
      FROM documents
    ),
    fps AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(hs) - {WINNOW_W - 1}, 1) + 1),
               j -> list_min(hs[j:j+{WINNOW_W - 1}])
             )) AS fp
      FROM grams
    ),
    ex AS (SELECT doc_id, unnest(fp) AS f FROM fps),
    df AS (SELECT f, count(DISTINCT doc_id) AS nd FROM ex GROUP BY f),
    per AS (
      SELECT ex.doc_id,
             CAST(count(*) AS BIGINT) AS n_fps,
             CAST(count(CASE WHEN df.nd >= 2 THEN 1 END) AS BIGINT)
                 AS n_shared
      FROM ex JOIN df USING (f)
      GROUP BY ex.doc_id
    )
    SELECT doc_id, n_fps, n_shared,
           floor(CAST(n_shared AS DOUBLE) / n_fps * 1000000.0 + 0.5)
               / 1000000.0 AS shared_frac
    FROM per
    """,
)
def q_llm_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    MOSS local fingerprinting): hash every K-token gram, slide a
    W-gram window, keep each window's MINIMUM hash — the selected
    fingerprints are position-independent and GUARANTEE that any
    shared run of at least W+K-1 tokens between two documents shares
    at least one fingerprint (the property random sampling lacks and
    MinHash only gives set-statistically). Reports, per document, its
    fingerprint count, how many fingerprints also occur in other
    documents, and the shared fraction — the plagiarism/copy-detection
    score that complements the set-similarity dedup family
    (q_llm_minhash_neardup: whole-doc resemblance; this: localized
    copied runs).

    Plan: the gram-hash sequence is ONE per-row HOF pass (split +
    transform over positions — the O(n·K) md5 work, identical to the
    minhash shingle stage); window-minimum selection then runs as a
    posexplode + doc-partitioned sliding ROWS window min, which stays
    in JVM window codegen instead of a second interpreted HOF pass
    (pyspark HOF lambdas evaluate per element in the interpreter, and
    the old windowed array_min re-sliced O(W) arrays per position —
    the r12 anchor's 2× residual was exactly that pass). Only
    (doc_id, pos, hash) triples shuffle into the window; the distinct
    fingerprint pairs then feed the document-frequency aggregate and
    back-join. At 100 TB the df shuffle carries ~|tokens|/W hashes
    per doc, never text — the winnowing density 2/(W+1) is the knob
    that trades recall for shuffle volume. Hashes are md5_int48,
    reproduced VERBATIM in the oracle."""
    # r16 OPTIMIZATION (guide §2.5/§6): spread the single-row-group
    # documents scan so the per-row shingle/window map work runs on
    # every core instead of one task; no-op on multi-split inputs.
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    hs = let1(
        F.split("text", " "),
        lambda tokens: F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size(tokens) - (WINNOW_K - 1), F.lit(1)),
            ),
            lambda i: md5_int48(
                F.concat_ws(" ", F.slice(tokens, i, WINNOW_K))
            ),
        ),
    )
    g = d.select(
        "doc_id", F.posexplode(hs).alias("pos", "h")
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    # pos is 0-based; the oracle's 1-based j runs to max(n-W+1, 1), so
    # keep pos ≤ max(n-W, 0). The trailing window truncates at the
    # array end exactly like the old F.slice beyond length.
    wmin = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    # NOT pinned, deliberately: ex feeds both the document-frequency
    # aggregate and the per-doc closing aggregate, and Catalyst does
    # re-expand the fingerprint pipeline under each join side — but
    # the r13 steady re-time measured the localCheckpoint variant
    # SLOWER (3.1-4.1 s vs 1.6 s at sf0.1): materializing the
    # ~|tokens|/W distinct pairs costs more than the doubled map-side
    # lineage it saves, since both expansions are one scan + explode +
    # window with full partial aggregation and no shuffle of text.
    # (Contrast maintjobs.py's kept frame, where the pin wins: tiny
    # output, whole extra shuffle+sort pipeline saved.)
    ex = (
        g.withColumn("m", F.min("h").over(wmin))
        .filter(
            F.col("pos")
            <= F.greatest(F.col("n") - WINNOW_W, F.lit(0))
        )
        .select("doc_id", F.col("m").alias("f"))
        .distinct()
    )
    df_tbl = ex.groupBy("f").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    per = (
        ex.join(df_tbl, "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fps"),
            F.count(F.when(F.col("nd") >= 2, 1)).cast("bigint").alias(
                "n_shared"
            ),
        )
    )
    return per.select(
        "doc_id",
        "n_fps",
        "n_shared",
        dround(
            F.col("n_shared").cast("double") / F.col("n_fps"), 6
        ).alias("shared_frac"),
    )


EDIT_LEN_BUCKET = 16  # chars per length-blocking bucket
EDIT_MAX_DIST = 48  # absolute edit-distance cutoff for reported pairs


@register(
    "q_llm_edit_distance_neardup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text,
             split_part(text, ' ', 1) || ' ' || split_part(text, ' ', 2)
               AS tok12,
             n_chars // {EDIT_LEN_BUCKET} AS lb
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance,
             greatest(length(a.text), length(b.text)) AS max_len
      FROM d a JOIN d b
        ON a.tok12 = b.tok12 AND a.lb = b.lb AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b, edit_distance,
           {sql_dround("CAST(edit_distance AS DOUBLE) / max_len", 6)}
             AS rel_dist
    FROM pairs
    WHERE edit_distance <= {EDIT_MAX_DIST}
    """,
)
def q_llm_edit_distance_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate detection: Levenshtein distance
    between candidate document pairs, the character-level dedup that
    catches in-place edits (typo fixes, template substitutions) which
    token-shingle Jaccard under-weights and MinHash misses entirely at
    small edit counts. Reports pairs within EDIT_MAX_DIST plus the
    length-normalized relative distance.

    Plan — BLOCKED, never all-pairs: candidates share a deterministic
    (first-two-tokens, 16-char-length-bucket) blocking key, so the
    self-join is an equi-join on the key (hash-partitioned;
    Levenshtein's O(L²) DP runs only on within-block pairs — the
    standard blocking trade: recall is bounded by the blocking, which
    is why the MinHash/SimHash/prefix-filter family coexists with this
    op). The 2-token prefix matters: a 1-token block leaves ~20× more
    candidate pairs, and at ~300-char texts each pair costs ~90k DP
    cells — measured 24 s → ~2 s at sf0.1. The distance is computed
    ONCE per pair in a projection pinned by a lazy localCheckpoint:
    without the barrier, Catalyst collapses the projection into the
    join and the pushed ≤-filter plus the two output expressions
    re-evaluate the DP up to 3×. Both engines implement classic
    Wagner–Fischer Levenshtein, so distances are exact integers and
    the oracle is bit-identical. At 100 TB the block key is a short
    string + a bigint; text only shuffles for rows that have a
    same-key partner."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat_ws(
            " ",
            F.split_part(F.col("text"), F.lit(" "), F.lit(1)),
            F.split_part(F.col("text"), F.lit(" "), F.lit(2)),
        ).alias("tok12"),
        F.expr(f"n_chars DIV {EDIT_LEN_BUCKET}").alias("lb"),
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.tok12") == F.col("b.tok12"))
        & (F.col("a.lb") == F.col("b.lb"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
        F.levenshtein(F.col("a.text"), F.col("b.text"))
        .cast("bigint")
        .alias("edit_distance"),
        F.greatest(
            F.length(F.col("a.text")), F.length(F.col("b.text"))
        ).alias("max_len"),
    ).localCheckpoint(eager=False)  # single DP evaluation per pair:
    # the barrier stops the pushed filter + output exprs from inlining
    # (and re-running) the levenshtein projection
    return pairs.filter(F.col("edit_distance") <= EDIT_MAX_DIST).select(
        "doc_id_a",
        "doc_id_b",
        "edit_distance",
        dround(
            F.col("edit_distance").cast("double") / F.col("max_len"), 6
        ).alias("rel_dist"),
    )


@register(
    "q_llm_url_dedup",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://'
              END)
             || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source
                 END)
             || '.example.com/' || lang || '/page'
             || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
             || (CASE WHEN doc_id % 3 = 0
                      THEN '?utm_source=feed&utm_campaign=x'
                      WHEN doc_id % 3 = 1 THEN '?ref=keep'
                      ELSE '' END)
             || (CASE WHEN doc_id % 7 = 0 THEN '#section' ELSE '' END)
               AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(url),
               '#.*$', ''),
               '\\?utm_[^#]*', ''),
               '/\\?', '?'),
               '/$', '') AS canonical_url
      FROM raw
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
           min(doc_id) AS keep_doc_id
    FROM canon GROUP BY canonical_url
    """,
)
def q_llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the crawl-frontier collapse every
    web-scale corpus runs BEFORE content hashing: lowercase scheme and
    host, strip fragments, strip pure-tracking (utm_*) query strings
    while KEEPING meaningful params, and drop trailing slashes, then
    group fetches by canonical URL (keep = smallest doc_id). Reported
    per canonical URL: total fetches, distinct raw variants, keeper.

    The raw URLs are synthesized deterministically from document
    fields with case/tracking/slash/fragment noise cycling by doc_id,
    so the canonicalization rules are exercised end to end and the
    oracle re-derives identical input. Canonicalization is a chain of
    4 regexp_replace calls in the RE2 ∩ Java common subset (no
    lookahead — '/?' collapse handled by literal '/\\?' then '/$'
    passes). Plan: map-only canonicalize + one hash aggregate on the
    canonical key; at 100 TB this shuffles only (canonical_url,
    doc_id) pairs."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "HTTPS://").otherwise("https://"),
        F.when(
            F.col("doc_id") % 2 == 0, F.upper("source")
        ).otherwise(F.col("source")),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/page"),
        F.when(F.col("doc_id") % 5 == 0, "/").otherwise(""),
        F.when(
            F.col("doc_id") % 3 == 0, "?utm_source=feed&utm_campaign=x"
        )
        .when(F.col("doc_id") % 3 == 1, "?ref=keep")
        .otherwise(""),
        F.when(F.col("doc_id") % 7 == 0, "#section").otherwise(""),
    )
    raw = d.select("doc_id", url.alias("url"))
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("url")), "#.*$", ""),
                r"\?utm_[^#]*",
                "",
            ),
            r"/\?",
            "?",
        ),
        "/$",
        "",
    )
    return (
        raw.select("doc_id", "url", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("url").cast("bigint").alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


# Prefix-dup window: first N whitespace tokens (boilerplate headers,
# mirrored/templated intros dedup on the prefix even when tails differ).
_PREFIX_TOKENS = 16


@register(
    "q_llm_prefix_dup_rate",
    oracle=f"""
    WITH pfx AS (
      SELECT source,
             md5(array_to_string(
               (string_split(text, ' '))[1:{_PREFIX_TOKENS}], ' '))
               AS ph
      FROM documents
    ),
    per AS (
      SELECT source, ph, CAST(count(*) AS BIGINT) AS c
      FROM pfx GROUP BY source, ph
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_distinct_prefixes,
           CAST(sum(c) - count(*) AS BIGINT) AS n_prefix_dups,
           {sql_dround(
               "CAST(sum(c) - count(*) AS DOUBLE) / sum(c)", 6,
           )} AS prefix_dup_rate,
           CAST(max(c) AS BIGINT) AS max_prefix_family
    FROM per GROUP BY source
    """,
)
def q_llm_prefix_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-PREFIX duplication per source: md5 of the first
    {_PREFIX_TOKENS} whitespace tokens, with the per-source dup rate
    and the largest prefix family — the boilerplate-header detector
    that whole-document dedup (q_llm_exact_dedup) misses (templated
    intros with varying tails) and passage dedup (q_llm_passage_dedup)
    only catches window-by-window. A source whose docs all share one
    prefix is a template mill; cut or strip before tokenization.

    Plan: map-only prefix hash (split + slice + concat — one codegen
    expression; only the 16-byte hash shuffles), two hash aggregates.
    All-integer counts; one e6-rounded exact-ratio rate."""
    d = load_table(spark, sf_dir, "documents")
    ph = F.md5(
        F.concat_ws(
            " ", F.slice(F.split("text", " "), 1, _PREFIX_TOKENS)
        )
    )
    per = d.select("source", ph.alias("ph")).groupBy("source", "ph").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return per.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_prefixes"),
        (F.sum("c") - F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_prefix_dups"),
        dround(
            (F.sum("c") - F.count(F.lit(1))).cast("double") / F.sum("c"),
            6,
        ).alias("prefix_dup_rate"),
        F.max("c").cast("bigint").alias("max_prefix_family"),
    )
