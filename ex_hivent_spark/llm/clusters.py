"""Near-duplicate cluster assembly: connected components over dup
pairs.

Pair-finding (MinHash/ngram/embedding ops) yields edges; the dedup
endgame is grouping transitively-connected documents so one canonical
doc per CLUSTER survives — A~B and B~C must collapse to one keeper even
when A~C was never directly compared.

The algorithm is iterative min-label propagation (the standard
map-reduce connected-components shape): every node starts labeled with
itself; each round, a node adopts the minimum label among itself and
its neighbors; converged when no label changes. Rounds needed =
component diameter, which for near-dup clusters is tiny. Each round is
one join + one aggregate, all keyed — at 100 TB, per-round cost is two
shuffles of the (node, label) table, and ``localCheckpoint`` truncates
the plan lineage so round N doesn't replan rounds 1..N-1 (the classic
iterative-Spark failure mode).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.plans.registry import register

MAX_ROUNDS = 20

# Memoized (doc_id, cluster_id) labels of the exact-ngram-Jaccard dup
# graph, keyed by session in a WeakKeyDictionary. NOTE: the weak keying
# alone never evicts — the cached DataFrames strongly reference their
# session, so entries live until clear_labels_cache() releases them
# explicitly (catalog.clear_table_cache calls through; same contract as
# session_memo.py). Four queries consume the SAME fixpoint
# (q_llm_dedup_clusters,
# q_llm_dedup_keep_best, q_llm_dedup_component_stats,
# q_llm_cluster_source_purity) and the propagation's eager
# localCheckpoints make each recomputation ~4-5 s of real cluster
# work; computing it once per (session, sf_dir) keeps every query
# standalone for the driver (first caller pays) while the bench/driver
# session reuses the checkpointed frame. The labels frame is
# |clustered docs| rows — driver-memory trivial to pin.
_LABELS_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


# Memoized 3-gram-Jaccard near-dup pair frame, same keying: ELEVEN
# graph/dedup queries consume the identical edge set (each ~2.5 s of
# shingle/minhash work at sf0.1), and the pair list is |near-dup
# pairs| rows — driver-memory trivial to pin.
_PAIRS_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def clear_labels_cache(spark: SparkSession | None = None) -> None:
    """Drop memoized dedup-component labels and near-dup pair frames
    (one session's, or all).

    The cached frames strongly reference their session, so weak-key
    eviction alone never fires; this releases the pinned
    localCheckpoint blocks explicitly (catalog.clear_table_cache calls
    through here)."""
    if spark is None:
        _LABELS_CACHE.clear()
        _PAIRS_CACHE.clear()
    else:
        _LABELS_CACHE.pop(spark, None)
        _PAIRS_CACHE.pop(spark, None)


def _dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact 3-gram-Jaccard near-dup pair list (q_llm_ngram_jaccard),
    computed once per (session, sf_dir) and lazily checkpointed —
    every query stays standalone for the driver (first caller pays)
    while bench/driver sessions reuse the materialized edge set."""
    per_session = _PAIRS_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        return cached
    from ex_hivent_spark.llm.dedup import q_llm_ngram_jaccard

    pairs = q_llm_ngram_jaccard(spark, sf_dir).localCheckpoint(eager=False)
    per_session[sf_dir] = pairs
    return pairs


def _dedup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) min-label components of the 3-gram-Jaccard
    pair graph, computed once per session+sf_dir."""
    per_session = _LABELS_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        return cached
    pairs = _dup_pairs(spark, sf_dir)
    labels = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    per_session[sf_dir] = labels
    return labels


def connected_components(
    pairs: DataFrame,
    left: str = "doc_a",
    right: str = "doc_b",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``, where cluster_id
    is the minimum node id reachable through the pair graph."""
    edges = (
        pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
        .union(pairs.select(F.col(right).alias("src"), F.col(left).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


_NGRAM_PAIRS_SQL = """
    WITH RECURSIVE toks AS (
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
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    )
"""


@register(
    "q_llm_dedup_clusters",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
      SELECT a, a FROM edges
      UNION
      SELECT a, b FROM edges
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    )
    SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
    """,
)
def q_llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-duplicate clusters over the exact 3-gram-Jaccard
    pairs (q_llm_ngram_jaccard's edge set): every clustered doc mapped
    to its canonical keeper (minimum reachable doc_id). The Spark side
    is iterative label propagation; the oracle is a recursive-CTE
    transitive closure — same fixpoint, hash-checked."""
    return _dedup_labels(spark, sf_dir)


PR_ITERATIONS = 10
PR_DAMPING = 0.85
PR_SCALE = 10**12  # ranks held as e12 fixed-point integers


def pagerank(
    pairs: DataFrame,
    left: str = "doc_a",
    right: str = "doc_b",
    n_iter: int = PR_ITERATIONS,
    damping: float = PR_DAMPING,
) -> DataFrame:
    """PageRank over an undirected pair graph — the other canonical
    iterative-joins algorithm (beyond connected components): rank mass
    flows along edges for a fixed ``n_iter`` rounds. Per round: one
    join + one keyed aggregate, lineage truncated via localCheckpoint.

    Ranks are e12 FIXED-POINT INTEGERS (``rank_e12``), not doubles:
    per-edge contribution is integer division ``rank_e12 div deg``, the
    per-node inflow an exact bigint sum (order-insensitive — a double
    sum here would make results partitioning-dependent), and the
    damping step one IEEE multiply + floor, bit-identical on any
    engine. That makes iterative PageRank exactly reproducible across
    cluster sizes AND hash-checkable against an unrolled SQL oracle.

    Used here to score near-duplicate CENTRALITY: in a dup cluster the
    highest-rank doc is the best canonical keeper (most-connected),
    a better choice than min-id when edges carry meaning."""
    import math

    edges = (
        pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
        .union(pairs.select(F.col(right).alias("src"), F.col(left).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    degrees = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = degrees.select(F.col("src").alias("node"), "deg")
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_e12"))
    # Expression order mirrors the SQL oracle exactly (left-to-right
    # IEEE ops): floor(1e12 / n + 0.5), floor((1.0-d) * 1e12 / n + 0.5).
    init = int(math.floor(float(PR_SCALE) / n_nodes + 0.5))
    base = int(math.floor((1.0 - damping) * float(PR_SCALE) / n_nodes + 0.5))
    # r16 OPTIMIZATION (guide §5.4): per-iteration checkpoints are LAZY.
    # eager=True forced a blocking driver job per round (profiled at
    # 78-83 jobs/run for the 10-round PageRank); eager=False truncates
    # lineage identically but materializes as part of the next round's
    # own job, collapsing the driver round-trips to one per round.
    ranks = nodes.withColumn(
        "rank_e12", F.lit(init).cast("long")
    ).localCheckpoint(eager=False)
    for _ in range(n_iter):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_e12 div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(damping)
                        * F.coalesce("inflow", F.lit(0)).cast("double")
                        + F.lit(0.5)
                    ).cast("long")
                ).alias("rank_e12"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank_e12")


def _pagerank_oracle_sql(n_iter: int = PR_ITERATIONS) -> str:
    """Unrolled-iteration SQL twin of :func:`pagerank` over the exact
    near-dup edge set: one (contribs, ranks) CTE pair per round, same
    fixed-point arithmetic — bigint division/summation plus one IEEE
    multiply-floor per round, so the hash match is exact, not lucky."""
    sql = (
        _NGRAM_PAIRS_SQL
        + """
    , edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT a AS node, count(*) AS deg FROM edges GROUP BY a),
    nc AS (SELECT count(*) AS n FROM deg),
    bs AS (SELECT CAST(floor((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                             * 1000000000000.0 / n + 0.5) AS BIGINT) AS base
           FROM nc),
    r0 AS (SELECT d.node, d.deg,
                  CAST(floor(1000000000000.0 / n + 0.5) AS BIGINT) AS rk
           FROM deg d CROSS JOIN nc)
    """
    )
    for i in range(1, n_iter + 1):
        sql += f""",
    c{i} AS (SELECT e.b AS node, sum(r.rk // r.deg) AS inflow
             FROM edges e JOIN r{i - 1} r ON e.a = r.node GROUP BY e.b),
    r{i} AS (SELECT d.node, d.deg,
                    bs.base + CAST(floor(CAST(0.85 AS DOUBLE)
                        * coalesce(c.inflow, 0) + 0.5) AS BIGINT) AS rk
             FROM deg d CROSS JOIN bs LEFT JOIN c{i} c ON d.node = c.node)
    """
    sql += (
        f"\n    SELECT node AS doc_id, (rk + 500) // 1000 AS rank_e9"
        f" FROM r{n_iter}"
    )
    return sql


@register("q_llm_graph_pagerank", oracle=_pagerank_oracle_sql())
def q_llm_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the exact near-dup pair graph: for each
    clustered doc, its e9 fixed-point rank — the canonical-keeper
    score. Iterative (fixed 10 rounds) yet HASH-CHECKED: the e12
    fixed-point formulation makes every round bit-deterministic, and
    the oracle unrolls the same 10 rounds as chained SQL CTEs."""
    pairs = _dup_pairs(spark, sf_dir)
    pr = pagerank(pairs)
    return pr.select(
        F.col("node").alias("doc_id"),
        F.expr("(rank_e12 + 500) div 1000").alias("rank_e9"),
    )


@register(
    "q_llm_dedup_keep_best",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
      SELECT a, a FROM edges
      UNION
      SELECT a, b FROM edges
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    ),
    clusters AS (
      SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
    ),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT cluster_id,
           max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
           count(*) AS n_docs,
           count(*) - 1 AS n_dropped
    FROM ranked
    GROUP BY cluster_id
    """,
)
def q_llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup DECISION: near-dup clusters composed with a
    quality signal — per cluster, keep the longest document (n_chars,
    doc_id tie-break) and count the drops. This is the row a production
    dedup job actually writes; keeper selection is one max(struct)
    argmax per cluster, no sort. The component labels come from the
    per-(session, sf_dir) memoized fixpoint (_dedup_labels) shared
    with the other three label consumers — first caller pays."""
    from ex_hivent_spark.catalog import load_table

    clusters = _dedup_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        clusters.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars"),
                    (-F.col("doc_id")).alias("neg_id"),
                    F.col("doc_id"),
                )
            )["doc_id"].alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
        )
    )


@register(
    "q_graph_triangles",
    oracle=_NGRAM_PAIRS_SQL
    + """
    SELECT count(*) AS n_triangles,
           count(DISTINCT p1.doc_a) AS n_apex_nodes
    FROM pairs p1
    JOIN pairs p2 ON p2.doc_a = p1.doc_b
    JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the near-dup graph — the standard cluster
    density / cohesion metric (a dup cluster that is a clique is safe to
    collapse; a chain is suspect). Uses the oriented-edge formulation on
    the a<b pair list: each triangle {a<b<c} is counted exactly once via
    the two-hop join (a,b)+(b,c) closed by (a,c) — two equi-joins, no
    squaring, the standard distributed triangle-count plan."""
    pairs = (
        _dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    p1, p2, p3 = pairs.alias("p1"), pairs.alias("p2"), pairs.alias("p3")
    tri = p1.join(p2, F.col("p2.doc_a") == F.col("p1.doc_b")).join(
        p3,
        (F.col("p3.doc_a") == F.col("p1.doc_a"))
        & (F.col("p3.doc_b") == F.col("p2.doc_b")),
    )
    return tri.agg(
        F.count(F.lit(1)).alias("n_triangles"),
        F.countDistinct(F.col("p1.doc_a")).alias("n_apex_nodes"),
    )


# --------------------------------------------------------------------------
# Recursive hierarchy traversal (the WITH RECURSIVE query class)
# --------------------------------------------------------------------------
_ANC_ROUNDS = 7  # pointer jumping covers depth <= 2^7 = 128


@register(
    "q_graph_ancestry",
    oracle="""
    WITH RECURSIVE par AS (
      SELECT doc_id AS node,
             CASE WHEN doc_id = 0 THEN NULL
                  ELSE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 12)) AS BIGINT) % doc_id
             END AS parent
      FROM documents
    ),
    walk(node, anc, depth) AS (
      SELECT node, parent, CAST(1 AS BIGINT) FROM par
      WHERE parent IS NOT NULL
      UNION ALL
      SELECT w.node, p.parent, w.depth + 1
      FROM walk w JOIN par p ON w.anc = p.node
      WHERE p.parent IS NOT NULL
    )
    SELECT node AS doc_id, depth AS depth_to_root
    FROM walk WHERE anc = 0
    UNION ALL
    SELECT 0, CAST(0 AS BIGINT)
    """,
)
def q_graph_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal — the ``WITH RECURSIVE`` query
    class (org charts, bill-of-materials, category trees), which Spark
    SQL lacks natively.  The hierarchy is a deterministic random tree
    over doc_ids (``parent(d) = md5_int48(d) % d``, root 0 — md5-derived
    so both engines build the identical tree); output is every node's
    depth to the root.

    The oracle walks the tree edge-by-edge with a recursive CTE (O(depth)
    sequential steps); the Spark plan is POINTER JUMPING — each round
    composes the known ancestor map with itself (anc[2k] = anc[k]∘anc[k])
    via one self-equi-join, reaching depth 2^rounds in ``_ANC_ROUNDS``
    rounds.  O(log depth) joins instead of O(depth): the distributed
    formulation that makes hierarchy queries feasible at 100 TB, with
    localCheckpoint truncating lineage per round.  Random-recursive-tree
    height is Θ(e·ln n) ≈ 42 at n = 5·10⁶, far under the 128 bound."""
    from ex_hivent_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    par = d.select(
        F.col("doc_id").alias("node"),
        F.when(F.col("doc_id") == 0, F.lit(None).cast("long")).otherwise(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
                16,
                10,
            ).cast("long")
            % F.col("doc_id")
        ).alias("parent"),
    )
    cur = (
        par.where(F.col("parent").isNotNull())
        .select(
            "node",
            F.col("parent").alias("anc"),
            F.lit(1).cast("long").alias("depth"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(_ANC_ROUNDS):
        nxt = cur.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("depth").alias("j_depth"),
        )
        cur = (
            cur.join(nxt, cur.anc == nxt.j_node, "left")
            .select(
                "node",
                F.coalesce("j_anc", "anc").alias("anc"),
                (F.col("depth") + F.coalesce("j_depth", F.lit(0))).alias(
                    "depth"
                ),
            )
            .localCheckpoint(eager=True)
        )
    root = par.where(F.col("parent").isNull()).select(
        F.col("node").alias("doc_id"), F.lit(0).cast("long").alias("depth_to_root")
    )
    return cur.select(
        F.col("node").alias("doc_id"), F.col("depth").alias("depth_to_root")
    ).unionByName(root)


@register(
    "q_graph_lpa_step",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , edges AS (
      SELECT doc_a AS node, doc_b AS nb FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    nbl AS (
      SELECT e.node, d.lang AS nb_lang
      FROM edges e JOIN documents d ON d.doc_id = e.nb
    ),
    cnts AS (
      SELECT node, nb_lang, CAST(count(*) AS BIGINT) AS c
      FROM nbl GROUP BY node, nb_lang
    ),
    best AS (
      SELECT node,
             min({'nc': -c, 'lang': nb_lang}) AS b,
             CAST(sum(c) AS BIGINT) AS n_neighbors
      FROM cnts GROUP BY node
    )
    SELECT best.node AS doc_id,
           d.lang AS old_label,
           b['lang'] AS new_label,
           n_neighbors,
           CAST(-b['nc'] AS BIGINT) AS top_count
    FROM best JOIN documents d ON d.doc_id = best.node
    """,
)
def q_graph_lpa_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One label-propagation round over the near-duplicate graph,
    seeded with the documents' declared language labels: each node
    adopts the MOST FREQUENT label among its neighbors (ties broken
    lexicographically — the deterministic LPA variant), reporting old
    vs new label, degree, and the winning vote count. Iterated, this
    is community detection; one audited round is also the standard
    "does my language metadata agree with the duplication structure?"
    consistency check (a doc whose near-dups all carry another lang
    tag is a mislabeling signal).

    Plan: the edge list comes from the prefix-filtered exact-Jaccard
    pair op (never all-pairs), labels join in via the |docs|-row lang
    projection (hash join on doc_id), the vote is one (node, label)
    hash aggregate, and the argmax is a min-over-struct — no window,
    no sort. Per round: two shuffles (votes, argmax)."""
    from ex_hivent_spark.catalog import load_table
    pairs = _dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("node"), F.col("doc_b").alias("nb")
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("node"), F.col("doc_a").alias("nb")
        )
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    nbl = edges.join(d, edges.nb == d.doc_id).select("node", F.col("lang").alias("nb_lang"))
    cnts = nbl.groupBy("node", "nb_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    best = cnts.groupBy("node").agg(
        F.min(
            F.struct((-F.col("c")).alias("nc"), F.col("nb_lang").alias("lang"))
        ).alias("b"),
        F.sum("c").cast("bigint").alias("n_neighbors"),
    )
    return best.join(d, best.node == d.doc_id).select(
        F.col("node").alias("doc_id"),
        F.col("lang").alias("old_label"),
        F.col("b.lang").alias("new_label"),
        "n_neighbors",
        (-F.col("b.nc")).cast("bigint").alias("top_count"),
    )


@register(
    "q_llm_dedup_component_stats",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
      SELECT a, a FROM edges
      UNION
      SELECT a, b FROM edges
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    ),
    clusters AS (
      SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
    ),
    sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
      FROM clusters GROUP BY cluster_id
    ),
    corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents)
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           floor((CAST(cluster_size * count(*) AS DOUBLE) / n_corpus)
                 * 1000000.0 + 0.5) / 1000000.0 AS corpus_share
    FROM sizes CROSS JOIN corpus
    GROUP BY cluster_size, n_corpus
    """,
)
def q_llm_dedup_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution: how many near-dup
    components of each size the corpus carries and what share of all
    documents they cover — the one-page corpus-health summary a dedup
    run reports ("12% of the corpus sits in 2-doc clusters, one
    180-doc template cluster") and the number that decides whether
    keep-one dedup or soft down-weighting (SoftDeDup) is the right
    treatment.

    Plan: component labels come from the iterative min-label
    propagation of q_llm_dedup_clusters (prefix-filtered pair graph,
    never all-pairs), then two tiny hash aggregates (cluster → size,
    size → histogram) and a one-row corpus-count broadcast. The
    histogram is ≤ max-cluster-size rows."""
    from ex_hivent_spark.catalog import load_table

    labels = q_llm_dedup_clusters(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    corpus = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .crossJoin(F.broadcast(corpus))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            (
                F.floor(
                    (
                        (F.col("cluster_size") * F.col("n_clusters"))
                        .cast("double")
                        / F.col("n_corpus")
                    )
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("corpus_share"),
        )
    )


@register(
    "q_graph_degree_stats",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , und AS (
      SELECT doc_a AS node FROM pairs
      UNION ALL SELECT doc_b FROM pairs
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM und GROUP BY node
    )
    SELECT degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           min(node) AS min_node,
           max(node) AS max_node
    FROM deg GROUP BY degree
    """,
)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-duplicate graph — the first
    shape diagnostic of any dedup run: a long high-degree tail marks
    template/boilerplate hubs (one doc near-dup to hundreds) where
    transitive clustering over-merges, while an all-degree-1 histogram
    means clean disjoint pairs. Per distinct degree: node count and the
    id range.

    Plan: the a<b oriented pair list (the SAME bucketed prefix-filtered
    join as q_llm_ngram_jaccard — never all-pairs) unions into its two
    orientations, one hash aggregate per node, one per degree —
    hash-only shuffles on 8/16-byte keys, histogram output bounded by
    max degree. All-integer, no rounding anywhere."""
    pairs = _dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    und = pairs.select(F.col("doc_a").alias("node")).unionAll(
        pairs.select(F.col("doc_b").alias("node"))
    )
    deg = und.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


@register(
    "q_graph_jaccard_neighbors",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , und AS (
      SELECT doc_a AS x, doc_b AS c FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (
      SELECT x, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY x
    ),
    com AS (
      SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS common
      FROM pairs p
      JOIN und u1 ON u1.x = p.doc_a
      JOIN und u2 ON u2.x = p.doc_b AND u2.c = u1.c
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT p.doc_a, p.doc_b,
           CAST(coalesce(c.common, 0) AS BIGINT) AS common_neighbors,
           da.d AS deg_a, db.d AS deg_b,
           CAST(coalesce(c.common, 0) AS DOUBLE)
           / (da.d + db.d - coalesce(c.common, 0)) AS neighbor_jaccard
    FROM pairs p
    JOIN deg da ON da.x = p.doc_a
    JOIN deg db ON db.x = p.doc_b
    LEFT JOIN com c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
    """,
)
def q_graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity per EDGE of the near-dup graph —
    the classic link-strength / community-cohesion score (an edge whose
    endpoints share most neighbors sits inside a dense dup cluster; a
    zero-overlap edge is a chain link that transitive clustering should
    distrust): J = |N(a)∩N(b)| / |N(a)∪N(b)|, neighbor sets from the
    same graph.

    Plan: the a<b pair list (the bucketed prefix-filtered join — never
    all-pairs) fans into its two orientations once; common-neighbor
    counts come from the edge list joined twice against the adjacency
    (the triangle-count two-hop shape, work sum-of-degree², bounded by
    the dedup graph's degree distribution, not |docs|²); degrees join
    back per endpoint. Determinism: all-integer counts; the closing
    Jaccard is one exact integer-ratio division (union = deg_a + deg_b
    − common, which includes the endpoints themselves — the standard
    formulation over closed neighborhood-minus-self sets)."""
    pairs = (
        _dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)  # edges feed orientations, the
        # two-hop join, and the output spine: one pair computation
    )
    und = pairs.select(
        F.col("doc_a").alias("x"), F.col("doc_b").alias("c")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("x"), F.col("doc_a").alias("c"))
    )
    deg = und.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    u1 = und.select(F.col("x").alias("a1"), F.col("c").alias("c1"))
    u2 = und.select(F.col("x").alias("a2"), F.col("c").alias("c2"))
    com = (
        pairs.join(u1, F.col("a1") == F.col("doc_a"))
        .join(
            u2,
            (F.col("a2") == F.col("doc_b")) & (F.col("c2") == F.col("c1")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    da = deg.select(F.col("x").alias("xa"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("x").alias("xb"), F.col("d").alias("deg_b"))
    out = (
        pairs.join(da, F.col("xa") == F.col("doc_a"))
        .join(db, F.col("xb") == F.col("doc_b"))
        .join(com, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("common", F.lit(0))
            .cast("bigint")
            .alias("common_neighbors"),
            "deg_a",
            "deg_b",
            (
                F.coalesce("common", F.lit(0)).cast("double")
                / (
                    F.col("deg_a")
                    + F.col("deg_b")
                    - F.coalesce("common", F.lit(0))
                )
            ).alias("neighbor_jaccard"),
        )
    )
    return out


_KCORE_K = 2  # core order: iteratively peel nodes with degree < k
_KCORE_ROUNDS = 3  # fixed peel rounds (deterministic, both engines)


@register(
    "q_graph_kcore_step",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , e0 AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    d0 AS (SELECT x, count(*) AS c FROM
           (SELECT a AS x FROM e0 UNION ALL SELECT b FROM e0) GROUP BY x),
    k0 AS (SELECT x FROM d0 WHERE c >= 2),
    e1 AS (SELECT a, b FROM e0 WHERE a IN (SELECT x FROM k0)
                                  AND b IN (SELECT x FROM k0)),
    d1 AS (SELECT x, count(*) AS c FROM
           (SELECT a AS x FROM e1 UNION ALL SELECT b FROM e1) GROUP BY x),
    k1 AS (SELECT x FROM d1 WHERE c >= 2),
    e2 AS (SELECT a, b FROM e1 WHERE a IN (SELECT x FROM k1)
                                  AND b IN (SELECT x FROM k1)),
    d2 AS (SELECT x, count(*) AS c FROM
           (SELECT a AS x FROM e2 UNION ALL SELECT b FROM e2) GROUP BY x),
    k2 AS (SELECT x FROM d2 WHERE c >= 2),
    e3 AS (SELECT a, b FROM e2 WHERE a IN (SELECT x FROM k2)
                                  AND b IN (SELECT x FROM k2)),
    d3 AS (SELECT x, count(*) AS c FROM
           (SELECT a AS x FROM e3 UNION ALL SELECT b FROM e3) GROUP BY x)
    SELECT CAST(0 AS INTEGER) AS peel_round,
           CAST((SELECT count(*) FROM d0) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e0) AS BIGINT) AS n_edges,
           (SELECT CAST(max(c) AS BIGINT) FROM d0) AS max_degree
    UNION ALL
    SELECT CAST(1 AS INTEGER),
           CAST((SELECT count(*) FROM d1) AS BIGINT),
           CAST((SELECT count(*) FROM e1) AS BIGINT),
           (SELECT CAST(max(c) AS BIGINT) FROM d1)
    UNION ALL
    SELECT CAST(2 AS INTEGER),
           CAST((SELECT count(*) FROM d2) AS BIGINT),
           CAST((SELECT count(*) FROM e2) AS BIGINT),
           (SELECT CAST(max(c) AS BIGINT) FROM d2)
    UNION ALL
    SELECT CAST(3 AS INTEGER),
           CAST((SELECT count(*) FROM d3) AS BIGINT),
           CAST((SELECT count(*) FROM e3) AS BIGINT),
           (SELECT CAST(max(c) AS BIGINT) FROM d3)
    """,
)
def q_graph_kcore_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core peeling of the near-dup graph, three fixed rounds: drop
    every node with degree < 2 (and its edges), recompute, repeat —
    chains and pendant docs peel away; whatever survives is the cyclic
    "core" of each dup cluster (boilerplate/template hubs worth human
    review before mass deletion). Output: the per-round PEEL CENSUS —
    (round, surviving nodes, surviving edges, max degree), one row per
    level including the un-peeled round 0.

    r13 vacuous-op audit rewrite (the q_mm_phash_neardup census
    precedent): the original per-node in-core degree listing was EMPTY
    at every SF — the synthetic dup graph is a forest, so three peels
    leave nothing and the hash-match was schema-only, exercising none
    of the iteration. The census is non-empty by construction (always
    _KCORE_ROUNDS + 1 = 4 rows), makes the oracle check every peel
    level, and an empty final core now shows up as an explicit
    (3, 0, 0, NULL) row instead of silence.

    Plan: per round, ONE degree hash aggregate + two broadcast-able
    semi-joins of the edge list against the surviving-node set —
    hash-only shuffles on 8-byte keys; each round's edge frame is
    pinned with a lazy localCheckpoint (the iterative-algorithm
    discipline of lpa/pagerank) so lineage stays flat, and the census
    rows are four single-row aggregates cross-joined off those pinned
    frames. The round count is a FIXED literal (not run-to-fixpoint)
    so the oracle unrolls the identical levels. All-integer, no
    rounding anywhere."""
    edges = (
        _dup_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint(eager=False)
    )
    census = []
    for r in range(_KCORE_ROUNDS + 1):
        deg = (
            edges.select(F.col("a").alias("x"))
            .unionAll(edges.select(F.col("b").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        census.append(
            deg.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                F.max("c").cast("bigint").alias("max_degree"),
            )
            .crossJoin(
                edges.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_edges")
                )
            )
            .select(
                F.lit(r).cast("int").alias("peel_round"),
                "n_nodes",
                "n_edges",
                "max_degree",
            )
        )
        if r == _KCORE_ROUNDS:
            break
        keep = deg.filter(F.col("c") >= _KCORE_K).select("x")
        edges = (
            edges.join(
                keep.select(F.col("x").alias("a")), "a", "left_semi"
            )
            .join(keep.select(F.col("x").alias("b")), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)  # flat lineage per round
        )
    out = census[0]
    for c in census[1:]:
        out = out.unionAll(c)
    return out


@register(
    "q_llm_rouge_pairs",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , tc AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, tok
    ),
    tot AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY doc_id
    ),
    ov AS (
      SELECT p.doc_a, p.doc_b,
             CAST(sum(least(a.c, b.c)) AS BIGINT) AS overlap1
      FROM pairs p
      JOIN tc a ON a.doc_id = p.doc_a
      JOIN tc b ON b.doc_id = p.doc_b AND b.tok = a.tok
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT p.doc_a, p.doc_b,
           CAST(coalesce(ov.overlap1, 0) AS BIGINT) AS overlap1,
           ta.n AS n_ref, tb.n AS n_cand,
           CAST(coalesce(ov.overlap1, 0) AS DOUBLE) / ta.n AS rouge1_recall,
           CAST(coalesce(ov.overlap1, 0) AS DOUBLE) / tb.n
             AS rouge1_precision,
           CAST(2 * coalesce(ov.overlap1, 0) AS DOUBLE) / (ta.n + tb.n)
             AS rouge1_f1
    FROM pairs p
    JOIN tot ta ON ta.doc_id = p.doc_a
    JOIN tot tb ON tb.doc_id = p.doc_b
    LEFT JOIN ov ON ov.doc_a = p.doc_a AND ov.doc_b = p.doc_b
    """,
)
def q_llm_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 precision/recall/F1 for every near-duplicate pair —
    the summarization-eval metric repurposed as a dedup QUALITY audit:
    clipped unigram-multiset overlap (Σ min(count_a, count_b)) between
    the two sides of each candidate pair, with the lower-id doc as
    reference. A pair that passed 3-gram Jaccard but shows low ROUGE-1
    is a shingle-collision artifact; high-recall/low-precision pairs
    are containment (one doc swallows the other) rather than mirrors.

    Plan: the prefix-filtered pair list (never all-pairs) equi-joins
    the per-(doc, token) count frame twice ON TOKEN within the pair —
    work bounded by Σ per-pair shared vocabulary, not corpus²; totals
    join back from a per-doc frame. Determinism: all-integer clipped
    counts; closing ratios are exact integer-ratio IEEE divisions."""
    from ex_hivent_spark.catalog import load_table
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        _dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)  # pair list feeds overlap + spine
    )
    tc = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # reused by both join sides + totals
    )
    tot = tc.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    a = tc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("tok").alias("tok_a"),
        F.col("c").alias("ca"),
    )
    b = tc.select(
        F.col("doc_id").alias("b_doc"),
        F.col("tok").alias("tok_b"),
        F.col("c").alias("cb"),
    )
    ov = (
        pairs.join(a, "doc_a")
        .join(
            b,
            (F.col("doc_b") == F.col("b_doc"))
            & (F.col("tok_b") == F.col("tok_a")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).cast("bigint").alias("overlap1"))
    )
    ta = tot.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_ref"))
    tb = tot.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_cand"))
    o1 = F.coalesce("overlap1", F.lit(0)).cast("bigint")
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .join(ov, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            o1.alias("overlap1"),
            "n_ref",
            "n_cand",
            (o1.cast("double") / F.col("n_ref")).alias("rouge1_recall"),
            (o1.cast("double") / F.col("n_cand")).alias("rouge1_precision"),
            (
                (F.lit(2) * o1).cast("double")
                / (F.col("n_ref") + F.col("n_cand"))
            ).alias("rouge1_f1"),
        )
    )


@register(
    "q_graph_adamic_adar",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , und AS (
      SELECT doc_a AS x, doc_b AS c FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (
      SELECT x, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY x
    ),
    com AS (
      SELECT p.doc_a, p.doc_b, u1.c AS w
      FROM pairs p
      JOIN und u1 ON u1.x = p.doc_a
      JOIN und u2 ON u2.x = p.doc_b AND u2.c = u1.c
    ),
    aa AS (
      SELECT c.doc_a, c.doc_b,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(CAST(1.0 / (floor(ln(CAST(dw.d AS DOUBLE))
                                        * 1000000.0 + 0.5) / 1000000.0)
                           AS DECIMAL(25,6))) AS DOUBLE) AS aa_score
      FROM com c JOIN deg dw ON dw.x = c.w
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT p.doc_a, p.doc_b,
           CAST(coalesce(a.common_neighbors, 0) AS BIGINT)
             AS common_neighbors,
           CAST(coalesce(a.aa_score, 0.0) AS DOUBLE) AS aa_score
    FROM pairs p
    LEFT JOIN aa a ON a.doc_a = p.doc_a AND a.doc_b = p.doc_b
    """,
)
def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link strength per edge of the near-dup graph —
    the degree-weighted refinement of q_graph_jaccard_neighbors'
    common-neighbor count (AA = Σ_w 1/ln(deg w) over shared neighbors
    w): a neighbor shared through a promiscuous hub says little, one
    shared through a degree-2 node is strong evidence the edge sits
    inside a genuine duplicate cluster. The standard link-prediction /
    edge-confidence score.

    Plan: the a<b pair list (bucketed prefix-filtered join — never
    all-pairs) fans into its two orientations once; common neighbors
    come from the same two-hop adjacency join as the Jaccard op but
    RETAIN the witness id, whose degree joins in before one hash
    aggregate per edge (work sum-of-degree², bounded by the dup
    graph's degree distribution, not |docs|²). Determinism: a shared
    neighbor is adjacent to both endpoints so deg(w) ≥ 2 and
    ln(deg w) > 0 — no zero denominators; each 1/ln term e6-rounds its
    ln (the only libm) and the per-edge sum rides the decimal detour."""
    from ex_hivent_spark.functions.decimals import dround
    pairs = (
        _dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)  # edges feed orientations, the
        # two-hop join, and the output spine: one pair computation
    )
    und = pairs.select(
        F.col("doc_a").alias("x"), F.col("doc_b").alias("c")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("x"), F.col("doc_a").alias("c"))
    )
    deg = und.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    u1 = und.select(F.col("x").alias("a1"), F.col("c").alias("c1"))
    u2 = und.select(F.col("x").alias("a2"), F.col("c").alias("c2"))
    com = (
        pairs.join(u1, F.col("a1") == F.col("doc_a"))
        .join(
            u2,
            (F.col("a2") == F.col("doc_b")) & (F.col("c2") == F.col("c1")),
        )
        .select("doc_a", "doc_b", F.col("c1").alias("w"))
    )
    dw = deg.select(F.col("x").alias("w"), F.col("d").alias("dw"))
    aa = (
        com.join(dw, "w")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum(
                (
                    F.lit(1.0)
                    / dround(F.log(F.col("dw").cast("double")), 6)
                ).cast("decimal(25,6)")
            )
            .cast("double")
            .alias("aa_score"),
        )
    )
    return pairs.join(aa, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        F.coalesce("common_neighbors", F.lit(0))
        .cast("bigint")
        .alias("common_neighbors"),
        F.coalesce("aa_score", F.lit(0.0)).cast("double").alias("aa_score"),
    )


@register(
    "q_graph_clustering_coeff",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , tri AS (
      SELECT p1.doc_a AS a, p1.doc_b AS b, p2.doc_b AS c
      FROM pairs p1
      JOIN pairs p2 ON p2.doc_a = p1.doc_b
      JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
    ),
    tn AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    tcount AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM tn GROUP BY node
    ),
    und AS (
      SELECT doc_a AS node FROM pairs
      UNION ALL SELECT doc_b FROM pairs
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM und GROUP BY node
    )
    SELECT d.node, d.degree,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree < 2 THEN 0.0
                ELSE floor(2.0 * coalesce(t.n_tri, 0)
                           / (d.degree * (d.degree - 1))
                           * 1000000.0 + 0.5) / 1000000.0
           END AS clustering_coeff
    FROM deg d LEFT JOIN tcount t ON t.node = d.node
    """,
)
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node of the near-dup graph:
    c(v) = 2·T(v) / (deg(v)·(deg(v)−1)) with T(v) the triangles through
    v — the per-node cohesion readout that separates clique members
    (c → 1: safe to collapse the whole cluster onto one keeper) from
    chain bridges (c → 0: transitive merging is gluing unrelated docs
    through v). Complements q_graph_triangles' single global count and
    q_graph_jaccard_neighbors' per-edge score with the per-NODE view.

    Plan: the a<b oriented pair list (the same bucketed prefix-filtered
    join as q_llm_ngram_jaccard — never all-pairs) feeds the standard
    two-equi-join oriented triangle enumeration (q_graph_triangles'
    plan); each triangle fans out to its 3 corners, one hash aggregate
    per node, hash-joined to the degree frame — 8-byte-key shuffles
    throughout, output bounded by |nodes in the dup graph|.
    Determinism: all-integer until one e6-rounded IEEE division."""
    pairs = (
        _dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    p1, p2, p3 = pairs.alias("p1"), pairs.alias("p2"), pairs.alias("p3")
    tri = p1.join(p2, F.col("p2.doc_a") == F.col("p1.doc_b")).join(
        p3,
        (F.col("p3.doc_a") == F.col("p1.doc_a"))
        & (F.col("p3.doc_b") == F.col("p2.doc_b")),
    ).select(
        F.col("p1.doc_a").alias("a"),
        F.col("p1.doc_b").alias("b"),
        F.col("p2.doc_b").alias("c"),
    )
    tn = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcount = tn.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tri")
    )
    und = pairs.select(F.col("doc_a").alias("node")).unionAll(
        pairs.select(F.col("doc_b").alias("node"))
    )
    deg = und.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    joined = deg.join(tcount, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias(
            "n_triangles"
        ),
    )
    return joined.select(
        "node",
        "degree",
        "n_triangles",
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            F.floor(
                2.0
                * F.col("n_triangles")
                / (F.col("degree") * (F.col("degree") - 1))
                * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0
        )
        .alias("clustering_coeff"),
    )


@register(
    "q_graph_assortativity",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , und AS (
      SELECT doc_a AS node FROM pairs
      UNION ALL SELECT doc_b FROM pairs
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM und GROUP BY node
    ),
    ends AS (
      SELECT da.degree AS x, db.degree AS y
      FROM pairs p
      JOIN deg da ON da.node = p.doc_a
      JOIN deg db ON db.node = p.doc_b
      UNION ALL
      SELECT db.degree, da.degree
      FROM pairs p
      JOIN deg da ON da.node = p.doc_a
      JOIN deg db ON db.node = p.doc_b
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM ends
    )
    SELECT CAST(m / 2 AS BIGINT) AS n_edges,
           CASE WHEN CAST(m * sxx - sx * sx AS DOUBLE) = 0 THEN 0.0
                ELSE floor(CAST(m * sxy - sx * sx AS DOUBLE)
                           / CAST(m * sxx - sx * sx AS DOUBLE)
                           * 1000000.0 + 0.5) / 1000000.0
           END AS assortativity
    FROM sums
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the near-dup graph — the Newman
    coefficient: Pearson correlation of endpoint degrees over the
    directed-both-ways edge list (symmetric, so Σx = Σy and
    Σx² = Σy², and r = (MΣxy − (Σx)²) / (MΣx² − (Σx)²) with M = 2|E|).
    Positive r means hubs link to hubs (template boilerplate forming a
    core that transitive clustering will glue into one mega-cluster);
    negative means hub-and-spoke (one canonical doc with many
    one-off copies — safe keep-best shape). The one-number companion
    to q_graph_degree_stats' histogram.

    Plan: the prefix-filtered pair list (never all-pairs) gets its
    degree frame (two hash aggregates), joins degrees back onto both
    endpoints (8-byte-key hash joins), and reduces to ONE row of
    integer moment sums — partial aggregation throughout, no windows.
    Determinism: every sum is exact BIGINT; the closing ratio is one
    e6-rounded IEEE division (cast to double only at the end)."""
    pairs = (
        _dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    und = pairs.select(F.col("doc_a").alias("node")).unionAll(
        pairs.select(F.col("doc_b").alias("node"))
    )
    deg = und.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    da = deg.select(
        F.col("node").alias("doc_a"), F.col("degree").alias("dx")
    )
    db = deg.select(
        F.col("node").alias("doc_b"), F.col("degree").alias("dy")
    )
    joined = pairs.join(da, "doc_a").join(db, "doc_b")
    ends = joined.select(
        F.col("dx").alias("x"), F.col("dy").alias("y")
    ).unionAll(joined.select(F.col("dy").alias("x"), F.col("dx").alias("y")))
    sums = ends.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    den = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    return sums.select(
        (F.col("m") / F.lit(2)).cast("bigint").alias("n_edges"),
        F.when(den == 0, F.lit(0.0))
        .otherwise(F.floor(num / den * 1000000.0 + F.lit(0.5)) / 1000000.0)
        .alias("assortativity"),
    )


@register(
    "q_llm_cluster_source_purity",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
      SELECT a, a FROM edges
      UNION
      SELECT a, b FROM edges
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    ),
    cl AS (
      SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
    ),
    counts AS (
      SELECT cl.cluster_id, d.source, CAST(count(*) AS BIGINT) AS cnt
      FROM cl JOIN documents d ON d.doc_id = cl.doc_id
      GROUP BY cl.cluster_id, d.source
    )
    SELECT cluster_id,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_sources,
           (min({'nc': -cnt, 's': source})).s AS top_source,
           CAST(-(min({'nc': -cnt, 's': source})).nc AS BIGINT) AS n_top,
           CAST(-(min({'nc': -cnt, 's': source})).nc AS DOUBLE)
               / sum(cnt) AS purity
    FROM counts GROUP BY cluster_id
    """,
)
def q_llm_cluster_source_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source purity of each near-duplicate cluster: the share of a
    cluster's docs coming from its dominant source (ties to the
    lexicographically first source) — the syndication detector: a
    low-purity cluster is one article republished across sources
    (dedup should keep one globally), a purity-1.0 cluster is
    within-source boilerplate (a per-source template rule fixes it
    upstream). The label-conditioned companion of
    q_llm_dedup_component_stats' size histogram. (Pairs block on
    lang, so LANGUAGE purity is 1.0 by construction — source is the
    dimension the clusters can actually mix.)

    Plan: the iterative min-label components (prefix-filtered pair
    op, per-round localCheckpoint) hash-join the documents' source
    column, then two hash aggregates — (cluster, source) counts and
    the per-cluster struct-argmax — 8-byte-key shuffles, output
    bounded by |clusters|. Determinism: all-integer counts, struct
    tiebreak on the source string, one exact IEEE division."""
    from ex_hivent_spark.catalog import load_table

    cl = _dedup_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = (
        cl.join(docs, "doc_id")
        .groupBy("cluster_id", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    top = F.min(
        F.struct((-F.col("cnt")).alias("nc"), F.col("source").alias("s"))
    )
    return counts.groupBy("cluster_id").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        top["s"].alias("top_source"),
        (-top["nc"]).cast("bigint").alias("n_top"),
        ((-top["nc"]).cast("double") / F.sum("cnt")).alias("purity"),
    )


@register(
    "q_graph_modularity",
    oracle=_NGRAM_PAIRS_SQL
    + """
    , lab AS (SELECT doc_id, lang FROM documents),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
    e_in AS (
      SELECT la.lang, CAST(count(*) AS BIGINT) AS e_c
      FROM pairs p
      JOIN lab la ON la.doc_id = p.doc_a
      JOIN lab lb ON lb.doc_id = p.doc_b
      WHERE la.lang = lb.lang
      GROUP BY la.lang
    ),
    deg AS (
      SELECT l.lang, CAST(count(*) AS BIGINT) AS d_c
      FROM (SELECT doc_a AS node FROM pairs
            UNION ALL SELECT doc_b FROM pairs) u
      JOIN lab l ON l.doc_id = u.node
      GROUP BY l.lang
    ),
    terms AS (
      SELECT d.lang,
             CAST(coalesce(e.e_c, 0) AS BIGINT) AS e_c,
             d.d_c, m.m,
             floor((CAST(coalesce(e.e_c, 0) AS DOUBLE) / m.m
                    - (CAST(d.d_c AS DOUBLE) / (2 * m.m))
                      * (CAST(d.d_c AS DOUBLE) / (2 * m.m)))
                   * 1000000.0 + 0.5) / 1000000.0 AS q_term
      FROM deg d LEFT JOIN e_in e ON e.lang = d.lang
      CROSS JOIN m
    )
    SELECT lang, e_c AS n_within_edges, d_c AS degree_sum, q_term,
           floor(CAST((SELECT sum(CAST(t2.q_term AS DECIMAL(25,6)))
                       FROM terms t2) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS modularity_q
    FROM terms
    """,
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LANGUAGE partition over the near-dup
    graph: Q = Σ_c (e_c/m − (d_c/2m)²) — does the duplication
    structure align with the language communities? (Q near 0: dup
    edges ignore language — cross-lang template reuse / translation
    dups; high Q: dedup clusters stay within languages, so
    per-language dedup sharding is safe.) Per-language terms emitted
    next to the global Q so the driver of the score is visible.

    Plan: the memoized prefix-filtered pair frame (never all-pairs) +
    two broadcast-joined label lookups, a ≤|langs| aggregate each for
    within-edges and degree mass, one scalar fold. All-integer inputs;
    the Q terms are exact integer-ratio double arithmetic e6-rounded,
    their sum rides the decimal detour. Oracle is quadratic in the
    pair CTE (the skipped_heavy_oracles class at sf0.1 — covered by
    the sampled hash check + the degree/edge invariants that
    scripts/sf01_sample_check.py already verifies on this exact
    frame)."""
    from ex_hivent_spark.catalog import load_table
    from ex_hivent_spark.functions.decimals import dround

    pairs = _dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    lab = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    m_df = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    la = lab.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "lang", "lang_a"
    )
    lb = lab.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "lang", "lang_b"
    )
    tagged = pairs.join(F.broadcast(la), "doc_a").join(
        F.broadcast(lb), "doc_b"
    )
    e_in = (
        tagged.filter(F.col("lang_a") == F.col("lang_b"))
        .groupBy(F.col("lang_a").alias("lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    und = pairs.select(F.col("doc_a").alias("node")).unionAll(
        pairs.select(F.col("doc_b").alias("node"))
    )
    deg = (
        und.join(
            F.broadcast(lab.withColumnRenamed("doc_id", "node")), "node"
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    md = F.col("m").cast("double")
    q_term = dround(
        F.col("e_c").cast("double") / md
        - (F.col("d_c").cast("double") / (2 * md))
        * (F.col("d_c").cast("double") / (2 * md)),
        6,
    )
    terms = (
        deg.join(e_in, "lang", "left")
        .na.fill({"e_c": 0})
        .crossJoin(F.broadcast(m_df))
        .select(
            "lang",
            F.col("e_c").cast("bigint").alias("n_within_edges"),
            F.col("d_c").alias("degree_sum"),
            q_term.alias("q_term"),
        )
    )
    q_all = terms.agg(
        dround(
            F.sum(F.col("q_term").cast("decimal(25,6)")).cast("double"), 6
        ).alias("modularity_q")
    )
    return terms.crossJoin(F.broadcast(q_all))
