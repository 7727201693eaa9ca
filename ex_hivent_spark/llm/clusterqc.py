"""Cluster-quality indices over the labeled embedding corpus:
centroid silhouette, Davies–Bouldin, and Calinski–Harabasz — the
"are these cluster/label assignments actually geometry?" audit panel
that gates semdedup/kmeans/classifier work before anyone trusts the
labels (a collapsed encoder or noisy labeling shows up here first).

Plan discipline (the q_emb_label_centroid_sim class, similarity.py):
ONE posexplode of the corpus to the (vec, dim) grain feeds a hash
aggregate down to the |labels|×64 centroid frame; everything after is
centroid-sized and the per-vector distance pass joins that broadcast
frame — at 100 TB only the explode-aggregate touches the corpus, it
combines map-side, and no vector ever shuffles (64 doubles/row stay in
their scan partition).

Determinism: per-dimension sums ride decimal(25,9) (float inputs exact
in double, |x| ≲ 1); squared-difference sums ride decimal(25,12);
every sqrt (the only libm) is e6-rounded; per-row statistics land on
the e6 grid BEFORE any cross-row decimal sum, so accumulation order
never matters.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no embedding surface; these derive from the
driver's LLM-pipeline mandate and the classical clustering-validity
literature (Rousseeuw 1987; Davies–Bouldin 1979; Calinski–Harabasz
1974), centroid-simplified for the distributed setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

_DIM = 64

# (vec_id, label, dim, x) exploded corpus — SQL CTE body.
_SQL_DIMS = f"""
      SELECT vec_id, label, d AS dim, CAST(e[d + 1] AS DOUBLE) AS x
      FROM (SELECT vec_id, label,
                   list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
            FROM embeddings)
      CROSS JOIN unnest(range(0, {_DIM})) AS u(d)
"""

# per-label centroid frame — SQL CTE body (expects dims). count(*)
# per (label, dim) row IS the label's member count (one exploded row
# per member per dimension).
_SQL_CENT = """
      SELECT label AS clabel, dim,
             CAST(sum(CAST(x AS DECIMAL(25,9))) AS DOUBLE) / count(*)
               AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM dims GROUP BY label, dim
"""

# per-(vec, candidate-label) centroid distance — SQL CTE body
# (expects dims + cent). n is per-dim count == member count.
_SQL_VDIST = """
      SELECT d.vec_id, d.label, c.clabel,
             {dist} AS dist
      FROM dims d JOIN cent c ON c.dim = d.dim
      GROUP BY d.vec_id, d.label, c.clabel
""".format(
    dist=sql_dround(
        "sqrt(CAST(sum(CAST((d.x - c.c) * (d.x - c.c)"
        " AS DECIMAL(25,12))) AS DOUBLE))",
        6,
    )
)


def _dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    )


def _cent(dims: DataFrame) -> DataFrame:
    """|labels|×64 centroid frame: (clabel, dim, c, n_members)."""
    return dims.groupBy(
        F.col("label").alias("clabel"), "dim"
    ).agg(
        (
            F.sum(F.col("x").cast("decimal(25,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


def _vdist(dims: DataFrame, cent: DataFrame) -> DataFrame:
    """Per (vec, candidate label) e6-rounded centroid distance."""
    j = dims.join(
        F.broadcast(cent.select("clabel", "dim", "c")), "dim"
    )
    return j.groupBy("vec_id", "label", "clabel").agg(
        dround(
            F.sqrt(
                F.sum(
                    (
                        (F.col("x") - F.col("c"))
                        * (F.col("x") - F.col("c"))
                    ).cast("decimal(25,12)")
                ).cast("double")
            ),
            6,
        ).alias("dist")
    )


# ---------------------------------------------------------------------------
# r16 OPTIMIZATION: literal-centroid distance path.
#
# The _vdist plan fans the corpus out ×64 (posexplode) ×k (the dim-only
# broadcast join) and shuffles the n·64·k rows through TWO hash
# aggregates — 1.28M rows at the 2k-vector gate SF, n·640 at any scale.
# But k centroids are a k×64 matrix: collect them ONCE (bounded by the
# label cardinality — the abc-classification literal discipline), and
# every per-vector distance becomes a ROW-LOCAL zip_with/aggregate fold
# over the embedding array against a literal centroid array. The corpus
# is touched in one narrow map pass with NO fan-out and NO per-vector
# shuffle; only |labels|-sized frames move. Guarded: a label set larger
# than _CENT_LITERAL_MAX (plan-size bound) falls back to the
# distributed _vdist plan, which handles unbounded k.
#
# Exactness: per element ((x-c)²) is cast to decimal(25,12) exactly as
# the oracle's per-row term; the fold's decimal additions are exact at
# scale 12 (SUM over the same terms — decimal addition is
# order-insensitive); coalesce(·, 0) reproduces SUM's null-skip.
# ---------------------------------------------------------------------------

_CENT_LITERAL_MAX = 128

from ex_hivent_spark.session_memo import session_memo  # noqa: E402


@session_memo
def _cent_rows(spark: SparkSession, sf_dir: str):
    """Collected k×64 centroid rows (clabel, dim, c, n) — bounded by
    the label cardinality. Session-memoized (the cosupplier_frames
    precedent): the three cluster-quality queries share one collect."""
    return _cent(_dims(spark, sf_dir)).collect()


def _centroids_local(spark: SparkSession, sf_dir: str):
    """(labels, {label: centroid}, {label: n}, complete) — the collected
    k×64 centroid matrix. ``complete`` is False if any (label, dim)
    cell is missing or null (ragged corpus) — callers then fall back to
    the distributed plan."""
    rows = _cent_rows(spark, sf_dir)
    vecs: dict = {}
    counts: dict = {}
    complete = True
    for r in rows:
        d = r["dim"]
        if d is None or not (0 <= d < _DIM):
            complete = False
            continue
        vecs.setdefault(r["clabel"], [None] * _DIM)[d] = r["c"]
        counts[r["clabel"]] = r["n"]
    complete = complete and bool(vecs) and all(
        c is not None for v in vecs.values() for c in v
    )
    labels = sorted(vecs, key=lambda x: (x is None, x))
    return labels, vecs, counts, complete


def _dist_lit(e_col, cvec) -> "F.Column":
    """e6-rounded Euclidean distance of an embedding array column to a
    literal centroid — the row-local twin of one _vdist group."""
    zero = F.lit(0).cast("decimal(25,12)")
    sq = F.zip_with(
        e_col,
        F.array(*[F.lit(float(c)) for c in cvec]),
        lambda x, c: ((x - c) * (x - c)).cast("decimal(25,12)"),
    )
    s = F.aggregate(
        sq, zero, lambda acc, v: (acc + F.coalesce(v, zero)).cast(
            "decimal(25,12)"
        )
    )
    return dround(F.sqrt(s.cast("double")), 6)


def _emb_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, e) with null/empty embeddings dropped — the rows
    the posexplode pipeline would drop (explode of null/empty emits
    nothing).

    r16 wave 10: spread_table — the sole consumer (the silhouette
    literal-centroid path) evaluates k x 64 interpreted zip_with/
    aggregate folds PER ROW in the projection directly over this scan,
    which ran as ONE task on the single-row-group input (guide §2.5);
    inert on multi-split production inputs."""
    from ex_hivent_spark.catalog import spread_table

    em = spread_table(spark, sf_dir, "embeddings", "vec_id")
    return em.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    ).filter(F.col("e").isNotNull() & (F.size("e") > 0))


def _silhouette_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-k fallback: the original posexplode + _vdist plan."""
    dims = _dims(spark, sf_dir).localCheckpoint(eager=False)
    vd = _vdist(dims, _cent(dims))
    ab = vd.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("dist"))
        ).alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.col("dist"))
        ).alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    s = ab.select(
        "label",
        F.when(F.greatest(a, b) == 0, F.lit(0.0))
        .otherwise(dround((b - a) / F.greatest(a, b), 6))
        .alias("sil"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dround(
                F.sum(F.col("sil").cast("decimal(25,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


@register(
    "q_emb_silhouette",
    oracle=f"""
    WITH dims AS ({_SQL_DIMS}),
    cent AS ({_SQL_CENT}),
    vdist AS ({_SQL_VDIST}),
    ab AS (
      SELECT vec_id, label,
             max(CASE WHEN clabel = label THEN dist END) AS a,
             min(CASE WHEN clabel <> label THEN dist END) AS b
      FROM vdist GROUP BY vec_id, label
    ),
    s AS (
      SELECT label,
             CASE WHEN greatest(a, b) = 0 THEN 0.0
                  ELSE {sql_dround("(b - a) / greatest(a, b)", 6)}
             END AS sil
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           {sql_dround(
               "CAST(sum(CAST(sil AS DECIMAL(25,9))) AS DOUBLE)"
               " / count(*)", 6)} AS mean_silhouette
    FROM s GROUP BY label ORDER BY label
    """,
)
def q_emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid silhouette per label: for each vector, a = distance to
    its OWN label centroid, b = distance to the nearest OTHER
    centroid, s = (b − a)/max(a, b) ∈ [−1, 1] — the per-class
    assignment-quality readout (negative mean = the label's vectors
    sit closer to a competitor's centroid than their own). The
    centroid simplification replaces Rousseeuw's all-pairs a/b with
    centroid distances — O(n·k) instead of O(n²), the only version
    that survives a 10⁹-vector corpus.

    Plan (r16 OPTIMIZATION — was posexplode → dim-only broadcast join
    → two n-scale hash aggregates, a ×64×k corpus fan-out): the k
    centroids are collected once (_centroids_local) and every a/b is
    a row-local fold against literal centroid arrays — one narrow map
    pass over the corpus, zero per-vector shuffle; the only exchange
    left carries |labels| rows. Falls back to the distributed _vdist
    plan above _CENT_LITERAL_MAX labels. Determinism: identical
    decimal-detour terms, e6-rounded sqrt per (vec, centroid), e6
    silhouette per vector BEFORE the per-label decimal mean; the
    a = b = 0 degenerate point reads 0."""
    labels, vecs, _counts, complete = _centroids_local(spark, sf_dir)
    if not complete or len(labels) > _CENT_LITERAL_MAX:
        return _silhouette_distributed(spark, sf_dir)
    base = _emb_base(spark, sf_dir)
    proj = base.select(
        "vec_id",
        "label",
        *[
            _dist_lit(F.col("e"), vecs[lab]).alias(f"_d{i}")
            for i, lab in enumerate(labels)
        ],
    )
    own = None
    for i, lab in enumerate(labels):
        cond = F.col("label") == F.lit(lab)
        own = (
            F.when(cond, F.col(f"_d{i}"))
            if own is None
            else own.when(cond, F.col(f"_d{i}"))
        )
    others = [
        F.when(F.col("label") != F.lit(lab), F.col(f"_d{i}"))
        for i, lab in enumerate(labels)
    ]
    nearest_other = (
        F.least(*others)
        if len(others) >= 2
        else F.lit(None).cast("double")
    )
    ab = proj.select(
        "vec_id", "label", own.alias("a"), nearest_other.alias("b")
    )
    a, b = F.col("a"), F.col("b")
    s = ab.select(
        "label",
        F.when(F.greatest(a, b) == 0, F.lit(0.0))
        .otherwise(dround((b - a) / F.greatest(a, b), 6))
        .alias("sil"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dround(
                F.sum(F.col("sil").cast("decimal(25,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


def _davies_bouldin_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-k fallback: the original posexplode + _vdist plan."""
    dims = _dims(spark, sf_dir).localCheckpoint(eager=False)
    cent = _cent(dims).localCheckpoint(eager=False)
    vd = _vdist(dims, cent)
    intra = (
        vd.filter(F.col("clabel") == F.col("label"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dround(
                F.sum(F.col("dist").cast("decimal(25,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("s_intra"),
        )
    )
    return _db_close(cent, intra)


def _db_close(cent: DataFrame, intra: DataFrame) -> DataFrame:
    """cd (pairwise centroid distance) + R_i closing over a centroid
    frame and the per-label intra frame — shared by both DB plans."""
    a = cent.select(
        F.col("clabel").alias("la"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("clabel").alias("lb"), "dim", F.col("c").alias("cb")
    )
    cd = (
        a.join(b, "dim")
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            dround(
                F.sqrt(
                    F.sum(
                        (
                            (F.col("ca") - F.col("cb"))
                            * (F.col("ca") - F.col("cb"))
                        ).cast("decimal(25,12)")
                    ).cast("double")
                ),
                6,
            ).alias("m")
        )
    )
    ia = intra.select(
        F.col("label").alias("la"),
        F.col("n").alias("n_a"),
        F.col("s_intra").alias("s_a"),
    )
    ib = intra.select(
        F.col("label").alias("lb"), F.col("s_intra").alias("s_b")
    )
    r = (
        cd.join(F.broadcast(ia), "la")
        .join(F.broadcast(ib), "lb")
        .groupBy(
            F.col("la").alias("label"),
            F.col("n_a").alias("n"),
            F.col("s_a").alias("s_intra"),
        )
        .agg(
            F.max(
                F.when(F.col("m") == 0, F.lit(None).cast("double"))
                .otherwise(
                    dround((F.col("s_a") + F.col("s_b")) / F.col("m"), 6)
                )
            ).alias("r_max")
        )
    )
    return r.select("label", "n", "s_intra", "r_max").orderBy("label")


@register(
    "q_emb_davies_bouldin",
    oracle=f"""
    WITH dims AS ({_SQL_DIMS}),
    cent AS ({_SQL_CENT}),
    vdist AS ({_SQL_VDIST}),
    intra AS (
      SELECT label,
             CAST(count(*) AS BIGINT) AS n,
             {sql_dround(
                 "CAST(sum(CAST(dist AS DECIMAL(25,9))) AS DOUBLE)"
                 " / count(*)", 6)} AS s_intra
      FROM vdist WHERE clabel = label GROUP BY label
    ),
    cd AS (
      SELECT a.clabel AS la, b.clabel AS lb,
             {sql_dround(
                 "sqrt(CAST(sum(CAST((a.c - b.c) * (a.c - b.c)"
                 " AS DECIMAL(25,12))) AS DOUBLE))", 6)} AS m
      FROM cent a JOIN cent b
        ON a.dim = b.dim AND a.clabel <> b.clabel
      GROUP BY a.clabel, b.clabel
    ),
    r AS (
      SELECT cd.la AS label, ia.n,
             ia.s_intra,
             max(CASE WHEN cd.m = 0 THEN NULL ELSE
               {sql_dround("(ia.s_intra + ib.s_intra) / cd.m", 6)}
             END) AS r_max
      FROM cd
      JOIN intra ia ON ia.label = cd.la
      JOIN intra ib ON ib.label = cd.lb
      GROUP BY cd.la, ia.n, ia.s_intra
    )
    SELECT label, n, s_intra, r_max FROM r ORDER BY label
    """,
)
def q_emb_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin components per label: S_i = mean distance of the
    label's vectors to their centroid (cluster spread), and
    R_i = max_{j≠i} (S_i + S_j)/M_ij with M the inter-centroid
    distance — the worst-competitor compactness/separation ratio
    whose mean over labels is the DB index (lower = better-separated
    clustering). Emitting the per-label decomposition (not just the
    scalar) names WHICH class pair is collapsing.

    Plan: the corpus touches one posexplode + one broadcast-join
    distance aggregate (own-centroid rows only feed S_i — the
    clabel = label predicate pushes into the join, so there is NO ×k
    fan-out here); the pairwise M frame is k²·64 rows of centroid
    data. r16 NOTE: the literal-centroid fold that speeds up
    q_emb_silhouette was A/B-tested here and REGRESSED (1.43 → 2.41 s
    — the own-label-only plan never paid the ×k fan-out, while the
    interpreted per-element decimal fold costs more than the
    codegen'd aggregate), so this op deliberately keeps the
    distributed plan. Determinism: decimal sums, e6-rounded sqrts and
    ratios — the max runs over already-rounded ratios so accumulation
    order never matters; a zero inter-centroid distance (duplicate
    centroids) yields NULL rather than an engine-specific infinity."""
    return _davies_bouldin_distributed(spark, sf_dir)


@register(
    "q_emb_calinski_harabasz",
    oracle=f"""
    WITH dims AS ({_SQL_DIMS}),
    cent AS ({_SQL_CENT}),
    vdist AS ({_SQL_VDIST}),
    grand AS (
      SELECT dim,
             CAST(sum(CAST(x AS DECIMAL(25,9))) AS DOUBLE) / count(*)
               AS g
      FROM dims GROUP BY dim
    ),
    b AS (
      SELECT CAST(sum(CAST({sql_dround(
                 "c2.n * (c2.c - g.g) * (c2.c - g.g)", 6)}
               AS DECIMAL(38,6))) AS DOUBLE) AS b_ss
      FROM cent c2 JOIN grand g ON g.dim = c2.dim
    ),
    w AS (
      SELECT CAST(sum(CAST({sql_dround("dist * dist", 6)}
               AS DECIMAL(38,6))) AS DOUBLE) AS w_ss,
             CAST(count(*) AS BIGINT) AS n_vecs
      FROM vdist WHERE clabel = label
    ),
    k AS (
      SELECT CAST(count(DISTINCT clabel) AS BIGINT) AS k FROM cent
    )
    SELECT n_vecs, k,
           {sql_dround("b_ss", 6)} AS b_ss,
           {sql_dround("w_ss", 6)} AS w_ss,
           CASE WHEN w_ss = 0 OR k <= 1 THEN NULL ELSE
             {sql_dround(
                 "(b_ss / (k - 1)) / (w_ss / (n_vecs - k))", 6)}
           END AS ch_index
    FROM b, w, k
    """,
)
def q_emb_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski–Harabasz (variance-ratio) index of the label
    clustering: CH = [B/(k−1)] / [W/(n−k)] with B the
    between-centroid dispersion Σ nᵢ‖cᵢ − ḡ‖² and W the within
    dispersion Σ‖x − c_{label(x)}‖² — the single-number clustering
    strength (higher = tighter, better-separated classes), reported
    next to its B/W decomposition so regressions name their side.

    Plan: the same one-explode pipeline; B is centroid-frame-sized
    arithmetic against the broadcast grand centroid, W reuses the
    own-centroid distance pass (sum of e6-grid squared distances).
    r16 NOTE: the literal-centroid fold that speeds up
    q_emb_silhouette was A/B-tested here and REGRESSED (1.27 → 3.75 s
    — same reason as q_emb_davies_bouldin: no ×k fan-out to remove,
    and the interpreted decimal fold plus the 128-column grand
    aggregate cost more than the codegen'd posexplode plan), so this
    op deliberately keeps the distributed plan. Determinism: decimal
    sums everywhere, each squared term e6-rounded before its
    cross-row decimal sum, degenerate W = 0 / k = 1 read NULL on both
    engines."""
    return _calinski_distributed(spark, sf_dir)


def _ch_close(b: DataFrame, w: DataFrame, k: DataFrame) -> DataFrame:
    """CH index closing select over the one-row b/w/k frames."""
    out = b.crossJoin(w).crossJoin(k)
    b_ss, w_ss, kk, n = (
        F.col("b_ss"),
        F.col("w_ss"),
        F.col("k"),
        F.col("n_vecs"),
    )
    return out.select(
        n.alias("n_vecs"),
        kk.alias("k"),
        dround(b_ss, 6).alias("b_ss"),
        dround(w_ss, 6).alias("w_ss"),
        F.when((w_ss == 0) | (kk <= 1), F.lit(None).cast("double"))
        .otherwise(dround((b_ss / (kk - 1)) / (w_ss / (n - kk)), 6))
        .alias("ch_index"),
    )


def _calinski_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-k fallback: the original posexplode + _vdist plan."""
    dims = _dims(spark, sf_dir).localCheckpoint(eager=False)
    cent = _cent(dims).localCheckpoint(eager=False)
    vd = _vdist(dims, cent)
    grand = dims.groupBy("dim").agg(
        (
            F.sum(F.col("x").cast("decimal(25,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("g")
    )
    b = (
        cent.join(F.broadcast(grand), "dim")
        .agg(
            F.sum(
                dround(
                    F.col("n")
                    * (F.col("c") - F.col("g"))
                    * (F.col("c") - F.col("g")),
                    6,
                ).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("b_ss")
        )
    )
    w = (
        vd.filter(F.col("clabel") == F.col("label"))
        .agg(
            F.sum(
                dround(F.col("dist") * F.col("dist"), 6).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("w_ss"),
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        )
    )
    k = cent.agg(
        F.countDistinct("clabel").cast("bigint").alias("k")
    )
    return _ch_close(b, w, k)
