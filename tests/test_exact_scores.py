"""similarity.exact_scores / unit_vec / projections / _dot_pd: the r14
Arrow scoring layer's contracts — bit-exactness against the expression
forms, null/ragged/empty fallback semantics, carry columns, and the
in-closure query matrix shape."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def _mk(spark, rows, schema="vec_id long, embedding array<float>"):
    return spark.createDataFrame(rows, schema)


def test_dot_udf_bit_equals_expression_fold(spark):
    """The Arrow fold must be BIT-identical to the HOF fold — the
    property the whole r14 swap rests on (cumsum is the IEEE
    sequential left-fold; the closing +0.0 matches the init)."""
    from ex_hivent_spark.llm.similarity import dot, dot_expr

    rows = [
        (1, [0.1, -0.2, 0.3, 1e30, -1e30, 7.5]),
        (2, [1e-30, 2e-30, -3.5, 0.0, -0.0, 42.0]),
        (3, [float(i) * 0.37 - 1.1 for i in range(6)]),
    ]
    df = _mk(spark, rows)
    a = df.alias("a")
    b = df.alias("b")
    pairs = a.crossJoin(b).select(
        dot(F.col("a.embedding"), F.col("b.embedding")).alias("u"),
        dot_expr(F.col("a.embedding"), F.col("b.embedding")).alias("e"),
    )
    for r in pairs.collect():
        # bit-equality, not approx: both NaN or identical doubles
        assert (
            r["u"] == r["e"]
            or (r["u"] != r["u"] and r["e"] != r["e"])
        ), (r["u"], r["e"])


def test_dot_udf_null_and_ragged_match_zipwith_semantics(spark):
    """zip_with pads the shorter array with null, poisoning the fold
    to NULL; a null array is NULL. The UDF must mirror both."""
    from ex_hivent_spark.llm.similarity import dot

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], [3.0, 4.0]),   # ok -> 11.0
            (2, None, [1.0, 2.0]),          # null side -> NULL
            (3, [1.0, 2.0], [1.0]),         # ragged -> NULL
            (4, [], []),                    # empty fold -> init 0.0
        ],
        "id long, a array<double>, b array<double>",
    )
    got = {
        r["id"]: r["d"]
        for r in df.select(
            "id", dot(F.col("a"), F.col("b")).alias("d")
        ).collect()
    }
    assert got[1] == 11.0
    assert got[2] is None
    assert got[3] is None
    assert got[4] == 0.0


def test_unit_vec_equals_transform_division(spark):
    """unit_vec must equal x.cast(double)/l2_norm_expr element-wise,
    including null rows (null -> null)."""
    from ex_hivent_spark.llm.similarity import l2_norm_expr, unit_vec

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [1.5, -2.5, 0.25]), (3, None)],
        "id long, v array<double>",
    )
    norm = l2_norm_expr(F.col("v"))
    out = df.select(
        "id",
        unit_vec(F.col("v")).alias("u"),
        F.transform("v", lambda x: x.cast("double") / norm).alias("e"),
    ).collect()
    for r in out:
        if r["u"] is None:
            assert r["e"] is None
            continue
        assert list(r["u"]) == list(r["e"])
        # unit vectors have norm 1 on non-degenerate input
        assert sum(x * x for x in r["u"]) == pytest.approx(1.0, abs=1e-12)


def test_projections_match_per_plane_dot(spark):
    from ex_hivent_spark.llm.similarity import dot_expr, projections

    planes = ((1.0, 0.0, 2.0), (0.5, -0.5, 0.25))
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [-1.0, 0.5, 4.0]), (3, None)],
        "id long, v array<double>",
    )
    cols = [F.element_at(projections(F.col("v"), planes), k + 1) for k in range(2)]
    refs = [dot_expr(F.col("v"), F.lit(list(p))) for p in planes]
    out = df.select(
        "id", *[c.alias(f"p{k}") for k, c in enumerate(cols)],
        *[r.alias(f"r{k}") for k, r in enumerate(refs)],
    ).collect()
    for row in out:
        for k in range(2):
            assert row[f"p{k}"] == row[f"r{k}"]


def test_exact_scores_matches_broadcast_join_plan(spark):
    """exact_scores(corpus, queries) must reproduce the r13
    broadcast-join + dot_expr plan's rounded cosines exactly,
    including carry columns and self-pairs."""
    from ex_hivent_spark.functions.decimals import dround
    from ex_hivent_spark.llm.similarity import (
        dot_expr,
        exact_scores,
        np_unit,
        unit_vec,
    )

    rows = [
        (i, [math.sin(i * 7 + j) for j in range(8)], i % 3)
        for i in range(1, 31)
    ]
    em = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q_rows = em.filter(F.col("vec_id") % 5 == 0).collect()
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["label"])
        for r in exact_scores(
            em,
            "vec_id",
            "embedding",
            [(r["vec_id"], np_unit(r["embedding"])) for r in q_rows],
            normalize=True,
            carry=(("label", "int"),),
        )
        .select(
            "query_id",
            "neighbor_id",
            dround(F.col("dot"), 6).alias("cosine"),
            "label",
        )
        .collect()
    }
    unit = em.select(
        "vec_id", "label", unit_vec(F.col("embedding")).alias("u")
    )
    q = unit.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    ref = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["label"])
        for r in unit.join(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            "label",
            dround(dot_expr(F.col("qu"), F.col("u")), 6).alias("cosine"),
        )
        .collect()
    }
    assert got == ref
    # self-pairs present (the helper does NOT exclude them)
    assert (5, 5) in got and got[(5, 5)][0] == 1.0


def test_exact_scores_row_count_shape(spark):
    """|output| = |queries| x |corpus| — the scorer never drops or
    duplicates a pair."""
    from ex_hivent_spark.llm.similarity import exact_scores

    em = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    queries = [(99, [1.0, 0.0]), (98, [0.0, 1.0]), (97, [1.0, 1.0])]
    out = exact_scores(em, "vec_id", "embedding", queries)
    assert out.count() == 3 * 40
    per_q = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_q == {99: 40, 98: 40, 97: 40}


def test_element_level_none_yields_null_like_the_fold(spark):
    """r15 ADVICE fix: an element-level None inside an array must
    follow the fold semantics — the poisoned fold makes dot NULL, and
    unit_vec/projections emit full-length arrays of nulls (the shared
    norm/fold is NULL, so every output element divides/folds to NULL)
    — never numpy's silent None→NaN coercion."""
    from ex_hivent_spark.llm.similarity import (
        dot,
        dot_expr,
        projections,
        unit_vec,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, None, 3.0], [1.0, 1.0, 1.0]),
            (2, [1.0, 2.0, 3.0], [1.0, None, 1.0]),
            (3, [1.0, 2.0, 3.0], [1.0, 1.0, 1.0]),
        ],
        "id long, a array<double>, b array<double>",
    )
    got = {
        r["id"]: (r["d"], r["e"], r["u"], r["p"])
        for r in df.select(
            "id",
            dot(F.col("a"), F.col("b")).alias("d"),
            dot_expr(F.col("a"), F.col("b")).alias("e"),
            unit_vec(F.col("a")).alias("u"),
            projections(F.col("a"), ((1.0, 0.0, 0.0), (0.0, 0.0, 1.0))).alias(
                "p"
            ),
        ).collect()
    }
    for i in (1, 2):
        d, e, u, p = got[i]
        assert d is None and e is None  # dot mirrors the fold exactly
    # row 1 has the None in `a`: unit/projections poison to null arrays
    _, _, u1, p1 = got[1]
    assert u1 == [None, None, None]
    assert p1 == [None, None]
    # row 2's `a` is clean: unit/projections stay real
    _, _, u2, p2 = got[2]
    assert all(v is not None for v in u2) and all(v is not None for v in p2)
    d3, e3, _, _ = got[3]
    assert d3 == e3 == 6.0


def test_exact_scores_empty_queries_and_dirty_corpus(spark):
    """r15 ADVICE fix: an empty query set returns an empty frame of
    the declared schema (no np.stack crash), and null / wrong-length
    corpus vectors are skipped instead of blowing up the Arrow batch
    conversion."""
    from ex_hivent_spark.llm.similarity import exact_scores

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, None),          # null vector: skipped
            (3, [1.0]),         # ragged: skipped
            (4, [0.0, 2.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    empty = exact_scores(corpus, "vec_id", "embedding", [])
    assert empty.columns == ["query_id", "neighbor_id", "dot"]
    assert empty.count() == 0

    got = {
        (r["query_id"], r["neighbor_id"]): r["dot"]
        for r in exact_scores(
            corpus, "vec_id", "embedding", [(9, [1.0, 1.0])]
        ).collect()
    }
    assert got == {(9, 1): 1.0, (9, 4): 2.0}


def test_exact_scores_fast_path_nan_class_skipped(spark):
    """r16 ADVICE fix: a RIGHT-LENGTH corpus row with an element-level
    None passes the length keep-filter, and at the mapInPandas
    boundary Arrow materializes list nulls as NaN — so the whole
    NaN-bearing class (element None and genuine NaN alike, which are
    indistinguishable here) is skipped, matching the join+dot form's
    NULL-dot skip contract instead of emitting a NaN that sorts first
    in the callers' cosine-desc top-k windows."""
    from ex_hivent_spark.llm.similarity import exact_scores

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, None]),            # element None: skipped
            (3, [float("nan"), 1.0]),    # NaN: same class, skipped
            (4, [0.0, 2.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["query_id"], r["neighbor_id"]): r["dot"]
        for r in exact_scores(
            corpus, "vec_id", "embedding", [(9, [1.0, 1.0])]
        ).collect()
    }
    assert got == {(9, 1): 1.0, (9, 4): 2.0}


def test_exact_scores_fast_path_all_rows_element_none(spark):
    """Degenerate batch: every right-length row carries an element
    None — the whole batch is skipped, yielding an empty result."""
    from ex_hivent_spark.llm.similarity import exact_scores

    corpus = spark.createDataFrame(
        [(1, [1.0, None]), (2, [None, 2.0])],
        "vec_id long, embedding array<double>",
    )
    out = exact_scores(corpus, "vec_id", "embedding", [(9, [1.0, 1.0])])
    assert out.count() == 0
