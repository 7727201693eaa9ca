"""ANN quality checks: the approximate paths (IVF, LSH) must actually
approximate the brute-force baseline — recall floors, not exact values
(SURVEY.md §2.B LLM ops; approximation quality is the contract).
"""

from __future__ import annotations

import pytest

from ex_hivent_spark.plans.registry import all_specs

SPECS = all_specs()


@pytest.fixture(scope="module")
def brute_force(spark, sf_dir):
    rows = SPECS["q_llm_cosine_topk"].spark(spark, sf_dir).collect()
    return {(r.query_id, r.neighbor_id) for r in rows}


def test_ivf_recall_floor(spark, sf_dir, brute_force):
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in SPECS["q_llm_ivf_topk"].spark(spark, sf_dir).collect()
    }
    recall = len(brute_force & ivf) / len(brute_force)
    # nprobe=4 of 16 cells scans ~25% of candidates; on unclustered
    # synthetic vectors that yields ~0.5 recall — gate well below the
    # observed value so the test checks the mechanism, not the data.
    assert recall >= 0.25, f"IVF recall collapsed: {recall:.3f}"


def test_ivf_results_are_true_cosines(spark, sf_dir, brute_force):
    """Every IVF (query, neighbor, cosine) triple must agree with a
    direct cosine computation — IVF prunes candidates, never distorts
    scores."""
    bf_scores = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in SPECS["q_llm_cosine_topk"].spark(spark, sf_dir).collect()
    }
    for r in SPECS["q_llm_ivf_topk"].spark(spark, sf_dir).collect():
        key = (r.query_id, r.neighbor_id)
        if key in bf_scores:
            assert abs(bf_scores[key] - r.cosine) < 1e-9


def test_lsh_neighbors_exist(spark, sf_dir):
    out = SPECS["q_llm_lsh_topk"].spark(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r.query_id != r.neighbor_id for r in out)


def test_connected_components_transitivity(spark):
    """A~B, B~C, D~E must yield clusters {A,B,C} and {D,E} with min-id
    canonical labels — including nodes never directly compared (A,C)."""
    from ex_hivent_spark.llm.clusters import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4), (7, 8), (8, 9), (9, 10)],
        "doc_a long, doc_b long",
    )
    got = {
        r.node: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 7: 7, 8: 7, 9: 7, 10: 7}


def test_decontaminate_flags_known_overlap(spark, tmp_path):
    """A doc sharing one 4-gram with the benchmark slice is flagged
    with the right gram count; disjoint docs are not."""
    from ex_hivent_spark.plans.registry import all_specs

    docs = spark.createDataFrame(
        [
            # doc_id 0 -> benchmark slice (0 % 97 == 0)
            (0, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
            # shares "quick brown fox jumps" (and the 3 overlapping grams
            # around it) with the benchmark doc
            (1, "a quick brown fox jumps over fences daily", "en", "s", 41),
            # no 4-token overlap
            (2, "completely different text with no shared runs here", "en", "s", 50),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    out = {
        r.doc_id: r.n_contaminated_grams
        for r in all_specs()["q_llm_decontaminate"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert 1 in out and out[1] >= 1
    assert 2 not in out


def test_substring_dedup_alignment_free(spark, tmp_path):
    """The defining property vs fixed-stride sampling: a span copied
    into another document at a DIFFERENT character offset is still
    detected, because windows anchor at word starts (content-derived),
    not at absolute positions."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, shared + " unique tail zero zero zero", "en", "s", 83),
            # same span, shifted by a different-length prefix
            (1, "xx " + shared + " other continuation words", "en", "s", 85),
            (2, "wholly unrelated words with no forty char overlap at all "
                "more filler tokens here", "en", "s", 80),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    from ex_hivent_spark.plans.registry import all_specs

    out = {
        r.doc_id: r
        for r in all_specs()["q_llm_substring_dedup"].spark(spark, sf_dir).collect()
    }
    assert out[0].n_dup_windows >= 1, "shifted copy must be detected"
    assert out[1].n_dup_windows >= 1
    assert out[2].n_dup_windows == 0
    assert 0.0 < out[0].dup_frac <= 1.0
    assert out[2].dup_frac == 0.0


def test_hard_negatives_label_constraint(spark, sf_dir):
    """Every mined negative carries a different label than its probe,
    and is the argmax-similarity such vector (verified per probe
    against a driver-side exhaustive check at the test SF)."""
    import math

    from ex_hivent_spark.plans.registry import all_specs
    from ex_hivent_spark.catalog import load_table

    got = all_specs()["q_llm_hard_negatives"].spark(spark, sf_dir).collect()
    assert got, "no probes at this SF"
    vecs = {
        r.vec_id: (r.label, r.embedding)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def unit(v):
        n = math.sqrt(sum(float(x) * float(x) for x in v))
        return [float(x) / n for x in v]

    for row in got:
        assert row.probe_label != row.neg_label
        pu = unit(vecs[row.probe_id][1])
        best = max(
            (
                (sum(a * b for a, b in zip(pu, unit(v))), -vid)
                for vid, (lab, v) in vecs.items()
                if lab != row.probe_label
            ),
        )
        assert -best[1] == row.neg_id


def test_dsir_weights_prefer_target_like_docs(spark, tmp_path):
    """Docs whose token distribution matches the target domain must get
    higher (positive) DSIR log-weights than docs matching the general
    corpus; every doc gets a weight and the selected flag mirrors the
    sign."""
    rows = []
    # target domain src0: vocabulary A; general corpus src1/src2: vocabulary B
    for i in range(8):
        rows.append((i, "alpha beta gamma delta " * 5, "en", "src0", 120))
    for i in range(8, 24):
        rows.append((i, "omega psi chi phi upsilon " * 5, "en", f"src{1 + i % 2}", 150))
    # one src1 doc written in target vocabulary — should score positive
    rows.append((24, "alpha beta gamma delta " * 5, "en", "src1", 120))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    from ex_hivent_spark.plans.registry import all_specs

    out = {
        r.doc_id: r
        for r in all_specs()["q_llm_dsir_weights"].spark(spark, sf_dir).collect()
    }
    assert len(out) == 25
    assert out[24].dsir_logweight > 0 and out[24].selected
    assert out[8].dsir_logweight < 0 and not out[8].selected
    assert all(out[i].dsir_logweight > 0 for i in range(8))
