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
