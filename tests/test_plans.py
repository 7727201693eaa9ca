"""Physical-plan quality gates: these assert the *plan shape* that makes
the operators scale — predicate pushdown into the parquet scan, column
pruning, broadcast joins for dims, no nested-loop joins in the rewritten
range/as-of joins, and whole-stage codegen coverage. A regression here
is a 100 TB performance bug even when results stay correct.
"""

from __future__ import annotations

import pytest

from ex_hivent_spark.plans.registry import all_specs

SPECS = all_specs()


def plan_of(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = SPECS[name].spark(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_filter_topic")
    assert "PushedFilters" in plan
    assert "event_type" in plan.split("PushedFilters")[1].splitlines()[0]


def test_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_scan_projection")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "event_type" in read_schema
    assert "props" not in read_schema and "value" not in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_join_star_multiway")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_broadcast_join_prunes_dim_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    # the p_size filter must be pushed into the part scan, not applied
    # post-join
    assert "PushedFilters" in plan and "p_size" in plan


def test_semi_anti_joins_stay_hash(spark, sf_dir):
    for q in ("q_join_semi", "q_join_anti"):
        plan = plan_of(spark, sf_dir, q)
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The time-bucket rewrite must produce a hash join on the bucket —
    a BroadcastNestedLoopJoin here means the rewrite regressed to the
    O(n*m) plan."""
    plan = plan_of(spark, sf_dir, "q_join_range_theta")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_single_window_no_join(spark, sf_dir):
    """The as-of implementation is union+window: no join node at all,
    hence no quadratic candidate blow-up."""
    plan = plan_of(spark, sf_dir, "q_join_asof", mode="simple")
    assert "Window" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """Hash aggregation must be two-phase (map-side partial + final) so
    the shuffle carries |groups| rows, not |lineitem| rows."""
    plan = plan_of(spark, sf_dir, "q_agg_pricing_summary", mode="simple")
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_whole_stage_codegen_on_batch_spine(spark, sf_dir):
    # Under AQE the codegen spans only appear in the *final* adaptive
    # plan, so execute first, then explain.
    df = SPECS["q_agg_pricing_summary"].spark(spark, sf_dir)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "== Final Plan ==" in plan
    assert "codegen id" in plan  # whole-stage codegen spans on the spine


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_sort_multi", mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_minhash_no_cross_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_llm_minhash_neardup", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q3_pushdown_and_topk(spark, sf_dir):
    """Date/segment filters must reach the scans; top-10 must be a
    TakeOrdered, not a global sort."""
    plan = plan_of(spark, sf_dir, "q_tpch_q3_shipping_priority")
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan and "o_orderdate" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q5_broadcasts_dims_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_tpch_q5_local_supplier", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pivot_single_aggregate_pass(spark, sf_dir):
    """Explicit pivot values -> one aggregate over events, no extra
    distinct-values job or join."""
    plan = plan_of(spark, sf_dir, "q_pivot_event_matrix", mode="simple")
    assert "Join" not in plan


def test_stats_suite_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_agg_stats_suite", mode="simple")
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_ngram_prefix_join_no_cartesian(spark, sf_dir):
    """Prefix-filtered near-dup must stay an equi-join on the shingle
    bucket — a nested-loop here means the lossless blocking regressed
    to all-pairs."""
    plan = plan_of(spark, sf_dir, "q_llm_ngram_jaccard", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_neardup_banded_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_llm_embedding_neardup", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunker_is_map_only(spark, sf_dir):
    """Doc chunking must be a pure map pipeline: no shuffle exchange at
    all (explode + projections only)."""
    plan = plan_of(spark, sf_dir, "q_llm_doc_chunks", mode="simple")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark gram set must be the broadcast side — the corpus
    side streams map-only until the final per-doc count."""
    plan = plan_of(spark, sf_dir, "q_llm_decontaminate", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_sketch_rollup_two_level_merge(spark, sf_dir):
    """Sketch rollup: daily sketches then a merge agg — two HashAggregate
    pairs, no re-scan of raw rows for the merge level."""
    plan = plan_of(spark, sf_dir, "q_agg_sketch_rollup", mode="simple")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x two levels


def test_time_range_frame_single_window_pass(spark, sf_dir):
    """RANGE frame: one Window node over one sort — no self-join
    formulation."""
    plan = plan_of(spark, sf_dir, "q_win_time_range_frame", mode="simple")
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_cross_dedup_prefix_join_no_cartesian(spark, sf_dir):
    """Cross-corpus near-dup must candidate-join on the prefix-shingle
    hash, never an all-pairs product across the split."""
    plan = plan_of(spark, sf_dir, "q_llm_cross_dedup", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_tolerance_single_window_no_pair_join(spark, sf_dir):
    """Tolerance as-of keeps the union+window shape: one Window, no
    join between the event sides."""
    plan = plan_of(spark, sf_dir, "q_join_asof_tolerance", mode="simple")
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_asof_nearest_single_window_no_join(spark, sf_dir):
    """Nearest-direction as-of runs both frames in ONE Window operator
    over one shuffle — no join between the event sides."""
    plan = plan_of(spark, sf_dir, "q_join_asof_nearest", mode="simple")
    assert plan.count("Window") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_linear_interp_single_window(spark, sf_dir):
    """Linear interpolation brackets prev/next in one Window operator;
    the only join-free exchanges are the grid/obs aggregates."""
    plan = plan_of(spark, sf_dir, "q_ts_linear_interp", mode="simple")
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan


def test_resample_grid_bounded_to_trailing_window(spark, tmp_path):
    """The 6h resample/interp grid is capped to the trailing 90 days of
    each user's last observation: a user with a multi-year sparse span
    must emit a bounded grid (≤ ~360 points + 1), with fills still
    reaching observations BEFORE the bound."""
    import datetime
    import os

    from ex_hivent_spark.plans.registry import all_specs

    base = datetime.datetime(2020, 1, 6)
    late = datetime.datetime(2024, 1, 1)  # ~4 years later
    rows = [
        (1, "click", base, 10.0, 7),
        (2, "click", late, 50.0, 7),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, value double,"
        " user_id long",
    )
    os.makedirs(f"{tmp_path}/sf", exist_ok=True)
    df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")

    for name in ("q_ts_resample_ffill", "q_ts_linear_interp"):
        out = all_specs()[name].spark(spark, str(tmp_path) + "/sf").collect()
        # 90 days / 6 h = 360 grid steps (+1 endpoint, +1 alignment)
        assert 2 <= len(out) <= 362, (name, len(out))
    # forward fill across the bound: the earliest emitted grid point
    # still carries the 2020 observation
    ff = sorted(
        all_specs()["q_ts_resample_ffill"]
        .spark(spark, str(tmp_path) + "/sf")
        .collect(),
        key=lambda r: r["grid_ts"],
    )
    assert ff[0]["last_value"] == 10.0 and ff[0]["last_event_id"] == 1


def test_unigram_logprob_broadcasts_vocab(spark, sf_dir):
    """The |vocab|-row frequency table must broadcast back onto the
    token stream — the corpus side never shuffles for the join."""
    plan = plan_of(spark, sf_dir, "q_llm_unigram_logprob", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q6_predicates_pushed_to_scan(spark, sf_dir):
    """Q6's date/discount/quantity predicates must reach the parquet
    scan as PushedFilters — the whole point of the Q6 shape."""
    plan = plan_of(spark, sf_dir, "q_tpch_q6_forecast_revenue")
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "l_discount" in pushed and "l_quantity" in pushed


def test_q14_broadcasts_part_dim(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_tpch_q14_promo_effect", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q18_preaggregates_before_join(spark, sf_dir):
    """The quantity rollup must occur BELOW both joins in the plan:
    lineitem never joins at line granularity."""
    plan = plan_of(spark, sf_dir, "q_tpch_q18_large_orders", mode="simple")
    agg_pos = plan.rfind("HashAggregate")
    join_pos = plan.rfind("Join")
    assert agg_pos > join_pos, "expected the deepest aggregate below joins"


TPCH_FULL = [
    "q_tpch_q2_min_cost_supplier",
    "q_tpch_q4_priority_exists",
    "q_tpch_q7_nation_volume",
    "q_tpch_q8_market_share",
    "q_tpch_q9_product_profit",
    "q_tpch_q11_important_value",
    "q_tpch_q12_priority_by_flag",
    "q_tpch_q13_order_distribution",
    "q_tpch_q15_top_supplier",
    "q_tpch_q16_supplier_variety",
    "q_tpch_q17_small_qty_revenue",
    "q_tpch_q19_disjunctive",
    "q_tpch_q20_excess_suppliers",
    "q_tpch_q21_sole_supplier",
    "q_tpch_q22_dormant_customers",
]


@pytest.mark.parametrize("name", TPCH_FULL)
def test_tpch_full_no_cartesian_or_nested_loop(spark, sf_dir, name):
    """None of the 15 TPC-H completion shapes may fall back to a
    cartesian product; nested-loop appearances are restricted to
    one-row scalar-subquery broadcasts (Q11/Q15/Q17/Q22 CTE scalars),
    never a fact-fact pairing."""
    plan = plan_of(spark, sf_dir, name, mode="simple")
    assert "CartesianProduct" not in plan


def test_q4_exists_is_semi_join(spark, sf_dir):
    """The EXISTS must plan as a semi join (no row multiplication)."""
    plan = plan_of(spark, sf_dir, "q_tpch_q4_priority_exists", mode="simple")
    assert "LeftSemi" in plan


def test_q22_not_exists_is_anti_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_tpch_q22_dormant_customers", mode="simple")
    assert "LeftAnti" in plan


def test_q19_common_envelope_pushed(spark, sf_dir):
    """Catalyst must extract a pushable envelope from the OR-of-three
    blocks: the part scan gets brand/size filters pushed down."""
    plan = plan_of(spark, sf_dir, "q_tpch_q19_disjunctive")
    assert "PushedFilters" in plan
    assert "p_brand" in plan or "p_size" in plan


def test_q21_single_orderkey_aggregation(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS collapse: exactly one scan-side shape —
    no correlated re-scan means lineitem appears at most twice (stats
    + R-pairs), never three+ times as the correlated form would."""
    plan = plan_of(spark, sf_dir, "q_tpch_q21_sole_supplier", mode="simple")
    assert plan.count("Scan parquet") <= 4  # 2x lineitem + orders + supplier


def test_semdedup_join_keyed_on_cell(spark, sf_dir):
    """SemDeDup's pair join must be an equi-join on cell_id — the
    quadratic-block bound — not an unkeyed pairing of members."""
    plan = plan_of(spark, sf_dir, "q_llm_semdedup", mode="simple")
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the 16-row codebook broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_passage_dedup_shuffles_keys_not_text(spark, sf_dir):
    """The duplicate-passage aggregate must group on passage_md5 (16-byte
    keys); the text column must not survive past the projection."""
    plan = plan_of(spark, sf_dir, "q_llm_passage_dedup")
    assert "passage_md5" in plan
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "text" in read  # scan needs text...
    post = plan.split("HashAggregate")[0]
    assert "Exchange" not in post or "text" not in post.split("Exchange")[-1]


def test_pq_encode_broadcast_codebook(spark, sf_dir):
    """PQ encoding must probe a broadcast codebook (128 rows) and
    aggregate map-side — no shuffle of full vectors, no cartesian."""
    plan = plan_of(spark, sf_dir, "q_llm_pq_encode", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_ivfpq_candidates_never_carry_vectors(spark, sf_dir):
    """The ADC score join must move only (vec_id, m, k_id) on the
    candidate side — the full embedding array may appear in the plan
    only below the code/probe builders, never in the final score
    aggregate's shuffle."""
    plan = plan_of(spark, sf_dir, "q_llm_ivfpq_search", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # LUT + codebook broadcasts


def test_ewma_single_window_pass(spark, sf_dir):
    """EWMA must be one bounded rows-frame window — exactly one Window
    operator, no self-joins."""
    plan = plan_of(spark, sf_dir, "q_ts_ewma", mode="simple")
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_anomaly_single_window_pass(spark, sf_dir):
    """r17: the trailing sums are prefix differences — a running-sum
    window plus a lag window STACKED on the same (user_id, ts,
    event_id) clustering. Two Window operators, but still exactly one
    exchange and one sort (the second pass reuses the first's order),
    and still no self-join."""
    plan = plan_of(spark, sf_dir, "q_ts_anomaly", mode="simple")
    assert plan.count("Window") <= 2
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert plan.count("Sort") == 1


def test_bm25_prunes_explode_before_aggregates(spark, sf_dir):
    """The probe-term IN filter must appear in the plan (pruning the
    token explode) and the stats/idf sides must broadcast."""
    plan = plan_of(spark, sf_dir, "q_llm_bm25_topk", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_substring_dedup_shuffles_hashes_not_text(spark, sf_dir):
    """The window text must be consumed map-side (hashed to md5_int48
    before any Exchange): no Exchange carries a 'win' column, and no
    all-pairs stage exists."""
    plan = plan_of(spark, sf_dir, "q_llm_substring_dedup")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    for chunk in plan.split("Exchange")[1:]:
        first_line = chunk.splitlines()[0]
        assert "win" not in first_line


def test_hard_negatives_broadcasts_probes(spark, sf_dir):
    """The probe side must broadcast (corpus never shuffles for the
    score stage): a BroadcastNestedLoopJoin on the label-inequality
    condition is the intended shape — the build side is O(probes·dim)."""
    plan = plan_of(spark, sf_dir, "q_llm_hard_negatives")
    assert "Broadcast" in plan
    # corpus-side embedding column must not cross a shuffle Exchange
    for chunk in plan.split("ShuffleExchange")[1:]:
        assert "embedding" not in chunk.splitlines()[0]


def test_dsir_histograms_broadcast_back(spark, sf_dir):
    """Both histogram join-backs must broadcast the 256-row stats side;
    the token stream itself never shuffles before the per-doc agg."""
    plan = plan_of(spark, sf_dir, "q_llm_dsir_weights")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_gopher_rules_is_map_only(spark, sf_dir):
    """The rule battery must be one scan + project: any Exchange means
    an accidental shuffle in a per-row filter."""
    plan = plan_of(spark, sf_dir, "q_llm_gopher_rules")
    assert "Exchange" not in plan
    assert "codegen id" in plan


def test_bigram_logprob_broadcasts_vocab_tables(spark, sf_dir):
    """Context and unigram count tables are vocab-sized → must
    broadcast; only the bigram-count aggregate may shuffle. No
    accidental cartesian — the ONE allowed nested-loop is the
    deliberate one-row broadcast of the corpus token total (the
    r16 change that replaced a plan-build collect; the standard
    tiny-pre-pass crossJoin(broadcast(one_row_agg)) pattern)."""
    import re

    plan = plan_of(spark, sf_dir, "q_llm_bigram_logprob")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    # the formatted plan mentions each node in the tree AND in the
    # detail section — count distinct node ids, not text occurrences
    nodes = set(re.findall(r"BroadcastNestedLoopJoin[^(\n]*\((\d+)\)", plan))
    assert len(nodes) <= 1
    # every nested-loop mention must be that broadcast node (no plain
    # CartesianProduct / non-broadcast nested loop anywhere)
    assert plan.count("NestedLoop") == plan.count("BroadcastNestedLoopJoin")
    if nodes:
        assert "BroadcastNestedLoopJoin Cross BuildRight" in plan


def test_ccnet_buckets_single_token_shuffle(spark, sf_dir):
    """The vocab frequency table must come back as a broadcast, not a
    shuffled sort-merge join against the token stream."""
    plan = plan_of(spark, sf_dir, "q_llm_ccnet_buckets")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_emb_dim_stats_partial_aggregation(spark, sf_dir):
    """The (label, dim) aggregate must partially combine map-side
    (HashAggregate appears below AND above the exchange) so the shuffle
    carries accumulators, not exploded lanes."""
    plan = plan_of(spark, sf_dir, "q_emb_dim_stats")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_softdedup_novelty_shuffle_hashes_not_text(spark, sf_dir):
    """Both curation aggregates shuffle (doc_id, gram-hash) pairs; the
    document text must be pruned out before any Exchange, and the df /
    first-occurrence join-back is an equi-join, never a product."""
    for q in ("q_llm_softdedup_weights", "q_llm_ngram_novelty"):
        plan = plan_of(spark, sf_dir, q)
        post_exchange = plan.split("Exchange", 1)[1]
        assert "text" not in post_exchange.split("ReadSchema")[0]
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan


def test_tokenizer_fertility_single_aggregate(spark, sf_dir):
    """Fertility is a per-doc HOF fold + ONE per-lang hash aggregate
    with map-side combine — no explode of words, exactly one shuffle."""
    plan = plan_of(spark, sf_dir, "q_llm_tokenizer_fertility", mode="simple")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Generate" not in plan  # no word explode


def test_containment_candidates_equi_join(spark, sf_dir):
    """Containment candidate generation must be an equi-join on the
    gram hash (the prefix filter is the blocking key) — a nested-loop
    or cartesian means the asymmetric-size condition swallowed the
    equi-predicate."""
    plan = plan_of(spark, sf_dir, "q_llm_containment_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_seasonal_decompose_broadcasts_profile(spark, sf_dir):
    """The (type, hour) diurnal profile is dozens of rows — it must
    come back onto the fact scan as a broadcast; the events table
    itself never shuffles."""
    plan = plan_of(spark, sf_dir, "q_ts_seasonal_decompose")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mad_outliers_broadcasts_percentile_tables(spark, sf_dir):
    """Both per-type percentile results (|types| rows) must come back
    as broadcasts; the fact table is scanned, never row-shuffled."""
    plan = plan_of(spark, sf_dir, "q_agg_mad_outliers", mode="simple")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_cusum_single_user_shuffle(spark, sf_dir):
    """All three window passes and the final aggregate share ONE
    shuffle on user_id — extra Exchanges mean the window frames stopped
    sharing their partitioning."""
    plan = plan_of(spark, sf_dir, "q_ts_cusum_changepoint", mode="simple")
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_minhash_error_no_cross_join(spark, sf_dir):
    """The audit must keep the banded equi-join candidate shape — five
    equi-joins total, zero products."""
    plan = plan_of(spark, sf_dir, "q_llm_minhash_error", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_funnel_one_job_shape(spark, sf_dir):
    """The 4-stage funnel must stay one composed plan: bench grams come
    back as a broadcast, the two windows are the only wide stages, and
    nothing degenerates to a product."""
    plan = plan_of(spark, sf_dir, "q_llm_corpus_audit", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") == 2  # dedup window + cap window
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pca_power_step_partial_aggregation(spark, sf_dir):
    """The dim-keyed aggregate must partially combine map-side so the
    shuffle carries 64 accumulators, not |corpus|x64 exploded lanes;
    no join anywhere."""
    plan = plan_of(spark, sf_dir, "q_emb_pca_power_step", mode="simple")
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan
    assert "Join" not in plan


def test_geo_radius_cell_equi_join(spark, sf_dir):
    """The radius join must equi-join on the neighbor cell key — a
    nested-loop or product means the spatial blocking collapsed into
    the quadratic plan."""
    plan = plan_of(spark, sf_dir, "q_geo_radius_join", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_attribution_single_window_pass(spark, sf_dir):
    """Position and per-user total are two Window nodes sharing ONE
    sort + user_id exchange; the last-purchase table is tiny and must
    broadcast back."""
    plan = plan_of(spark, sf_dir, "q_win_attribution_multitouch",
                   mode="simple")
    assert plan.count("Window") == 2
    assert plan.count("Sort") == 1  # the full-frame count needs no sort
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_weighted_median_single_shuffle(spark, sf_dir):
    """Cumulative-weight and total-weight windows must share one
    event_type shuffle; the final aggregate reuses the partitioning."""
    plan = plan_of(spark, sf_dir, "q_agg_weighted_median", mode="simple")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_user_entropy_windows_over_aggregate(spark, sf_dir):
    """Windows run over the (user, type) AGGREGATED frame — the window
    input is the hash-agg output, never raw events (HashAggregate must
    appear below Window in the tree)."""
    plan = plan_of(spark, sf_dir, "q_agg_user_entropy", mode="simple")
    assert "Window" in plan
    agg_pos = plan.rindex("HashAggregate")
    assert agg_pos > plan.index("Window")  # deepest agg feeds the window
    assert "Join" not in plan


def test_bpe_train_scalar_joins_stay_hash(spark, sf_dir):
    """Each round's one-row merge result joins back on a literal key —
    must plan as BroadcastHashJoin, never a nested-loop scalar
    product, across all five rounds."""
    plan = plan_of(spark, sf_dir, "q_llm_bpe_train", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_ngrams_single_aggregate_then_window(spark, sf_dir):
    """Trigrams are built in-row (transform over an index sequence) —
    ONE explode feeds ONE two-phase hash aggregate, and the rank window
    runs over the aggregated counts frame. An n-gram-by-self-join plan
    would show extra joins here."""
    plan = plan_of(spark, sf_dir, "q_llm_topk_ngrams", mode="simple")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2 and "partial_" in plan
    assert "Window" in plan


def test_zipf_fit_moments_over_vocab_frame(spark, sf_dir):
    """The OLS moments aggregate the top-100-per-lang frame — after the
    vocabulary hash aggregate, never the corpus. No join anywhere."""
    plan = plan_of(spark, sf_dir, "q_llm_zipf_fit", mode="simple")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 4  # vocab agg + moments, 2-phase


def test_idf_rarity_broadcasts_vocab(spark, sf_dir):
    """The document-frequency table joins back broadcast — the corpus
    side never shuffles for the join."""
    plan = plan_of(spark, sf_dir, "q_llm_idf_rarity")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_heavy_hitters_partial_aggregation(spark, sf_dir):
    """Frequency counting must partial-aggregate map-side; the top-20
    window sees only the |keys|-row counts frame."""
    plan = plan_of(spark, sf_dir, "q_agg_heavy_hitters", mode="simple")
    assert plan.count("HashAggregate") >= 2 and "partial_" in plan
    assert "Join" not in plan


def test_streaks_one_window_exchange(spark, sf_dir):
    """Both row_numbers share the per-user sort: exactly one shuffle
    for the window pass (hashpartitioning on user_id), then the island
    hash aggregate."""
    plan = plan_of(spark, sf_dir, "q_win_streaks", mode="formatted")
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan


def test_acf_windows_over_hourly_aggregate(spark, sf_dir):
    """The three lags share one window pass over the hourly counts
    frame; the per-type means join back broadcast — the corpus-sized
    exchange is the single counts aggregate."""
    plan = plan_of(spark, sf_dir, "q_ts_acf", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan


def test_audience_overlap_sizes_broadcast(spark, sf_dir):
    """The |types|-row audience-size table joins back broadcast; the
    incidence self-join is an equi hash join on user, never a
    cartesian expansion."""
    plan = plan_of(spark, sf_dir, "q_agg_audience_overlap", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_langid_confusion_window_over_cells(spark, sf_dir):
    """The confusion matrix aggregates in-row predictions to |langs|^2
    cells before the recall window — no join anywhere."""
    plan = plan_of(spark, sf_dir, "q_llm_langid_confusion", mode="simple")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2 and "partial_" in plan
    assert "Window" in plan


def test_xcorr_aggregates_before_analysis(spark, sf_dir):
    """Both series collapse to hourly counts first; the series join and
    window run on the aggregated frames, never the event scan."""
    plan = plan_of(spark, sf_dir, "q_ts_xcorr", mode="simple")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2 and "partial_" in plan
    assert "Window" in plan


def test_ctfidf_broadcasts_label_map_and_vocab(spark, sf_dir):
    """The doc-to-label map and the corpus term-frequency table both
    join broadcast; no sort-merge join of corpus-sized sides."""
    plan = plan_of(spark, sf_dir, "q_llm_ctfidf_topics")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Global gate: no single-partition Window over unbounded input
# ---------------------------------------------------------------------------

# Non-partitioned windows whose input frame is provably BOUNDED (by a
# prior limit or an aggregation whose cardinality doesn't grow with
# data volume). Anything else funnels the whole input through one task.
_BOUNDED_GLOBAL_WINDOWS = {
    # r17: grand-total share over the ≤10-row cosine-bin histogram
    # (bounded by the literal _PAIR_BINS, never data-volume sized) —
    # replaced a broadcast join-back that recomputed the probe dot pass
    "q_emb_pair_cosine_hist": 1,
    # rank assignment over the 20-row post-TakeOrdered frame
    "q_agg_heavy_hitters": 1,
    # r13: same pattern — rank over the 20-row post-TakeOrdered
    # bounded-top-k candidate frame
    "q_agg_spacesaving_topk": 1,
    # dense k_id over the PQ_K(=16)-row codebook (built via limit)
    "q_llm_pq_encode": 1,
    # same codebook window, appearing in both the encode and query arms
    "q_llm_ivfpq_search": 2,
    # same 16-row codebook k_id window in the distortion audit (r7)
    "q_emb_pq_distortion": 1,
    # lead over the joined HOURLY series: |hours| rows — grows with the
    # time span, not with data volume (pre-aggregated time grain)
    "q_ts_xcorr": 1,
    # norm pass over the 64-row per-dimension aggregate (bounded by
    # embedding dimensionality, not corpus size)
    "q_emb_pca_power_step": 1,
    # cumulative-count rank windows over the per-VALUE group frames of
    # the two HOURLY series (≤|hours| rows each — time-grain bounded,
    # like q_ts_xcorr, not data-volume sized)
    "q_ts_spearman_corr": 2,
    # one lag pass over the densified 720-hour month spine (single
    # 719-row series — time-grain bounded, the q_ts_xcorr class)
    "q_ts_granger_lite": 1,
    # r9 tsdiag battery: all four operate on the SAME densified
    # 720-row month spine (tsdiag.py:_total_spine/_purchase_spine —
    # spark.range(720) left-joined with an hourly pre-agg), so every
    # non-partitioned window here is the q_ts_granger_lite class:
    # |hours| rows, time-grain bounded, never data-volume sized.
    # lag(y) for the Dickey-Fuller regression frame
    "q_ts_adf_lite": 1,
    # lag(y) for the AR(1) slope fit
    "q_ts_ar1_half_life": 1,
    # sign(lag) run-boundary pass + two rank passes for the median split
    "q_ts_runs_test": 3,
    # lag/lead pair for local-extremum detection
    "q_ts_turning_points": 1,
    # r10 tsfeat: partial-sum cumsum over the same bounded 720-row
    # month spine (tsfeat.py q_ts_kpss_lite — the KPSS S_t series)
    "q_ts_kpss_lite": 1,
    # r11: window-moment pass (S, Q per 24-hour subsequence) over the
    # same bounded 720-row month spine; all other matrix-profile
    # windows are partitioned (by lag, by window start)
    "q_ts_matrix_profile": 1,
    # r11: the SPRT log-likelihood walk cumsum over the ≤|hours| hourly
    # pre-agg (time-grain bounded, the q_ts_kpss_lite class)
    "q_ab_sprt_boundary": 1,
    # r11 risk battery: lag over the pooled all-flag DAILY revenue
    # series (|days| rows — time-grain bounded, the q_ts_granger_lite
    # class; the per-flag return lag next to it is partitioned)
    "q_agg_beta_capm": 1,
    # r11 resampling: rank + count over the B=200 bootstrap-replicate
    # frame (bounded by the literal replicate count, the
    # q_agg_heavy_hitters class — never data-volume sized)
    "q_ab_bootstrap_ci": 2,
    # r11: lag over the densified 720-row month spine (the
    # q_ts_kpss_lite class — time-grain bounded)
    "q_ts_ar1_backtest": 1,
    # r11: rank over the TakeOrdered ≤1000-row vocabulary head (the
    # q_agg_heavy_hitters post-limit class)
    "q_llm_vocab_coverage": 1,
    # r14: lower-median rank over the |days| day-partition manifest
    # (time-grain bounded — the q_ts_granger_lite class)
    "q_maint_partition_skew": 1,
    # r11: two chained lags (first + second difference) over the
    # densified 720-row month spine (the q_ts_kpss_lite class)
    "q_ts_diff_stationarity": 2,
    # r11: lag(y) over the densified 720-row month spine for the
    # closed-form DW moments (the q_ts_adf_lite class)
    "q_ts_durbin_watson": 1,
    # r11: the j-index row_number over the ≤|event-types|-row rank-sum
    # aggregate (group-cardinality bounded, the q_agg_heavy_hitters
    # post-aggregate class)
    "q_stats_page_trend": 1,
    # r11: the pooled midrank over the ≤2·|hours| two-type hourly
    # aggregate (time-grain bounded, the q_ts_xcorr class; the
    # tie-count window next to it is value-partitioned)
    "q_stats_ansari_bradley": 1,
    # r11: midrank + successor-lead over the densified 720-row month
    # spine (the q_ts_adf_lite class; the tie-count window is
    # value-partitioned)
    "q_ts_bartels_rank": 2,
    # r11: diff lag + run-boundary lag over the same bounded spine
    "q_ts_runs_updown": 2,
    # r11: the six shared rolling moments over the densified 720-row
    # month spine (one fused Window node, the q_ts_adf_lite class)
    "q_ts_rolling_corr": 1,
    # r11: the pooled midrank over the ≤2·|hours| two-type hourly
    # aggregate (the q_stats_ansari_bradley class; the own-group and
    # tie-count windows are partitioned)
    "q_stats_fligner_policello": 1,
    # r12: the two lead passes (offsets 1 and 2 — distinct frames, so
    # Catalyst keeps two Window nodes) over the densified 720-row
    # month spine (the q_ts_adf_lite class — time-grain bounded,
    # never data-volume sized)
    "q_ts_permutation_entropy": 2,
    # r12: prefix-cumsum + grand-total + the rank-1 argmax pick, all
    # over the same densified 720-row month spine / its ≤673-row
    # candidate-split frame (the q_ts_kpss_lite class)
    "q_ts_binary_segmentation": 3,
}


def _global_window_nodes(plan: str) -> list[str]:
    """Window operators with an EMPTY partition spec. In the simple
    explain a Window line is `Window [exprs], [part], [order]`, and the
    windowspecdefinition's leading args are the partition columns —
    order expressions carry ASC/DESC. So a spec whose FIRST argument is
    an order expression (or directly the frame) has no partitioning."""
    hits = []
    for raw in plan.splitlines():
        line = raw.strip().lstrip("+-:* ").strip()
        if not line.startswith("Window "):
            continue
        marker = "windowspecdefinition("
        i = line.find(marker)
        if i < 0:
            continue
        args = line[i + len(marker):]
        depth, first = 0, ""
        for ch in args:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                break
            first += ch
        if (
            " ASC" in first
            or " DESC" in first
            or first.startswith("specifiedwindowframe")
        ):
            hits.append(line[:120])
    return hits


def test_no_unbounded_single_partition_windows(spark, sf_dir):
    """Every registered query's physical plan: a Window with no
    partition key is only allowed over an input bounded by construction
    (explicit allowlist above, with the bounding argument). This is the
    gate that keeps global-sort rank/lead paths from regressing back in
    — they are 100 TB single-task funnels even when results are right."""
    offenders = {}
    for name in SPECS:
        plan = plan_of(spark, sf_dir, name, mode="simple")
        nodes = _global_window_nodes(plan)
        allowed = _BOUNDED_GLOBAL_WINDOWS.get(name, 0)
        if len(nodes) > allowed:
            offenders[name] = nodes
    assert not offenders, (
        "non-partitioned Window over unbounded input in: "
        + ", ".join(f"{k} ({len(v)})" for k, v in sorted(offenders.items()))
    )


def test_sliding_distinct_bounded_state_no_id_sets(spark, sf_dir):
    """The exact sliding distinct count must run as interval deltas +
    running sum — NO collect_set of user ids in any window state, and
    no single-partition window (the running sum goes through the
    partition-offset prefix machinery)."""
    plan = plan_of(spark, sf_dir, "q_win_sliding_distinct", mode="simple")
    assert "collect_set" not in plan
    assert not _global_window_nodes(plan)
    assert "Window" in plan  # the per-(type,user) lag + pid prefix sums


def test_bloom_prefilter_probes_are_broadcast(spark, sf_dir):
    """The Bloom probe must be k broadcast-hash joins against the
    bitmap words (map-side, no shuffle added for the prefilter) before
    the real join; the bitmap build aggregates, never collects rows."""
    plan = plan_of(spark, sf_dir, "q_join_bloom_prefilter", mode="simple")
    assert plan.count("BroadcastHashJoin") >= 2  # one per hash seed
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_trend_ops_bound_pair_frame_to_trailing_window(spark, tmp_path):
    """Theil-Sen / Mann-Kendall are quadratic in the hourly series, so
    they must bound it to the trailing _TRAIL_HOURS per type: feed a
    series longer than the bound and check only the trailing window
    contributes (n_hours == _TRAIL_HOURS; pair count matches n*(n-1)/2
    for the bounded n, not the full series)."""
    import os

    from ex_hivent_spark.operators.drift import _TRAIL_HOURS
    from ex_hivent_spark.plans.registry import all_specs

    import datetime

    base = datetime.datetime(2023, 1, 1)
    n_hours_total = _TRAIL_HOURS + 500
    rows = [
        (i, "click", base + datetime.timedelta(hours=i), 1.0, i % 7)
        for i in range(n_hours_total)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, value double,"
        " user_id long",
    )
    os.makedirs(f"{tmp_path}/sf", exist_ok=True)
    df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")

    mk = all_specs()["q_ts_mann_kendall"].spark(
        spark, str(tmp_path) + "/sf"
    ).collect()
    assert len(mk) == 1 and mk[0]["n_hours"] == _TRAIL_HOURS

    ts = all_specs()["q_ts_theil_sen"].spark(
        spark, str(tmp_path) + "/sf"
    ).collect()
    assert len(ts) == 1
    assert ts[0]["n_pairs"] == _TRAIL_HOURS * (_TRAIL_HOURS - 1) // 2


def test_bloom_sizing_flips_on_analyzed_table(spark, tmp_path):
    """Bloom m/k derive from the ANALYZE manifest when present (the
    stats_broadcast wiring): no manifest -> static defaults; manifest
    with a large key ndv -> larger m and more hash functions; and the
    prefilter under derived params still returns exactly the plain
    semi-join rows (no false negatives)."""
    from pyspark.sql import functions as F

    from ex_hivent_spark.maintenance import analyze_table
    from ex_hivent_spark.operators.bloom import (
        BLOOM_M,
        BLOOM_SEEDS,
        bloom_params,
        bloom_prefilter,
        stats_bloom_params,
    )

    tbl = str(tmp_path / "keys.parquet")
    keys = spark.range(0, 50_000).select(
        (F.col("id") * 7919 % 1_000_003).alias("k")
    )
    keys.write.mode("overwrite").parquet(tbl)

    # no manifest: static defaults (the driver-harness path)
    assert stats_bloom_params(spark, tbl, "k") == (BLOOM_M, BLOOM_SEEDS)

    analyze_table(spark, tbl)
    m, seeds = stats_bloom_params(spark, tbl, "k")
    assert m > BLOOM_M  # ~50k ndv needs ~479k bits at 1% fpp
    assert len(seeds) > len(BLOOM_SEEDS)  # k ~ 7 at the optimum
    # the closed form it should match (within ndv sketch error)
    m_exact, seeds_exact = bloom_params(50_000)
    assert abs(m - m_exact) / m_exact < 0.2
    assert abs(len(seeds) - len(seeds_exact)) <= 1

    # correctness under derived sizing: pruned join == plain semi-join
    fact = spark.range(0, 20_000).select((F.col("id") * 31).alias("fk"))
    build = spark.read.parquet(tbl).filter(F.col("k") % 97 == 0)
    pruned = bloom_prefilter(fact, build, "fk", "k", m=m, seeds=seeds)
    got = sorted(
        r["fk"]
        for r in pruned.join(
            build, F.col("fk") == F.col("k"), "left_semi"
        ).collect()
    )
    want = sorted(
        r["fk"]
        for r in fact.join(
            build, F.col("fk") == F.col("k"), "left_semi"
        ).collect()
    )
    assert got == want


def test_interval_merge_windows_share_one_exchange(spark, sf_dir):
    """Gaps-and-islands: the break-marking high-water window and the
    island-numbering running sum must share ONE customer exchange and
    one (s, orderkey) sort — a second exchange would double the
    dominant shuffle at scale."""
    plan = plan_of(spark, sf_dir, "q_set_interval_merge", mode="simple")
    assert plan.count("Window") == 2
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan


def test_peak_detection_broadcasts_thresholds(spark, sf_dir):
    """The per-type threshold frame must broadcast back onto the
    hourly series — the series side never re-shuffles for the join."""
    plan = plan_of(spark, sf_dir, "q_ts_peak_detection", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") == 1
