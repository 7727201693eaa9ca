"""CBO-lite advisor: analyze_table manifests drive partition sizing,
broadcast choice, and join cardinality estimates."""

from __future__ import annotations

from ex_hivent_spark import planner
from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.maintenance import analyze_table


def _stats_for(spark, sf_dir, table, tmp_path):
    out = str(tmp_path / table)
    load_table(spark, sf_dir, table).write.mode("overwrite").parquet(out)
    return analyze_table(spark, out)


def test_broadcast_and_partition_sizing(spark, sf_dir, tmp_path):
    nation = _stats_for(spark, sf_dir, "nation", tmp_path)
    orders = _stats_for(spark, sf_dir, "orders", tmp_path)
    assert nation["total_bytes"] > 0
    assert planner.is_broadcastable(nation)
    # a deliberately tiny threshold forces the non-broadcast path
    assert not planner.is_broadcastable(orders, threshold_mb=0)
    # partition count scales with bytes and respects the floor
    assert planner.suggest_shuffle_partitions(nation) == 1
    assert planner.suggest_shuffle_partitions(
        orders, target_partition_mb=1
    ) >= planner.suggest_shuffle_partitions(orders)


def test_join_estimate_and_strategy(spark, sf_dir, tmp_path):
    orders = _stats_for(spark, sf_dir, "orders", tmp_path)
    customer = _stats_for(spark, sf_dir, "customer", tmp_path)
    est = planner.estimate_join_rows(
        orders, customer, "o_custkey", "c_custkey"
    )
    # orders->customer is a FK join: output ~ |orders| (each order has
    # exactly one customer); HLL error bounds the estimate to +-20%
    assert abs(est - orders["n_rows"]) <= 0.2 * orders["n_rows"]
    advice = planner.suggest_join_strategy(
        orders, customer, "o_custkey", "c_custkey"
    )
    assert advice["broadcast_side"] == "b"  # customer is the small side
    assert advice["skew_risk"] is False
    assert advice["shuffle_partitions"] >= 1


def test_skew_flag_on_low_ndv_key(spark, sf_dir, tmp_path):
    # a one-value key column over many rows must trip the skew flag
    df = spark.range(50_000).selectExpr("1 AS k", "id AS v")
    out = str(tmp_path / "skewed")
    df.write.mode("overwrite").parquet(out)
    s = analyze_table(spark, out)
    advice = planner.suggest_join_strategy(s, s, "k", "k")
    assert advice["skew_risk"] is True


def test_stats_broadcast_flips_physical_plan(spark, sf_dir, tmp_path):
    """stats_broadcast wired into the star-join builders: without an
    ANALYZE manifest the dims broadcast (static default); with a
    manifest whose byte count exceeds the threshold the SAME query
    plans a shuffle join for that dim. The flip proves the builders
    actually consult the stats, not just the advisory module."""
    import json
    import shutil

    from ex_hivent_spark.plans.registry import all_specs

    # private sf_dir: copy the five star tables so we can plant stats
    my_sf = str(tmp_path / "sf")
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        src = f"{sf_dir}/{t}.parquet"
        dst = f"{my_sf}/{t}.parquet"
        spark.read.parquet(src).write.mode("overwrite").parquet(dst)

    spec = all_specs()["q_join_star_multiway"]

    def plan():
        df = spec.spark(spark, my_sf)
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )

    p_no_stats = plan()
    assert "BroadcastHashJoin" in p_no_stats  # static default: dims fly

    # plant a manifest claiming nation outgrew the broadcast regime
    from ex_hivent_spark import fsutil

    fake = analyze_table(spark, f"{my_sf}/nation.parquet")
    fake["total_bytes"] = 10 * 1024**3  # 10 GiB "dimension"
    fsutil.write_text_file(
        spark,
        f"{my_sf}/nation.parquet/_STATS.json",
        json.dumps(fake, default=str),
    )

    p_stats = plan()
    assert "ShuffledHashJoin" in p_stats  # nation join no longer broadcast
    shutil.rmtree(my_sf, ignore_errors=True)


def _dim(name, n_rows, ndv, bytes_, filtered=None):
    d = {
        "name": name,
        "key": "k",
        "stats": {
            "n_rows": n_rows,
            "total_bytes": bytes_,
            "columns": {"k": {"approx_ndv": ndv}},
        },
    }
    if filtered is not None:
        d["filtered_rows"] = filtered
    return d


def test_order_dimensions_most_selective_first():
    from ex_hivent_spark.planner import order_dimensions, plan_star_join

    date_dim = _dim("date", 2555, 2555, 50_000, filtered=30)  # ~1.2%
    cust_dim = _dim("customer", 1_000_000, 1_000_000, 400 << 20)
    part_dim = _dim("part", 200_000, 200_000, 80 << 20, filtered=100_000)
    order = [d["name"] for d in order_dimensions([cust_dim, part_dim, date_dim])]
    assert order == ["date", "part", "customer"]

    fact = {"n_rows": 6_000_000_000, "total_bytes": 600 << 30,
            "columns": {}}
    plan = plan_star_join(fact, [cust_dim, part_dim, date_dim])
    assert plan["order"] == ["date", "part", "customer"]
    # estimates shrink monotonically and compose multiplicatively
    rows = [s["estimated_fact_rows"] for s in plan["steps"]]
    assert rows[0] == int(6_000_000_000 * 30 / 2555)
    assert rows[0] >= rows[1] >= rows[2]
    # broadcast decisions come from the manifests
    bcast = {s["dim"]: s["broadcast"] for s in plan["steps"]}
    assert bcast == {"date": True, "part": False, "customer": False}


def test_order_dimensions_flips_with_filter_stats():
    from ex_hivent_spark.planner import order_dimensions

    a = _dim("a", 1000, 1000, 1 << 20, filtered=900)
    b = _dim("b", 1000, 1000, 1 << 20, filtered=10)
    assert [d["name"] for d in order_dimensions([a, b])] == ["b", "a"]
    # relax b's filter, tighten a's: the order flips
    a["filtered_rows"], b["filtered_rows"] = 10, 900
    assert [d["name"] for d in order_dimensions([a, b])] == ["a", "b"]
