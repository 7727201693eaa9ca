"""Table-diff reconciliation: added/removed/changed/unchanged
classification across two snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.operators.diff import table_diff


def test_table_diff_classifies(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # new snapshot: drop keys %7==0, modify price for %5==0, add new keys
    modified = (
        orders.filter(F.col("o_orderkey") % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
    )
    added = spark.createDataFrame(
        [(10_000_001, "O", 1.0), (10_000_002, "F", 2.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    new = modified.unionByName(added)

    diff = table_diff(orders, new, ["o_orderkey"])
    counts = {r.diff_status: r.n for r in
              diff.groupBy("diff_status").agg(F.count(F.lit(1)).alias("n")).collect()}

    n = orders.count()
    n_removed = orders.filter(F.col("o_orderkey") % 7 == 0).count()
    n_changed = orders.filter(
        (F.col("o_orderkey") % 7 != 0) & (F.col("o_orderkey") % 5 == 0)
    ).count()
    assert counts.get("added", 0) == 2
    assert counts.get("removed", 0) == n_removed
    assert counts.get("changed", 0) == n_changed
    assert counts.get("unchanged", 0) == n - n_removed - n_changed
