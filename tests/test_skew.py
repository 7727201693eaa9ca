"""Salted-join correctness: the salt spread must never change join
results, only shuffle distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.operators.skew import salted_join


def _canon(df):
    return sorted(map(repr, df.collect()))


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", fact_unique_col="l_linenumber")
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _canon(plain.select(*sorted(plain.columns))) == _canon(
        salted.select(*sorted(plain.columns))
    )


def test_salted_join_skewed_key(spark):
    """A pathological 90%-one-key fact side still joins correctly."""
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("row_id"),
    )
    build = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    plain = fact.join(build, "k")
    salted = salted_join(fact, build, "k", fact_unique_col="row_id")
    assert plain.count() == salted.count() == 1000
    assert _canon(plain.select("k", "row_id", "v")) == _canon(
        salted.select("k", "row_id", "v")
    )
