"""Replicates the driver's t2 correctness gate locally: every registered
query with an oracle runs on Spark AND on DuckDB over the same parquet,
and must match on row count, column names, and exact values
(order-insensitive). This is intentionally *stricter* than any tolerant
compare — floats must be bit-equal, which the engine guarantees via
decimal-summed aggregation.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    return value


def canonical_rows(cols, rows):
    """Sort columns by name, then rows — mirroring an order-insensitive
    value hash."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    spec = SPECS[name]
    sdf = spec.spark(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_canon = canonical_rows(spark_cols, spark_rows)
    d_canon = canonical_rows(duck_cols, duck_rows)
    mismatches = [
        (i, s, d) for i, (s, d) in enumerate(zip(s_canon, d_canon)) if s != d
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


def test_every_query_is_oracle_backed():
    """As of late r5 the registry carries NO rows-only queries — every
    registered operator, including the sketch/ANN and multimodal-decode
    ops, ships an exact DuckDB oracle. If this ever regresses, restore
    the determinism check the rows-only path used (two executions,
    canonical rows equal) for the names that appear here."""
    assert ROWS_ONLY_NAMES == [], (
        f"rows-only queries reappeared: {ROWS_ONLY_NAMES} — give them "
        "oracles or a determinism test"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert len(df.collect()) > 0
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 95
