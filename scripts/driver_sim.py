#!/usr/bin/env python
"""Complete driver-contract pre-flight: run EVERY registered query in a
fresh vanilla session (no engine confs — exactly what the driver
supplies) and compare each oracle-backed query against DuckDB on the
same parquet.

Usage: python scripts/driver_sim.py [sf_dir]   (default sf0.01)
Exit code 0 iff every query passes its check.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    return "NaN" if isinstance(v, float) and math.isnan(v) else v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(norm(r[i]) for i in order) for r in rows], key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_entry = len(entry.entry(spark).collect())
    print(f"entry rows: {n_entry}")
    assert n_entry > 0

    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_rows_only = 0
    fails: list[tuple[str, str]] = []
    for name in sorted(queries):
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                s = canon(sdf.columns, srows)
                res = con.execute(oracles[name])
                d = canon([x[0] for x in res.description], res.fetchall())
                if s == d:
                    n_pass += 1
                else:
                    fails.append((name, f"hash_mismatch ({len(s)} vs {len(d)} rows)"))
            else:
                n_rows_only += 1
        except Exception as ex:  # noqa: BLE001 - report and continue
            fails.append((name, str(ex)[:160]))

    print(
        f"oracle-pass: {n_pass}, rows-only-ok: {n_rows_only}, "
        f"FAIL: {len(fails)} of {len(queries)} @ {sf_dir}"
    )
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
