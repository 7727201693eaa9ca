#!/usr/bin/env python
"""Targeted oracle check for a subset of queries (fast iteration loop
while developing; scripts/driver_sim.py remains the full pre-flight).

Usage: python scripts/check_queries.py q_name [q_name ...] [--sf DIR]
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
    # Pin the process timezone BEFORE the JVM/duckdb start: pyspark's
    # collect() renders TimestampType through datetime.fromtimestamp —
    # the OS-local timezone — so a non-UTC TZ shifts every timestamp
    # output relative to DuckDB's naive values (a local-harness
    # artifact only: these queries are driver-green across rounds, so
    # the real driver runs UTC-like). Pinning makes the pre-flight
    # reproducible on any machine.
    import time as _time

    os.environ["TZ"] = "UTC"
    _time.tzset()
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    import duckdb
    from pyspark.sql import SparkSession

    from ex_hivent_spark.plans import registry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rc = 0
    for name in names:
        spec = specs[name]
        sdf = spec.spark(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        if spec.oracle is None:
            print(f"{name}: rows-only, spark_rows={len(srows)}")
            continue
        s = canon(sdf.columns, srows)
        res = con.execute(spec.oracle)
        dcols = [x[0] for x in res.description]
        d = canon(dcols, res.fetchall())
        ok = s == d and sorted(sdf.columns) == sorted(dcols)
        print(f"{name}: {'PASS' if ok else 'FAIL'} ({len(s)} vs {len(d)} rows)")
        if not ok:
            rc = 1
            if sorted(sdf.columns) != sorted(dcols):
                print(f"  cols spark={sorted(sdf.columns)} duck={sorted(dcols)}")
            diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
            for a, b in diff:
                print(f"  spark={a}\n  duck ={b}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
