#!/usr/bin/env python
"""Complete driver-contract pre-flight: run EVERY registered query in a
fresh vanilla session (no engine confs — exactly what the driver
supplies) and compare each oracle-backed query against DuckDB on the
same parquet.

Usage: python scripts/driver_sim.py [sf_dir] [--out results.json]
                                    [--only q_a,q_b,...]
(default sf_dir sf0.01). Exit code 0 iff every query passes its check.
With --out, writes a per-query JSON record in the driver's CORRECTNESS
format — committed per round as CORRECTNESS_LOCAL.json, the full-
inventory complement to the driver's first-50 record. With --only,
checks just the named queries (comma-separated, or repeated flags) —
the per-op iteration loop without a full-registry sweep. With --skip,
excludes the named queries (the sf0.1 sweep skips the quadratic-
oracle set, which INVARIANTS_SF0_1.json covers instead).
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
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    only: set[str] = set()
    while "--only" in args:
        i = args.index("--only")
        only.update(q for q in args[i + 1].split(",") if q)
        del args[i : i + 2]
    skip: set[str] = set()
    while "--skip" in args:
        i = args.index("--skip")
        skip.update(q for q in args[i + 1].split(",") if q)
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

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

    if not only:
        n_entry = len(entry.entry(spark).collect())
        print(f"entry rows: {n_entry}")
        assert n_entry > 0

    queries, oracles = entry.queries(), entry.oracle_sql()
    if only:
        unknown = only - set(queries)
        if unknown:
            print(f"unknown --only queries: {sorted(unknown)}")
            return 2
        queries = {n: q for n, q in queries.items() if n in only}
    if skip:
        queries = {n: q for n, q in queries.items() if n not in skip}
        print(f"skipping {len(skip)} queries (--skip)")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_rows_only = 0
    fails: list[tuple[str, str]] = []
    records: dict[str, dict] = {}
    for name in sorted(queries):
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        records[name] = rec
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if name in oracles:
                s = canon(sdf.columns, srows)
                res = con.execute(oracles[name])
                dcols = [x[0] for x in res.description]
                drows = res.fetchall()
                d = canon(dcols, drows)
                rec["oracle_rows"] = len(d)
                rec["rows_match"] = len(s) == len(d)
                rec["schema_match"] = sorted(sdf.columns) == sorted(dcols)
                rec["hash_match"] = s == d
                if s == d:
                    n_pass += 1
                else:
                    fails.append((name, f"hash_mismatch ({len(s)} vs {len(d)} rows)"))
            else:
                rec["err"] = "no_oracle"
                n_rows_only += 1
        except Exception as ex:  # noqa: BLE001 - report and continue
            rec["err"] = str(ex)[:160]
            fails.append((name, str(ex)[:160]))

    print(
        f"oracle-pass: {n_pass}, rows-only-ok: {n_rows_only}, "
        f"FAIL: {len(fails)} of {len(queries)} @ {sf_dir}"
    )
    # Vacuous-op surfacing (r12 lesson: an EMPTY result hash-matches
    # trivially — schema-only — and can mask a dead threshold or a
    # latent oracle bug). Every run prints the zero-row set so the
    # per-wave --only iteration sees it immediately; the round-close
    # audit record is scripts/vacuous_audit.py over the --out JSON.
    zero = [n for n, r in records.items() if r["spark_rows"] == 0]
    # A query that errors BEFORE collect leaves spark_rows None — it is
    # caught by the FAIL gate, but surface it as its own audited bucket
    # so the vacuous audit's coverage is explicit (r13 ADVICE): every
    # record is either counted (int), failed-with-err, or flagged here.
    uncounted = [
        n
        for n, r in records.items()
        if r["spark_rows"] is None and r.get("err") is None
    ]
    if uncounted:
        print(f"SPARK-ROWS-NONE WITHOUT ERR (audit hole): {', '.join(uncounted)}")
    if zero:
        from ex_hivent_spark.plans.vacuous import DOCUMENTED_EMPTY

        undoc = [n for n in zero if n not in DOCUMENTED_EMPTY]
        print(f"zero-row: {', '.join(zero)}")
        if undoc:
            print(
                "ZERO-ROW UNDOCUMENTED (add semantics or a "
                f"plans/vacuous.py reason): {', '.join(undoc)}"
            )
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(records, f, indent=1, default=str)
        print(f"wrote {out_path}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
