#!/usr/bin/env python
"""Same-window Spark-vs-DuckDB anchor: run EVERY registered query on
Spark (noop sink, full plan) and its DuckDB oracle on the same parquet,
in one process back-to-back, and record per-query seconds + totals.

This is the BASELINE.md anchor producer (the reference publishes no
numbers — .travis.yml runs unit tests only — so the driver's stand-in
baseline is DuckDB executing the oracle SQL on identical data).
Same-window matters: this host shows ±15-40% CPU variance between
runs, so only pairs timed in the same window are comparable.

Usage: python scripts/duckdb_anchor.py [sf_dir] [--out anchor.json]
Oracles are capped at --cap seconds each (default 900) via
con.interrupt(); a capped oracle records its cap as a LOWER bound and
is excluded from ratio math (flagged in the output).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import time as _time

    os.environ["TZ"] = "UTC"
    _time.tzset()
    args = sys.argv[1:]
    out_path = "ANCHOR.json"
    cap = 900.0
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if "--cap" in args:
        i = args.index("--cap")
        cap = float(args[i + 1])
        del args[i : i + 2]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    import duckdb

    from ex_hivent_spark.plans.registry import all_specs
    from ex_hivent_spark.session import get_session

    spark = get_session(app_name="ex-hivent-spark-anchor")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # warm-up (JVM + codegen + file listing)
    try:
        specs["q_agg_pricing_summary"].spark(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:  # noqa: BLE001
        pass
    # warm-up (Python worker pool): spawn one Arrow worker per core and
    # pay the numpy/pandas import ONCE here, so per-query numbers
    # measure steady state — otherwise the ~5 s one-time pool spawn
    # lands on whichever pandas-UDF query happens to run first
    # (measured r14: alphabetical first-victim q_emb_hamming_recall
    # read 6.7 s cold vs 1.5 s steady).
    try:
        from pyspark.sql import functions as _F

        n_cores = spark.sparkContext.defaultParallelism
        _pd_warm = _F.pandas_udf(lambda s: s * 1.0, "double")
        spark.range(n_cores * 4, numPartitions=n_cores).select(
            _pd_warm(_F.col("id").cast("double"))
        ).write.format("noop").mode("overwrite").save()
        # ...and the shipped-package import on those workers (the
        # lambda above doesn't reference ex_hivent_spark, so the
        # first real UDF task would still pay the zip import).
        if "q_llm_embed_norm" in specs:
            specs["q_llm_embed_norm"].spark(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
    except Exception:  # noqa: BLE001
        pass

    rows: dict[str, dict] = {}
    for name in sorted(specs):
        if only is not None and name not in only:
            continue
        spec = specs[name]
        rec: dict = {}
        rows[name] = rec
        t0 = time.perf_counter()
        try:
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rec["spark_sec"] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            rec["spark_err"] = str(ex).splitlines()[0][:160]
            continue
        if not getattr(spec, "oracle", None):
            rec["oracle"] = None
            continue
        timer = threading.Timer(cap, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(spec.oracle).fetchall()
            rec["duck_sec"] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            el = time.perf_counter() - t0
            if el >= cap - 1:
                rec["duck_capped_at"] = round(el, 1)
            else:
                rec["duck_err"] = str(ex).splitlines()[0][:160]
        finally:
            timer.cancel()
        print(
            f"# {name} spark={rec.get('spark_sec')} "
            f"duck={rec.get('duck_sec', rec.get('duck_capped_at', 'ERR'))}",
            flush=True,
        )

    both = [
        r for r in rows.values() if "spark_sec" in r and "duck_sec" in r
    ]
    s_tot = round(sum(r["spark_sec"] for r in both), 1)
    d_tot = round(sum(r["duck_sec"] for r in both), 1)
    out = {
        "sf_dir": sf_dir,
        "n_compared": len(both),
        "spark_total_sec": s_tot,
        "duck_total_sec": d_tot,
        "ratio": round(s_tot / d_tot, 3) if d_tot else None,
        "capped": sorted(
            n for n, r in rows.items() if "duck_capped_at" in r
        ),
        "errors": {
            n: r.get("spark_err") or r.get("duck_err")
            for n, r in rows.items()
            if "spark_err" in r or "duck_err" in r
        },
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps({k: v for k, v in out.items() if k != "queries"})
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
