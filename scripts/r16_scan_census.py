#!/usr/bin/env python
"""Redundant-pass census: for each named query (or --top N from a bench
record), build the physical plan and report how many separate parquet
scans of each table appear in it. A query whose plan scans the same
fact table k>1 times is a candidate for the wave-8 pin/one-pass
treatment (the oracle usually proves one pass suffices).

Plan-building only — no jobs run (lazy localCheckpoints stay lazy at
explain time). Usage:
  python scripts/r16_scan_census.py [--top N] [--sf DIR] [q_name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    top = 0
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        del args[i : i + 2]
    names = list(args)

    from ex_hivent_spark.plans.registry import all_specs
    from ex_hivent_spark.session import get_session

    specs = all_specs()
    if top:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        bench = json.load(open(os.path.join(repo_root, "BENCH_FULL.json")))["queries"]
        ranked = sorted(bench.items(), key=lambda kv: -kv[1])
        names.extend(k for k, _ in ranked[:top] if k in specs)

    spark = get_session(app_name="r16-scan-census")
    spark.sparkContext.setLogLevel("ERROR")

    pat = re.compile(r"Location:.*?/([a-z0-9_]+)\.parquet")
    for name in names:
        try:
            df = specs[name].spark(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover
            print(f"{name}: ERROR {exc}")
            continue
        # one Location: line per physical scan node (details section)
        counts: dict[str, int] = {}
        for m in pat.finditer(txt):
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
        multi = {t: c for t, c in counts.items() if c > 1}
        rdd = txt.split("\n\n")[0].count("Scan ExistingRDD")
        tag = " <-- MULTI" if multi else ""
        print(f"{name}: scans={counts} existing_rdd={rdd}{tag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
