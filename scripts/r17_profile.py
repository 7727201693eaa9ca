#!/usr/bin/env python
"""Per-query profiling loop for the r17 optimization round.

Times named queries (or --top N slowest from a bench record) through the
noop sink, N same-session repetitions each, and reports min/median plus
the Spark job count per execution (extra jobs = hidden collects /
localCheckpoint materializations).

Usage:
  python scripts/r17_profile.py q_a q_b ... [--sf DIR] [--reps 3]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args

    from ex_hivent_spark.plans.registry import all_specs
    from ex_hivent_spark.session import get_session

    spark = get_session(app_name="r17-profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # Warm-up (JVM/codegen/file listing)
    try:
        specs["q_agg_pricing_summary"].spark(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

    tracker = spark.sparkContext.statusTracker()
    for name in names:
        ts, jobs = [], []
        for _ in range(reps):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(f"r17-profile:{name}")
            t0 = time.perf_counter()
            specs[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            jobs.append(j1 - j0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: median {statistics.median(ts):.3f}s "
            f"min {min(ts):.3f}s all {[round(t, 3) for t in ts]} "
            f"jobs/run {jobs}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
