#!/usr/bin/env python
"""Compare two bench JSON records per query, separating genuine plan
regressions from uniform machine drift.

Repeated same-code runs on this container scale ALL queries by a
common factor (VM CPU variance, measured 54-79 s on an identical
subset) — so a raw >1.3x per-query check false-positives whole runs.
This tool normalizes by the median per-query ratio first: a query is
flagged only when it regressed relative to the run's own drift.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.3]
Accepts either a raw bench line ({"queries": ...}) or the driver's
wrapper ({"parsed": {"queries": ...}}). Exit 0 iff no normalized
regression exceeds the threshold.
"""

from __future__ import annotations

import json
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def compare(old: dict, new: dict, threshold: float) -> tuple[list, float, int]:
    common = sorted(set(old) & set(new))
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    drift = statistics.median(ratios.values()) if ratios else 1.0
    flagged = [
        (q, round(old[q], 3), round(new[q], 3), round(ratios[q] / drift, 2))
        for q in common
        if ratios.get(q, 0) / drift > threshold and new[q] > 0.5
    ]
    return flagged, drift, len(common)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.3
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    old, new = load_queries(args[0]), load_queries(args[1])
    flagged, drift, n = compare(old, new, threshold)
    print(
        f"common queries: {n}; median drift x{drift:.2f} "
        f"(normalized threshold x{threshold})"
    )
    for q, o, v, r in sorted(flagged, key=lambda t: -t[3]):
        print(f"REGRESSION {q}: {o}s -> {v}s  (x{r} beyond drift)")
    if not flagged:
        print("no normalized regressions")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
