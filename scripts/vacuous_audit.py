#!/usr/bin/env python
"""Standing vacuous-op audit (VERDICT r12 task 5): turn a driver_sim
``--out`` sweep record into the committed per-round audit of zero-row
queries.

Usage: python scripts/vacuous_audit.py [CORRECTNESS_LOCAL.json]
                                       [--out VACUOUS_AUDIT.json]

Reads the per-query records (the sweep already captures
``spark_rows``), lists every query whose result was EMPTY, and checks
each against the documented-empty allowlist in
ex_hivent_spark/plans/vacuous.py. Exit 0 iff every zero-row query is
documented; the JSON audit record is regenerated each round right
after the round-close sweep and committed alongside
CORRECTNESS_LOCAL.json.

Why this gate exists: an empty result hash-matches its oracle
trivially (schema-only compare), so a dead threshold or a latent
oracle bug can stay green forever — r12's q_mm_phash_neardup returned
zero pairs at every SF while its DuckDB oracle carried a real
floor-division bug that only surfaced once the op was rewritten to be
non-vacuous.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    out_path = "VACUOUS_AUDIT.json"
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    in_path = args[0] if args else "CORRECTNESS_LOCAL.json"

    from ex_hivent_spark.plans.vacuous import DOCUMENTED_EMPTY

    with open(in_path) as f:
        records = json.load(f)

    zero = sorted(
        n
        for n, r in records.items()
        if isinstance(r, dict) and r.get("spark_rows") == 0
    )
    undocumented = [n for n in zero if n not in DOCUMENTED_EMPTY]
    stale_allowlist = sorted(
        n for n in DOCUMENTED_EMPTY if n in records and n not in zero
    )
    # spark_rows None with no recorded error would be an audit hole —
    # neither counted nor failed (r13 ADVICE). The sweep FAIL gate
    # catches errored queries; this asserts the remainder all counted.
    uncounted = sorted(
        n
        for n, r in records.items()
        if isinstance(r, dict)
        and r.get("spark_rows") is None
        and r.get("err") is None
    )
    audit = {
        "source": in_path,
        "n_queries": len(records),
        "zero_row": {
            n: DOCUMENTED_EMPTY.get(n, "UNDOCUMENTED") for n in zero
        },
        "undocumented": undocumented,
        # documented-empty ops that now return rows: the allowlist
        # entry is stale and should be dropped (kept non-fatal — a
        # newly non-empty op is progress, not a regression).
        "stale_allowlist": stale_allowlist,
        "uncounted_no_err": uncounted,
        "ok": not undocumented and not uncounted,
    }
    with open(out_path, "w") as f:
        json.dump(audit, f, indent=1)
    print(
        f"vacuous audit: {len(zero)} zero-row of {len(records)} "
        f"({len(undocumented)} undocumented) -> {out_path}"
    )
    for n in undocumented:
        print(f"UNDOCUMENTED ZERO-ROW: {n}")
    for n in stale_allowlist:
        print(f"stale allowlist entry (now non-empty): {n}")
    for n in uncounted:
        print(f"UNCOUNTED (spark_rows None, no err): {n}")
    return 1 if undocumented or uncounted else 0


if __name__ == "__main__":
    raise SystemExit(main())
