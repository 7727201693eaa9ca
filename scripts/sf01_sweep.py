#!/usr/bin/env python
"""sf0.1 full-oracle hash sweep producer: runs every registered query
whose oracle is tractable at sf0.1 (the quadratic-oracle family in
INVARIANTS_SF0_1.json's sampled set is excluded — their evidence is
the sampled-hash + invariants record) through the driver_sim compare
and writes the structured CORRECTNESS_SF0_1.json round record.

Usage: python scripts/sf01_sweep.py [--round N] [--out CORRECTNESS_SF0_1.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    args = sys.argv[1:]
    out_path = "CORRECTNESS_SF0_1.json"
    rnd = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if "--round" in args:
        i = args.index("--round")
        rnd = int(args[i + 1])
        del args[i : i + 2]

    from ex_hivent_spark.plans.registry import all_specs

    specs = all_specs()
    with open("INVARIANTS_SF0_1.json") as f:
        heavy = sorted(json.load(f)["sampled_hash_checks"])
    to_check = [q for q in specs if q not in heavy]

    tmp = "/tmp/sf01_sweep_per_query.json"
    rc = subprocess.call(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "driver_sim.py"),
            SF_DIR,
            "--only",
            ",".join(to_check),
            "--out",
            tmp,
        ]
    )
    with open(tmp) as f:
        per_query = json.load(f)
    fails = sorted(
        q
        for q, r in per_query.items()
        if not (r.get("hash_match") is True and r.get("err") is None)
    )
    record = {
        "sf_dir": SF_DIR,
        "round": rnd,
        "arithmetic_note": (
            "full-oracle hash checks at sf0.1 for every query whose "
            "oracle is tractable at this SF; the quadratic-oracle "
            "family is excluded and carries INVARIANTS_SF0_1.json "
            "evidence instead (sampled full-oracle hash checks on the "
            "doc_id%4 sample + engine-side structural invariants)"
        ),
        "n_registered": len(specs),
        "n_checked": len(per_query),
        "n_match": len(per_query) - len(fails),
        "fails": fails,
        "skipped_heavy_oracles": heavy,
        "heavy_oracle_evidence": "INVARIANTS_SF0_1.json",
        "per_query": per_query,
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, default=str)
    print(
        f"sf0.1 sweep: {record['n_match']}/{record['n_checked']} "
        f"({len(heavy)} heavy skipped) -> {out_path}"
    )
    return 1 if fails or rc else 0


if __name__ == "__main__":
    raise SystemExit(main())
