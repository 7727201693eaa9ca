"""Env-gated wrapper wiring scripts/sf01_sample_check.py into pytest:
the sf0.1 evidence for the 18 quadratic-oracle graph/dedup ops
(sampled full-oracle hash checks + full-scale structural invariants).

Skipped by default — the check costs ~4-6 minutes at sf0.1 and the
committed INVARIANTS_SF0_1.json is the per-round record; set
SPARK_GRAFT_RUN_SF01_INVARIANTS=1 to execute it inside the suite
(e.g. before a round close, or whenever a heavy-oracle op changes)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_SF01_INVARIANTS") != "1",
    reason="set SPARK_GRAFT_RUN_SF01_INVARIANTS=1 to run the ~5-minute "
    "sf0.1 sampled-oracle + invariant check in-suite",
)
def test_sf01_sampled_oracles_and_invariants(tmp_path):
    out = tmp_path / "invariants.json"
    # Fresh process: the script builds its own vanilla session (the
    # driver-contract convention) and must not inherit suite state.
    res = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "sf01_sample_check.py"),
         "--out", str(out)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    rec = json.loads(out.read_text())
    assert rec["n_fail"] == 0
    assert all(r["hash_match"] for r in rec["sampled_hash_checks"].values())
    assert all(rec["full_sf01_invariants"].values())


def test_committed_invariants_record_is_green():
    """The committed per-round record must itself be green — a fast
    always-on guard that the evidence file wasn't committed failing."""
    with open(os.path.join(_REPO, "INVARIANTS_SF0_1.json")) as f:
        rec = json.load(f)
    assert rec["n_fail"] == 0
    assert len(rec["sampled_hash_checks"]) >= 18
    assert all(r["hash_match"] for r in rec["sampled_hash_checks"].values())
    assert len(rec["full_sf01_invariants"]) >= 23
    assert all(rec["full_sf01_invariants"].values())
