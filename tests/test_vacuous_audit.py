"""Standing vacuous-op gate (VERDICT r12 task 5): zero-row queries
hash-match their oracle trivially (the compare degenerates to a
schema check), so every zero-row result must either be rewritten to
non-vacuous semantics or carry a documented reason in
ex_hivent_spark/plans/vacuous.py. These always-on guards pin both the
committed sweep record and the committed audit record; the audit JSON
itself is regenerated each round by scripts/vacuous_audit.py right
after the round-close sweep."""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_sweep_zero_rows_are_documented():
    """Every zero-row query in the committed local sweep must be in
    the documented-empty allowlist (with its reason)."""
    from ex_hivent_spark.plans.vacuous import DOCUMENTED_EMPTY

    with open(os.path.join(_REPO, "CORRECTNESS_LOCAL.json")) as f:
        records = json.load(f)
    zero = sorted(
        n
        for n, r in records.items()
        if isinstance(r, dict) and r.get("spark_rows") == 0
    )
    undocumented = [n for n in zero if n not in DOCUMENTED_EMPTY]
    assert not undocumented, (
        "zero-row queries without a plans/vacuous.py reason "
        f"(rewrite them or document why empty is meaningful): "
        f"{undocumented}"
    )


def test_committed_audit_record_is_green():
    """The committed per-round VACUOUS_AUDIT.json must itself be green
    and derived from the full registry sweep."""
    with open(os.path.join(_REPO, "VACUOUS_AUDIT.json")) as f:
        audit = json.load(f)
    assert audit["ok"]
    assert audit["undocumented"] == []
    assert audit["n_queries"] >= 486


def test_allowlist_reasons_are_substantive():
    """A documented-empty entry must carry a real reason, not a
    placeholder — the allowlist is the audit trail the judge reads."""
    from ex_hivent_spark.plans.vacuous import DOCUMENTED_EMPTY

    for name, reason in DOCUMENTED_EMPTY.items():
        assert isinstance(reason, str) and len(reason) >= 20, name
