"""Documented-empty allowlist for the standing vacuous-op audit.

r12 lesson (q_mm_phash_neardup): a query that returns ZERO rows
hash-matches its oracle trivially — the compare degenerates to a
schema check — so an empty result can mask a dead threshold, a wrong
grain, or a latent oracle bug indefinitely. The standing gate
(VERDICT r12 task 5): every registered query must be non-empty at
every gate SF (sf0.001 / sf0.01 / sf0.1), OR carry an entry here
explaining why empty IS the semantically meaningful answer on this
data (e.g. a clean-data audit whose non-empty case is exercised by a
unit test on synthetic dirty data).

Enforced three ways:
- scripts/driver_sim.py prints the zero-row set on every run (so the
  per-wave ``--only`` registration loop sees it immediately) and
  flags any name missing from this allowlist;
- scripts/vacuous_audit.py turns a ``--out`` sweep record into the
  committed per-round VACUOUS_AUDIT.json and exits non-zero on any
  undocumented zero-row query;
- tests/test_plans.py asserts the committed CORRECTNESS_LOCAL.json's
  zero-row set is covered by this allowlist.

As of r13 the allowlist is EMPTY: the three ops that were zero-row in
the r12 sweep (q_join_anti, q_quality_sequence_gaps,
q_graph_kcore_step) were dead-threshold vacuous, not meaningful
clean-audits, and were rewritten to non-empty semantics (priority
anti-join / purchase-stream gap audit / peel census). A future entry
must state the reason AND name the unit test that exercises the
non-empty branch.
"""

from __future__ import annotations

# name -> one-line reason why an empty result is the meaningful answer
DOCUMENTED_EMPTY: dict[str, str] = {}
