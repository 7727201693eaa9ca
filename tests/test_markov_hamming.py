"""Markov stationary distribution (operators/markov.py) and sign-bit
Hamming recall (llm/embaudit.py): pin the SEMANTICS with independent
plain-Python implementations over the real sf0.001 parquet. The
Hamming check replicates the engines' sequential left-to-right float
folds exactly, so ranks (and thus recall) match bit-for-bit."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.llm.embaudit import _HAM_K, _HAM_Q
from ex_hivent_spark.operators.markov import _POWER_STEPS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _e12(x: float) -> float:
    return math.floor(x * 1e12 + 0.5) / 1e12


def test_markov_stationary_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    by_u: dict = defaultdict(list)
    for r in rows:
        by_u[r["user_id"]].append(r)
    trans: dict = defaultdict(int)
    for evs in by_u.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(evs, evs[1:]):
            trans[(a["event_type"], b["event_type"])] += 1
    outs: dict = defaultdict(int)
    for (c, _), n in trans.items():
        outs[c] += n
    p = {(c, x): n / outs[c] for (c, x), n in trans.items()}
    states = sorted(outs)
    k = len(states)
    pi = {s: 1.0 / k for s in states}
    for _ in range(_POWER_STEPS):
        nxt: dict = defaultdict(list)
        for (c, x), pij in p.items():
            nxt[x].append(_e12(pi[c] * pij))
        pi = {s: _e6(math.fsum(v)) for s, v in nxt.items()}
    tot = sum(outs.values())
    got = {
        r["state"]: r
        for r in SPECS["q_seq_markov_stationary"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(states)
    mass = 0.0
    for s in states:
        emp = outs[s] / tot
        row = got[s]
        assert row["pi_stat"] == pytest.approx(_e6(pi[s]), abs=2e-6)
        assert row["pi_emp"] == pytest.approx(_e6(emp), abs=2e-6)
        assert row["gap"] == pytest.approx(
            _e6(abs(pi[s] - emp)), abs=4e-6
        )
        mass += row["pi_stat"]
    # The rounded trajectory conserves probability mass to ~1e-5.
    assert mass == pytest.approx(1.0, abs=1e-4)


def test_hamming_recall_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def unit(v):
        s = 0.0
        for x in v:  # sequential fold, engine order
            s = s + x * x
        n = math.sqrt(s)
        return [x / n for x in v]

    def mask_pair(v):
        lo = sum(1 << j for j in range(32) if v[j] >= 0)
        hi = sum(1 << (j - 32) for j in range(32, 64) if v[j] >= 0)
        return lo, hi

    units = {i: unit(v) for i, v in vecs.items()}
    masks = {i: mask_pair(v) for i, v in vecs.items()}
    probes = sorted(i for i in vecs if i % 50 == 0)[:_HAM_Q]
    got = {
        r["query_id"]: r
        for r in SPECS["q_emb_hamming_recall"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(probes)
    for qid in probes:
        qu, (qlo, qhi) = units[qid], masks[qid]
        cos = {}
        ham = {}
        for nid, u in units.items():
            if nid == qid:
                continue
            s = 0.0
            for a, b in zip(qu, u):  # sequential fold, engine order
                s = s + a * b
            cos[nid] = _e6(s)
            ml, mh = masks[nid]
            ham[nid] = bin((qlo ^ ml)).count("1") + bin((qhi ^ mh)).count(
                "1"
            )
        exact = set(
            sorted(cos, key=lambda i: (-cos[i], i))[:_HAM_K]
        )
        hamk = set(
            sorted(ham, key=lambda i: (ham[i], i))[:_HAM_K]
        )
        overlap = len(exact & hamk)
        row = got[qid]
        assert row["n_overlap"] == overlap
        assert row["recall"] == pytest.approx(
            _e6(overlap / _HAM_K), abs=2e-6
        )
    # Sign-bit Hamming must beat random top-10 overlap on average.
    mean_recall = sum(r["recall"] for r in got.values()) / len(got)
    assert mean_recall > 10.0 / (len(vecs) - 1)
