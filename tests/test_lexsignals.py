"""Lexicon/position curation signals (llm/lexsignals.py): pin the
semantics with plain-Python tokenizing over the real sf0.001 documents
table."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.llm.lexsignals import _BLOCKLIST
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _docs():
    return pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()


def test_blocklist_rate_matches_python(spark):
    per_src: dict = defaultdict(lambda: [0, 0, 0, 0])  # docs,flag,tok,hit
    bl = set(_BLOCKLIST)
    for d in _docs():
        toks = d["text"].split(" ")
        hits = sum(1 for t in toks if t in bl)
        c = per_src[d["source"]]
        c[0] += 1
        c[1] += 1 if hits > 0 else 0
        c[2] += len(toks)
        c[3] += hits
    got = {
        r["source"]: r
        for r in SPECS["q_llm_blocklist_rate"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_src)
    for s, (n_docs, n_flag, n_tok, n_hit) in per_src.items():
        row = got[s]
        assert (row["n_docs"], row["n_flagged"]) == (n_docs, n_flag)
        assert (row["n_tokens"], row["n_hits"]) == (n_tok, n_hit)
        assert row["hits_per_1k"] == pytest.approx(
            _e6(1000.0 * n_hit / n_tok), abs=2e-6
        )
        assert row["flag_share"] == pytest.approx(
            _e6(n_flag / n_docs), abs=2e-6
        )


def test_position_bias_matches_python(spark):
    per_decile: dict = defaultdict(lambda: [0, 0])  # tokens, firsts
    for d in _docs():
        toks = d["text"].split(" ")
        n = len(toks)
        seen: set = set()
        for pos, t in enumerate(toks):
            dec = (pos * 10) // n
            cell = per_decile[dec]
            cell[0] += 1
            if t not in seen:
                seen.add(t)
                cell[1] += 1
    got = {
        r["decile"]: r
        for r in SPECS["q_llm_position_bias"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_decile)
    prev_rate = None
    for dec in sorted(per_decile):
        n_tok, n_first = per_decile[dec]
        row = got[dec]
        assert (row["n_tokens"], row["n_first"]) == (n_tok, n_first)
        assert row["novelty_rate"] == pytest.approx(
            _e6(n_first / n_tok), abs=2e-6
        )
        prev_rate = row["novelty_rate"]
    # decile 0 must be the novelty peak (every doc's first token is new)
    assert got[0]["novelty_rate"] == max(
        r["novelty_rate"] for r in got.values()
    )
    assert prev_rate is not None
