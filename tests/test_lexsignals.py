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


def test_rrf_fusion_matches_python(spark):
    from ex_hivent_spark.llm.lexsignals import (
        _RRF_K,
        _RRF_TERMS,
        _RRF_TOP,
    )

    cand = []
    for d in _docs():
        toks = d["text"].split(" ")
        hits = sum(1 for t in toks if t in _RRF_TERMS)
        if hits > 0:
            cand.append((d["doc_id"], hits, len(set(toks))))
    by_rel = sorted(cand, key=lambda r: (-r[1], r[0]))
    by_rich = sorted(cand, key=lambda r: (-r[2], r[0]))
    r_rel = {r[0]: i + 1 for i, r in enumerate(by_rel)}
    r_rich = {r[0]: i + 1 for i, r in enumerate(by_rich)}
    fused = sorted(
        (
            (
                -_e6(
                    1.0 / (_RRF_K + r_rel[doc])
                    + 1.0 / (_RRF_K + r_rich[doc])
                ),
                doc,
                hits,
                nv,
            )
            for doc, hits, nv in cand
        )
    )[:_RRF_TOP]
    got = SPECS["q_llm_rrf_fusion"].spark(spark, SF_DIR).collect()
    assert len(got) == _RRF_TOP
    for row, (neg_score, doc, hits, nv) in zip(got, fused):
        assert row["doc_id"] == doc
        assert (row["hits"], row["n_vocab"]) == (hits, nv)
        assert (row["r_rel"], row["r_rich"]) == (r_rel[doc], r_rich[doc])
        assert row["rrf"] == pytest.approx(-neg_score, abs=2e-6)


def test_uniqueness_audit_matches_python(spark):
    events = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    want = {
        ("events", "event_id"): (
            len(events),
            len({r["event_id"] for r in events}),
        ),
        ("events", "user_id"): (
            len(events),
            len({r["user_id"] for r in events}),
        ),
        ("events", "user_id,event_type"): (
            len(events),
            len({(r["user_id"], r["event_type"]) for r in events}),
        ),
        ("events", "user_id,ts"): (
            len(events),
            len({(r["user_id"], r["ts"]) for r in events}),
        ),
        ("orders", "o_orderkey"): (
            len(orders),
            len({r["o_orderkey"] for r in orders}),
        ),
        ("orders", "o_custkey,o_orderdate"): (
            len(orders),
            len({(r["o_custkey"], r["o_orderdate"]) for r in orders}),
        ),
    }
    got = {
        (r["table_name"], r["key_cols"]): r
        for r in SPECS["q_quality_uniqueness_audit"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(want)
    for k, (n, nd) in want.items():
        row = got[k]
        assert (row["n_rows"], row["n_distinct"]) == (n, nd)
        assert row["uniqueness"] == pytest.approx(_e6(nd / n), abs=2e-6)
        assert row["is_key"] == (nd == n)
    # the declared primary keys must certify
    assert got[("events", "event_id")]["is_key"]
    assert got[("orders", "o_orderkey")]["is_key"]


def test_jl_distortion_matches_numpy(spark):
    import numpy as np

    from ex_hivent_spark.llm.similarity import (
        _JL_K,
        _JL_SAMPLE_MOD,
        _JL_SAMPLE_N,
        _JL_SCALE,
        _plane_matrix,
    )

    rows = sorted(
        (
            r
            for r in pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
            if r["vec_id"] % _JL_SAMPLE_MOD == 0
        ),
        key=lambda r: r["vec_id"],
    )[:_JL_SAMPLE_N]
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    planes = np.array(_plane_matrix(_JL_K))
    got = {
        (r["vec_a"], r["vec_b"]): r
        for r in SPECS["q_emb_jl_distortion"].spark(spark, SF_DIR).collect()
    }
    ids = sorted(vecs)
    n_pairs = 0
    ratios = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dv = vecs[a] - vecs[b]
            d2 = float((dv * dv).sum())
            proj = planes @ dv
            d2p = _JL_SCALE * float((proj * proj).sum())
            row = got[(a, b)]
            assert row["d2_orig"] == pytest.approx(d2, abs=2e-4)
            assert row["d2_proj"] == pytest.approx(d2p, abs=2e-4)
            if d2 > 0:
                assert row["ratio"] == pytest.approx(d2p / d2, abs=2e-4)
                ratios.append(row["ratio"])
            n_pairs += 1
    assert n_pairs == len(got) > 0
    # JL sanity: the unbiased estimator's per-pair distortion stays
    # moderate at k=16 and centers near 1 on average
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.7 < mean_ratio < 1.3
    assert all(0.2 < r < 3.0 for r in ratios)
