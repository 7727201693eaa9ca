"""Cluster-quality indices (llm/clusterqc.py): pin the SEMANTICS with
independent plain-Python implementations over the real sf0.001
embeddings table — centroids by per-dim mean, distances by explicit
loops, the same e6 grid applied at the same points."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _load():
    rows = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    vecs = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    return vecs, labels


def _centroids(vecs, labels):
    bylab = defaultdict(list)
    for vid, v in vecs.items():
        bylab[labels[vid]].append(v)
    cents = {}
    for lab, vs in bylab.items():
        n = len(vs)
        cents[lab] = [
            math.fsum(v[d] for v in vs) / n for d in range(64)
        ]
    return cents, {lab: len(vs) for lab, vs in bylab.items()}


def _dist(x, c):
    return _e6(
        math.sqrt(math.fsum((x[d] - c[d]) ** 2 for d in range(64)))
    )


def test_silhouette_matches_python(spark):
    vecs, labels = _load()
    cents, _ = _centroids(vecs, labels)
    sums = defaultdict(list)
    for vid, v in vecs.items():
        lab = labels[vid]
        a = _dist(v, cents[lab])
        b = min(_dist(v, c) for l2, c in cents.items() if l2 != lab)
        s = 0.0 if max(a, b) == 0 else _e6((b - a) / max(a, b))
        sums[lab].append(s)
    got = {
        r["label"]: r
        for r in SPECS["q_emb_silhouette"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(sums)
    for lab, ss in sums.items():
        assert got[lab]["n"] == len(ss)
        assert got[lab]["mean_silhouette"] == pytest.approx(
            _e6(math.fsum(ss) / len(ss)), abs=1e-6
        )


def test_davies_bouldin_matches_python(spark):
    vecs, labels = _load()
    cents, counts = _centroids(vecs, labels)
    intra = {}
    dsums = defaultdict(list)
    for vid, v in vecs.items():
        dsums[labels[vid]].append(_dist(v, cents[labels[vid]]))
    for lab, ds in dsums.items():
        intra[lab] = _e6(math.fsum(ds) / len(ds))
    got = {
        r["label"]: r
        for r in SPECS["q_emb_davies_bouldin"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(intra)
    for lab in intra:
        rmax = max(
            _e6(
                (intra[lab] + intra[l2])
                / _dist(cents[lab], cents[l2])
            )
            for l2 in intra
            if l2 != lab
        )
        assert got[lab]["n"] == counts[lab]
        assert got[lab]["s_intra"] == pytest.approx(
            intra[lab], abs=1e-6
        )
        assert got[lab]["r_max"] == pytest.approx(rmax, abs=1e-5)


def test_calinski_harabasz_matches_python(spark):
    vecs, labels = _load()
    cents, counts = _centroids(vecs, labels)
    n = len(vecs)
    k = len(cents)
    grand = [
        math.fsum(v[d] for v in vecs.values()) / n for d in range(64)
    ]
    b_ss = math.fsum(
        _e6(counts[lab] * (cents[lab][d] - grand[d]) ** 2)
        for lab in cents
        for d in range(64)
    )
    w_ss = math.fsum(
        _e6(_dist(v, cents[labels[vid]]) ** 2)
        for vid, v in vecs.items()
    )
    row = (
        SPECS["q_emb_calinski_harabasz"].spark(spark, SF_DIR).collect()[0]
    )
    assert row["n_vecs"] == n and row["k"] == k
    assert row["b_ss"] == pytest.approx(_e6(b_ss), abs=1e-4)
    assert row["w_ss"] == pytest.approx(_e6(w_ss), abs=1e-4)
    ch = _e6((_e6(b_ss) / (k - 1)) / (_e6(w_ss) / (n - k)))
    assert row["ch_index"] == pytest.approx(ch, abs=1e-4)
    assert row["ch_index"] > 0
