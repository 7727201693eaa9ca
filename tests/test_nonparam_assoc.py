"""Nonparametric + association batteries (operators/nonparam.py,
operators/assoc.py): pin the SEMANTICS with independent plain-Python
implementations over the real sf0.001 parquet. The CvM check is
first-principles — the direct Σ(uᵢ − (2i−1)/2n)² ranked sum, NOT the
operator's per-cell closed form — so the algebra itself is verified."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.assoc import _PRICE_BAND
from ex_hivent_spark.operators.nonparam import (
    _EPOCH_H,
    _HALF_H,
    _N_HOURS,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _events():
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()


def test_levene_matches_python(spark):
    rows = _events()
    by_t: dict = defaultdict(list)
    for r in rows:
        by_t[r["event_type"]].append(r["value"])
    zs: dict = {}
    for t, xs in by_t.items():
        m = math.fsum(xs) / len(xs)
        zs[t] = [_e6(abs(x - m)) for x in xs]
    k = len(zs)
    ntot = sum(len(v) for v in zs.values())
    sxt = math.fsum(math.fsum(v) for v in zs.values())
    sxxt = math.fsum(math.fsum(z * z for z in v) for v in zs.values())
    sb = math.fsum(math.fsum(v) ** 2 / len(v) for v in zs.values())
    ssb = sb - sxt * sxt / ntot
    ssw = sxxt - sb
    w = (ssb / (k - 1)) / (ssw / (ntot - k))
    row = SPECS["q_stats_levene"].spark(spark, SF_DIR).collect()[0]
    assert row["k"] == k and row["n_total"] == ntot
    assert row["w_stat"] == pytest.approx(_e6(w), abs=2e-6)


def test_wilcoxon_matches_python(spark):
    rows = _events()
    h1: dict = defaultdict(list)
    h2: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        (h1 if h < _HALF_H else h2)[r["user_id"]].append(r["value"])
    ds = []
    for u in set(h1) & set(h2):
        d = _e6(
            math.fsum(h2[u]) / len(h2[u]) - math.fsum(h1[u]) / len(h1[u])
        )
        if d != 0:
            ds.append(d)
    n = len(ds)
    # midranks of |d|
    absd = sorted(abs(d) for d in ds)
    rnk: dict = {}
    i = 0
    while i < len(absd):
        j = i
        while j < len(absd) and absd[j] == absd[i]:
            j += 1
        rnk[absd[i]] = (i + 1 + j) / 2.0
        i = j
    w_plus = math.fsum(rnk[abs(d)] for d in ds if d > 0)
    tie = Counter(absd)
    tcorr = sum(c**3 - c for c in tie.values())
    sig = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tcorr / 48.0)
    z = (w_plus - n * (n + 1) / 4.0) / _e6(sig)
    row = (
        SPECS["q_stats_wilcoxon_signed_rank"]
        .spark(spark, SF_DIR)
        .collect()[0]
    )
    assert row["n_pairs"] == n
    assert row["w_plus"] == pytest.approx(w_plus, rel=1e-12)
    assert row["z_stat"] == pytest.approx(z, rel=1e-9)


def test_cvm_uniform_matches_first_principles(spark):
    rows = _events()
    by_t: dict = defaultdict(list)
    for r in rows:
        j = int(r["ts"].timestamp() // 3600) - _EPOCH_H
        assert 0 <= j < _N_HOURS
        by_t[r["event_type"]].append((j + 0.5) / _N_HOURS)
    got = {
        r["event_type"]: r
        for r in SPECS["q_stats_cvm_uniform"].spark(spark, SF_DIR).collect()
    }
    for t, us in by_t.items():
        us.sort()
        n = len(us)
        w2 = (
            math.fsum(
                (u - (2 * i - 1) / (2.0 * n)) ** 2
                for i, u in enumerate(us, start=1)
            )
            + 1.0 / (12.0 * n)
        )
        row = got[t]
        assert row["n_events"] == n
        assert row["w2_stat"] == pytest.approx(_e6(w2), abs=5e-6)


def test_theil_u_matches_python(spark):
    rows = _events()
    cells = Counter(
        (r["event_type"], r["ts"].hour) for r in rows
    )
    n = sum(cells.values())
    tm = Counter()
    hm = Counter()
    for (t, h), c in cells.items():
        tm[t] += c
        hm[h] += c
    h_type = math.fsum(
        _e6(-(ct / n) * math.log(ct / n)) for ct in tm.values()
    )
    h_cond = math.fsum(
        _e6(-(c / n) * math.log(c / hm[h])) for (t, h), c in cells.items()
    )
    row = SPECS["q_stats_theil_u"].spark(spark, SF_DIR).collect()[0]
    assert row["n_events"] == n
    assert row["h_type"] == pytest.approx(_e6(h_type), abs=2e-6)
    assert row["h_cond"] == pytest.approx(_e6(h_cond), abs=2e-6)
    assert row["theil_u"] == pytest.approx(
        _e6((h_type - h_cond) / h_type), abs=2e-6
    )
    assert 0.0 <= row["theil_u"] <= 1.0


def test_cohen_kappa_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    per_src = Counter((d["source"], d["lang"]) for d in docs)
    pred = {}
    for (s, lg), c in per_src.items():
        best = pred.get(s)
        if best is None or (-c, lg) < (-best[1], best[0]):
            pred[s] = (lg, c)
    pairs = [(d["lang"], pred[d["source"]][0]) for d in docs]
    n = len(pairs)
    n_agree = sum(1 for a, b in pairs if a == b)
    am = Counter(a for a, _ in pairs)
    bm = Counter(b for _, b in pairs)
    pe = sum(am[lg] * bm.get(lg, 0) for lg in am) / (n * n)
    po = n_agree / n
    row = SPECS["q_stats_cohen_kappa"].spark(spark, SF_DIR).collect()[0]
    assert row["n_docs"] == n and row["n_agree"] == n_agree
    assert row["po"] == pytest.approx(po, rel=1e-12)
    assert row["pe"] == pytest.approx(pe, rel=1e-12)
    assert row["kappa"] == pytest.approx(
        _e6((po - pe) / (1 - pe)), abs=2e-6
    )


def test_concordance_matches_brute_force(spark):
    parts = pq.read_table(f"{SF_DIR}/part.parquet").to_pylist()
    xy = [
        (p["p_size"], math.floor(p["p_retailprice"] / _PRICE_BAND))
        for p in parts
    ]
    n_c = n_d = t_y = 0
    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            (xa, ya), (xb, yb) = xy[i], xy[j]
            if xa == xb:
                continue
            if ya == yb:
                t_y += 1
            elif (xa < xb) == (ya < yb):
                n_c += 1
            else:
                n_d += 1
    row = (
        SPECS["q_stats_concordance_gamma"].spark(spark, SF_DIR).collect()[0]
    )
    assert (row["n_c"], row["n_d"], row["t_y"]) == (n_c, n_d, t_y)
    assert row["gamma"] == pytest.approx(
        _e6((n_c - n_d) / (n_c + n_d)), abs=2e-6
    )
    assert row["somers_dyx"] == pytest.approx(
        _e6((n_c - n_d) / (n_c + n_d + t_y)), abs=2e-6
    )
