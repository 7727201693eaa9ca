"""Mood's median / Grubbs / Dixon Q (operators/nonparam.py),
difference-stationarity ladder (operators/tsdiag.py), repeat purchase
(operators/convert.py), intrinsic dimension (llm/embaudit.py) and
per-source dup rate (llm/docstats.py): pin the SEMANTICS with
independent plain-Python implementations over the real sf0.001
parquet."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.llm.embaudit import _HUB_Q
from ex_hivent_spark.operators.tsdiag import _EPOCH_H, _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _events():
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()


def test_moods_median_matches_python(spark):
    rows = _events()
    vals = sorted(r["value"] for r in rows)
    n = len(vals)
    med = (vals[(n + 1) // 2 - 1] + vals[n // 2]) / 2.0
    above = Counter()
    below = Counter()
    for r in rows:
        (above if r["value"] > med else below)[r["event_type"]] += 1
    types = sorted(set(above) | set(below))
    ta = sum(above.values())
    tb = sum(below.values())
    chi2 = 0.0
    for t in types:
        ng = above[t] + below[t]
        ea = ng * ta / (ta + tb)
        eb = ng * tb / (ta + tb)
        chi2 += (above[t] - ea) ** 2 / ea + (below[t] - eb) ** 2 / eb
    row = SPECS["q_stats_moods_median"].spark(spark, SF_DIR).collect()[0]
    assert row["k"] == len(types)
    assert row["n_total"] == n
    assert row["grand_median"] == med
    assert row["chi2"] == pytest.approx(_e6(chi2), abs=2e-6)


def test_grubbs_matches_python(spark):
    rows = _events()
    by_t: dict = defaultdict(list)
    for r in rows:
        by_t[r["event_type"]].append(r["value"])
    got = {
        r["event_type"]: r
        for r in SPECS["q_stats_grubbs_outlier"].spark(spark, SF_DIR).collect()
    }
    for t, xs in by_t.items():
        n = len(xs)
        mean = math.fsum(xs) / n
        var = (math.fsum(x * x for x in xs) - math.fsum(xs) ** 2 / n) / (
            n - 1
        )
        sd = math.sqrt(var)
        maxd = max(abs(x - mean) for x in xs)
        outlier = min(x for x in xs if abs(x - mean) == maxd)
        row = got[t]
        assert row["n"] == n
        assert row["mean_g"] == pytest.approx(_e6(mean), abs=2e-6)
        assert row["sd_g"] == pytest.approx(_e6(sd), abs=2e-6)
        assert row["outlier_value"] == outlier
        assert row["g_stat"] == pytest.approx(_e6(maxd / sd), abs=4e-6)
        assert row["g_stat"] > 0


def test_dixon_q_matches_python(spark):
    rows = _events()
    by_t: dict = defaultdict(list)
    for r in rows:
        by_t[r["event_type"]].append(r["value"])
    got = {
        r["event_type"]: r
        for r in SPECS["q_stats_dixon_q"].spark(spark, SF_DIR).collect()
    }
    for t, xs in by_t.items():
        xs.sort()
        rng = xs[-1] - xs[0]
        row = got[t]
        assert row["n"] == len(xs)
        assert row["x_min"] == xs[0] and row["x_max"] == xs[-1]
        assert row["q_low"] == pytest.approx(
            _e6((xs[1] - xs[0]) / rng), abs=2e-6
        )
        assert row["q_high"] == pytest.approx(
            _e6((xs[-1] - xs[-2]) / rng), abs=2e-6
        )
        assert 0.0 <= row["q_low"] <= 1.0 and 0.0 <= row["q_high"] <= 1.0


def test_diff_stationarity_matches_python(spark):
    rows = _events()
    cnt = Counter(int(r["ts"].timestamp() // 3600) for r in rows)
    ys = [cnt.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]
    b = math.floor(sum(ys) / len(ys))
    d = [_e6((y - b) / b) for y in ys]
    d1 = [_e6(d[i] - d[i - 1]) for i in range(1, len(d))]
    d2 = [_e6(d1[i] - d1[i - 1]) for i in range(1, len(d1))]

    def var(xs):
        n = len(xs)
        return (
            math.fsum(x * x for x in xs) - math.fsum(xs) ** 2 / n
        ) / (n - 1)

    row = SPECS["q_ts_diff_stationarity"].spark(spark, SF_DIR).collect()[0]
    assert row["var_level"] == pytest.approx(_e6(var(d)), abs=2e-6)
    assert row["var_diff1"] == pytest.approx(_e6(var(d1)), abs=2e-6)
    assert row["var_diff2"] == pytest.approx(_e6(var(d2)), abs=2e-6)
    assert row["ratio1"] == pytest.approx(
        _e6(var(d1) / var(d)), abs=4e-6
    )
    assert row["ratio2"] == pytest.approx(
        _e6(var(d2) / var(d1)), abs=4e-6
    )


def test_repeat_purchase_matches_python(spark):
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    by_c: dict = defaultdict(list)
    for o in orders:
        by_c[o["o_custkey"]].append(
            round(o["o_orderdate"].timestamp() * 1e6)
        )
    n_customers = len(by_c)
    n_rep = sum(1 for ts in by_c.values() if len(ts) >= 2)
    gaps = []
    for ts in by_c.values():
        t1 = min(ts)
        later = [t for t in ts if t > t1]
        if later:
            gaps.append(min(later) - t1)
    row = SPECS["q_agg_repeat_purchase"].spark(spark, SF_DIR).collect()[0]
    assert row["n_customers"] == n_customers
    assert row["n_repeaters"] == n_rep
    assert row["repeat_rate"] == pytest.approx(
        _e6(n_rep / n_customers), abs=2e-6
    )
    assert row["mean_days_to_second"] == pytest.approx(
        _e6(sum(gaps) / len(gaps) / 86400e6), abs=2e-6
    )


def test_intrinsic_dim_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def unit(v):
        s = 0.0
        for x in v:
            s = s + x * x
        nm = math.sqrt(s)
        return [x / nm for x in v]

    units = {i: unit(v) for i, v in vecs.items()}
    probes = sorted(i for i in vecs if i % 5 == 0)[:_HUB_Q]
    lnmus = []
    for qid in probes:
        qu = units[qid]
        cos = {}
        for nid, u in units.items():
            if nid == qid:
                continue
            s = 0.0
            for a, b in zip(qu, u):
                s = s + a * b
            cos[nid] = _e6(s)
        top = sorted(cos, key=lambda i: (-cos[i], i))[:2]
        c1, c2 = cos[top[0]], cos[top[1]]
        if c1 < 1.0 and c2 < c1:
            lnmus.append(_e6(0.5 * math.log((1 - c2) / (1 - c1))))
    row = SPECS["q_emb_intrinsic_dim"].spark(spark, SF_DIR).collect()[0]
    assert row["n_probes_used"] == len(lnmus)
    assert row["id_mle"] == pytest.approx(
        _e6(len(lnmus) / math.fsum(lnmus)), abs=4e-6
    )
    # The manifold cannot exceed the ambient dimensionality by much.
    assert 0 < row["id_mle"] < 200


def test_source_dup_rate_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    per: dict = defaultdict(list)
    for d in docs:
        per[d["source"]].append(
            hashlib.md5(d["text"].encode()).hexdigest()
        )
    got = {
        r["source"]: r
        for r in SPECS["q_llm_source_dup_rate"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for s, hs in per.items():
        row = got[s]
        assert row["n_docs"] == len(hs)
        assert row["n_distinct"] == len(set(hs))
        assert row["n_dup_docs"] == len(hs) - len(set(hs))
        assert row["dup_rate"] == pytest.approx(
            _e6(1 - len(set(hs)) / len(hs)), abs=2e-6
        )
