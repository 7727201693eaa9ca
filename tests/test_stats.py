"""k-sample / shape inference battery (operators/stats.py): beyond the
oracle-parity sweep, pin the SEMANTICS — each statistic must equal a
hand-computed value on the real sf0.001 events table, computed here
with an independent plain-Python implementation (midranks via sorted
lists, moments via math.fsum — not SQL on either engine)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _events():
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()


def _groups() -> dict[str, list[float]]:
    g: dict[str, list[float]] = defaultdict(list)
    for r in _events():
        g[r["event_type"]].append(r["value"])
    return g


def _midranks(pooled: list[float]) -> dict[float, float]:
    """value -> average (mid) rank over the pooled sample."""
    cnt = Counter(pooled)
    ranks: dict[float, float] = {}
    before = 0
    for v in sorted(cnt):
        ranks[v] = before + (cnt[v] + 1) / 2.0
        before += cnt[v]
    return ranks


def test_anova_oneway_matches_python(spark):
    g = _groups()
    k = len(g)
    ntot = sum(len(v) for v in g.values())
    sxt = math.fsum(x for v in g.values() for x in v)
    sxxt = math.fsum(x * x for v in g.values() for x in v)
    sb = math.fsum(math.fsum(v) ** 2 / len(v) for v in g.values())
    ssb = sb - sxt * sxt / ntot
    ssw = sxxt - sb
    f = (ssb / (k - 1)) / (ssw / (ntot - k))
    got = SPECS["q_stats_anova_oneway"].spark(spark, SF_DIR).collect()[0]
    assert (got["k"], got["n_total"]) == (k, ntot)
    # fsum vs decimal-detour summation: agree far inside the e6 grid
    assert got["ss_between"] == pytest.approx(_e6(ssb), abs=2e-6)
    assert got["ss_within"] == pytest.approx(_e6(ssw), abs=2e-6)
    assert got["f_stat"] == pytest.approx(f, abs=1e-5)


def _rank_sums() -> tuple[dict[str, float], dict[str, int], int]:
    g = _groups()
    pooled = [x for v in g.values() for x in v]
    ranks = _midranks(pooled)
    rsum = {t: math.fsum(ranks[x] for x in v) for t, v in g.items()}
    n = {t: len(v) for t, v in g.items()}
    cnt = Counter(pooled)
    tcorr = sum(c * c * c - c for c in cnt.values())
    return rsum, n, tcorr


def test_kruskal_wallis_matches_python(spark):
    rsum, n, tcorr = _rank_sums()
    ntot = sum(n.values())
    srr = math.fsum(rsum[t] ** 2 / n[t] for t in n)
    h = 12.0 / (ntot * (ntot + 1)) * srr - 3.0 * (ntot + 1)
    h /= 1.0 - tcorr / (float(ntot) * ntot * ntot - ntot)
    got = (
        SPECS["q_stats_kruskal_wallis"].spark(spark, SF_DIR).collect()[0]
    )
    assert (got["k"], got["n_total"]) == (len(n), ntot)
    assert got["h_stat"] == pytest.approx(h, abs=1e-5)


def test_mannwhitney_u_matches_python(spark):
    g = _groups()
    x1, x2 = g["click"], g["purchase"]
    pooled = x1 + x2
    ranks = _midranks(pooled)
    n1, n2 = len(x1), len(x2)
    r1 = math.fsum(ranks[v] for v in x1)
    u = r1 - n1 * (n1 + 1) / 2.0
    cnt = Counter(pooled)
    tcorr = sum(c * c * c - c for c in cnt.values())
    ntot = n1 + n2
    sig = math.sqrt(
        n1 * n2 / 12.0 * ((ntot + 1) - tcorr / (float(ntot) * (ntot - 1)))
    )
    z = (u - n1 * n2 / 2.0) / _e6(sig)
    got = (
        SPECS["q_stats_mannwhitney_u"].spark(spark, SF_DIR).collect()[0]
    )
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["u_stat"] == pytest.approx(u, abs=1e-6)
    assert got["z_stat"] == pytest.approx(z, abs=1e-6)
    # sanity: the U/z relationship is the textbook one (z centered)
    assert abs(got["z_stat"]) < 10.0


def test_jarque_bera_matches_python(spark):
    g = _groups()
    rows = {
        r["event_type"]: r
        for r in SPECS["q_stats_jarque_bera"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(rows) == set(g)
    for t, v in g.items():
        n = len(v)
        mu = math.fsum(v) / n
        m2 = math.fsum((x - mu) ** 2 for x in v) / n
        m3 = math.fsum((x - mu) ** 3 for x in v) / n
        m4 = math.fsum((x - mu) ** 4 for x in v) / n
        s = m3 / m2**1.5
        kx = m4 / (m2 * m2) - 3.0
        jb = n / 6.0 * (_e6(s) ** 2 + _e6(kx) ** 2 / 4.0)
        got = rows[t]
        assert got["n"] == n
        # raw-moment expansion vs direct central moments: catastrophic
        # cancellation costs a few ulps at 1e-6 scale — the e6 grid
        # absorbs it in the query; here compare loosely
        assert got["skewness"] == pytest.approx(s, abs=1e-4)
        assert got["kurtosis_ex"] == pytest.approx(kx, abs=1e-4)
        assert got["jb_stat"] == pytest.approx(jb, abs=1e-2)


def test_rank_tests_consistent(spark):
    """Cross-check: KW on exactly two groups reduces to the squared MW
    z (H = z² in the no-tie-correction limit; with the same pooled tie
    correction both carry, the identity is exact up to rounding). Here
    just assert both flag the same direction of effect on the same
    data slice: KW h_stat ≥ 0 and MW |z| implies h in a sane band."""
    h = (
        SPECS["q_stats_kruskal_wallis"]
        .spark(spark, SF_DIR)
        .collect()[0]["h_stat"]
    )
    z = (
        SPECS["q_stats_mannwhitney_u"]
        .spark(spark, SF_DIR)
        .collect()[0]["z_stat"]
    )
    assert h >= 0.0
    assert abs(z) < math.sqrt(max(h, 1.0)) + 10.0


def test_cramers_v_matches_python(spark):
    rows = _events()
    obs: Counter = Counter()
    for r in rows:
        # DuckDB/Spark dayofweek: Sunday=1..Saturday=7
        obs[(r["event_type"], r["ts"].isoweekday() % 7 + 1)] += 1
    types = sorted({k[0] for k in obs})
    dows = sorted({k[1] for k in obs})
    n = sum(obs.values())
    rt = {t: sum(obs.get((t, d), 0) for d in dows) for t in types}
    ct = {d: sum(obs.get((t, d), 0) for t in types) for d in dows}
    chi = math.fsum(
        (obs.get((t, d), 0) - rt[t] * ct[d] / n) ** 2 / (rt[t] * ct[d] / n)
        for t in types
        for d in dows
    )
    got = SPECS["q_stats_cramers_v"].spark(spark, SF_DIR).collect()[0]
    assert got["n_total"] == n
    assert got["dof"] == (len(types) - 1) * (len(dows) - 1)
    assert got["chi2_stat"] == pytest.approx(chi, abs=1e-4)
    v = math.sqrt(
        got["chi2_stat"] / (n * min(len(types) - 1, len(dows) - 1))
    )
    assert got["cramers_v"] == pytest.approx(v, abs=1e-6)
    assert 0.0 <= got["cramers_v"] <= 1.0


def test_brown_forsythe_matches_python(spark):
    g = _groups()
    meds = {}
    for t, v in g.items():
        s = sorted(v)
        n = len(s)
        meds[t] = (s[(n - 1) // 2] + s[n // 2]) / 2.0
    z = {t: [abs(x - meds[t]) for x in v] for t, v in g.items()}
    k = len(z)
    ntot = sum(len(v) for v in z.values())
    sxt = math.fsum(x for v in z.values() for x in v)
    sxxt = math.fsum(x * x for v in z.values() for x in v)
    sb = math.fsum(math.fsum(v) ** 2 / len(v) for v in z.values())
    f = ((sb - sxt * sxt / ntot) / (k - 1)) / ((sxxt - sb) / (ntot - k))
    got = (
        SPECS["q_stats_brown_forsythe"].spark(spark, SF_DIR).collect()[0]
    )
    assert (got["k"], got["n_total"]) == (k, ntot)
    assert got["f_stat"] == pytest.approx(f, abs=1e-5)


def test_wilson_ci_matches_python(spark, sf_dir):
    """Wilson interval recomputed per source; brackets p_hat, stays in
    [0,1], and is wider for smaller n at comparable p_hat."""
    import math
    from collections import defaultdict

    import pyarrow.parquet as pq

    def e6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    agg: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        agg[r["source"]][0] += 1
        agg[r["source"]][1] += 1 if r["lang"] == "en" else 0
    got = {
        r["source"]: r
        for r in SPECS["q_stats_wilson_ci"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    z = 1.96
    for src, (n, k) in agg.items():
        p = k / n
        z2n = z * z / n
        rt = e6(math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n)))
        lo = e6((p + z2n / 2.0 - z * rt) / (1.0 + z2n))
        hi = e6((p + z2n / 2.0 + z * rt) / (1.0 + z2n))
        row = got[src]
        assert row["n_docs"] == n and row["n_en"] == k
        assert row["p_hat"] == pytest.approx(p, abs=1e-12)
        assert row["wilson_lower"] == pytest.approx(lo, abs=1e-9)
        assert row["wilson_upper"] == pytest.approx(hi, abs=1e-9)
        assert 0.0 <= row["wilson_lower"] <= row["p_hat"] + 1e-9
        assert row["p_hat"] - 1e-9 <= row["wilson_upper"] <= 1.0


def test_cochran_armitage_matches_python(spark, sf_dir):
    """CA trend z recomputed from raw week-bucket counts."""
    import math

    import pyarrow.parquet as pq

    def e6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    n: dict = {}
    k: dict = {}
    for r in pq.read_table(f"{sf_dir}/events.parquet").to_pylist():
        w = (r["ts"].day - 1) // 7
        n[w] = n.get(w, 0) + 1
        k[w] = k.get(w, 0) + (1 if r["event_type"] == "purchase" else 0)
    nn = sum(n.values())
    kk = sum(k.values())
    swn = sum(w * c for w, c in n.items())
    swk = sum(w * c for w, c in k.items())
    sw2n = sum(w * w * c for w, c in n.items())
    pbar = kk / nn
    t = swk - pbar * swn
    v = pbar * (1.0 - pbar) * (sw2n - float(swn) * swn / nn)
    den = e6(math.sqrt(max(v, 0.0)))
    z = 0.0 if den == 0 else e6(t / den)
    row = SPECS["q_stats_cochran_armitage"].spark(spark, sf_dir).collect()[0]
    assert row["n_groups"] == len(n)
    assert row["n_total"] == nn and row["k_total"] == kk
    assert row["z_trend"] == pytest.approx(z, abs=1e-6)
