"""Drift/significance statistics (operators/drift.py): beyond the
oracle-parity sweep, pin the SEMANTICS — each statistic must equal a
hand-computed value on the real sf0.001 tables, computed here with an
independent plain-Python implementation (not SQL on either engine)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime, timezone
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()
CUT = datetime(2024, 1, 16)


def _dec6(x: float) -> Decimal:
    """Emulate Spark/DuckDB CAST(double AS DECIMAL(25,6)): HALF_UP at
    6 fractional digits (python round() is banker's — not equivalent)."""
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _events():
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    return t.to_pylist()


def _docs():
    return pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_ks_drift_matches_python(spark):
    rows = _events()
    early = sorted(r["value"] for r in rows if r["ts"] < CUT)
    late = sorted(r["value"] for r in rows if r["ts"] >= CUT)
    values = sorted(set(early) | set(late))
    ca = cb = i = j = 0
    best = 0.0
    for v in values:
        while ca < len(early) and early[ca] <= v:
            ca += 1
        while cb < len(late) and late[cb] <= v:
            cb += 1
        best = max(best, abs(ca / len(early) - cb / len(late)))
    got = SPECS["q_ts_ks_drift"].spark(spark, SF_DIR).collect()[0]
    assert got["n_early"] == len(early)
    assert got["n_late"] == len(late)
    assert got["ks_stat"] == best


def test_psi_drift_matches_python(spark):
    rows = _events()
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in rows:
        b = min(int(r["value"] // 50.0), 9)
        (ca if r["ts"] < CUT else cb)[b] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    psi_dec = Decimal(0)
    for b in sorted(set(ca) | set(cb)):
        pa = (ca[b] + 1) / (na + 10)
        pb = (cb[b] + 1) / (nb + 10)
        psi_dec += _dec6((pa - pb) * _e6(math.log(pa / pb)))
    psi = float(psi_dec)
    got = SPECS["q_ts_psi_drift"].spark(spark, SF_DIR).collect()[0]
    assert (got["n_early"], got["n_late"]) == (na, nb)
    assert got["psi"] == psi


def _hourly():
    series: dict = defaultdict(Counter)
    for r in _events():
        # events.ts is a NAIVE timestamp interpreted as UTC by the
        # engine (session tz pinned) — pin UTC here too, or a non-UTC
        # OS timezone shifts every hour bucket.
        h = int(r["ts"].replace(tzinfo=timezone.utc).timestamp() // 3600)
        series[r["event_type"]][h] += 1
    return series


def test_theil_sen_is_pairwise_median(spark):
    series = _hourly()
    got = {
        r["event_type"]: r
        for r in SPECS["q_ts_theil_sen"].spark(spark, SF_DIR).collect()
    }
    for et, hours in series.items():
        hs = sorted(hours)
        slopes = sorted(
            (hours[h2] - hours[h1]) / (h2 - h1)
            for i, h1 in enumerate(hs)
            for h2 in hs[i + 1 :]
        )
        n = len(slopes)
        mid = (
            slopes[n // 2]
            if n % 2
            else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
        )
        assert got[et]["n_pairs"] == n
        assert abs(got[et]["theil_sen_slope"] - mid) < 1e-12, et


def test_mann_kendall_s_and_ties(spark):
    series = _hourly()
    got = {
        r["event_type"]: r
        for r in SPECS["q_ts_mann_kendall"].spark(spark, SF_DIR).collect()
    }
    for et, hours in series.items():
        hs = sorted(hours)
        s = sum(
            (hours[h2] > hours[h1]) - (hours[h2] < hours[h1])
            for i, h1 in enumerate(hs)
            for h2 in hs[i + 1 :]
        )
        n = len(hs)
        tie_adj = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(hours.values()).values()
        )
        var_s = (n * (n - 1) * (2 * n + 5) - tie_adj) / 18.0
        assert got[et]["s_stat"] == s
        assert got[et]["var_s"] == var_s
        if s > 0:
            assert got[et]["z_stat"] == (s - 1) / _e6(math.sqrt(var_s))
        elif s < 0:
            assert got[et]["z_stat"] == (s + 1) / _e6(math.sqrt(var_s))
        else:
            assert got[et]["z_stat"] == 0.0


def test_ab_proportion_pooled_z(spark):
    rows = _events()
    n1 = sum(1 for r in rows if r["ts"] < CUT)
    k1 = sum(
        1 for r in rows if r["ts"] < CUT and r["event_type"] == "purchase"
    )
    n2 = len(rows) - n1
    k2 = sum(
        1 for r in rows if r["ts"] >= CUT and r["event_type"] == "purchase"
    )
    pool = (k1 + k2) / (n1 + n2)
    se = _e6(math.sqrt(pool * (1 - pool) * (1 / n1 + 1 / n2)))
    got = SPECS["q_ab_proportion_test"].spark(spark, SF_DIR).collect()[0]
    assert (got["n1"], got["k1"], got["n2"], got["k2"]) == (n1, k1, n2, k2)
    assert got["z_stat"] == (k1 / n1 - k2 / n2) / se


def test_jsd_sources_bounds_and_identity(spark):
    """JSD is bounded by ln 2 and a source identical to the corpus
    would score 0; also cross-check one source by hand."""
    docs = _docs()
    toks_by_source: dict = defaultdict(Counter)
    corpus: Counter = Counter()
    for d in docs:
        for t in d["text"].split(" "):
            toks_by_source[d["source"]][t] += 1
            corpus[t] += 1
    n = sum(corpus.values())
    got = {
        r["source"]: r
        for r in SPECS["q_llm_jsd_sources"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(toks_by_source)
    for src, cnts in toks_by_source.items():
        ns = sum(cnts.values())
        term_sum = Decimal(0)
        sum_ct = 0  # absent-q mass rides EXACT integer counts now
        for tok, c in cnts.items():
            p = c / ns
            q = corpus[tok] / n
            m = (p + q) / 2
            # term detour widened to decimal(38,15) in r7 (ADVICE fix)
            term_sum += Decimal(
                repr(0.5 * (p * _e6(math.log(p / m)) + q * _e6(math.log(q / m))))
            ).quantize(Decimal("0.000000000000001"), ROUND_HALF_UP)
            sum_ct += corpus[tok]
        want = float(term_sum) + 0.5 * 0.693147 * (1 - sum_ct / n)
        assert got[src]["n_tokens"] == ns
        assert abs(got[src]["jsd"] - want) < 1e-9, src
        assert -1e-9 < got[src]["jsd"] < math.log(2) + 1e-9


def test_good_turing_counts(spark):
    docs = _docs()
    by_lang: dict = defaultdict(Counter)
    for d in docs:
        for t in d["text"].split(" "):
            by_lang[d["lang"]][t] += 1
    got = {
        r["lang"]: r
        for r in SPECS["q_llm_good_turing"].spark(spark, SF_DIR).collect()
    }
    for lang, cnts in by_lang.items():
        n = sum(cnts.values())
        n1 = sum(1 for c in cnts.values() if c == 1)
        n2 = sum(1 for c in cnts.values() if c == 2)
        row = got[lang]
        assert row["n_tokens"] == n
        assert row["vocab"] == len(cnts)
        assert (row["n1"], row["n2"]) == (n1, n2)
        assert row["p0_unseen"] == n1 / n
        if n1:
            assert row["r_star_1"] == 2.0 * n2 / n1
        else:
            assert row["r_star_1"] is None


def test_bayes_posterior_matches_python(spark, sf_dir):
    """Beta(1,1) posterior moments recomputed from raw arm counts."""
    import math

    import pyarrow.parquet as pq
    import pytest
    from datetime import datetime

    def e6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    cut = datetime(2024, 1, 16)
    n = {"early": 0, "late": 0}
    k = {"early": 0, "late": 0}
    for r in pq.read_table(f"{sf_dir}/events.parquet").to_pylist():
        arm = "early" if r["ts"] < cut else "late"
        n[arm] += 1
        k[arm] += 1 if r["event_type"] == "purchase" else 0

    def mean(a):
        return (1 + k[a]) / (2 + n[a])

    def var(a):
        return ((1 + k[a]) * (1 + n[a] - k[a])) / (
            (2 + n[a]) * (2 + n[a]) * (3 + n[a])
        )

    row = SPECS["q_ab_bayes_posterior"].spark(spark, sf_dir).collect()[0]
    assert row["n_early"] == n["early"] and row["k_early"] == k["early"]
    assert row["n_late"] == n["late"] and row["k_late"] == k["late"]
    assert row["post_mean_early"] == pytest.approx(e6(mean("early")), abs=1e-9)
    assert row["post_mean_late"] == pytest.approx(e6(mean("late")), abs=1e-9)
    z = e6(
        (mean("late") - mean("early"))
        / e6(math.sqrt(var("early") + var("late")))
    )
    assert row["post_z"] == pytest.approx(z, abs=1e-6)


def test_granger_lite_matches_python(spark, sf_dir):
    """Lag-1 partial correlation recomputed from densified hourly
    counts over the fixed month spine."""
    import math

    import pyarrow.parquet as pq
    import pytest

    def e6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    EPOCH_H, N_HOURS = 473352, 720
    x = {h: 0 for h in range(EPOCH_H, EPOCH_H + N_HOURS)}
    y = dict(x)
    for r in pq.read_table(f"{sf_dir}/events.parquet").to_pylist():
        h = int(r["ts"].timestamp() // 3600)
        if r["event_type"] == "click":
            x[h] += 1
        elif r["event_type"] == "purchase":
            y[h] += 1
    hours = sorted(x)
    pts = [
        (y[hours[i]], y[hours[i - 1]], x[hours[i - 1]])
        for i in range(1, len(hours))
    ]
    n = len(pts)

    def corr(ai, bi):
        sa = sum(p[ai] for p in pts)
        sb = sum(p[bi] for p in pts)
        saa = sum(p[ai] * p[ai] for p in pts)
        sbb = sum(p[bi] * p[bi] for p in pts)
        sab = sum(p[ai] * p[bi] for p in pts)
        den = e6(math.sqrt(max(float(n * saa - sa * sa), 0.0)
                           * max(float(n * sbb - sb * sb), 0.0)))
        return e6(float(n * sab - sa * sb) / den)

    r_yyl = corr(0, 1)
    r_yxl = corr(0, 2)
    r_ylxl = corr(1, 2)
    pden = e6(math.sqrt(max((1.0 - r_yyl * r_yyl)
                            * (1.0 - r_ylxl * r_ylxl), 0.0)))
    partial = e6((r_yxl - r_yyl * r_ylxl) / pden)
    row = SPECS["q_ts_granger_lite"].spark(spark, sf_dir).collect()[0]
    assert row["n_hours"] == n
    assert row["r_y_ylag"] == pytest.approx(r_yyl, abs=1e-9)
    assert row["r_y_xlag"] == pytest.approx(r_yxl, abs=1e-9)
    assert row["r_ylag_xlag"] == pytest.approx(r_ylxl, abs=1e-9)
    assert row["partial_r"] == pytest.approx(partial, abs=1e-6)
    assert -1.0 - 1e-9 <= row["partial_r"] <= 1.0 + 1e-9
