"""Yuen trimmed-mean test (operators/nonparam.py), rolling one-day
correlation (operators/tsdiag.py), chi-square homogeneity
decomposition (operators/inference.py) and the hapax profile
(llm/lexsignals.py): pin the SEMANTICS with independent plain-Python
implementations over the real sf0.001 parquet."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.nonparam import (
    _AB_G1,
    _AB_G2,
    _YUEN_TRIM_DIV,
)
from ex_hivent_spark.operators.inference import _H2_SPLIT_DAY
from ex_hivent_spark.operators.tsdiag import (
    _EPOCH_H,
    _N_HOURS,
    _RC_G1,
    _RC_G2,
    _RC_WIN,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_yuen_trimmed_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    hv: dict = defaultdict(float)
    for r in rows:
        if r["event_type"] in (_AB_G1, _AB_G2):
            hv[(r["event_type"], int(r["ts"].timestamp() // 3600))] += r[
                "value"
            ]

    def group(t):
        vals = sorted(
            m for (tt, _h), m in hv.items() if tt == t
        )
        n = len(vals)
        g = n // _YUEN_TRIM_DIV
        trimmed = vals[g : n - g]
        tmean = math.fsum(trimmed) / len(trimmed)
        lo, hi = vals[g], vals[n - g - 1]
        wvals = [min(max(v, lo), hi) for v in vals]
        sw = math.fsum(wvals)
        sww = math.fsum(v * v for v in wvals)
        wvar = (sww - sw * sw / n) / (n - 1)
        return n, g, len(trimmed), tmean, wvar

    n1, g1, h1, tm1, wv1 = group(_AB_G1)
    n2, g2, h2, tm2, wv2 = group(_AB_G2)
    row = SPECS["q_stats_yuen_trimmed"].spark(spark, SF_DIR).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["h_eff1"] == h1 and row["h_eff2"] == h2
    assert row["tmean_g1"] == pytest.approx(tm1, abs=2e-6)
    assert row["tmean_g2"] == pytest.approx(tm2, abs=2e-6)
    assert row["diff"] == pytest.approx(tm1 - tm2, abs=4e-6)
    se = math.sqrt(
        wv1 * (n1 - 1) / (h1 * (h1 - 1.0))
        + wv2 * (n2 - 1) / (h2 * (h2 - 1.0))
    )
    assert row["yuen_t"] == pytest.approx((tm1 - tm2) / se, abs=1e-4)


def test_rolling_corr_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cx = Counter(
        int(r["ts"].timestamp() // 3600)
        for r in rows
        if r["event_type"] == _RC_G1
    )
    cy = Counter(
        int(r["ts"].timestamp() // 3600)
        for r in rows
        if r["event_type"] == _RC_G2
    )
    xs = [cx.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]
    ys = [cy.get(_EPOCH_H + i, 0) for i in range(_N_HOURS)]
    got = {
        r["hour_id"]: r["corr24"]
        for r in SPECS["q_ts_rolling_corr"].spark(spark, SF_DIR).collect()
    }
    assert len(got) == _N_HOURS - _RC_WIN + 1
    for i in range(_RC_WIN - 1, _N_HOURS):
        wx = xs[i - _RC_WIN + 1 : i + 1]
        wy = ys[i - _RC_WIN + 1 : i + 1]
        sx, sy = sum(wx), sum(wy)
        cxx = _RC_WIN * sum(v * v for v in wx) - sx * sx
        cyy = _RC_WIN * sum(v * v for v in wy) - sy * sy
        cxy = _RC_WIN * sum(a * b for a, b in zip(wx, wy)) - sx * sy
        expect = (
            None
            if cxx <= 0 or cyy <= 0
            else cxy / math.sqrt(cxx) / math.sqrt(cyy)
        )
        gotv = got[_EPOCH_H + i]
        if expect is None:
            assert gotv is None
        else:
            assert gotv == pytest.approx(expect, abs=1e-5)
            assert -1.000001 <= gotv <= 1.000001


def test_chi2_homogeneity_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    first = Counter()
    second = Counter()
    for r in rows:
        d = int(r["ts"].timestamp() // 86400)
        (first if d < _H2_SPLIT_DAY else second)[r["event_type"]] += 1
    c1, c2 = sum(first.values()), sum(second.values())
    got = {
        r["event_type"]: r
        for r in SPECS["q_stats_chi2_homogeneity"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(first) | set(second)
    for t, row in got.items():
        o1, o2 = first.get(t, 0), second.get(t, 0)
        e1 = (o1 + o2) * c1 / (c1 + c2)
        e2 = (o1 + o2) * c2 / (c1 + c2)
        assert row["n_first"] == o1 and row["n_second"] == o2
        assert row["exp_first"] == pytest.approx(_e6(e1), abs=2e-6)
        assert row["exp_second"] == pytest.approx(_e6(e2), abs=2e-6)
        assert row["chi2_term"] == pytest.approx(
            _e6((o1 - e1) ** 2 / e1 + (o2 - e2) ** 2 / e2), abs=4e-6
        )


def test_hapax_profile_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    tf: dict = defaultdict(Counter)
    for d in docs:
        tf[d["source"]].update(d["text"].split(" "))
    got = {
        r["source"]: r
        for r in SPECS["q_llm_hapax_profile"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(tf)
    for src, c in tf.items():
        v = len(c)
        n = sum(c.values())
        v1 = sum(1 for m in c.values() if m == 1)
        v2 = sum(1 for m in c.values() if m == 2)
        row = got[src]
        assert row["vocab"] == v and row["n_tokens"] == n
        assert row["v1"] == v1 and row["v2"] == v2
        assert row["hapax_vocab_share"] == pytest.approx(
            _e6(v1 / v), abs=2e-6
        )
        assert row["hapax_token_share"] == pytest.approx(
            _e6(v1 / n), abs=2e-6
        )
