"""Choppiness / A-D line / RVI (operators/momentum.py), token
histogram (llm/docstats.py) and price elasticity (operators/assoc.py):
pin the SEMANTICS with independent plain-Python implementations over
the real sf0.001 parquet."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.llm.docstats import _TOK_BUCKETS
from ex_hivent_spark.operators.assoc import _ELAST_LNP_BASE
from ex_hivent_spark.operators.momentum import _CHOP_WIN, _LN2, _RVI_WIN
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _obars():
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    out: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        out[t].append(
            (h, evs[-1]["value"], evs[0]["value"], max(vals), min(vals),
             len(evs))
        )
    return out


def test_choppiness_matches_python(spark):
    bars = _obars()
    got = {
        (r["event_type"], r["hour_id"]): r["chop14"]
        for r in SPECS["q_win_choppiness"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        # First bar's TR is its plain range: greatest/least skip the
        # NULL lag in BOTH engines (and that IS the textbook TR).
        trs = [_e6(series[0][3] - series[0][4])]
        for i in range(1, len(series)):
            _, c, o, h, lo, _ = series[i]
            pc = series[i - 1][1]
            trs.append(_e6(max(h, pc) - min(lo, pc)))
        for i in range(_CHOP_WIN - 1, len(trs)):
            win = series[i - _CHOP_WIN + 1 : i + 1]
            hh = max(h for _, _, _, h, _, _ in win)
            ll = min(lo for _, _, _, _, lo, _ in win)
            tr_sum = math.fsum(trs[i - _CHOP_WIN + 1 : i + 1])
            key = (t, series[i][0])
            if hh == ll or tr_sum <= 0:
                assert got[key] is None
            else:
                chop = (
                    100.0
                    * (math.log(tr_sum / (hh - ll)) / _LN2)
                    / (math.log(float(_CHOP_WIN)) / _LN2)
                )
                assert got[key] == pytest.approx(_e6(chop), abs=2e-6)
            n += 1
    assert n == len(got) and n > 0


def test_ad_line_matches_python(spark):
    bars = _obars()
    got = {
        (r["event_type"], r["hour_id"]): r["ad_line"]
        for r in SPECS["q_win_ad_line"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        run = 0.0
        for h, c, o, hi, lo, vol in series:
            mfv = (
                0.0
                if hi == lo
                else _e6(((c - lo) - (hi - c)) / (hi - lo) * vol)
            )
            run += mfv
            assert got[(t, h)] == pytest.approx(run, rel=1e-9, abs=1e-9)
            n += 1
    assert n == len(got)


def test_rvi_matches_python(spark):
    bars = _obars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_rvi"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        co = [_e6(c - o) for _, c, o, _, _, _ in series]
        hl = [_e6(h - lo) for _, _, _, h, lo, _ in series]
        for i in range(_RVI_WIN - 1, len(series)):
            cs = math.fsum(co[i - _RVI_WIN + 1 : i + 1])
            hs = math.fsum(hl[i - _RVI_WIN + 1 : i + 1])
            row = got[(t, series[i][0])]
            assert row["co_sum"] == pytest.approx(cs, abs=1e-9)
            assert row["hl_sum"] == pytest.approx(hs, abs=1e-9)
            if hs <= 0:
                assert row["rvi4"] is None
            else:
                assert row["rvi4"] == pytest.approx(_e6(cs / hs), abs=2e-6)
            n += 1
    assert n == len(got) and n > 0


def test_token_histogram_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    agg: dict = defaultdict(lambda: [0, 0])
    per_src: dict = defaultdict(int)
    for d in docs:
        ntok = len([x for x in d["text"].split(" ") if x])
        b = _TOK_BUCKETS
        for k in range(_TOK_BUCKETS):
            if ntok < (1 << (k + 1)):
                b = k
                break
        a = agg[(d["source"], b)]
        a[0] += 1
        a[1] += ntok
        per_src[d["source"]] += 1
    got = {
        (r["source"], r["bucket"]): r
        for r in SPECS["q_llm_token_histogram"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for (src, b), (nd, nt) in agg.items():
        row = got[(src, b)]
        assert row["n_docs"] == nd and row["n_tokens"] == nt
        assert row["bucket_min_tokens"] == 2**b
        assert row["doc_share"] == pytest.approx(
            _e6(nd / per_src[src]), abs=2e-6
        )


def test_price_elasticity_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    parts = {
        p["p_partkey"]: p["p_retailprice"]
        for p in pq.read_table(f"{SF_DIR}/part.parquet").to_pylist()
    }
    qty: dict = defaultdict(float)
    for r in li:
        qty[r["l_partkey"]] += r["l_quantity"]
    xs, ys = [], []
    for pk, q in qty.items():
        xs.append(_e6(math.log(parts[pk])) - _ELAST_LNP_BASE)
        ys.append(_e6(math.log(q)))
    n = len(xs)
    yb = math.floor(math.fsum(ys) / n)
    ycs = [_e6(y - yb) for y in ys]
    def _e8(v: float) -> float:
        return math.floor(v * 1e8 + 0.5) / 1e8

    sx, sy = math.fsum(xs), math.fsum(ycs)
    # Mirror the engine's e8 term rounding (the slope denominator is
    # tiny — var(ln price) ~ 1e-3 — so unrounded terms drift ~4e-5).
    sxy = math.fsum(_e8(x * y) for x, y in zip(xs, ycs))
    sxx = math.fsum(_e8(x * x) for x in xs)
    syy = math.fsum(_e8(y * y) for y in ycs)
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    row = SPECS["q_agg_price_elasticity"].spark(spark, SF_DIR).collect()[0]
    assert row["n_parts"] == n
    assert row["elasticity"] == pytest.approx(_e6(cov / vx), abs=5e-6)
    assert row["r2"] == pytest.approx(_e6(cov * cov / (vx * vy)), abs=5e-6)
    assert 0.0 <= row["r2"] <= 1.000001
