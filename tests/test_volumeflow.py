"""Volume-flow indicators (operators/volumeflow.py): pin the SEMANTICS
with independent plain-Python implementations over the real sf0.001
events table — bars by explicit sort, rolling means by list slicing,
zero-range branches asserted where present in the data."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.volumeflow import (
    _AO_FAST,
    _AO_SLOW,
    _CMF_WIN,
    _EMV_WIN,
    _FI_WIN,
    _PPO_FAST,
    _PPO_SIG,
    _PPO_SLOW,
    _TRIX_WIN,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _vbars() -> dict[str, list[tuple[int, float, float, float, int]]]:
    """(hour_id, close, high, low, vol) per type, hour ascending."""
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    out: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        out[t].append((h, evs[-1]["value"], max(vals), min(vals), len(evs)))
    return out


def _mean(xs):
    return math.fsum(xs) / len(xs)


def test_cmf_matches_python(spark):
    bars = _vbars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_cmf"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        mfv = [
            0.0
            if h == lo
            else _e6(((c - lo) - (h - c)) / (h - lo) * v)
            for _, c, h, lo, v in series
        ]
        vols = [v for *_, v in series]
        for i in range(_CMF_WIN - 1, len(series)):
            sl = slice(i - (_CMF_WIN - 1), i + 1)
            mfv_sum = math.fsum(mfv[sl])
            vol_sum = sum(vols[sl])
            row = got[(t, series[i][0])]
            assert row["vol_sum"] == vol_sum
            assert row["mfv_sum"] == pytest.approx(mfv_sum, rel=1e-9)
            assert row["cmf20"] == pytest.approx(
                _e6(mfv_sum / vol_sum), abs=2e-6
            )
            n += 1
    assert n == len(got) and n > 0


def test_force_index_matches_python(spark):
    bars = _vbars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_force_index"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        fi = [
            _e6((series[i][1] - series[i - 1][1]) * series[i][4])
            for i in range(1, len(series))
        ]
        hours = [h for h, *_ in series][1:]
        for i in range(_FI_WIN - 1, len(fi)):
            frame = fi[i - (_FI_WIN - 1) : i + 1]
            row = got[(t, hours[i])]
            assert row["fi_raw"] == pytest.approx(fi[i], abs=2e-6)
            assert row["fi13"] == pytest.approx(
                _e6(_mean(frame)), abs=2e-6
            )
            n += 1
    assert n == len(got) and n > 0


def test_emv_matches_python(spark):
    bars = _vbars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_emv"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        mps = [(h + lo) / 2.0 for _, _, h, lo, _ in series]
        emv = [
            0.0
            if series[i][2] == series[i][3]
            else _e6(
                (mps[i] - mps[i - 1])
                * (series[i][2] - series[i][3])
                / series[i][4]
            )
            for i in range(1, len(series))
        ]
        hours = [h for h, *_ in series][1:]
        for i in range(_EMV_WIN - 1, len(emv)):
            frame = emv[i - (_EMV_WIN - 1) : i + 1]
            row = got[(t, hours[i])]
            assert row["emv_raw"] == pytest.approx(emv[i], abs=2e-6)
            assert row["emv14"] == pytest.approx(
                _e6(_mean(frame)), abs=2e-6
            )
            n += 1
    assert n == len(got) and n > 0


def test_awesome_osc_matches_python(spark):
    bars = _vbars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_awesome_osc"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        mps = [_e6((h + lo) / 2.0) for _, _, h, lo, _ in series]
        aos: list = []
        for i in range(len(series)):
            if i < _AO_SLOW - 1:
                aos.append(None)
                continue
            fast = _mean(mps[i - (_AO_FAST - 1) : i + 1])
            slow = _mean(mps[i - (_AO_SLOW - 1) : i + 1])
            aos.append(_e6(fast - slow))
        for i in range(len(series)):
            if aos[i] is None or i == 0 or aos[i - 1] is None:
                continue
            row = got[(t, series[i][0])]
            assert row["ao"] == pytest.approx(aos[i], abs=2e-6)
            want = (
                1 if aos[i] > aos[i - 1] else -1 if aos[i] < aos[i - 1] else 0
            )
            assert row["ao_color"] == want
            n += 1
    assert n == len(got) and n > 0


def test_ppo_matches_python(spark):
    bars = _vbars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_ppo"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        closes = [c for _, c, *_ in series]
        ppos: list = []
        hours_kept: list = []
        for i in range(len(series)):
            if i < _PPO_SLOW - 1:
                continue
            fast = _mean(closes[i - (_PPO_FAST - 1) : i + 1])
            slow = _mean(closes[i - (_PPO_SLOW - 1) : i + 1])
            if slow == 0:
                continue
            ppos.append(_e6(100.0 * (fast - slow) / slow))
            hours_kept.append(series[i][0])
        for i in range(_PPO_SIG - 1, len(ppos)):
            frame = ppos[i - (_PPO_SIG - 1) : i + 1]
            sig = _e6(_mean(frame))
            row = got[(t, hours_kept[i])]
            assert row["ppo"] == pytest.approx(ppos[i], abs=2e-6)
            assert row["signal_line"] == pytest.approx(sig, abs=2e-6)
            assert row["histogram"] == pytest.approx(
                _e6(ppos[i] - sig), abs=4e-6
            )
            n += 1
    assert n == len(got) and n > 0


def test_trix_matches_python(spark):
    bars = _vbars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_trix"].spark(spark, SF_DIR).collect()
    }

    def smooth(xs):
        return [
            _e6(_mean(xs[i - (_TRIX_WIN - 1) : i + 1]))
            for i in range(_TRIX_WIN - 1, len(xs))
        ]

    n = 0
    for t, series in bars.items():
        closes = [c for _, c, *_ in series]
        m3 = smooth(smooth(smooth(closes)))
        # m3[j] corresponds to bar index j + 3*(win-1)
        off = 3 * (_TRIX_WIN - 1)
        for j in range(1, len(m3)):
            if m3[j - 1] == 0:
                continue
            row = got[(t, series[j + off][0])]
            assert row["smooth3"] == pytest.approx(m3[j], abs=2e-6)
            assert row["trix_bp"] == pytest.approx(
                _e6(10000.0 * (m3[j] - m3[j - 1]) / m3[j - 1]), abs=2e-5
            )
            n += 1
    assert n == len(got) and n > 0


def test_coppock_matches_python(spark):
    from ex_hivent_spark.operators.volumeflow import (
        _COP_ROC_A,
        _COP_ROC_B,
        _COP_WMA,
        _COP_WSUM,
    )

    bars = _vbars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_coppock"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        closes = [c for _, c, *_ in series]
        rocs: list = []
        hours: list = []
        for i in range(len(series)):
            if i < _COP_ROC_A:
                continue
            ca, cb = closes[i - _COP_ROC_A], closes[i - _COP_ROC_B]
            if ca <= 0 or cb <= 0:
                continue
            rocs.append(
                _e6(
                    100.0 * (closes[i] / ca - 1.0)
                    + 100.0 * (closes[i] / cb - 1.0)
                )
            )
            hours.append(series[i][0])
        for i in range(_COP_WMA - 1, len(rocs)):
            wsum = 0.0
            for k in range(_COP_WMA):
                wsum += (_COP_WMA - k) * rocs[i - k]
            row = got[(t, hours[i])]
            assert row["roc_sum"] == pytest.approx(rocs[i], abs=2e-6)
            assert row["coppock"] == pytest.approx(
                _e6(wsum / _COP_WSUM), abs=2e-5
            )
            n += 1
    assert n == len(got) and n > 0
