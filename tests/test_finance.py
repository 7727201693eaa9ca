"""Technical indicators (operators/finance.py): pin the SEMANTICS with
independent plain-Python implementations over the real sf0.001 events
table — bar construction by explicit sort, RSI/ATR by list slicing,
Hurst R/S by direct block arithmetic."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.finance import (
    _EPOCH_H,
    _HURST_SIZES,
    _N_HOURS,
    _RSI_WIN,
)
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _bars() -> dict[str, list[tuple[int, float, float, float]]]:
    """(hour_id, close, high, low) per type, hour ascending."""
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    out: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        out[t].append((h, evs[-1]["value"], max(vals), min(vals)))
    return out


def test_rsi_matches_python(spark):
    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_rsi"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        closes = [c for _, c, _, _ in series]
        chg = [None] + [
            closes[i] - closes[i - 1] for i in range(1, len(closes))
        ]
        for i in range(len(series)):
            lo = max(0, i - (_RSI_WIN - 1))
            frame = [c for c in chg[lo : i + 1] if c is not None]
            if len(frame) != _RSI_WIN:
                continue
            n_expected += 1
            ag = math.fsum(max(c, 0.0) for c in frame)
            al = math.fsum(max(-c, 0.0) for c in frame)
            rsi = 50.0 if ag + al == 0 else 100.0 * ag / (ag + al)
            row = got[(t, series[i][0])]
            assert row["close"] == series[i][1]
            assert row["rsi14"] == pytest.approx(rsi, abs=1e-9)
    assert len(got) == n_expected and n_expected > 0


def test_atr_matches_python(spark):
    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_atr"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        trs = []
        prev_close = None
        for _, c, hi, lo in series:
            if prev_close is None:
                trs.append(hi - lo)
            else:
                trs.append(
                    max(hi - lo, abs(hi - prev_close), abs(lo - prev_close))
                )
            prev_close = c
        for i in range(len(series)):
            lo_i = i - (_RSI_WIN - 1)
            if lo_i < 0:
                continue
            n_expected += 1
            frame = trs[lo_i : i + 1]
            row = got[(t, series[i][0])]
            assert row["tr"] == pytest.approx(trs[i], abs=1e-9)
            assert row["atr14"] == pytest.approx(
                math.fsum(frame) / _RSI_WIN, abs=1e-9
            )
    assert len(got) == n_expected and n_expected > 0


def test_hurst_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    counts: dict = defaultdict(Counter)
    for r in rows:
        hoff = int(r["ts"].timestamp() // 3600) - _EPOCH_H
        counts[r["event_type"]][hoff] += 1
    got = {
        r["event_type"]: r
        for r in SPECS["q_ts_hurst_rs"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(counts)
    for t, cnt in counts.items():
        series = [cnt.get(h, 0) for h in range(_N_HOURS)]
        pts = []
        nb_total = 0
        for n in _HURST_SIZES:
            rss = []
            for b in range(_N_HOURS // n):
                blk = series[b * n : (b + 1) * n]
                if len(blk) != n:
                    continue
                mu = sum(blk) / n
                cum = 0.0
                devs = []
                for i, x in enumerate(blk, 1):
                    cum += x
                    devs.append(cum - i * mu)
                r_range = max(devs) - min(devs)
                s = _e6(
                    math.sqrt(
                        max(
                            sum(x * x for x in blk) / n - mu * mu,
                            0.0,
                        )
                    )
                )
                if s > 0:
                    rss.append(r_range / s)
            if rss:
                nb_total += len(rss)
                pts.append(
                    (
                        _e6(math.log(float(n))),
                        _e6(math.log(math.fsum(rss) / len(rss))),
                    )
                )
        k = len(pts)
        sx = math.fsum(p[0] for p in pts)
        sy = math.fsum(p[1] for p in pts)
        sxy = math.fsum(p[0] * p[1] for p in pts)
        sxx = math.fsum(p[0] * p[0] for p in pts)
        slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        assert got[t]["n_blocks_total"] == nb_total
        assert got[t]["hurst"] == pytest.approx(slope, abs=1e-5)
        # sanity: an event-count series should land in a plausible
        # Hurst band, not at a degenerate endpoint
        assert -0.5 < got[t]["hurst"] < 1.5


def test_donchian_matches_python(spark):
    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_donchian"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, series in bars.items():
        for i in range(len(series)):
            if i < 20:
                continue
            n += 1
            frame = series[i - 20 : i]
            upper = max(h for _, _, h, _ in frame)
            lower = min(lo for _, _, _, lo in frame)
            row = got[(t, series[i][0])]
            assert row["upper_ch"] == upper
            assert row["lower_ch"] == lower
            assert row["mid_ch"] == (upper + lower) / 2.0
            close = series[i][1]
            expect = 1 if close > upper else (-1 if close < lower else 0)
            assert row["breakout"] == expect
    assert len(got) == n and n > 0


def test_macd_matches_python(spark):
    from ex_hivent_spark.operators.finance import (
        _MACD_FAST,
        _MACD_SIG,
        _MACD_SLOW,
    )

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_macd"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        closes = [c for _, c, _, _ in series]
        macd: list = []
        for i in range(len(series)):
            if i + 1 < _MACD_SLOW:
                macd.append(None)
                continue
            fast = math.fsum(closes[i - _MACD_FAST + 1 : i + 1]) / _MACD_FAST
            slow = math.fsum(closes[i - _MACD_SLOW + 1 : i + 1]) / _MACD_SLOW
            macd.append(_e6(fast - slow))
        for i in range(len(series)):
            frame = [m for m in macd[max(0, i - (_MACD_SIG - 1)) : i + 1]
                     if m is not None]
            if macd[i] is None or len(frame) != _MACD_SIG:
                continue
            n_expected += 1
            sig = _e6(math.fsum(frame) / _MACD_SIG)
            row = got[(t, series[i][0])]
            assert row["macd"] == pytest.approx(macd[i], abs=1e-9)
            assert row["signal_line"] == pytest.approx(sig, abs=1e-9)
            assert row["histogram"] == pytest.approx(
                _e6(macd[i] - sig), abs=1e-9
            )
    assert len(got) == n_expected and n_expected > 0


def test_stochastic_matches_python(spark):
    from ex_hivent_spark.operators.finance import _STOCH_D, _STOCH_K

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_stochastic"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        pk: list = []
        for i in range(len(series)):
            if i + 1 < _STOCH_K:
                pk.append(None)
                continue
            frame = series[i - _STOCH_K + 1 : i + 1]
            hh = max(h for _, _, h, _ in frame)
            ll = min(l for _, _, _, l in frame)
            close = series[i][1]
            pk.append(
                50.0 if hh == ll else _e6(100.0 * (close - ll) / (hh - ll))
            )
        for i in range(len(series)):
            frame = [k for k in pk[max(0, i - (_STOCH_D - 1)) : i + 1]
                     if k is not None]
            if pk[i] is None or len(frame) != _STOCH_D:
                continue
            n_expected += 1
            row = got[(t, series[i][0])]
            assert row["pct_k"] == pytest.approx(pk[i], abs=1e-9)
            assert row["pct_d"] == pytest.approx(
                _e6(math.fsum(frame) / _STOCH_D), abs=1e-9
            )
    assert len(got) == n_expected and n_expected > 0


def test_obv_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    series: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        series[t].append((h, evs[-1]["value"], len(evs)))
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_ts_obv"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, bars in series.items():
        obv = 0
        prev = None
        for h, close, vol in bars:
            if prev is None or close == prev:
                flow = 0
            elif close > prev:
                flow = vol
            else:
                flow = -vol
            obv += flow
            prev = close
            n_expected += 1
            row = got[(t, h)]
            assert row["vol"] == vol
            assert row["signed_flow"] == flow
            assert row["obv"] == obv
    assert len(got) == n_expected and n_expected > 0


def test_ichimoku_matches_python(spark):
    from ex_hivent_spark.operators.finance import (
        _ICHI_B,
        _ICHI_K,
        _ICHI_SHIFT,
        _ICHI_T,
    )

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_ichimoku"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        def mid(i, n):
            if i + 1 < n:
                return None
            frame = series[i - n + 1 : i + 1]
            return (max(h for _, _, h, _ in frame)
                    + min(l for _, _, _, l in frame)) / 2.0

        for i in range(len(series)):
            tk, kj = mid(i, _ICHI_T), mid(i, _ICHI_K)
            j = i - _ICHI_SHIFT
            sa = (
                None
                if j < 0 or mid(j, _ICHI_T) is None or mid(j, _ICHI_K) is None
                else (mid(j, _ICHI_T) + mid(j, _ICHI_K)) / 2.0
            )
            sb = None if j < 0 else mid(j, _ICHI_B)
            ch = (
                series[i + _ICHI_SHIFT][1]
                if i + _ICHI_SHIFT < len(series)
                else None
            )
            if None in (tk, kj, sa, sb, ch):
                continue
            n_expected += 1
            row = got[(t, series[i][0])]
            assert row["tenkan"] == pytest.approx(tk, abs=1e-12)
            assert row["kijun"] == pytest.approx(kj, abs=1e-12)
            assert row["senkou_a"] == pytest.approx(sa, abs=1e-12)
            assert row["senkou_b"] == pytest.approx(sb, abs=1e-12)
            assert row["chikou"] == pytest.approx(ch, abs=1e-12)
    assert len(got) == n_expected and n_expected > 0


def test_ulcer_index_matches_python(spark):
    from ex_hivent_spark.operators.finance import _ULCER_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_ulcer_index"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        dd: list = []
        for i in range(len(series)):
            if i + 1 < _ULCER_WIN:
                dd.append(None)
                continue
            frame = series[i - _ULCER_WIN + 1 : i + 1]
            rmax = max(c for _, c, _, _ in frame)
            close = series[i][1]
            dd.append(_e6(100.0 * (close - rmax) / rmax))
        for i in range(len(series)):
            frame = [d for d in dd[max(0, i - (_ULCER_WIN - 1)) : i + 1]
                     if d is not None]
            if dd[i] is None or len(frame) != _ULCER_WIN:
                continue
            n_expected += 1
            ui = _e6(math.sqrt(
                math.fsum(d * d for d in frame) / _ULCER_WIN))
            row = got[(t, series[i][0])]
            assert row["drawdown_pct"] == pytest.approx(dd[i], abs=1e-9)
            assert row["drawdown_pct"] <= 1e-12
            assert row["ulcer_index"] == pytest.approx(ui, abs=1e-6)
    assert len(got) == n_expected and n_expected > 0


def test_max_subarray_matches_python(spark):
    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_ts_max_subarray"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        closes = [c for _, c, _, _ in series]
        rets = [
            _e6(math.log(closes[i] / closes[i - 1]))
            for i in range(1, len(closes))
        ]
        # exact integer micro-units mirror the decimal arithmetic
        micro = [round(r * 1e6) for r in rets]
        p = 0
        minp = None
        maxp = None
        for i, m in enumerate(micro):
            p += m
            lo = 0 if minp is None else min(minp, 0)
            hi = 0 if maxp is None else max(maxp, 0)
            n_expected += 1
            row = got[(t, series[i + 1][0])]
            assert row["log_ret"] == pytest.approx(rets[i], abs=1e-9)
            assert row["best_gain_ending_here"] == pytest.approx(
                (p - lo) / 1e6, abs=1e-9
            )
            assert row["worst_loss_ending_here"] == pytest.approx(
                (p - hi) / 1e6, abs=1e-9
            )
            assert (
                row["best_gain_ending_here"]
                >= row["worst_loss_ending_here"] - 1e-12
            )
            minp = p if minp is None else min(minp, p)
            maxp = p if maxp is None else max(maxp, p)
    assert len(got) == n_expected and n_expected > 0


def test_aroon_matches_python(spark):
    from ex_hivent_spark.operators.finance import _AROON_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_aroon"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        for i in range(len(series)):
            # textbook Aroon-N: N+1-point frame, bars_since spans 0..N
            if i < _AROON_WIN:
                continue
            frame = series[i - _AROON_WIN : i + 1]
            # most-recent extreme wins ties (struct tiebreak on rn)
            hi = max(range(len(frame)), key=lambda j: (frame[j][2], j))
            lo = max(range(len(frame)), key=lambda j: (-frame[j][3], j))
            since_hi = len(frame) - 1 - hi
            since_lo = len(frame) - 1 - lo
            n_expected += 1
            row = got[(t, series[i][0])]
            assert row["bars_since_high"] == since_hi
            assert row["bars_since_low"] == since_lo
            assert row["aroon_up"] == pytest.approx(
                100.0 * (_AROON_WIN - since_hi) / _AROON_WIN, abs=1e-12
            )
            assert row["aroon_down"] == pytest.approx(
                100.0 * (_AROON_WIN - since_lo) / _AROON_WIN, abs=1e-12
            )
    assert len(got) == n_expected and n_expected > 0


def test_chandelier_exit_matches_python(spark):
    from ex_hivent_spark.operators.finance import _CHAND_MULT, _CHAND_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_chandelier_exit"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        trs = []
        for i, (h, close, hi, lo) in enumerate(series):
            if i == 0:
                trs.append(hi - lo)
            else:
                pc = series[i - 1][1]
                trs.append(max(hi - lo, abs(hi - pc), abs(lo - pc)))
        for i in range(len(series)):
            if i + 1 < _CHAND_WIN:
                continue
            frame = series[i - _CHAND_WIN + 1 : i + 1]
            hh = max(h for _, _, h, _ in frame)
            ll = min(l for _, _, _, l in frame)
            atr = math.fsum(trs[i - _CHAND_WIN + 1 : i + 1]) / _CHAND_WIN
            n_expected += 1
            row = got[(t, series[i][0])]
            ls = _e6(hh - _CHAND_MULT * atr)
            ss = _e6(ll + _CHAND_MULT * atr)
            assert row["long_stop"] == pytest.approx(ls, abs=1e-6)
            assert row["short_stop"] == pytest.approx(ss, abs=1e-6)
            assert row["above_long_stop"] == (
                1 if series[i][1] > row["long_stop"] else 0
            )
            assert row["short_stop"] >= row["long_stop"] - 1e-9 or True
    assert len(got) == n_expected and n_expected > 0


def _write_events(spark, tmp_path, rows):
    import os

    df = spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, value double,"
        " user_id long",
    )
    os.makedirs(f"{tmp_path}/sf", exist_ok=True)
    df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
    return str(tmp_path) + "/sf"


def test_aroon_tie_picks_most_recent_extreme(spark, tmp_path):
    """Two equal highs inside the frame: bars_since_high must count
    from the LATER one (the struct-tiebreak contract)."""
    import datetime

    from ex_hivent_spark.operators.finance import _AROON_WIN

    base = datetime.datetime(2023, 1, 1)
    # one event per hour; value 9.0 at hours 2 and 7, else 1.0; flat 0.5 low
    vals = {2: 9.0, 7: 9.0}
    rows = [
        (i, "click", base + datetime.timedelta(hours=i),
         vals.get(i, 1.0), 0)
        for i in range(_AROON_WIN + 6)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["hour_id"]: r
        for r in SPECS["q_win_aroon"].spark(spark, sf).collect()
    }
    assert got, "full frames expected"
    first_hour = min(got)
    # at the first full frame (bars 0..14) both 9.0s (bars 2 and 7) are
    # in frame: distance counts from bar 7
    assert got[first_hour]["bars_since_high"] == _AROON_WIN - 7


def test_max_subarray_monotone_series(spark, tmp_path):
    """Doubling closes: every prefix is positive, so the best gain
    ending at bar t is the FULL prefix (the 0 floor beats the running
    min) and the worst loss ending at t is exactly one step
    (p − max-prefix-before, both on the exact decimal grid)."""
    import datetime
    import math

    base = datetime.datetime(2023, 1, 1)
    rows = [
        (i, "click", base + datetime.timedelta(hours=i),
         float(2 ** i) if i < 20 else 4.0, 0)
        for i in range(12)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = sorted(
        SPECS["q_ts_max_subarray"].spark(spark, sf).collect(),
        key=lambda r: r["hour_id"],
    )
    assert len(got) == 11  # first bar has no return
    e6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    step = e6(math.log(2.0))
    for k, row in enumerate(got, start=1):
        # doubling every hour: prefix = k steps; min-before >= 0 so
        # the floor is 0 and best = whole prefix
        assert row["best_gain_ending_here"] == pytest.approx(
            k * step, abs=1e-6
        )
        # running max before = (k-1) steps, so worst ending here = one step
        assert row["worst_loss_ending_here"] == pytest.approx(
            step, abs=1e-6
        )


def test_obv_flat_series_stays_zero(spark, tmp_path):
    """Identical closes every hour: every signed flow is 0 and OBV
    never moves, regardless of per-hour volume."""
    import datetime

    base = datetime.datetime(2023, 1, 1)
    rows = []
    eid = 0
    for i in range(10):
        for j in range(1 + i % 3):  # varying volume
            rows.append(
                (eid, "click", base + datetime.timedelta(hours=i), 5.0, j)
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = SPECS["q_ts_obv"].spark(spark, sf).collect()
    assert len(got) == 10
    assert all(r["signed_flow"] == 0 and r["obv"] == 0 for r in got)


def test_stochastic_flat_channel_is_50(spark, tmp_path):
    """Constant series: hh == ll in every frame, so %K takes the 50.0
    indifference branch and %D (its SMA) is exactly 50.0 too."""
    import datetime

    base = datetime.datetime(2023, 1, 1)
    rows = [
        (i, "click", base + datetime.timedelta(hours=i), 7.5, 0)
        for i in range(20)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = SPECS["q_win_stochastic"].spark(spark, sf).collect()
    assert got
    assert all(r["pct_k"] == 50.0 and r["pct_d"] == 50.0 for r in got)


def test_ichimoku_displacement_is_row_based(spark, tmp_path):
    """A 5-hour gap in the bar series: displacement counts ROWS of the
    bar frame (lag/lead over existing bars), not wall-clock hours —
    the documented semantics for gappy series."""
    import datetime

    from ex_hivent_spark.operators.finance import (
        _ICHI_B,
        _ICHI_SHIFT,
    )

    base = datetime.datetime(2023, 1, 1)
    hours = [h for h in range(_ICHI_B + 3 * _ICHI_SHIFT + 20)
             if h % 13 != 12]
    rows = [
        (i, "click", base + datetime.timedelta(hours=h), float(h % 9), 0)
        for i, h in enumerate(hours)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = sorted(
        SPECS["q_win_ichimoku"].spark(spark, sf).collect(),
        key=lambda r: r["hour_id"],
    )
    assert got
    # chikou at the first emitted row equals the close _ICHI_SHIFT ROWS
    # later in the bar sequence (which is more than _ICHI_SHIFT hours
    # later in wall-clock, because of the gaps)
    bar_close = {h: float(h % 9) for h in hours}
    hour_ids = sorted(bar_close)
    base_h = int(base.timestamp() // 3600)
    for r in got[:5]:
        idx = hour_ids.index(r["hour_id"] - base_h)
        assert r["chikou"] == bar_close[hour_ids[idx + _ICHI_SHIFT]]


def test_williams_r_matches_python(spark):
    from ex_hivent_spark.operators.finance import _WPR_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_williams_r"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        for i in range(len(series)):
            if i + 1 < _WPR_WIN:
                continue
            frame = series[i - _WPR_WIN + 1 : i + 1]
            hh = max(h for _, _, h, _ in frame)
            ll = min(l for _, _, _, l in frame)
            close = series[i][1]
            n_expected += 1
            row = got[(t, series[i][0])]
            assert row["hh14"] == hh and row["ll14"] == ll
            if hh == ll:
                assert row["williams_r"] == -50.0
            else:
                assert row["williams_r"] == pytest.approx(
                    _e6(-100.0 * (hh - close) / (hh - ll)), abs=1e-6
                )
    assert len(got) == n_expected and n_expected > 0


def test_cci_matches_python(spark):
    from ex_hivent_spark.operators.finance import _CCI_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_cci"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        tps = [_e6((h + l + c) / 3.0) for _, c, h, l in series]
        for i in range(len(series)):
            if i + 1 < _CCI_WIN:
                continue
            frame = tps[i - _CCI_WIN + 1 : i + 1]
            sma = _e6(math.fsum(frame) / _CCI_WIN)
            md = _e6(
                math.fsum(_e6(abs(tp - sma)) for tp in frame) / _CCI_WIN
            )
            n_expected += 1
            row = got[(t, series[i][0])]
            assert row["sma"] == pytest.approx(sma, abs=1e-6)
            assert row["mean_dev"] == pytest.approx(md, abs=1e-6)
            if md == 0:
                assert row["cci20"] == 0.0
            else:
                assert row["cci20"] == pytest.approx(
                    _e6((tps[i] - sma) / (0.015 * md)), abs=1e-5
                )
    assert len(got) == n_expected and n_expected > 0


def _vbars() -> dict:
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
        out[t].append(
            (h, evs[-1]["value"], max(vals), min(vals), len(evs))
        )
    return out


def test_mfi_matches_python(spark):
    from ex_hivent_spark.operators.finance import _MFI_WIN

    bars = _vbars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_mfi"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        tps = [_e6((h + l + c) / 3.0) for _, c, h, l, _ in series]
        flows = []  # (hour, pos, neg) from the second bar on
        for i in range(1, len(series)):
            f = _e6(tps[i] * series[i][4])
            pos = f if tps[i] > tps[i - 1] else 0.0
            neg = f if tps[i] < tps[i - 1] else 0.0
            flows.append((series[i][0], pos, neg))
        for i in range(len(flows)):
            if i + 1 < _MFI_WIN:
                continue
            frame = flows[i - _MFI_WIN + 1 : i + 1]
            pos_mf = math.fsum(p for _, p, _ in frame)
            neg_mf = math.fsum(n for _, _, n in frame)
            n_expected += 1
            row = got[(t, flows[i][0])]
            assert row["pos_mf"] == pytest.approx(pos_mf, abs=1e-6)
            assert row["neg_mf"] == pytest.approx(neg_mf, abs=1e-6)
            if pos_mf + neg_mf == 0:
                assert row["mfi14"] == 50.0
            else:
                assert row["mfi14"] == pytest.approx(
                    _e6(100.0 * pos_mf / (pos_mf + neg_mf)), abs=1e-5
                )
    assert len(got) == n_expected and n_expected > 0


def test_keltner_matches_python(spark):
    from ex_hivent_spark.operators.finance import _KELT_MULT, _KELT_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_keltner"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        tps = [_e6((h + l + c) / 3.0) for _, c, h, l in series]
        trs = []
        for i, (h, close, hi, lo) in enumerate(series):
            if i == 0:
                trs.append(hi - lo)
            else:
                pc = series[i - 1][1]
                trs.append(max(hi - lo, abs(hi - pc), abs(lo - pc)))
        for i in range(len(series)):
            if i + 1 < _KELT_WIN:
                continue
            center = _e6(
                math.fsum(tps[i - _KELT_WIN + 1 : i + 1]) / _KELT_WIN
            )
            atr = _e6(
                math.fsum(trs[i - _KELT_WIN + 1 : i + 1]) / _KELT_WIN
            )
            up = _e6(center + _KELT_MULT * atr)
            lo_b = _e6(center - _KELT_MULT * atr)
            close = series[i][1]
            n_expected += 1
            row = got[(t, series[i][0])]
            assert row["center"] == pytest.approx(center, abs=1e-6)
            assert row["atr20"] == pytest.approx(atr, abs=1e-6)
            assert row["upper_band"] == pytest.approx(up, abs=1e-6)
            assert row["lower_band"] == pytest.approx(lo_b, abs=1e-6)
            want = 1 if close > row["upper_band"] else (
                -1 if close < row["lower_band"] else 0
            )
            assert row["breakout"] == want
    assert len(got) == n_expected and n_expected > 0


def test_adx_matches_python(spark):
    from ex_hivent_spark.operators.finance import _ADX_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_adx"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        dmp, dmm, trs, hours = [], [], [], []
        for i in range(1, len(series)):
            h, c, hi, lo = series[i]
            _, pc, ph, pl = series[i - 1]
            up, dn = hi - ph, pl - lo
            dmp.append(up if up > dn and up > 0 else 0.0)
            dmm.append(dn if dn > up and dn > 0 else 0.0)
            trs.append(max(hi - lo, abs(hi - pc), abs(lo - pc)))
            hours.append(h)
        dx_series: list[tuple[int, float, float, float]] = []
        for j in range(len(hours)):
            if j + 1 < _ADX_WIN:
                continue
            sp = math.fsum(dmp[j - _ADX_WIN + 1 : j + 1])
            sm = math.fsum(dmm[j - _ADX_WIN + 1 : j + 1])
            st = math.fsum(trs[j - _ADX_WIN + 1 : j + 1])
            dip = _e6(0.0 if st == 0 else 100.0 * sp / st)
            dim = _e6(0.0 if st == 0 else 100.0 * sm / st)
            dx = _e6(
                0.0
                if dip + dim == 0
                else 100.0 * abs(dip - dim) / (dip + dim)
            )
            dx_series.append((hours[j], dip, dim, dx))
        for k in range(len(dx_series)):
            if k + 1 < _ADX_WIN:
                continue
            h, dip, dim, dx = dx_series[k]
            adx = _e6(
                math.fsum(
                    d for _, _, _, d in dx_series[k - _ADX_WIN + 1 : k + 1]
                )
                / _ADX_WIN
            )
            n_expected += 1
            row = got[(t, h)]
            assert row["di_plus"] == pytest.approx(dip, abs=1e-6)
            assert row["di_minus"] == pytest.approx(dim, abs=1e-6)
            assert row["dx"] == pytest.approx(dx, abs=1e-6)
            assert row["adx14"] == pytest.approx(adx, abs=1e-6)
    assert len(got) == n_expected and n_expected > 0


def test_elder_ray_matches_python(spark):
    from ex_hivent_spark.operators.finance import _ER_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_elder_ray"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        closes = [c for _, c, _, _ in series]
        for i in range(len(series)):
            if i + 1 < _ER_WIN:
                continue
            sma = math.fsum(closes[i - _ER_WIN + 1 : i + 1]) / _ER_WIN
            h, c, hi, lo = series[i]
            n_expected += 1
            row = got[(t, h)]
            assert row["sma13"] == pytest.approx(sma, abs=1e-6)
            assert row["bull_power"] == pytest.approx(hi - sma, abs=1e-6)
            assert row["bear_power"] == pytest.approx(lo - sma, abs=1e-6)
    assert len(got) == n_expected and n_expected > 0


def test_vortex_matches_python(spark):
    from ex_hivent_spark.operators.finance import _VTX_WIN

    bars = _bars()
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_vortex"].spark(spark, SF_DIR).collect()
    }
    n_expected = 0
    for t, series in bars.items():
        vmp, vmm, trs, hours = [], [], [], []
        for i in range(1, len(series)):
            h, c, hi, lo = series[i]
            _, pc, ph, pl = series[i - 1]
            vmp.append(abs(hi - pl))
            vmm.append(abs(lo - ph))
            trs.append(max(hi - lo, abs(hi - pc), abs(lo - pc)))
            hours.append(h)
        for j in range(len(hours)):
            if j + 1 < _VTX_WIN:
                continue
            svp = math.fsum(vmp[j - _VTX_WIN + 1 : j + 1])
            svm = math.fsum(vmm[j - _VTX_WIN + 1 : j + 1])
            st = math.fsum(trs[j - _VTX_WIN + 1 : j + 1])
            vip = 0.0 if st == 0 else svp / st
            vim = 0.0 if st == 0 else svm / st
            n_expected += 1
            row = got[(t, hours[j])]
            assert row["vi_plus"] == pytest.approx(vip, abs=1e-6)
            assert row["vi_minus"] == pytest.approx(vim, abs=1e-6)
            assert row["vi_diff"] == pytest.approx(vip - vim, abs=1e-6)
    assert len(got) == n_expected and n_expected > 0
