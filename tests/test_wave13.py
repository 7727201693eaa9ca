"""Vocabulary Gini (llm/lexsignals.py), Fano factor (operators/
tsdiag.py), volume profile (operators/finance.py) and TD Sequential
setup census (operators/finance.py): pin the SEMANTICS with
independent plain-Python implementations over the real sf0.001
parquet."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.finance import (
    _TD_LAG,
    _TD_LEN,
    _VP_BUCKET,
)
from ex_hivent_spark.operators.tsdiag import _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_vocab_gini_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    tf: dict = defaultdict(Counter)
    for d in docs:
        tf[d["source"]].update(d["text"].split(" "))
    got = {
        r["source"]: r
        for r in SPECS["q_llm_vocab_gini"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(tf)
    for src, c in tf.items():
        items = sorted(c.items(), key=lambda kv: (kv[1], kv[0]))
        v = len(items)
        t = sum(m for _tok, m in items)
        s = sum((i + 1) * m for i, (_tok, m) in enumerate(items))
        gini = (2.0 * s - (v + 1.0) * t) / (v * t)
        row = got[src]
        assert row["vocab"] == v and row["n_tokens"] == t
        assert row["gini"] == pytest.approx(_e6(gini), abs=2e-6)
        assert 0.0 <= row["gini"] <= 1.0


def test_fano_factor_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(
        (r["event_type"], int(r["ts"].timestamp() // 3600)) for r in rows
    )
    per_type: dict = defaultdict(list)
    for (t, _h), n in cnt.items():
        per_type[t].append(n)
    got = {
        r["event_type"]: r
        for r in SPECS["q_ts_fano_factor"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_type)
    for t, ys in per_type.items():
        sy = sum(ys)
        syy = sum(y * y for y in ys)
        mean = sy / _N_HOURS
        var = (_N_HOURS * syy - sy * sy) / (_N_HOURS * (_N_HOURS - 1))
        row = got[t]
        assert row["n_events"] == sy
        assert row["mean_per_hour"] == pytest.approx(_e6(mean), abs=2e-6)
        assert row["var_per_hour"] == pytest.approx(_e6(var), abs=2e-6)
        assert row["fano"] == pytest.approx(_e6(var / mean), abs=4e-6)
        assert row["cv2"] == pytest.approx(
            _e6(var / (mean * mean)), abs=4e-6
        )


def test_volume_profile_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(
        (r["event_type"], math.floor(r["value"] / _VP_BUCKET))
        for r in rows
    )
    totals = Counter()
    for (t, _b), n in cnt.items():
        totals[t] += n
    poc = {}
    for (t, b), n in cnt.items():
        best = poc.get(t)
        if best is None or n > best[1] or (n == best[1] and b < best[0]):
            poc[t] = (b, n)
    got = {
        (r["event_type"], r["bucket"]): r
        for r in SPECS["q_win_volume_profile"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(cnt)
    for (t, b), n in cnt.items():
        row = got[(t, b)]
        assert row["n_events"] == n
        assert row["share"] == pytest.approx(_e6(n / totals[t]), abs=2e-6)
        assert row["is_poc"] == int(poc[t][0] == b)


def test_td_setup_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        byk[(r["event_type"], int(r["ts"].timestamp() // 3600))].append(r)
    closes: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        closes[t].append(evs[-1]["value"])
    got = {
        r["event_type"]: r
        for r in SPECS["q_win_td_setup"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(closes)
    for t, cs in closes.items():
        nb = ns = 0
        buy = sell = 0
        mb = ms = 0
        for i, c in enumerate(cs):
            fb = i >= _TD_LAG and c < cs[i - _TD_LAG]
            fs = i >= _TD_LAG and c > cs[i - _TD_LAG]
            buy = buy + 1 if fb else 0
            sell = sell + 1 if fs else 0
            mb, ms = max(mb, buy), max(ms, sell)
            if buy > 0 and buy % _TD_LEN == 0:
                nb += 1
            if sell > 0 and sell % _TD_LEN == 0:
                ns += 1
        row = got[t]
        assert row["n_buy_setups"] == nb
        assert row["n_sell_setups"] == ns
        assert row["max_buy_streak"] == mb
        assert row["max_sell_streak"] == ms
