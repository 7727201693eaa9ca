"""Rich club + price realization (operators/market.py), user lifespan
(operators/convert.py), weekend effect (operators/tsdiag.py) and the
Kaufman efficiency ratio (operators/momentum.py): pin the SEMANTICS
with independent plain-Python implementations over the real sf0.001
parquet."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.market import _RC_KS
from ex_hivent_spark.operators.momentum import _ER_WIN
from ex_hivent_spark.operators.tsdiag import _EPOCH_DAY, _EPOCH_H, _N_HOURS
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_rich_club_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    sp = {(r["l_suppkey"], r["l_partkey"]) for r in li}
    by_p: dict = defaultdict(set)
    for s, p in sp:
        by_p[p].add(s)
    edges = set()
    for ss in by_p.values():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                edges.add((ss[i], ss[j]))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {
        r["k_threshold"]: r
        for r in SPECS["q_graph_rich_club"].spark(spark, SF_DIR).collect()
    }
    for k in _RC_KS:
        nodes = {s for s, d in deg.items() if d > k}
        if len(nodes) < 2:
            assert k not in got
            continue
        ek = sum(1 for a, b in edges if a in nodes and b in nodes)
        row = got[k]
        assert row["n_nodes"] == len(nodes)
        assert row["n_edges"] == ek
        assert row["phi"] == pytest.approx(
            _e6(2.0 * ek / (len(nodes) * (len(nodes) - 1))), abs=2e-6
        )
        assert 0.0 <= row["phi"] <= 1.000001


def test_price_realization_matches_python(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    parts = {
        p["p_partkey"]: p
        for p in pq.read_table(f"{SF_DIR}/part.parquet").to_pylist()
    }
    agg: dict = defaultdict(lambda: [0, 0.0, 0.0])
    for r in li:
        p = parts[r["l_partkey"]]
        a = agg[p["p_brand"]]
        a[0] += 1
        a[1] += p["p_retailprice"]
        a[2] += _e6(
            r["l_extendedprice"] / r["l_quantity"] * (1.0 - r["l_discount"])
        )
    got = {
        r["p_brand"]: r
        for r in SPECS["q_agg_price_realization"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(agg)
    for brand, (n, sl, sr) in agg.items():
        row = got[brand]
        assert row["n_lines"] == n
        assert row["list_mean"] == pytest.approx(_e6(sl / n), abs=2e-6)
        assert row["realized_mean"] == pytest.approx(_e6(sr / n), abs=2e-6)
        assert row["realization"] == pytest.approx(
            _e6((sr / n) / (sl / n)), abs=4e-6
        )


def test_user_lifespan_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    spans: dict = {}
    for r in rows:
        t = round(r["ts"].timestamp() * 1e6)
        u = r["user_id"]
        lo, hi = spans.get(u, (t, t))
        spans[u] = (min(lo, t), max(hi, t))
    ds = sorted(hi - lo for lo, hi in spans.values())
    n = len(ds)
    med = (ds[(n + 1) // 2 - 1] + ds[n // 2]) / 2.0
    row = SPECS["q_seq_user_lifespan"].spark(spark, SF_DIR).collect()[0]
    assert row["n_users"] == n
    assert row["n_single_moment"] == sum(1 for d in ds if d == 0)
    assert row["mean_lifespan_days"] == pytest.approx(
        _e6(sum(ds) / n / 86400e6), abs=2e-6
    )
    assert row["median_lifespan_days"] == pytest.approx(
        _e6(med / 86400e6), abs=2e-6
    )


def test_weekend_effect_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cnt = Counter(int(r["ts"].timestamp() // 3600) for r in rows)
    wd, we = [], []
    for i in range(_N_HOURS):
        h = _EPOCH_H + i
        dow = (h // 24 - _EPOCH_DAY) % 7
        (we if dow in (5, 6) else wd).append(cnt.get(h, 0))
    row = SPECS["q_ts_weekend_effect"].spark(spark, SF_DIR).collect()[0]
    assert row["n_weekday_hours"] == len(wd)
    assert row["n_weekend_hours"] == len(we)
    mwd, mwe = sum(wd) / len(wd), sum(we) / len(we)
    assert row["weekday_mean"] == pytest.approx(_e6(mwd), abs=2e-6)
    assert row["weekend_mean"] == pytest.approx(_e6(mwe), abs=2e-6)
    assert row["diff"] == pytest.approx(_e6(mwe - mwd), abs=2e-6)

    def svar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    z = (mwe - mwd) / math.sqrt(svar(we) / len(we) + svar(wd) / len(wd))
    assert row["welch_z"] == pytest.approx(_e6(z), abs=4e-6)
    # January 2024: 8 weekend days x 24 hours.
    assert len(we) == 8 * 24


def test_efficiency_ratio_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    closes: dict = defaultdict(list)
    hours: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        closes[t].append(evs[-1]["value"])
        hours[t].append(h)
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_efficiency_ratio"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, cs in closes.items():
        steps = [
            _e6(abs(cs[i] - cs[i - 1])) for i in range(1, len(cs))
        ]
        for i in range(_ER_WIN, len(cs)):
            path = math.fsum(steps[i - _ER_WIN : i])
            net = _e6(abs(cs[i] - cs[i - _ER_WIN]))
            row = got[(t, hours[t][i])]
            assert row["net_move"] == pytest.approx(net, abs=2e-6)
            assert row["path_len"] == pytest.approx(_e6(path), abs=2e-6)
            if path == 0:
                assert row["er10"] is None
            else:
                assert row["er10"] == pytest.approx(
                    _e6(net / path), abs=4e-6
                )
                assert 0.0 <= row["er10"] <= 1.000001
            n += 1
    assert n == len(got) and n > 0
