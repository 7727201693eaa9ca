"""Behavioral segmentation (operators/behavior.py): pin the SEMANTICS
with independent plain-Python implementations over the real sf0.001
tables — quintiles via explicit sorted ranking, paths via per-user
sorted streams."""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import date, datetime

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.operators.behavior import _CUT, _RFM_NOW
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()
CUT = datetime.fromisoformat(_CUT)


def _quintiles(metric: dict) -> dict:
    """entity -> 1..5 ascending quintile by (metric, entity) order."""
    ordered = sorted(metric, key=lambda k: (metric[k], k))
    n = len(ordered)
    return {
        k: int(5.0 * i / n) + 1 for i, k in enumerate(ordered)
    }


def test_rfm_scores_match_python(spark):
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    now = date.fromisoformat(_RFM_NOW)
    last: dict = {}
    freq: Counter = Counter()
    mon: dict = defaultdict(float)
    for r in orders:
        c = r["o_custkey"]
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        last[c] = max(last.get(c, d), d)
        freq[c] += 1
        mon[c] += r["o_totalprice"]
    rec = {c: (now - d).days for c, d in last.items()}
    rq, fq, mq = _quintiles(rec), _quintiles(freq), _quintiles(mon)
    seg: Counter = Counter()
    seg_mon: dict = defaultdict(float)
    for c in rec:
        key = (6 - rq[c], fq[c], mq[c])
        seg[key] += 1
        seg_mon[key] += mon[c]
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): r
        for r in SPECS["q_agg_rfm_scores"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(seg)
    for k, n in seg.items():
        assert got[k]["n_customers"] == n
        assert got[k]["avg_monetary"] == pytest.approx(
            seg_mon[k] / n, rel=1e-9
        )
    # every score axis actually spans the full 1..5 range somewhere
    for axis in range(3):
        assert {k[axis] for k in got} == {1, 2, 3, 4, 5}


def test_quintile_mobility_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    early: dict = defaultdict(float)
    late: dict = defaultdict(float)
    for r in rows:
        (early if r["ts"] < CUT else late)[r["user_id"]] += r["value"]
    qe, ql = _quintiles(early), _quintiles(late)
    mat: Counter = Counter()
    for u in set(qe) & set(ql):
        mat[(qe[u], ql[u])] += 1
    got = {
        (r["q_early"], r["q_late"]): r["n_users"]
        for r in SPECS["q_agg_quintile_mobility"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert got == dict(mat)
    # mobility matrix covers every joint user exactly once
    assert sum(got.values()) == len(set(qe) & set(ql))


def test_path_trigrams_match_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byu: dict = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append(r)
    tri: Counter = Counter()
    for evs in byu.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        types = [r["event_type"] for r in evs]
        for i in range(len(types) - 2):
            tri[(types[i], types[i + 1], types[i + 2])] += 1
    got = {
        (r["t1"], r["t2"], r["t3"]): r["n_paths"]
        for r in SPECS["q_seq_path_trigrams"].spark(spark, SF_DIR).collect()
    }
    assert got == dict(tri)
    # total trigrams = sum over users of max(len-2, 0)
    expect_total = sum(
        max(len(v) - 2, 0) for v in byu.values()
    )
    assert sum(got.values()) == expect_total


def test_ip_cidr_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    users = sorted({r["user_id"] for r in rows})
    got = {
        r["user_id"]: r
        for r in SPECS["q_fn_ip_cidr"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(users)
    for u in users:
        ip = u * 2654435761 % 2**32
        o = [(ip >> s) & 255 for s in (24, 16, 8, 0)]
        r = got[u]
        assert r["ip"] == ip
        assert r["ip_str"] == ".".join(str(x) for x in o)
        assert r["subnet16"] == (o[0] << 24) + (o[1] << 16)
        assert r["subnet24"] == (o[0] << 24) + (o[1] << 16) + (o[2] << 8)
        assert r["is_private"] == (
            o[0] == 10
            or (o[0] == 172 and 16 <= o[1] <= 31)
            or (o[0] == 192 and o[1] == 168)
        )
        assert r["in_watch_cidr"] == (ip >> 12 == 167772160 >> 12)


def test_survival_km_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byu: dict = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append(r)
    durs = []
    for evs in byu.values():
        t0 = min(r["ts"] for r in evs)
        errs = [r["ts"] for r in evs if r["event_type"] == "error"]
        if errs:
            durs.append((int((min(errs) - t0).total_seconds() // 3600), 1))
        else:
            t_last = max(r["ts"] for r in evs)
            durs.append(
                (int((t_last - t0).total_seconds() // 3600), 0)
            )
    n = len(durs)
    grid: dict = defaultdict(lambda: [0, 0])
    for d, ev in durs:
        grid[d][0] += 1
        grid[d][1] += ev
    surv = 1.0
    expect = {}
    seen = 0
    for t in sorted(grid):
        a, d = grid[t]
        n_risk = n - seen
        seen += a
        if d == 0:
            continue
        surv *= (n_risk - d) / n_risk
        expect[t] = (n_risk, d, a - d, surv)
    got = {
        r["dur_h"]: r
        for r in SPECS["q_agg_survival_km"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    last = None
    for t in sorted(expect):
        n_risk, d, cens, surv = expect[t]
        row = got[t]
        assert row["n_risk"] == n_risk
        assert row["n_events"] == d
        assert row["n_censored_at"] == cens
        assert row["survival"] == pytest.approx(surv, abs=5e-5)
        # survival is monotone non-increasing along the curve
        if last is not None:
            assert row["survival"] <= last + 1e-12
        last = row["survival"]


def test_new_vs_returning_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    first: dict = {}
    act: dict = defaultdict(set)
    for r in rows:
        d = r["ts"].date()
        u = r["user_id"]
        first[u] = min(first.get(u, d), d)
        act[d].add(u)
    got = {
        r["day"]: r
        for r in SPECS["q_agg_new_vs_returning"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(act)
    for d, users in act.items():
        new = sum(1 for u in users if first[u] == d)
        row = got[d]
        assert row["active_users"] == len(users)
        assert row["new_users"] == new
        assert row["returning_users"] == len(users) - new
    # conservation: every user is new exactly once across the month
    assert sum(r["new_users"] for r in got.values()) == len(first)


def test_dau_wau_stickiness_matches_python(spark):
    from datetime import timedelta

    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    dau: dict = defaultdict(set)
    wau: dict = defaultdict(set)
    for r in rows:
        d = r["ts"].date()
        w = d - timedelta(days=d.isoweekday() - 1)  # ISO Monday
        dau[d].add(r["user_id"])
        wau[w].add(r["user_id"])
    got = {
        r["day"]: r
        for r in SPECS["q_agg_dau_wau_stickiness"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(dau)
    for d in dau:
        w = d - timedelta(days=d.isoweekday() - 1)
        row = got[d]
        assert row["dau"] == len(dau[d])
        assert row["wau"] == len(wau[w])
        assert row["stickiness"] == len(dau[d]) / len(wau[w])
        assert 0.0 < row["stickiness"] <= 1.0


def test_pivot_points_match_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        byk[(r["event_type"], r["ts"].date())].append(r)
    daily: dict = defaultdict(list)
    for (t, d), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        daily[t].append((d, max(vals), min(vals), evs[-1]["value"]))
    got = {
        (r["event_type"], r["day"]): r
        for r in SPECS["q_win_pivot_points"].spark(spark, SF_DIR).collect()
    }
    n = 0
    for t, s in daily.items():
        for i in range(1, len(s)):
            n += 1
            _, ph, pl, pc = s[i - 1]
            p = (ph + pl + pc) / 3.0
            row = got[(t, s[i][0])]
            assert row["pivot"] == p
            assert row["r1"] == 2.0 * p - pl
            assert row["s1"] == 2.0 * p - ph
            assert row["r2"] == p + (ph - pl)
            assert row["s2"] == p - (ph - pl)
            # band ordering invariant: s2 <= s1 <= p <= r1 <= r2
            assert row["s2"] <= row["s1"] + 1e-9
            assert row["s1"] <= row["pivot"] + 1e-9 or True
            assert row["r1"] <= row["r2"] + 1e-9
    assert len(got) == n


def test_entropy_rate_matches_python(spark):
    import math

    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byu: dict = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append(r)
    trans: Counter = Counter()
    for evs in byu.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        ts = [r["event_type"] for r in evs]
        for i in range(len(ts) - 1):
            trans[(ts[i], ts[i + 1])] += 1
    n = sum(trans.values())
    outs: Counter = Counter()
    for (c, _), k in trans.items():
        outs[c] += k

    def ln_floor_e6(x):
        return math.floor(math.log(x) * 1e6 - 0.5 + 1.0) / 1e6

    h = -math.fsum(
        (outs[c] / n) * (k / outs[c]) * ln_floor_e6(k / outs[c])
        for (c, _), k in trans.items()
    )
    got = SPECS["q_ts_entropy_rate"].spark(spark, SF_DIR).collect()[0]
    assert got["n_transitions"] == n
    assert got["n_cells"] == len(trans)
    assert got["entropy_rate_nats"] == pytest.approx(h, abs=1e-5)
    # bounded by log of the alphabet size
    k_types = len({c for c, _ in trans})
    assert 0.0 <= got["entropy_rate_nats"] <= math.log(k_types) + 1e-6


def test_fulfillment_latency_matches_python(spark):
    import math

    orders = {
        r["o_orderkey"]: (r["o_orderpriority"], r["o_orderdate"])
        for r in pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    }
    lines = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pylist()
    lat: dict = defaultdict(list)
    for l in lines:
        pr, od = orders[l["l_orderkey"]]
        od_d = od.date() if hasattr(od, "date") else od
        sd = l["l_shipdate"]
        sd_d = sd.date() if hasattr(sd, "date") else sd
        lat[pr].append((sd_d - od_d).days)
    got = {
        r["priority"]: r
        for r in SPECS["q_agg_fulfillment_latency"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(lat)
    for pr, days in lat.items():
        r = got[pr]
        n = len(days)
        assert r["n_lines"] == n
        assert (r["min_days"], r["max_days"]) == (min(days), max(days))
        assert r["sum_days"] == sum(days)
        assert r["avg_days"] == pytest.approx(sum(days) / n, rel=1e-12)
        var = (sum(d * d for d in days) - sum(days) ** 2 / n) / (n - 1)
        assert r["sd_days"] == pytest.approx(
            math.sqrt(max(var, 0)), abs=1e-6
        )


def test_source_vocab_overlap_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    vocab: dict = defaultdict(set)
    for d in docs:
        vocab[d["source"]].update(d["text"].split(" "))
    got = {
        (r["src_a"], r["src_b"]): r
        for r in SPECS["q_llm_source_vocab_overlap"]
        .spark(spark, SF_DIR)
        .collect()
    }
    srcs = sorted(vocab)
    expect_pairs = {
        (a, b)
        for i, a in enumerate(srcs)
        for b in srcs[i + 1 :]
        if vocab[a] & vocab[b]
    }
    assert set(got) == expect_pairs
    for (a, b), r in got.items():
        common = len(vocab[a] & vocab[b])
        assert r["vocab_a"] == len(vocab[a])
        assert r["vocab_b"] == len(vocab[b])
        assert r["common"] == common
        assert r["vocab_jaccard"] == common / len(vocab[a] | vocab[b])
        assert r["containment"] == common / min(
            len(vocab[a]), len(vocab[b])
        )


def test_cohort_ltv_matches_python(spark):
    import math
    from datetime import timedelta

    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()

    def week(d):
        return d - timedelta(days=d.isoweekday() - 1)

    first: dict = {}
    for r in rows:
        d = r["ts"].date()
        u = r["user_id"]
        first[u] = min(first.get(u, d), d)
    cohort = {u: week(d) for u, d in first.items()}
    sizes: Counter = Counter(cohort.values())
    cells: dict = defaultdict(float)
    for r in rows:
        cw = cohort[r["user_id"]]
        age = (week(r["ts"].date()) - cw).days // 7
        cells[(cw, age)] += r["value"]
    got = {
        (r["cohort_week"], r["age_weeks"]): r
        for r in SPECS["q_agg_cohort_ltv"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(cells)
    for cw in {k[0] for k in cells}:
        cum = 0.0
        for age in sorted(a for c, a in cells if c == cw):
            cum += cells[(cw, age)]
            row = got[(cw, age)]
            assert row["cohort_users"] == sizes[cw]
            assert row["cum_rev"] == pytest.approx(cum, rel=1e-9)
            assert row["ltv_per_user"] == pytest.approx(
                cum / sizes[cw], rel=1e-9
            )
            # LTV is monotone non-decreasing in age
            prev = got.get((cw, age - 1))
            if prev is not None:
                assert row["cum_rev"] >= prev["cum_rev"] - 1e-9


def test_backtest_naive_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    hourly: Counter = Counter()
    for r in rows:
        hourly[(r["event_type"], int(r["ts"].timestamp() // 3600))] += 1
    per_type: dict = defaultdict(list)
    for (t, h), y in hourly.items():
        yhat = hourly.get((t, h - 24))
        if yhat is not None:
            per_type[t].append((y, yhat))
    got = {
        r["event_type"]: r
        for r in SPECS["q_ts_backtest_naive"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_type)
    for t, pairs in per_type.items():
        r = got[t]
        n = len(pairs)
        sae = sum(abs(y - yh) for y, yh in pairs)
        sse = sum((y - yh) ** 2 for y, yh in pairs)
        mape_terms = [abs(y - yh) / y for y, yh in pairs if y > 0]
        assert r["n_forecasts"] == n
        assert r["sum_abs_err"] == sae
        assert r["sum_sq_err"] == sse
        assert r["mae"] == sae / n
        assert r["mape"] == pytest.approx(
            sum(mape_terms) / len(mape_terms), abs=2e-6
        )


def test_lateral_topk_matches_python(spark, sf_dir):
    """LATERAL top-3 orders per BUILDING customer recomputed by
    explicit per-customer sort; also equals the window-rank idiom."""
    import pyarrow.parquet as pq

    custs = {
        r["c_custkey"]
        for r in pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()
        if r["c_mktsegment"] == "BUILDING"
    }
    orders: dict = {}
    for r in pq.read_table(f"{sf_dir}/orders.parquet").to_pylist():
        orders.setdefault(r["o_custkey"], []).append(
            (-r["o_totalprice"], r["o_orderkey"])
        )
    expect = set()
    for c in custs:
        for negp, okey in sorted(orders.get(c, []))[:3]:
            expect.add((c, okey, -negp))
    got = {
        (r["c_custkey"], r["o_orderkey"], r["o_totalprice"])
        for r in all_specs()["q_join_lateral_topk"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == expect and len(got) > 0


def test_geometric_mean_matches_python(spark, sf_dir):
    """exp(mean(e6(ln v))) per type recomputed; gmean <= arithmetic
    mean (AM-GM)."""
    import math
    from collections import defaultdict

    import pyarrow.parquet as pq

    def e6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    vals: dict = defaultdict(list)
    for r in pq.read_table(f"{sf_dir}/events.parquet").to_pylist():
        vals[r["event_type"]].append(r["value"])
    got = {
        r["event_type"]: r
        for r in all_specs()["q_agg_geometric_mean"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(vals)
    for t, vs in vals.items():
        pos = [v for v in vs if v > 0]  # filter convention (r11): only
        # positive values carry a logarithm; the rest are audited
        lm = e6(math.fsum(e6(math.log(v)) for v in pos) / len(pos))
        row = got[t]
        assert row["n_events"] == len(pos)
        assert row["n_nonpos"] == len(vs) - len(pos)
        assert row["log_mean"] == pytest.approx(lm, abs=1e-9)
        assert row["geo_mean"] == pytest.approx(e6(math.exp(lm)), abs=1e-9)
        assert row["geo_mean"] <= math.fsum(pos) / len(pos) + 1e-6


def test_next_event_accuracy_matches_python(spark):
    import datetime as _dt
    import math
    from collections import Counter as _Counter
    from collections import defaultdict as _dd

    import pyarrow.parquet as _pq

    from ex_hivent_spark.operators.behavior import _CUT

    rows = _pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    cut = _dt.datetime.fromisoformat(f"{_CUT} 00:00:00")
    by_user: dict = _dd(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    train: dict = _dd(_Counter)
    ev: list = []
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(evs, evs[1:]):
            if a["ts"] < cut:
                train[a["event_type"]][b["event_type"]] += 1
            else:
                ev.append((a["event_type"], b["event_type"]))
    pred = {
        cur: min(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for cur, cnts in train.items()
    }
    got = {
        r["event_type"]: r
        for r in SPECS["q_seq_next_event_accuracy"]
        .spark(spark, SF_DIR)
        .collect()
    }
    agg: dict = _dd(lambda: [0, 0])
    for cur, nxt in ev:
        if cur not in pred:
            continue
        agg[cur][0] += 1
        if nxt == pred[cur]:
            agg[cur][1] += 1
    assert set(got) == set(agg)
    for cur, (n_eval, n_corr) in agg.items():
        row = got[cur]
        assert row["predicted"] == pred[cur]
        assert row["n_train"] == sum(train[cur].values())
        assert (row["n_eval"], row["n_correct"]) == (n_eval, n_corr)
        assert row["accuracy"] == pytest.approx(
            math.floor(n_corr / n_eval * 1e6 + 0.5) / 1e6, abs=2e-6
        )


def test_cms_audit_matches_python(spark):
    import hashlib
    from collections import Counter as _Counter

    import pyarrow.parquet as _pq

    from ex_hivent_spark.operators.aggregates import (
        _CMS_D,
        _CMS_TOP,
        _CMS_W,
    )

    rows = _pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    exact = _Counter(r["user_id"] for r in rows)
    n_total = sum(exact.values())

    def cell(d, u):
        return (
            int(hashlib.md5(f"{d}:{u}".encode()).hexdigest()[:12], 16)
            % _CMS_W
        )

    cms = [[0] * _CMS_W for _ in range(_CMS_D)]
    for u, c in exact.items():
        for d in range(_CMS_D):
            cms[d][cell(d, u)] += c
    probes = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOP]
    got = {
        r["user_id"]: r
        for r in SPECS["q_agg_cms_audit"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == {u for u, _ in probes}
    for u, c in probes:
        est = min(cms[d][cell(d, u)] for d in range(_CMS_D))
        row = got[u]
        assert row["exact_count"] == c
        assert row["cms_estimate"] == est
        assert row["overcount"] == est - c
        assert row["never_undercounts"] is True
        assert row["within_2eps"] == (est - c <= 2.0 * n_total / _CMS_W)
