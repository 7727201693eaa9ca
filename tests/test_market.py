"""Commerce-graph / basket analytics (operators/market.py): pin the
SEMANTICS with independent plain-Python implementations over the real
sf0.001 tables — edge lists by set comprehension, HITS half-steps by
dict folds, ABC by explicit sort, percentiles by sorted-list picks."""

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


def _lineitem():
    return pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    ).to_pylist()


def test_hits_step_matches_python(spark):
    li = _lineitem()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in pq.read_table(
            f"{SF_DIR}/orders.parquet",
            columns=["o_orderkey", "o_custkey"],
        ).to_pylist()
    }
    edges = {(orders[r["l_orderkey"]], r["l_partkey"]) for r in li}
    auth1 = Counter(p for _, p in edges)
    hub1: Counter = Counter()
    for c, p in edges:
        hub1[c] += auth1[p]
    auth2: Counter = Counter()
    for c, p in edges:
        auth2[p] += hub1[c]
    nn = _e6(math.sqrt(math.fsum(float(v) * v for v in auth2.values())))
    want = sorted(auth2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = SPECS["q_graph_hits_step"].spark(spark, SF_DIR).collect()
    assert [(r["partkey"], r["auth_score"]) for r in got] == want
    for r in got:
        assert r["in_degree"] == auth1[r["partkey"]]
        assert r["auth_norm"] == pytest.approx(
            _e6(r["auth_score"] / nn), abs=1e-9
        )


def test_copurchase_suppliers_matches_python(spark):
    li = _lineitem()
    sp = {(r["l_suppkey"], r["l_partkey"]) for r in li}
    deg = Counter(s for s, _ in sp)
    byp: dict = defaultdict(list)
    for s, p in sp:
        byp[p].append(s)
    common: Counter = Counter()
    for p, ss in byp.items():
        ss.sort()
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                common[(ss[i], ss[j])] += 1
    want = sorted(common.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = SPECS["q_graph_copurchase_suppliers"].spark(
        spark, SF_DIR
    ).collect()
    assert [((r["s_a"], r["s_b"]), r["common_parts"]) for r in got] == want
    for r in got:
        da, db = deg[r["s_a"]], deg[r["s_b"]]
        assert r["deg_a"] == da and r["deg_b"] == db
        assert r["jaccard"] == pytest.approx(
            _e6(r["common_parts"] / (da + db - r["common_parts"])),
            abs=1e-9,
        )


def test_basket_part_pairs_matches_python(spark):
    li = _lineitem()
    op = {(r["l_orderkey"], r["l_partkey"]) for r in li}
    supp = Counter(p for _, p in op)
    n_orders = len({o for o, _ in op})
    byo: dict = defaultdict(list)
    for o, p in op:
        byo[o].append(p)
    both: Counter = Counter()
    for o, ps in byo.items():
        ps.sort()
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                both[(ps[i], ps[j])] += 1
    cand = [
        (pa, pb, c, _e6(n_orders * c / (supp[pa] * supp[pb])))
        for (pa, pb), c in both.items()
        if c >= 2
    ]
    cand.sort(key=lambda t: (-t[3], t[0], t[1]))
    want = cand[:40]
    got = SPECS["q_basket_part_pairs"].spark(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r, (pa, pb, c, lift) in zip(got, want):
        assert (r["part_a"], r["part_b"], r["n_both"]) == (pa, pb, c)
        assert r["n_orders_a"] == supp[pa]
        assert r["n_orders_b"] == supp[pb]
        assert r["lift"] == pytest.approx(lift, abs=1e-9)
        # lift above independence for the surviving head is typical
        # but not guaranteed; just pin non-negativity
        assert r["lift"] >= 0.0


def test_abc_classification_matches_python(spark):
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).to_pylist()
    rev: Counter = Counter()
    for r in li:
        rev[r["l_partkey"]] += int(
            math.floor(
                r["l_extendedprice"] * (1 - r["l_discount"]) * 100.0 + 0.5
            )
        )
    t = sum(rev.values())
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    agg: dict = defaultdict(lambda: [0, 0])
    for p, c in ranked:
        cum += c
        cls = "A" if cum * 10 <= t * 7 else ("B" if cum * 10 <= t * 9 else "C")
        agg[cls][0] += 1
        agg[cls][1] += c
    got = {
        r["abc_class"]: r
        for r in SPECS["q_agg_abc_classification"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(agg)
    for cls, (n, c) in agg.items():
        assert got[cls]["n_parts"] == n
        assert got[cls]["revenue_cents"] == c
        assert got[cls]["rev_share"] == pytest.approx(
            _e6(c / t), abs=1e-9
        )
    # classes partition the catalog; shares stack to ~70/20/10 caps
    assert sum(v[0] for v in agg.values()) == len(rev)
    if "A" in agg:
        assert agg["A"][1] * 10 <= t * 7


def test_order_gap_stats_matches_python(spark):
    orows = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).to_pylist()
    byc: dict = defaultdict(list)
    for r in orows:
        byc[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    gaps = []
    n_multi = 0
    for c, os_ in byc.items():
        os_.sort()
        if len(os_) >= 2:
            n_multi += 1
        for i in range(1, len(os_)):
            gaps.append(
                (os_[i][0].date() - os_[i - 1][0].date()).days
            )
    gaps.sort()
    n = len(gaps)

    def pick(q_num, q_den):
        # min gap whose cumulative count satisfies den*cum >= num*n
        cum = 0
        cnt = Counter(gaps)
        for g in sorted(cnt):
            cum += cnt[g]
            if cum * q_den >= q_num * n:
                return g
        return gaps[-1]

    row = SPECS["q_agg_order_gap_stats"].spark(spark, SF_DIR).collect()[0]
    assert row["n_customers_multi"] == n_multi
    assert row["n_gaps"] == n
    assert row["mean_gap_days"] == pytest.approx(
        _e6(sum(gaps) / n), abs=1e-9
    )
    assert row["p50_gap_days"] == pick(1, 2)
    assert row["p90_gap_days"] == pick(9, 10)
    assert row["max_gap_days"] == gaps[-1]
    assert row["p50_gap_days"] <= row["p90_gap_days"] <= row["max_gap_days"]


def test_mix_rate_decomp_matches_python(spark):
    import pyarrow.parquet as _pq
    from collections import defaultdict as _dd

    from ex_hivent_spark.operators.market import _DECOMP_Y1, _DECOMP_Y2

    rows = _pq.read_table(f"{SF_DIR}/orders.parquet").to_pylist()
    agg: dict = _dd(lambda: [0, 0.0, 0, 0.0])
    for r in rows:
        y = r["o_orderdate"].year
        seg = r["o_orderpriority"]
        if y == _DECOMP_Y1:
            agg[seg][0] += 1
            agg[seg][1] += r["o_totalprice"]
        elif y == _DECOMP_Y2:
            agg[seg][2] += 1
            agg[seg][3] += r["o_totalprice"]
    got = {
        r["segment"]: r
        for r in SPECS["q_agg_mix_rate_decomp"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for seg, (n1, rev1, n2, rev2) in agg.items():
        row = got[seg]
        r1 = _e6(rev1 / n1) if n1 else 0.0
        r2 = _e6(rev2 / n2) if n2 else 0.0
        delta = _e6(rev2 - rev1)
        vol = _e6((n2 - n1) * (r1 + r2) / 2.0)
        rate = _e6((n1 + n2) / 2.0 * (r2 - r1))
        assert (row["n1"], row["n2"]) == (n1, n2)
        assert row["r1"] == pytest.approx(r1, abs=2e-6)
        assert row["r2"] == pytest.approx(r2, abs=2e-6)
        assert row["delta_rev"] == pytest.approx(delta, abs=2e-5)
        assert row["volume_effect"] == pytest.approx(vol, abs=2e-4)
        assert row["rate_effect"] == pytest.approx(rate, abs=2e-4)
        # the Bennet identity closes up to rounding slack
        assert abs(row["recon_residual"]) < 0.01
