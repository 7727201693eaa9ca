"""Property-based tests (hypothesis) for the two subtlest engine
claims:

1. asof_join implements exactly "latest right row at-or-before each
   left row, per key" — checked against a brute-force Python reference
   on generated timestamp multisets (ties included);
2. the prefix-filtered ngram candidate generation is LOSSLESS for
   Jaccard >= 0.5 — the AllPairs/PPJoin bound — checked against the
   all-pairs computation on generated token sets.

Few examples, deliberately small shapes: each example pays a Spark
job; the value is in hypothesis finding adversarial tie/empty/boundary
cases, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _asof_case(draw):
    n_keys = draw(st.integers(1, 3))
    lefts, rights = [], []
    for k in range(n_keys):
        lts = draw(st.lists(st.integers(0, 50), min_size=0, max_size=6))
        rts = draw(st.lists(st.integers(0, 50), min_size=0, max_size=6))
        lefts += [(k, t) for t in lts]
        rights += [(k, t) for t in rts]
    return lefts, rights


@given(_asof_case())
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, case):
    from ex_hivent_spark.operators.asof import asof_join

    lefts, rights = case
    schema_l = "k long, ts long, lid long"
    schema_r = "k long, ts long, rid long"
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], schema_l
    )
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rights)], schema_r
    )
    got = {
        r.lid: (None if r.asof is None else r.asof.rid)
        for r in asof_join(left, right, by="k", right_seq="rid").collect()
    }
    assert set(got) == set(range(len(lefts)))  # every left row survives

    # brute force: per left row, right rows same key with ts <= left ts,
    # max by (ts, rid)
    rrows = [(k, t, i) for i, (k, t) in enumerate(rights)]
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, rid) for (rk, rt, rid) in rrows if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, f"lid={i}: got {got[i]} want {want}"


@st.composite
def _docs_case(draw):
    # token universe small enough to force shared shingles and ties
    n_docs = draw(st.integers(2, 6))
    docs = []
    for d in range(n_docs):
        toks = draw(st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=10))
        docs.append((d, " ".join(toks)))
    return docs


@given(_docs_case())
@settings(**_SETTINGS)
def test_prefix_filter_is_lossless(spark, case):
    """q_llm_ngram_jaccard's prefix-filtered plan must return exactly
    the pairs the naive all-pairs plan returns (same lang block)."""
    import ex_hivent_spark.llm.dedup as dedup

    df = spark.createDataFrame(
        [(i, t, "xx") for i, t in case], "doc_id long, text string, lang string"
    )
    df.createOrReplaceTempView("prop_docs")

    # run the registered implementation against this table by monkey-
    # patching the loader (the query only reads `documents`)
    orig = dedup.load_table
    orig_spread = dedup.spread_table
    try:
        dedup.load_table = lambda spark_, sf_dir_, name_: df
        dedup.spread_table = lambda spark_, sf_dir_, name_, key_: df
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup.q_llm_ngram_jaccard(spark, "ignored").collect()
        }
    finally:
        dedup.load_table = orig
        dedup.spread_table = orig_spread

    # naive all-pairs with the same shingle definition
    tokens = F.split("text", " ")
    sh = df.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(tokens) - 2, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, 3)),
            )
        ).alias("s"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.col("a.s")) + F.size(F.col("b.s")) - inter
    allpairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    want = {(r.doc_a, r.doc_b): r.jaccard for r in allpairs.collect()}
    assert got == want


@st.composite
def _interval_case(draw):
    n_users = draw(st.integers(1, 3))
    views, clicks = [], []
    for u in range(n_users):
        views += [(u, t) for t in draw(st.lists(st.integers(0, 120), max_size=5))]
        clicks += [(u, t) for t in draw(st.lists(st.integers(0, 120), max_size=5))]
    return views, clicks


@given(_interval_case())
@settings(**_SETTINGS)
def test_interval_join_matches_bruteforce(spark, case):
    """interval_join must pair exactly the (view, click) combos with
    l_ts < r_ts <= l_ts + 1h, per user — including boundary equality."""
    import datetime as dt

    from ex_hivent_spark.streaming.joins import interval_join

    views, clicks = case
    base = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return base + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(u, ts(t)) for u, t in views], "user_id long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [(u, ts(t)) for u, t in clicks], "user_id long, r_ts timestamp"
    )
    got = sorted(
        (r.user_id, r.l_ts, r.r_ts)
        for r in interval_join(left, right, watermark=None).collect()
    )
    want = sorted(
        (u, ts(lt), ts(rt))
        for (u, lt) in views
        for (cu, rt) in clicks
        if cu == u and lt < rt <= lt + 60
    )
    assert got == want


@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 1000)),
             min_size=0, max_size=30),
    st.integers(2, 8),
)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_on_generated_skew(spark, fact_rows, n_salt):
    """salted_join == plain inner join for any key distribution and any
    salt width (including duplicate fact rows and absent build keys)."""
    from ex_hivent_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(fact_rows)] or [],
        "k long, row_id long, v long",
    )
    build = spark.createDataFrame(
        [(k, k * 100) for k in range(0, 4)], "k long, payload long"
    )
    plain = sorted(
        map(repr, fact.join(build, "k").select("k", "row_id", "payload").collect())
    )
    salted = sorted(
        map(
            repr,
            salted_join(fact, build, "k", fact_unique_col="row_id")
            .select("k", "row_id", "payload")
            .collect(),
        )
    )
    assert plain == salted


@st.composite
def _nearest_case(draw):
    """Per-user purchase/click integer timestamps, ids globally unique."""
    n_keys = draw(st.integers(1, 2))
    purchases, clicks = [], []
    eid = 0
    for k in range(n_keys):
        for t in draw(st.lists(st.integers(0, 30), min_size=1, max_size=5)):
            purchases.append((eid, k, t))
            eid += 1
        for t in draw(st.lists(st.integers(0, 30), min_size=0, max_size=5)):
            clicks.append((eid, k, t))
            eid += 1
    return purchases, clicks


@given(case=_nearest_case())
@settings(**_SETTINGS)
def test_asof_nearest_matches_pandas_merge_asof(spark, case, tmp_path_factory):
    """q_join_asof_nearest implements pandas merge_asof(direction=
    'nearest') semantics exactly — including the backward preference on
    equal distance and input-order resolution of duplicate right
    timestamps — verified against pandas itself as the independent
    oracle on generated tie-heavy cases."""
    import pandas as pd

    from ex_hivent_spark.operators.joins import q_join_asof_nearest

    purchases, clicks = case
    rows = [(eid, k, t, "purchase") for eid, k, t in purchases] + [
        (eid, k, t, "click") for eid, k, t in clicks
    ]
    src = spark.createDataFrame(
        rows, "event_id long, user_id long, t long, event_type string"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"),
        "user_id",
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    d = tmp_path_factory.mktemp("nearest")
    src.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = {
        r["purchase_id"]: (r["click_id"], r["gap_us"])
        for r in q_join_asof_nearest(spark, str(d)).collect()
    }

    p = (
        pd.DataFrame(purchases, columns=["purchase_id", "user_id", "t"])
        .sort_values(["t", "purchase_id"])
        .reset_index(drop=True)
    )
    c = (
        pd.DataFrame(clicks, columns=["click_id", "user_id", "t"])
        .sort_values(["t", "click_id"])
        .reset_index(drop=True)
    )
    if len(c) == 0:
        expected = {pid: None for pid in p["purchase_id"]}
    else:
        m = pd.merge_asof(p, c, on="t", by="user_id", direction="nearest")
        expected = {
            r.purchase_id: None if pd.isna(r.click_id) else int(r.click_id)
            for r in m.itertuples()
        }

    assert set(got) == set(expected)
    click_ts = {eid: t for eid, _, t in clicks}
    purch_ts = {eid: t for eid, _, t in purchases}
    for pid, (cid, gap) in got.items():
        assert cid == expected[pid], (pid, cid, expected[pid])
        if cid is None:
            assert gap is None
        else:
            assert gap == abs(purch_ts[pid] - click_ts[cid]) * 1_000_000


@given(_docs_case())
@settings(**_SETTINGS)
def test_containment_prefix_filter_is_lossless(spark, case):
    """q_llm_containment_dedup's asymmetric prefix filter (with its
    integer ceil(4n/5) bound) must return exactly the pairs the naive
    all-ordered-pairs plan returns — hypothesis hunts the short-set /
    tie / n%5 boundary cases where a float bound would leak."""
    import ex_hivent_spark.llm.dedup as dedup

    df = spark.createDataFrame(
        [(i, t, "xx") for i, t in case], "doc_id long, text string, lang string"
    )
    orig = dedup.load_table
    orig_spread = dedup.spread_table
    try:
        dedup.load_table = lambda spark_, sf_dir_, name_: df
        dedup.spread_table = lambda spark_, sf_dir_, name_, key_: df
        got = {
            (r.doc_small, r.doc_big): r.containment
            for r in dedup.q_llm_containment_dedup(spark, "ignored").collect()
        }
    finally:
        dedup.load_table = orig
        dedup.spread_table = orig_spread

    tokens = F.split("text", " ")
    sh = df.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(tokens) - 2, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, 3)),
            )
        ).alias("s"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    la, lb = F.size(F.col("a.s")), F.size(F.col("b.s"))
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    allpairs = (
        a.join(
            b,
            (la < lb)
            | ((la == lb) & (F.col("a.doc_id") < F.col("b.doc_id"))),
        )
        .select(
            F.col("a.doc_id").alias("doc_small"),
            F.col("b.doc_id").alias("doc_big"),
            inter.alias("i"),
            la.alias("la"),
        )
        .filter(F.col("i") * 5 >= F.col("la") * 4)
        .select(
            "doc_small",
            "doc_big",
            (F.col("i").cast("double") / F.col("la")).alias("containment"),
        )
    )
    want = {(r.doc_small, r.doc_big): r.containment for r in allpairs.collect()}
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=200),      # custkey
            st.floats(min_value=0.01, max_value=9999.99),  # order price
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=12, deadline=None)
def test_pareto_coverage_matches_bruteforce(spark, tmp_path_factory, orders):
    """q_agg_pareto_coverage == the brute-force python head-count: for
    each threshold, the smallest k such that the top-k customer
    revenues (integer cents) reach the threshold share of the total."""
    import math
    import os
    import uuid

    from ex_hivent_spark.plans.registry import all_specs

    tmp = tmp_path_factory.mktemp(f"pareto{uuid.uuid4().hex[:6]}")
    rows = [
        (i, int(k), "O", float(p), None, "1-URGENT")
        for i, (k, p) in enumerate(orders)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    os.makedirs(f"{tmp}/sf", exist_ok=True)
    df.write.mode("overwrite").parquet(f"{tmp}/sf/orders.parquet")
    got = {
        r["threshold_pct"]: (r["n_customers"], r["n_total"])
        for r in all_specs()["q_agg_pareto_coverage"]
        .spark(spark, f"{tmp}/sf")
        .collect()
    }
    cents: dict[int, int] = {}
    for k, p in orders:
        cents[k] = cents.get(k, 0) + int(math.floor(p * 100.0 + 0.5))
    revs = sorted(cents.values(), reverse=True)
    total = sum(revs)
    for pct in (50, 80, 95):
        need, acc, k = pct * total, 0, 0
        while acc * 100 < need:
            acc += revs[k]
            k += 1
        assert got[pct] == (k, len(revs)), (pct, revs)
