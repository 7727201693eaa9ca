"""r12 wave-1 operators: hand-computed references on the sf0.001
testdata plus synthetic edge frames (the SURVEY §5 strategy — each op
checked against plain-Python math, not just the DuckDB oracle)."""

from __future__ import annotations

import math

import pytest

from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# inequality indices
# ---------------------------------------------------------------------------


def _spend_by_nation(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT n.n_name, s.x FROM (
          SELECT o_custkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                      AS DOUBLE) AS x
          FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey
        ) s
        JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = s.o_custkey
        JOIN '{sf_dir}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        """
    ).fetchall()
    by_nation: dict[str, list[float]] = {}
    for nat, x in rows:
        by_nation.setdefault(nat, []).append(x)
    return by_nation


def test_theil_matches_python_and_is_zero_under_equality(spark):
    got = {
        r["nation"]: r
        for r in SPECS["q_agg_theil_index"].spark(spark, SF_DIR).collect()
    }
    ref = _spend_by_nation(spark, SF_DIR)
    assert set(got) == set(ref)
    for nat, xs in ref.items():
        mu = sum(xs) / len(xs)  # test tolerance absorbs sum-order drift
        t = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
        assert got[nat]["n_customers"] == len(xs)
        assert got[nat]["theil_t"] == pytest.approx(t, abs=2e-5)
        # Theil is non-negative (Jensen) for every nation
        assert got[nat]["theil_t"] >= -1e-6


def test_atkinson_bounds_and_python_match(spark):
    got = {
        r["nation"]: r
        for r in SPECS["q_agg_atkinson_index"].spark(spark, SF_DIR).collect()
    }
    ref = _spend_by_nation(spark, SF_DIR)
    for nat, xs in ref.items():
        mu = sum(xs) / len(xs)
        geo = math.exp(sum(math.log(x) for x in xs) / len(xs))
        a = 1.0 - geo / mu
        assert got[nat]["atkinson_1"] == pytest.approx(a, abs=2e-5)
        assert -1e-6 <= got[nat]["atkinson_1"] < 1.0


# ---------------------------------------------------------------------------
# stats battery
# ---------------------------------------------------------------------------


def test_paired_t_matches_python(spark):
    import duckdb

    con = duckdb.connect()
    mid = (473352 + 360) * 3600
    rows = con.execute(
        f"""
        SELECT user_id,
               CASE WHEN epoch(ts) < {mid} THEN 1 ELSE 2 END AS half,
               sum(value) AS sv, count(*) AS c
        FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    m: dict[int, dict[int, float]] = {}
    for u, h, sv, c in rows:
        m.setdefault(u, {})[h] = sv / c
    d = [
        _e6(v[2] - v[1])
        for v in m.values()
        if 1 in v and 2 in v
    ]
    n = len(d)
    mean_d = sum(d) / n
    var = (sum(x * x for x in d) - sum(d) ** 2 / n) / (n - 1)
    t = mean_d / math.sqrt(var / n)
    row = SPECS["q_stats_ttest_paired"].spark(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] == n
    assert row["mean_diff"] == pytest.approx(mean_d, abs=2e-5)
    assert row["t_stat"] == pytest.approx(t, abs=2e-4)


def test_f_test_ratio_of_sample_variances(spark):
    import duckdb

    con = duckdb.connect()
    g = dict(
        (rf, (n, float(v)))
        for rf, n, v in con.execute(
            f"""
            SELECT l_returnflag, count(*), var_samp(l_extendedprice)
            FROM '{SF_DIR}/lineitem.parquet'
            WHERE l_returnflag IN ('R', 'A') GROUP BY 1
            """
        ).fetchall()
    )
    row = SPECS["q_stats_f_test_variance"].spark(spark, SF_DIR).collect()[0]
    assert row["n1"] == g["R"][0] and row["n2"] == g["A"][0]
    assert row["df1"] == g["R"][0] - 1 and row["df2"] == g["A"][0] - 1
    assert row["f_stat"] == pytest.approx(g["R"][1] / g["A"][1], rel=1e-6)


def test_kuiper_v_is_sum_of_parts_and_dominates_ks(spark):
    rows = SPECS["q_stats_kuiper_uniform"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["d_plus"] >= -1e-9 and r["d_minus"] >= -1e-9
        assert r["v_stat"] == pytest.approx(
            r["d_plus"] + r["d_minus"], abs=2e-6
        )
        # V >= each one-sided deviation by construction
        assert r["v_stat"] >= max(r["d_plus"], r["d_minus"]) - 1e-9


def test_burstiness_known_patterns(spark):
    rows = SPECS["q_seq_interevent_burstiness"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r["burstiness"] <= 1.0 + 1e-9
        assert r["n_gaps"] >= 3
        # sd and mean reconstruct B
        s, mu = r["sd_gap_s"], r["mean_gap_s"]
        if s + mu > 0:
            assert r["burstiness"] == pytest.approx(
                (s - mu) / (s + mu), abs=2e-6
            )


# ---------------------------------------------------------------------------
# indicator tail
# ---------------------------------------------------------------------------


def test_stoch_rsi_bounds_and_range_normalization(spark):
    rows = SPECS["q_win_stoch_rsi"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["stoch_rsi14"] <= 1.0 + 1e-9


def test_mass_index_is_25_on_constant_range_bars(spark):
    # A constant-range series has sma1 == sma2 at every full window,
    # so every ratio is exactly 1.0 and mass25 == 25.0 — checked on a
    # synthetic frame through the same windows the query uses.
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from ex_hivent_spark.functions.decimals import dround
    from ex_hivent_spark.operators.momentum import _MI_SMA, _MI_SUM

    bars = spark.createDataFrame(
        [("t", h, 10.0, 4.0) for h in range(60)],
        "event_type string, hour_id bigint, high double, low double",
    )
    w9 = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(_MI_SMA - 1), Window.currentRow)
    )
    rng = (F.col("high") - F.col("low")).cast("decimal(25,6)")
    s1 = bars.select(
        "event_type",
        "hour_id",
        F.count(F.lit(1)).over(w9).alias("nb1"),
        dround(F.sum(rng).over(w9).cast("double") / _MI_SMA, 6).alias(
            "sma1"
        ),
    ).filter(F.col("nb1") == _MI_SMA)
    s2 = s1.select(
        "event_type",
        "hour_id",
        "sma1",
        F.count(F.lit(1)).over(w9).alias("nb2"),
        dround(
            F.sum(F.col("sma1").cast("decimal(25,6)")).over(w9)
            .cast("double")
            / _MI_SMA,
            6,
        ).alias("sma2"),
    ).filter(F.col("nb2") == _MI_SMA)
    ratios = {
        (r["sma1"], r["sma2"]) for r in s2.collect()
    }
    assert ratios == {(6.0, 6.0)}

    rows = SPECS["q_win_mass_index"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["mass25"] > 0.0


def test_pvo_signal_is_sma_of_pvo(spark):
    rows = SPECS["q_win_pvo"].spark(spark, SF_DIR).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour_id"])
        for r in rs:
            assert r["pvo_hist"] == pytest.approx(
                r["pvo"] - r["signal"], abs=2e-6
            )


def test_nvi_log_moves_only_on_down_volume(spark):
    rows = SPECS["q_win_nvi"].spark(spark, SF_DIR).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour_id"])
        prev_log, prev_down = 0.0, 0
        for r in rs:
            if r["n_down_vol"] == prev_down:
                # no down-volume bar since the last row: log level holds
                assert r["nvi_log"] == pytest.approx(prev_log, abs=2e-6)
            prev_log, prev_down = r["nvi_log"], r["n_down_vol"]


# ---------------------------------------------------------------------------
# wave 2
# ---------------------------------------------------------------------------


def test_qstick_is_mean_body_and_bop_bounds(spark):
    rows = SPECS["q_win_qstick"].spark(spark, SF_DIR).collect()
    assert rows  # bars exist at every SF
    bop_rows = SPECS["q_win_bop"].spark(spark, SF_DIR).collect()
    assert bop_rows
    for r in bop_rows:
        assert -1.0 - 1e-9 <= r["bop"] <= 1.0 + 1e-9
        assert -1.0 - 1e-9 <= r["bop_sma14"] <= 1.0 + 1e-9


def test_arch_lm_matches_python(spark):
    import duckdb

    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT l_returnflag,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6)))
                    AS DOUBLE) AS rev,
               CAST(l_shipdate AS DATE) AS day
        FROM '{SF_DIR}/lineitem.parquet'
        GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
        ORDER BY l_returnflag, day
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for rf, rev, _day in daily:
        series.setdefault(rf, []).append(rev)
    got = {
        r["l_returnflag"]: r
        for r in SPECS["q_ts_arch_lm"].spark(spark, SF_DIR).collect()
    }
    for rf, revs in series.items():
        rets = [
            _e6(math.log(revs[i] / revs[i - 1]))
            for i in range(1, len(revs))
        ]
        mr = sum(rets) / len(rets)
        ys = [
            math.floor(_e6(r - mr) ** 2 * 1e12 + 0.5) / 1e12 for r in rets
        ]
        x, y = ys[:-1], ys[1:]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        syy = sum(b * b for b in y)
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if dx * dy <= 0:
            assert got[rf]["lm_stat"] is None
            continue
        r2 = (n * sxy - sx * sy) ** 2 / (dx * dy)
        assert got[rf]["n_obs"] == n
        assert got[rf]["r2"] == pytest.approx(r2, abs=2e-5)
        assert got[rf]["lm_stat"] == pytest.approx(n * r2, abs=2e-3)


def test_permutation_entropy_bounds_and_flat_series(spark):
    row = SPECS["q_ts_permutation_entropy"].spark(spark, SF_DIR).collect()[0]
    assert row["n_windows"] == 718  # 720-hour spine, m=3 embedding
    assert 0.0 <= row["h_perm"] <= math.log(6) + 1e-6
    assert row["h_perm_norm"] == pytest.approx(
        row["h_perm"] / 1.791759469228055, abs=2e-6
    )
    # a constant series has ONE pattern (stable ties -> 012): H == 0
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    flat = spark.createDataFrame(
        [(h, 5) for h in range(40)], "h bigint, y bigint"
    )
    w = Window.orderBy("h")
    emb = flat.select(
        F.col("y").alias("a"),
        F.lead("y", 1).over(w).alias("b"),
        F.lead("y", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    pats = emb.select(
        F.when((a <= b) & (b <= c), 0)
        .when((a <= c) & (c < b), 1)
        .when((b < a) & (a <= c), 2)
        .when((b <= c) & (c < a), 3)
        .when((c < a) & (a <= b), 4)
        .otherwise(5)
        .alias("p")
    ).distinct().collect()
    assert {r["p"] for r in pats} == {0}


def test_burrows_delta_symmetric_panel(spark):
    rows = SPECS["q_llm_burrows_delta"].spark(spark, SF_DIR).collect()
    assert rows
    n_sources = len(
        {r["source_a"] for r in rows} | {r["source_b"] for r in rows}
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["delta"] >= -1e-9


# ---------------------------------------------------------------------------
# wave 3
# ---------------------------------------------------------------------------


def test_phash_census_reconciles_with_python(spark):
    import duckdb
    import hashlib

    con = duckdb.connect()
    docs = con.execute(
        f"""
        SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'
        WHERE doc_id % 3 = 0
        """
    ).fetchall()
    phashes = {}
    for doc_id, text in docs:
        payload_hex = hashlib.md5(text.encode()).hexdigest() * (
            doc_id % 7 + 1
        )
        ph = int(
            hashlib.md5(payload_hex.encode()).hexdigest()[:12], 16
        )
        phashes[doc_id] = ph
    rows = {
        r["band_id"]: r
        for r in SPECS["q_mm_phash_neardup"].spark(spark, SF_DIR).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for band in range(4):
        buckets = {}
        for ph in phashes.values():
            buckets.setdefault((ph >> (12 * band)) & 0xFFF, []).append(ph)
        r = rows[band]
        assert r["n_buckets"] == len(buckets)
        assert r["max_bucket_size"] == max(len(v) for v in buckets.values())
        assert r["n_candidate_pairs"] == sum(
            len(v) * (len(v) - 1) // 2 for v in buckets.values()
        )
        n_match = sum(
            1
            for v in buckets.values()
            for i in range(len(v))
            for j in range(i + 1, len(v))
            if bin(v[i] ^ v[j]).count("1") <= 8
        )
        assert r["n_matched_pairs"] == n_match


def test_outage_runs_reconcile_with_raw_grid(spark):
    import duckdb

    con = duckdb.connect()
    # independent python recount of empty-hour runs
    hours = dict(
        ((et, h), c)
        for et, h, c in con.execute(
            f"""
            SELECT event_type,
                   CAST(floor(epoch(ts)/3600) AS BIGINT), count(*)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2
            """
        ).fetchall()
    )
    types = {et for et, _ in hours}
    got = {
        r["event_type"]: r
        for r in SPECS["q_quality_outage_runs"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == types
    for et in types:
        runs, cur = [], 0
        for h in range(473352, 473352 + 720):
            if (et, h) in hours:
                if cur:
                    runs.append(cur)
                cur = 0
            else:
                cur += 1
        if cur:
            runs.append(cur)
        assert got[et]["n_outages"] == len(runs)
        assert got[et]["max_outage_hours"] == (max(runs) if runs else 0)
        assert got[et]["total_empty_hours"] == sum(runs)


def test_theil_decomposition_reconciles(spark):
    row = SPECS["q_agg_theil_decomposition"].spark(spark, SF_DIR).collect()[0]
    # exact decomposition up to the documented e6 rounding of the parts
    assert row["recon_residual"] < 1e-3
    assert row["t_total"] >= -1e-6
    assert row["t_between"] >= -1e-3  # >= 0 mathematically; e6 slack
    assert row["t_within"] >= -1e-6


# ---------------------------------------------------------------------------
# wave 4
# ---------------------------------------------------------------------------


def test_dfa_alpha_matches_python(spark):
    import duckdb

    con = duckdb.connect()
    hours = dict(
        (
            (et, h),
            c,
        )
        for et, h, c in con.execute(
            f"""
            SELECT event_type,
                   CAST(floor(epoch(ts)/3600) AS BIGINT) - 473352,
                   count(*)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2
            """
        ).fetchall()
    )
    types = {et for et, _ in hours}
    got = {
        r["event_type"]: r
        for r in SPECS["q_ts_dfa_alpha"].spark(spark, SF_DIR).collect()
    }
    N = 720
    for et in types:
        xs = [hours.get((et, h), 0) for h in range(N)]
        sx = sum(xs)
        cum, yt = 0, []
        for t, x in enumerate(xs):
            cum += x
            yt.append(N * cum - (t + 1) * sx)  # exact int profile
        pts = []
        nb_total = 0
        for n in (8, 16, 32, 64):
            ss_tot = 0
            nb = 0
            for b in range(N // n):
                seg = yt[b * n : (b + 1) * n]
                sy = sum(seg)
                siy = sum((i + 1) * y for i, y in enumerate(seg))
                syy = sum(y * y for y in seg)
                si = n * (n + 1) / 2.0
                denom = n * n * (float(n) * n - 1) / 12.0
                slope = (float(n) * siy - si * sy) / denom
                inter = (sy - slope * si) / n
                ss = syy - inter * sy - slope * siy
                ss0 = max(math.floor(ss / (720.0 * 720.0) + 0.5), 0)
                ss_tot += ss0
                nb += 1
            if ss_tot > 0:
                pts.append(
                    (
                        _e6(math.log(n)),
                        _e6(math.log(math.sqrt(ss_tot / (nb * float(n))))),
                    )
                )
                nb_total += nb
        k = len(pts)
        sxp = sum(p[0] for p in pts)
        syp = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        alpha = (k * sxy - sxp * syp) / (k * sxx - sxp * sxp)
        assert got[et]["n_blocks_total"] == nb_total
        assert got[et]["dfa_alpha"] == pytest.approx(alpha, abs=2e-5)


def test_ks_two_sample_matches_python(spark):
    import duckdb

    con = duckdb.connect()
    c = con.execute(
        f"""
        SELECT value,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        FROM '{SF_DIR}/events.parquet'
        WHERE event_type IN ('click', 'view') GROUP BY value ORDER BY value
        """
    ).fetchall()
    n1 = sum(r[1] for r in c)
    n2 = sum(r[2] for r in c)
    k1 = k2 = 0
    dp = dm = -1.0
    for _v, a, b in c:
        k1 += a
        k2 += b
        d = k1 / n1 - k2 / n2
        dp = max(dp, d)
        dm = max(dm, -d)
    row = SPECS["q_stats_ks_two_sample"].spark(spark, SF_DIR).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["d_plus"] == pytest.approx(dp, abs=2e-6)
    assert row["d_minus"] == pytest.approx(dm, abs=2e-6)
    assert row["d_stat"] == pytest.approx(max(dp, dm), abs=2e-6)
    assert row["ks_stat"] == pytest.approx(
        max(dp, dm) * math.sqrt(n1 * n2 / (n1 + n2)), abs=2e-5
    )


# ---------------------------------------------------------------------------
# wave 5
# ---------------------------------------------------------------------------


def test_spectral_entropy_bounds_and_flat_series_zero(spark):
    rows = SPECS["q_ts_spectral_entropy"].spark(spark, SF_DIR).collect()
    assert rows
    ln24 = 3.1780538303479458
    for r in rows:
        assert -1e-6 <= r["spectral_entropy"] <= ln24 + 1e-6
        assert r["spectral_entropy_norm"] == pytest.approx(
            r["spectral_entropy"] / ln24, abs=2e-6
        )


def test_binary_segmentation_matches_python(spark):
    import duckdb

    con = duckdb.connect()
    hours = dict(
        (h, c)
        for h, c in con.execute(
            f"""
            SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) - 473352,
                   count(*)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    xs = [hours.get(h, 0) for h in range(720)]
    s = sum(xs)
    best = None
    cum = 0
    for t in range(1, 721):
        cum += xs[t - 1]
        if not (24 <= t <= 696):
            continue
        ml, mr = cum / t, (s - cum) / (720 - t)
        gain = _e6((t * (720 - t) / 720.0) * (ml - mr) * (ml - mr))
        if best is None or gain > best[0] or (gain == best[0] and t < best[1]):
            best = (gain, t, ml, mr)
    row = SPECS["q_ts_binary_segmentation"].spark(spark, SF_DIR).collect()[0]
    assert row["split_hour"] == best[1]
    assert row["sse_gain"] == pytest.approx(best[0], abs=2e-6)
    assert row["mean_left"] == pytest.approx(best[2], abs=2e-6)
    assert row["mean_right"] == pytest.approx(best[3], abs=2e-6)
    assert row["n_events"] == s


def test_modularity_identities(spark):
    rows = SPECS["q_graph_modularity"].spark(spark, SF_DIR).collect()
    assert rows
    pairs = SPECS["q_llm_ngram_jaccard"].spark(spark, SF_DIR).collect()
    m = len(pairs)
    assert sum(r["degree_sum"] for r in rows) == 2 * m
    assert sum(r["n_within_edges"] for r in rows) <= m
    qs = {r["modularity_q"] for r in rows}
    assert len(qs) == 1
    q = qs.pop()
    assert -1.0 <= q <= 1.0
    # Q reconstructs from the per-community terms
    assert q == pytest.approx(
        sum(r["q_term"] for r in rows), abs=2e-5
    )


# ---------------------------------------------------------------------------
# wave 6
# ---------------------------------------------------------------------------


def test_prefix_dup_rate_reconciles(spark):
    import duckdb

    con = duckdb.connect()
    ref = dict(
        (s, (nd, dp))
        for s, nd, dp in con.execute(
            f"""
            SELECT source, count(*),
                   count(*) - count(DISTINCT
                     array_to_string((string_split(text, ' '))[1:16], ' '))
            FROM '{SF_DIR}/documents.parquet' GROUP BY source
            """
        ).fetchall()
    )
    rows = SPECS["q_llm_prefix_dup_rate"].spark(spark, SF_DIR).collect()
    assert {r["source"] for r in rows} == set(ref)
    for r in rows:
        nd, dp = ref[r["source"]]
        assert r["n_docs"] == nd
        assert r["n_prefix_dups"] == dp
        assert r["n_distinct_prefixes"] == nd - dp
        assert 0.0 <= r["prefix_dup_rate"] < 1.0
        assert r["max_prefix_family"] >= 1


def test_perplexity_sweep_monotone_and_reconciles(spark):
    ppl = {
        r["doc_id"]: r
        for r in SPECS["q_llm_doc_perplexity"].spark(spark, SF_DIR).collect()
    }
    rows = sorted(
        SPECS["q_llm_perplexity_filter_sweep"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["max_ppl"],
    )
    n_total = len(ppl)
    tok_total = sum(r["n_tokens"] for r in ppl.values())
    prev_docs = -1
    for r in rows:
        kept = [p for p in ppl.values() if p["perplexity"] <= r["max_ppl"]]
        assert r["n_docs_kept"] == len(kept)
        assert r["tokens_kept"] == sum(p["n_tokens"] for p in kept)
        assert r["doc_share"] == pytest.approx(len(kept) / n_total, abs=1e-9)
        assert r["n_docs_kept"] >= prev_docs  # monotone in the threshold
        prev_docs = r["n_docs_kept"]


# ---------------------------------------------------------------------------
# wave 7 (final r12 wave)
# ---------------------------------------------------------------------------


def test_ge2_matches_python_and_dominates_theil(spark):
    got = {
        r["nation"]: r
        for r in SPECS["q_agg_ge2_index"].spark(spark, SF_DIR).collect()
    }
    theil = {
        r["nation"]: r["theil_t"]
        for r in SPECS["q_agg_theil_index"].spark(spark, SF_DIR).collect()
    }
    ref = _spend_by_nation(spark, SF_DIR)
    for nat, xs in ref.items():
        mu = sum(xs) / len(xs)
        ge2 = (sum((x / mu) ** 2 for x in xs) / len(xs) - 1.0) / 2.0
        assert got[nat]["ge2"] == pytest.approx(ge2, abs=2e-5)
        assert got[nat]["cv"] == pytest.approx(
            math.sqrt(2 * ge2), abs=2e-5
        )
        # GE(2) is non-negative, and near-equal distributions put the
        # whole family within the same first-order CV²/2 ballpark
        # (no universal GE(2)>=GE(1) ordering exists)
        assert got[nat]["ge2"] >= -1e-6
        assert abs(got[nat]["ge2"] - theil[nat]) < 0.5 * max(
            got[nat]["ge2"], theil[nat], 1e-6
        )


def test_ivf_nprobe_sweep_monotone_and_saturates(spark):
    rows = sorted(
        SPECS["q_llm_ivf_nprobe_sweep"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["n_probe"],
    )
    assert [r["n_probe"] for r in rows] == [1, 2, 4, 8]
    prev_r, prev_s = -1.0, -1.0
    for r in rows:
        assert 0.0 <= r["recall_at_5"] <= 1.0 + 1e-9
        assert r["recall_at_5"] >= prev_r - 1e-9  # recall monotone
        assert r["avg_scanned"] >= prev_s - 1e-9  # cost monotone
        prev_r, prev_s = r["recall_at_5"], r["avg_scanned"]
    # probing every vector's cell budget of 8/16 cells must beat 1
    assert rows[-1]["recall_at_5"] >= rows[0]["recall_at_5"]
    # the n_probe=4 row must agree with q_llm_ann_recall's mean recall
    ann = SPECS["q_llm_ann_recall"].spark(spark, SF_DIR).collect()
    mean_ann = sum(r["recall_at_k"] for r in ann) / len(ann)
    four = [r for r in rows if r["n_probe"] == 4][0]
    assert four["recall_at_5"] == pytest.approx(mean_ann, abs=1e-3)
