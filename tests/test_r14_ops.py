"""r14 operators: hand-computed references on the sf0.001 testdata
plus invariant checks (the SURVEY §5 strategy — each op checked
against plain-Python math, not just the DuckDB oracle)."""

from __future__ import annotations

import hashlib
import math

import pytest

from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _spend_by_nation(sf_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT n.n_name, s.x, s.o_custkey FROM (
          SELECT o_custkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                      AS DOUBLE) AS x
          FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey
        ) s
        JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = s.o_custkey
        JOIN '{sf_dir}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        """
    ).fetchall()
    by_nation: dict[str, list[tuple[float, int]]] = {}
    for nat, x, ck in rows:
        by_nation.setdefault(nat, []).append((x, ck))
    return by_nation


def test_pietra_matches_python_and_bounds(spark):
    got = {
        r["nation"]: r
        for r in SPECS["q_agg_pietra_index"].spark(spark, SF_DIR).collect()
    }
    ref = _spend_by_nation(SF_DIR)
    assert set(got) == set(ref)
    for nat, xs_ck in ref.items():
        xs = [x for x, _ in xs_ck]
        mu = sum(xs) / len(xs)
        p = sum(abs(x - mu) for x in xs) / (2.0 * sum(xs))
        assert got[nat]["pietra"] == pytest.approx(p, abs=2e-5)
        # Pietra is a share moved: always in [0, 1)
        assert 0.0 <= got[nat]["pietra"] < 1.0


def test_palma_matches_python_rank_arithmetic(spark):
    got = {
        r["nation"]: r
        for r in SPECS["q_agg_palma_ratio"].spark(spark, SF_DIR).collect()
    }
    ref = _spend_by_nation(SF_DIR)
    assert set(got) == set(ref)
    for nat, xs_ck in ref.items():
        n = len(xs_ck)
        top_k = max(1, math.floor(n / 10.0))
        bot_k = max(1, math.floor(n * 2.0 / 5.0))
        desc = sorted(xs_ck, key=lambda t: (-t[0], t[1]))
        asc = sorted(xs_ck, key=lambda t: (t[0], t[1]))
        s_top = sum(x for x, _ in desc[:top_k])
        s_bot = sum(x for x, _ in asc[:bot_k])
        row = got[nat]
        assert row["top_k"] == top_k and row["bot_k"] == bot_k
        assert row["palma"] == pytest.approx(s_top / s_bot, abs=2e-5)
        # top decile can never hold less spend per the ordering
        assert row["top_share"] >= row["bot_share"] * (top_k / bot_k) - 1e-9


def test_markov_entropy_rate_matches_python(spark):
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT cur, nxt, count(*) FROM (
          SELECT event_type AS cur,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM '{SF_DIR}/events.parquet'
        ) WHERE nxt IS NOT NULL GROUP BY cur, nxt
        """
    ).fetchall()
    n_out: dict[str, int] = {}
    for cur, _, c in rows:
        n_out[cur] = n_out.get(cur, 0) + c
    h_ref: dict[str, float] = {}
    for cur in n_out:
        h = 0.0
        for c2, _, c in [r for r in rows if r[0] == cur]:
            pc = c / n_out[cur]
            h += pc * math.log(pc)
        h_ref[cur] = -h
    got = {
        r["state"]: r
        for r in SPECS["q_seq_markov_entropy_rate"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(n_out)
    total = sum(n_out.values())
    for st, row in got.items():
        assert row["n_out"] == n_out[st]
        assert row["h_state"] == pytest.approx(h_ref[st], abs=2e-5)
        assert row["h_state"] >= 0.0  # entropy is non-negative
        assert row["pi_emp"] == pytest.approx(n_out[st] / total, abs=2e-6)
        assert row["contrib"] == pytest.approx(
            row["pi_emp"] * row["h_state"], abs=2e-6
        )


def test_audio_rms_windows_matches_python_bytes(spark):
    import duckdb

    docs = duckdb.connect().execute(
        f"""SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'
            WHERE doc_id % 3 = 1"""
    ).fetchall()
    ref = {}
    for doc_id, text in docs:
        payload = bytes.fromhex(
            hashlib.md5(text.encode()).hexdigest() * (doc_id % 7 + 1)
        )
        for s in range(0, len(payload) - 16 + 1, 8):
            fr = payload[s : s + 16]
            ssq = sum(b * b for b in fr)
            ref[(doc_id, s)] = (
                sum(fr),
                _e6(math.sqrt(ssq / 16.0)),
                _e6(sum(fr) / 16.0),
            )
    got = {
        (r["media_id"], r["win_start"]): (
            r["amp_sum"],
            r["rms"],
            r["mean_amp"],
        )
        for r in SPECS["q_mm_audio_rms_windows"].spark(spark, SF_DIR).collect()
    }
    assert got == ref
    # RMS dominates |mean| (Cauchy-Schwarz) on every frame
    for amp_sum, rms, mean_amp in got.values():
        assert rms >= abs(mean_amp) - 1e-9


def test_partition_skew_median_and_flags(spark):
    rows = SPECS["q_maint_partition_skew"].spark(spark, SF_DIR).collect()
    assert rows, "day manifest must be non-empty"
    counts = sorted((r["n_rows"], str(r["day"])) for r in rows)
    lower_median = counts[(len(counts) + 1) // 2 - 1][0]
    for r in rows:
        assert r["median_rows"] == lower_median
        assert r["flagged"] == int(r["n_rows"] > 2 * lower_median)
        assert r["skew_ratio"] == pytest.approx(
            r["n_rows"] / lower_median, abs=2e-6
        )


def test_ulcer_index_matches_python(spark):
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT l_returnflag,
               CAST(l_shipdate AS DATE) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6)))
                    AS DOUBLE) AS rev
        FROM '{SF_DIR}/lineitem.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for rf, _, rev in rows:
        series.setdefault(rf, []).append(rev)
    got = {
        r["rf"]: r
        for r in SPECS["q_agg_ulcer_index"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(series)
    for rf, revs in series.items():
        runmax, dds = 0.0, []
        for v in revs:
            runmax = max(runmax, v)
            dds.append(_e6(v / runmax - 1.0))
        ulcer = math.sqrt(sum(d * d for d in dds) / len(dds))
        assert got[rf]["n_days"] == len(revs)
        assert got[rf]["max_drawdown"] == min(dds)
        assert got[rf]["ulcer"] == pytest.approx(ulcer, abs=2e-6)
        # drawdowns are never positive; ulcer bounded by deepest one
        assert got[rf]["max_drawdown"] <= 0.0
        assert got[rf]["ulcer"] <= abs(got[rf]["max_drawdown"]) + 1e-9


def test_cid_ce_matches_python_hourly_counts(spark):
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT event_type, date_trunc('hour', ts) AS hr, count(*)
        FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, _, c in rows:
        series.setdefault(et, []).append(c)
    got = {
        r["event_type"]: r
        for r in SPECS["q_ts_cid_ce"].spark(spark, SF_DIR).collect()
    }
    for et, cs in series.items():
        if len(cs) < 2:
            assert et not in got
            continue
        energy = sum(
            (b - a) * (b - a) for a, b in zip(cs, cs[1:])
        )
        assert got[et]["n_steps"] == len(cs) - 1
        assert got[et]["energy"] == energy
        assert got[et]["ce"] == _e6(math.sqrt(energy))


def test_sequence_pack_offsets_and_fill(spark):
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT source, doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
        FROM '{SF_DIR}/documents.parquet' ORDER BY source, doc_id
        """
    ).fetchall()
    ref: dict[tuple, list[tuple[int, int]]] = {}
    off: dict[str, int] = {}
    for src, doc_id, tok in rows:
        o = off.get(src, 0)
        ref.setdefault((src, o // 2048), []).append((doc_id, tok))
        off[src] = o + tok
    got = {
        (r["source"], r["bin_id"]): r
        for r in SPECS["q_llm_sequence_pack"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(ref)
    for key, docs in ref.items():
        row = got[key]
        assert row["n_docs"] == len(docs)
        assert row["n_tokens"] == sum(t for _, t in docs)
        assert row["first_doc"] == min(d for d, _ in docs)
        assert row["last_doc"] == max(d for d, _ in docs)
        assert row["fill_ratio"] == _e6(row["n_tokens"] / 2048.0)


def test_kendall_w_matches_python_and_bounds(spark):
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6)))
                    AS DOUBLE) AS rev
        FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    flags = sorted({r[0] for r in rows})
    m = len(flags)
    day_cover: dict = {}
    for rf, day, rev in rows:
        day_cover.setdefault(day, {})[rf] = rev
    full_days = sorted(d for d, c in day_cover.items() if len(c) == m)
    n = len(full_days)
    rsum = {d: 0 for d in full_days}
    for rf in flags:
        order = sorted(full_days, key=lambda d: (day_cover[d][rf], str(d)))
        for i, d in enumerate(order, start=1):
            rsum[d] += i
    s4 = sum((2 * rsum[d] - m * (n + 1)) ** 2 for d in full_days)
    w_ref = 3.0 * s4 / (float(m) * m * (float(n) * n * n - n))
    row = SPECS["q_stats_kendall_w"].spark(spark, SF_DIR).collect()[0]
    assert row["n_judges"] == m and row["n_items"] == n
    assert row["s4"] == s4
    assert row["w"] == pytest.approx(w_ref, abs=2e-6)
    assert 0.0 <= row["w"] <= 1.0
