"""Hubness audit (llm/embaudit.py), Fisher transform
(operators/momentum.py), doc-length Gini (llm/docstats.py) and
conversion latency (operators/convert.py): pin the SEMANTICS with
independent plain-Python implementations over the real sf0.001
parquet — brute-force top-k lists, the classic sorted-rank Gini
formula (validating the grouped closed form), and literal
first-signup/first-purchase scans."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from ex_hivent_spark.llm.embaudit import _HUB_K, _HUB_Q
from ex_hivent_spark.operators.momentum import _FISH_CLAMP, _FISH_WIN
from ex_hivent_spark.plans.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_hubness_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def unit(v):
        s = 0.0
        for x in v:
            s = s + x * x
        n = math.sqrt(s)
        return [x / n for x in v]

    units = {i: unit(v) for i, v in vecs.items()}
    probes = sorted(i for i in vecs if i % 5 == 0)[:_HUB_Q]
    occ = Counter()
    for qid in probes:
        qu = units[qid]
        cos = {}
        for nid, u in units.items():
            if nid == qid:
                continue
            s = 0.0
            for a, b in zip(qu, u):
                s = s + a * b
            cos[nid] = _e6(s)
        for nid in sorted(cos, key=lambda i: (-cos[i], i))[:_HUB_K]:
            occ[nid] += 1
    hist = Counter(occ.values())
    got = {
        r["n_occurrences"]: r
        for r in SPECS["q_emb_hubness_audit"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(hist)
    slot_total = 0.0
    for c, nv in hist.items():
        row = got[c]
        assert row["n_vectors"] == nv
        assert row["slot_share"] == pytest.approx(
            _e6(nv * c / (len(probes) * _HUB_K)), abs=2e-6
        )
        slot_total += row["slot_share"]
    # Every top-k slot is attributed to exactly one occurrence class.
    assert slot_total == pytest.approx(1.0, abs=1e-4)


def test_fisher_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    byk: dict = defaultdict(list)
    for r in rows:
        h = int(r["ts"].timestamp() // 3600)
        byk[(r["event_type"], h)].append(r)
    bars: dict = defaultdict(list)
    for (t, h), evs in sorted(byk.items()):
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in evs]
        bars[t].append((h, evs[-1]["value"], max(vals), min(vals)))
    got = {
        (r["event_type"], r["hour_id"]): r
        for r in SPECS["q_win_fisher_transform"]
        .spark(spark, SF_DIR)
        .collect()
    }
    n = 0
    for t, series in bars.items():
        for i in range(_FISH_WIN - 1, len(series)):
            win = series[i - _FISH_WIN + 1 : i + 1]
            hh = max(h for _, _, h, _ in win)
            ll = min(lo for _, _, _, lo in win)
            c = series[i][1]
            if hh == ll:
                x = 0.0
            else:
                x = max(
                    -_FISH_CLAMP,
                    min(_FISH_CLAMP, _e6(2.0 * (c - ll) / (hh - ll) - 1.0)),
                )
            fish = 0.5 * math.log((1.0 + x) / (1.0 - x))
            row = got[(t, series[i][0])]
            assert row["x"] == pytest.approx(x, abs=1e-12)
            assert row["fisher"] == pytest.approx(_e6(fish), abs=2e-6)
            n += 1
    assert n == len(got) and n > 0


def test_length_gini_matches_sorted_rank_formula(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    by_s: dict = defaultdict(list)
    for d in docs:
        by_s[d["source"]].append(d["n_chars"])
    got = {
        r["source"]: r
        for r in SPECS["q_llm_length_gini"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_s)
    for s, xs in by_s.items():
        xs.sort()
        n = len(xs)
        sx = sum(xs)
        # Classic sorted-rank identity (ties get ascending ranks; the
        # grouped midrank form is algebraically identical for the SUM).
        srx = sum((i + 1) * x for i, x in enumerate(xs))
        gini = 2.0 * srx / (n * sx) - (n + 1) / n
        row = got[s]
        assert row["n_docs"] == n
        assert row["mean_chars"] == pytest.approx(_e6(sx / n), abs=2e-6)
        assert row["gini"] == pytest.approx(_e6(gini), abs=2e-6)
        assert 0.0 <= row["gini"] < 1.0


def test_conversion_latency_matches_python(spark):
    rows = pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()
    s: dict = {}
    for r in rows:
        if r["event_type"] == "signup":
            t = r["ts"]
            if r["user_id"] not in s or t < s[r["user_id"]]:
                s[r["user_id"]] = t
    delays = {}
    for r in rows:
        if r["event_type"] != "purchase" or r["user_id"] not in s:
            continue
        d = round((r["ts"] - s[r["user_id"]]).total_seconds() * 1e6)
        if d > 0 and (r["user_id"] not in delays or d < delays[r["user_id"]]):
            delays[r["user_id"]] = d
    ds = sorted(delays.values())
    n = len(ds)
    med = (ds[(n + 1) // 2 - 1] + ds[n // 2 + 1 - 1]) / 2.0
    row = (
        SPECS["q_seq_conversion_latency"].spark(spark, SF_DIR).collect()[0]
    )
    assert row["n_converted"] == n
    assert row["mean_delay_s"] == pytest.approx(
        _e6(sum(ds) / n / 1e6), abs=2e-6
    )
    assert row["median_delay_s"] == pytest.approx(
        _e6(med / 1e6), abs=2e-6
    )
