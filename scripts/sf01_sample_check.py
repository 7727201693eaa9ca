#!/usr/bin/env python
"""sf0.1-magnitude evidence for the quadratic-oracle graph/dedup ops.

The 17 skipped_heavy_oracles queries (CORRECTNESS_SF0_1.json) could not
be hash-checked at sf0.1 because their DuckDB oracles are O(n²) in
|documents| (rouge_pairs: 261 s, cluster_source_purity: 291 s in the
r11 anchor). Both sf0.1-first failure classes seen to date were PER-ROW
magnitude effects (value=0 rows, 2^53 decimal bounds) — so a
deterministic doc-id row SAMPLE of the sf0.1 table preserves exactly
what the sf0.01 gate cannot see, while shrinking the oracle's pair
space ~16x into affordability. Two evidence layers:

1. SAMPLED HASH CHECK: documents filtered to doc_id % 4 == 0 (1,250 of
   5,000 sf0.1 docs, full sf0.1 text lengths), all other tables
   symlinked; every heavy op + its oracle run on the sample dir and
   hash-compared exactly as scripts/driver_sim.py does.
2. FULL-sf0.1 ENGINE INVARIANTS: structural identities the engine must
   satisfy at the full scale, cross-derived from INDEPENDENT query
   plans — degree-sum = 2|E|, Σ per-node triangle counts = 3×triangle
   total, Σ per-edge common neighbors = 3×triangle total, component
   labels are a min-label fixpoint consistent across the 4 cluster
   consumers, bounds on every score column.

Usage: python scripts/sf01_sample_check.py [--out INVARIANTS_SF0_1.json]
Exit 0 iff every sampled hash matches and every invariant holds.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_FULL = "/root/testdata/sf0.1"
SAMPLE_DIR = "/tmp/sf01_sample_mod4"
SAMPLE_MOD = 4

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

HEAVY_OPS = [
    "q_graph_adamic_adar",
    "q_graph_assortativity",
    "q_graph_clustering_coeff",
    "q_graph_degree_stats",
    "q_graph_jaccard_neighbors",
    "q_graph_kcore_step",
    "q_graph_lpa_step",
    "q_graph_triangles",
    "q_llm_cluster_source_purity",
    "q_llm_containment_dedup",
    "q_llm_cross_dedup",
    "q_llm_dedup_clusters",
    "q_llm_dedup_component_stats",
    "q_llm_dedup_keep_best",
    "q_llm_graph_pagerank",
    "q_llm_ngram_jaccard",
    "q_llm_rouge_pairs",
    # r12: same quadratic pair-CTE oracle family
    "q_graph_modularity",
]


def norm(v):
    return "NaN" if isinstance(v, float) and math.isnan(v) else v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(norm(r[i]) for i in order) for r in rows], key=repr)


def build_sample_dir() -> None:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(SAMPLE_DIR, exist_ok=True)
    for t in TABLES:
        src, dst = f"{SF_FULL}/{t}.parquet", f"{SAMPLE_DIR}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        if t == "documents":
            tbl = pq.read_table(src)
            # doc_id % 4 == 0 via bit mask (ids are non-negative)
            mask = pc.equal(
                pc.bit_wise_and(tbl.column("doc_id"), SAMPLE_MOD - 1), 0
            )
            pq.write_table(tbl.filter(mask), dst)
        else:
            os.symlink(src, dst)


def main() -> int:
    import time as _time

    os.environ["TZ"] = "UTC"
    _time.tzset()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    build_sample_dir()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = entry.queries(), entry.oracle_sql()

    # ---- layer 1: sampled hash check --------------------------------
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SAMPLE_DIR}/{t}.parquet'"
        )
    sampled: dict[str, dict] = {}
    fails: list[str] = []
    for name in HEAVY_OPS:
        rec: dict = {"hash_match": None, "rows": None, "err": None}
        sampled[name] = rec
        try:
            sdf = queries[name](spark, SAMPLE_DIR)
            s = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
            res = con.execute(oracles[name])
            d = canon([x[0] for x in res.description], res.fetchall())
            rec["rows"] = len(s)
            rec["hash_match"] = s == d
            if s != d:
                fails.append(f"sample:{name} ({len(s)} vs {len(d)} rows)")
        except Exception as ex:  # noqa: BLE001
            rec["err"] = str(ex)[:160]
            fails.append(f"sample:{name}: {ex}")
        print(f"# sample {name}: match={rec['hash_match']} rows={rec['rows']}")

    # ---- layer 2: full-sf0.1 engine invariants ----------------------
    # Fresh memo state so full-scale runs don't read sample-dir frames
    # (the caches key on sf_dir, so this is belt-and-braces only).
    inv: dict[str, bool] = {}

    def check(name: str, ok: bool) -> None:
        inv[name] = bool(ok)
        if not ok:
            fails.append(f"invariant:{name}")
        print(f"# invariant {name}: {'ok' if ok else 'FAIL'}")

    def rows_of(qname: str):
        return queries[qname](spark, SF_FULL).collect()

    pairs = rows_of("q_llm_ngram_jaccard")
    pair_set = {(r["doc_a"], r["doc_b"]) for r in pairs}
    nodes = {a for a, _ in pair_set} | {b for _, b in pair_set}
    check("pairs_oriented_distinct",
          len(pair_set) == len(pairs)
          and all(a < b for a, b in pair_set))
    check("pairs_jaccard_bounds",
          all(0.5 <= r["jaccard"] <= 1.0 for r in pairs))

    deg_hist = rows_of("q_graph_degree_stats")
    check("degree_sum_is_2E",
          sum(r["degree"] * r["n_nodes"] for r in deg_hist)
          == 2 * len(pair_set))
    check("degree_nodes_cover",
          sum(r["n_nodes"] for r in deg_hist) == len(nodes))

    tri = rows_of("q_graph_triangles")[0]
    coeff = rows_of("q_graph_clustering_coeff")
    check("coeff_tri_sum_is_3T",
          sum(r["n_triangles"] for r in coeff) == 3 * tri["n_triangles"])
    check("coeff_bounds",
          all(0.0 <= r["clustering_coeff"] <= 1.0 for r in coeff)
          and len(coeff) == len(nodes))

    jn = rows_of("q_graph_jaccard_neighbors")
    check("common_neighbor_sum_is_3T",
          sum(r["common_neighbors"] for r in jn) == 3 * tri["n_triangles"])
    check("neighbor_jaccard_bounds",
          all(0.0 <= r["neighbor_jaccard"] <= 1.0 for r in jn)
          and len(jn) == len(pair_set))

    labels = rows_of("q_llm_dedup_clusters")
    lab = {r["doc_id"]: r["cluster_id"] for r in labels}
    by_cluster: dict = {}
    for d, c in lab.items():
        by_cluster.setdefault(c, []).append(d)
    check("labels_cover_pair_nodes",
          set(lab) == nodes)
    check("labels_connect_pairs",
          all(lab[a] == lab[b] for a, b in pair_set))
    check("labels_min_fixpoint",
          all(min(ds) == c for c, ds in by_cluster.items()))

    comp = rows_of("q_llm_dedup_component_stats")
    check("component_sizes_reconcile",
          sum(r["cluster_size"] * r["n_clusters"] for r in comp)
          == len(lab)
          and sorted(
              s for r in comp
              for s in [r["cluster_size"]] * r["n_clusters"]
          ) == sorted(len(ds) for ds in by_cluster.values()))

    keep = rows_of("q_llm_dedup_keep_best")
    check("keep_best_one_per_cluster",
          len(keep) == len(by_cluster)
          and all(
              r["keep_doc_id"] in by_cluster.get(r["cluster_id"], ())
              and r["n_docs"] == len(by_cluster.get(r["cluster_id"], ()))
              for r in keep
          ))

    pr = rows_of("q_llm_graph_pagerank")
    check("pagerank_positive_covering",
          len(pr) == len(nodes)
          and all(r["rank_e9"] > 0 for r in pr)
          and sum(r["rank_e9"] for r in pr) <= len(nodes) * 10**9)

    # r13 census rewrite: kcore now emits the per-round peel census
    # (peel_round, n_nodes, n_edges, max_degree). Invariants: one row
    # per round, round 0 matches the pair graph exactly, and peeling
    # is monotone non-increasing in nodes and edges.
    core = sorted(
        rows_of("q_graph_kcore_step"), key=lambda r: r["peel_round"]
    )
    check("kcore_census_monotone_peel",
          [r["peel_round"] for r in core] == [0, 1, 2, 3]
          and core[0]["n_nodes"] == len(nodes)
          and core[0]["n_edges"] == len(pair_set)
          and all(
              core[i]["n_nodes"] >= core[i + 1]["n_nodes"]
              and core[i]["n_edges"] >= core[i + 1]["n_edges"]
              for i in range(3)
          ))

    degree_of: dict = {}
    for a, b in pair_set:
        degree_of[a] = degree_of.get(a, 0) + 1
        degree_of[b] = degree_of.get(b, 0) + 1
    lpa = rows_of("q_graph_lpa_step")
    check("lpa_neighbors_match_degree",
          len(lpa) == len(nodes)
          and all(
              r["n_neighbors"] == degree_of[r["doc_id"]]
              and 1 <= r["top_count"] <= r["n_neighbors"]
              for r in lpa
          ))

    aa = rows_of("q_graph_adamic_adar")
    check("adamic_adar_nonneg", all(r["aa_score"] >= 0.0 for r in aa))

    asr = rows_of("q_graph_assortativity")[0]
    check("assortativity_bounds",
          -1.0 <= asr["assortativity"] <= 1.0
          and asr["n_edges"] == len(pair_set))

    pur = rows_of("q_llm_cluster_source_purity")
    check("purity_bounds",
          all(0.0 < r["purity"] <= 1.0 for r in pur))

    rg = rows_of("q_llm_rouge_pairs")
    check("rouge_bounds",
          all(
              0.0 <= r["rouge1_recall"] <= 1.0
              and 0.0 <= r["rouge1_precision"] <= 1.0
              and r["overlap1"] <= min(r["n_ref"], r["n_cand"])
              for r in rg
          ))

    ct = rows_of("q_llm_containment_dedup")
    check("containment_bounds",
          all(0.0 <= r["containment"] <= 1.0 for r in ct))

    mod = rows_of("q_graph_modularity")
    check("modularity_identities",
          sum(r["n_within_edges"] for r in mod) <= len(pair_set)
          and sum(r["degree_sum"] for r in mod) == 2 * len(pair_set)
          and len({r["modularity_q"] for r in mod}) == 1
          and all(-1.0 <= r["modularity_q"] <= 1.0 for r in mod))

    cx = rows_of("q_llm_cross_dedup")
    check("cross_dedup_split",
          all(
              r["bench_id"] % 7 == 0
              and r["doc_id"] % 7 != 0
              and 0.5 <= r["jaccard"] <= 1.0
              for r in cx
          ))

    out = {
        "sf_full": SF_FULL,
        "sample_dir": SAMPLE_DIR,
        "sample_rule": f"documents.doc_id % {SAMPLE_MOD} == 0 (sf0.1 text magnitudes preserved; other tables full)",
        "sampled_hash_checks": sampled,
        "full_sf01_invariants": inv,
        "n_fail": len(fails),
        "fails": fails,
    }
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, default=str)
        print(f"wrote {out_path}")
    print(
        f"sampled: {sum(1 for r in sampled.values() if r['hash_match'])}"
        f"/{len(HEAVY_OPS)} hash-match; invariants: "
        f"{sum(inv.values())}/{len(inv)} ok; FAIL: {len(fails)}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
