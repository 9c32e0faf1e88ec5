#!/usr/bin/env python3
"""Render the BASELINE.md section-4 budget table from one clean
BENCH_LATEST.json derivation run.

Usage: python3 tools/budget_table.py [BENCH_LATEST.json]

Emits the full markdown table: query | median | min | budget | mode.
budget = max(1.0, 2 x median). mode marks rows whose timed reps are
steady-state reads of a per-fingerprint checkpoint (cache-read) vs rows
that recompute their full plan every rep (computing) -- the round-14
Gates/cachedTrace discipline; the set below must match SparkEntry.
"""
import json
import sys

# entries whose timed reps re-read a per-(session, fingerprint)
# localCheckpoint: the Gates-wrapped lifecycle gates, the recall-gauge
# frame family, and the cachedTrace-backed graph query entries
CACHE_READ = {
    # Gates.cached lifecycle gates (SparkEntry)
    "graph_delete_violations", "graph_refit_violations",
    "graph_retention_violations", "hybrid_ann_probe_violations",
    "hybrid_graph_probe_violations", "ivf_pq_append_violations",
    "ivf_refit_violations", "index_delete_violations",
    "ivf_pq_refit_violations", "ivf_pq_delete_violations",
    "index_retention_violations", "quantile_sketch_violations",
    "drift_violations", "streaming_index_delete",
    "streaming_graph_delete", "streaming_graph_append",
    "streaming_ivf_append",
    # round-15 Gates-wrapped entries
    "shard_merge_violations", "asof_violations", "pq_width_violations",
    # round-16 Gates-wrapped entries
    "shard_append_violations", "streaming_shard_append",
    # round-17 Gates-wrapped entries
    "shard_delete_violations", "streaming_graph_shard_append",
    # recallFrame/exactKnnPairs family (round 9)
    "ann_recall", "ann_recall_violations", "ann_recall_curve",
    # cachedTrace-backed graph query entries (round 14): the beam pass
    # is a cache read; the ranking/fuse/greedy tail still computes
    "ann_knn_graph", "ann_graph_filtered", "mmr_rerank_graph",
    "hybrid_search_graph",
}

# live alarms deliberately kept recomputing (one per index family)
LIVE_ALARM = {"graph_append_violations", "ivf_append_violations",
              "approx_distinct_violations"}

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LATEST.json"
with open(path) as f:
    bench = json.load(f)
med = bench["queries"]
mins = bench.get("queries_min", {})

print(f"derivation run: total {bench['value']:.1f} s over "
      f"{len(med)} queries, reps {bench.get('reps')}, "
      f"errors {bench.get('errors', [])}")
print()
print("| query | median (s) | min (s) | budget (s) | mode |")
print("|---|---|---|---|---|")
for q in sorted(med):
    m = med[q]
    mn = mins.get(q, m)
    b = max(1.0, 2 * m)
    mode = ("cache-read" if q in CACHE_READ
            else "live alarm" if q in LIVE_ALARM else "computing")
    print(f"| {q} | {m:.2f} | {mn:.2f} | {b:.1f} | {mode} |")
