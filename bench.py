#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

The headliners are the scan/join/agg-shaped workloads where a columnar
engine should match or beat the reference's single-node numbers
(BASELINE.md: lookup scans, bulk ops, full scans — not µs point reads).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nebula_storage_spark.cache import release_all as cache_release_all
from nebula_storage_spark.session import get_spark
from nebula_storage_spark.workload import build_queries

HEADLINERS = [
    "tpch_q1",            # full lineitem scan + agg (pricing summary)
    "tpch_q3_top10",      # 3-way join + agg + top-k
    "region_revenue",     # multi-hop traversal via broadcast joins
    "go_stats",           # per-vertex edge stats (AggregateNode parity)
    "go_limit",           # per-vertex top-k (WindowGroupLimit path)
    "lookup_prefix",      # index-lookup semantics (pushed filters)
    "scan_vertex",        # projection scan
    "stats_task",         # space-wide counts (StatisTask parity)
    "dedup_distinct",     # DeDupNode
    "events_window",      # windowed event aggregation
    "add_edges_overwrite",  # bulk mutate post-image
    "ttl_visibility",     # TTL-filtered scan
    "text_features",      # pipeline: per-doc quality features (codegen map)
    "dedup_minhash_lsh",  # pipeline: shingle->minhash->band->verify
    "knn_bruteforce",     # pipeline: cosine top-k over embeddings
    "sessionize",         # event sessions (window functions)
    "tpch_q6",            # pushed-filter scan + single agg
    "corpus_curation",    # end-to-end pipeline composition
    "pagerank",           # iterative analytics (5 rounds)
    "decontaminate",      # pipeline: benchmark n-gram scrub (broadcast join)
    "knn_hyperplane_lsh",  # pipeline: LSH-bucketed ANN (vs brute force)
    "asof_last_purchase",  # as-of join (union-and-window, one shuffle)
    "range_click_attribution",  # interval join (bin-bucketed equi-join)
    "triangle_counts",    # degree-ordered triangle counting
    "sssp_distances",     # 4-round Bellman-Ford shortest paths
    "kmeans_embeddings",  # integer fixed-point Lloyd clustering
    "tpch_q5",            # snowflake join, broadcast dims
    "tpch_q10",           # top-k returns with total-order limit
    "tpch_q18",           # large-order customers (agg-filter semi join)
    "k_core",             # iterative peel (localCheckpoint rounds)
    "label_propagation",  # most-frequent-neighbour-label rounds
    "connected_components_doubling",  # pointer-doubling CC (log rounds)
    "tpch_q9_shape",      # profit rollup: broadcast dims + integer money
    "edge_triangle_support",  # per-edge triangle counts (k-truss step)
    "bm25_topk",          # integer BM25 ranking (TakeOrdered top-k)
    "harmonic_centrality",  # BFS-ball centrality (frontier expansion)
    "node2vec_walks",     # second-order biased walks (interval draw)
    "greedy_coloring",    # Jones-Plassmann rounds (MIS-style joins)
    "basket_affinity",    # market-basket lift (HOF pairs + TakeOrdered)
    "betweenness_2hop",   # sigma-fraction betweenness (pair-key shuffle)
    "bpe_train_merges",   # iterative BPE trainer (corpus read once)
    "knn_pq_adc",         # product-quantization ADC scan
    "knn_pq_rerank",      # PQ ADC top-R -> exact-rerank composition (r9)
    "scc_coloring",       # trim/color/peel SCC (pointer doubling rounds)
    # round-7 baseline-gate widening (r6 verdict #3): two more queries
    # with direct BASELINE.md comparators
    "lookup_residual",    # residual-filter lookup vs ref full-index sweep
    "upsert_update_cond",  # conditional upsert post-image vs ref upsert rate
]


def _cached_kb() -> int:
    """Linux page-cache size from /proc/meminfo (kB), -1 if unreadable.
    Recorded before/after the warm phase so a cold-cache record is
    self-labeling (BENCH_r07 landed 1.24x of the clean envelope purely
    because a prior tenant evicted the page cache to ~1 GB)."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("Cached:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return -1


def _loadavg() -> list[float]:
    """1/5/15-min run-queue averages from /proc/loadavg, [-1]*3 if
    unreadable. Recorded before/after the run so a load-inflated
    record is self-labeling: BENCH_r10 landed 1.57x of the same-HEAD
    clean envelope purely because other tenants loaded the host (warm
    phase 251 s vs r9's 184 s on identical code), and nothing in the
    JSON said so (r10 verdict, Next #1 — the cached_kb precedent)."""
    try:
        with open("/proc/loadavg") as fh:
            return [float(x) for x in fh.read().split()[:3]]
    except (OSError, ValueError):
        return [-1.0, -1.0, -1.0]


def _cpu_calib_s(n: int = 10_000_000) -> float:
    """~1 s single-thread CPU calibration: a FIXED integer loop (pure
    Python LCG fold, no allocation), timed. CPU contention inflates
    this directly — a clean host on this VM class reads ~0.9-1.0 s,
    so a reading far above the recorded clean band marks the whole
    record as load-inflated, independent of /proc/loadavg (which can
    read high from IO-wait alone)."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFFFFFF
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("nebula-bench")
    queries = build_queries()

    # Warm phase (UNTIMED). best-of-3 inside the timed loop cannot
    # absorb a host-wide page-cache eviction that happens BEFORE the
    # run (r7: the driver record landed 1.24x of six clean same-HEAD
    # runs; the immediate warm re-run was 0.96x). So before any timer:
    # (a) fault every byte of the testdata parquet into the page cache,
    # (b) materialize the resident graph store, (c) one full untimed
    # pass over the headliner list — warms JVM JIT, codegen caches,
    # Python worker pools and the library pages an eviction also drops.
    cached_before_kb = _cached_kb()
    load_before = _loadavg()
    calib_before_s = _cpu_calib_s()
    t_warm = time.perf_counter()
    for fn in sorted(os.listdir(sf_dir)):
        p = os.path.join(sf_dir, fn)
        if os.path.isfile(p):
            with open(p, "rb") as fh:
                while fh.read(1 << 22):
                    pass
    from nebula_storage_spark.graph import tpch_graph
    g = tpch_graph(spark, sf_dir)
    for etype in ("placed", "contains"):
        g.edges[etype].count()
    queries["scan_vertex"](spark, sf_dir).count()

    # Steady-state methodology, matching the reference baseline: the
    # numbers in BASELINE.md are folly::Benchmark per-op averages over
    # many warm iterations. Run each query up to three times and report
    # the best; the cold run additionally pays plan compile + codegen,
    # which folly's loop likewise excludes, and the third run absorbs
    # GC-pause outliers on the heavy pipeline queries (observed ±1 s
    # run-to-run on a loaded host).
    def rewarm():
        # Per-query persisted frames otherwise accumulate across 40+
        # headliners and the storage-memory/GC pressure inflates the
        # LATE queries' numbers 3-6x (measured: kmeans 0.69 s fresh vs
        # 4.4 s at position 27). Clearing between queries makes each
        # number order-independent. clearCache also unregisters the
        # resident store's persist markers, so re-persist them (the
        # two hot edge frames re-materialize here, outside the timers;
        # the rest re-cache during each query's first repetition,
        # which best-of-3 absorbs — per-query warmness comes from the
        # repetitions, not cross-query cache survival).
        # Drain the package persist registry FIRST (round 9): builders
        # pin adjacency/centroid/round frames they cannot release
        # themselves; release_all() is the deterministic half of that
        # contract and also keeps the registry list from growing
        # across 45+ headliners. clearCache() then sweeps anything
        # persisted outside the registry (resident store, ad-hoc).
        cache_release_all()
        spark.catalog.clearCache()
        for df in (*g.vertices.values(), *g.edges.values(),
                   *g.reverse_edges.values()):
            df.persist()
        for etype in ("placed", "contains"):
            g.edges[etype].count()

    # (c) the untimed full headliner pass, with the same rewarm cadence
    # as the timed loop so persisted frames never accumulate across 45
    # queries (page-cache/JIT warmth survives clearCache; storage-
    # memory pressure does not).
    for name in HEADLINERS:
        queries[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        rewarm()
    warm_sec = round(time.perf_counter() - t_warm, 2)
    cached_after_kb = _cached_kb()

    timings: dict[str, float] = {}
    for name in HEADLINERS:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        rewarm()

    load_after = _loadavg()
    calib_after_s = _cpu_calib_s()
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "warm": {"sec": warm_sec,
                 "cached_kb_before": cached_before_kb,
                 "cached_kb_after": cached_after_kb},
        "load": {"loadavg_before": load_before,
                 "loadavg_after": load_after,
                 "cpu_calib_s_before": calib_before_s,
                 "cpu_calib_s_after": calib_after_s},
    }))


if __name__ == "__main__":
    main()
