#!/usr/bin/env python
"""Iterative-analytics loop scaling: per-round wall time vs |E| at
1×/10×/100× amplification (r6 verdict item 2 — the one scale claim for
the loop family that was argued, not measured).

The gate graphs top out at a few hundred thousand edges at sf0.1, so
"per-round cost is linear in |E|" was evidenced only by plan shape.
This tool amplifies each operator's own bench-graph JVM-side — no new
testdata — by replicating edges with a vid offset per replica
(ann_crossover's pattern): the amplified graph is F disjoint copies of
the base, so round COUNTS stay constant (identical structure per copy)
while per-round WORK scales exactly ×F — the isolation that makes
"seconds per round vs |E|" a clean regression target.

Measured per (operator, factor):
  - edges:      |E| after amplification (persisted + counted untimed);
  - seconds:    wall time of the full call incl. one materializing
                count of the result (min of `--reps` runs, default 1;
                every operator is warmed untimed at the smallest
                factor first, so no cell pays first-run codegen);
  - rounds:     the loop's round count (fixed iterations for
                pagerank/k_core/cc; SCC_STATS telemetry for scc);
  - sec_per_round, vertices (|V| — also the per-round checkpoint
    payload: each round persists/localCheckpoints one or two bigints
    per vertex, so checkpoint bytes ≈ 16·vertices + row overhead);
  - regime:     'broadcast' if |V| is under BROADCAST_MAX_NODES (the
                per-round frame broadcasts; the persisted edges never
                move) else 'shuffle' (the 10⁹-vertex plan).

Scaling verdict per operator = least-squares slope of
log(sec_per_round) vs log(edges) across factors: ~1.0 is linear;
meaningfully >1 names a follow-up. Results print as one JSON line per
cell + a markdown table for BENCH_NOTES.

Usage: python tools/loop_scaling.py [sf_dir] [--factors 1,10,100]
                                    [--ops pagerank,k_core,...]
                                    [--reps N]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nebula_storage_spark.graph import DST, SRC
from nebula_storage_spark.operators.analytics import (
    BROADCAST_MAX_NODES, BROADCAST_MAX_NODES_SINGLE_KEY, SCC_STATS,
    connected_components_doubling, greedy_coloring, k_core_fixed,
    label_propagation_fixed, maximal_independent_set, pagerank_fixed,
    personalized_pagerank, scc_coloring, sssp_fixed)

# ops on the lower single-key gate (see the constants' comment)
SINGLE_KEY_OPS = frozenset({"pagerank", "personalized_pagerank"})
from nebula_storage_spark.session import get_spark

REP_STRIDE = 10 ** 9   # all gate-graph vids are far below 1e9


def amplify(edges, factor: int, parts: int = 32):
    """F disjoint copies of (src, dst, *extra), replica r offset by
    r*STRIDE; non-endpoint columns (e.g. sssp's weight) pass through."""
    extra = [c for c in edges.columns if c not in (SRC, DST)]
    if factor == 1:
        return edges.repartition(parts, SRC)
    spark = edges.sparkSession
    reps = F.broadcast(spark.range(factor)
                       .select(F.col("id").alias("_rep")))
    return (edges.crossJoin(reps)
            .select((F.col(SRC) + F.col("_rep") * REP_STRIDE).alias(SRC),
                    (F.col(DST) + F.col("_rep") * REP_STRIDE).alias(DST),
                    *extra)
            .repartition(parts, SRC))


def pagerank_graph(spark, sf_dir):
    """q_pagerank's undirected customer↔order graph — IMPORTED from
    workload.py so the tool always measures the gated graph."""
    from nebula_storage_spark.workload import _pagerank_gate_graph
    return _pagerank_gate_graph(spark, sf_dir)


def cc_graph(spark, sf_dir):
    """q_connected_components_doubling's bipartite placed graph
    (shared workload helper, as above)."""
    from nebula_storage_spark.workload import _cc_gate_graph
    return _cc_gate_graph(spark, sf_dir)


def k_core_graph(spark, sf_dir):
    """q_k_core's co-order part projection."""
    from nebula_storage_spark.workload import _co_order_pairs
    return _co_order_pairs(spark, sf_dir)


def scc_graph(spark, sf_dir):
    """q_scc_coloring_full's derived successor-cycle + DAG-chain graph."""
    from nebula_storage_spark.workload import _scc_gate_graph
    return _scc_gate_graph(spark, sf_dir)


def betweenness_graph(spark, sf_dir):
    """q_betweenness_2hop's two-layer traversal graph folded into ONE
    edge frame (layer 0 = customer->order, layer 1 = order->part,
    distinct) so the replica amplifier applies: offsetting BOTH
    endpoints by r*STRIDE keeps each replica a disjoint two-layer
    graph, so paths/sigma/bc grow exactly linearly — the clean regime
    for reading the pair-key shuffle's slope."""
    from nebula_storage_spark.graph import tpch_graph
    g = tpch_graph(spark, sf_dir)
    placed = (g.edges["placed"].select(SRC, DST)
              .withColumn("layer", F.lit(0)))
    contains = (g.edges["contains"].select(SRC, DST).distinct()
                .withColumn("layer", F.lit(1)))
    return placed.unionByName(contains)


def run_betweenness(e):
    from nebula_storage_spark.workload_ext4 import betweenness_2hop_frames
    placed = (e.filter(F.col("layer") == 0)
              .select(F.col(SRC).alias("c"), F.col(DST).alias("o")))
    contains = (e.filter(F.col("layer") == 1)
                .select(F.col(SRC).alias("o"), F.col(DST).alias("p")))
    return betweenness_2hop_frames(placed, contains)


def sssp_graph(spark, sf_dir):
    """q_sssp_distances' weighted 3-layer undirected graph (shared
    workload helper: placed w=1, contains w=l_quantity). Single-source:
    only replica 0's component carries finite distances in amplified
    graphs, so the cell measures the round's edge-scan/join side —
    exactly the part that scales with |E|; the frontier side is
    |V|-bounded by construction."""
    from nebula_storage_spark.workload import _sssp_gate_graph
    return _sssp_gate_graph(spark, sf_dir)


# op -> (graph builder, runner(edges) -> (result_df, rounds))
OPS = {
    "pagerank": (pagerank_graph,
                 lambda e: (pagerank_fixed(e, iterations=5), 5)),
    "k_core": (k_core_graph,
               lambda e: (k_core_fixed(e, k=4, rounds=3), 3)),
    "connected_components_doubling": (
        cc_graph,
        lambda e: (connected_components_doubling(e, iterations=3), 3)),
    "scc_coloring_full": (scc_graph, None),   # rounds from SCC_STATS
    # round-7 widening: the rest of the iterative-loop headliner family
    "label_propagation": (
        cc_graph,
        lambda e: (label_propagation_fixed(e, iterations=3), 3)),
    "sssp_distances": (
        sssp_graph,
        lambda e: (sssp_fixed(e, source=1, iterations=4), 4)),
    "maximal_independent_set": (
        k_core_graph,
        lambda e: (maximal_independent_set(e, rounds=4), 4)),
    "personalized_pagerank": (
        pagerank_graph,
        lambda e: (personalized_pagerank(
            e, seeds=[0, 1, 2, 3, 4], iterations=5), 5)),
    "greedy_coloring": (
        pagerank_graph,
        lambda e: (greedy_coloring(e, rounds=3), 3)),
    # round-9 widening (r8 verdict, Next #3): the one heavy headliner
    # family with a pair-keyed shuffle and no measured 10x/100x curve.
    # Not iterative — "rounds" = 1, so sec_per_round is total seconds
    # and the slope reads the sigma join's growth directly.
    "betweenness_2hop": (
        betweenness_graph,
        lambda e: (run_betweenness(e), 1)),
}


def run_scc(e):
    out = scc_coloring(e, driver_tail_edges=0)
    return out, None


def n_vertices(edges) -> int:
    return (edges.select(F.col(SRC).alias("v"))
            .union(edges.select(F.col(DST).alias("v")))
            .distinct().count())


def one_cell(spark, op: str, build, runner, sf: str, factor: int,
             reps: int) -> dict:
    base = build(spark, sf)
    e = amplify(base, factor).persist()
    n_e = e.count()                       # materialize before any timer
    n_v = n_vertices(e)
    best = None
    rounds = None
    for _ in range(max(1, reps)):
        t0 = time.time()
        if op == "scc_coloring_full":
            out, _ = run_scc(e)
            out.count()
            dt = time.time() - t0
            rounds = (len(SCC_STATS["outer"]),
                      sum(SCC_STATS["fixpoint_rounds"]))
        else:
            out, r = runner(e)
            out.count()
            dt = time.time() - t0
            rounds = r
        best = dt if best is None else min(best, dt)
    e.unpersist()
    spark.catalog.clearCache()            # release per-round leftovers
    if isinstance(rounds, tuple):
        outer, fix = rounds
        n_rounds = outer + fix            # one distributed pass each
        rounds_desc = f"{outer} outer + {fix} fixpoint"
    else:
        n_rounds = rounds
        rounds_desc = str(rounds)
    cell = {
        "op": op, "factor": factor, "edges": n_e, "vertices": n_v,
        "seconds": round(best, 3), "rounds": rounds_desc,
        "sec_per_round": round(best / n_rounds, 3),
        "regime": ("broadcast"
                   if n_v <= (BROADCAST_MAX_NODES_SINGLE_KEY
                              if op in SINGLE_KEY_OPS
                              else BROADCAST_MAX_NODES)
                   else "shuffle"),
    }
    print(json.dumps(cell), flush=True)
    return cell


def slope(cells) -> float:
    """log-log least-squares slope of sec_per_round vs edges."""
    xs = [math.log(c["edges"]) for c in cells]
    ys = [math.log(max(c["sec_per_round"], 1e-3)) for c in cells]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> int:
    args = list(sys.argv[1:])
    factors = [1, 10, 100]
    ops = list(OPS)
    reps = 1
    if "--factors" in args:
        i = args.index("--factors")
        factors = [int(x) for x in args[i + 1].split(",")]
        del args[i:i + 2]
    if "--ops" in args:
        i = args.index("--ops")
        ops = args[i + 1].split(",")
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    sf = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark("loop-scaling")

    by_op: dict[str, list] = {}
    for op in ops:
        build, runner = OPS[op]
        # warm THIS op at the smallest factor, untimed: without it the
        # first timed cell pays first-run codegen/scan costs the larger
        # cells don't, inflating sec_per_round at the smallest |E| and
        # systematically DEFLATING the log-log slope — the statistic
        # the sweep gates on.
        w = amplify(build(spark, sf), min(factors)).persist()
        w.count()
        (run_scc(w)[0] if op == "scc_coloring_full"
         else runner(w)[0]).count()
        w.unpersist()
        spark.catalog.clearCache()
        for f in factors:
            by_op.setdefault(op, []).append(
                one_cell(spark, op, build, runner, sf, f, reps))

    print("\n| operator | factor | edges | vertices | rounds | total s "
          "| s/round | regime |")
    print("|---|---|---|---|---|---|---|---|")
    for op, cells in by_op.items():
        for c in cells:
            print(f"| {op} | {c['factor']}× | {c['edges']:,} "
                  f"| {c['vertices']:,} | {c['rounds']} "
                  f"| {c['seconds']} | {c['sec_per_round']} "
                  f"| {c['regime']} |")
    print("\nlog-log slope of s/round vs |E| (1.0 = linear):")
    for op, cells in by_op.items():
        if len(cells) >= 2:
            print(f"  {op}: {slope(cells):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
