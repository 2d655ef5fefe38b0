#!/usr/bin/env python
"""Checkpoint-cadence arm for the coloring loop family (r10 verdict,
Next #6): greedy_coloring / scc_coloring are the slowest headliners
and their gate-scale cost is fixed per-round overhead, of which the
eager localCheckpoint (materialize + upload blocks + truncate lineage)
is a candidate component. Before changing any default, MEASURE:

  * greedy_coloring sweeps `ckpt_every` ∈ {1, 2, 3}: cadence 1 is the
    shipping per-round truncation; higher cadences persist() between
    checkpoints (materialization without the block upload, lineage
    depth bounded by the cadence).
  * scc_coloring (driver_tail_edges=0, the end-to-end distributed
    loop) sweeps `fixpoint_ckpt_cadence` ∈ {4, 2} around the shipping
    4 inside _min_label_fixpoint. Cadence 8 is NOT in the default
    sweep: measured once at 1× it did not complete within 15 minutes
    (vs 19 s at cadence 4) — the driver pegged one core in Catalyst
    analysis of the 7-round-deep lineage, the exact pathology the
    checkpoint truncation exists to bound. Recorded as a decisive
    negative; pass --scc-arms 4,2,8 to reproduce.

Each cell: best of --reps runs at 1×/10× amplification (loop_scaling's
disjoint-copy pattern — round counts stay constant, per-round work
scales ×F), with a BIT-IDENTITY gate: every arm's collected result
must equal the shipping arm's exactly (checkpoint cadence must never
change values — a mismatch means the arm is broken, not slow).

The verdict's contract: record the arm either way — a measured
negative is fine (the refit-bincount precedent).

Usage: python tools/coloring_cadence.py [sf_dir] [--factors 1,10]
                                        [--reps 2] [--ops greedy,scc]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nebula_storage_spark.cache import release_all
from nebula_storage_spark.graph import DST, SRC
from nebula_storage_spark.operators.analytics import (greedy_coloring,
                                                      scc_coloring)
from nebula_storage_spark.session import get_spark

REP_STRIDE = 10 ** 9


def amplify(edges, factor: int, parts: int = 32):
    if factor == 1:
        return edges.repartition(parts, SRC)
    reps = F.broadcast(edges.sparkSession.range(factor)
                       .select(F.col("id").alias("_rep")))
    return (edges.crossJoin(reps)
            .select((F.col(SRC) + F.col("_rep") * REP_STRIDE).alias(SRC),
                    (F.col(DST) + F.col("_rep") * REP_STRIDE).alias(DST))
            .repartition(parts, SRC))


def collect_sorted(df):
    return sorted(map(tuple, df.collect()))


def run_arms(name, edges, arms, call, reps):
    """arms: {label: kwargs}; first arm is the shipping default and
    the bit-identity baseline."""
    results = []
    baseline_rows = None
    # untimed warm pass (first arm's kwargs): codegen, JIT, committers —
    # without it the first arm measured pays cold-start the others don't
    release_all()
    edges.sparkSession.catalog.clearCache()
    edges.persist().count()
    call(edges, **next(iter(arms.values()))).count()
    for label, kw in arms.items():
        best = float("inf")
        rows = None
        for _ in range(reps):
            release_all()
            edges.sparkSession.catalog.clearCache()
            edges.persist().count()
            t0 = time.perf_counter()
            out = call(edges, **kw)
            rows = collect_sorted(out)
            best = min(best, time.perf_counter() - t0)
        if baseline_rows is None:
            baseline_rows = rows
        cell = {"op": name, "arm": label, "sec": round(best, 3),
                "rows": len(rows),
                "bit_identical": rows == baseline_rows}
        results.append(cell)
        print(json.dumps(cell), flush=True)
    return results


def main() -> int:
    args = list(sys.argv[1:])
    factors = [1, 10]
    reps = 2
    ops = ["greedy", "scc"]
    greedy_arms = [1, 2, 3]
    scc_arms = [4, 2]
    if "--greedy-arms" in args:
        # arm tokens: "2" = legacy path at cadence 2; "2f" = the FUSED
        # incremental-used-mask path (r11 verdict Next #4) at cadence 2;
        # "2c" = the COUNTER path (r12 verdict Next #3: beaten-selection
        # folded into the delta aggregation, no per-round act frame)
        i = args.index("--greedy-arms")
        greedy_arms = args[i + 1].split(",")
        del args[i:i + 2]
    if "--scc-arms" in args:
        i = args.index("--scc-arms")
        scc_arms = [int(x) for x in args[i + 1].split(",")]
        del args[i:i + 2]
    if "--factors" in args:
        i = args.index("--factors")
        factors = [int(x) for x in args[i + 1].split(",")]
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    if "--ops" in args:
        i = args.index("--ops")
        ops = args[i + 1].split(",")
        del args[i:i + 2]
    sf = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark("coloring-cadence")
    from nebula_storage_spark.workload import (_pagerank_gate_graph,
                                               _scc_gate_graph)

    all_cells = []
    bad = False
    for factor in sorted(factors):
        if "greedy" in ops:
            e = amplify(_pagerank_gate_graph(spark, sf), factor)
            arms = {}
            for tok in greedy_arms:
                tok = str(tok)
                fused: bool | str = tok.endswith("f")
                if tok.endswith("c"):
                    fused = "counter"
                k = int(tok.rstrip("fc"))
                label = f"ckpt_every={k}" + (
                    ",counter" if fused == "counter"
                    else ",fused" if fused else "")
                arms[label] = {"rounds": 3, "ckpt_every": k,
                               "fused": fused}
            cells = run_arms(f"greedy_coloring@{factor}x", e, arms,
                             lambda ed, **kw: greedy_coloring(ed, **kw),
                             reps)
            all_cells += cells
            e.unpersist()
        if "scc" in ops:
            e = amplify(_scc_gate_graph(spark, sf), factor)
            arms = {f"fixpoint_cadence={k}":
                    {"driver_tail_edges": 0, "fixpoint_ckpt_cadence": k}
                    for k in scc_arms}
            cells = run_arms(f"scc_coloring@{factor}x", e, arms,
                             lambda ed, **kw: scc_coloring(ed, **kw),
                             reps)
            all_cells += cells
            e.unpersist()

    print("\n| op | arm | sec | rows | bit-identical |")
    print("|---|---|---|---|---|")
    for c in all_cells:
        print(f"| {c['op']} | {c['arm']} | {c['sec']} | {c['rows']} "
              f"| {c['bit_identical']} |")
        bad = bad or not c["bit_identical"]
    if bad:
        print("BIT-IDENTITY VIOLATION")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
