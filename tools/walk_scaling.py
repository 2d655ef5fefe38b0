#!/usr/bin/env python
"""Walk-corpus scaling: seconds AND shuffle-write bytes vs |E| at
1×/10×/100× amplification for the walk family (operators/walk.py) —
the last iterative surface without a measured curve (loop_scaling.py
covers the nine fixpoint/round headliners; walks are K bounded joins,
not a fixpoint, so they get their own harness).

The docstrings' 100 TB posture: the ranked adjacency is built once
(one window shuffle), each step is one equi-join of the walk frontier
against it — so TOTAL shuffle should be ~one pass over |E| (the
adjacency build, plus Catalyst's ReusedExchange serving every step's
reference) regardless of step count, with per-step cost dominated by
the adjacency-side scan. Two frontier regimes, both claims measured:

  - fixed    500 seeds from replica 0 while |E| grows 100× — the
             incremental-corpus regime. Shuffle should stay ~one
             adjacency pass; seconds grow with the per-step scan.
  - deepwalk one walk per vertex (frontier grows WITH the graph — how
             DeepWalk/node2vec corpora are actually generated).
             Shuffle adds ~K × |walks| frontier rows; seconds stay
             ~linear in |E|.

Shuffle bytes come from the UI REST API (sketch_scaling.py's method):
the session runs with the UI on and each cell diffs completed stages'
shuffleWriteBytes around the query.

Gates: walk determinism makes outputs comparable across factors — the
md5-PRF draw depends only on (walk_id, step), and replica subgraphs
are disjoint copies, so replica-0 seeds must produce BIT-IDENTICAL
paths at every factor (checked via a path-multiset hash for the fixed
regime; the deepwalk regime checks rows == |V| exactly).

Usage: python tools/walk_scaling.py [sf_dir] [--factors 1,10,100]
                                    [--ops random,node2vec] [--reps N]
       python tools/walk_scaling.py [sf_dir] --ksweep [factor]
           # shuffle bytes vs STEP COUNT at one factor (fixed 500-seed
           # frontier): the per-step-re-exchange tripwire. The cached
           # adjacency must make the per-step byte delta frontier-sized
           # — a two-key step join regression shows up as ~one |E|
           # exchange (~12 MB/M edges) per extra step.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from nebula_storage_spark.graph import DST, SRC
from nebula_storage_spark.operators.walk import (node2vec_walks,
                                                 random_walks,
                                                 release_walk_caches)

REP_STRIDE = 10 ** 9
UI_PORT = 4097
N_FIXED_SEEDS = 500


def get_spark_with_ui() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("walk-scaling")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_DRIVER_MEM", "48g"))
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", str(UI_PORT))
            .getOrCreate())


def _stages(app_id: str) -> dict[tuple[int, int], int]:
    url = (f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
           f"/stages?status=complete")
    out = {}
    for s in json.load(urllib.request.urlopen(url)):
        out[(s["stageId"], s["attemptId"])] = s.get("shuffleWriteBytes", 0)
    return out


def measured(app_id, fn):
    before = _stages(app_id)
    t0 = time.time()
    res = fn()
    dt = time.time() - t0
    sw = sum(v for k, v in _stages(app_id).items() if k not in before)
    return dt, sw, res


def amplify(edges, factor: int, parts: int = 32):
    if factor == 1:
        return edges.select(SRC, DST).repartition(parts, SRC)
    reps = F.broadcast(edges.sparkSession.range(factor)
                       .select(F.col("id").alias("_rep")))
    return (edges.select(SRC, DST).crossJoin(reps)
            .select((F.col(SRC) + F.col("_rep") * REP_STRIDE).alias(SRC),
                    (F.col(DST) + F.col("_rep") * REP_STRIDE).alias(DST))
            .repartition(parts, SRC))


def base_graph(spark, sf: str):
    """q_connected_components_doubling's bipartite placed graph — the
    shared loop_scaling gate graph with mid-range degree."""
    from nebula_storage_spark.workload import _cc_gate_graph
    return _cc_gate_graph(spark, sf)


def fixed_seeds(edges):
    """500 lowest replica-0 source vids (deterministic)."""
    return (edges.filter(F.col(SRC) < REP_STRIDE)
            .select(F.col(SRC).alias("node")).distinct()
            .orderBy("node").limit(N_FIXED_SEEDS))


def all_seeds(edges):
    """one walk per vertex (DeepWalk corpus mode)."""
    return (edges.select(F.col(SRC).alias("node"))
            .union(edges.select(F.col(DST).alias("node"))).distinct())


OPS = {
    "random": lambda e, s: random_walks(e, s, steps=4),
    "node2vec": lambda e, s: node2vec_walks(e, s, steps=3),
}


def path_hash(df):
    """order-independent multiset hash of (walk_id, path) — the
    cross-factor determinism witness for replica-0 walks."""
    # 48-bit terms: a 500-row sum stays < 2^57, no bigint overflow
    return (df.select(F.sum(F.expr(
        "CAST(conv(substring(md5(concat_ws('|', walk_id, path)), 1, 12),"
        " 16, 10) AS BIGINT)")).alias("h")).collect()[0]["h"])


def slope(cells, ykey) -> float:
    xs = [math.log(c["edges"]) for c in cells]
    ys = [math.log(max(c[ykey], 1.0)) for c in cells]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    return (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            / sum((x - mx) ** 2 for x in xs))


def ksweep(sf: str, factor: int) -> int:
    """shuffle bytes vs step count at one amplification factor."""
    spark = get_spark_with_ui()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId
    e = amplify(base_graph(spark, sf), factor).persist()
    n_e = e.count()
    seeds = fixed_seeds(e).persist()
    seeds.count()
    bad = False
    for op, steps_list in (("random", (2, 4, 8)), ("node2vec", (1, 3, 6))):
        fn = {"random": lambda k: random_walks(e, seeds, steps=k),
              "node2vec": lambda k: node2vec_walks(e, seeds, steps=k)}[op]
        fn(min(steps_list)).count()          # untimed warmup + build
        cells = []
        for k in steps_list:
            dt, sw, _ = measured(app_id, lambda: fn(k).count())
            cells.append((k, sw))
            print(json.dumps({"op": op, "edges": n_e, "steps": k,
                              "seconds": round(dt, 3),
                              "shuffle_kb": round(sw / 1024, 1)}),
                  flush=True)
        per_step = ((cells[-1][1] - cells[0][1])
                    / (cells[-1][0] - cells[0][0]))
        # tripwire: one |E| exchange is ~12 MB per 1 M edges; a healthy
        # per-step delta is frontier-sized (KBs at 500 walks). The
        # 512 KB floor absorbs AQE/metadata noise at tiny |E| — but
        # below ~430 k edges the floor, not the |E|-proportional
        # limit, is the binding gate, and a re-exchange of a SMALL
        # adjacency could hide under it; print which bound binds so a
        # pass at small scale is never silently floor-shaped.
        limit = 0.1 * n_e * 12.0 / 1_000_000 * 2**20
        floor = 512 * 1024
        threshold = max(limit, floor)
        ok = per_step <= threshold
        binding = "floor" if floor >= limit else "edges-proportional"
        print(json.dumps({
            "op": op, "per_step_shuffle_mb": round(per_step / 2**20, 3),
            "threshold_mb": round(threshold / 2**20, 3),
            "binding": binding, "ok": ok}), flush=True)
        print(f"{op}: per-step shuffle delta "
              f"{per_step / 2**20:.2f} MB vs threshold "
              f"{threshold / 2**20:.2f} MB [{binding}] "
              f"({'OK' if ok else 'RE-EXCHANGE'})", flush=True)
        if binding == "floor":
            print(f"{op}: WARNING: 512 KB floor binds at |E|={n_e:,} — "
                  f"run a larger --ksweep factor for an "
                  f"|E|-proportional gate", flush=True)
        bad = bad or not ok
        release_walk_caches()   # per-op adjacency frames, op done
    return 1 if bad else 0


def main() -> int:
    args = list(sys.argv[1:])
    factors = [1, 10, 100]
    ops = list(OPS)
    reps = 1
    if "--ksweep" in args:
        i = args.index("--ksweep")
        factor = 10
        if i + 1 < len(args) and args[i + 1].isdigit():
            factor = int(args[i + 1])
            del args[i + 1]
        args.remove("--ksweep")
        return ksweep(args[0] if args else "/root/testdata/sf0.1", factor)
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

    spark = get_spark_with_ui()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId
    base = base_graph(spark, sf)

    cells_by = {}
    base_hash = {}
    violated = False
    for factor in sorted(factors):
        e = amplify(base, factor).persist()
        n_e = e.count()
        n_v = (e.select(F.col(SRC).alias("v"))
               .union(e.select(F.col(DST).alias("v")))
               .distinct().count())
        for op in ops:
            for regime, seeder in (("fixed", fixed_seeds),
                                   ("deepwalk", all_seeds)):
                seeds = seeder(e).persist()
                n_s = seeds.count()
                if factor == min(factors):
                    OPS[op](e, seeds).count()      # untimed codegen warmup
                best_t = best_b = n_rows = None
                for _ in range(max(1, reps)):
                    dt, sw, n_rows = measured(
                        app_id, lambda: OPS[op](e, seeds).count())
                    best_t = dt if best_t is None else min(best_t, dt)
                    best_b = sw if best_b is None else min(best_b, sw)
                ok = True
                if regime == "fixed":
                    # untimed determinism witness (re-derives the small
                    # fixed-frontier corpus off the warm caches)
                    h = path_hash(OPS[op](e, seeds))
                    key = (op, regime)
                    if key not in base_hash:
                        base_hash[key] = h
                    ok = h == base_hash[key] and n_rows == n_s
                    if not ok:
                        print(f"DETERMINISM VIOLATION: {op}/{regime} "
                              f"f{factor}: hash {h} vs {base_hash[key]}",
                              flush=True)
                else:
                    ok = n_rows == n_v
                    if not ok:
                        print(f"ROWS VIOLATION: {op}/{regime} f{factor}:"
                              f" {n_rows} walks vs {n_v} vertices",
                              flush=True)
                seeds.unpersist()
                violated = violated or not ok
                cell = {"op": op, "regime": regime, "factor": factor,
                        "edges": n_e, "walks": n_s,
                        "seconds": round(best_t, 3),
                        "shuffle_kb": round(best_b / 1024, 1), "ok": ok}
                cells_by.setdefault((op, regime), []).append(cell)
                print(json.dumps(cell), flush=True)
        e.unpersist()
        # walk ops persist their adjacency frames internally; since
        # round 9 release_walk_caches() drains the PACKAGE persist
        # registry (walk adjacencies included — nothing else is
        # pinned in this tool's loop), leaving spark.catalog caches
        # (the amplified edge frame handled above) untouched
        release_walk_caches()

    print("\n| op | regime | factor | edges | walks | seconds "
          "| shuffle KB |")
    print("|---|---|---|---|---|---|---|")
    for (op, regime), cells in cells_by.items():
        for c in cells:
            print(f"| {op} | {regime} | {c['factor']}× | {c['edges']:,} "
                  f"| {c['walks']:,} | {c['seconds']} "
                  f"| {c['shuffle_kb']:,} |")
    print("\nlog-log slope vs edges (1.0 = linear, ~0 = flat):")
    for (op, regime), cells in cells_by.items():
        if len(cells) >= 2:
            print(f"  {op}/{regime}: seconds "
                  f"{slope(cells, 'seconds'):.2f}, shuffle-bytes "
                  f"{slope(cells, 'shuffle_kb'):.2f}")
    return 1 if violated else 0


if __name__ == "__main__":
    sys.exit(main())
