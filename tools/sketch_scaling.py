#!/usr/bin/env python
"""Sketch-family shuffle constancy: MEASURED shuffle-write bytes vs
input size at 1×/10×/100× amplification — the claim every sketch
docstring makes ("shuffle volume is bounded by groups × state size
regardless of input size", operators/sketch.py) turned from an
argument about partial aggregation into a curve.

Unlike the other scaling tools this one measures BYTES, not just
seconds: the session runs with the UI's REST API on, and each cell
diffs /api/v1/.../stages (completed stages' shuffleWriteBytes) around
the query. That is the executor-reported per-stage shuffle write — the
exact quantity that becomes network traffic on a real cluster.

Input: the events table, amplified with replica-offset user_ids
(user universe grows ×F — the regime where exact COUNT(DISTINCT)
must shuffle every distinct value) and unchanged event_type groups.
The amplified frame is persisted and pre-counted, so cells measure the
aggregation, not the parquet scan.

Ops:
  - hll           hll_cardinality(user_id by event_type, p=8): partial
                  agg keeps ≤ groups × 2^p rows per map task; shuffle
                  should stay ~flat while input grows 100×.
  - pct_bins      the histogram-percentile pipeline (types × bins
                  cells; q_events_value_percentiles' shape): same flat
                  claim. Exactness gate: replicating the corpus leaves
                  every P50/P90/P99 bin IDENTICAL to the 1× answer.
  - cms           count-min frequency estimates for 20 fixed
                  base-replica users (d=4, w=1024): the sketch is d·w
                  cells regardless of input, so shuffle stays ~flat.
                  The probed users live only in replica 0, so their
                  TRUE counts are constant across factors while the
                  colliding mass grows with N — the never-underestimate
                  guarantee plus a 3·N/w overestimate bound gate it.
  - exact_distinct  groupBy(event_type).count_distinct(user_id) — the
                  CONTROL: its shuffle is the distinct (group, user)
                  universe and must grow ~linearly. The hll-vs-exact
                  byte ratio at 100× is the 100 TB argument in one
                  number. (Bloom shares the same partial-agg shape —
                  ≤ m set bits — and is covered by the same claim.)

Gates: hll estimate within 16% (≈2.5σ at p=8's 1.04/√256 ≈ 6.5%
standard error — a sanity witness for the sketch math, not the claim
under test; all event types share one user universe, so a single hash
draw's bias shows up identically in every group) of the exact
per-group cardinality at every factor; pct_bins output within ONE
bin of the 1× output per (type, p) — replication multiplies every
cumulative count and the total by exactly F, but the floor nearest-rank
(p·total·F) DIV 100 can exceed F·((p·total) DIV 100) by up to F−1, so
a rank landing exactly on a bin boundary may legitimately step one bin.
Slopes: log-log shuffle-bytes vs rows ≈ 0 for sketches, ≈ 1 for the
control. NOTE the flat claim needs input ≫ tasks × groups × state
(partial-agg saturation): measure at sf0.1, not sf0.01.

Usage: python tools/sketch_scaling.py [sf_dir] [--factors 1,10,100]
                                      [--reps N]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window as W, functions as F

from nebula_storage_spark.operators.sketch import (count_min_estimates,
                                                   hll_estimate,
                                                   hll_registers)

REP_STRIDE = 10 ** 9
UI_PORT = 4098


def get_spark_with_ui() -> SparkSession:
    """get_spark()'s config block with the UI's REST API enabled (the
    library session keeps the UI off; this tool needs the stage-metrics
    endpoint)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("sketch-scaling")
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
    """(seconds, shuffle-write bytes, result) of fn() — bytes = sum of
    shuffleWriteBytes over stages completed by the call."""
    before = _stages(app_id)
    t0 = time.time()
    res = fn()
    dt = time.time() - t0
    after = _stages(app_id)
    sw = sum(v for k, v in after.items() if k not in before)
    return dt, sw, res


def amplify(ev, factor: int, parts: int = 32):
    """F replica copies with offset user/event ids: the distinct-user
    universe grows ×F, groups (event_type) and the value distribution
    are unchanged."""
    sel = ev.select("event_type", "user_id", "value")
    if factor == 1:
        return sel.repartition(parts)
    reps = F.broadcast(ev.sparkSession.range(factor)
                       .select(F.col("id").alias("_rep")))
    return (sel.crossJoin(reps)
            .select("event_type",
                    (F.col("user_id") + F.col("_rep") * REP_STRIDE)
                    .alias("user_id"), "value")
            .repartition(parts))


def run_hll(ev):
    # sketch-only path: the registered query's hll_cardinality() also
    # computes the exact count as its accuracy witness, which would
    # add the control's shuffle to the sketch's measurement
    regs = hll_registers(ev, "user_id", ["event_type"], p=8)
    return {r["event_type"]: r["n_est"]
            for r in hll_estimate(regs, ["event_type"], p=8).collect()}


def run_exact(ev):
    return {r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n")).collect()}


CMS_QUERY_USERS = list(range(20))     # base-replica user ids


def run_cms(ev):
    items = ev.select(F.col("user_id").alias("item"))
    queries = ev.sparkSession.createDataFrame(
        [(u,) for u in CMS_QUERY_USERS], "item bigint")
    return {r["item"]: r["cnt_est"]
            for r in count_min_estimates(items, queries).collect()}


def run_pct(ev, width: int = 5):
    bins = (ev.select("event_type",
                      F.expr(f"CAST(floor(value / {width}) AS BIGINT)")
                      .alias("bin"))
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("cnt")))
    wcum = (W.partitionBy("event_type").orderBy("bin")
            .rowsBetween(W.unboundedPreceding, 0))
    wtot = W.partitionBy("event_type")
    cum = bins.select("event_type", "bin",
                      F.sum("cnt").over(wcum).alias("cum"),
                      F.sum("cnt").over(wtot).alias("total"))
    out = None
    for p in (50, 90, 99):
        need = F.expr(f"greatest(CAST(({p} * total) DIV 100 AS BIGINT),"
                      f" CAST(1 AS BIGINT))")
        hit = (cum.filter(F.col("cum") >= need)
               .groupBy("event_type")
               .agg(F.min("bin").alias("bin"))
               .select("event_type", F.lit(p).alias("p"),
                       (F.col("bin") * width).cast("long")
                       .alias("approx_lo")))
        out = hit if out is None else out.unionByName(hit)
    return {(r["event_type"], r["p"]): r["approx_lo"]
            for r in out.collect()}


OPS = {
    "hll": run_hll,
    "pct_bins": run_pct,
    "cms": run_cms,
    "exact_distinct": run_exact,
}


def slope(cells, ykey) -> float:
    xs = [math.log(c["rows"]) for c in cells]
    ys = [math.log(max(c[ykey], 1.0)) for c in cells]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    return (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            / sum((x - mx) ** 2 for x in xs))


def main() -> int:
    args = list(sys.argv[1:])
    factors = [1, 10, 100]
    reps = 1
    if "--factors" in args:
        i = args.index("--factors")
        factors = [int(x) for x in args[i + 1].split(",")]
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    sf = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark_with_ui()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))

    by_op: dict[str, list] = {}
    violated = False
    pct_base = None
    for factor in sorted(factors):
        a = amplify(ev, factor).persist()
        rows = a.count()
        exact = None
        for op in OPS:
            if factor == min(factors):
                OPS[op](a)                     # untimed warmup (codegen)
            best_t = best_b = result = None
            for _ in range(max(1, reps)):
                dt, sw, result = measured(app_id, lambda: OPS[op](a))
                best_t = dt if best_t is None else min(best_t, dt)
                best_b = sw if best_b is None else min(best_b, sw)
            ok = True
            if op == "exact_distinct":
                exact = result
            elif op == "hll":
                hll_res = result
            elif op == "cms":
                truth = {r["user_id"]: r["n"] for r in
                         a.filter(F.col("user_id")
                                  .isin(CMS_QUERY_USERS))
                         .groupBy("user_id")
                         .agg(F.count(F.lit(1)).alias("n")).collect()}
                bound = 3 * rows // 1024      # ~3x the per-row E[collision]
                ok = all(result.get(u, 0) >= truth.get(u, 0)
                         and result.get(u, 0) - truth.get(u, 0) <= bound
                         for u in CMS_QUERY_USERS)
                if not ok:
                    print(f"CMS VIOLATION f{factor}: est {result} vs "
                          f"true {truth}", flush=True)
            elif op == "pct_bins":
                if pct_base is None:
                    pct_base = result
                ok = (set(result) == set(pct_base)
                      and all(abs(v - pct_base[k]) <= 5  # one bin width
                              for k, v in result.items()))
                if not ok:
                    print(f"EXACTNESS VIOLATION: pct_bins f{factor} "
                          f"differs from base: {result}", flush=True)
            cell = {"op": op, "factor": factor, "rows": rows,
                    "seconds": round(best_t, 3),
                    "shuffle_kb": round(best_b / 1024, 1), "ok": ok}
            violated = violated or not ok
            by_op.setdefault(op, []).append(cell)
            print(json.dumps(cell), flush=True)
        # hll accuracy gate against the same factor's exact counts
        for g, est in hll_res.items():
            if abs(est - exact[g]) > 0.16 * exact[g]:
                violated = True
                print(f"ACCURACY VIOLATION: hll f{factor} {g}: "
                      f"{est} vs exact {exact[g]}", flush=True)
        a.unpersist()

    print("\n| op | factor | rows | seconds | shuffle KB |")
    print("|---|---|---|---|---|")
    for op, cells in by_op.items():
        for c in cells:
            print(f"| {op} | {c['factor']}× | {c['rows']:,} "
                  f"| {c['seconds']} | {c['shuffle_kb']:,} |")
    print("\nlog-log slope vs rows (1.0 = linear, ~0 = flat):")
    for op, cells in by_op.items():
        if len(cells) >= 2:
            print(f"  {op}: shuffle-bytes {slope(cells, 'shuffle_kb'):.2f},"
                  f" seconds {slope(cells, 'seconds'):.2f}")
    return 1 if violated else 0


if __name__ == "__main__":
    sys.exit(main())
