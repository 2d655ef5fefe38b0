#!/usr/bin/env python
"""Bench-faithful per-query timing for A/B decisions (r14): same noop
sink, same rewarm cadence, same best-of-3 as bench.py, PLUS the cold
(rep-1) time reported separately (r13 verdict Next #6: wins that exist
only in reps 2-3 are repetition reuse, not speedups). CPU calibration
sampled before/after exactly like bench.py.

Usage: python ab_bench.py q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nebula_storage_spark.cache import release_all as cache_release_all
from nebula_storage_spark.session import get_spark
from nebula_storage_spark.workload import build_queries


def _cpu_calib_s(n: int = 10_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFFFFFF
    return round(time.perf_counter() - t0, 4)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14-ab")
    queries = build_queries()
    names = sys.argv[1:]
    from nebula_storage_spark.graph import tpch_graph
    g = tpch_graph(spark, sf_dir)

    def rewarm():
        cache_release_all()
        spark.catalog.clearCache()
        for df in (*g.vertices.values(), *g.edges.values(),
                   *g.reverse_edges.values()):
            df.persist()
        for etype in ("placed", "contains"):
            g.edges[etype].count()

    calib0 = _cpu_calib_s()
    # untimed warm pass (JIT/codegen) with the same rewarm cadence
    rewarm()
    for name in names:
        queries[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        rewarm()
    cold, best = {}, {}
    for name in names:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        cold[name] = round(times[0], 4)
        best[name] = round(min(times), 4)
        rewarm()
    calib1 = _cpu_calib_s()
    print(json.dumps({"best": best, "cold": cold,
                      "calib": [calib0, calib1]}))


if __name__ == "__main__":
    main()
