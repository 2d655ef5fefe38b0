#!/usr/bin/env python
"""Isolated per-query band measurement — bench.py's exact protocol
(fault-in warm + resident-store materialization + untimed pass, then
best-of-3 with the rewarm cadence) for a NAMED SUBSET of headliners,
plus a control query and the load self-labels. This is the
betweenness/kmeans/coloring isolation protocol from BENCH_NOTES made
repeatable: when a driver record shows an outlier, re-measure it here
on an idle host and read the record against the band (r10 verdict,
Next #2).

Usage: python tools/isolated_band.py [sf_dir] query [query ...]
       (control basket_affinity is always appended)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cached_kb, _cpu_calib_s, _loadavg
from nebula_storage_spark.cache import release_all as cache_release_all
from nebula_storage_spark.session import get_spark
from nebula_storage_spark.workload import build_queries

CONTROL = "basket_affinity"


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)]
    if CONTROL not in names:
        names.append(CONTROL)
    spark = get_spark("isolated-band")
    queries = build_queries()

    load_before = _loadavg()
    calib_before = _cpu_calib_s()
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

    def rewarm():
        cache_release_all()
        spark.catalog.clearCache()
        for df in (*g.vertices.values(), *g.edges.values(),
                   *g.reverse_edges.values()):
            df.persist()
        for etype in ("placed", "contains"):
            g.edges[etype].count()

    for name in names:                      # untimed warm pass
        queries[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        rewarm()

    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        rewarm()

    print(json.dumps({
        "protocol": "isolated_band(best-of-3, warm, rewarm cadence)",
        "sf_dir": sf_dir,
        "queries": timings,
        "control": CONTROL,
        "cached_kb": _cached_kb(),
        "load": {"loadavg_before": load_before,
                 "loadavg_after": _loadavg(),
                 "cpu_calib_s_before": calib_before,
                 "cpu_calib_s_after": _cpu_calib_s()},
    }))


if __name__ == "__main__":
    main()
