#!/usr/bin/env python
"""Per-query STRUCTURAL metrics from the Spark UI REST API (r14 probe,
same methodology as the r13 round's /tmp/probe_metrics.py): for each
named query, run repetitions exactly like bench.py (noop sink, rewarm
between queries) and report per-repetition job count, input bytes,
shuffle read/write bytes, and executor CPU. Job/byte counts are
load-independent — the primary A/B evidence on a throttled host.

Usage: python probe_metrics.py q1 q2 ...   (or ALL)
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nebula_storage_spark.cache import release_all as cache_release_all
from pyspark.sql import SparkSession


def get_spark_ui(cpus: int) -> SparkSession:
    return (SparkSession.builder
            .master(f"local[{cpus}]")
            .appName("r14-probe")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4049")
            .getOrCreate())


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4049/api/v1/{path}") as r:
        return json.loads(r.read())


def app_id() -> str:
    return rest("applications")[0]["id"]


def stage_totals(aid: str):
    """Sum metrics over all COMPLETE stages; returns (n_stages, dict)."""
    stages = rest(f"applications/{aid}/stages?status=complete")
    tot = {"input": 0, "sread": 0, "swrite": 0, "cpu": 0}
    for s in stages:
        tot["input"] += s.get("inputBytes", 0)
        tot["sread"] += s.get("shuffleReadBytes", 0)
        tot["swrite"] += s.get("shuffleWriteBytes", 0)
        tot["cpu"] += s.get("executorCpuTime", 0)
    return len(stages), tot


def n_jobs(aid: str) -> int:
    return len(rest(f"applications/{aid}/jobs"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark_ui(cpus)
    spark.sparkContext.setLogLevel("WARN")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nebula_storage_spark.graph import tpch_graph
    from nebula_storage_spark.workload import build_queries
    queries = build_queries()
    names = sys.argv[1:]
    g = tpch_graph(spark, sf_dir)

    def rewarm():
        cache_release_all()
        spark.catalog.clearCache()
        for df in (*g.vertices.values(), *g.edges.values(),
                   *g.reverse_edges.values()):
            df.persist()
        for etype in ("placed", "contains"):
            g.edges[etype].count()

    rewarm()
    aid = app_id()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        reps = []
        for rep in range(3):
            j0 = n_jobs(aid)
            _, t0 = stage_totals(aid)
            w0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            wall = time.perf_counter() - w0
            time.sleep(0.3)
            j1 = n_jobs(aid)
            _, t1 = stage_totals(aid)
            reps.append({
                "wall_s": round(wall, 3),
                "jobs": j1 - j0,
                "input_mb": round((t1["input"] - t0["input"]) / 1e6, 1),
                "sread_mb": round((t1["sread"] - t0["sread"]) / 1e6, 2),
                "swrite_mb": round((t1["swrite"] - t0["swrite"]) / 1e6, 2),
                "cpu_s": round((t1["cpu"] - t0["cpu"]) / 1e9, 1),
            })
        out[name] = reps
        rewarm()
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: reps}), flush=True)
    with open("/tmp/probe_out.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
