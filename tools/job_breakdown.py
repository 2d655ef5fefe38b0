#!/usr/bin/env python
"""Count Spark jobs per named query execution, with job descriptions,
from the UI REST API — identifies WHICH driver round-trips a warm
repetition pays (r14 measurement pass, guide §1/§5).

Usage: python job_breakdown.py <query> [query...]
"""
from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4048/api/v1/{path}") as r:
        return json.loads(r.read())


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .appName("r14-jobs")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4048")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    from nebula_storage_spark.cache import release_all
    from nebula_storage_spark.graph import tpch_graph
    from nebula_storage_spark.workload import build_queries
    queries = build_queries()
    g = tpch_graph(spark, sf_dir)

    def rewarm():
        release_all()
        spark.catalog.clearCache()
        for df in (*g.vertices.values(), *g.edges.values(),
                   *g.reverse_edges.values()):
            df.persist()
        for etype in ("placed", "contains"):
            g.edges[etype].count()

    aid = rest("applications")[0]["id"]
    for name in sys.argv[1:]:
        rewarm()
        # warm pass
        queries[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        rewarm()
        j0 = len(rest(f"applications/{aid}/jobs"))
        queries[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        jobs = rest(f"applications/{aid}/jobs")
        new = [j for j in jobs if j["jobId"] >= j0]
        print(f"=== {name}: {len(new)} warm jobs ===")
        for j in sorted(new, key=lambda x: x["jobId"]):
            ms = None
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
                ms = (datetime.strptime(j["completionTime"], fmt)
                      - datetime.strptime(j["submissionTime"], fmt)
                      ).total_seconds()
            except Exception:
                pass
            print(f"  job {j['jobId']}: {ms if ms is not None else '?'}s "
                  f"stages={len(j.get('stageIds', []))} "
                  f"desc={j.get('description', '')[:110]}")


if __name__ == "__main__":
    main()
