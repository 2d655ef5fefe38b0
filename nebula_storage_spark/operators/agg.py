"""StatisTask — space-wide statistics job.

Reference: admin/StatisTask.cpp:129-290 — scans every part and produces
vertex count, edge count, per-tag counts, per-edge-type counts.

Spark: a union of counts. Each branch is a count over a columnar scan that
prunes to zero data columns (count(*) over parquet footer metadata where
possible) — embarrassingly parallel at any scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..graph import GraphStore


def stats_task(store: GraphStore) -> DataFrame:
    frames: list[DataFrame] = []
    for tag, df in sorted(store.vertices.items()):
        frames.append(store.tag_df(tag).agg(
            F.lit("tag").alias("kind"), F.lit(tag).alias("name"),
            F.count(F.lit(1)).alias("cnt")))
    for etype, df in sorted(store.edges.items()):
        frames.append(store.edge_df(etype).agg(
            F.lit("edge").alias("kind"), F.lit(etype).alias("name"),
            F.count(F.lit(1)).alias("cnt")))
    return reduce(lambda a, b: a.unionByName(b), frames)
