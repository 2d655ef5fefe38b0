#!/usr/bin/env python
"""Measure AQE skew-join mitigation on a synthetically skewed join.

The reference hash-partitions by vid (utils/NebulaKeyUtils.h:97-99) and a
super-node simply makes one part hot — there is no runtime re-plan. The
Spark posture is AQE: `spark.sql.adaptive.skewJoin` splits an oversized
partition into sub-partitions and replicates the matching build side, at
runtime, from shuffle statistics. This tool builds a join where one key
holds half of a 4M-row fact side (the other half is uniform over 1000
keys), disables auto-broadcast so the join must shuffle, and times the
join with skew handling OFF vs ON. Results go to BENCH_NOTES.md.

Usage: python tools/skew_demo.py [n_rows] [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nebula_storage_spark.session import get_spark


def run(n_rows: int = 4_000_000, n_runs: int = 3) -> None:
    spark = get_spark("skew-demo")
    # half the fact rows land on key 0; the rest spread over 1000 keys
    fact = (spark.range(n_rows)
            .select(F.when(F.col("id") % 2 == 0, F.lit(0))
                    .otherwise(F.col("id") % 1000).alias("k"),
                    (F.col("id") * 37 % 1000).alias("payload"))
            .persist())
    dim = (spark.range(1000)
           .select(F.col("id").alias("k"),
                   F.md5(F.col("id").cast("string")).alias("attr"))
           .persist())
    fact.count(), dim.count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # force the skew splitter to consider our partition sizes (defaults
    # target multi-GB partitions; the demo is deliberately small)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                   "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")

    def timed(skew_on: bool) -> tuple[float, bool]:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       str(skew_on).lower())
        best, skewed = float("inf"), False
        for _ in range(n_runs):
            df = fact.join(dim, "k").agg(F.count(F.lit(1)), F.max("attr"))
            t0 = time.monotonic()
            df.collect()
            best = min(best, time.monotonic() - t0)
            # AQE annotates the re-planned join with "skew=true" when it
            # split the oversized partition — the factual signal that the
            # mitigation engaged (wall-clock on local[32] understates the
            # benefit: all threads share one memory pool, so the hot
            # partition has no straggler effect; on a real cluster the
            # unsplit partition IS the stage's critical path)
            plan = df._jdf.queryExecution().executedPlan().toString()
            skewed = skewed or ("skew=true" in plan
                                or "and skewed" in plan)
        return best, skewed

    off, off_skewed = timed(False)
    on, on_skewed = timed(True)
    print(f"rows={n_rows} skew_off_best={off:.2f}s (split={off_skewed}) "
          f"skew_on_best={on:.2f}s (split={on_skewed}) "
          f"speedup={off / on:.2f}x")
    spark.stop()


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 3)
