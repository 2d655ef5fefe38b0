"""Index rebuild task (SURVEY §2 row 26).

Reference: admin/RebuildIndexTask.cpp, RebuildTagIndexTask.cpp,
RebuildEdgeIndexTask.cpp — scan base data, regenerate order-preserving
index keys, catch up concurrent writes from an op-log.

Spark-native: a "secondary index" is a derived table laid out for the
predicate — repartitioned on the leading index column and sorted within
partitions on the full index key, so parquet row-group min/max statistics
prune range scans the way the reference's order-preserving key encoding
prunes RocksDB ranges. Rebuilding = one deterministic batch job rewriting
that projection (no op-log: batch jobs see a consistent snapshot).

At 100 TB the projection would be bucketed (`.bucketBy(n, key)`) into a
metastore table so repeated lookup joins also skip the shuffle; plain
parquet + repartition keeps the demo hermetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..graph import VID


def rebuild_index(base: DataFrame, index_cols: list[str], path: str,
                  num_partitions: int = 8, include_cols: list[str] | None = None,
                  ) -> DataFrame:
    """Rewrite `base` as an index-layout projection at `path` and return
    the reloaded frame. Columns: index_cols + (include_cols or all)."""
    cols = list(index_cols) + [c for c in (include_cols or base.columns)
                               if c not in index_cols]
    (base.select(*cols)
     .repartition(num_partitions, index_cols[0])
     .sortWithinPartitions(*index_cols)
     .write.mode("overwrite").parquet(path))
    return base.sparkSession.read.parquet(path)


def rebuild_index_bucketed(base: DataFrame, index_cols: list[str],
                           path: str, n_buckets: int = 8,
                           include_cols: list[str] | None = None,
                           ) -> DataFrame:
    """Index projection laid out in HASH-BUCKET partition directories
    (`_bucket=<i>/`), sorted on the index key within each bucket — the
    layout that makes the op-log catch-up below a partial rewrite:
    a delta touches only the bucket dirs its leading index values hash
    to, never the whole projection."""
    cols = list(index_cols) + [c for c in (include_cols or base.columns)
                               if c not in index_cols]
    from pyspark.sql import functions as F
    (base.select(*cols)
     .withColumn("_bucket", F.pmod(F.hash(index_cols[0]),
                                   F.lit(n_buckets)))
     .repartition("_bucket")
     .sortWithinPartitions(*index_cols)
     .write.mode("overwrite").partitionBy("_bucket").parquet(path))
    return base.sparkSession.read.parquet(path).drop("_bucket")


def apply_index_delta(spark: SparkSession, path: str, adds: DataFrame,
                      deletes: DataFrame, index_cols: list[str],
                      key_col: str = VID, n_buckets: int = 8) -> DataFrame:
    """RebuildIndexTask op-log catch-up (admin/RebuildIndexTask.cpp:
    the task scans a snapshot, then drains the writes buffered while it
    ran): apply `adds` (full index rows — upsert by key) and `deletes`
    ((leading-index-value, key) pairs — the op-log carries the encoded
    index key, so the delete knows its bucket) to the bucketed
    projection at `path`.

    Scale shape: ONE dynamic-partition-overwrite job that reads only the
    touched `_bucket=` directories (partition pruning on the delta's
    bucket set) and rewrites only those — O(|delta| + touched buckets),
    while the rest of a 100 TB projection is untouched bytes."""
    from pyspark.sql import functions as F
    lead = index_cols[0]
    bucket = F.pmod(F.hash(F.col(lead)), F.lit(n_buckets))
    adds_b = adds.withColumn("_bucket", bucket)
    dels_b = deletes.withColumn("_bucket", bucket)
    # bucket-id list: <= n_buckets small integers of driver-side layout
    # metadata (drives partition pruning), never data rows
    touched = [r._bucket for r in
               adds_b.select("_bucket").union(dels_b.select("_bucket"))
               .distinct().collect()]
    cur = (spark.read.parquet(path)
           .filter(F.col("_bucket").isin(touched)))
    # upsert then delete (op-log order: a delete logged after an add
    # wins): drop current rows whose key reappears in the log, append
    # the adds that survive the deletes
    drop_keys = (adds_b.select(key_col)
                 .union(dels_b.select(key_col)).distinct())
    adds_live = adds_b.join(dels_b.select(key_col).distinct(),
                            key_col, "left_anti")
    merged = (cur.join(drop_keys, key_col, "left_anti")
              .unionByName(adds_live.select(*cur.columns)))
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                           "static")
    present = {r._bucket for r in
               merged.select("_bucket").distinct().collect()}
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        (merged.repartition("_bucket")
         .sortWithinPartitions(*index_cols)
         .write.mode("overwrite").partitionBy("_bucket").parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
    # dynamic overwrite only replaces partitions PRESENT in the written
    # data — a touched bucket whose rows were all deleted must be
    # dropped explicitly or its stale files survive (on a cluster this
    # is the storage API's prefix delete / a table format's remove log)
    import os
    import shutil
    for b in set(touched) - present:
        d = os.path.join(path, f"_bucket={b}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    return spark.read.parquet(path).drop("_bucket")
