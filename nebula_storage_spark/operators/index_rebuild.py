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
    to, never the whole projection. A `_layout.json` sidecar pins
    {n_buckets, key, key_type} so the catch-up validates its modulus
    instead of trusting the caller (bucketed_layout module header)."""
    from ..bucketed_layout import BUCKET_COL, bucket_id, write_layout_sidecar
    cols = list(index_cols) + [c for c in (include_cols or base.columns)
                               if c not in index_cols]
    lead = index_cols[0]
    (base.select(*cols)
     .withColumn(BUCKET_COL, bucket_id(lead, n_buckets))
     .repartition(BUCKET_COL)
     .sortWithinPartitions(*index_cols)
     .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path))
    write_layout_sidecar(path, lead, n_buckets,
                         base.schema[lead].dataType.simpleString(),
                         index_cols)
    return base.sparkSession.read.parquet(path).drop(BUCKET_COL)


def apply_index_delta(spark: SparkSession, path: str, adds: DataFrame,
                      deletes: DataFrame, index_cols: list[str],
                      key_col: str = VID,
                      n_buckets: int | None = None) -> DataFrame:
    """RebuildIndexTask op-log catch-up (admin/RebuildIndexTask.cpp:
    the task scans a snapshot, then drains the writes buffered while it
    ran): apply `adds` (full index rows — upsert by key) and `deletes`
    ((leading-index-value, key) pairs — the op-log carries the encoded
    index key, so the delete knows its bucket) to the bucketed
    projection at `path`.

    Scale shape: ONE dynamic-partition-overwrite job that reads only the
    touched `_bucket=` directories (partition pruning on the delta's
    bucket set) and rewrites only those — O(|delta| + touched buckets),
    while the rest of a 100 TB projection is untouched bytes. The
    prune → merge → overwrite → vanished-bucket-drop mechanics are the
    SHARED definition in bucketed_layout (one copy for this and the
    keyed-mutation applies — r10 verdict Next #3), and the modulus is
    validated against the projection's `_layout.json` sidecar
    (`n_buckets=None` reads it from there)."""
    from pyspark.sql import functions as F

    from ..bucketed_layout import (
        BUCKET_COL, align_key_types, bucket_id, overwrite_touched_buckets,
        validate_layout)
    lead = index_cols[0]
    n_buckets, _ = validate_layout(path, lead, n_buckets)
    cur_all = spark.read.parquet(path)
    adds = align_key_types(adds, cur_all.schema, [lead, key_col])
    deletes = align_key_types(deletes, cur_all.schema, [lead, key_col])
    bucket = bucket_id(lead, n_buckets)
    adds_b = adds.withColumn(BUCKET_COL, bucket)
    dels_b = deletes.withColumn(BUCKET_COL, bucket)
    # bucket-id list: <= n_buckets small integers of driver-side layout
    # metadata (drives partition pruning), never data rows
    touched = [r[BUCKET_COL] for r in
               adds_b.select(BUCKET_COL).union(dels_b.select(BUCKET_COL))
               .distinct().collect()]
    cur = cur_all.filter(F.col(BUCKET_COL).isin(touched))
    # upsert then delete (op-log order: a delete logged after an add
    # wins): drop current rows whose key reappears in the log, append
    # the adds that survive the deletes
    drop_keys = (adds_b.select(key_col)
                 .union(dels_b.select(key_col)).distinct())
    adds_live = adds_b.join(dels_b.select(key_col).distinct(),
                            key_col, "left_anti")
    merged = (cur.join(drop_keys, key_col, "left_anti")
              .unionByName(adds_live.select(*cur.columns)))
    overwrite_touched_buckets(spark, path, merged, lead, n_buckets,
                              index_cols, touched)
    return spark.read.parquet(path).drop(BUCKET_COL)
