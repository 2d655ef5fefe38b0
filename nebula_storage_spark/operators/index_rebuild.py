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
