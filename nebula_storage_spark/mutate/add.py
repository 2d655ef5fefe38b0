"""AddVertices / AddEdges — batch insert with ifNotExists.

Reference: mutate/AddVerticesProcessor.cpp:23-341 (ifNotExists keeps the
FIRST write :96-109,185-201; last-write-wins otherwise since later puts
overwrite), AddEdgesProcessor.cpp:139-320. Index maintenance (:227-283) is
moot here — one columnar table per tag/edge carries every column, so there
is no separate index structure to co-update; the atomic row+index batch
collapses to one table write.

Spark semantics on an immutable table: the "write" is a transformation
producing the post-image frame (the caller persists it — overwrite parquet,
or Delta MERGE where available).

  ifNotExists=True : existing rows win; new rows only where the key is
                     absent AND first-within-batch wins for duplicate keys
                     inside the incoming batch itself.
  ifNotExists=False: last-write-wins upsert of the batch over existing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F

from ..graph import DST, RANK, SRC, VID


def _merge(existing: DataFrame, batch: DataFrame, keys: Sequence[str],
           if_not_exists: bool, order_col: str | None) -> DataFrame:
    keys = list(keys)
    if if_not_exists:
        fresh = batch.join(existing.select(*keys), keys, "left_anti")
        # first-write-wins inside the batch: deterministic pick by order_col
        # when provided, else arbitrary-but-single row per key
        if order_col and order_col in fresh.columns:
            w = W.partitionBy(*keys).orderBy(F.col(order_col).asc())
            fresh = (fresh.withColumn("_rn", F.row_number().over(w))
                          .filter(F.col("_rn") == 1).drop("_rn"))
        else:
            fresh = fresh.dropDuplicates(keys)
        return existing.unionByName(fresh, allowMissingColumns=True)
    # plain insert = overwrite-on-key (RocksDB put semantics)
    kept = existing.join(batch.select(*keys), keys, "left_anti")
    dedup_batch = batch.dropDuplicates(keys)
    return kept.unionByName(dedup_batch, allowMissingColumns=True)


def add_vertices(existing: DataFrame, batch: DataFrame,
                 if_not_exists: bool = False,
                 order_col: str | None = None) -> DataFrame:
    """Post-image of a tag table after inserting `batch` (keyed by _vid)."""
    return _merge(existing, batch, [VID], if_not_exists, order_col)


def add_edges(existing: DataFrame, batch: DataFrame,
              if_not_exists: bool = False,
              order_col: str | None = None) -> DataFrame:
    """Post-image of an edge table after inserting `batch`.

    Edge identity is the full key (src, rank, dst) within the type's table
    (NebulaKeyUtils.h:48-54). The reference's TOSS out/in-edge double-write
    (AddEdgesAtomicProcessor.cpp) is unnecessary: we store one copy and
    traverse IN-direction via dst-side join.
    """
    return _merge(existing, batch, [SRC, DST, RANK], if_not_exists, order_col)
