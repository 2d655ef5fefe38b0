"""Keyed mutation against a hash-bucketed table layout — the write-path
100 TB posture for the mutate family (upsert / delete / TTL purge).

The logical operators (mutate/upsert.py, mutate/delete.py,
mutate/ttl.py) return full-table post-images: correct at any scale as
ONE declarative job, but a deployment that persisted the post-image
naively would rewrite the whole table per batch. The reference prices
exactly this path as a per-key KV write + index batch
(mutate/AddVerticesProcessor.cpp:227-283: one RocksDB WriteBatch per
part, touching only the parts the keys hash to). The Spark-native
equivalent is a PARTIAL REWRITE against a bucketed layout:

  * the table lives in `_bucket = pmod(hash(key), n_buckets)`
    partition directories (rebuild_index_bucketed's layout; a
    metastore deployment would use `bucketBy` + ALTER ... BUCKETS,
    and the 8-buckets-per-amplification-factor sizing rule keeps
    bucket SIZE constant as the corpus grows), with a `_layout.json`
    sidecar pinning {n_buckets, key, key_type} so an apply with a
    mismatched modulus or key dtype FAILS instead of silently
    routing keys to wrong buckets (bucketed_layout.validate_layout /
    align_key_types — r10 ADVICE);
  * a mutation batch touches only the buckets its keys hash to —
    the read prunes to those directories (partition pruning on a
    driver-side bucket-id list: <= n_buckets small integers of layout
    metadata, never data rows), the SAME merge semantics run over
    that slice (upsert() / the delete anti-join, so exactness
    inherits the driver-checked operators), and ONE
    dynamic-partition-overwrite rewrites only the touched dirs
    (bucketed_layout.overwrite_touched_buckets — the single shared
    definition, also used by the index op-log catch-up);
  * therefore the rewrite is O(|batch| + touched-bucket bytes), not
    O(table) — measured as a 1x/10x/100x curve with a byte-diff gate
    in tools/mutate_scaling.py (r9 verdict, Next #1).

TTL is the one mutation with no key: expired rows live EVERYWHERE in a
key-bucketed layout, so its 100 TB posture is a TIME-partitioned
layout instead — day directories, where the purge drops whole expired
days as metadata/file deletes and rewrites ZERO bytes (the same
reasoning as index_scaling's "file removals are O(1) metadata ops").
That is what RocksDB's CompactionFilter amortizes into compaction
(storage/CompactionFilter.h:35-183); a partitioned table makes it a
partition drop, the layout every TTL'd production table uses.

Deployment substitution: the directory drops here are local-FS calls
standing in for `FileSystem.delete(dir, recursive=True)` /
`ALTER TABLE ... DROP PARTITION` on a real deployment — see the
bucketed_layout module header for the full contract; everything else
(pruned reads, the dynamic-overwrite write) is portable as written.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..bucketed_layout import (
    BUCKET_COL, align_key_types, bucket_id, overwrite_touched_buckets,
    touched_bucket_ids, validate_layout, write_layout_sidecar)
from .upsert import upsert


def write_bucketed(df: DataFrame, key: str, path: str,
                   n_buckets: int = 8) -> None:
    """Lay `df` out in `_bucket=` hash-partition directories on `key`
    (rebuild_index_bucketed's layout for base tables), recording the
    layout in a `_layout.json` sidecar the apply functions validate."""
    (df.withColumn(BUCKET_COL, bucket_id(key, n_buckets))
     .repartition(BUCKET_COL)
     .sortWithinPartitions(key)
     .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path))
    write_layout_sidecar(path, key, n_buckets,
                         df.schema[key].dataType.simpleString(), [key])


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(BUCKET_COL)


def upsert_bucketed(spark: SparkSession, path: str, batch: DataFrame,
                    keys: Sequence[str],
                    set_exprs: Mapping[str, Column | str],
                    n_buckets: int | None = None,
                    condition: Column | str | None = None,
                    insertable: bool = True,
                    schema=None) -> list[int]:
    """Apply a conditional upsert batch to the bucketed table at `path`
    IN PLACE, rewriting only the buckets the batch's keys hash to.
    Merge semantics are upsert()'s (UpdateVertexProcessor parity) run
    over the pruned slice — identical post-image to running it over
    the full table, because rows outside the touched buckets cannot
    match any batch key (same hash ⇒ same bucket) and the insert
    branch lands each new key in exactly its hash bucket.
    `n_buckets=None` reads the modulus from the layout sidecar; a
    given value must match it. Returns the touched bucket ids."""
    keys = list(keys)
    lead = keys[0]
    n_buckets, _ = validate_layout(path, lead, n_buckets)
    cur = spark.read.parquet(path)
    batch = align_key_types(batch, cur.schema, keys)
    touched = touched_bucket_ids(batch, lead, n_buckets)
    cur = cur.filter(F.col(BUCKET_COL).isin(touched)).drop(BUCKET_COL)
    post = upsert(cur, batch, keys, set_exprs, condition=condition,
                  insertable=insertable, schema=schema)
    overwrite_touched_buckets(spark, path, post, lead, n_buckets,
                              [lead], touched)
    return touched


def delete_bucketed(spark: SparkSession, path: str, key_frame: DataFrame,
                    keys: str | Sequence[str],
                    n_buckets: int | None = None) -> list[int]:
    """Delete the rows whose key tuple appears in `key_frame` (the
    DeleteVertices / DeleteEdges anti-join, mutate/delete.py) rewriting
    only the touched buckets. `keys` may be composite — the reference's
    edge delete keys on (src, type, rank, dst)
    (mutate/DeleteEdgesProcessor.cpp) — in which case the table is
    bucketed on the LEAD key (edge parts hash on src,
    utils/NebulaKeyUtils.h:17-19) and the anti-join matches on ALL of
    them. Returns the touched bucket ids."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    lead = keys[0]
    n_buckets, _ = validate_layout(path, lead, n_buckets)
    cur = spark.read.parquet(path)
    key_frame = align_key_types(key_frame, cur.schema, keys)
    touched = touched_bucket_ids(key_frame, lead, n_buckets)
    cur = cur.filter(F.col(BUCKET_COL).isin(touched)).drop(BUCKET_COL)
    post = cur.join(F.broadcast(key_frame.select(*keys).distinct()),
                    keys, "left_anti")
    overwrite_touched_buckets(spark, path, post, lead, n_buckets,
                              keys, touched)
    return touched


def write_day_partitioned(df: DataFrame, day_col: str, path: str) -> None:
    """Lay a TTL'd table out in `<day_col>=` partition directories —
    the time-partitioned layout the TTL purge needs (module header).
    Hash-partitioning on the day column groups each day into one task
    (one file per day dir here; a 100 TB table would leave the
    day-internal parallelism to maxRecordsPerFile)."""
    (df.repartition(day_col)
     .write.mode("overwrite").partitionBy(day_col).parquet(path))


def ttl_purge_partitions(spark: SparkSession, path: str, day_col: str,
                         min_live_day: str) -> tuple[int, int]:
    """Physically purge expired data from the day-partitioned table at
    `path`: drop every `<day_col>=<d>` directory with d < min_live_day
    (ISO date strings — lexicographic order IS chronological). Pure
    metadata/file deletes: ZERO bytes are rewritten, the partitioned
    analogue of the compaction-filter drop (mutate/ttl.py's full-scan
    filter stays the layout-agnostic fallback and the read-time
    semantics stay in catalog.apply_read_semantics). Day granularity
    is intentional: a row expiring MID-day stays physically present —
    but read-invisible via the catalog's TTL filter — until its whole
    day drops, exactly how the reference's expired rows stay on disk
    (invisible per CommonUtils.h:217-233) until a compaction happens
    to claim them. The rmtree stands in for the storage API's
    recursive delete / DROP PARTITION (module header);
    `refreshByPath` keeps this session's cached file listing
    consistent with the drop. Returns (dropped, kept) partitions."""
    prefix = f"{day_col}="
    dropped = kept = 0
    for name in sorted(os.listdir(path)):
        if not name.startswith(prefix):
            continue
        day = name[len(prefix):]
        if day < min_live_day:
            shutil.rmtree(os.path.join(path, name))
            dropped += 1
        else:
            kept += 1
    spark.catalog.refreshByPath(path)
    return dropped, kept
