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
    bucket SIZE constant as the corpus grows);
  * a mutation batch touches only the buckets its keys hash to —
    the read prunes to those directories (partition pruning on a
    driver-side bucket-id list: <= n_buckets small integers of layout
    metadata, never data rows), the SAME merge semantics run over
    that slice (upsert() / the delete anti-join, so exactness
    inherits the driver-checked operators), and ONE
    dynamic-partition-overwrite rewrites only the touched dirs;
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
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .upsert import upsert


def write_bucketed(df: DataFrame, key: str, path: str,
                   n_buckets: int = 8) -> None:
    """Lay `df` out in `_bucket=` hash-partition directories on `key`
    (rebuild_index_bucketed's layout for base tables)."""
    (df.withColumn("_bucket", F.pmod(F.hash(key), F.lit(n_buckets)))
     .repartition("_bucket")
     .sortWithinPartitions(key)
     .write.mode("overwrite").partitionBy("_bucket").parquet(path))


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_bucket")


def _touched_buckets(batch: DataFrame, key: str, n_buckets: int
                     ) -> list[int]:
    return [r["_b"] for r in
            (batch.select(F.pmod(F.hash(key), F.lit(n_buckets))
                          .alias("_b")).distinct().collect())]


def _overwrite_touched(spark: SparkSession, path: str, merged: DataFrame,
                       key: str, n_buckets: int,
                       touched: list[int]) -> None:
    """ONE dynamic-partition-overwrite of the touched `_bucket=` dirs;
    a touched bucket whose rows all vanished must be dropped explicitly
    (dynamic overwrite only replaces partitions PRESENT in the written
    data — apply_index_delta's contract)."""
    out = (merged.withColumn("_bucket", F.pmod(F.hash(key),
                                               F.lit(n_buckets)))
           .repartition("_bucket")
           .sortWithinPartitions(key))
    present_rows = out.select("_bucket").distinct().collect()
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                           "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        out.write.mode("overwrite").partitionBy("_bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
    present = {r["_bucket"] for r in present_rows}
    for b in set(touched) - present:
        d = os.path.join(path, f"_bucket={b}")
        if os.path.isdir(d):
            shutil.rmtree(d)


def upsert_bucketed(spark: SparkSession, path: str, batch: DataFrame,
                    keys: Sequence[str],
                    set_exprs: Mapping[str, Column | str],
                    n_buckets: int = 8,
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
    Returns the touched bucket ids."""
    lead = list(keys)[0]
    touched = _touched_buckets(batch, lead, n_buckets)
    cur = (spark.read.parquet(path)
           .filter(F.col("_bucket").isin(touched)).drop("_bucket"))
    post = upsert(cur, batch, keys, set_exprs, condition=condition,
                  insertable=insertable, schema=schema)
    _overwrite_touched(spark, path, post, lead, n_buckets, touched)
    return touched


def delete_bucketed(spark: SparkSession, path: str, key_frame: DataFrame,
                    key: str, n_buckets: int = 8) -> list[int]:
    """Delete the rows whose `key` appears in `key_frame` (the
    DeleteVertices anti-join, mutate/delete.py) rewriting only the
    touched buckets. Returns the touched bucket ids."""
    touched = _touched_buckets(key_frame, key, n_buckets)
    cur = (spark.read.parquet(path)
           .filter(F.col("_bucket").isin(touched)).drop("_bucket"))
    post = cur.join(F.broadcast(key_frame.select(key).distinct()),
                    key, "left_anti")
    _overwrite_touched(spark, path, post, key, n_buckets, touched)
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
    to claim them. Returns (dropped_partitions, kept_partitions)."""
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
    return dropped, kept
