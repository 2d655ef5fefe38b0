"""Generic KV-mode operators (SURVEY §2 row 9).

Reference: a space can run in pure key-value mode —
src/storage/kv/GetProcessor.cpp, PutProcessor.cpp, RemoveProcessor.cpp
(flag `storage_kv_mode`, src/storage/CompactionFilter.h:19).

Spark model: a (key string, value string) DataFrame. Put = last-write-wins
overlay (anti-join old + union batch — one shuffle on key, batch side
broadcast when small); Get = semi-join; Remove = anti-join; prefix scan =
filter (pushes to the columnar scan as a startswith predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

KEY, VALUE = "key", "value"


def kv_put(kv: DataFrame, batch: DataFrame,
           seq_col: str | None = None) -> DataFrame:
    """Upsert batch rows; existing keys are overwritten (PutProcessor
    semantics: RocksDB put = last write wins).

    A batch that repeats a key must resolve to ONE row (the RocksDB
    write-batch applies puts in order, so the last wins). DataFrames have
    no row order, so: pass `seq_col` (a monotone batch-sequence column)
    and the greatest sequence wins; without one, the greatest value wins —
    deterministic, and a no-op for key-unique batches."""
    rank = F.col(seq_col) if seq_col is not None else F.col(VALUE)
    w = W.partitionBy(KEY).orderBy(rank.desc())
    batch = (batch.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1).drop("_rn"))
    if seq_col is not None:
        batch = batch.drop(seq_col)
    return (kv.join(F.broadcast(batch.select(KEY)), KEY, "left_anti")
            .unionByName(batch))


def kv_get(kv: DataFrame, keys: DataFrame) -> DataFrame:
    """Point lookups; missing keys are simply absent (GetProcessor returns
    per-key found/not-found)."""
    return kv.join(F.broadcast(keys.select(KEY)), KEY, "left_semi")


def kv_remove(kv: DataFrame, keys: DataFrame) -> DataFrame:
    return kv.join(F.broadcast(keys.select(KEY)), KEY, "left_anti")


def kv_scan_prefix(kv: DataFrame, prefix: str) -> DataFrame:
    """RocksDB prefix iterate analog — a sargable startswith filter."""
    return kv.filter(F.col(KEY).startswith(prefix))
