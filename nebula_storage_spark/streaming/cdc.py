"""CDC sink: change stream → maintained table (the Listener analog).

Reference: the Raft-WAL Listener streams row changes to an external
consumer (src/kvstore/Listener.h; ES fulltext sync
kvstore/plugins/elasticsearch/ESListener.h:19-66). The Spark-native
equivalent is a streaming query whose foreachBatch applies each
micro-batch as a MERGE into a maintained table — here "latest event per
user", the canonical last-write-wins CDC materialization.

foreachBatch is the extension point: the same harness applies any of the
mutate/ operators (upsert, delete, ifNotExists add) per batch, giving the
engine a real incremental write path. Batch-internal ordering uses the
event key (ts, event_id) so the result is deterministic whatever the
micro-batch slicing — the property the oracle checks.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

_COUNTER = itertools.count()


def stream_cdc_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain user_state(user_id, last_ts_epoch, last_event_type,
    last_value) from the events change stream; returns the final table."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    stream_dir = (f"/tmp/nebula_stream/{os.path.basename(sf_dir.rstrip('/'))}"
                  "/events")
    os.makedirs(stream_dir, exist_ok=True)
    link = f"{stream_dir}/events.parquet"
    if not os.path.islink(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(stream_dir)
    from nebula_storage_spark.graph import normalize_event_ts
    changes = normalize_event_ts(raw).select(
        "user_id", "event_id", "ts_epoch", "event_type", "value")

    state = {"df": None}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        # last-write-wins within the batch (ts, event_id order), then
        # merged against the running state — same upsert rule both levels
        w = W.partitionBy("user_id").orderBy(F.col("ts_epoch").desc(),
                                             F.col("event_id").desc())
        latest = (batch.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn"))
        prev = state["df"]
        if prev is None:
            merged = latest
        else:
            both = prev.unionByName(latest)
            merged = (both.withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") == 1).drop("_rn"))
        # materialize per batch: the CDC table is the stream's state
        state["df"] = merged.localCheckpoint(eager=True)

    import tempfile
    name = f"cdc_{next(_COUNTER)}"
    # fresh checkpoint per invocation: a reused checkpoint would resume
    # past the already-committed snapshot and apply zero batches (correct
    # CDC resume behavior, but this entry recomputes from scratch)
    ckpt = tempfile.mkdtemp(prefix=f"nebula_ckpt_{name}_")
    q = (changes.writeStream.foreachBatch(apply_batch)
         .queryName(name).trigger(availableNow=True)
         .option("checkpointLocation", ckpt)
         .start())
    q.awaitTermination()
    out = state["df"]
    return out.select("user_id", "ts_epoch",
                      F.col("event_type").alias("last_event_type"),
                      F.round(F.col("value").cast("double"), 2)
                      .alias("last_value"))
