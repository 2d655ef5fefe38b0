"""Custom stateful streaming operator: applyInPandasWithState.

The reference has no streaming operators (SURVEY §2 end note); this is the
Structured Streaming extension point for operators Spark lacks natively —
arbitrary per-key state machines (counters, sessionizers, CDC mergers) fed
Arrow batches per key per micro-batch.

Pattern notes for scale:
  * state lives in the state store (RocksDB-backed on a real cluster —
    set spark.sql.streaming.stateStore.providerClass), partitioned by key;
  * one shuffle per micro-batch on the grouping key;
  * the handler must be deterministic given (key, rows, prior state) —
    the test contract (AvailableNow over a snapshot) checks exactly that.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

_COUNTER = itertools.count()

OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("cnt", LongType()),
])
STATE_SCHEMA = StructType([StructField("cnt", LongType())])


def _count_events(key, batches: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    (prior,) = state.get if state.exists else (0,)
    total = prior + sum(len(pdf) for pdf in batches)
    state.update((total,))
    yield pd.DataFrame({"event_type": [key[0]], "cnt": [total]})


def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-event-type counts via a stateful streaming query,
    returned as the final materialized batch."""
    import os
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
    counts = (raw.select("event_type")
              .groupBy("event_type")
              .applyInPandasWithState(_count_events, OUTPUT_SCHEMA,
                                      STATE_SCHEMA, "update",
                                      GroupStateTimeout.NoTimeout))
    name = f"stream_state_{next(_COUNTER)}"
    q = (counts.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # update-mode memory sink appends one row per key per batch; the final
    # state per key = the max running count
    df = spark.table(name)
    return df.groupBy("event_type").agg({"cnt": "max"}).withColumnRenamed(
        "max(cnt)", "cnt")
