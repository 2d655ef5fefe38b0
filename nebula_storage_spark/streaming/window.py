"""Structured Streaming: windowed event aggregation over the events table.

Reference analog: the Raft-WAL → Listener change feed
(src/kvstore/Listener.h, kvstore/plugins/elasticsearch/ESListener.h:19-66)
is the reference's only streaming surface — a change stream consumed by an
external indexer. The Spark-native story is Structured Streaming: the
same parquet data consumed as a file stream, watermarked event-time
windows, stateful aggregation managed by the engine.

The entry below runs the stream to completion with Trigger.AvailableNow
(single consistent snapshot → deterministic, oracle-comparable output) and
returns the materialized result. In production the same plan tails a
directory/Kafka source continuously; nothing about the plan changes.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, functions as F

_COUNTER = itertools.count()


def stream_events_windowed(spark: SparkSession, sf_dir: str,
                           window: str = "1 hour",
                           watermark: str = "1 hour") -> DataFrame:
    """Hourly (window-start, event_type) counts + exact decimal value sums,
    computed by a real streaming query (file source → watermark → windowed
    agg → memory sink), then returned as a batch DataFrame.
    """
    # file-stream source needs an explicit schema (footer inference is a
    # batch-only convenience) and a DIRECTORY to tail — stage a symlink dir
    # (in production this is the landing directory new files arrive in)
    import os
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    stream_dir = f"/tmp/nebula_stream/{os.path.basename(sf_dir.rstrip('/'))}/events"
    os.makedirs(stream_dir, exist_ok=True)
    link = f"{stream_dir}/events.parquet"
    if not os.path.islink(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(stream_dir)
    from nebula_storage_spark.graph import normalize_event_ts
    ev = normalize_event_ts(raw).select("ts", "event_type", "value")
    agg = (ev.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double").alias("sum_value")))
    name = f"stream_events_{next(_COUNTER)}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("w.start").alias("hour"), "event_type", "cnt",
                    F.round("sum_value", 2).alias("sum_value")))


def stream_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: dropDuplicates over the change
    stream's natural key (user_id, event_type) — the idempotent-consumer
    pattern for at-least-once sources. State is one entry per distinct
    key; with a watermark + dropDuplicatesWithinWatermark the state stays
    bounded on continuous feeds (AvailableNow here drains one snapshot).
    Output: the distinct key set, append-mode."""
    import os
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    stream_dir = f"/tmp/nebula_stream/{os.path.basename(sf_dir.rstrip('/'))}/events"
    os.makedirs(stream_dir, exist_ok=True)
    link = f"{stream_dir}/events.parquet"
    if not os.path.islink(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(stream_dir)
    from nebula_storage_spark.graph import normalize_event_ts
    ev = normalize_event_ts(raw).select("ts", "user_id", "event_type")
    dd = (ev.withWatermark("ts", "1 hour")
          .dropDuplicates(["user_id", "event_type"]))
    name = f"stream_dedup_{next(_COUNTER)}"
    q = (dd.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select("user_id", "event_type")


def stream_session_windows(spark: SparkSession, sf_dir: str,
                           gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows: per-user activity sessions that merge
    while events arrive within `gap` of the running session — the
    engine-managed counterpart of the batch sessionize operator
    (operators/sessionize.py computes the same islands with window
    functions). Complete output mode emits every session when the
    AvailableNow drain finishes, which makes the result snapshot-
    deterministic (append mode would hold back sessions newer than the
    final watermark). On a continuous feed the same plan runs in append
    mode with a watermark and bounded state.

    Output: (user_id, session_start, session_end, n_events, sum_value) —
    session_end is the last event + gap (Spark's session_window end).
    """
    import os
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    stream_dir = (f"/tmp/nebula_stream/"
                  f"{os.path.basename(sf_dir.rstrip('/'))}/events")
    os.makedirs(stream_dir, exist_ok=True)
    link = f"{stream_dir}/events.parquet"
    if not os.path.islink(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(stream_dir)
    from nebula_storage_spark.graph import normalize_event_ts
    ev = normalize_event_ts(raw).select("ts", "user_id", "value")
    agg = (ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double").alias("sum_value")))
    name = f"stream_sessions_{next(_COUNTER)}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events",
                    F.round("sum_value", 2).alias("sum_value")))


def stream_click_purchase_join(spark: SparkSession, sf_dir: str,
                               gap: str = "1 hour") -> DataFrame:
    """STREAM-STREAM inner join with watermarks and an event-time range
    condition: each purchase joins the same user's clicks from the
    preceding `gap` (click-attribution). Both sides are file streams
    over the same landing directory; on a continuous feed the two
    watermarks bound the join state (click rows older than purchase
    watermark − gap are evicted), which is what makes the join runnable
    forever. AvailableNow drains the snapshot in one micro-batch, so no
    state is evicted mid-run and the result equals the batch join — the
    determinism that lets a DuckDB oracle gate a stream-stream join.

    Output: (user_id, click_id, purchase_id, gap_sec).
    """
    import os
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    stream_dir = (f"/tmp/nebula_stream/"
                  f"{os.path.basename(sf_dir.rstrip('/'))}/events")
    os.makedirs(stream_dir, exist_ok=True)
    link = f"{stream_dir}/events.parquet"
    if not os.path.islink(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    from nebula_storage_spark.graph import normalize_event_ts

    def side(event_type: str, prefix: str) -> DataFrame:
        raw = spark.readStream.schema(schema).parquet(stream_dir)
        ev = normalize_event_ts(raw)
        return (ev.filter(F.col("event_type") == event_type)
                .select(F.col("user_id").alias(f"{prefix}_user"),
                        F.col("event_id").alias(f"{prefix}_id"),
                        F.col("ts").alias(f"{prefix}_ts"))
                .withWatermark(f"{prefix}_ts", gap))

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    j = clicks.join(
        purchases,
        F.expr(f"c_user = p_user AND c_ts <= p_ts "
               f"AND c_ts >= p_ts - INTERVAL {gap}"),
        "inner")
    name = f"stream_join_{next(_COUNTER)}"
    q = (j.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("c_user").alias("user_id"),
                    F.col("c_id").alias("click_id"),
                    F.col("p_id").alias("purchase_id"),
                    (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
                    .cast("bigint").alias("gap_sec")))


def stream_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join: the event file stream joined to the
    batch customer dimension (broadcast — the dim is re-read per
    micro-batch, so a slowly-changing dim is picked up without a restart),
    then watermarked hourly counts per market segment. This is the
    canonical "enrich the change feed against a reference table" pattern
    the reference's ES-listener pipeline (kvstore/plugins/elasticsearch/
    ESListener.h:19-66) leaves to the external consumer; here it is one
    declarative plan. AvailableNow drains the snapshot deterministically.

    Output: (hour, c_mktsegment, cnt).
    """
    import os
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    stream_dir = (f"/tmp/nebula_stream/"
                  f"{os.path.basename(sf_dir.rstrip('/'))}/events")
    os.makedirs(stream_dir, exist_ok=True)
    link = f"{stream_dir}/events.parquet"
    if not os.path.islink(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(stream_dir)
    from nebula_storage_spark.graph import normalize_event_ts
    ev = normalize_event_ts(raw).select("ts", "user_id")
    dim = (spark.read.parquet(f"{sf_dir}/customer.parquet")
           .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    joined = (ev.withWatermark("ts", "1 hour")
              .join(F.broadcast(dim), "user_id"))
    agg = (joined.groupBy(F.window("ts", "1 hour").alias("w"),
                          "c_mktsegment")
           .agg(F.count(F.lit(1)).alias("cnt")))
    name = f"stream_enrich_{next(_COUNTER)}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("w.start").alias("hour"), "c_mktsegment", "cnt"))


def stream_late_data(spark: SparkSession, sf_dir: str,
                     window: str = "1 hour",
                     delay: str = "1 hour") -> DataFrame:
    """Watermark late-data semantics, demonstrated deterministically:
    the event snapshot splits at the epoch quartiles into three staged
    files — ON-TIME (newest half, holds the max timestamp), MID (the
    next-older quarter) and LATE (the oldest quarter) — with mtimes
    forcing that processing order (maxFilesPerTrigger=1 → three
    micro-batches). Batch 0 advances the watermark to max(ts) - delay.
    Spark propagates a watermark update with a ONE-BATCH lag (the
    value is committed at batch end and applied to filtering from the
    next-plus-one batch — measured: the mid batch, one batch behind
    the max, is still fully accepted, while every row of the oldest
    batch is dropped). Append mode then emits exactly the finalized
    windows (window end <= final watermark, millisecond arithmetic)
    over the accepted rows.

    The DuckDB oracle encodes that exact boundary — oldest quarter
    absent, finalized-window cut at max_ms - delay_ms — so the hash
    gate pins the engine's REAL drop/emit rule, lag included, which is
    the contract a continuous pipeline relies on for bounded state.
    """
    import glob
    import os
    import shutil
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from nebula_storage_spark.graph import load_events
    ev = load_events(spark, sf_dir).select("ts", "event_type")
    lohi = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("lo"),
        F.max(F.unix_timestamp("ts")).alias("hi")).first()
    lo, hi = int(lohi.lo), int(lohi.hi)
    # the drop/finalize boundary is only meaningful when the event span
    # comfortably exceeds the watermark delay + window: a degenerate
    # span would stage empty batches and "pass" while pinning nothing
    if hi - lo < 4 * 3600:
        raise ValueError(
            f"stream_late_data: event span {hi - lo}s < 4h — the "
            f"quartile staging needs >= 4 windows to exercise the "
            f"watermark drop boundary")
    cut = (lo + hi) // 2
    cut2 = (lo + cut) // 2
    es = F.unix_timestamp("ts")
    tag = os.path.basename(sf_dir.rstrip("/"))
    # per-process staging root: concurrent drives (driver gate + bench +
    # pytest) at the same sf_dir must not clobber each other's feed dirs
    # (staging.pid_staging_root reaps dead-pid siblings).
    from nebula_storage_spark.staging import pid_staging_root
    root = pid_staging_root("/tmp/nebula_stream_late", tag)
    shutil.rmtree(root, ignore_errors=True)
    stage = f"{root}/stage"
    feed = f"{root}/feed"
    os.makedirs(feed, exist_ok=True)
    for name, df, mtime in (
            ("ontime", ev.filter(es >= cut), 1_000),
            ("mid", ev.filter((es < cut) & (es >= cut2)), 2_000),
            ("late", ev.filter(es < cut2), 3_000)):
        d = f"{stage}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = glob.glob(f"{d}/part-*.parquet")[0]
        dest = f"{feed}/{name}.parquet"
        shutil.copyfile(part, dest)
        os.utime(dest, (mtime, mtime))
    schema = spark.read.parquet(f"{feed}/ontime.parquet").schema
    raw = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(feed))
    agg = (raw.withWatermark("ts", delay)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("cnt")))
    name = f"stream_late_{next(_COUNTER)}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("w.start").alias("hour"), "event_type", "cnt"))
