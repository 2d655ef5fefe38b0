"""Sessionization — gap-based event sessions per user.

Beyond the reference surface (its closest analog is the per-vertex edge
grouping of GetNeighbors); standard building block for event/training-data
pipelines. Pure window functions — lag to detect gaps, running sum to
assign session ids — one shuffle on user_id, no Python.

Scale: sessions of one user never cross partitions (partitionBy user_id);
skewed power-users are bounded by their own event count, and AQE skew-join
handling does not apply (no join) — a salting pass would split the window
by (user, day) first if a single user's events exceeded one executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts_epoch",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Assign session indexes and aggregate per session.

    Output: (user, session_idx, n_events, start_epoch, end_epoch).
    A new session starts when the gap since the previous event of the same
    user exceeds gap_seconds. Ordering ties broken by `order_tiebreak` for
    determinism.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(ts_col).over(w)
    is_new = (prev.isNull() | (F.col(ts_col) - prev > gap_seconds)).cast("long")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (events
            .withColumn("_new", is_new)
            .withColumn("session_idx", F.sum("_new").over(wsum))
            .groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("start_epoch"),
                 F.max(ts_col).alias("end_epoch")))
