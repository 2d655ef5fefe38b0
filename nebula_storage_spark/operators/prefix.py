"""Cluster-safe global prefix sums (distributed scan).

The naive Spark spelling of a global running total —
``F.sum(x).over(Window.orderBy(key))`` — plans a WindowExec with *no
partition spec*, which funnels the entire frame through one task
(Spark logs ``WindowExec: No Partition Defined ... serious performance
degradation``).  The reference engine never needs a global sort because
its key layout is already totally ordered (utils/NebulaKeyUtils.h:17-19,
keys are prefix-ordered so a scan *is* a sort); a Spark-native engine
has to build the order, so the scan must be the classic two-pass
distributed prefix sum:

  pass 1: range-partition by the order key; per-partition running sum
          (WindowExec partitioned by partition id — parallel) and
          per-partition subtotal (P rows, P = #partitions).
  pass 2: turn the P subtotals into exclusive partition offsets with a
          broadcast triangular join (P² pairs of *P-row* frames — driver
          scale), broadcast them back, add.

Wall-clock is two shuffle-free window passes over range-partitioned
data; nothing ever sits on a single task, so the same plan runs on a
63-row test frame and a 10¹²-row cluster frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from ..cache import pin as _pin


def global_running_sum(df: DataFrame, order_cols: list[str],
                       value_col: str, out_col: str = "cum",
                       num_partitions: int | None = None) -> DataFrame:
    """Inclusive global running sum of `value_col` in `order_cols` order.

    Returns `df`'s columns plus `out_col` (bigint).  `order_cols` must be
    a unique key (ties would make any running total ill-defined).  The
    plan contains no unpartitioned WindowExec: the only window is
    partitioned by `spark_partition_id()` after a `repartitionByRange`,
    and the partition-offset scan is a broadcast join over P rows.
    """
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Persisted because both the window pass and the subtotal pass read
    # it, and the partition-id column must be computed exactly once.
    ranged = (df.repartitionByRange(p, *[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id())
              .transform(_pin))
    w_in = (W.partitionBy("_pid").orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    local = ranged.withColumn(
        "_local", F.sum(F.col(value_col).cast("long")).over(w_in))
    subtot = (ranged.groupBy("_pid")
              .agg(F.sum(F.col(value_col).cast("long")).alias("_sub")))
    offs = (subtot.alias("a")
            .join(F.broadcast(subtot.alias("b")),
                  F.col("b._pid") < F.col("a._pid"), "left")
            .groupBy(F.col("a._pid").alias("_pid"))
            .agg(F.coalesce(F.sum("b._sub"), F.lit(0).cast("long"))
                 .alias("_off")))
    return (local.join(F.broadcast(offs), "_pid")
            .withColumn(out_col, (F.col("_local") + F.col("_off"))
                        .cast("long"))
            .drop("_pid", "_local", "_off"))


def broadcast_rank(df: DataFrame, key_cols: list[str],
                   ascending: list[bool] | None = None,
                   out_col: str = "rn") -> DataFrame:
    """row_number() over a frame BOUNDED BY CONSTRUCTION (a top-k /
    limit(k) result) without any WindowExec: rank = 1 + |{rows with a
    strictly smaller key}| via a broadcast triangular self-join.

    A constant partitionBy(lit(0)) does not work — Catalyst folds the
    literal away and the plan still degrades to (and warns about) an
    unpartitioned window.  The triangular join is O(k²) *pairs of a
    k-row frame*, which is the right trade exactly when k is a bounded
    parameter (vocab size, centroid count), never data-sized.

    `key_cols` must be a unique total order (no NULLs).  Returns one row
    per input row with just `key_cols` + `out_col`; join back on the key
    to reattach payload columns.
    """
    asc = ascending or [True] * len(key_cols)
    keys = df.select(*key_cols)
    lt = F.lit(False)
    eq = F.lit(True)
    for k, up in zip(key_cols, asc):
        bk, ak = F.col(f"_rb.{k}"), F.col(f"_ra.{k}")
        lt = lt | (eq & ((bk < ak) if up else (bk > ak)))
        eq = eq & (bk == ak)
    return (keys.alias("_ra")
            .join(F.broadcast(keys.alias("_rb")), lt, "left")
            .groupBy(*[F.col(f"_ra.{k}").alias(k) for k in key_cols])
            .agg((F.count(F.col(f"_rb.{key_cols[0]}")) + 1)
                 .cast("long").alias(out_col)))
