"""As-of (point-in-time) join — the feature-store / event-attribution
operator Spark lacks natively.

For each left row, attach the payload of the single right row with the
greatest right_ts <= left_ts (direction="backward"; "forward" takes the
smallest right_ts >= left_ts) within the same key group. The reference
engine has no such operator (its storage layer stops at prefix scans);
this is the standard extension a training-data pipeline needs for
point-in-time-correct feature attachment (no peeking at the future).

Scale design — union-and-window, NOT an inequality join:
  * A naive `l JOIN r ON l.k = r.k AND r.t <= l.t` + argmax explodes to
    O(|matches|) intermediate rows and (without an equi-key) degrades to
    BroadcastNestedLoopJoin. This implementation tags the two inputs,
    unions them, and runs one `last(payload, ignorenulls)` window over
    (key ORDER BY t, side, tiebreak) — exactly ONE hash shuffle on the
    key, O(|L|+|R|) rows end-to-end, no row amplification, AQE-skew
    splittable. The same shape Flink uses for temporal joins and
    kdb/QuestDB for `aj`.
  * Sort order puts right rows before left rows at equal t, so equality
    is inclusive; `strict=True` flips that to a strict < / >.
  * Ties on (key, t) among right rows resolve deterministically by the
    `tiebreak` column (max wins backward, min wins forward) — required
    for oracle-stable results where DuckDB's ASOF would be arbitrary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_ts: str, right_ts: str, payload: dict[str, str],
              tiebreak: str, direction: str = "backward",
              strict: bool = False) -> DataFrame:
    """payload maps output-column-name -> right-frame column. Returns all
    left columns plus the payload columns (NULL when no right row
    qualifies).

    All payload columns are carried through the window as ONE struct and
    unpacked afterwards, so the attachment is atomic per right row: a
    NULL inside the matched row's payload stays NULL (it cannot backfill
    from an older right row), and a no-match left row gets NULL in every
    payload column."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    from pyspark.sql.types import StructField, StructType
    key = [on] if isinstance(on, str) else list(on)

    out_names = list(payload)
    for name in out_names:
        if name in left.columns:
            raise ValueError(f"payload name {name!r} collides with a left column")

    pay_type = StructType([StructField(name, right.schema[src].dataType)
                           for name, src in payload.items()])

    # Left rows: side=1, payload struct null (typed from the right schema).
    l = (left
         .withColumn("_t", F.col(left_ts))
         .withColumn("_side", F.lit(1))
         .withColumn("_tb", F.lit(None).cast(right.schema[tiebreak].dataType))
         .withColumn("_pay", F.lit(None).cast(pay_type)))

    # Right rows: side=0, left-only columns null.
    r = (right
         .withColumn("_t", F.col(right_ts))
         .withColumn("_side", F.lit(0))
         .withColumn("_tb", F.col(tiebreak))
         .withColumn("_pay", F.struct(*[F.col(src).alias(name)
                                        for name, src in payload.items()])))
    for c in left.columns:
        if c not in key and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    cols = key + ["_t", "_side", "_tb", "_pay"] + \
        [c for c in left.columns if c not in key]
    u = l.select(*cols).unionByName(r.select(*cols))

    backward = direction == "backward"
    t_ord = F.col("_t").asc() if backward else F.col("_t").desc()
    # right-before-left at equal t makes the bound inclusive; strict mode
    # sorts left first so an equal-t right row is not yet visible
    side_ord = F.col("_side").desc() if strict else F.col("_side").asc()
    tb_ord = F.col("_tb").asc_nulls_first() if backward \
        else F.col("_tb").desc_nulls_first()
    w = (W.partitionBy(*key).orderBy(t_ord, side_ord, tb_ord)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    # ONE last(ignorenulls) over the struct: right rows are never null
    # here (F.struct is non-null even with null members), so the window
    # always picks the newest qualifying right row as a unit.
    u = u.withColumn("_pay", F.last("_pay", ignorenulls=True).over(w))
    for name in out_names:
        u = u.withColumn(name, F.col("_pay")[name])
    return (u.filter(F.col("_side") == 1)
            .drop("_t", "_side", "_tb", "_pay"))
