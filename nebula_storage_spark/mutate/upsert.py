"""UpdateVertex / UpdateEdge — conditional upsert with RETURN.

Reference plan: TagNode -> FilterNode(condition) -> UpdateTagNode ->
UpdateResNode (mutate/UpdateVertexProcessor.cpp:111-164). Semantics
(src/storage/exec/UpdateNode.h:151-440):

  * row exists & condition true   -> apply SET expressions
  * row exists & condition false  -> E_FILTER_OUT (row unchanged)
  * row absent  & insertable      -> build from schema defaults + SET
    (insertTagProps, UpdateNode.h:259-282)
  * row absent  & !insertable     -> error (row stays absent here)
  * RETURN expressions evaluated on the post-image
    (exec/UpdateResultNode.h:18-79)

The reference serializes concurrent updates with per-key memory locks
(UpdateNode.h:174-186) and an atomic row+index KV batch; in Spark the
whole upsert is ONE declarative job over the table (job-level atomicity) —
a full-outer merge, i.e. exactly what Delta's `MERGE INTO ... WHEN MATCHED
[AND cond] THEN UPDATE WHEN NOT MATCHED THEN INSERT` compiles to. We
implement the join rewrite directly so it runs on plain parquet.

Scale: the update batch is usually tiny relative to the table → broadcast
the batch side; the table side never shuffles.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..catalog import SchemaDef


def upsert(table: DataFrame, batch: DataFrame, keys: Sequence[str],
           set_exprs: Mapping[str, Column | str],
           condition: Column | str | None = None,
           insertable: bool = True,
           schema: SchemaDef | None = None) -> DataFrame:
    """Post-image of `table` after a conditional upsert of `batch`.

    `set_exprs`: target column -> expression evaluated with the existing
    row's columns in scope as `t.<col>` aliases and the batch's as
    `s.<col>`. Plain strings go through F.expr. `condition` sees `t.*`
    (the pre-image), mirroring the reference's FilterNode placement.
    `schema` supplies defaults for insert-mode columns the SET clause
    doesn't cover (insertTagProps parity).
    """
    keys = list(keys)
    t = table.alias("t")
    su = batch.dropDuplicates(keys)
    join_cond = None
    if insertable:
        # full-outer preserves both sides, so Spark cannot broadcast
        # either one — a hint here would only be logged and ignored
        # (HintErrorLogger noise). Both sides hash-shuffle on the key.
        s = su.alias("s")
        join_cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
                     for k in keys]
        joined = t.join(s, join_cond, "full_outer")
    else:
        # absent row + !insertable ⇒ E_KEY_NOT_FOUND in the reference:
        # the table keeps exactly its own rows, which is a LEFT join —
        # and left joins DO support broadcasting the (tiny) batch side,
        # so the table never shuffles.
        s = F.broadcast(su).alias("s")
        join_cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
                     for k in keys]
        joined = t.join(s, join_cond, "left_outer")

    matched = F.lit(True)
    for k in keys:
        matched = matched & F.col(f"t.{k}").isNotNull()
    in_batch = F.lit(True)
    for k in keys:
        in_batch = in_batch & F.col(f"s.{k}").isNotNull()

    if condition is None:
        cond = F.lit(True)
    else:
        cond = F.expr(condition) if isinstance(condition, str) else condition

    def resolve(expr):
        return F.expr(expr) if isinstance(expr, str) else expr

    out_cols = []
    data_cols = [c for c in table.columns if c not in keys]
    for k in keys:
        out_cols.append(F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k))
    for c in data_cols:
        upd = resolve(set_exprs[c]) if c in set_exprs else F.col(f"t.{c}")
        if c in set_exprs:
            ins = resolve(set_exprs[c])
        elif schema is not None and any(f.name == c for f in schema.fields):
            fd = schema.field(c)
            ins = F.lit(fd.default).cast(fd.dtype)
        else:
            ins = F.lit(None)
        out_cols.append(
            F.when(matched & in_batch & cond, upd)       # update branch
             .when(matched, F.col(f"t.{c}"))             # filter-out / untouched
             .otherwise(ins)                             # insert branch (insertable)
             .alias(c))
    return joined.select(*out_cols)


def upsert_returning(table: DataFrame, batch: DataFrame, keys: Sequence[str],
                     set_exprs: Mapping[str, Column | str],
                     return_cols: Sequence[Column | str],
                     **kwargs) -> DataFrame:
    """UpdateResNode parity (exec/UpdateResultNode.h:18-79): run the upsert
    and evaluate RETURN expressions on the post-image of the TOUCHED rows
    only (the reference responds with one row per updated key)."""
    post = upsert(table, batch, keys, set_exprs, **kwargs)
    bk = batch.dropDuplicates(list(keys)).select(*keys)
    return (post.join(F.broadcast(bk), list(keys), "left_semi")
            .select(*[F.expr(c) if isinstance(c, str) else c
                      for c in return_cols]))
