"""LookupIndex — declarative predicate → (pruned) scan (SURVEY §3.2).

Reference: graphd compiles a WHERE clause into per-index `column_hints`
(sargable equality prefix + at most one trailing RANGE) plus a residual
filter; storaged turns hints into an order-preserving-encoded RocksDB
prefix/range scan (src/storage/exec/IndexScanNode.h:27-41 hint rules,
:110-161 key build), optionally re-fetches the base row when yields are
not covered by the index (IndexVertexNode.h/IndexEdgeNode.h), applies the
residual filter (IndexFilterNode.h), and dedups the union of multi-index
results (LookupBaseProcessor.inl:157-263, LookupProcessor.cpp:96-98).

Spark-native: a columnar table IS its own covering index — equality/range
hints become filter predicates that Catalyst pushes into the parquet scan
(partition pruning + row-group min/max skipping play the role of the
order-preserving key encoding), column pruning plays the covering-index
fast path, and `dropDuplicates` is the DeDupNode. The 4 plan shapes the
reference picks by hand collapse into one declarative plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


class Hint:
    """Column hint: equality prefix or one trailing range (begin ≤ x < end).

    Mirrors IndexColumnHint: all-PREFIX ⇒ prefix scan; last hint may be
    RANGE with [begin, end) bounds (IndexScanNode.h:27-41).
    """
    def __init__(self, col: str, eq=None, begin=None, end=None):
        self.col, self.eq, self.begin, self.end = col, eq, begin, end

    @classmethod
    def prefix(cls, col: str, value) -> "Hint":
        return cls(col, eq=value)

    @classmethod
    def range(cls, col: str, begin=None, end=None) -> "Hint":
        return cls(col, begin=begin, end=end)

    def predicate(self) -> Column:
        if self.eq is not None:
            return F.col(self.col) == F.lit(self.eq)
        p = F.lit(True)
        if self.begin is not None:
            p = p & (F.col(self.col) >= F.lit(self.begin))
        if self.end is not None:
            p = p & (F.col(self.col) < F.lit(self.end))   # end exclusive, parity
        return p


def lookup(df: DataFrame, hints: Sequence[Hint] = (),
           residual: Column | str | None = None,
           yield_cols: Sequence[str] | None = None,
           dedup_cols: Sequence[str] | None = None,
           limit: int | None = None) -> DataFrame:
    """Index-lookup semantics over one table (or a pre-unioned multi-index
    frame). Validates the reference's hint shape: equalities first, at most
    one range, range last.
    """
    seen_range = False
    for h in hints:
        if seen_range:
            # nothing may follow a RANGE hint: equality prefix first, at
            # most one trailing range (IndexScanNode.h:27-41)
            raise ValueError("only the last column hint may be a RANGE "
                             "(IndexScanNode.h:27-41)")
        if h.eq is None:
            seen_range = True
    out = df
    for h in hints:
        out = out.filter(h.predicate())
    if residual is not None:
        pred = F.expr(residual) if isinstance(residual, str) else residual
        out = out.filter(pred)
    if yield_cols is not None:
        out = out.select(*yield_cols)
    if dedup_cols is not None:
        out = out.dropDuplicates(list(dedup_cols))
    if limit is not None:
        out = out.limit(limit)
    return out
