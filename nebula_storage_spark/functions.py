"""Expression-surface helpers shared across operators and workloads.

These encode the engine's determinism contract (README "Correctness
contract") as reusable builders — the read-semantics counterparts live in
catalog.py (defaults/TTL, ref src/storage/exec/QueryUtils.h:49-75).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum of a fixed-point numeric column:
    accumulate in DECIMAL, surface as double. Plain double sums differ in
    last-bit across partitionings/engines; decimal accumulation cannot."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def int_avg_x100(sum_col: Column | str, cnt_col: Column | str) -> Column:
    """Average as exact integer cents with truncating division — engines
    disagree on round() of half-boundary doubles; integer arithmetic
    cannot drift. Returns a double with 2 decimals."""
    s = F.col(sum_col) if isinstance(sum_col, str) else sum_col
    n = F.col(cnt_col) if isinstance(cnt_col, str) else cnt_col
    cents = F.round(s * 100, 0).cast("long")
    return (cents - F.pmod(cents, n)) / n / 100


def md5_permutation(*cols: Column | str) -> Column:
    """A fixed pseudo-random permutation key over the given columns —
    the engine-portable substitute for rand(seed) (any engine computes the
    identical order). Used by the per-vertex sampler (operators/go.py)."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
             for c in cols]
    return F.md5(F.concat_ws("#", *parts))


def jaccard_x10000(a_col: str, b_col: str) -> Column:
    """Exact Jaccard of two array columns as an x10000 integer."""
    return F.expr(
        f"(CAST(size(array_intersect({a_col}, {b_col})) AS BIGINT) * 10000)"
        f" DIV size(array_distinct(concat({a_col}, {b_col})))")


def quantize(vec: Column | str, scale: int = 1_000_000) -> Column:
    """array<float> → exact array<bigint> (see pipeline/similarity.py)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: F.floor(x.cast("double") * scale)
                       .cast("long"))
