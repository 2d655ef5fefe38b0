"""Package-level persist registry — one release point for every frame
the operator builders cache (r8 verdict, Next #4: the walk module's
release contract generalized package-wide).

Why builders can't release their own caches: an operator that persists
its adjacency/centroid/round frame returns a LAZY result that still
reads it — unpersisting inside the builder would drop the very blocks
(and, for step-join plans, the hash partitioning) the returned plan
depends on. Retention after materialization is also intentional for
plan-reuse (operators/analytics.py module docstring: CacheManager
matches canonicalized plans, measured ~1.5x on repeated 5-round
PageRank). What was missing was the OTHER half of the contract: a
deterministic way for a long-lived session (benchmark loops, the
workload driver, ann_crossover's repeated timing calls) to say "this
result is materialized, drop everything the builders pinned" instead
of depending on LRU eviction. `release_all()` is that point; bench.py
calls it between headliners.

Thread-safety (r8 ADVICE on operators/walk.py:98): the registry is a
module global mutated by builders and by release_all(); a lock makes
append/drain atomic so two threads building plans concurrently can't
interleave an append with a drain and lose (leak) an entry. NOTE the
lock serializes REGISTRY access only — releasing while another thread
is still materializing from a pinned frame remains safe Spark-wise
(unpersist just drops cached blocks; the other plan recomputes,
slower but correct).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() `df` (default MEMORY_AND_DISK — degrades to recompute
    under pressure, never OOM) and register it for release_all().
    Returns `df` so call sites stay expression-shaped."""
    df.persist()
    with _LOCK:
        _PINNED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame (builders that need a
    non-default storage level or persist mid-expression)."""
    with _LOCK:
        _PINNED.append(df)
    return df


def release_all() -> int:
    """Unpersist every registered frame and forget it; returns how many
    were released. Safe at any time — a still-pending result that read
    a pinned frame recomputes it correctly (just slower). Duplicates
    (a frame pinned twice across calls) unpersist idempotently."""
    with _LOCK:
        drained, _PINNED[:] = _PINNED[:], []
    for df in drained:
        df.unpersist()
    return len(drained)


def pinned_count() -> int:
    with _LOCK:
        return len(_PINNED)
