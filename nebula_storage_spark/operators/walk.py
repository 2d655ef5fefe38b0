"""Deterministic random-walk generation — the walk-corpus primitive that
feeds DeepWalk/node2vec-style embedding training. The reference has no
walk surface; this extends the analytics family (operators/analytics.py)
with the same determinism recipe: the "random" neighbor choice at step t
of walk w is md5(w, t) mod outdegree — an engine-portable PRF, so the
whole walk corpus is reproducible bit-for-bit at any partitioning (and
by the DuckDB oracle).

Scale: the adjacency is ranked once (row_number per src — one window
shuffle), then each step joins the walk frontier against the ranked
adjacency on the single key `cur` so the cached hash(cur) partitioning
serves every step: K steps move K × |walks| frontier rows and ZERO
adjacency rows (measured, tools/walk_scaling.py — the earlier
(cur, idx) two-key formulation re-exchanged the full adjacency every
step). No Python, no RNG state; the frontier stays
(walk_id, cur, path) narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..graph import DST, SRC


def _step_hash(walk_col: str, t: int, prefix: str) -> str:
    return (f"CAST(conv(substring(md5(concat('{prefix}', "
            f"CAST({walk_col} AS STRING), '#', '{t}')), 1, 15), 16, 10) "
            f"AS BIGINT)")


# Caching contract: each walk call persists its adjacency frame(s) —
# random_walks one (`ranked`), node2vec_walks two (`adjc`, `nbr_arr`) —
# because every step join references them lazily and unpersisting
# inside the builder would drop the hash(cur) partitioning the step
# plan depends on. The builder therefore CANNOT release them; they go
# into the package-wide persist registry (..cache — round-9
# generalization of this module's round-8 contract, now thread-safe)
# and a long-lived session should call cache.release_all() after each
# result is materialized, or the cached copies accumulate until
# spark.catalog.clearCache().
from .. import cache as _cache


def release_walk_caches() -> int:
    """Round-8 release entry point, kept for callers/tests — now a
    view onto the package registry: releases EVERY pinned frame (walk
    adjacencies included) via cache.release_all(). Safe at any time:
    unpersist only drops cached blocks, a still-pending walk DataFrame
    would recompute them correctly (just slower)."""
    return _cache.release_all()


def random_walks(edges: DataFrame, seeds: DataFrame, steps: int = 4,
                 prefix: str = "rw#") -> DataFrame:
    """One deterministic walk per seed over the directed edge set.
    `seeds` must carry a `node` column. At each step the walker moves to
    neighbor number (md5(walk, step) mod outdeg) in dst-sorted order; a
    node with no out-edges ends the walk (the walker stays put and the
    path stops growing). Output: (walk_id, end_node, path) with path =
    '->'-joined vertex ids. Persists the ranked adjacency for the step
    joins — see release_walk_caches() for the release contract."""
    if steps < 1:
        raise ValueError("random_walks needs steps >= 1")
    adj = edges.select(SRC, DST).distinct()
    w = W.partitionBy(SRC).orderBy(DST)
    # outdeg rides on every ranked row (a second window over the same
    # partitioning, no extra shuffle) so each step is ONE join, and the
    # step join's only equi-key is `cur`: the cached frame's hash(cur)
    # partitioning (from the ranking window's exchange) then satisfies
    # every step's distribution requirement, and the idx pick runs as a
    # join CONDITION. Measured (tools/walk_scaling.py, 1.5 M edges,
    # 500 walks, K=8): the former (cur, idx) equi-join re-exchanged the
    # adjacency EVERY step (143 MB shuffle); this shape shuffles 0.1 MB
    # — only the frontier moves, the persisted adjacency never does.
    ranked = (adj.select(F.col(SRC).alias("cur"), F.col(DST).alias("nxt"),
                         (F.row_number().over(w) - 1).alias("idx"),
                         F.count(F.lit(1)).over(W.partitionBy(SRC))
                         .alias("outdeg"))
              .persist())
    _cache.track(ranked)
    state = seeds.select(
        F.col("node").alias("walk_id"), F.col("node").alias("cur"),
        F.col("node").cast("string").alias("path"))
    for t in range(steps):
        h = _step_hash("walk_id", t, prefix)
        r = ranked.alias(f"_rw{t}")
        cond = ((state["cur"] == F.col(f"_rw{t}.cur"))
                & (F.col(f"_rw{t}.idx")
                   == F.expr(h) % F.col(f"_rw{t}.outdeg")))
        nxt = F.col(f"_rw{t}.nxt")
        state = (state.join(r, cond, "left")
                 .select(state["walk_id"],
                         F.coalesce(nxt, state["cur"]).alias("cur"),
                         F.when(nxt.isNull(), state["path"])
                         .otherwise(F.concat(state["path"], F.lit("->"),
                                             nxt.cast("string")))
                         .alias("path")))
    return state.select("walk_id", F.col("cur").alias("end_node"), "path")


def node2vec_walks(edges: DataFrame, seeds: DataFrame, steps: int = 3,
                   weights: tuple[int, int, int] = (1, 4, 2),
                   prefix: str = "n2v#") -> DataFrame:
    """Second-order (node2vec-style) biased walks: at step t the
    candidate neighbors of `cur` are weighted by their relation to the
    PREVIOUS node — return (nxt == prev) gets weights[0], a common
    neighbor (edge prev->nxt exists) weights[1], an outward move
    weights[2]; with the defaults (1, 4, 2) that is return-parameter
    p=4 and in-out parameter q=2 scaled to integers. The choice is
    md5(walk, t) mod total-weight landing in the neighbor's cumulative
    weight interval (dst-sorted) — the alias-table draw re-expressed as
    a per-walk partitioned window, deterministic on any engine.

    Scale: each step is one equi-join of the frontier against the
    adjacency (fanout = outdeg, the inherent cost of second-order bias
    — node2vec must inspect every neighbor's relation to prev) plus the
    common-neighbor marker, a single-key join of the candidates against
    a persisted per-vertex sorted neighbor-ARRAY frame (the standard
    adjacency-list layout of walk engines) probed with array_contains —
    single-key because a `nxt = mn` equality would be extracted as a
    second equi-key and force a hash(prev, nxt) re-exchange of the full
    adjacency EVERY step (measured: ~1 |E| exchange per step,
    tools/walk_scaling.py). Both cached frames descend from one
    hash(cur) repartition, so after that single build exchange the
    adjacency never moves — only frontier-sized frames shuffle per
    step. Per-vertex array size is bounded by max outdeg (the layout's
    usual skew contract). The cumulative-weight window partitions by
    walk_id, never global. Persists both adjacency frames — see
    release_walk_caches() for the release contract."""
    if steps < 1:
        raise ValueError("node2vec_walks needs steps >= 1")
    wb, wc, wf = weights
    adjc = (edges.select(SRC, DST).distinct()
            .select(F.col(SRC).alias("cur"), F.col(DST).alias("nxt"))
            .repartition("cur").persist())
    # groupBy over the hash(cur)-partitioned cache: no second exchange
    nbr_arr = (adjc.groupBy("cur")
               .agg(F.sort_array(F.collect_set("nxt")).alias("_nbrs"))
               .persist())
    _cache.track(adjc)
    _cache.track(nbr_arr)
    state = seeds.select(
        F.col("node").alias("walk_id"), F.col("node").alias("prev"),
        F.col("node").alias("cur"), F.col("node").cast("string").alias("path"))
    for t in range(steps):
        h = _step_hash("walk_id", t, prefix)
        m = nbr_arr.alias(f"_n2vm{t}")
        mcur, mnbrs = F.col(f"_n2vm{t}.cur"), F.col(f"_n2vm{t}._nbrs")
        nb = state.join(adjc, "cur", "left")
        cand = (nb.join(m, nb["prev"] == mcur, "left")
                .select(nb["walk_id"], nb["prev"], nb["cur"], nb["path"],
                        nb["nxt"],
                        F.when(F.array_contains(mnbrs, nb["nxt"]),
                               F.lit(1)).alias("is_common"))
                .withColumn("w", F.expr(
                    f"CASE WHEN nxt IS NULL THEN NULL "
                    f"WHEN nxt = prev THEN {wb} "
                    f"WHEN is_common = 1 THEN {wc} ELSE {wf} END")))
        win = W.partitionBy("walk_id")
        cand = (cand
                .withColumn("cum", F.sum("w").over(
                    win.orderBy("nxt").rowsBetween(W.unboundedPreceding, 0)))
                .withColumn("tot", F.sum("w").over(win)))
        picked = cand.filter(F.expr(
            f"nxt IS NULL OR ({h} % tot >= cum - w AND {h} % tot < cum)"))
        state = picked.select(
            "walk_id", F.col("cur").alias("prev"),
            F.coalesce("nxt", "cur").alias("cur"),
            F.when(F.col("nxt").isNull(), F.col("path"))
            .otherwise(F.concat("path", F.lit("->"),
                                F.col("nxt").cast("string"))).alias("path"))
    return state.select("walk_id", F.col("cur").alias("end_node"), "path")


def node2vec_walks_oracle_sql(edges_sql: str, seeds_sql: str,
                              steps: int = 3,
                              weights: tuple[int, int, int] = (1, 4, 2),
                              prefix: str = "n2v#") -> str:
    """DuckDB oracle for node2vec_walks: identical weighting + PRF
    interval draw, unrolled per step."""
    wb, wc, wf = weights

    def h(t: int) -> str:
        return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
                f"list_transform(string_split(substr(md5('{prefix}' || "
                f"CAST(walk_id AS VARCHAR) || '#' || '{t}'), 1, 15), ''), "
                f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
                f"(a, b) -> a * 16 + b)")
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        f"s0 AS (SELECT node AS walk_id, node AS prev, node AS cur, "
        f"CAST(node AS VARCHAR) AS path FROM ({seeds_sql}))",
    ]
    for t in range(steps):
        parts.append(
            f"c{t} AS (SELECT s.*, a.dst AS nxt "
            f"FROM s{t} s LEFT JOIN e a ON a.src = s.cur)")
        parts.append(
            f"w{t} AS (SELECT *, CASE WHEN nxt IS NULL THEN NULL "
            f"WHEN nxt = prev THEN {wb} "
            f"WHEN EXISTS (SELECT 1 FROM e x WHERE x.src = c{t}.prev "
            f"AND x.dst = c{t}.nxt) THEN {wc} ELSE {wf} END AS w "
            f"FROM c{t})")
        parts.append(
            f"x{t} AS (SELECT *, sum(w) OVER (PARTITION BY walk_id "
            f"ORDER BY nxt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT "
            f"ROW) AS cum, sum(w) OVER (PARTITION BY walk_id) AS tot "
            f"FROM w{t})")
        parts.append(
            f"s{t+1} AS (SELECT walk_id, cur AS prev, "
            f"coalesce(nxt, cur) AS cur, "
            f"CASE WHEN nxt IS NULL THEN path "
            f"ELSE path || '->' || CAST(nxt AS VARCHAR) END AS path "
            f"FROM x{t} WHERE nxt IS NULL OR "
            f"({h(t)} % tot >= cum - w AND {h(t)} % tot < cum))")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT walk_id, cur AS end_node, path FROM s{steps}")


def random_walks_oracle_sql(edges_sql: str, seeds_sql: str,
                            steps: int = 4, prefix: str = "rw#") -> str:
    """DuckDB oracle: identical ranked adjacency + PRF step choice,
    unrolled. `edges_sql` yields (src, dst); `seeds_sql` yields node."""
    def h(t: int) -> str:
        return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
                f"list_transform(string_split(substr(md5('{prefix}' || "
                f"CAST(walk_id AS VARCHAR) || '#' || '{t}'), 1, 15), ''), "
                f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
                f"(a, b) -> a * 16 + b)")
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "adj AS (SELECT src AS cur, dst AS nxt, "
        "row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx "
        "FROM e)",
        "deg AS (SELECT cur, count(*) AS outdeg FROM adj GROUP BY cur)",
        f"s0 AS (SELECT node AS walk_id, node AS cur, "
        f"CAST(node AS VARCHAR) AS path FROM ({seeds_sql}))",
    ]
    for t in range(steps):
        parts.append(
            f"p{t} AS (SELECT walk_id, cur, path, "
            f"CASE WHEN d.outdeg IS NULL THEN NULL "
            f"ELSE {h(t)} % d.outdeg END AS idx "
            f"FROM s{t} LEFT JOIN deg d USING (cur))")
        parts.append(
            f"s{t+1} AS (SELECT walk_id, "
            f"coalesce(a.nxt, p.cur) AS cur, "
            f"CASE WHEN a.nxt IS NULL THEN p.path "
            f"ELSE p.path || '->' || CAST(a.nxt AS VARCHAR) END AS path "
            f"FROM p{t} p LEFT JOIN adj a USING (cur, idx))")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT walk_id, cur AS end_node, path FROM s{steps}")
