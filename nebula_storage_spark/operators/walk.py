"""Deterministic random-walk generation — the walk-corpus primitive that
feeds DeepWalk/node2vec-style embedding training. The reference has no
walk surface; this extends the analytics family (operators/analytics.py)
with the same determinism recipe: the "random" neighbor choice at step t
of walk w is md5(w, t) mod outdegree — an engine-portable PRF, so the
whole walk corpus is reproducible bit-for-bit at any partitioning (and
by the DuckDB oracle).

Scale: the adjacency is ranked once (row_number per src — one window
shuffle), then each step is one hash-join of the walk frontier against
the ranked adjacency: K steps = K joins of |walks| rows. No Python, no
RNG state; the frontier stays (walk_id, cur, path) narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..graph import DST, SRC


def _step_hash(walk_col: str, t: int, prefix: str) -> str:
    return (f"CAST(conv(substring(md5(concat('{prefix}', "
            f"CAST({walk_col} AS STRING), '#', '{t}')), 1, 15), 16, 10) "
            f"AS BIGINT)")


def random_walks(edges: DataFrame, seeds: DataFrame, steps: int = 4,
                 prefix: str = "rw#") -> DataFrame:
    """One deterministic walk per seed over the directed edge set.
    `seeds` must carry a `node` column. At each step the walker moves to
    neighbor number (md5(walk, step) mod outdeg) in dst-sorted order; a
    node with no out-edges ends the walk (the walker stays put and the
    path stops growing). Output: (walk_id, end_node, path) with path =
    '->'-joined vertex ids."""
    if steps < 1:
        raise ValueError("random_walks needs steps >= 1")
    adj = edges.select(SRC, DST).distinct()
    w = W.partitionBy(SRC).orderBy(DST)
    ranked = (adj.select(F.col(SRC).alias("cur"), F.col(DST).alias("nxt"),
                         (F.row_number().over(w) - 1).alias("idx"))
              .persist())
    deg = ranked.groupBy("cur").agg(F.count(F.lit(1)).alias("outdeg"))
    state = seeds.select(
        F.col("node").alias("walk_id"), F.col("node").alias("cur"),
        F.col("node").cast("string").alias("path"))
    for t in range(steps):
        h = _step_hash("walk_id", t, prefix)
        picked = (state.join(deg, "cur", "left")
                  .select("walk_id", "cur", "path",
                          F.expr(f"CASE WHEN outdeg IS NULL THEN NULL "
                                 f"ELSE {h} % outdeg END").alias("idx")))
        state = (picked.join(ranked, ["cur", "idx"], "left")
                 .select("walk_id",
                         F.coalesce("nxt", "cur").alias("cur"),
                         F.when(F.col("nxt").isNull(), F.col("path"))
                         .otherwise(F.concat("path", F.lit("->"),
                                             F.col("nxt").cast("string")))
                         .alias("path")))
    return state.select("walk_id", F.col("cur").alias("end_node"), "path")


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
