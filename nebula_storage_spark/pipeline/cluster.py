"""K-means clustering over an embedding column — the corpus-structuring
primitive of a training-data pipeline (topic bucketing, dedup sharding,
curriculum mixes). The reference has no clustering surface; this extends
the engine the same way the ANN module does (pipeline/similarity.py),
reusing its integer-fixed-point determinism recipe so a fixed iteration
count is oracle-comparable bit-for-bit.

Determinism: float embeddings are scaled to BIGINT once (round(x*scale));
every distance is an exact integer Σ(xi-ci)²; centroid updates use
truncating integer division (Spark `DIV` ≡ DuckDB `//`, both toward
zero); argmin ties break to the lowest cluster id; init is the k
lowest-id vectors. No step depends on row order or partitioning.

Scale: per iteration = one broadcast of k centroid rows against the
point frame (k·dim longs — trivially broadcastable for any practical k),
one (vec_id) argmin hash aggregate, and one (cid, dim) sum — shuffle
volume n·dim longs, the same profile as the IVF assignment step in
similarity.py:81+. The higher-order-function distance stays in
whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..cache import pin as _pin

_DIST = ("aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), "
         "CAST(0 AS BIGINT), (acc, d) -> acc + d)")


def kmeans_fixed(emb: DataFrame, k: int = 8, iterations: int = 2,
                 scale: int = 10 ** 6, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """K Lloyd iterations; returns the final assignment
    (vec_id, cluster, d2) where d2 is the exact integer squared distance
    to the assigned centroid. `iterations` counts assignment steps: the
    centroids are refit between assignments, not after the last.
    """
    if k < 1 or iterations < 1:
        raise ValueError("kmeans_fixed needs k >= 1 and iterations >= 1")
    # float32 → double BEFORE the scale multiply: engines promote
    # float*int differently (float math shifts half-boundaries), and the
    # round() would land on different integers
    ivec = F.expr(
        f"transform({vec_col}, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT))")
    pts = emb.select(F.col(id_col).alias("vec_id"),
                     ivec.alias("v")).transform(_pin)
    # Seed centroids = first k points in vec_id order.  cid assignment
    # uses the broadcast triangular rank over the k-row frame (k is a
    # bounded parameter) — no WindowExec, warning-free at any scale.
    from ..operators.prefix import broadcast_rank
    seed_ids = pts.orderBy("vec_id").limit(k).select("vec_id")
    ranks = broadcast_rank(seed_ids, ["vec_id"], out_col="_rn")
    cent = (pts.join(F.broadcast(ranks), "vec_id")
            .select((F.col("_rn") - 1).alias("cid"),
                    F.col("v").alias("c")))
    asn = None
    for t in range(iterations):
        # argmin over k candidates: min of struct (d2, cid, v) — (d2,
        # cid) is unique per vec so the array field is carried, never
        # compared; keeping v in the aggregate saves a join back to pts
        asn = (pts.crossJoin(F.broadcast(cent))
               .select("vec_id", "v", "cid",
                       F.expr(_DIST).alias("d2"))
               .groupBy("vec_id")
               .agg(F.min(F.struct("d2", "cid", "v")).alias("m"))
               .select("vec_id", F.col("m.cid").alias("cluster"),
                       F.col("m.d2").alias("d2"),
                       F.col("m.v").alias("v")))
        if t < iterations - 1:
            ex = asn.select("cluster",
                            F.posexplode("v").alias("dim", "x"))
            sums = (ex.groupBy("cluster", "dim")
                    .agg(F.sum("x").alias("s"),
                         F.count(F.lit(1)).alias("n")))
            cent = (sums
                    .select(F.col("cluster").alias("cid"), "dim",
                            F.expr("s DIV n").alias("cx"))
                    .groupBy("cid")
                    .agg(F.sort_array(F.collect_list(
                        F.struct("dim", "cx"))).alias("sc"))
                    .select("cid",
                            F.expr("transform(sc, s -> s.cx)").alias("c"))
                    .transform(_pin))
            cent.count()
    return asn.select("vec_id", "cluster", "d2")


def kmeans_oracle_sql(k: int = 8, iterations: int = 2,
                      scale: int = 10 ** 6, dim: int = 64,
                      table: str = "embeddings") -> str:
    """DuckDB oracle: the same Lloyd steps unrolled as CTEs over the
    pre-registered embeddings view. list_zip + `s[1]`/`s[2]` express the
    integer distance; centroid refit explodes dims via a LATERAL
    generate_series (DuckDB lacks UNNEST WITH ORDINALITY) and rebuilds
    the list with list(... ORDER BY dim)."""
    d2 = ("list_sum(list_transform(list_zip(e.v, c.c), "
          "s -> (s[1] - s[2]) * (s[1] - s[2])))")
    parts = [
        f"emb AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS v "
        f"FROM {table})",
        f"c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, "
        f"v AS c FROM (SELECT * FROM emb ORDER BY vec_id LIMIT {k}))",
    ]
    for t in range(iterations):
        parts.append(
            f"a{t} AS (SELECT vec_id, cid, v, d2 FROM ("
            f"SELECT e.vec_id, c.cid, e.v, {d2} AS d2, "
            f"row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {d2}, c.cid) AS rn "
            f"FROM emb e CROSS JOIN c{t} c) WHERE rn = 1)")
        if t < iterations - 1:
            parts.append(
                f"s{t} AS (SELECT a.cid, t.i AS dim, "
                f"sum(a.v[t.i]) AS s, count(*) AS n "
                f"FROM a{t} a, UNNEST(generate_series(1, {dim})) t(i) "
                f"GROUP BY 1, 2)")
            parts.append(
                f"c{t+1} AS (SELECT cid, list(s // n ORDER BY dim) AS c "
                f"FROM s{t} GROUP BY cid)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT vec_id, cid AS cluster, CAST(d2 AS BIGINT) AS d2 "
            f"FROM a{iterations-1}")
