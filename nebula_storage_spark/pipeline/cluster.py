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

Scale: ZERO corpus-sized exchanges (round 9, the PQ kernel treatment —
pipeline/pq.py measured the chain that forced it). Assignment is
per-ROW argmin over k broadcast centroids, so it never needed the
crossJoin + groupBy(vec_id) min-struct shape this module used before:
that plan re-shuffled n rows (carrying their full vectors in the
min-struct) EVERY iteration, and its higher-order-function distance
evaluates interpreted per lambda — n·k invocations per pass (the
1 M-point profile that falsified the same shape in PQ). Assignment
and refit now run as Arrow-batched numpy kernels (pipeline/kernels.py):
exact int64 distances via the expanded integer matmul, first-minimum
argmin over cid-sorted centroid rows (the
lowest-cid tie rule, bit-identical to the min-struct order), and the
refit emits at most k·dim exact partial-sum rows per batch — per
iteration the only shuffle is codebook-sized. Centroids are collected
driver-side between iterations (k·dim ints, the bounded-broadcast
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..cache import pin as _pin


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
    # the stack/distance/argmin/partial-sum arithmetic and the lowest-cid
    # tie rule live in pipeline/kernels.py — ONE copy shared with
    # pipeline/pq.py (r10, per r9 ADVICE: two drift-prone copies of
    # tie-break-sensitive exactness arithmetic).
    from .kernels import collect_centroids

    def _collect_cb(cb: DataFrame):
        return collect_centroids(
            (int(r["cid"]), [int(x) for x in r["c"]])
            for r in cb.collect())

    def _refit_partials(cb_np):
        """Per Arrow batch: nearest-centroid argmin + the refit's
        exact integer partial sums — at most k·dim rows per batch."""
        def fn(batches):
            import numpy as _np
            import pandas as _pd
            from nebula_storage_spark.pipeline.kernels import (
                nearest_centroid, refit_partial_sums)
            cids, cents = cb_np
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _np.stack(pdf["v"].to_numpy()).astype(_np.int64)
                a, _ = nearest_centroid(x, cents)
                rows = {"cluster": [], "dim": [], "sx": [], "n": []}
                for cid, cnt, sx in refit_partial_sums(x, a, cids):
                    rows["cluster"].extend([cid] * x.shape[1])
                    rows["dim"].extend(range(x.shape[1]))
                    rows["sx"].extend(int(v) for v in sx)
                    rows["n"].extend([cnt] * x.shape[1])
                yield _pd.DataFrame(rows).astype(
                    {"cluster": "int64", "dim": "int32",
                     "sx": "int64", "n": "int64"})
        return fn

    def _assign(cb_np):
        """Per Arrow batch: (vec_id, cluster, d2) — the final
        assignment as a pure map, no exchange anywhere."""
        def fn(batches):
            import numpy as _np
            import pandas as _pd
            from nebula_storage_spark.pipeline.kernels import (
                nearest_centroid)
            cids, cents = cb_np
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _np.stack(pdf["v"].to_numpy()).astype(_np.int64)
                a, d2 = nearest_centroid(x, cents)
                yield _pd.DataFrame(
                    {"vec_id": pdf["vec_id"],
                     "cluster": cids[a],
                     "d2": d2[_np.arange(len(a)), a]})
        return fn

    prev_cent = None
    # r14 (§5 driver round-trips, mirroring pq.py): ONE collect per
    # codebook state — the collect materializes the pinned refit (same
    # one job) AND returns the rows the next iteration (or the final
    # assignment) needs; the separate count() was a second round-trip
    # over the same k cached rows.
    cb_np = _collect_cb(cent)
    for _ in range(iterations - 1):
        partials = pts.mapInPandas(
            _refit_partials(cb_np),
            schema="cluster bigint, dim int, sx bigint, n bigint")
        sums = (partials.groupBy("cluster", "dim")
                .agg(F.sum("sx").alias("s"), F.sum("n").alias("n")))
        cent = (sums
                .select(F.col("cluster").alias("cid"), "dim",
                        F.expr("s DIV n").alias("cx"))
                .groupBy("cid")
                .agg(F.sort_array(F.collect_list(
                    F.struct("dim", "cx"))).alias("sc"))
                .select("cid",
                        F.expr("transform(sc, s -> s.cx)").alias("c"))
                .transform(_pin))
        cb_np = _collect_cb(cent)
        # release-on-supersede (r9 ADVICE, mirroring pq.py's loop): the
        # final assignment uses driver-collected numpy centroids, so a
        # superseded iteration's pinned cent frame is dead weight once
        # the new one materializes (k·dim ints each — small, but the
        # registry precedent is explicit release).
        if prev_cent is not None:
            prev_cent.unpersist()
        prev_cent = cent
    return pts.mapInPandas(
        _assign(cb_np),
        schema="vec_id bigint, cluster bigint, d2 bigint")


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
