"""Product-quantization ANN (PQ + asymmetric distance computation) —
the codebook-compression path of the similarity family: vectors are
split into S subspaces, each subspace k-means'd into a tiny codebook,
and a vector is stored as S small codes. A query computes one exact
distance table per subspace (k entries) and scores every corpus vector
as the SUM of table lookups — the ADC scan of Jégou et al., "Product
Quantization for Nearest Neighbor Search" (TPAMI 2011).

At 100 TB this is the memory story IVF can't tell: the corpus resides
as n·S bytes of codes instead of n·dim floats (here 4 codes vs 64
floats = 64x), the distance tables are broadcast (S·k longs), and the
ADC scan is wide-code: zero corpus shuffle after code assignment.
Recall is approximate by construction; the exact-rerank composition
is knn_bruteforce over the PQ top-k.

Config honesty (measured round 8, tools/ann_crossover.py): the gate
configuration S=4, k=4 — sized so the unrolled DuckDB oracle stays
tractable — yields 4^4 = 256 composite cells, and on an amplified
1 M-vector near-dup corpus every ~4 k-member family collapses onto
identical codes: est_d2 ties massively and recall@10 reads ≈ 0. That
is the configuration, not the method: production PQ uses k=256 per
subspace (8-bit codes, 256^S cells) where the same plan shapes hold
(codebooks are still S·256 rows broadcast; training cost rises k×).
The gate config is therefore documented GATE-ONLY — like
dedup_simhash's bits=16 — and PQ's 100 TB role is the 64× memory
compression + exact-rerank composition, not standalone retrieval.

Determinism: same integer recipe as pipeline/cluster.py (scaled BIGINT
vectors, exact integer squared distances, truncating-DIV centroid
refits, lowest-id ties), so the codebooks, codes, and ADC ranking are
bit-reproducible against the unrolled DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_DIST = ("aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), "
         "CAST(0 AS BIGINT), (acc, d) -> acc + d)")


def pq_adc_topk(emb: DataFrame, n_queries: int = 3, subspaces: int = 4,
                k: int = 4, iterations: int = 2, topk: int = 5,
                scale: int = 10 ** 6, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Train S per-subspace codebooks, PQ-encode the corpus, and answer
    the first `n_queries` vectors' top-`topk` neighbors by ADC distance.
    Output: (q_id, vec_id, est_d2, rank) — rank by (est_d2, vec_id).

    Plan: ALL S subspaces train in the SAME Lloyd jobs — the corpus
    explodes once into (sub, vec_id, subvector) rows and every step
    keys by `sub`, so one refit job per iteration materializes all S
    codebooks (round-8 rewrite: the earlier per-subspace loop ran
    S·(iterations-1) eager refit jobs and S assignment scans per
    iteration; profiled at sf0.1 those barriers were ~60 % of the
    query — at 100 TB the same change means S codebooks per corpus
    pass instead of S passes). Per subspace the arithmetic is
    untouched — seeds are the first k vec_ids (subspace-independent),
    assignment is the integer min-struct (d2, cid, v) within each
    `sub`, refit is the truncating-DIV mean within (sub, cid) — so
    codebooks, codes, and ADC ranks are bit-identical to the unrolled
    per-subspace oracle. The centroid frame is S·k rows, broadcast;
    the ADC scan is wide-code: one row per vector with S codes,
    crossed with the broadcast per-query lookup arrays and summed in
    one codegen stage (no corpus shuffle after code assignment); the
    per-query top-k is a WindowGroupLimit, never a global sort."""
    from ..operators.prefix import broadcast_rank
    ivec = F.expr(
        f"transform({vec_col}, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT))")
    pts = emb.select(F.col(id_col).alias("vec_id"),
                     ivec.alias("fv")).persist()
    dim = len(pts.select("fv").first()[0])
    sub_dim = dim // subspaces
    subs = pts.select(
        "vec_id",
        F.posexplode(F.expr(
            f"transform(sequence(0, {subspaces - 1}), "
            f"s -> slice(fv, s * {sub_dim} + 1, {sub_dim}))"))
        .alias("sub", "v"))
    seed_ids = pts.orderBy("vec_id").limit(k).select("vec_id")
    ranks = broadcast_rank(seed_ids, ["vec_id"], out_col="_rn")
    cent = (subs.join(F.broadcast(ranks), "vec_id")
            .select("sub", (F.col("_rn") - 1).alias("cid"),
                    F.col("v").alias("c")))
    asn = None
    for t in range(iterations):
        asn = (subs.join(F.broadcast(cent), "sub")
               .select("sub", "vec_id", "v", "cid",
                       F.expr(_DIST).alias("d2"))
               .groupBy("sub", "vec_id")
               .agg(F.min(F.struct("d2", "cid", "v")).alias("m"))
               .select("sub", "vec_id", F.col("m.cid").alias("cluster"),
                       F.col("m.v").alias("v")))
        if t < iterations - 1:
            ex = asn.select("sub", "cluster",
                            F.posexplode("v").alias("dim", "x"))
            sums = (ex.groupBy("sub", "cluster", "dim")
                    .agg(F.sum("x").alias("sx"),
                         F.count(F.lit(1)).alias("n")))
            cent = (sums
                    .select("sub", F.col("cluster").alias("cid"), "dim",
                            F.expr("sx DIV n").alias("cx"))
                    .groupBy("sub", "cid")
                    .agg(F.sort_array(F.collect_list(
                        F.struct("dim", "cx"))).alias("sc"))
                    .select("sub", "cid",
                            F.expr("transform(sc, s -> s.cx)").alias("c"))
                    .persist())
            cent.count()   # ONE refit job for ALL subspaces
    # ADC scan, wide-code form (round-8 rewrite): one row per vector
    # with its S codes, crossed with the BROADCAST per-query distance
    # tables (n_queries rows, each carrying S arrays of k lookups) —
    # est_d2 folds to S element_at lookups summed in one codegen
    # stage, and the per-query top-k is WindowGroupLimit with its
    # map-side partial limit. The earlier (sub, code) equi-join
    # shape materialized n·q·S rows and SHUFFLED them through an
    # (q, vec) aggregate — measured at 1 M vectors x 128 queries it
    # was slower than exact brute force (81.9 s vs 64.4 s,
    # tools/ann_crossover.py); this form moves ZERO corpus rows after
    # the code assignment. Same integer sum of the same dq values ->
    # bit-identical ranks.
    codes_wide = (asn.groupBy("vec_id")
                  .agg(*[F.max(F.when(F.col("sub") == s, F.col("cluster")))
                         .alias(f"_c{s}") for s in range(subspaces)]))
    qtab = (subs.filter(F.col("vec_id") < n_queries)
            .withColumnRenamed("vec_id", "q_id")
            .join(F.broadcast(cent), "sub")
            .select("sub", "q_id", F.col("cid").alias("code"),
                    F.expr(_DIST).alias("dq")))
    qwide = (qtab.groupBy("q_id", "sub")
             .agg(F.sort_array(F.collect_list(F.struct("code", "dq")))
                  .alias("sc"))
             .select("q_id", "sub",
                     F.expr("transform(sc, s -> s.dq)").alias("darr"))
             .groupBy("q_id")
             .agg(*[F.max(F.when(F.col("sub") == s, F.col("darr")))
                    .alias(f"_d{s}") for s in range(subspaces)]))
    est = (codes_wide.crossJoin(F.broadcast(qwide))
           .select("q_id", "vec_id",
                   sum(F.element_at(
                       F.col(f"_d{s}"),
                       (F.col(f"_c{s}") + 1).cast("int"))
                       for s in range(subspaces)).alias("est_d2")))
    w = W.partitionBy("q_id").orderBy("est_d2", "vec_id")
    return (est.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select("q_id", "vec_id", "est_d2",
                    F.col("rank").cast("bigint").alias("rank")))


def pq_adc_oracle_sql(n_queries: int = 3, subspaces: int = 4, k: int = 4,
                      iterations: int = 2, topk: int = 5,
                      scale: int = 10 ** 6, dim: int = 64,
                      table: str = "embeddings") -> str:
    """DuckDB oracle: per-subspace Lloyd chains (kmeans_oracle_sql's
    construction over list slices), code assignment, broadcast distance
    tables, ADC sum, per-query rank."""
    sub_dim = dim // subspaces
    d2 = ("list_sum(list_transform(list_zip(e.v, c.c), "
          "s -> (s[1] - s[2]) * (s[1] - s[2])))")
    parts = [
        f"emb AS MATERIALIZED (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS fv "
        f"FROM {table})",
    ]
    unions = []
    for s in range(subspaces):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        p = f"s{s}"
        parts.append(
            f"{p}e AS MATERIALIZED (SELECT vec_id, fv[{lo}:{hi}] AS v "
            f"FROM emb)")
        parts.append(
            f"{p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 "
            f"AS cid, v AS c FROM (SELECT * FROM {p}e ORDER BY vec_id "
            f"LIMIT {k}))")
        for t in range(iterations):
            parts.append(
                f"{p}a{t} AS MATERIALIZED (SELECT vec_id, cid, v, d2 FROM ("
                f"SELECT e.vec_id, c.cid, e.v, {d2} AS d2, "
                f"row_number() OVER (PARTITION BY e.vec_id "
                f"ORDER BY {d2}, c.cid) AS rn "
                f"FROM {p}e e CROSS JOIN {p}c{t} c) WHERE rn = 1)")
            if t < iterations - 1:
                parts.append(
                    f"{p}s{t} AS (SELECT a.cid, t.i AS dim, "
                    f"sum(a.v[t.i]) AS s, count(*) AS n "
                    f"FROM {p}a{t} a, "
                    f"UNNEST(generate_series(1, {sub_dim})) t(i) "
                    f"GROUP BY 1, 2)")
                parts.append(
                    f"{p}c{t+1} AS (SELECT cid, list(s // n ORDER BY dim) "
                    f"AS c FROM {p}s{t} GROUP BY cid)")
        last = iterations - 1
        parts.append(
            f"{p}q AS (SELECT e.vec_id AS q_id, c.cid AS code, {d2} AS dq "
            f"FROM {p}e e CROSS JOIN {p}c{last} c "
            f"WHERE e.vec_id < {n_queries})")
        unions.append(
            f"SELECT q.q_id, a.vec_id, q.dq AS d "
            f"FROM {p}a{last} a JOIN {p}q q ON q.code = a.cid")
    parts.append("alld AS (" + " UNION ALL ".join(unions) + ")")
    parts.append(
        "est AS (SELECT q_id, vec_id, sum(d) AS est_d2 FROM alld "
        "GROUP BY q_id, vec_id)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT q_id, vec_id, est_d2, rank FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY q_id "
            f"ORDER BY est_d2, vec_id) AS rank FROM est) WHERE rank <= {topk}")
