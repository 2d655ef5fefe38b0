"""Embedding similarity search: brute-force cosine top-k, IVF partition
search, cosine near-dup pairs.

Embeddings are `array<float>` columns. Everything is computed on exact
integers: each element is quantized once as floor(double(x) * 1e6) —
a single IEEE-deterministic op — after which dot products and norms are
exact int64 sums (order-independent, engine-independent). Cosine is then
ONE double expression over exact integers:

    cos = double(dot) / sqrt(double(|a|²) * double(|b|²))

which is bit-identical in any IEEE engine — this is what makes top-k
*rankings* (not just scores) oracle-comparable.

Scale posture:
  * brute-force top-k broadcasts the (small) query set against a corpus
    scan — one shuffle for the per-query top-k window; with Spark ≥3.5 the
    rank filter becomes WindowGroupLimit (map-side partial top-k).
  * knn_ivf is the scale path: corpus pre-partitioned into cells (here the
    `label` column stands in for a k-means assignment; a real deployment
    bucket-writes by cell id), query probes only its nearest cell(s) —
    corpus scanned per query drops by ~n_cells×.
  * element ops are higher-order functions (zip_with/aggregate) — JVM
    codegen, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

QUANT = 1_000_000


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        out_col: str = "qvec") -> DataFrame:
    """array<float> → array<bigint>: floor(double(x) * 1e6) per element.
    Adds `qvec` plus its exact squared norm `qnorm2`."""
    q = F.transform(F.col(vec_col),
                    lambda x: F.floor(x.cast("double") * QUANT).cast("long"))
    df = df.withColumn(out_col, q)
    n2 = F.aggregate(F.col(out_col), F.lit(0).cast("long"),
                     lambda acc, x: acc + x * x)
    return df.withColumn("qnorm2", n2)


def _dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


# cosine from exact integer dot/norms — single deterministic double expr
_COS = "CAST(_dot AS DOUBLE) / sqrt(CAST(_n2a AS DOUBLE) * CAST(_n2b AS DOUBLE))"


def knn_bruteforce(emb: DataFrame, query_ids, k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self excluded). Output (q_id, n_id, cos round 6), ranked by
    (cos desc, n_id asc) — fully deterministic."""
    q = quantize_embeddings(emb, vec_col)
    corpus = q.select(F.col(id_col).alias("n_id"), F.col("qvec").alias("cv"),
                      F.col("qnorm2").alias("_n2b"))
    queries = (q.filter(F.col(id_col).isin(list(query_ids)))
               .select(F.col(id_col).alias("q_id"), F.col("qvec").alias("qv"),
                       F.col("qnorm2").alias("_n2a")))
    pairs = (F.broadcast(queries).crossJoin(corpus)
             .filter(F.col("q_id") != F.col("n_id"))
             .withColumn("_dot", _dot("qv", "cv"))
             .withColumn("cos", F.expr(_COS)))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("q_id", "n_id", F.round("cos", 6).alias("cos")))


def knn_ivf(emb: DataFrame, query_ids, k: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding", cell_col: str = "label",
            nprobe: int = 1) -> DataFrame:
    """IVF-style ANN: corpus is partitioned into cells (`cell_col`);
    each query is assigned to the `nprobe` cells whose centroid direction
    is nearest (cos against the cell's exact component-sum vector —
    scale-invariant, so the un-normalized sum IS the centroid for cosine)
    and searches only those cells. nprobe is the standard IVF
    recall/latency dial: scanned fraction ~= nprobe/n_cells.
    Output (q_id, n_id, cos round 6).

    Centroid norms use DECIMAL(38,0) accumulation (component sums squared
    overflow int64) — still exact, still engine-portable.
    """
    q = quantize_embeddings(emb, vec_col)
    # exact centroid component sums per cell
    comp = (q.select(cell_col, F.posexplode("qvec").alias("pos", "v"))
            .groupBy(cell_col, "pos").agg(F.sum("v").alias("cs")))
    cnorm = (comp.groupBy(cell_col)
             .agg(F.sum(F.col("cs").cast("decimal(19,0)")
                        * F.col("cs").cast("decimal(19,0)")).alias("cn2")))
    queries = (q.filter(F.col(id_col).isin(list(query_ids)))
               .select(F.col(id_col).alias("q_id"), F.col("qvec").alias("qv"),
                       F.col("qnorm2").alias("qn2")))
    qcomp = queries.select("q_id", F.posexplode("qv").alias("pos", "qval"))
    # query × cell affinity: ranking value = dot(q, centroid_sum)/|centroid_sum|
    # (|q| is constant per query — dropped from the argmax)
    aff = (qcomp.join(F.broadcast(comp), "pos")
           .groupBy("q_id", cell_col)
           .agg(F.sum(F.col("qval") * F.col("cs")).alias("qc_dot"))
           .join(F.broadcast(cnorm), cell_col)
           .withColumn("rank_val", F.expr(
               "CAST(qc_dot AS DOUBLE) / sqrt(CAST(cn2 AS DOUBLE))")))
    wcell = W.partitionBy("q_id").orderBy(F.col("rank_val").desc(), F.col(cell_col))
    assign = (aff.withColumn("_rn", F.row_number().over(wcell))
              .filter(F.col("_rn") <= nprobe).select("q_id", cell_col))
    corpus = q.select(cell_col, F.col(id_col).alias("n_id"),
                      F.col("qvec").alias("cv"), F.col("qnorm2").alias("_n2b"))
    pairs = (F.broadcast(queries.join(assign, "q_id")
                         .withColumnRenamed("qn2", "_n2a"))
             .join(corpus, cell_col)
             .filter(F.col("q_id") != F.col("n_id"))
             .withColumn("_dot", _dot("qv", "cv"))
             .withColumn("cos", F.expr(_COS)))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("q_id", "n_id", F.round("cos", 6).alias("cos")))


def build_ivf_index(emb: DataFrame, path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    cell_col: str = "label") -> None:
    """Persist an IVF index: quantized vectors partitioned BY CELL on disk
    (`partitionBy(cell)`) plus the exact centroid component sums. A query
    that probes one cell then reads exactly one partition directory —
    partition pruning does the candidate selection, which is the entire
    point of IVF at 100 TB (corpus I/O per query drops ~n_cells×)."""
    q = quantize_embeddings(emb, vec_col)
    (q.select(cell_col, id_col, "qvec", "qnorm2")
     .write.mode("overwrite").partitionBy(cell_col).parquet(f"{path}/cells"))
    comp = (q.select(cell_col, F.posexplode("qvec").alias("pos", "v"))
            .groupBy(cell_col, "pos").agg(F.sum("v").alias("cs")))
    comp.write.mode("overwrite").parquet(f"{path}/centroids")


def append_ivf_index(emb_delta: DataFrame, path: str,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     cell_col: str = "label") -> None:
    """Incremental IVF maintenance — delta-apply, never rebuild:

    * new vectors APPEND parquet files into exactly the cell partition
      directories they land in (`partitionBy(cell)` append) — existing
      cell data is untouched, so the write cost is O(|delta|) no matter
      how big the index already is;
    * their centroid component-sum deltas APPEND to the centroids log as
      a new segment; readers merge segments with one
      groupBy(cell, pos).sum — centroid sums are additive, the same
      delta-apply contract `incremental_view_maintenance` proves for
      aggregates. No read-modify-write anywhere, so a crashed append
      never corrupts the base index (re-run is the recovery).

    The merged read is exact: component sums and counts are integers,
    so base+delta sums are bit-identical to a full rebuild's — which is
    what lets `knn_ivf_incremental` share the full-corpus oracle.
    """
    q = quantize_embeddings(emb_delta, vec_col)
    (q.select(cell_col, id_col, "qvec", "qnorm2")
     .write.mode("append").partitionBy(cell_col).parquet(f"{path}/cells"))
    comp = (q.select(cell_col, F.posexplode("qvec").alias("pos", "v"))
            .groupBy(cell_col, "pos").agg(F.sum("v").alias("cs")))
    comp.write.mode("append").parquet(f"{path}/centroids")


def search_ivf_index(spark, path: str, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     cell_col: str = "label", nprobe: int = 3) -> DataFrame:
    """Probe the persisted IVF index: assign each query vector to its
    `nprobe` max-affinity centroids, then scan only those cells'
    partition directories (partition pruning still applies — the pruned
    set is the nprobe cells). `queries` needs (id_col, embedding).

    Default nprobe=3, measured on the 1 M-vector crossover corpus
    (BENCH_NOTES.md "ANN crossover"): nprobe=1 reads 1/n_cells of the
    corpus but its recall@10 was 0.26; nprobe=3 recovered 0.51 recall at
    a still-7× win over brute force — the right deployment default.
    Oracle-gated queries pass nprobe=1 explicitly (the oracle SQL
    replays exactly one probed cell per query)."""
    q = quantize_embeddings(queries)
    qs = q.select(F.col(id_col).alias("q_id"), F.col("qvec").alias("qv"),
                  F.col("qnorm2").alias("_n2a"))
    # merge centroid segments (base + any append_ivf_index deltas):
    # component sums are additive integers, so the merged centroid is
    # exactly the full-rebuild centroid
    comp = (spark.read.parquet(f"{path}/centroids")
            .groupBy(cell_col, "pos").agg(F.sum("cs").alias("cs")))
    cnorm = (comp.groupBy(cell_col)
             .agg(F.sum(F.col("cs").cast("decimal(19,0)")
                        * F.col("cs").cast("decimal(19,0)")).alias("cn2")))
    qcomp = qs.select("q_id", F.posexplode("qv").alias("pos", "qval"))
    aff = (qcomp.join(F.broadcast(comp), "pos")
           .groupBy("q_id", cell_col)
           .agg(F.sum(F.col("qval") * F.col("cs")).alias("qc_dot"))
           .join(F.broadcast(cnorm), cell_col)
           .withColumn("rank_val", F.expr(
               "CAST(qc_dot AS DOUBLE) / sqrt(CAST(cn2 AS DOUBLE))")))
    wcell = W.partitionBy("q_id").orderBy(F.col("rank_val").desc(),
                                          F.col(cell_col))
    assign = (aff.withColumn("_rn", F.row_number().over(wcell))
              .filter(F.col("_rn") <= nprobe).select("q_id", cell_col))
    cells = spark.read.parquet(f"{path}/cells")
    corpus = cells.select(cell_col, F.col(id_col).alias("n_id"),
                          F.col("qvec").alias("cv"),
                          F.col("qnorm2").alias("_n2b"))
    pairs = (F.broadcast(qs.join(assign, "q_id")).join(corpus, cell_col)
             .filter(F.col("q_id") != F.col("n_id"))
             .withColumn("_dot", _dot("qv", "cv"))
             .withColumn("cos", F.expr(_COS)))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("q_id", "n_id", F.round("cos", 6).alias("cos")))


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 random-hyperplane family (seeded LCG, no engine
    RNG): plane p, dim d → +1 if lcg(p*dim+d) is even else -1. Pure
    integer arithmetic so the SAME literal planes embed in the Spark plan
    and the SQL oracle."""
    planes = []
    state = seed & 0x7FFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(1 if (state >> 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def hyperplane_lsh_topk(emb: DataFrame, query_ids, k: int = 5,
                        n_planes: int = 8, band_planes: int = 2,
                        dim: int = 64, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        probe_flips: int = 0) -> DataFrame:
    """ANN top-k via random-hyperplane (SimHash-for-cosine) LSH: the
    LSH-bucketed scale path next to knn_bruteforce (exact) and knn_ivf
    (cell-probed).

    Signature bit_p = [dot(qvec, plane_p) >= 0] — exact int64 (±1 planes,
    quantized vectors), so bucketing is engine-deterministic. Bits are
    grouped into bands of `band_planes`; two vectors are CANDIDATES iff
    they share any (band, band_key) bucket — the standard OR-of-ANDs LSH
    amplification. Candidates then get the exact integer cosine and a
    per-query top-k (ties broken by n_id), so the output is a deterministic
    subset of knn_bruteforce's answer.

    Scale: the bucket join replaces the all-pairs cross join — corpus
    work per query drops to the occupancy of its ~n_planes/band_planes
    buckets; band frames shuffle on (band, key) which AQE coalesces.

    `probe_flips` > 0 enables MULTIPROBE: each query band additionally
    probes the buckets whose key differs in one of the lowest
    `probe_flips` bits — the standard multiprobe recall dial (near-miss
    vectors land one sign-flip away). Candidate work grows only on the
    (tiny) query side, ×(1 + probe_flips) band rows; the corpus index
    is untouched — the LSH counterpart of IVF's nprobe.
    """
    planes = hyperplanes(n_planes, dim)
    n_bands = n_planes // band_planes
    q = quantize_embeddings(emb, vec_col)

    def plane_dot(p: list[int]):
        lit = F.array(*[F.lit(v).cast("long") for v in p])
        return _dot(F.col("qvec"), lit)

    band_keys = []
    for b in range(n_bands):
        key = F.lit(0).cast("long")
        for i in range(band_planes):
            bit = (plane_dot(planes[b * band_planes + i]) >= 0).cast("long")
            key = key + bit * F.lit(1 << i)
        band_keys.append(key)
    sig = q.select(F.col(id_col), "qvec", "qnorm2",
                   F.posexplode(F.array(*band_keys)).alias("band", "bkey"))
    qb = (sig.filter(F.col(id_col).isin(list(query_ids)))
          .select(F.col(id_col).alias("q_id"), "band", "bkey"))
    if probe_flips:
        variants = F.array(F.col("bkey"),
                           *[F.col("bkey").bitwiseXOR(F.lit(1 << i))
                             for i in range(probe_flips)])
        qb = (qb.select("q_id", "band", F.explode(variants).alias("bkey"))
              .distinct())
    cand = (F.broadcast(qb)
            .join(sig.select(F.col(id_col).alias("n_id"), "band", "bkey"),
                  ["band", "bkey"])
            .filter(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id").distinct())
    vecs = q.select(F.col(id_col), "qvec", "qnorm2")
    # r14 (§3.1 — broadcast the side that FITS): the q-side build only
    # ever matches the query ids (cand.q_id ⊆ query_ids by
    # construction), so it is filtered to them BEFORE the broadcast —
    # |queries| rows instead of the whole quantized corpus (the before
    # plan carried two corpus-sized BroadcastExchanges). The n_id
    # attach then broadcasts the (queries × bucket-occupancy) candidate
    # side and leaves the corpus un-shuffled and un-broadcast — the
    # only shape that survives 10^9 vectors. Join outputs are
    # strategy-independent: bit-identical.
    qvecs = (vecs.filter(F.col(id_col).isin(list(query_ids)))
             .select(F.col(id_col).alias("q_id"),
                     F.col("qvec").alias("qv"),
                     F.col("qnorm2").alias("_n2a")))
    pairs = (F.broadcast(cand.join(F.broadcast(qvecs), "q_id"))
             .join(vecs.select(F.col(id_col).alias("n_id"),
                               F.col("qvec").alias("cv"),
                               F.col("qnorm2").alias("_n2b")), "n_id")
             .withColumn("_dot", _dot("qv", "cv"))
             .withColumn("cos", F.expr(_COS)))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("q_id", "n_id", F.round("cos", 6).alias("cos")))


def embedding_near_dup(emb: DataFrame, min_cos: float = 0.4,
                       n_blocks: int = 8, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """EXACT cosine near-duplicate pairs: (id_a < id_b, cos ≥ min_cos).

    The exact contract makes Θ(n²) comparisons unavoidable in the worst
    case (a low threshold like 0.4 admits pairs across the whole sphere —
    measured on the test corpus, 91 % of qualifying pairs span different
    IVF cells, so cell-bucketed candidates cannot keep the exact answer).
    What a cluster CAN fix is how those comparisons are *distributed*:
    instead of one CartesianProduct, this uses the block-matrix self-join.
    Each vector hashes into one of B buckets; every unordered bucket pair
    (i ≤ j) is an equi-join key; a vector in bucket p replicates to the
    B−p left tags (p,j≥p) and p+1 right tags (i≤p,p). Shuffle is
    O(n·(B+1)) rows, the compare work spreads over B(B+1)/2 independent
    join groups, and per-task memory is bounded by ~2n/B vectors — no
    cartesian node, no skew. Pick B so B(B+1)/2 ≥ target parallelism and
    n/B fits an executor. For sublinear *approximate* candidate
    generation under a recall contract, see hyperplane_lsh_topk / knn_ivf.

    Bucketing affects only the physical plan, never the result, so the
    SQL oracle stays the plain all-pairs formulation.
    """
    B = n_blocks
    q = quantize_embeddings(emb, vec_col).withColumn(
        "_bkt", F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
                       16, 10).cast("long") % B)
    left_tags = F.transform(F.sequence(F.col("_bkt"), F.lit(B - 1)),
                            lambda j: F.col("_bkt") * B + j)
    right_tags = F.transform(F.sequence(F.lit(0).cast("long"), F.col("_bkt")),
                             lambda i: i * B + F.col("_bkt"))
    lhs = q.select(F.col(id_col).alias("id_l"), F.col("qvec").alias("qv"),
                   F.col("qnorm2").alias("_n2a"), F.col("_bkt").alias("_bl"),
                   F.explode(left_tags).alias("tag"))
    rhs = q.select(F.col(id_col).alias("id_r"), F.col("qvec").alias("cv"),
                   F.col("qnorm2").alias("_n2b"), F.col("_bkt").alias("_br"),
                   F.explode(right_tags).alias("tag"))
    pairs = (lhs.join(rhs, "tag")
             .filter((F.col("_bl") < F.col("_br")) |
                     ((F.col("_bl") == F.col("_br")) &
                      (F.col("id_l") < F.col("id_r"))))
             .withColumn("_dot", _dot("qv", "cv"))
             .withColumn("cos", F.expr(_COS))
             .filter(F.col("cos") >= min_cos))
    return pairs.select(F.least("id_l", "id_r").alias("id_a"),
                        F.greatest("id_l", "id_r").alias("id_b"),
                        F.round("cos", 6).alias("cos"))
