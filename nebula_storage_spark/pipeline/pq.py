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

from .. import cache as _cache


def pq_train_encode(emb: DataFrame, n_queries: int = 3, subspaces: int = 4,
                    k: int = 4, iterations: int = 2,
                    scale: int = 10 ** 6, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    train_fraction: float = 1.0
                    ) -> tuple[DataFrame, DataFrame]:
    """Train S per-subspace codebooks and PQ-encode: returns
    (codes_wide, qwide) — the corpus as one row per vector with S
    codes, and the first `n_queries` vectors' per-query broadcast
    lookup arrays (S densified arrays of k dq values each). The split
    from pq_adc_scan exists so the post-encoding scan is separately
    measurable (tools/pq_scaling.py pins its zero-corpus-shuffle
    claim on exactly this boundary).

    Plan: ALL S subspaces train in the SAME Lloyd jobs (round-8
    rewrite: the earlier per-subspace loop ran S·(iterations-1) eager
    refit jobs per iteration — S codebooks per corpus pass instead of
    S passes), and NO step moves corpus-sized data (round-9 v3, see
    the loop comment): assignment and encode are expression maps over
    un-exploded vector rows against a one-row broadcast of all S
    codebooks (the encode as an Arrow-batched numpy kernel — see its
    comment), and the refit's groupBy reduces map-side to at most
    S·k·dim partials per task. Per subspace the arithmetic is
    untouched — seeds are the first k (sampled) vec_ids
    (subspace-independent), assignment is the integer min-struct
    (d2, cid), refit is the truncating-DIV mean within (sub, cid) —
    so codebooks, codes, and ADC ranks are bit-identical to the
    unrolled per-subspace oracle. The ADC scan is wide-code: one row
    per vector with S codes, crossed with the broadcast per-query
    lookup arrays and summed in one codegen stage; the per-query
    top-k is a WindowGroupLimit, never a global sort.

    train_fraction < 1.0 is the 100 TB training posture (round 9):
    codebooks are statistics of the distribution, not of every row, so
    production PQ trains on a sample and encodes everything — Jegou et
    al. train 256-cell codebooks on ~100 k vectors regardless of corpus
    size. The Lloyd refits here run over a deterministic md5-PRF sample
    (keyed by vec_id, so a vector is in or out across ALL subspaces),
    seeds are the first k SAMPLED vec_ids, and the encode still covers
    the full corpus against the broadcast codebooks. At fraction 1.0
    (the gate config) the filter is not planted at all: the lineage is
    bit-identical to the unrolled oracle. Sampled training is
    approximate BY DESIGN (different codebooks => different codes);
    its recall under the rerank composition is measured at the 1 M
    design point in tools/ann_crossover.py (the `pqs` arm)."""
    from ..operators.prefix import broadcast_rank
    ivec = F.expr(
        f"transform({vec_col}, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT))")
    pts = _cache.pin(emb.select(F.col(id_col).alias("vec_id"),
                                ivec.alias("fv")))
    dim = len(pts.select("fv").first()[0])
    sub_dim = dim // subspaces
    # ZERO corpus-sized exchanges anywhere in PQ (round 9): the
    # codebook is S·k tiny rows BY CONSTRUCTION, so nearest-centroid
    # never needs the explode + groupBy(sub, vec_id) min-struct the
    # earlier shapes used — assignment and encode are MAPS over
    # un-exploded vector rows. The round's measurement program forced
    # this in three falsified steps: v1 pinned the n·S-row exploded
    # frame pre-partitioned on the assignment key (one exchange, paid
    # at materialization, plus a corpus-sized cache); v2 dropped the
    # pin and the encode's groupBy planted its own n·S exchange —
    # at the 1 M design point the two roughly tie (32.0 vs 52.1 s at
    # q=8, 50.9 vs 39.2 at q=128: the exchange and the cache cost the
    # same corpus-sized movement); v3 folded nearest-centroid into a
    # SQL higher-order function over a one-row codebook broadcast —
    # no explode, no exchange, no cache, but interpreted-lambda
    # evaluation put the 1 M encode at ~32 s. v4 keeps v3's shape and
    # moves the arithmetic into Arrow-batched numpy kernels (below);
    # per Lloyd iteration the refit shuffle is <= S·k·dim partial
    # rows per task. Same integer arithmetic, same (d2, cid) tie
    # rule -> bit-identical codebooks, codes, and ranks.
    if train_fraction < 1.0:
        # deterministic per-VECTOR membership (md5 PRF, the
        # similarity-family idiom); the sample is read once per
        # iteration, so IT gets the pin — fraction·n rows, never n.
        thr = max(1, int(round(train_fraction * 65536)))
        prf = (F.conv(F.substring(F.md5(F.concat(
            F.lit("pqt#"), F.col("vec_id").cast("string"))), 1, 4),
            16, 10).cast("bigint") < thr)
        train_pts = _cache.pin(pts.filter(prf))
        # r9 ADVICE: thr=max(1,...) guards the FRACTION, not the corpus
        # size — on a small corpus the PRF can admit zero rows (or fewer
        # than k seeds), and an empty codebook surfaces as an opaque
        # np.argmin ValueError inside executors during encode. Fail
        # loudly here instead; the count also materializes the pinned
        # sample the Lloyd iterations re-read.
        n_train = train_pts.count()
        if n_train < k:
            raise ValueError(
                f"pq_train_encode: train_fraction={train_fraction} "
                f"sampled only {n_train} vectors but k={k} seeds are "
                f"needed — raise train_fraction (corpus too small for "
                f"this sampling rate)")
    else:
        train_pts = pts
    seed_ids = train_pts.orderBy("vec_id").limit(k).select("vec_id")
    ranks = broadcast_rank(seed_ids, ["vec_id"], out_col="_rn")
    cent = (train_pts.join(F.broadcast(ranks), "vec_id")
            .select(F.posexplode(F.expr(
                f"transform(sequence(0, {subspaces - 1}), "
                f"s -> slice(fv, s * {sub_dim} + 1, {sub_dim}))"))
                .alias("sub", "c"),
                (F.col("_rn") - 1).cast("bigint").alias("cid"))
            .select("sub", "cid", "c"))

    def _cbs_local(sess, cb_np) -> DataFrame:
        """Fold the collected codebooks into ONE row: `cbs` is an
        S-element array (indexed by sub) of cid-sorted
        array<struct<cid, c>> — the broadcast the query-table map
        looks centroids up in. Built as a LocalRelation from the
        driver-side cb_np (S·k tiny rows, already collected for the
        encode kernel) — identical to aggregating the cent frame
        (sort_array over struct(cid, c) == cid order; cids unique),
        with zero cluster jobs (r14, guide §5)."""
        row = [[(int(cid), [int(x) for x in vec])
                for cid, vec in zip(cids, cents.tolist())]
               for cids, cents in cb_np]
        return sess.createDataFrame(
            [(row,)],
            "cbs array<array<struct<cid: bigint, c: array<bigint>>>>")

    # Assignment and encode run as Arrow-batched numpy KERNELS
    # (mapInPandas), not SQL expressions: the nearest-centroid HOF is
    # interpreted per lambda invocation, and n·S·k of them profiled
    # 32 s at the 1 M x k=32 design point where the vectorized
    # (B, k, dim) int64 einsum does the identical exact arithmetic in
    # ~2 s (r10: the kernel is now the expanded integer matmul of
    # pipeline/kernels.py — same exact arithmetic, 4-26x again). The arithmetic and the lowest-cid tie rule live in
    # pipeline/kernels.py (ONE copy shared with pipeline/cluster.py —
    # r10, per r9 ADVICE). The codebook is collected driver-side —
    # S·k tiny rows, the same bounded contract as the one-row cbs
    # broadcast (training materializes it anyway).
    from .kernels import collect_centroids

    def _collect_cb(cb: DataFrame) -> list:
        by_sub: dict[int, list] = {}
        for r in cb.collect():
            by_sub.setdefault(int(r["sub"]), []).append(
                (int(r["cid"]), [int(x) for x in r["c"]]))
        return [collect_centroids(by_sub.get(s, []))
                for s in range(subspaces)]

    def _refit_partials(cb_np):
        """Per Arrow batch: assign each training vector's subvectors
        to their nearest centroids and emit the refit's partial sums —
        at most S·k·dim (sub, cid, dim, sx, n) rows per batch. The
        groupBy below adds exact integers, so the map-side reduction
        is bit-neutral; the shuffle is codebook-sized, never
        corpus-sized."""
        def fn(batches):
            import numpy as _np
            import pandas as _pd
            from nebula_storage_spark.pipeline.kernels import (
                nearest_centroid, refit_partial_sums)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _np.stack(pdf["fv"].to_numpy()).astype(_np.int64)
                rows = {"sub": [], "cid": [], "dim": [],
                        "sx": [], "n": []}
                for s, (cids, cents) in enumerate(cb_np):
                    xs = x[:, s * sub_dim:(s + 1) * sub_dim]
                    a, _ = nearest_centroid(xs, cents)
                    for cid, cnt, sx in refit_partial_sums(xs, a, cids):
                        rows["sub"].extend([s] * sub_dim)
                        rows["cid"].extend([cid] * sub_dim)
                        rows["dim"].extend(range(sub_dim))
                        rows["sx"].extend(int(v) for v in sx)
                        rows["n"].extend([cnt] * sub_dim)
                yield _pd.DataFrame(rows).astype(
                    {"sub": "int32", "cid": "int64", "dim": "int32",
                     "sx": "int64", "n": "int64"})
        return fn

    prev_cent = None
    # r14 (§5 driver round-trips, r13 verdict Next #4): ONE collect per
    # codebook state. The old loop ran collect(previous cent) + refit
    # count(new cent) per iteration PLUS a final collect — the collect
    # itself materializes the persisted refit (same one job), so
    # carrying cb_np forward drops one driver round-trip per train.
    cb_np = _collect_cb(cent)   # seed codebooks (one job)
    for _ in range(iterations - 1):
        partials = train_pts.mapInPandas(
            _refit_partials(cb_np),
            schema="sub int, cid bigint, dim int, sx bigint, n bigint")
        sums = (partials.groupBy("sub", "cid", "dim")
                .agg(F.sum("sx").alias("sx"), F.sum("n").alias("n")))
        cent = (sums
                .select("sub", "cid", "dim",
                        F.expr("sx DIV n").alias("cx"))
                .groupBy("sub", "cid")
                .agg(F.sort_array(F.collect_list(
                    F.struct("dim", "cx"))).alias("sc"))
                .select("sub", "cid",
                        F.expr("transform(sc, s -> s.cx)").alias("c"))
                .persist())
        # ONE refit job for ALL subspaces: the collect materializes the
        # persisted frame AND returns the rows the next iteration (or
        # the encode) needs — the separate count() was a second
        # round-trip over the same 16 cached rows.
        cb_np = _collect_cb(cent)
        # the refit is materialized, so the superseded codebook's
        # blocks are dead weight (downstream plans reference only
        # THIS cent; an eviction recomputes the chain correctly) —
        # release it now and register the live one (r8 ADVICE:
        # repeated pq_adc_topk calls in ann_crossover's timing
        # loops accumulated one cached frame per iteration).
        if prev_cent is not None:
            prev_cent.unpersist()
        prev_cent = _cache.track(cent)
    # `cbs` — the one-row broadcast the query-table map consumes — is
    # assembled DRIVER-SIDE from the already-collected cb_np as a
    # LocalRelation instead of re-aggregating the cached cent frame:
    # the two-groupBy _cbs chain cost 2-3 AQE stage-jobs inside every
    # qwide broadcast build (r14, §5). Values are identical by
    # construction: _cbs sorts struct(cid, c) ascending == cb_np's
    # cid-sorted rows (collect_centroids sorts by cid; cids unique).
    cbs = _cbs_local(train_pts.sparkSession, cb_np)

    # the ENCODE is a MAP: one row per vector in, S code columns out,
    # zero shuffle (under sampled training this is the only
    # full-corpus pass). The wide-code form feeds the ADC scan
    # (round-8 rewrite): est_d2 folds to S element_at lookups against
    # the broadcast per-query tables and the per-query top-k is a
    # WindowGroupLimit — the (sub, code) equi-join shape this
    # replaced measured SLOWER than exact brute force at 1 M x 128
    # queries (81.9 vs 64.4 s, tools/ann_crossover.py).
    def _encode(batches):
        import numpy as _np
        import pandas as _pd
        from nebula_storage_spark.pipeline.kernels import nearest_centroid
        for pdf in batches:
            if not len(pdf):
                continue
            x = _np.stack(pdf["fv"].to_numpy()).astype(_np.int64)
            out = {"vec_id": pdf["vec_id"]}
            for s, (cids, cents) in enumerate(cb_np):
                xs = x[:, s * sub_dim:(s + 1) * sub_dim]
                a, _ = nearest_centroid(xs, cents)
                out[f"_c{s}"] = cids[a]
            yield _pd.DataFrame(out)

    codes_wide = pts.mapInPandas(
        _encode, schema="vec_id bigint, " + ", ".join(
            f"_c{s} bigint" for s in range(subspaces)))

    # DENSIFIED per-query lookup arrays (r8 ADVICE fix): a refit can
    # empty a cluster (duplicate subvectors among the k seed vectors,
    # or any run with iterations > 2), leaving surviving cids
    # NON-contiguous — a positionally-collected array would silently
    # shift every dq after the gap and index past the end under ANSI
    # mode. Slot i therefore holds cid i's dq looked up BY VALUE
    # (try_element_at over the filtered codebook; dead cids coalesce
    # to a 0 placeholder no surviving code ever references), so
    # position == cid unconditionally and the ADC scan's element_at
    # stays the O(1) positional lookup.
    def _qd(s: int) -> str:
        return (f"transform(sequence(0, {k - 1}), i -> coalesce("
                f"aggregate(zip_with("
                f"slice(fv, {s} * {sub_dim} + 1, {sub_dim}), "
                f"try_element_at(filter(element_at(cbs, {s} + 1), "
                f"e -> e.cid = i), 1).c, "
                f"(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), "
                f"(acc, d) -> acc + d), CAST(0 AS BIGINT)))")
    qwide = (pts.filter(F.col("vec_id") < n_queries)
             .crossJoin(F.broadcast(cbs))
             .select(F.col("vec_id").alias("q_id"),
                     *[F.expr(_qd(s)).alias(f"_d{s}")
                       for s in range(subspaces)]))
    return codes_wide, qwide


def pq_adc_scan(codes_wide: DataFrame, qwide: DataFrame, subspaces: int = 4,
                topk: int = 5, prefilter: bool = False,
                prefilter_buckets: int = 2048) -> DataFrame:
    """The ADC scan over an encoded corpus: codes crossed with the
    BROADCAST per-query lookup arrays, est_d2 folded to S element_at
    lookups summed in one codegen stage, per-query top-k as a
    WindowGroupLimit with its map-side partial limit. Moves ZERO
    corpus rows: the only shuffle is the partial top-k stream
    (tasks x queries x topk rows), measured by tools/pq_scaling.py.
    Output: (q_id, vec_id, est_d2, rank) — rank by (est_d2, vec_id).

    prefilter=True engages the big-R path (profiled round 9 at the
    1 M x 128-query design point with R=1024): the plain plan's cost
    is NOT the est computation (0.56 s) but the 131 M-row sort
    WindowGroupLimit needs below its partial pass (28.2 s). A
    deterministic integer HISTOGRAM bounds that sort input with an
    exact-superset threshold — per query: (1) min/max of est_d2,
    (2) bucket counts at width ceil(range/buckets), (3) the first
    bucket whose cumulative count reaches `topk` gives
    thr = lo + (bucket+1)·width − 1, whose rank is ≥ topk by
    construction; (4) filter est_d2 <= thr, then the SAME exact
    window ranks the survivors — so the output is bit-identical to
    the plain path (pytest-pinned parity) while the sort sees only
    ~topk + one bucket's ties per query. Pure integer arithmetic:
    deterministic, no approx-percentile merge-order dependence. The
    histogram passes re-scan the est expression (cheap codegen over
    cached codes); everything stays ONE lazy plan — the tiny per-query
    threshold frame broadcasts back into the filter. Costs three
    extra cheap aggregation passes, so the default gate-scale path
    keeps the single-sort plan."""
    # ALWAYS pin the codes: they are the 64x-compressed representation
    # (n·(S+1) ints), tiny by design, registered for release like
    # every builder cache — and the pin is a RE-EXECUTION BARRIER, not
    # just a reuse. The v4 encode is a mapInPandas kernel (so
    # CollapseProject can no longer fold it into the scan expression —
    # the v3-era mechanism this comment used to describe), but an
    # UNCACHED kernel still re-runs once per downstream pass over the
    # codes: the prefilter's min/max + histogram + threshold + rank
    # passes re-scan est four times (a lazy codes chain re-ran the
    # encode per pass: 92.9 s vs ~33 s end-to-end at the 1 M point),
    # and a deployment's repeated pq_adc_scan calls over one encoding
    # would each pay the full-corpus kernel again (the v3 numbers for
    # that shape: 11 s -> 21 s at q=8, 36 s at q=128).
    codes_wide = _cache.pin(codes_wide)
    est = (codes_wide.crossJoin(F.broadcast(qwide))
           .select("q_id", "vec_id",
                   sum(F.element_at(
                       F.col(f"_d{s}"),
                       (F.col(f"_c{s}") + 1).cast("int"))
                       for s in range(subspaces)).alias("est_d2")))
    if prefilter:
        b = int(prefilter_buckets)
        rng = (est.groupBy("q_id")
               .agg(F.min("est_d2").alias("_lo"),
                    F.max("est_d2").alias("_hi"))
               .select("q_id", "_lo",
                       F.expr(f"CAST((_hi - _lo) DIV {b} + 1 AS BIGINT)")
                       .alias("_w")))
        hist = (est.join(F.broadcast(rng), "q_id")
                .groupBy("q_id", F.expr("(est_d2 - _lo) DIV _w")
                         .alias("_b"))
                .agg(F.count(F.lit(1)).alias("_n")))
        cw = W.partitionBy("q_id").orderBy("_b")
        thr = (hist.withColumn("_cum", F.sum("_n").over(cw))
               .groupBy("q_id")
               # first bucket reaching topk; if topk > n no bucket
               # qualifies — keep everything via the last bucket
               .agg(F.coalesce(
                   F.min(F.when(F.col("_cum") >= topk, F.col("_b"))),
                   F.max("_b")).alias("_tb"))
               .join(rng, "q_id")
               .select("q_id", (F.col("_lo") + (F.col("_tb") + 1)
                                * F.col("_w") - 1).alias("_thr")))
        est = (est.join(F.broadcast(thr), "q_id")
               .filter(F.col("est_d2") <= F.col("_thr"))
               .select("q_id", "vec_id", "est_d2"))
    w = W.partitionBy("q_id").orderBy("est_d2", "vec_id")
    return (est.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select("q_id", "vec_id", "est_d2",
                    F.col("rank").cast("bigint").alias("rank")))


def pq_adc_topk(emb: DataFrame, n_queries: int = 3, subspaces: int = 4,
                k: int = 4, iterations: int = 2, topk: int = 5,
                scale: int = 10 ** 6, id_col: str = "vec_id",
                vec_col: str = "embedding",
                train_fraction: float = 1.0) -> DataFrame:
    """Train S per-subspace codebooks, PQ-encode the corpus, and answer
    the first `n_queries` vectors' top-`topk` neighbors by ADC distance
    (pq_train_encode + pq_adc_scan; see their docstrings for the plan
    and the 100 TB posture)."""
    codes_wide, qwide = pq_train_encode(
        emb, n_queries=n_queries, subspaces=subspaces, k=k,
        iterations=iterations, scale=scale, id_col=id_col,
        vec_col=vec_col, train_fraction=train_fraction)
    return pq_adc_scan(codes_wide, qwide, subspaces=subspaces, topk=topk)


def pq_rerank_topk(emb: DataFrame, n_queries: int = 3, subspaces: int = 4,
                   k: int = 4, iterations: int = 2, candidates: int = 20,
                   topk: int = 5, scale: int = 10 ** 6,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   prefilter: bool = False,
                   train_fraction: float = 1.0) -> DataFrame:
    """PQ's PRODUCTION composition (r8 verdict, Next #2): the wide-code
    ADC scan selects each query's top-`candidates` corpus vectors by
    estimated distance, then EXACT integer cosine re-ranks that small
    candidate set to the final top-`topk`. Output
    (q_id, vec_id, cos, rank) — the knn_bruteforce contract (self
    excluded, cos rounded to 6, rank by (cos desc, vec_id)) so
    recall@k of the composition is directly comparable to the exact
    answer.

    This is the retrieval story PQ exists for at 100 TB: the corpus
    lives as n·S bytes of codes (64x smaller than the float vectors),
    the ADC scan touches ONLY codes (zero corpus-vector IO, zero
    corpus shuffle after encoding), and the full-precision vectors are
    read back for just n_queries·candidates rows — here via a
    broadcast-hash join of the (tiny) candidate list INTO the vector
    scan, so the corpus side never shuffles either; a deployment with
    the vectors bucket-written by vec_id turns that into a point-fetch.
    Recall of the composition at the 1 M design point is measured in
    tools/ann_crossover.py (the `pqr` arm) — raw gate-config ADC reads
    recall ~0 there (256 cells, documented in the module header), the
    rerank recovers the exact top-k once `candidates` covers the
    query's code cell.

    The exact stage reuses the similarity family's quantization
    (floor(x·1e6), pipeline/similarity.py) — intentionally NOT the
    codebook's round(x·1e6): the rerank must rank like knn_bruteforce,
    bit-for-bit, so the two paths share one recipe and one oracle
    fragment."""
    codes_wide, qwide = pq_train_encode(
        emb, n_queries=n_queries, subspaces=subspaces, k=k,
        iterations=iterations, scale=scale, id_col=id_col,
        vec_col=vec_col, train_fraction=train_fraction)
    return pq_rerank_from_codes(
        codes_wide, qwide, emb, n_queries=n_queries, subspaces=subspaces,
        candidates=candidates, topk=topk, id_col=id_col, vec_col=vec_col,
        prefilter=prefilter)


def pq_rerank_from_codes(codes_wide: DataFrame, qwide: DataFrame,
                         emb: DataFrame, n_queries: int = 3,
                         subspaces: int = 4, candidates: int = 20,
                         topk: int = 5, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         prefilter: bool = False) -> DataFrame:
    """The QUERY-TIME half of the rerank composition, split out so a
    deployment's steady state is separately measurable: codes are
    encoded ONCE (pq_train_encode, amortized exactly like
    build_ivf_index's untimed build), and each query batch pays only
    the ADC scan over cached codes + the q·R exact rerank. The 1 M
    design-point row in tools/ann_crossover.py times exactly this
    boundary (the `pqa` arm) next to the end-to-end `pqp` arm, whose
    difference IS the training cost."""
    from .similarity import _COS, _dot, quantize_embeddings
    cands = pq_adc_scan(codes_wide, qwide, subspaces=subspaces,
                        topk=candidates,
                        prefilter=prefilter).select("q_id", "vec_id")
    q = quantize_embeddings(emb, vec_col)
    corpus = q.select(F.col(id_col).alias("vec_id"),
                      F.col("qvec").alias("cv"),
                      F.col("qnorm2").alias("_n2b"))
    queries = (q.filter(F.col(id_col) < n_queries)
               .select(F.col(id_col).alias("q_id"),
                       F.col("qvec").alias("qv"),
                       F.col("qnorm2").alias("_n2a")))
    pairs = (corpus.join(F.broadcast(cands), "vec_id")
             .join(F.broadcast(queries), "q_id")
             .filter(F.col("q_id") != F.col("vec_id"))
             .withColumn("_dot", _dot("qv", "cv"))
             .withColumn("cos", F.expr(_COS)))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select("q_id", "vec_id", F.round("cos", 6).alias("cos"),
                    F.col("rank").cast("bigint").alias("rank")))


def _pq_est_parts(n_queries: int, subspaces: int, k: int, iterations: int,
                  scale: int, dim: int, table: str) -> list[str]:
    """Shared oracle CTE chain up through `est` (q_id, vec_id, est_d2):
    per-subspace Lloyd chains (kmeans_oracle_sql's construction over
    list slices), code assignment, distance tables, ADC sum."""
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
    return parts


def pq_adc_oracle_sql(n_queries: int = 3, subspaces: int = 4, k: int = 4,
                      iterations: int = 2, topk: int = 5,
                      scale: int = 10 ** 6, dim: int = 64,
                      table: str = "embeddings") -> str:
    """DuckDB oracle for pq_adc_topk: the shared est chain + per-query
    rank by (est_d2, vec_id)."""
    parts = _pq_est_parts(n_queries, subspaces, k, iterations, scale,
                          dim, table)
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT q_id, vec_id, est_d2, rank FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY q_id "
            f"ORDER BY est_d2, vec_id) AS rank FROM est) WHERE rank <= {topk}")


def pq_rerank_oracle_sql(n_queries: int = 3, subspaces: int = 4, k: int = 4,
                         iterations: int = 2, candidates: int = 20,
                         topk: int = 5, scale: int = 10 ** 6, dim: int = 64,
                         table: str = "embeddings") -> str:
    """DuckDB oracle for pq_rerank_topk: the shared est chain, the
    top-`candidates` cut by (est_d2, vec_id), then the similarity
    family's exact integer cosine (floor(x·1e6) quantization — the
    knn_bruteforce fragment) over the candidate pairs, ranked by
    (cos desc, vec_id), self excluded."""
    parts = _pq_est_parts(n_queries, subspaces, k, iterations, scale,
                          dim, table)
    parts.append(
        f"cand AS (SELECT q_id, vec_id FROM ("
        f"SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id "
        f"ORDER BY est_d2, vec_id) AS rr FROM est) WHERE rr <= {candidates})")
    parts.append(
        f"qv AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS v "
        f"FROM {table})")
    parts.append(
        "qn AS (SELECT vec_id, v, CAST(list_sum(list_transform(v, "
        "x -> x * x)) AS BIGINT) AS n2 FROM qv)")
    pair_cos = (
        "CAST(CAST(list_sum(list_transform(generate_series(1, len(a.v)), "
        "i -> a.v[i] * b.v[i])) AS BIGINT) AS DOUBLE) / "
        "sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE))")
    parts.append(
        f"p AS (SELECT cd.q_id, cd.vec_id, {pair_cos} AS c "
        f"FROM cand cd JOIN qn a ON a.vec_id = cd.q_id "
        f"JOIN qn b ON b.vec_id = cd.vec_id WHERE cd.q_id != cd.vec_id)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT q_id, vec_id, round(c, 6) AS cos, rank FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY q_id "
            f"ORDER BY c DESC, vec_id) AS rank FROM p) WHERE rank <= {topk}")
