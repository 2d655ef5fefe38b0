#!/usr/bin/env python
"""Dedup-pipeline scaling: end-to-end wall time vs corpus size at
1×/10×/100× amplification — the loop_scaling.py treatment for the
banded dedup family, whose 100 TB posture ("candidates come from
band/bucket equi-joins, never all-pairs") was evidenced by plan shape
and the setsim losslessness proof but not by a measured curve.

Amplification must NOT change the duplicate structure: replicating
documents verbatim makes every replica of a doc a true near-dup of
every other (candidate pairs grow as F² per cluster — a different
corpus, not a bigger one). Instead every token is suffixed with its
replica id ('spark' → 'spark#7'), so the shingle universes of replicas
are DISJOINT and the amplified corpus is exactly F independent copies
of the base: per-replica candidate structure identical, total pairs ≈
F × base pairs (EXACT for the deterministic inverted-index pipeline;
a ±2% recall-stability band for the hash-banded ones, which draw an
independent MinHash/SimHash permutation per replica universe), and
wall time should be ~linear in corpus size.
The suffixing runs in the same codegen transform the pipelines
themselves use — no Python boundary.

Measured per (op, factor): docs, total seconds (min of --reps, after
an untimed smallest-factor warmup per op), pairs out, pairs/base
(must equal F exactly — doubles as the no-cross-replica-leakage
check), and the log-log slope of seconds vs docs (1.0 = linear; the
claim here IS linearity, unlike the loop family's per-round metric).

Usage: python tools/dedup_scaling.py [sf_dir] [--factors 1,10,100]
                                     [--ops minhash_lsh,...] [--reps N]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nebula_storage_spark.graph import read_parquet
from nebula_storage_spark.pipeline.dedup import (
    containment_pairs, minhash_lsh_pairs, ngram_jaccard_pairs,
    simhash_pairs)
from nebula_storage_spark.session import get_spark

REP_STRIDE = 10 ** 9


def amplify_docs(docs, factor: int, parts: int = 32):
    """F replica-disjoint copies: doc_id offset by r*STRIDE, every
    token suffixed '#r' so no shingle/band/bucket collides across
    replicas and the candidate structure is F independent bases."""
    if factor == 1:
        return docs.select("doc_id", "text").repartition(parts)
    spark = docs.sparkSession
    reps = F.broadcast(spark.range(factor)
                       .select(F.col("id").alias("_rep")))
    suffixed = F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("#"),
                                       F.col("_rep").cast("string"))),
        " ")
    return (docs.select("doc_id", "text").crossJoin(reps)
            .select((F.col("doc_id") + F.col("_rep") * REP_STRIDE)
                    .alias("doc_id"),
                    suffixed.alias("text"))
            .repartition(parts))


# op -> (runner, check). check semantics:
#   "exact" — must output EXACTLY F x base pairs (candidate generation
#       deterministic in the shingle sets);
#   "band"  — ±2% of F x base. Holds for minhash_lsh because its
#       output is gated by an EXACT-Jaccard verify: the per-replica
#       permutation only decides which true-borderline pairs surface
#       (measured drift 0.08%).
#   "demo"  — timing only, no pair check, no exit-code stake:
#       * simhash16 is the gate query's oracle-friendly configuration;
#         the sweep MEASURES why it is gate-only — 2^16 fingerprints
#         saturate, so chance collisions (and output pairs) grow
#         quadratically with corpus size no matter how well the banded
#         join scales.
#       * simhash64 kills chance collisions (~C(64,3)/2^64) — ZERO
#         cross-replica pairs measured — but SimHash has no exact
#         verify: Hamming <= 3 on the fingerprint IS the criterion,
#         and it depends on the hash draw. Measured within-replica
#         pair counts across 10 replica draws of the same corpus:
#         305–1799 (6x spread). A fixed F-band is therefore the wrong
#         invariant for ANY simhash width; reproducible dedup at scale
#         wants minhash-LSH + exact verify, with simhash as a cheap
#         draw-sensitive pre-filter.
OPS = {
    "minhash_lsh": (lambda d: minhash_lsh_pairs(d), "band"),
    "simhash16": (lambda d: simhash_pairs(d, bits=16, max_hamming=3),
                  "demo"),
    "simhash64": (lambda d: simhash_pairs(d, bits=64, max_hamming=3),
                  "demo"),
    "ngram_jaccard": (lambda d: ngram_jaccard_pairs(d), "exact"),
    "containment": (lambda d: containment_pairs(d), "exact"),
}


def one_cell(spark, op, runner, check, docs, factor, reps, base_pairs):
    d = amplify_docs(docs, factor).persist()
    n_docs = d.count()
    best = pairs = None
    for _ in range(max(1, reps)):
        spark.catalog.clearCache()          # pipelines persist shingles
        d.persist(); d.count()
        t0 = time.time()
        pairs = runner(d).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    d.unpersist()
    spark.catalog.clearCache()
    ok = True
    if base_pairs is not None and check != "demo":
        if check == "exact":
            ok = pairs == base_pairs * factor
        else:
            ok = abs(pairs - base_pairs * factor) <= 0.02 * base_pairs * factor
    cell = {"op": op, "factor": factor, "docs": n_docs,
            "seconds": round(best, 3), "pairs": pairs,
            "pairs_per_base": (None if base_pairs is None
                               else round(pairs / base_pairs, 3))}
    print(json.dumps(cell), flush=True)
    if not ok:
        print(f"STRUCTURE VIOLATION: {op} f{factor}: {pairs} vs "
              f"{factor} x {base_pairs} ({check})", flush=True)
    return cell, ok


def slope(cells) -> float:
    xs = [math.log(c["docs"]) for c in cells]
    ys = [math.log(max(c["seconds"], 1e-3)) for c in cells]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    return (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            / sum((x - mx) ** 2 for x in xs))


def main() -> int:
    args = list(sys.argv[1:])
    factors = [1, 10, 100]
    ops = list(OPS)
    reps = 1
    if "--factors" in args:
        i = args.index("--factors")
        factors = [int(x) for x in args[i + 1].split(",")]
        del args[i:i + 2]
    if "--ops" in args:
        i = args.index("--ops")
        ops = args[i + 1].split(",")
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    sf = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark("dedup-scaling")
    docs = read_parquet(spark, os.path.join(sf, "documents.parquet"))

    by_op: dict[str, list] = {}
    violated = False
    for op in ops:
        runner, check = OPS[op]
        # untimed per-op warmup at the smallest factor (codegen/scan)
        w = amplify_docs(docs, min(factors)).persist()
        w.count(); runner(w).count()
        w.unpersist(); spark.catalog.clearCache()
        base_pairs = None
        for f in sorted(factors):
            c, ok = one_cell(spark, op, runner, check, docs, f, reps,
                             base_pairs)
            violated = violated or not ok
            if f == min(factors):
                base_pairs = c["pairs"] // f if f > 1 else c["pairs"]
            by_op.setdefault(op, []).append(c)

    print("\n| operator | factor | docs | total s | pairs | pairs/base |")
    print("|---|---|---|---|---|---|")
    for op, cells in by_op.items():
        for c in cells:
            ppb = ("—" if c["pairs_per_base"] is None
                   else f"{c['pairs_per_base']:.0f}")
            print(f"| {op} | {c['factor']}× | {c['docs']:,} "
                  f"| {c['seconds']} | {c['pairs']:,} | {ppb} |")
    print("\nlog-log slope of seconds vs docs (1.0 = linear):")
    for op, cells in by_op.items():
        if len(cells) >= 2:
            print(f"  {op}: {slope(cells):.2f}")
    return 1 if violated else 0


if __name__ == "__main__":
    sys.exit(main())
