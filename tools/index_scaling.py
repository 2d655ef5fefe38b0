#!/usr/bin/env python
"""Index-maintenance scaling: full rebuild vs op-log catch-up cost at
1×/10×/100× corpus amplification — the loop_scaling/dedup_scaling
treatment for SURVEY §2 row 26's write path, whose 100 TB posture
("the catch-up is ONE dynamic-partition-overwrite touching only the
delta's `_bucket=` directories — O(|delta| + touched buckets), the
rest of the projection is untouched bytes") was evidenced by plan
shape and the retrieval-side PartitionFilters test, but never by a
measured curve.

Setup per factor F (documents table, doc_id offset per replica):
  - n_buckets = 8·F — the 100 TB sizing rule the operators' docstrings
    state: bucket count scales with the corpus so bucket SIZE stays
    constant (a fixed-size bucket is what makes a touched-bucket
    rewrite O(1), and what a metastore would do via ALTER ... BUCKETS).
  - the op-log is FIXED SIZE across factors: adds = replica-0 docs
    with doc_id % 97 == 0 (withheld from the snapshot), deletes =
    replica-0 docs with doc_id % 131 == 0 (delete-after-add wins,
    reference op-log order, admin/RebuildIndexTask.cpp).

Two index layouts, mirroring the registered queries:
  - attr — attribute index on n_chars (index_incremental's shape at a
    cardinality that exercises pruning: 523 distinct leads in the base,
    shared across replicas; a ~50-doc delta touches <= ~80 lead values
    => <= ~80 of the 8·F buckets).
  - ft   — fulltext postings (token, doc_id) keyed by token
    (ft_index_incremental's shape). The synthetic corpus has only 31
    distinct tokens — a degenerate vocabulary where ANY delta touches
    every term — so replicas get the dedup_scaling vocab amplifier
    (every token suffixed '#r', vocab = 31·F): this models the real
    100 TB property that an op-log's terms are a small subset of a
    Zipf vocabulary, which is precisely what bucket pruning exploits.

Measured per (layout, factor): index rows/bytes, rebuild seconds (the
snapshot build — the corpus minus ~50 docs, i.e. the full-rebuild
datapoint), catch-up seconds, touched buckets, bytes REWRITTEN by the
catch-up (filesystem diff of the bucket dirs: new/changed/removed
files), and the exactness gate — post-apply row count must equal the
directly-computed live-doc count (integer, no tolerance).

Claim under test: rebuild seconds grow ~linearly with rows (log-log
slope ~1) while catch-up seconds and rewritten bytes stay ~flat
(slope ~0) because the fixed delta touches a bounded, constant-size
bucket set.

Usage: python tools/index_scaling.py [sf_dir] [--factors 1,10,100]
                                     [--ops attr,ft] [--reps N]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nebula_storage_spark.graph import read_parquet
from nebula_storage_spark.operators.index_rebuild import (
    apply_index_delta, rebuild_index_bucketed)
from nebula_storage_spark.session import get_spark

REP_STRIDE = 10 ** 9
ADD_MOD, DEL_MOD = 97, 131       # replica-0 op-log membership
BUCKETS_PER_FACTOR = 8


def amplify(docs, factor: int, suffix_tokens: bool, parts: int = 32):
    """F copies with doc_id offset r*STRIDE; optionally the
    dedup_scaling vocab amplifier (token -> 'token#r')."""
    base = docs.select("doc_id", "text", "n_chars")
    if factor == 1:
        return base.repartition(parts)
    spark = docs.sparkSession
    reps = F.broadcast(spark.range(factor)
                       .select(F.col("id").alias("_rep")))
    text = (F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("#"),
                                       F.col("_rep").cast("string"))),
        " ") if suffix_tokens else F.col("text"))
    return (base.crossJoin(reps)
            .select((F.col("doc_id") + F.col("_rep") * REP_STRIDE)
                    .alias("doc_id"),
                    text.alias("text"), "n_chars")
            .repartition(parts))


def attr_rows(corpus):
    """(n_chars, doc_id) attribute-index rows."""
    return corpus.select("n_chars", "doc_id")


def ft_rows(corpus):
    """(token, doc_id) distinct postings."""
    return (corpus.select("doc_id",
                          F.explode(F.split("text", " ")).alias("token"))
            .distinct().select("token", "doc_id"))


OPS = {
    # name -> (row builder, lead col, vocab-suffixed replicas)
    "attr": (attr_rows, "n_chars", False),
    "ft": (ft_rows, "token", True),
}


def fs_snapshot(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return out


def rewritten(before, after):
    """bytes WRITTEN by the catch-up = new or changed files (by size or
    mtime) in `after` — file removals are O(1) metadata ops, not byte
    rewriting, so they count toward the touched-bucket set but not the
    byte total; returns (bytes, touched `_bucket=` dir count)."""
    wrote = sum(sz for rel, (sz, mt) in after.items()
                if before.get(rel) != (sz, mt))
    changed = ({rel for rel, v in after.items() if before.get(rel) != v}
               | {rel for rel in before if rel not in after})
    touched = {rel.split(os.sep)[0] for rel in changed
               if rel.startswith("_bucket=")}
    return wrote, len(touched)


def one_cell(spark, op, factor, docs, reps, workdir):
    builder, lead, suffixed = OPS[op]
    corpus = amplify(docs, factor, suffix_tokens=suffixed).persist()
    corpus.count()
    rows = builder(corpus).persist()
    base_id = F.col("doc_id") % REP_STRIDE
    in_rep0 = F.col("doc_id") < REP_STRIDE
    is_add = in_rep0 & (base_id % ADD_MOD == 0)
    is_del = in_rep0 & (base_id % DEL_MOD == 0)
    snapshot = rows.filter(~is_add)
    adds = rows.filter(is_add)
    dels = rows.filter(is_del).select(lead, "doc_id")
    expected = rows.filter(~is_del).count()   # live = everything not deleted
    n_buckets = BUCKETS_PER_FACTOR * factor
    path = os.path.join(workdir, f"{op}_f{factor}")

    best_build = best_incr = wrote = touched = None
    total_bytes = n_rows = final = None
    for _ in range(max(1, reps)):
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        rebuild_index_bucketed(snapshot, [lead], path,
                               n_buckets=n_buckets,
                               include_cols=["doc_id"])
        t_build = time.time() - t0
        before = fs_snapshot(path)
        total_bytes = sum(sz for sz, _ in before.values())
        t0 = time.time()
        idx = apply_index_delta(spark, path, adds, dels, [lead],
                                key_col="doc_id", n_buckets=n_buckets)
        t_incr = time.time() - t0
        # exactness gate: full-index count, UNTIMED — it reads every
        # bucket and grows linearly, while the catch-up under test
        # reads/writes only the delta's buckets
        final = idx.count()
        if best_incr is None or t_incr < best_incr:
            best_incr = t_incr
            wrote, touched = rewritten(before, fs_snapshot(path))
        best_build = (t_build if best_build is None
                      else min(best_build, t_build))
    n_rows = rows.count()
    corpus.unpersist()
    rows.unpersist()
    ok = final == expected
    cell = {"op": op, "factor": factor, "index_rows": n_rows,
            "n_buckets": n_buckets,
            "index_mb": round(total_bytes / 2**20, 2),
            "rebuild_s": round(best_build, 3),
            "catchup_s": round(best_incr, 3),
            "touched_buckets": touched,
            "rewritten_mb": round(wrote / 2**20, 2),
            "pct_rewritten": round(100 * wrote / max(total_bytes, 1), 1),
            "rows_ok": ok}
    print(json.dumps(cell), flush=True)
    if not ok:
        print(f"EXACTNESS VIOLATION: {op} f{factor}: {final} rows "
              f"vs expected {expected}", flush=True)
    return cell, ok


def slope(cells, ykey) -> float:
    xs = [math.log(c["index_rows"]) for c in cells]
    ys = [math.log(max(c[ykey], 1e-3)) for c in cells]
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

    spark = get_spark("index-scaling")
    docs = read_parquet(spark, os.path.join(sf, "documents.parquet"))
    workdir = f"/tmp/nebula_spark_idx_scaling_{os.getpid()}"
    os.makedirs(workdir, exist_ok=True)

    by_op: dict[str, list] = {}
    violated = False
    try:
        for op in ops:
            # untimed warmup at the smallest factor (codegen/scan paths)
            one_cell(spark, op, min(factors), docs, 1, workdir)
            for f in sorted(factors):
                c, ok = one_cell(spark, op, f, docs, reps, workdir)
                violated = violated or not ok
                by_op.setdefault(op, []).append(c)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    print("\n| layout | factor | rows | buckets | index MB | rebuild s "
          "| catch-up s | touched | rewritten MB | % of index |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for op, cells in by_op.items():
        for c in cells:
            print(f"| {op} | {c['factor']}× | {c['index_rows']:,} "
                  f"| {c['n_buckets']} | {c['index_mb']} "
                  f"| {c['rebuild_s']} | {c['catchup_s']} "
                  f"| {c['touched_buckets']} | {c['rewritten_mb']} "
                  f"| {c['pct_rewritten']}% |")
    print("\nlog-log slope vs index rows (1.0 = linear, ~0 = flat):")
    for op, cells in by_op.items():
        if len(cells) >= 2:
            print(f"  {op}: rebuild {slope(cells, 'rebuild_s'):.2f}, "
                  f"catch-up {slope(cells, 'catchup_s'):.2f}, "
                  f"rewritten-bytes "
                  f"{slope(cells, 'rewritten_mb'):.2f}")
    return 1 if violated else 0


if __name__ == "__main__":
    sys.exit(main())
