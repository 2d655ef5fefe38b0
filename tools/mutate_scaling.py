#!/usr/bin/env python
"""Mutate-family scaling: what fraction of the table does a keyed
mutation REWRITE at 1x/10x/100x corpus amplification — the
index_scaling byte-diff treatment for SURVEY §2 rows 27-33's write
path (r9 verdict, Next #1: the last family with no 10x/100x artifact).

The reference prices this path as a per-key KV WriteBatch touching
only the parts the keys hash to (mutate/AddVerticesProcessor.cpp:
227-283; BASELINE.md's 10 k-bulk upsert rows). The Spark-native
equivalent under test is mutate/bucketed.py: the table lives in
`_bucket=` hash-partition dirs (8·F buckets — the constant-bucket-size
sizing rule), a mutation batch prunes its read to the touched buckets,
the SAME driver-checked merge semantics (upsert()/the delete
anti-join) run over that slice, and one dynamic-partition-overwrite
rewrites only those dirs.

Setup per factor F (customer table, custkey offset r·10^9 per replica):
  - n_buckets = 8·F; table bytes grow ~linearly with F.
  - the mutation batches are FIXED SIZE across factors (replica-0
    keys strided over the base key range, so every key exists at
    every factor): upsert = ~38 updates (c_acctbal += a batch delta)
    PLUS 12 brand-new keys (the insert branch, keys at 10^15 — above
    EVERY replica range, asserted absent via anti-join per r10
    ADVICE); delete = ~13 keys; delete_edge = ~13 COMPOSITE keys on
    the reference's 4-part edge key (src, etype, rank, dst) against
    an edge-shaped projection bucketed on src (r10 verdict Next #4).
    TTL uses the
    TIME-partitioned layout (module header of mutate/bucketed.py):
    day = 2024-01-01 + (custkey % 64) days — 10^9 ≡ 0 (mod 64), so
    replicas land on the same 64 days — and the purge drops the 10
    expired days.

Measured per (op, factor): seconds, touched buckets/partitions, bytes
REWRITTEN (filesystem diff, index_scaling's method: new/changed files;
removals are O(1) metadata ops), % of table bytes rewritten, and the
EXACTNESS gate — the reloaded table must match the full-table logical
operator's post-image (row count + int-cent acctbal checksum for
upsert; row count + zero surviving keys for delete; row count for TTL).

Claim under test: a keyed mutation rewrites O(|batch| + touched-bucket
bytes), not O(table) — %-rewritten must FALL as the table grows
(<= 15 % at 100x vs 100 % for a naive full-table rewrite) and
rewritten bytes must grow far sub-linearly (the touched-bucket count
is capped by the batch's key count); the TTL purge rewrites ZERO
bytes at every factor.

Usage: python tools/mutate_scaling.py [sf_dir] [--factors 1,10,100]
           [--ops upsert,delete,delete_edge,ttl] [--reps N]
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
from nebula_storage_spark.mutate.bucketed import (
    delete_bucketed, read_bucketed, ttl_purge_partitions, upsert_bucketed,
    write_bucketed, write_day_partitioned)
from nebula_storage_spark.mutate.upsert import upsert
from nebula_storage_spark.session import get_spark

REP_STRIDE = 10 ** 9
# Brand-new insert keys start ABOVE any possible replica key range
# (replica r owns [r*REP_STRIDE + 1, r*REP_STRIDE + n_base]): the
# original 5*REP_STRIDE base collided with replica 5's rows at any
# factor >= 6, so the "insert branch" cells at 10x/100x were mostly
# updates (r10 ADVICE). one_cell now also ASSERTS the insert keys are
# absent from the amplified table via an anti-join.
INS_BASE = 10 ** 15
UPD_N, INS_N, DEL_N = 38, 12, 13     # fixed batch sizes across factors
BUCKETS_PER_FACTOR = 8
DAYS, EXPIRED_DAYS = 64, 10


def amplify(cust, factor: int, parts: int = 32):
    base = cust.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    if factor == 1:
        return base.repartition(parts)
    reps = F.broadcast(cust.sparkSession.range(factor)
                       .select(F.col("id").alias("_rep")))
    return (base.crossJoin(reps)
            .select((F.col("c_custkey") + F.col("_rep") * REP_STRIDE)
                    .alias("c_custkey"),
                    "c_name", "c_nationkey", "c_acctbal")
            .repartition(parts))


def fs_snapshot(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return out


def rewritten(before, after):
    """bytes WRITTEN (new/changed files) + touched partition dirs."""
    wrote = sum(sz for rel, (sz, mt) in after.items()
                if before.get(rel) != (sz, mt))
    changed = ({rel for rel, v in after.items() if before.get(rel) != v}
               | {rel for rel in before if rel not in after})
    touched = {rel.split(os.sep)[0] for rel in changed if os.sep in rel}
    return wrote, len(touched)


def checksum(df):
    """(rows, int-cent acctbal sum) — exact under any partitioning."""
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.sum(F.round(F.col("c_acctbal") * 100)
                     .cast("bigint")).alias("s")).first()
    return int(r["n"]), int(r["s"] or 0)


SET_EXPRS = {"c_acctbal": "coalesce(t.c_acctbal, 0.0) + s.delta",
             "c_name": "coalesce(t.c_name, s.src_name)",
             "c_nationkey": "coalesce(t.c_nationkey, 99)"}


def make_upsert_batch(spark, n_base):
    """Fixed-size batch: ~UPD_N replica-0 updates (keys strided over
    the BASE key range 0..n_base-1, so every update key exists in the
    table at every factor) + INS_N brand-new keys (the insert branch —
    INS_BASE = 10^15 is above EVERY replica's range at any factor;
    see the constant's comment)."""
    stride = max(1, n_base // UPD_N)
    upd = (spark.range(0, n_base)
           .filter(F.col("id") % stride == 0)
           .select(F.col("id").alias("c_custkey"),
                   F.lit(100.0).alias("delta"),
                   F.lit("upd").alias("src_name")))
    ins = (spark.range(INS_N)
           .select((F.col("id") + INS_BASE).alias("c_custkey"),
                   F.lit(7.5).alias("delta"),
                   F.concat(F.lit("new#"), F.col("id").cast("string"))
                   .alias("src_name")))
    return upd.unionByName(ins)


EDGE_KEYS = ["src", "etype", "rank", "dst"]


def edges_from(table):
    """Edge-shaped projection of the amplified table, keyed on the
    reference's 4-part edge key (src, edgeType, rank, dst)
    (utils/NebulaKeyUtils.h:17-19; DeleteEdgesProcessor keys deletes on
    exactly this tuple). Two deterministic edges per customer row so
    the delete batch can reconstruct exact matching tuples from the
    base key alone."""
    def leg(etype):
        return table.select(
            F.col("c_custkey").alias("src"),
            F.lit(etype).cast("bigint").alias("etype"),
            F.pmod(F.col("c_custkey"), F.lit(3)).cast("bigint")
            .alias("rank"),
            F.pmod(F.col("c_custkey") * 7, F.lit(10 ** 6)).cast("bigint")
            .alias("dst"),
            F.col("c_acctbal").alias("w"))
    return leg(1).unionByName(leg(2))


def make_edge_delete_batch(spark, n_base):
    """DEL_N composite edge keys, all present at every factor: the
    etype=1 leg of replica-0 rows strided over the base key range."""
    stride = max(1, n_base // DEL_N)
    return (spark.range(0, n_base)
            .filter(F.col("id") % stride == 0)
            .select(F.col("id").alias("src"),
                    F.lit(1).cast("bigint").alias("etype"),
                    F.pmod(F.col("id"), F.lit(3)).cast("bigint")
                    .alias("rank"),
                    F.pmod(F.col("id") * 7, F.lit(10 ** 6)).cast("bigint")
                    .alias("dst")))


def one_cell(spark, op, factor, cust, reps, workdir, n_base):
    table = amplify(cust, factor).persist()
    n_rows = table.count()
    n_buckets = BUCKETS_PER_FACTOR * factor
    path = os.path.join(workdir, f"{op}_f{factor}")

    best = wrote = touched = total_bytes = None
    ok = True
    detail = {}
    for _ in range(max(1, reps)):
        shutil.rmtree(path, ignore_errors=True)
        if op == "ttl":
            day = F.date_add(F.lit("2024-01-01"),
                             F.pmod(F.col("c_custkey"), F.lit(DAYS))
                             .cast("int"))
            write_day_partitioned(table.withColumn("_day", day), "_day",
                                  path)
            before = fs_snapshot(path)
            total_bytes = sum(sz for sz, _ in before.values())
            min_live = "2024-01-" + str(1 + EXPIRED_DAYS).zfill(2)
            t0 = time.time()
            dropped, kept = ttl_purge_partitions(spark, path, "_day",
                                                 min_live)
            dt = time.time() - t0
            w, tb = rewritten(before, fs_snapshot(path))
            expect = table.filter(
                F.pmod(F.col("c_custkey"), F.lit(DAYS)) >= EXPIRED_DAYS
            ).count()
            got = spark.read.parquet(path).count()
            ok = (got == expect and dropped == EXPIRED_DAYS
                  and kept == DAYS - EXPIRED_DAYS and w == 0)
            detail = {"dropped_partitions": dropped, "live_rows": got}
            tb = dropped          # touched = dropped day dirs
        else:
            if op != "delete_edge":
                write_bucketed(table, "c_custkey", path,
                               n_buckets=n_buckets)
                before = fs_snapshot(path)
                total_bytes = sum(sz for sz, _ in before.values())
            if op == "upsert":
                batch = make_upsert_batch(spark, n_base)
                # the insert branch must BE an insert branch: its keys
                # must not exist in the amplified table (r10 ADVICE —
                # the old 5e9 base collided with replica 5+)
                ins_hits = (table.join(
                    F.broadcast(batch.filter(
                        F.col("c_custkey") >= INS_BASE)
                        .select("c_custkey")),
                    "c_custkey", "left_semi").count())
                t0 = time.time()
                tbs = upsert_bucketed(spark, path, batch, ["c_custkey"],
                                      SET_EXPRS, n_buckets=n_buckets)
                dt = time.time() - t0
                w, tb = rewritten(before, fs_snapshot(path))
                # exactness: reloaded table == the full-table logical
                # operator's post-image (count + int-cent checksum)
                expect = checksum(upsert(table, batch, ["c_custkey"],
                                         SET_EXPRS))
                got = checksum(read_bucketed(spark, path))
                ok = got == expect and tb <= len(tbs) and ins_hits == 0
                detail = {"batch_rows": batch.count(),
                          "post_rows": got[0],
                          "insert_key_collisions": ins_hits}
            elif op == "delete_edge":
                # composite-key delete on the 4-part edge key: bucket
                # on the lead key (src — edge parts hash on src), anti-
                # join on all four (r10 verdict, Next #4)
                etab = edges_from(table).persist()
                n_edge_rows = etab.count()
                write_bucketed(etab, "src", path, n_buckets=n_buckets)
                before = fs_snapshot(path)
                total_bytes = sum(sz for sz, _ in before.values())
                dels = make_edge_delete_batch(spark, n_base)
                t0 = time.time()
                tbs = delete_bucketed(spark, path, dels, EDGE_KEYS,
                                      n_buckets=n_buckets)
                dt = time.time() - t0
                w, tb = rewritten(before, fs_snapshot(path))
                nk = dels.count()
                post = read_bucketed(spark, path)
                got_n = post.count()
                survivors = post.join(F.broadcast(dels), EDGE_KEYS,
                                      "left_semi").count()
                ok = got_n == n_edge_rows - nk and survivors == 0 \
                    and tb <= len(tbs)
                detail = {"deleted_keys": nk, "post_rows": got_n}
                n_rows = n_edge_rows
                etab.unpersist()
            else:                  # delete
                # DEL_N keys strided over the base range: all present
                stride = max(1, n_base // DEL_N)
                keys = (spark.range(0, n_base)
                        .filter(F.col("id") % stride == 0)
                        .select(F.col("id").alias("c_custkey")))
                t0 = time.time()
                tbs = delete_bucketed(spark, path, keys, "c_custkey",
                                      n_buckets=n_buckets)
                dt = time.time() - t0
                w, tb = rewritten(before, fs_snapshot(path))
                nk = keys.count()
                got_n = read_bucketed(spark, path).count()
                survivors = (read_bucketed(spark, path)
                             .join(F.broadcast(keys), "c_custkey",
                                   "left_semi").count())
                ok = got_n == n_rows - nk and survivors == 0 \
                    and tb <= len(tbs)
                detail = {"deleted_keys": nk, "post_rows": got_n}
        if best is None or dt < best:
            best, wrote, touched = dt, w, tb
    table.unpersist()
    cell = {"op": op, "factor": factor, "table_rows": n_rows,
            "n_buckets": n_buckets,
            "table_mb": round(total_bytes / 2**20, 2),
            "mutate_s": round(best, 3),
            "touched": touched,
            "rewritten_mb": round(wrote / 2**20, 3),
            "pct_rewritten": round(100 * wrote / max(total_bytes, 1), 1),
            "ok": ok, **detail}
    print(json.dumps(cell), flush=True)
    if not ok:
        print(f"EXACTNESS VIOLATION: {op} f{factor}: {detail}", flush=True)
    shutil.rmtree(path, ignore_errors=True)
    return cell, ok


def slope(cells, ykey) -> float:
    xs = [math.log(c["table_rows"]) for c in cells]
    ys = [math.log(max(c[ykey], 1e-3)) for c in cells]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    return (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            / sum((x - mx) ** 2 for x in xs))


def main() -> int:
    args = list(sys.argv[1:])
    factors = [1, 10, 100]
    ops = ["upsert", "delete", "delete_edge", "ttl"]
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

    spark = get_spark("mutate-scaling")
    cust = read_parquet(spark, os.path.join(sf, "customer.parquet"))
    n_base = cust.count()
    workdir = f"/tmp/nebula_spark_mutate_scaling_{os.getpid()}"
    os.makedirs(workdir, exist_ok=True)

    by_op: dict[str, list] = {}
    violated = False
    try:
        for op in ops:
            # untimed warmup at the smallest factor (codegen, committers)
            one_cell(spark, op, min(factors), cust, 1, workdir, n_base)
            for f in sorted(factors):
                c, ok = one_cell(spark, op, f, cust, reps, workdir, n_base)
                violated = violated or not ok
                by_op.setdefault(op, []).append(c)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    print("\n| op | factor | rows | buckets | table MB | mutate s "
          "| touched | rewritten MB | % of table |")
    print("|---|---|---|---|---|---|---|---|---|")
    for op, cells in by_op.items():
        for c in cells:
            print(f"| {op} | {c['factor']}x | {c['table_rows']:,} "
                  f"| {c['n_buckets']} | {c['table_mb']} "
                  f"| {c['mutate_s']} | {c['touched']} "
                  f"| {c['rewritten_mb']} | {c['pct_rewritten']}% |")
    for op, cells in by_op.items():
        if len(cells) < 2:
            continue
        hi = cells[-1]
        grow = hi["table_rows"] / cells[0]["table_rows"]
        if op == "ttl":
            g = {"gate": "ttl_zero_rewrite",
                 "rewritten_mb_max": max(c["rewritten_mb"] for c in cells),
                 "ok": all(c["rewritten_mb"] == 0 for c in cells)}
        else:
            sl = slope(cells, "rewritten_mb")
            g = {"gate": f"{op}_partial_rewrite",
                 "table_growth": round(grow, 1),
                 "pct_rewritten_at_max": hi["pct_rewritten"],
                 "rewrite_slope": round(sl, 2),
                 "ok": hi["pct_rewritten"] <= 15.0 and sl <= 0.5}
        violated = violated or not g["ok"]
        print(json.dumps(g), flush=True)
    print("\nlog-log slope vs table rows (1.0 = O(table), ~0 = O(touched)):")
    for op, cells in by_op.items():
        if len(cells) >= 2:
            print(f"  {op}: seconds {slope(cells, 'mutate_s'):.2f}, "
                  f"rewritten-bytes {slope(cells, 'rewritten_mb'):.2f}")
    return 1 if violated else 0


if __name__ == "__main__":
    sys.exit(main())
