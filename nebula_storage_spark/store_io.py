"""GraphStore persistence: the engine-owned storage layout.

The reference owns its bytes in RocksDB (ingest once, query many); the
Spark engine equivalently owns a warehouse directory of parquet tables in
query-optimal layout:

    <root>/catalog.json                  schemas, TTL, vid type
    <root>/tags/<tag>/                   hash-partitioned by _vid
    <root>/edges/<etype>/                hash-partitioned by _src
    <root>/edges_rev/<etype>/            optional dst-partitioned copy

Partition-by-key at write time is what makes the part-by-vid properties
(PLANS.md: shuffle-free per-vertex aggregation/top-k) durable across
sessions instead of per-session cache effects. At cluster scale the same
writes go through `bucketBy` into a metastore; plain parquet keeps this
hermetic (and the partitioning is re-established by one repartition on
load, amortized over the session).

TTL/defaults live in catalog.json and re-attach on load — read semantics
are a catalog property, not a table property (SURVEY §2 row 32).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import Catalog, EdgeDef, FieldDef, TagDef
from .graph import DST, SRC, VID, GraphStore


def _schema_to_dict(s) -> dict:
    return {
        "name": s.name,
        "fields": [{"name": f.name, "dtype": f.dtype, "nullable": f.nullable,
                    "default": f.default} for f in s.fields],
        "ttl_col": s.ttl_col,
        "ttl_duration": s.ttl_duration,
    }


def _schema_from_dict(d: dict, cls):
    return cls(d["name"],
               tuple(FieldDef(f["name"], f["dtype"], f["nullable"],
                              f["default"]) for f in d["fields"]),
               d["ttl_col"], d["ttl_duration"])


def save_store(store: GraphStore, root: str, num_partitions: int = 16,
               sort_edges: bool = True) -> None:
    """Write the store in query-optimal layout (overwrite)."""
    os.makedirs(root, exist_ok=True)
    # persist only schemas that have a stored frame (a catalog may describe
    # a wider space than this store materializes); tables without a declared
    # schema get a minimal inferred entry so load round-trips
    def entry(name, schemas, df, keys):
        s = schemas.get(name)
        if s is not None:
            return _schema_to_dict(s)
        cls = TagDef if keys == (VID,) else EdgeDef
        flds = tuple(FieldDef(c, dict(df.dtypes)[c], True)
                     for c in df.columns if c not in keys + ("_rank",))
        return _schema_to_dict(cls(name, flds))

    meta = {
        "vid_type": store.catalog.vid_type,
        "now": store.now,
        "tags": {t: entry(t, store.catalog.tags, df, (VID,))
                 for t, df in store.vertices.items()},
        "edges": {e: entry(e, store.catalog.edges, df, (SRC, DST))
                  for e, df in store.edges.items()},
        "reverse_projections": sorted(store.reverse_edges),
    }
    with open(f"{root}/catalog.json", "w") as f:
        json.dump(meta, f, indent=2)
    for tag, df in store.vertices.items():
        (df.repartition(num_partitions, F.col(VID))
         .sortWithinPartitions(VID)
         .write.mode("overwrite").parquet(f"{root}/tags/{tag}"))
    for etype, df in store.edges.items():
        w = df.repartition(num_partitions, F.col(SRC))
        if sort_edges:
            # storage key order (src, type, rank, dst) → row-group pruning
            # for seed scans, and rank-ordered iteration for free
            w = w.sortWithinPartitions(SRC, "_rank", DST)
        w.write.mode("overwrite").parquet(f"{root}/edges/{etype}")
    for etype in store.reverse_edges:
        (store.edges[etype].repartition(num_partitions, F.col(DST))
         .sortWithinPartitions(DST, "_rank", SRC)
         .write.mode("overwrite").parquet(f"{root}/edges_rev/{etype}"))


def load_store(spark: SparkSession, root: str,
               resident: bool = True, num_partitions: int = 16) -> GraphStore:
    """Reload a saved store; `resident` re-establishes the in-session
    hash-partitioned frames for the big tables."""
    with open(f"{root}/catalog.json") as f:
        meta = json.load(f)
    cat = Catalog(vid_type=meta["vid_type"])
    for t, d in meta["tags"].items():
        cat.add_tag(_schema_from_dict(d, TagDef))
    for e, d in meta["edges"].items():
        cat.add_edge(_schema_from_dict(d, EdgeDef))
    g = GraphStore(catalog=cat, now=meta["now"])
    for tag in meta["tags"]:
        g.add_vertices_df(tag, spark.read.parquet(f"{root}/tags/{tag}"))
    for etype in meta["edges"]:
        df = spark.read.parquet(f"{root}/edges/{etype}")
        if resident:
            df = df.repartition(num_partitions, F.col(SRC)).persist()
        g.add_edges_df(etype, df)
    for etype in meta.get("reverse_projections", []):
        df = spark.read.parquet(f"{root}/edges_rev/{etype}")
        if resident:
            df = df.repartition(num_partitions, F.col(DST)).persist()
        g.reverse_edges[etype] = df
    return g


# ---------------------------------------------------------------------------
# checkpoint / restore — the BR (backup & restore) story
# ---------------------------------------------------------------------------

_STORE_DIRS = ("tags", "edges", "edges_rev")


def create_checkpoint(root: str, name: str) -> str:
    """Point-in-time snapshot of a saved warehouse.

    Mirrors the reference's CreateCheckpointProcessor
    (src/storage/admin/CreateCheckpointProcessor.cpp:22-71): RocksDB
    checkpoints hard-link the immutable SSTs instead of copying bytes;
    parquet data files are equally immutable once written, so the snapshot
    hard-links every data file into `<root>/checkpoints/<name>/` —
    O(#files) metadata operations and zero data copy regardless of store
    size (a 100 TB warehouse checkpoints in seconds). catalog.json (tiny,
    mutable) is copied. On filesystems without hard-link support the copy
    fallback still yields a correct, just slower, snapshot.
    """
    dst_root = f"{root}/checkpoints/{name}"
    if os.path.exists(dst_root):
        raise ValueError(f"checkpoint {name!r} already exists")
    os.makedirs(dst_root)
    shutil.copy2(f"{root}/catalog.json", f"{dst_root}/catalog.json")
    for sub in _STORE_DIRS:
        src_dir = f"{root}/{sub}"
        if not os.path.isdir(src_dir):
            continue
        for dirpath, _dirnames, filenames in os.walk(src_dir):
            rel = os.path.relpath(dirpath, root)
            os.makedirs(f"{dst_root}/{rel}", exist_ok=True)
            for fname in filenames:
                src = f"{dirpath}/{fname}"
                dst = f"{dst_root}/{rel}/{fname}"
                try:
                    os.link(src, dst)
                except OSError:            # cross-device / no hard links
                    shutil.copy2(src, dst)
    return dst_root


def list_checkpoints(root: str) -> list[str]:
    cp_dir = f"{root}/checkpoints"
    if not os.path.isdir(cp_dir):
        return []
    return sorted(d for d in os.listdir(cp_dir)
                  if os.path.isfile(f"{cp_dir}/{d}/catalog.json"))


def drop_checkpoint(root: str, name: str) -> None:
    """Drop a snapshot (DropCheckpointProcessor.cpp:12-40): unlinking the
    checkpoint's hard links frees nothing still referenced by the live
    store — exactly the RocksDB checkpoint lifecycle."""
    dst_root = f"{root}/checkpoints/{name}"
    if not os.path.isdir(dst_root):
        raise ValueError(f"no checkpoint {name!r}")
    shutil.rmtree(dst_root)


def restore_checkpoint(spark: SparkSession, root: str, name: str,
                       resident: bool = True,
                       num_partitions: int = 16) -> GraphStore:
    """Load the store as of checkpoint `name` — the restore half of BR.
    The live warehouse is untouched; the snapshot is read directly (its
    files are the frozen versions, shared via hard links)."""
    dst_root = f"{root}/checkpoints/{name}"
    if not os.path.isfile(f"{dst_root}/catalog.json"):
        raise ValueError(f"no checkpoint {name!r}")
    return load_store(spark, dst_root, resident=resident,
                      num_partitions=num_partitions)


def compact_small_files(spark: SparkSession, src_dir: str, dest_dir: str,
                        key: str, target_files: int) -> DataFrame:
    """Small-file compaction maintenance (reference: admin/CompactTask.h
    triggers a RocksDB range compaction per part; the Spark-warehouse
    analog is bin-packing a directory of tiny parquet files into
    `target_files` range-partitioned files). Range partitioning on `key`
    (sampled boundaries, one shuffle) leaves the output sorted-by-range —
    each file then carries tight min/max footer stats on `key`, so the
    compaction doubles as a data-skipping layout: a later point/range
    filter on `key` prunes to one file instead of scanning all of them.

    Write-new-then-swap: the compacted copy lands in `dest_dir` and the
    source is left untouched until the caller retargets readers — the
    same crash-safe ordering the checkpoint lifecycle uses above.
    Returns the compacted readback."""
    df = spark.read.parquet(src_dir)
    (df.repartitionByRange(target_files, key)
     .write.mode("overwrite").parquet(dest_dir))
    return spark.read.parquet(dest_dir)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  cols: list[str]) -> DataFrame:
    """Row-level diff between two snapshots of the same table (time
    travel between checkpoints — the read-side complement of the BR
    lifecycle above): one full-outer join on the key, null-safe column
    compares, rows classified added / deleted / changed ('same' rows are
    dropped). One shuffle on the key; at 100 TB both sides are the
    bucketed store, so the join is co-partitioned."""
    o = old.select(F.col(key), F.lit(True).alias("_in_old"),
                   *[F.col(c).alias(f"_o_{c}") for c in cols])
    n = new.select(F.col(key), F.lit(True).alias("_in_new"),
                   *[F.col(c).alias(f"_n_{c}") for c in cols])
    j = o.join(n, key, "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (F.when(F.col("_in_old").isNull(), "added")
              .when(F.col("_in_new").isNull(), "deleted")
              .when(~same, "changed").otherwise("same"))
    out_cols = [F.col(key), change.alias("change")]
    for c in cols:
        out_cols += [F.col(f"_o_{c}").alias(f"old_{c}"),
                     F.col(f"_n_{c}").alias(f"new_{c}")]
    return j.select(*out_cols).filter(F.col("change") != "same")
