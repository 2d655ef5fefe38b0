#!/usr/bin/env python
"""Sweep the registry for banned output types (the round-4 defect class).

Oracle side (default): every oracle_sql() through DuckDB; any output
column whose arrow fetch type is decimal128 (HUGEINT / DECIMAL) hashes
differently from Spark's BIGINT under the driver's value hash even when
values are equal (r4 verdict: 11/11 sampled such oracles failed).

Spark side (--spark): every queries() entry's OUTPUT SCHEMA, resolved
by Catalyst analysis only — no job runs, so the full 255-query surface
sweeps in seconds. Any decimal dtype in a final schema is the
zorder_pruning failure mode (DuckDB fetches decimal as float64, Spark
as Decimal objects).

Usage:
  python tools/type_sweep.py [sf_dir]          # oracle side
  python tools/type_sweep.py --spark [sf_dir]  # spark side
Prints one line per offending (query, column, type); exit 1 if any.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries that run jobs at PLAN-BUILD time (write artifacts, train
# models, drive streams): skipped by the Spark-side schema sweep —
# building their DataFrame would execute side effects. Their final
# types are still gated: verify_drive's executed comparison fetches
# and type-checks every one of them. tests/test_operators.py::
# test_type_sweep_skip_list_in_sync asserts every registry name either
# schema-resolves lazily or matches one of these prefixes, so a new
# side-effectful query cannot silently dodge both gates.
SKIP_PREFIXES = ("store_", "stream_", "index_", "source_csv",
                 "source_json", "source_orc", "zorder", "bucketed",
                 "ft_index", "knn_ivf_persisted", "knn_ivf_incremental",
                 "dedup_minhash_incremental", "kv_ops", "ttl_purge",
                 "add_", "upsert_", "delete_", "hll_incremental",
                 "schema_evolution", "scc_coloring", "kmeans",
                 "cluster_top_terms", "knn_pq_adc", "bpe_train",
                 "kcenter", "hard_negative", "embedding_smoothing",
                 "ann_recall", "dedup_semantic", "greedy_coloring")


def sweep_oracles(sf: str) -> int:
    import duckdb
    import pyarrow as pa
    import __spark_entry__ as E
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")  # match Spark's UTC pin
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    oracles = E.oracle_sql()
    for name in sorted(oracles):
        try:
            schema = con.execute(oracles[name]).fetch_arrow_table().schema
        except Exception as exc:  # noqa: BLE001
            print(f"ERR {name}: {exc}")
            bad.append((name, "<error>", str(exc)[:80]))
            continue
        for field in schema:
            if pa.types.is_decimal(field.type):
                bad.append((name, field.name, str(field.type)))
                print(f"DECIMAL {name}.{field.name}: {field.type}")
            elif (pa.types.is_timestamp(field.type)
                  and field.type.tz is not None):
                # TIMESTAMPTZ fetches tz-aware (datetime64[ns, UTC]) where
                # Spark fetches naive — a driver schema mismatch even when
                # values agree (r5 stream_late_data red row)
                bad.append((name, field.name, str(field.type)))
                print(f"TIMESTAMPTZ {name}.{field.name}: {field.type}")
    print(f"swept {len(oracles)} oracles, {len(bad)} banned columns "
          f"in {len({b[0] for b in bad})} queries")
    return 1 if bad else 0


def sweep_spark(sf: str) -> int:
    """Schema-only: building the DataFrame resolves the output dtypes
    through Catalyst analysis without running a job — mutation/write
    queries DO execute their side effects, so they are skipped (the
    execution-level gate in verify_drive covers them)."""
    import __spark_entry__ as E
    from nebula_storage_spark.session import get_spark
    spark = get_spark("type-sweep")
    bad, n = [], 0
    for name, q in sorted(E.queries().items()):
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            dtypes = q(spark, sf).dtypes
        except Exception as exc:  # noqa: BLE001
            print(f"ERR {name}: {str(exc)[:100]}")
            bad.append((name, "<error>", ""))
            continue
        n += 1
        for col, dt in dtypes:
            if dt.startswith("decimal"):
                bad.append((name, col, dt))
                print(f"DECIMAL {name}.{col}: {dt}")
    print(f"swept {n} spark plans, {len(bad)} decimal columns "
          f"in {len({b[0] for b in bad})} queries")
    return 1 if bad else 0


def main() -> int:
    args = [a for a in sys.argv[1:]]
    spark_side = "--spark" in args
    if spark_side:
        args.remove("--spark")
    sf = args[0] if args else "/root/testdata/sf0.001"
    return sweep_spark(sf) if spark_side else sweep_oracles(sf)


if __name__ == "__main__":
    sys.exit(main())
