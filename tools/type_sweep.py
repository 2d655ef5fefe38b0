#!/usr/bin/env python
"""Sweep every oracle_sql() through DuckDB and report any output column whose
arrow fetch type is decimal128 (HUGEINT / DECIMAL) — these hash differently
from Spark's BIGINT under the driver's value-hash even when values are equal
(round-4 verdict: 11/11 sampled such oracles failed, 0 passed).

Usage: python tools/type_sweep.py [/root/testdata/sf0.001]
Prints one line per offending (query, column, type); exit 1 if any found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    import __spark_entry__ as E
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
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
    print(f"swept {len(oracles)} oracles, {len(bad)} decimal columns "
          f"in {len({b[0] for b in bad})} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
