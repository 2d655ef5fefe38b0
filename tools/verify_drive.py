#!/usr/bin/env python
"""Drive the driver contract end-to-end: entry() smoke + every
queries()/oracle_sql() pair compared against DuckDB (the t2 gate),
at the sf dir given as argv[1] (default sf0.01).

Usage: python tools/verify_drive.py [/root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import struct
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from nebula_storage_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        # Bit-exact: the driver hashes raw values, so any canon looser
        # than the IEEE bits (e.g. round(v, 4)) can pass locally what
        # the driver's hash fails — exactly how the r3 stats_variance
        # red row slipped through.
        return "nan" if math.isnan(v) else struct.pack(">d", v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    import __spark_entry__ as E
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify-drive")

    df = E.entry(spark)
    print("ENTRY rows:", df.count(), "cols:", df.columns)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        sdf = qs[name](spark, sf)
        smulti = rows_to_multiset(sdf.collect(), sdf.columns)
        if name not in oracles:
            print(f"--  {name}: rows-only check, {sum(smulti.values())} rows")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        omulti = rows_to_multiset(cur.fetchall(), ocols)
        ok = smulti == omulti and sorted(sdf.columns) == sorted(ocols)
        print(f"{'OK ' if ok else 'MISMATCH'} {name}: "
              f"spark={sum(smulti.values())} oracle={sum(omulti.values())}")
        if not ok:
            fails.append(name)
            for side, diff in (("oracle-only", omulti - smulti),
                               ("spark-only", smulti - omulti)):
                for row in list(diff)[:3]:
                    print(f"    {side}: {row}")
    print("FAILED:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
