#!/usr/bin/env python
"""Drive the driver contract end-to-end: entry() smoke + every
queries()/oracle_sql() pair compared against DuckDB (the t2 gate),
at the sf dir given as argv[1] (default sf0.01).

Two gates per query, both must hold:
  1. value gate  — bit-exact multiset equality of all rows (float canon
     is the raw IEEE bits, PRESERVING the sign of zero — the driver may
     hash raw float bytes, where -0.0 != 0.0; see canon());
  2. type gate   — per-column FETCHED-type identity between the DuckDB
     arrow result schema and the Spark dtypes.  Round 4 proved values
     are not enough: DuckDB promotes sum(BIGINT) to HUGEINT
     (decimal128(38,0)), which the driver's hash fetches differently
     from Spark's BIGINT even when every value is equal.  Any DECIMAL
     in a final schema, on either engine, is a hard failure.

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
import pyarrow as pa

from nebula_storage_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        # Bit-exact, INCLUDING the sign of zero: the driver may hash
        # the raw float bytes (pandas object-hash of np.float64 hashes
        # the bit pattern), where -0.0 != 0.0 even though they compare
        # equal — so the local canon must not normalize it away. The
        # full drive passes under this: both engines emit identical
        # zero signs on every gated query.
        return "nan" if math.isnan(v) else struct.pack(">d", v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def arrow_to_spark_dtype(t: pa.DataType) -> str:
    """Map an arrow fetch type to the Spark dtype string it must equal.
    Decimals deliberately map to a sentinel that never matches."""
    if pa.types.is_decimal(t):
        return "!DECIMAL"
    if pa.types.is_int64(t) or pa.types.is_uint32(t):
        return "bigint"
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        # distinct from double: a float32/float64 cross-engine pair
        # fetches as different pandas dtypes (driver schema mismatch)
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        # tz-aware fetches as datetime64[ns, UTC] while Spark's naive
        # timestamp fetches tz-naive — the driver's schema compare
        # distinguishes them (r5 stream_late_data red row), so an
        # oracle TIMESTAMPTZ must never match: CAST(... AS TIMESTAMP)
        # in the SQL instead.
        return "!TIMESTAMPTZ" if t.tz is not None else "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{arrow_to_spark_dtype(t.value_type)}>"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return f"?{t}"


# Spark dtype aliases that fetch identically to the canonical name.
# NOTE: "float" is NOT aliased to "double" — FloatType fetches as
# pandas float32, distinguishable from float64 by the driver.
_SPARK_DTYPE_ALIAS = {
    "smallint": "int", "tinyint": "int",
    "timestamp_ntz": "timestamp",
}


def _norm_spark(dtype: str) -> str:
    if dtype.startswith("decimal"):
        return "!SPARK_DECIMAL"
    for k, v in _SPARK_DTYPE_ALIAS.items():
        if dtype == k:
            return v
        dtype = dtype.replace(f"<{k}>", f"<{v}>")
    return dtype


def type_mismatches(arrow_schema: pa.Schema, spark_dtypes) -> list[str]:
    """Compare fetched types column-by-column (order-free, by name)."""
    a = {f.name: arrow_to_spark_dtype(f.type) for f in arrow_schema}
    s = {name: _norm_spark(d) for name, d in spark_dtypes}
    out = []
    for name in sorted(set(a) | set(s)):
        at, st = a.get(name, "<missing>"), s.get(name, "<missing>")
        if at != st:
            out.append(f"{name}: oracle={at} spark={st}")
    return out


def main() -> int:
    import __spark_entry__ as E
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify-drive")

    df = E.entry(spark)
    print("ENTRY rows:", df.count(), "cols:", df.columns)

    con = duckdb.connect()
    # Pin the oracle session TZ: DuckDB renders tz-sensitive casts
    # in the HOST timezone by default, while Spark pins UTC —
    # matches the harness to Spark on any host (r6 advice).
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    timings = {}
    import time as _time
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = _time.perf_counter()
        sdf = qs[name](spark, sf)
        smulti = rows_to_multiset(sdf.collect(), sdf.columns)
        t_spark = _time.perf_counter() - t0
        if name not in oracles:
            print(f"--  {name}: rows-only check, {sum(smulti.values())} "
                  f"rows  [spark {t_spark:.2f}s]")
            timings[name] = {"spark": round(t_spark, 3), "oracle": None}
            continue
        t1 = _time.perf_counter()
        otable = con.execute(oracles[name]).fetch_arrow_table()
        ocols = otable.schema.names
        omulti = rows_to_multiset(
            [tuple(row[c] for c in ocols) for row in otable.to_pylist()],
            list(ocols))
        t_oracle = _time.perf_counter() - t1
        timings[name] = {"spark": round(t_spark, 3),
                         "oracle": round(t_oracle, 3)}
        tmism = type_mismatches(otable.schema, sdf.dtypes)
        ok = (smulti == omulti and sorted(sdf.columns) == sorted(ocols)
              and not tmism)
        print(f"{'OK ' if ok else 'MISMATCH'} {name}: "
              f"spark={sum(smulti.values())} oracle={sum(omulti.values())}"
              f"  [spark {t_spark:.2f}s oracle {t_oracle:.2f}s]")
        if not ok:
            fails.append(name)
            for m in tmism:
                print(f"    type: {m}")
            for side, diff in (("oracle-only", omulti - smulti),
                               ("spark-only", smulti - omulti)):
                for row in list(diff)[:3]:
                    print(f"    {side}: {row}")
    print("FAILED:", fails if fails else "none")
    if timings:
        tot_s = sum(t["spark"] for t in timings.values())
        tot_o = sum(t["oracle"] or 0 for t in timings.values())
        print(f"TIMING total: spark {tot_s:.1f}s oracle {tot_o:.1f}s "
              f"over {len(timings)} queries")
        out = os.environ.get("VERIFY_DRIVE_TIMINGS")
        if out:
            import json as _json
            with open(out, "w") as fh:
                _json.dump({"sf": sf, "timings": timings}, fh, indent=1,
                           sort_keys=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
