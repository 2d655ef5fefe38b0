"""Mirror of the driver's t2 gate: every workload query must match its
DuckDB oracle on the same parquet tables (order-insensitive multiset of
rows, columns aligned by name) AND fetch with identical per-column
types — the round-4 driver sample proved bit-equal VALUES are not
enough when the oracle's fetched type is HUGEINT/DECIMAL while Spark's
is BIGINT (the hash sees the type)."""

from __future__ import annotations

import datetime as dt
import math
import struct
from collections import Counter

import pytest

from nebula_storage_spark.workload import build_oracles, build_queries

QUERIES = build_queries()
ORACLES = build_oracles()


def _canon_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Bit-exact INCLUDING the sign of zero (matches verify_drive's
        # canon — a pandas object-hash of np.float64 hashes the bit
        # pattern, where -0.0 != 0.0; the full drive passes under this,
        # so both engines emit identical zero signs on every query).
        return struct.pack(">d", v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_canon_val(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    from tools.verify_drive import type_mismatches

    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    assert name in ORACLES, f"{name} has no oracle"
    otable = duck.execute(ORACLES[name]).fetch_arrow_table()
    ocols = list(otable.schema.names)
    orows = [tuple(row[c] for c in ocols) for row in otable.to_pylist()]

    assert sorted(scols) == sorted(ocols), \
        f"{name}: column mismatch {sorted(scols)} vs {sorted(ocols)}"
    tmism = type_mismatches(otable.schema, sdf.dtypes)
    assert not tmism, f"{name}: fetched-type mismatch {tmism}"
    sc, oc = _canon(srows, scols), _canon(orows, ocols)
    assert len(srows) == len(orows), \
        f"{name}: row count {len(srows)} vs {len(orows)}"
    if sc != oc:
        missing = list((oc - sc).items())[:5]
        extra = list((sc - oc).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch; oracle-only={missing} spark-only={extra}")
