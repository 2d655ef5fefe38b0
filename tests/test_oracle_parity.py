"""Mirror of the driver's t2 gate: every workload query must match its
DuckDB oracle on the same parquet tables (order-insensitive multiset of
rows, columns aligned by name)."""

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
        # Bit-exact (matches the driver's hash strictness — round(v, 4)
        # let the r3 stats_variance ULP divergence pass locally).
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
    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    assert name in ORACLES, f"{name} has no oracle"
    cur = duck.execute(ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    assert sorted(scols) == sorted(ocols), \
        f"{name}: column mismatch {sorted(scols)} vs {sorted(ocols)}"
    sc, oc = _canon(srows, scols), _canon(orows, ocols)
    assert len(srows) == len(orows), \
        f"{name}: row count {len(srows)} vs {len(orows)}"
    if sc != oc:
        missing = list((oc - sc).items())[:5]
        extra = list((sc - oc).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch; oracle-only={missing} spark-only={extra}")
