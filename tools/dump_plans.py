#!/usr/bin/env python
"""Dump `.explain("formatted")` for the named queries (default: every
bench headliner) to <outdir>/<query>_<tag>.txt — the before/after plan
artifacts for optimization rounds.

Usage: python tools/dump_plans.py <outdir> <tag> [query ...]
e.g.   python tools/dump_plans.py plans/r13 before greedy_coloring
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nebula_storage_spark.session import get_spark
from nebula_storage_spark.workload import build_queries


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[3:]
    if not names:
        import bench
        names = list(bench.HEADLINERS)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    queries = build_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({tag})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
