"""DeDupNode — distinct over chosen key columns.

Reference: src/storage/exec/DeDupNode.h:19-58 (sort + unique per part,
re-dedup after parallel union, LookupProcessor.cpp:96-98).

Spark: `dropDuplicates` already does partial (map-side) + final dedup —
the reference's two-phase dance is built in.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    return df.dropDuplicates(list(cols)) if cols else df.dropDuplicates()
