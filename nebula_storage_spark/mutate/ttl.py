"""TTL retention — the compaction-filter purge as a batch rewrite job.

Reference: expired rows are (a) invisible at read (CommonUtils.h:217-233,
applied at every scan site) and (b) physically dropped at RocksDB
compaction by the CompactionFilter (storage/CompactionFilter.h:35-183,
which also drops rows of dropped schemas and dangling index keys).

Spark: read-time invisibility lives in catalog.apply_read_semantics; the
physical purge is this periodic job producing the compacted table
(Delta VACUUM-style). Dangling-index cleanup is moot (no separate index
structure); dropped-schema cleanup = dropping the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..catalog import SchemaDef, ttl_filter


def ttl_purge(df: DataFrame, schema: SchemaDef, now_epoch_sec: int) -> DataFrame:
    """Post-image with expired rows physically removed."""
    pred = ttl_filter(schema, now_epoch_sec)
    return df if pred is None else df.filter(pred)
