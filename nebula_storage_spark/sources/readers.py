"""Source/sink format adapters.

The reference ingests via thrift RPCs into RocksDB and exports via
checkpoints; a Spark engine's equivalent surface is format-pluggable
readers/writers. One entry point per direction, format-dispatched:

  parquet   columnar primary (schema from footers; nanos handled)
  csv       header + explicit-or-inferred schema
  json      line-delimited
  orc       columnar alternative (built into Spark)

Format notes for parity: CSV/JSON are text formats — timestamps travel as
ISO strings and get cast back by the provided schema; binary columns are
not representable (writer raises). Parquet/ORC round-trip all engine
types exactly, which is why they are the storage formats (store_io.py)
and text formats are ingest/export only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


_READERS = {
    "parquet": lambda s: s.read,
    "orc": lambda s: s.read,
    "csv": lambda s: s.read.option("header", "true"),
    "json": lambda s: s.read,
}


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: str | None = None) -> DataFrame:
    if fmt not in _READERS:
        raise ValueError(f"unsupported source format {fmt!r}")
    if fmt == "parquet":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    r = _READERS[fmt](spark)
    if schema is not None:
        r = r.schema(schema)
    elif fmt == "csv":
        r = r.option("inferSchema", "true")
    return r.format(fmt).load(path)


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite") -> None:
    if fmt not in _READERS:
        raise ValueError(f"unsupported sink format {fmt!r}")
    if fmt in ("csv", "json"):
        if any(t == "binary" for _, t in df.dtypes):
            raise ValueError(f"{fmt} cannot carry binary columns")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)
