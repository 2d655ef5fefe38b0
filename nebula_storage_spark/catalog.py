"""Schema catalog: tags, edge types, TTL, defaults, vid typing.

Stands in for the reference's metad-backed schema manager
(reference: src/meta/processors/schemaMan/CreateTagProcessor.cpp:13-87,
src/storage/query/QueryBaseProcessor.h:105-136 TagContext/EdgeContext).

The reference keeps *every* schema version and decodes each stored row with
the version it was written under (src/codec/RowWriterV2.h:37-47). In a
columnar Spark world a tag/edge is one table with the LATEST StructType;
"old rows missing a newer field" shows up as NULL and is repaired at read
time by `apply_read_semantics` using the field's default — exactly the
reference's read rule (src/storage/exec/QueryUtils.h:49-75):

  * unset nullable field        -> NULL
  * unset non-nullable w/default-> default value
  * unset non-nullable, no def  -> error in the reference; we surface NULL
    (batch engines cannot raise per-row) and document the divergence.

TTL: a schema may declare (ttl_col, ttl_duration); rows whose
ttl_col + ttl_duration <= now are invisible at read
(src/storage/CommonUtils.h:217-233). We inject the filter at load — one
place, consistently covering the "index" paths too since there is only one
table per tag/edge here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class FieldDef:
    name: str
    dtype: str                       # Spark SQL type name ("bigint", "string", ...)
    nullable: bool = False
    default: object | None = None    # constant default (reference: constant expr)


@dataclass(frozen=True)
class SchemaDef:
    """Shared shape of a tag or edge-type schema."""
    name: str
    fields: tuple[FieldDef, ...]
    ttl_col: str | None = None
    ttl_duration: int | None = None  # seconds

    def field(self, name: str) -> FieldDef:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(f"{self.name}: no field {name}")

    @property
    def prop_names(self) -> list[str]:
        return [f.name for f in self.fields]


@dataclass(frozen=True)
class TagDef(SchemaDef):
    pass


@dataclass(frozen=True)
class EdgeDef(SchemaDef):
    pass


@dataclass
class Catalog:
    """Space-level catalog: tag/edge schemas + vid type.

    Reference space metadata: vid type int64 or fixed-string per space
    (src/storage/CommonUtils.h:149-155).
    """
    tags: dict[str, TagDef] = field(default_factory=dict)
    edges: dict[str, EdgeDef] = field(default_factory=dict)
    vid_type: str = "bigint"

    def add_tag(self, tag: TagDef) -> "Catalog":
        self.tags[tag.name] = tag
        return self

    def add_edge(self, edge: EdgeDef) -> "Catalog":
        self.edges[edge.name] = edge
        return self

    # -- DDL surface (metad schemaMan parity: CreateTagProcessor.cpp:13-87,
    #    AlterTagProcessor.cpp, DropTagProcessor.cpp). ALTER in the
    #    reference mints a new schema VERSION and old rows decode with
    #    their writer version; here the catalog holds the latest schema
    #    and apply_read_semantics repairs older rows (missing field ->
    #    default / NULL) at load — same observable results. --

    def alter_add_field(self, name: str, fld: FieldDef,
                        is_edge: bool = False) -> "Catalog":
        store = self.edges if is_edge else self.tags
        old = store[name]
        if any(f.name == fld.name for f in old.fields):
            raise ValueError(f"{name}: field {fld.name} already exists")
        store[name] = type(old)(old.name, old.fields + (fld,),
                                old.ttl_col, old.ttl_duration)
        return self

    def alter_drop_field(self, name: str, field_name: str,
                         is_edge: bool = False) -> "Catalog":
        store = self.edges if is_edge else self.tags
        old = store[name]
        if old.ttl_col == field_name:
            raise ValueError(f"{name}: cannot drop TTL column {field_name}")
        kept = tuple(f for f in old.fields if f.name != field_name)
        if len(kept) == len(old.fields):
            raise KeyError(f"{name}: no field {field_name}")
        store[name] = type(old)(old.name, kept, old.ttl_col, old.ttl_duration)
        return self

    def drop_tag(self, name: str) -> "Catalog":
        del self.tags[name]
        return self

    def drop_edge(self, name: str) -> "Catalog":
        del self.edges[name]
        return self


def ttl_filter(schema: SchemaDef, now_epoch_sec: int) -> Column | None:
    """Visibility predicate for TTL'd schemas; None when no TTL.

    Reference rule (src/storage/CommonUtils.cpp checkDataExpiredForTTL):
    a row is expired when ttl_col + ttl_duration <= now.  NULL ttl_col
    rows never expire (no valid timestamp to compare).
    """
    if not schema.ttl_col or not schema.ttl_duration:
        return None
    c = F.col(schema.ttl_col).cast("long")
    return c.isNull() | (c + F.lit(int(schema.ttl_duration)) > F.lit(int(now_epoch_sec)))


def apply_read_semantics(df: DataFrame, schema: SchemaDef,
                         now_epoch_sec: int | None = None) -> DataFrame:
    """Apply default-fill + TTL visibility at load time.

    This is the single choke point replacing the reference's per-row decode
    repair (src/storage/exec/QueryUtils.h:49-75) and scan-time TTL checks
    (src/storage/exec/StorageIterator.h:91-105, exec/TagNode.h:100-107,
    exec/IndexScanNode.h:74-93).
    """
    present = set(df.columns)
    names = {f.name for f in schema.fields}
    cols = []
    for c in df.columns:
        if c in names:
            f = schema.field(c)
            if not f.nullable and f.default is not None:
                cols.append(F.coalesce(F.col(c), F.lit(f.default).cast(f.dtype)).alias(c))
            else:
                cols.append(F.col(c))
        else:
            cols.append(F.col(c))
    for f in schema.fields:
        if f.name not in present:
            # field added by a later schema version, absent in storage
            cols.append(F.lit(f.default).cast(f.dtype).alias(f.name))
    df = df.select(*cols)
    if now_epoch_sec is not None:
        pred = ttl_filter(schema, now_epoch_sec)
        if pred is not None:
            df = df.filter(pred)
    return df
