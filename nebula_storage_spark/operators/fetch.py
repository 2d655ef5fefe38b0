"""FetchProps — point lookups of vertex / edge rows by full key.

Reference: TagNode point-get of one (vid, tag) row (src/storage/exec/
TagNode.h:18-123); FetchEdgeNode point-get by (src, type, rank, dst)
(exec/EdgeNode.h:77-157). TTL-expired rows are absent (TagNode.h:100-107).

Spark: semi-join the key set against the table. The key set is tiny →
broadcast; the big side never shuffles. TTL handled at load by
GraphStore.tag_df/edge_df.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..graph import DST, RANK, SRC, VID, GraphStore


def fetch_vertices(store: GraphStore, tag: str, vids,
                   props: Sequence[str] | None = None) -> DataFrame:
    df = store.tag_df(tag)
    spark = df.sparkSession
    if not isinstance(vids, DataFrame):
        vids = spark.createDataFrame([(v,) for v in vids],
                                     f"{VID} {store.catalog.vid_type}")
    cols = [VID] + (list(props) if props is not None
                    else [c for c in df.columns if c != VID])
    return df.join(F.broadcast(vids.select(VID)), VID, "left_semi").select(*cols)


def fetch_edges(store: GraphStore, etype: str, keys,
                props: Sequence[str] | None = None) -> DataFrame:
    """`keys`: DataFrame or list of (src, dst, rank) tuples — the full edge
    key minus the type (which names the table)."""
    df = store.edge_df(etype)
    spark = df.sparkSession
    if not isinstance(keys, DataFrame):
        vt = store.catalog.vid_type
        keys = spark.createDataFrame(list(keys), f"{SRC} {vt}, {DST} {vt}, {RANK} bigint")
    kcols = [SRC, DST, RANK]
    cols = kcols + (list(props) if props is not None
                    else [c for c in df.columns if c not in kcols])
    return df.join(F.broadcast(keys.select(*kcols)), kcols, "left_semi").select(*cols)


def fetch_vertices_multi_tag(store: GraphStore, vids,
                             tags: dict[str, Sequence[str]]) -> DataFrame:
    """GetProp over MULTIPLE tags at once (GetPropTest's multi-tag TESTs:
    one response row per vertex, NULL for tags the vertex doesn't have —
    QueryBaseProcessor builds a TagNode per requested tag and left-joins
    their rows). Spark shape: the broadcast seed frame left-joins each
    tag table; a vid missing from a tag yields NULLs for that tag's
    props, mirroring the reference's left-outer HashJoinNode flavor."""
    from .go import _check_prop_collisions
    _check_prop_collisions(store, list(tags.items()))
    spark = store.tag_df(next(iter(tags))).sparkSession
    if not isinstance(vids, DataFrame):
        vids = spark.createDataFrame([(v,) for v in vids],
                                     f"{VID} {store.catalog.vid_type}")
    out = vids.select(VID)
    for tag, props in tags.items():
        out = out.join(store.tag_df(tag).select(VID, *props), VID, "left")
    return out
