"""DeleteVertices / DeleteTags / DeleteEdges.

Reference: mutate/DeleteVerticesProcessor.cpp:65-160 (vertex delete =
prefix-delete every tag row of the vid + index cleanup),
DeleteTagsProcessor.cpp, DeleteEdgesProcessor.cpp.

Spark: anti-join producing the post-image. Index cleanup is moot (single
table). Deleting a vertex across ALL its tags maps to applying
delete_tags to every tag table for the vid set — `delete_vertices_all`
does that in one pass over a GraphStore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import DST, RANK, SRC, VID, GraphStore


def _key_frame(df_or_list, spark, schema: str) -> DataFrame:
    if isinstance(df_or_list, DataFrame):
        return df_or_list
    return spark.createDataFrame(list(df_or_list), schema)


def delete_tags(tag_table: DataFrame, vids, vid_type: str = "bigint") -> DataFrame:
    """Remove the rows of one tag for the given vids (DeleteTagsProcessor)."""
    spark = tag_table.sparkSession
    if not isinstance(vids, DataFrame):
        vids = spark.createDataFrame([(v,) for v in vids], f"{VID} {vid_type}")
    return tag_table.join(F.broadcast(vids.select(VID)), VID, "left_anti")


def delete_edges(edge_table: DataFrame, keys, vid_type: str = "bigint") -> DataFrame:
    """Remove edges by full key (src, dst, rank) — DeleteEdgesProcessor."""
    spark = edge_table.sparkSession
    if not isinstance(keys, DataFrame):
        keys = spark.createDataFrame(
            list(keys), f"{SRC} {vid_type}, {DST} {vid_type}, {RANK} bigint")
    return edge_table.join(F.broadcast(keys.select(SRC, DST, RANK)),
                           [SRC, DST, RANK], "left_anti")


def delete_vertices(store: GraphStore, vids) -> GraphStore:
    """Vertex delete parity: drop every tag row AND every incident edge of
    the vids (the reference deletes tag rows; incident out/in edges are
    deleted by graphd issuing edge deletes — we expose the combined
    operation as the useful batch semantic)."""
    spark = next(iter(store.vertices.values())).sparkSession
    vt = store.catalog.vid_type
    if not isinstance(vids, DataFrame):
        vids = spark.createDataFrame([(v,) for v in vids], f"{VID} {vt}")
    vids = F.broadcast(vids.select(VID))
    out = GraphStore(catalog=store.catalog, now=store.now)
    for tag, df in store.vertices.items():
        out.vertices[tag] = df.join(vids, VID, "left_anti")
    for et, df in store.edges.items():
        out.edges[et] = (df.join(vids.withColumnRenamed(VID, SRC), SRC, "left_anti")
                           .join(vids.withColumnRenamed(VID, DST), DST, "left_anti"))
    return out
