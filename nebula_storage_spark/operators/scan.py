"""ScanVertex / ScanEdge — full-table scans with projection + paging parity.

Reference: paginated full-part scans returning one tag's / one edge type's
props with a limit and resume cursor
(src/storage/query/ScanVertexProcessor.cpp:27-100,
ScanEdgeProcessor.cpp:27-104). Empty prop list = all props
(QueryBaseProcessor.inl:16-112).

Spark: `select` + optional `limit`. The resume-cursor protocol is an RPC
pagination artifact; batch consumers stream the whole frame. Column
pruning reaches the parquet scan (check ReadSchema in .explain).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..graph import DST, RANK, SRC, VID, GraphStore


def scan_vertex(store: GraphStore, tag: str,
                props: Sequence[str] | None = None,
                limit: int | None = None,
                cursor=None) -> DataFrame:
    """`cursor` = last vid of the previous page (exclusive) — the
    resume-cursor protocol of ScanVertexProcessor.cpp:27-100 mapped onto a
    sargable `vid > cursor` predicate + vid-ordered limit."""
    df = store.tag_df(tag)
    cols = [VID] + (list(props) if props is not None
                    else [c for c in df.columns if c != VID])
    out = df.select(*cols)
    if cursor is not None:
        out = out.filter(F.col(VID) > F.lit(cursor))
    if limit is not None:
        # deterministic paging order for parity tests: vid order (the
        # reference pages in key order, i.e. vid order within a part)
        out = out.orderBy(VID).limit(limit)
    return out


def scan_edge(store: GraphStore, etype: str,
              props: Sequence[str] | None = None,
              limit: int | None = None,
              cursor: tuple | None = None) -> DataFrame:
    """`cursor` = (src, rank, dst) of the last edge of the previous page
    (exclusive) — composite-key resume in storage key order, the edge
    analog of ScanEdgeProcessor's paging (ScanEdgeProcessor.cpp:27-104)."""
    df = store.edge_df(etype)
    keys = [SRC, DST, RANK]
    cols = keys + (list(props) if props is not None
                   else [c for c in df.columns if c not in keys])
    out = df.select(*cols)
    if cursor is not None:
        cs, cr, cd = cursor
        out = out.filter(
            (F.col(SRC) > cs)
            | ((F.col(SRC) == cs) & (F.col(RANK) > cr))
            | ((F.col(SRC) == cs) & (F.col(RANK) == cr) & (F.col(DST) > cd)))
    if limit is not None:
        out = out.orderBy(SRC, RANK, DST).limit(limit)
    return out
