"""GetNeighbors — the GO/traversal workhorse (SURVEY §3.1).

Reference lifecycle (src/storage/query/GetNeighborsProcessor.cpp:31-139):
per (part, vid) it runs the DAG
  TagNodes + SingleEdgeNodes -> HashJoinNode -> FilterNode? ->
  AggregateNode? -> GetNeighbors(Sample)Node
(src/storage/exec/HashJoinNode.h:24-164, exec/FilterNode.h:29-83,
exec/AggregateNode.h:35-162, exec/GetNeighborsNode.h:40-189).

Spark shape: the per-vertex DAG disappears — ONE declarative DataFrame plan
serves every seed vid:

  seeds -> (left) join vertices_T -> join edges_E* on src/dst -> filter ->
  {stats groupBy | per-vertex limit/sample window} -> flat rows

Semantics preserved:
  * direction OUT / IN / BOTH — IN is a dst-side join, surfaced with the
    reference's sign convention: `_type` = "-<edge>" (out = "+<edge>"),
    cf. GetNeighborsProcessor.cpp:344-357 `"_edge:" + ("+"/"-") + name`
    and QueryBaseProcessor.inl:209-234 (negative edgeType for IN).
  * missing tag row => left-outer NULL props (HashJoinNode.h:133-152).
  * filter NULL => row dropped (FilterNode.h:64-77) — Spark's filter has
    identical NULL semantics.
  * stats (SUM/COUNT/AVG/MIN/MAX per source vertex) are computed over ALL
    filtered edges while the returned edge list is truncated at `limit` —
    the ordering subtlety at GetNeighborsProcessor.cpp:225-247. We expose
    stats and edge-list as separate frames off one shared filtered plan.
  * per-vertex limit takes the FIRST k edges in storage key order
    (edgeType, rank, dst) — key layout NebulaKeyUtils.h:17-19; limit check
    GetNeighborsNode.h:91-93.
  * sample=k picks k uniform-random edges per vertex
    (GetNeighborsSampleNode, GetNeighborsNode.h:125-189). For oracle
    determinism we order by md5(src,type,rank,dst) — a fixed "random"
    permutation reproducible in any engine — instead of an RNG.

Scale notes: the seed set is broadcast (typical traversal = few seeds);
per-vertex limit uses row_number over (vid) which Spark ≥3.5 executes with
WindowGroupLimit partial pushdown (map-side top-k before the shuffle), so
super-node skew does not ship all edges of a hub vertex to one reducer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..graph import DST, RANK, SRC, TYPE, VID, GraphStore

_EDGE_KEYS = [TYPE, SRC, DST, RANK]


def _check_prop_collisions(store: GraphStore, tag_specs) -> None:
    """Multi-tag prop outputs share one flat namespace in the Spark frame,
    whereas the reference namespaces props per tag (tag_name.prop in the
    response dataset). Two tags contributing the same column name would
    produce ambiguous columns and a downstream AnalysisException — reject
    up front with an actionable error."""
    seen: dict[str, str] = {}
    for tag, props in tag_specs:
        cols = (list(props) if props is not None
                else [c for c in store.tag_df(tag).columns if c != VID])
        for c in cols:
            if c in seen and seen[c] != tag:
                raise ValueError(
                    f"prop {c!r} requested from both tag {seen[c]!r} and "
                    f"tag {tag!r}: multi-tag outputs share one column "
                    "namespace — alias one side (select/rename) first")
            seen[c] = tag


def _seed_df(store: GraphStore, spark, vids) -> DataFrame:
    if isinstance(vids, DataFrame):
        return vids.select(F.col(vids.columns[0]).cast(store.catalog.vid_type).alias(VID))
    return spark.createDataFrame([(v,) for v in vids], f"{VID} {store.catalog.vid_type}")


def _edges_for(store: GraphStore, etype: str, direction: str,
               edge_props: Sequence[str] | None) -> DataFrame:
    """One edge type in one direction as (join_vid, _type, _src, _dst, _rank, props).

    IN direction prefers the dst-partitioned reverse projection when the
    store has one (GraphStore.build_reverse_projection — the reference's
    stored in-edge copy)."""
    e = store.reverse_edge_df(etype) if direction == "in" else store.edge_df(etype)
    props = list(edge_props) if edge_props is not None else \
        [c for c in e.columns if c not in (SRC, DST, RANK)]
    sign = "+" if direction == "out" else "-"
    join_key = SRC if direction == "out" else DST
    return e.select(
        F.col(join_key).alias(VID),
        F.lit(sign + etype).alias(TYPE),
        SRC, DST, RANK,
        *[F.col(p) for p in props],
    )


def get_neighbors(store: GraphStore, vids, over: Sequence[str] | str,
                  direction: str = "out",
                  vertex_tag: str | None = None,
                  vertex_props: Sequence[str] | None = None,
                  edge_props: Sequence[str] | None = None,
                  edge_filter: Column | str | None = None,
                  expr_col: Column | str | None = None,
                  limit: int | None = None,
                  sample: int | None = None,
                  sample_seed: int | None = None) -> DataFrame:
    """Flat traversal result: one row per (seed vid, qualifying edge).

    Columns: _vid, [vertex props], _type, _src, _dst, _rank, [edge props].
    `over` may be one edge type or a list (multi-edge traversal unions by
    name with NULLs for props the other type lacks — the reference's
    per-type prop-list columns, MultiEdgeIterator StorageIterator.h:121-174).
    """
    spark = next(iter(store.edges.values())).sparkSession
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    if isinstance(over, str):
        over = [over]
    dirs = ["out", "in"] if direction == "both" else [direction]

    seeds = _seed_df(store, spark, vids)

    per_type = []
    for etype in over:
        for d in dirs:
            per_type.append(_edges_for(store, etype, d, edge_props))
    edges = per_type[0]
    for other in per_type[1:]:
        edges = edges.unionByName(other, allowMissingColumns=True)

    # Seed-driven traversal: the seed list is small → broadcast it so the
    # edge scan never shuffles (reference analog: per-part prefix scan from
    # each vid, EdgeNode.h:203-208).
    out = F.broadcast(seeds).join(edges, VID, "inner")

    if vertex_tag:
        # multi-tag vertices: one row per tag in the reference
        # (AddVerticesProcessor.cpp:83-124); traversal output carries every
        # requested tag's props side by side (TagNodes fan-in at
        # HashJoinNode). Accepts "tag" or [("tag", [props…]), …].
        tag_specs = ([(vertex_tag, vertex_props)] if isinstance(vertex_tag, str)
                     else [(t, p) for t, p in vertex_tag])
        _check_prop_collisions(store, tag_specs)
        for tag, props in tag_specs:
            v = store.tag_df(tag)
            vcols = [VID] + (list(props) if props is not None
                             else [c for c in v.columns if c != VID])
            # missing tag ⇒ NULL props (left-outer, HashJoinNode.h:133-152)
            out = out.join(F.broadcast(v.select(*vcols)), VID, "left")

    if edge_filter is not None:
        pred = F.expr(edge_filter) if isinstance(edge_filter, str) else edge_filter
        out = out.filter(pred)          # NULL predicate drops the row — parity

    if expr_col is not None:
        # the `_expr` output column: an arbitrary expression evaluated per
        # result row after the filter (GetNeighborsProcessor.cpp:256-258
        # fixes `_expr` as the trailing output column)
        e = F.expr(expr_col) if isinstance(expr_col, str) else expr_col
        out = out.withColumn("_expr", e)

    if sample is not None:
        if sample_seed is not None:
            # statistically uniform per-vertex sampling via a seeded RNG —
            # the reference's reservoir semantics (GetNeighborsNode.h:125-189
            # draws from folly::Random). rand(seed) is drawn per row; the
            # key-order tiebreak makes the sort total. Reproducible for a
            # fixed partitioning; use the md5 path when cross-engine
            # bit-stability is required (the oracle compares that path).
            rand_key = F.rand(sample_seed)
        else:
            # deterministic pseudo-random permutation shared with the oracle
            rand_key = F.md5(F.concat_ws("#", F.col(SRC).cast("string"),
                                         F.col(TYPE), F.col(RANK).cast("string"),
                                         F.col(DST).cast("string")))
        w = W.partitionBy(VID).orderBy(rand_key, TYPE, RANK, DST)
        out = (out.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= sample).drop("_rn"))
    elif limit is not None:
        w = W.partitionBy(VID).orderBy(TYPE, RANK, DST)
        out = (out.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= limit).drop("_rn"))
    return out


def go_n_hops(store: GraphStore, vids, over: Sequence[str],
              directions: Sequence[str] | None = None) -> DataFrame:
    """GO n STEPS by composition: hop k's destination frontier seeds hop
    k+1 (graphd builds multi-hop GO from repeated single-hop GetNeighbors
    requests — same decomposition, but each hop here is one distributed
    plan over the whole frontier, not a per-vertex RPC).

    `over[k]` is the edge type of hop k (+ optional per-hop direction).
    Returns distinct (start_vid, end_vid) pairs after the last hop.
    Frontiers stay DataFrames end-to-end — no driver-side collect, so a
    frontier of 10⁹ vertices is fine.
    """
    dirs = list(directions) if directions else ["out"] * len(over)
    spark = next(iter(store.edges.values())).sparkSession
    seeds = _seed_df(store, spark, vids)
    pairs = seeds.select(F.col(VID).alias("start_vid"),
                         F.col(VID).alias("_frontier"))
    for etype, d in zip(over, dirs):
        hop = get_neighbors(store, pairs.select(F.col("_frontier").alias(VID))
                            .distinct(), etype, direction=d, edge_props=[])
        nxt = hop.select(F.col(VID).alias("_frontier"),
                         F.col(DST if d == "out" else SRC).alias("_next"))
        pairs = (pairs.join(nxt, "_frontier")
                 .select("start_vid", F.col("_next").alias("_frontier"))
                 .distinct())
    return pairs.select("start_vid", F.col("_frontier").alias("end_vid"))


def go_1_to_n(store: GraphStore, vids, over: Sequence[str],
              directions: Sequence[str] | None = None) -> DataFrame:
    """GO 1 TO n STEPS: the union of every hop-depth prefix of the walk
    (graphd's `GO 1 TO n` issues GetNeighbors per step and unions the
    yields; we compose the same frontiers and union the per-depth pair
    sets). Output: distinct (start_vid, end_vid, hop) with hop in [1, n].

    Each hop is one distributed plan over the whole frontier; the union is
    a zero-shuffle unionByName of already-distinct per-depth frames.
    """
    dirs = list(directions) if directions else ["out"] * len(over)
    spark = next(iter(store.edges.values())).sparkSession
    seeds = _seed_df(store, spark, vids)
    pairs = seeds.select(F.col(VID).alias("start_vid"),
                         F.col(VID).alias("_frontier"))
    out = None
    for depth, (etype, d) in enumerate(zip(over, dirs), start=1):
        hop = get_neighbors(store, pairs.select(F.col("_frontier").alias(VID))
                            .distinct(), etype, direction=d, edge_props=[])
        nxt = hop.select(F.col(VID).alias("_frontier"),
                         F.col(DST if d == "out" else SRC).alias("_next"))
        pairs = (pairs.join(nxt, "_frontier")
                 .select("start_vid", F.col("_next").alias("_frontier"))
                 .distinct())
        level = pairs.select("start_vid", F.col("_frontier").alias("end_vid"),
                             F.lit(depth).cast("int").alias("hop"))
        out = level if out is None else out.unionByName(level)
    return out


def get_subgraph(store: GraphStore, vids, over: Sequence[str],
                 directions: Sequence[str] | None = None) -> DataFrame:
    """GET SUBGRAPH k STEPS: the edge set discovered hop by hop from the
    seeds (graphd's GetSubgraph executor drives repeated GetNeighbors
    calls and accumulates each step's edges; same decomposition here —
    hop k's frontier is hop k-1's destination set). Output: distinct
    (hop, _type, _src, _dst, _rank) per discovered edge.

    Each hop is one distributed GetNeighbors plan over the whole
    frontier; output frames union without a shuffle.
    """
    dirs = list(directions) if directions else ["out"] * len(over)
    spark = next(iter(store.edges.values())).sparkSession
    frontier = _seed_df(store, spark, vids).select(VID).distinct()
    out = None
    for depth, (etype, d) in enumerate(zip(over, dirs), start=1):
        hop = get_neighbors(store, frontier, etype, direction=d,
                            edge_props=[])
        edges = hop.select(F.lit(depth).cast("int").alias("hop"),
                           F.col(TYPE).alias("_etype"),
                           SRC, DST, RANK).distinct()
        out = edges if out is None else out.unionByName(edges)
        frontier = hop.select(
            F.col(DST if d == "out" else SRC).alias(VID)).distinct()
    return out


def bfs_min_hop(store: GraphStore, vids, over: Sequence[str],
                directions: Sequence[str] | None = None) -> DataFrame:
    """BFS distances: for each (start_vid, end_vid) reachable within
    len(over) hops, the MINIMUM hop count at which end_vid is first
    reached. Proper frontier BFS — each round's frontier is anti-joined
    against the vertices already seen for that start, so a vertex is
    expanded at most once per start (the property that keeps iteration
    work bounded on graphs with cycles).
    """
    dirs = list(directions) if directions else ["out"] * len(over)
    spark = next(iter(store.edges.values())).sparkSession
    seeds = _seed_df(store, spark, vids)
    frontier = seeds.select(F.col(VID).alias("start_vid"),
                            F.col(VID).alias("_frontier"))
    visited = frontier.select("start_vid",
                              F.col("_frontier").alias("end_vid"))
    out = None
    for depth, (etype, d) in enumerate(zip(over, dirs), start=1):
        hop = get_neighbors(store, frontier.select(
            F.col("_frontier").alias(VID)).distinct(), etype,
            direction=d, edge_props=[])
        nxt = hop.select(F.col(VID).alias("_frontier"),
                         F.col(DST if d == "out" else SRC).alias("_next"))
        reached = (frontier.join(nxt, "_frontier")
                   .select("start_vid", F.col("_next").alias("end_vid"))
                   .distinct())
        fresh = reached.join(visited, ["start_vid", "end_vid"], "left_anti")
        level = fresh.select("start_vid", "end_vid",
                             F.lit(depth).cast("int").alias("dist"))
        out = level if out is None else out.unionByName(level)
        visited = visited.unionByName(fresh)
        frontier = fresh.select("start_vid",
                                F.col("end_vid").alias("_frontier"))
    return out


def common_neighbors(store: GraphStore, pairs: Sequence[tuple[int, int]],
                     over: Sequence[str],
                     directions: Sequence[str] | None = None) -> DataFrame:
    """|N(a) ∩ N(b)| per requested vertex pair, where N(·) is the
    destination set of the `over` walk (1 hop or composed). The classic
    co-occurrence / link-prediction primitive. One shared neighbor frame
    serves every pair — the walk runs once over the union of pair
    endpoints, then the (tiny, broadcast) pair list joins it twice on the
    shared end-vertex. Pairs with an empty intersection are omitted.
    """
    spark = next(iter(store.edges.values())).sparkSession
    seeds = sorted({v for ab in pairs for v in ab})
    nbrs = go_n_hops(store, seeds, over, directions)
    pdf = spark.createDataFrame(list(pairs), "vid_a bigint, vid_b bigint")
    a = nbrs.select(F.col("start_vid").alias("vid_a"),
                    F.col("end_vid").alias("__n"))
    b = nbrs.select(F.col("start_vid").alias("vid_b"),
                    F.col("end_vid").alias("__n"))
    return (F.broadcast(pdf).join(a, "vid_a").join(b, ["vid_b", "__n"])
            .groupBy("vid_a", "vid_b")
            .agg(F.count("*").alias("n_common")))


def neighbor_jaccard(store: GraphStore, pairs: Sequence[tuple[int, int]],
                     over: Sequence[str],
                     directions: Sequence[str] | None = None) -> DataFrame:
    """Neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| per vertex pair as
    an x10000 integer — common_neighbors' normalized companion (the other
    standard link-prediction score). Same single shared walk; per-endpoint
    set sizes come from one aggregate over it. Pairs with an empty
    intersection are omitted (their score is 0)."""
    spark = next(iter(store.edges.values())).sparkSession
    seeds = sorted({v for ab in pairs for v in ab})
    nbrs = go_n_hops(store, seeds, over, directions)
    sizes = nbrs.groupBy("start_vid").agg(F.count("*").alias("_n"))
    pdf = spark.createDataFrame(list(pairs), "vid_a bigint, vid_b bigint")
    a = nbrs.select(F.col("start_vid").alias("vid_a"),
                    F.col("end_vid").alias("__n"))
    b = nbrs.select(F.col("start_vid").alias("vid_b"),
                    F.col("end_vid").alias("__n"))
    inter = (F.broadcast(pdf).join(a, "vid_a").join(b, ["vid_b", "__n"])
             .groupBy("vid_a", "vid_b")
             .agg(F.count("*").alias("_i")))
    return (inter
            .join(F.broadcast(sizes.withColumnRenamed("start_vid", "vid_a")
                              .withColumnRenamed("_n", "_na")), "vid_a")
            .join(F.broadcast(sizes.withColumnRenamed("start_vid", "vid_b")
                              .withColumnRenamed("_n", "_nb")), "vid_b")
            .select("vid_a", "vid_b",
                    F.expr("(_i * 10000) DIV (_na + _nb - _i)")
                    .alias("jaccard_x10000")))


def go_stats_salted(store: GraphStore, vids, over: Sequence[str] | str,
                    stat_props: dict[str, tuple[str, str]],
                    salt_buckets: int = 8,
                    direction: str = "out",
                    edge_filter: Column | str | None = None) -> DataFrame:
    """go_stats for super-node skew: two-phase aggregation through a
    deterministic salt (hash of the edge key), so one hub vertex's edges
    partial-aggregate across `salt_buckets` reducers before the final
    per-vertex merge. Results are identical to go_stats (only decomposable
    stats: sum/dsum/count/min/max — avg composes from sum+count).

    Note Spark's map-side partial aggregation already bounds most skew;
    explicit salting is the escape hatch when a single vertex's edges
    exceed one executor's partial-agg hash table.
    """
    edges = get_neighbors(store, vids, over, direction=direction,
                          edge_filter=edge_filter)
    salt = F.pmod(F.xxhash64(SRC, TYPE, RANK, DST), F.lit(salt_buckets))
    partial_aggs, final_aggs = [], []
    for out_name, (agg, prop) in stat_props.items():
        p = f"_p_{out_name}"
        if agg == "dsum":
            partial_aggs.append(F.sum(F.col(prop).cast("decimal(18,2)")).alias(p))
            final_aggs.append(F.sum(p).cast("double").alias(out_name))
        elif agg == "sum":
            partial_aggs.append(F.sum(prop).alias(p))
            final_aggs.append(F.sum(p).alias(out_name))
        elif agg == "count":
            partial_aggs.append(F.count(prop).alias(p))
            final_aggs.append(F.sum(p).alias(out_name))
        elif agg == "min":
            partial_aggs.append(F.min(prop).alias(p))
            final_aggs.append(F.min(p).alias(out_name))
        elif agg == "max":
            partial_aggs.append(F.max(prop).alias(p))
            final_aggs.append(F.max(p).alias(out_name))
        else:
            raise ValueError(f"non-decomposable stat {agg!r} for salted agg")
    partial = (edges.withColumn("_salt", salt)
               .groupBy(VID, "_salt").agg(*partial_aggs))
    return partial.groupBy(VID).agg(*final_aggs)


def go_stats(store: GraphStore, vids, over: Sequence[str] | str,
             stat_props: dict[str, tuple[str, str]],
             direction: str = "out",
             edge_filter: Column | str | None = None) -> DataFrame:
    """Per-source-vertex stats over (filtered) edges — AggregateNode parity.

    `stat_props`: out-col -> (agg, edge-prop) with agg in
    sum/count/avg/min/max (src/storage/exec/AggregateNode.h:35-162; stat
    typing rules GetNeighborsProcessor.cpp:359-458). Stats run over ALL
    filtered edges regardless of any display limit — callers wanting both
    should reuse one get_neighbors frame and apply the limit separately.
    """
    edges = get_neighbors(store, vids, over, direction=direction,
                          edge_filter=edge_filter)
    aggs = []
    for out_name, (agg, prop) in stat_props.items():
        if agg == "dsum":
            # exact decimal accumulation for money columns (deterministic
            # across engines/partitionings; see workload._dsum rationale)
            aggs.append(F.sum(F.col(prop).cast("decimal(18,2)"))
                        .cast("double").alias(out_name))
            continue
        f = {"sum": F.sum, "count": F.count, "avg": F.avg,
             "min": F.min, "max": F.max}[agg]
        aggs.append(f(prop).alias(out_name))
    return edges.groupBy(VID).agg(*aggs)
