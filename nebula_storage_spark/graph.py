"""GraphStore: the table-per-tag / table-per-edge-type data layout.

Reference physical model (src/utils/NebulaKeyUtils.h:14-26): row-oriented KV,
vertex rows keyed (part, vid, tagId), edge rows keyed
(part, src, edgeType, rank, dst), every edge stored twice (out-edge under
src, in-edge under dst with negative edgeType — sign convention
src/storage/query/QueryBaseProcessor.inl:209-234).

Spark-native choice (SURVEY §1.5): one DataFrame per tag
(`_vid` + props) and per edge type (`_src`, `_dst`, `_rank` + props).
No duplicate reverse copy — IN-direction traversal is a dst-side join;
at 100 TB this halves storage and write amplification, and a dst-sorted
projection table can be added as an optimization if reverse traversal
dominates (mirroring the reference's in-edge copy).

Pseudo-props (`_vid/_tag/_src/_dst/_rank/_type`,
src/storage/exec/QueryUtils.h:92-158) are plain columns here.

Scale posture: vertex tables should be written bucketed by `_vid` and edge
tables by `_src` (spark.sql.sources.bucketing) so that seed-join →
edge-join chains co-locate without a shuffle; in local-mode tests we rely
on broadcast joins of the (small) seed set instead, which is also the
plan shape a 1000-executor cluster wants for seed-driven traversal.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import Catalog, EdgeDef, FieldDef, TagDef, apply_read_semantics

VID = "_vid"
SRC = "_src"
DST = "_dst"
RANK = "_rank"
TYPE = "_type"
TAG = "_tag"


@dataclass
class GraphStore:
    """In-memory registry of tag → DataFrame and edge type → DataFrame.

    Vertex frames carry `_vid` + property columns; edge frames carry
    `_src`, `_dst`, `_rank` + property columns. `now` fixes the TTL clock
    for deterministic reads (the reference reads the wall clock at scan
    time; a fixed clock is required for oracle comparison).
    """
    catalog: Catalog
    vertices: dict[str, DataFrame] = field(default_factory=dict)
    edges: dict[str, DataFrame] = field(default_factory=dict)
    reverse_edges: dict[str, DataFrame] = field(default_factory=dict)
    now: int | None = None

    def add_vertices_df(self, tag: str, df: DataFrame) -> "GraphStore":
        assert VID in df.columns, f"vertex frame for {tag} needs {VID}"
        self.vertices[tag] = df
        return self

    def add_edges_df(self, etype: str, df: DataFrame) -> "GraphStore":
        assert {SRC, DST}.issubset(df.columns), f"edge frame for {etype} needs {SRC},{DST}"
        if RANK not in df.columns:
            df = df.withColumn(RANK, F.lit(0).cast("bigint"))
        self.edges[etype] = df
        return self

    def tag_df(self, tag: str) -> DataFrame:
        """Tag table with read semantics (defaults + TTL) applied."""
        df = self.vertices[tag]
        sch = self.catalog.tags.get(tag)
        return apply_read_semantics(df, sch, self.now) if sch else df

    def edge_df(self, etype: str) -> DataFrame:
        df = self.edges[etype]
        sch = self.catalog.edges.get(etype)
        return apply_read_semantics(df, sch, self.now) if sch else df

    def build_reverse_projection(self, etype: str,
                                 num_partitions: int = 16) -> "GraphStore":
        """Materialize a dst-partitioned copy of one edge type — the
        reference's stored in-edge record (every edge written twice, the
        reverse keyed by dst with negative edgeType,
        QueryBaseProcessor.inl:209-234). IN-direction traversal reads this
        copy and gets the same shuffle-free properties as OUT reads from
        the src-partitioned primary; the cost is the reference's own
        trade: 2× edge storage/write amplification. Idempotent."""
        if etype not in self.reverse_edges:
            self.reverse_edges[etype] = (
                self.edges[etype].repartition(num_partitions, F.col(DST))
                .persist())
        return self

    def reverse_edge_df(self, etype: str) -> DataFrame:
        """dst-partitioned frame for IN-direction reads; falls back to the
        primary (dst-side join still correct, just shuffles)."""
        df = self.reverse_edges.get(etype, self.edges[etype])
        sch = self.catalog.edges.get(etype)
        return apply_read_semantics(df, sch, self.now) if sch else df


# ---------------------------------------------------------------------------
# TPC-H-as-property-graph mapping over the driver's testdata.
#
# The driver's correctness gate runs queries on the TPC-H-ish parquet tables
# with a DuckDB oracle over the SAME tables, so the graph view is a set of
# derived frames (pure projections — zero data copy, full pushdown):
#
#   tag  customer(vid=c_custkey)      tag  order(vid=o_orderkey)
#   tag  part(vid=p_partkey)          tag  supplier(vid=s_suppkey)
#   tag  nation(vid=n_nationkey)      tag  region(vid=r_regionkey)
#   edge placed      customer -> order     (from orders;  rank=0)
#   edge contains    order    -> part      (from lineitem; rank=l_linenumber)
#   edge supplied_by part     -> supplier  (from lineitem; rank=l_linenumber)
#   edge cust_nation customer -> nation    (rank=0)
#   edge supp_nation supplier -> nation    (rank=0)
#   edge nation_region nation -> region    (rank=0)
#
# This mirrors how a Nebula space models master-detail data and gives every
# traversal operator an ANSI-SQL oracle.
# ---------------------------------------------------------------------------

def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet reader that tolerates TIMESTAMP(NANOS) columns (events.ts):
    Spark has no nanos timestamp type, so nanos columns surface as LONG
    nanoseconds (spark.sql.legacy.parquet.nanosAsLong) and are re-typed by
    load_events."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def normalize_event_ts(ev: DataFrame) -> DataFrame:
    """Normalize events.ts across data vintages. Two source shapes exist:
    TIMESTAMP(NANOS) parquet (surfaces as LONG nanos under nanosAsLong) and
    native timestamp[us] parquet (surfaces as TIMESTAMP/_NTZ). Output is the
    same either way: `ts` TIMESTAMP (UTC instant — session tz is pinned to
    UTC so NTZ wall-clock == instant), `ts_ns` LONG epoch nanos, `ts_epoch`
    LONG epoch seconds. Works on batch and streaming frames (pure column
    expressions, no actions)."""
    dt = dict(ev.dtypes)["ts"]
    if dt == "bigint":
        ts = F.expr("timestamp_micros(ts div 1000)")
        ts_ns = F.col("ts")
        ts_epoch = F.expr("ts div 1000000000")
    else:
        ts = F.col("ts").cast("timestamp")
        ts_ns = F.unix_micros(ts) * F.lit(1000)
        ts_epoch = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    rest = [c for c in ev.columns if c not in ("event_id", "ts")]
    return ev.select("event_id", ts_ns.alias("ts_ns"), ts.alias("ts"),
                     ts_epoch.alias("ts_epoch"), *rest)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ts normalized: `ts` = microsecond timestamp,
    `ts_epoch` = epoch seconds (floor), `ts_ns` = epoch nanos."""
    return normalize_event_ts(
        read_parquet(spark, f"{sf_dir}/events.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    names = ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"]
    out = {n: read_parquet(spark, f"{sf_dir}/{n}.parquet") for n in names}
    out["events"] = load_events(spark, sf_dir)
    return out


_GRAPH_CACHE: dict[tuple[int, str], "GraphStore"] = {}


def tpch_graph(spark: SparkSession, sf_dir: str) -> GraphStore:
    # Memoized per (session, dir): mirrors the reference's metad schema cache
    # (QueryBaseProcessor.inl:236-255 fetches from a cached manager) and
    # avoids re-running parquet footer inference for every query.
    key = (id(spark), sf_dir)
    cached = _GRAPH_CACHE.get(key)
    if cached is not None:
        return cached
    g = _build_tpch_graph(spark, sf_dir)
    _GRAPH_CACHE[key] = g
    return g


def _part_by(df: DataFrame, key: str, n: int) -> DataFrame:
    """Partition a big frame by its traversal key and keep it resident —
    the Spark analog of the reference's hash-part-by-vid physical layout
    (utils/NebulaKeyUtils.h:97-99): one shuffle at load, after which the
    cached InMemoryRelation advertises HashPartitioning(key), so every
    groupBy/join on the key skips its exchange. At 100 TB the same layout
    comes from bucketed table writes; in-session, repartition+persist.
    Also fixes the driver testdata's 1-row-group parquet files, which
    otherwise scan on a single thread regardless of cluster size."""
    return df.repartition(n, F.col(key)).persist()


def _build_tpch_graph(spark: SparkSession, sf_dir: str) -> GraphStore:
    t = load_tables(spark, sf_dir)
    npart = max(spark.sparkContext.defaultParallelism // 2, 4)
    cat = Catalog(vid_type="bigint")
    cat.add_tag(TagDef("customer", (
        FieldDef("c_name", "string"), FieldDef("c_nationkey", "int"),
        FieldDef("c_acctbal", "double"), FieldDef("c_mktsegment", "string"))))
    cat.add_tag(TagDef("order", (
        FieldDef("o_orderstatus", "string"), FieldDef("o_totalprice", "double"),
        FieldDef("o_orderdate", "timestamp"), FieldDef("o_orderpriority", "string"))))
    cat.add_tag(TagDef("part", (
        FieldDef("p_name", "string"), FieldDef("p_brand", "string"),
        FieldDef("p_type", "string"), FieldDef("p_size", "int"),
        FieldDef("p_retailprice", "double"))))
    cat.add_tag(TagDef("supplier", (
        FieldDef("s_name", "string"), FieldDef("s_nationkey", "int"),
        FieldDef("s_acctbal", "double"))))
    cat.add_tag(TagDef("nation", (
        FieldDef("n_name", "string"), FieldDef("n_regionkey", "int"))))
    cat.add_tag(TagDef("region", (FieldDef("r_name", "string"),)))
    cat.add_edge(EdgeDef("placed", (
        FieldDef("o_orderstatus", "string"), FieldDef("o_totalprice", "double"),
        FieldDef("o_orderdate", "timestamp"), FieldDef("o_orderpriority", "string"))))
    cat.add_edge(EdgeDef("contains", (
        FieldDef("l_quantity", "double"), FieldDef("l_extendedprice", "double"),
        FieldDef("l_discount", "double"), FieldDef("l_tax", "double"),
        FieldDef("l_returnflag", "string"), FieldDef("l_linestatus", "string"),
        FieldDef("l_shipdate", "timestamp"), FieldDef("l_suppkey", "bigint"))))
    cat.add_edge(EdgeDef("supplied_by", (
        FieldDef("l_orderkey", "bigint"), FieldDef("l_quantity", "double"),
        FieldDef("l_extendedprice", "double"))))
    cat.add_edge(EdgeDef("cust_nation", ()))
    cat.add_edge(EdgeDef("supp_nation", ()))
    cat.add_edge(EdgeDef("nation_region", ()))

    g = GraphStore(catalog=cat)
    c = t["customer"]
    g.add_vertices_df("customer", c.select(
        c.c_custkey.cast("bigint").alias(VID), "c_name", "c_nationkey",
        "c_acctbal", "c_mktsegment"))
    o = t["orders"]
    g.add_vertices_df("order", o.select(
        o.o_orderkey.cast("bigint").alias(VID), "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    p = t["part"]
    g.add_vertices_df("part", p.select(
        p.p_partkey.cast("bigint").alias(VID), "p_name", "p_brand", "p_type",
        "p_size", "p_retailprice"))
    s = t["supplier"]
    g.add_vertices_df("supplier", s.select(
        s.s_suppkey.cast("bigint").alias(VID), "s_name", "s_nationkey", "s_acctbal"))
    n = t["nation"]
    g.add_vertices_df("nation", n.select(
        n.n_nationkey.cast("bigint").alias(VID), "n_name", "n_regionkey"))
    r = t["region"]
    g.add_vertices_df("region", r.select(
        r.r_regionkey.cast("bigint").alias(VID), "r_name"))

    g.add_edges_df("placed", _part_by(o.select(
        o.o_custkey.cast("bigint").alias(SRC), o.o_orderkey.cast("bigint").alias(DST),
        F.lit(0).cast("bigint").alias(RANK),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
        SRC, npart))
    li = t["lineitem"]
    g.add_edges_df("contains", _part_by(li.select(
        li.l_orderkey.cast("bigint").alias(SRC), li.l_partkey.cast("bigint").alias(DST),
        li.l_linenumber.cast("bigint").alias(RANK),
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate", "l_suppkey"),
        SRC, npart))
    g.add_edges_df("supplied_by", li.select(
        li.l_partkey.cast("bigint").alias(SRC), li.l_suppkey.cast("bigint").alias(DST),
        li.l_linenumber.cast("bigint").alias(RANK),
        "l_orderkey", "l_quantity", "l_extendedprice"))
    g.add_edges_df("cust_nation", c.select(
        c.c_custkey.cast("bigint").alias(SRC), c.c_nationkey.cast("bigint").alias(DST),
        F.lit(0).cast("bigint").alias(RANK)))
    g.add_edges_df("supp_nation", s.select(
        s.s_suppkey.cast("bigint").alias(SRC), s.s_nationkey.cast("bigint").alias(DST),
        F.lit(0).cast("bigint").alias(RANK)))
    g.add_edges_df("nation_region", n.select(
        n.n_nationkey.cast("bigint").alias(SRC), n.n_regionkey.cast("bigint").alias(DST),
        F.lit(0).cast("bigint").alias(RANK)))
    return g
