"""Round-3 extension workload: completes the TPC-H shape family
(q9/q11/q20 without a partsupp table), adds the k-truss support and
harmonic-centrality analytics, a retrieval pair (inverted-index boolean
search + integer BM25 ranking), blocked fuzzy (Levenshtein) dedup, SCD2
validity intervals, GROUPING SETS, a stream-static enrichment join, and
the small-file compaction maintenance task.

Same determinism contract as workload.py: exact integer cents /
x-scaled integers everywhere a float could diverge engine-to-engine;
every LIMIT behind a total order on a unique key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .graph import DST, SRC, VID, load_events, read_parquet, tpch_graph
from .workload import _seeds

# exact integer money/quantity terms shared by the TPC-H shapes below
_EXT_CENTS = ("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
_DISC_PCT = ("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")
_QTY_UNITS = ("CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)")
_RETAIL_CENTS = ("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")


def _docs(spark, sf_dir):
    n = max(spark.sparkContext.defaultParallelism // 2, 4)
    return (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .repartition(n, "doc_id"))


# ---------------------------------------------------------------------------
# TPC-H shape family completion: q9 / q11 / q20
# ---------------------------------------------------------------------------

def q_tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation/year; no partsupp
    table, so p_retailprice stands in for ps_supplycost): per supplier
    nation and order year, profit over parts whose name contains 'gear'.
    All money stays integer — revenue in cent-percent units
    (ext_cents x (100 - disc_pct)) minus cost in the same units
    (retail_cents x qty x 100), so the sum is bit-exact cross-engine.
    Part/supplier/nation are broadcast dims; the one shuffle is
    lineitem x orders on the order key."""
    g = tpch_graph(spark, sf_dir)
    part = (g.tag_df("part").filter(F.col("p_name").contains("gear"))
            .select(F.col(VID).alias("partkey"),
                    F.expr(_RETAIL_CENTS).alias("retail_cents")))
    nation = g.tag_df("nation").select(F.col(VID).alias("nk"), "n_name")
    supp = (g.tag_df("supplier")
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("nk"))
            .select(F.col(VID).alias("l_suppkey"), "n_name"))
    orders = g.edge_df("placed").select(
        F.col(DST).alias("orderkey"),
        F.year("o_orderdate").cast("bigint").alias("o_year"))
    li = g.edge_df("contains").select(
        F.col(SRC).alias("orderkey"), F.col(DST).alias("partkey"),
        "l_suppkey",
        (F.expr(_EXT_CENTS) * (100 - F.expr(_DISC_PCT))).alias("rev_cp"),
        F.expr(_QTY_UNITS).alias("qty"))
    return (li.join(F.broadcast(part), "partkey")
            .join(orders, "orderkey")
            .join(F.broadcast(supp), "l_suppkey")
            .groupBy("n_name", "o_year")
            .agg(F.sum(F.col("rev_cp")
                       - F.col("retail_cents") * F.col("qty") * 100)
                 .alias("profit_cp")))


ORACLE_TPCH_Q9 = (
    "SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year, "
    f"sum({_EXT_CENTS} * (100 - {_DISC_PCT}) "
    f"- {_RETAIL_CENTS} * {_QTY_UNITS} * 100) AS profit_cp "
    "FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN part ON l_partkey = p_partkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE p_name LIKE '%gear%' "
    "GROUP BY n_name, EXTRACT(year FROM o_orderdate)")


def q_tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 shape (important stock: no partsupp, so the observed
    lineitem volume per part stands in for availqty x supplycost): parts
    whose shipped value through suppliers of nations 0/1 exceeds 0.1% of
    that total. The threshold is the scalar-aggregate crossJoin pattern
    (1-row broadcast side, not a correlated subquery re-scan)."""
    g = tpch_graph(spark, sf_dir)
    supp = (g.tag_df("supplier").filter(F.col("s_nationkey") <= 1)
            .select(F.col(VID).alias("l_suppkey")))
    li = g.edge_df("contains").select(
        F.col(DST).alias("partkey"), "l_suppkey",
        F.expr(_EXT_CENTS).alias("ext_cents"))
    value = (li.join(F.broadcast(supp), "l_suppkey")
             .groupBy("partkey")
             .agg(F.sum("ext_cents").alias("value_cents")))
    total = value.agg(F.sum("value_cents").alias("tot"))
    return (value.crossJoin(F.broadcast(total))
            .filter(F.col("value_cents") * 1000 > F.col("tot"))
            .select("partkey", "value_cents"))


ORACLE_TPCH_Q11 = (
    "WITH v AS (SELECT l_partkey AS partkey, "
    f"sum({_EXT_CENTS}) AS value_cents "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "WHERE s_nationkey <= 1 GROUP BY l_partkey), "
    "t AS (SELECT sum(value_cents) AS tot FROM v) "
    "SELECT partkey, value_cents FROM v, t "
    "WHERE value_cents * 1000 > tot")


def q_tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion: no partsupp availqty,
    so 'dominant supplier' — strictly more than half a part's 1996
    volume — replaces availqty > half the shipped quantity): suppliers
    counted by how many 'small%'-named parts they dominate. The
    decorrelated-subquery chain: per-(part,supp) sums, per-part totals,
    a co-partitioned join on partkey (no re-shuffle: same key), then a
    broadcast supplier-name join."""
    g = tpch_graph(spark, sf_dir)
    part = (g.tag_df("part").filter(F.col("p_name").startswith("small"))
            .select(F.col(VID).alias("partkey")))
    li = (g.edge_df("contains")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
          .select(F.col(DST).alias("partkey"), "l_suppkey",
                  F.expr(_QTY_UNITS).alias("qty")))
    pq = (li.join(F.broadcast(part), "partkey")
          .groupBy("partkey", "l_suppkey").agg(F.sum("qty").alias("qty")))
    pt = pq.groupBy("partkey").agg(F.sum("qty").alias("tot"))
    supp = g.tag_df("supplier").select(F.col(VID).alias("l_suppkey"),
                                       "s_name")
    return (pq.join(pt, "partkey")
            .filter(2 * F.col("qty") > F.col("tot"))
            .join(F.broadcast(supp), "l_suppkey")
            .groupBy(F.col("l_suppkey").alias("s_suppkey"), F.col("s_name"))
            .agg(F.count(F.lit(1)).alias("ndom")))


ORACLE_TPCH_Q20 = (
    "WITH pq AS (SELECT l_partkey AS partkey, l_suppkey, "
    f"sum({_QTY_UNITS}) AS qty "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE p_name LIKE 'small%' "
    "AND l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "GROUP BY l_partkey, l_suppkey), "
    "pt AS (SELECT partkey, sum(qty) AS tot FROM pq GROUP BY partkey) "
    "SELECT l_suppkey AS s_suppkey, s_name, count(*) AS ndom "
    "FROM pq JOIN pt USING (partkey) "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "WHERE 2 * qty > tot GROUP BY l_suppkey, s_name")


# ---------------------------------------------------------------------------
# analytics: harmonic centrality + k-truss edge support
# ---------------------------------------------------------------------------

def q_harmonic_centrality(spark, sf_dir):
    """Harmonic centrality over the 2-hop BFS ball (sum of 1/dist to each
    reachable vertex, x10000 integer DIV): the closeness-family metric
    that stays well-defined on disconnected graphs. Rides the existing
    frontier BFS (operators/go.py bfs_min_hop — per-round anti-join
    against the visited set), so the cost is the BFS itself plus one
    hash aggregate per start."""
    g = tpch_graph(spark, sf_dir)
    from .operators import bfs_min_hop
    bfs = bfs_min_hop(g, _seeds(spark, 20), ["placed", "contains"])
    return (bfs.groupBy("start_vid")
            .agg(F.count(F.lit(1)).alias("n_reached"),
                 F.sum(F.expr("10000 DIV dist")).alias("harmonic_x10000")))


def _oracle_harmonic() -> str:
    from .workload import ORACLE_EXT
    return (f"WITH b AS ({ORACLE_EXT['bfs_distances']}) "
            "SELECT start_vid, count(*) AS n_reached, "
            "sum(10000 // dist) AS harmonic_x10000 FROM b "
            "GROUP BY start_vid")


def q_edge_triangle_support(spark, sf_dir):
    """Per-edge triangle support over the co-order part projection — the
    k-truss building block (edge in k-truss iff support >= k-2). Uses
    the degree-ordered triangle enumeration (skew bound O(sqrt(|E|)))
    with each triangle exploded into its three id-canonical edges."""
    from .operators.analytics import triangle_edge_support
    from .workload import _co_order_pairs
    return triangle_edge_support(_co_order_pairs(spark, sf_dir))


def _oracle_edge_support() -> str:
    from .operators.analytics import triangle_edge_support_oracle_sql
    return triangle_edge_support_oracle_sql(
        "SELECT l1.l_partkey AS src, l2.l_partkey AS dst "
        "FROM lineitem l1 JOIN lineitem l2 "
        "ON l1.l_orderkey = l2.l_orderkey "
        "AND l1.l_partkey < l2.l_partkey")


# ---------------------------------------------------------------------------
# warehouse shapes: GROUPING SETS, SCD2 validity intervals, compaction
# ---------------------------------------------------------------------------

def q_revenue_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS ((region, priority), (region), ()) over
    order value — the reporting lattice between rollup and cube, with
    NULL grouping markers coalesced to '*' so the three levels are
    distinguishable engine-portably. SQL-API entry (the DataFrame API
    has only rollup/cube; grouping sets IS the Spark SQL surface)."""
    g = tpch_graph(spark, sf_dir)
    nation = g.tag_df("nation").select(F.col(VID).alias("nk"),
                                       "n_regionkey")
    region = g.tag_df("region").select(F.col(VID).alias("n_regionkey"),
                                       "r_name")
    cust = (g.tag_df("customer")
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("nk"))
            .join(F.broadcast(region), "n_regionkey")
            .select(F.col(VID).alias("custkey"), "r_name"))
    orders = g.edge_df("placed").select(
        F.col(SRC).alias("custkey"), "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        .alias("cents"))
    joined = orders.join(cust, "custkey")
    joined.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        "SELECT coalesce(r_name, '*') AS r_name, "
        "coalesce(o_orderpriority, '*') AS o_orderpriority, "
        "count(*) AS cnt, sum(cents) AS revenue_cents "
        "FROM _gs_orders "
        "GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), ())")


ORACLE_GROUPING_SETS = (
    "SELECT coalesce(r_name, '*') AS r_name, "
    "coalesce(o_orderpriority, '*') AS o_orderpriority, "
    "count(*) AS cnt, "
    "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) "
    "AS revenue_cents "
    "FROM orders "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), ())")


def q_scd2_history(spark, sf_dir):
    """SCD type-2 history build from the event stream: each event opens a
    validity interval for its (user, event_type) state, closed by the
    user's next event (NULL = current). The lead() window partitions by
    user_id — per-key sort after one shuffle, cluster-safe at any event
    count (no global window)."""
    from pyspark.sql import Window as W
    ev = (load_events(spark, sf_dir)
          .filter(F.col("user_id") < 50)
          .select("user_id", "event_id", "event_type", "ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"))


ORACLE_SCD2 = (
    "SELECT user_id, event_type, ts AS valid_from, "
    "lead(ts) OVER w AS valid_to, "
    "CAST(row_number() OVER w AS BIGINT) AS version "
    "FROM events WHERE user_id < 50 "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)")


def q_store_compaction(spark, sf_dir):
    """Small-file compaction maintenance (admin/CompactTask.h:1-40 is the
    reference's per-part RocksDB compaction trigger): the documents table
    fragmented into 64 tiny files, bin-packed back to 4 range-partitioned
    files by compact_small_files (store_io.py) — write-new-then-swap, the
    source untouched. The query returns the compacted readback, which
    must hash-match the original table: compaction moves bytes, never
    changes rows."""
    from .store_io import compact_small_files
    from .staging import pid_staging_root, sf_tag
    root = pid_staging_root("/tmp/nebula_compact", sf_tag(sf_dir))
    small = f"{root}/docs_small"
    packed = f"{root}/docs_packed"
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    docs.repartition(64).write.mode("overwrite").parquet(small)
    out = compact_small_files(spark, small, packed, "doc_id", 4)
    return out.select("doc_id", "text", "lang", "source", "n_chars")


ORACLE_COMPACTION = (
    "SELECT doc_id, text, lang, source, n_chars FROM documents")


# ---------------------------------------------------------------------------
# retrieval: inverted-index boolean search + integer BM25 ranking
# ---------------------------------------------------------------------------

def q_inverted_index_search(spark, sf_dir):
    """Boolean AND retrieval through an inverted index: distinct
    (token, doc) postings — partitioned by token, the classic inverted
    file — filtered to the query terms, then a doc-side aggregate keeps
    docs matching ALL terms. Two shuffles total (postings build, doc
    regroup); the term filter prunes the postings frame before either.
    At 100 TB the postings frame is the persisted index and the query
    touches only its two term partitions."""
    docs = _docs(spark, sf_dir)
    terms = ["dup", "vector"]
    postings = (docs.select("doc_id",
                            F.explode(F.split("text", " ")).alias("token"))
                .filter(F.col("token").isin(*terms))
                .distinct())
    hits = (postings.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("nterms"))
            .filter(F.col("nterms") == len(terms)))
    return (hits.join(docs.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source"))


ORACLE_INVERTED = (
    "SELECT doc_id, source FROM documents "
    "WHERE list_contains(string_split(text, ' '), 'dup') "
    "AND list_contains(string_split(text, ' '), 'vector')")


def q_bm25_topk(spark, sf_dir):
    """Integer BM25-shaped top-15 ranking for query {dup, spark, merge}:
    idf_x1000 = N*1000 DIV df, length norm = 250 + 750*dl DIV avgdl
    (b=0.75 x1000), per-term score = idf * tf * 2200 DIV (tf*1000 +
    1200*norm DIV 1000) (k1=1.2, k1+1=2.2) — every step integer DIV, so
    the ranking is bit-exact cross-engine (real BM25's floats would
    diverge in the last ulp and flip ties). Plan: tf from the exploded
    token stream (term-filtered BEFORE the shuffle), df/avgdl as
    broadcast scalars, top-15 via TakeOrderedAndProject."""
    docs = _docs(spark, sf_dir)
    terms = ["dup", "spark", "merge"]
    toks = docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("token"))
    tf = (toks.filter(F.col("token").isin(*terms))
          .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")))
    dl = docs.select("doc_id", F.size(F.split("text", " ")).cast("long")
                     .alias("dl"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scal = docs.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        dl.agg(F.sum("dl").alias("sumdl")))
    scored = (tf.join(F.broadcast(df_), "token")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(scal))
              .withColumn("idf_x1000", F.expr("n * 1000 DIV df"))
              .withColumn("norm", F.expr(
                  "250 + (750 * dl) DIV (sumdl DIV n)"))
              .withColumn("term_score", F.expr(
                  "idf_x1000 * tf * 2200 DIV (tf * 1000 + (1200 * norm) DIV 1000)")))
    return (scored.groupBy("doc_id")
            .agg(F.sum("term_score").alias("score"))
            .orderBy(F.desc("score"), "doc_id").limit(15))


ORACLE_BM25 = (
    "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
    "FROM documents), "
    "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks "
    "WHERE token IN ('dup', 'spark', 'merge') GROUP BY doc_id, token), "
    "dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl "
    "FROM documents), "
    "df AS (SELECT token, count(*) AS df FROM tf GROUP BY token), "
    "s AS (SELECT (SELECT count(*) FROM documents) AS n, "
    "(SELECT sum(dl) FROM dl) AS sumdl), "
    "scored AS (SELECT tf.doc_id, "
    "(n * 1000 // df) * tf * 2200 // "
    "(tf * 1000 + (1200 * (250 + (750 * dl) // (sumdl // n))) // 1000) "
    "AS term_score "
    "FROM tf JOIN df USING (token) JOIN dl ON tf.doc_id = dl.doc_id, s) "
    "SELECT doc_id, sum(term_score) AS score FROM scored "
    "GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 15")


def q_ft_index_incremental(spark, sf_dir):
    """RebuildFTIndexTask analog (admin/RebuildFTIndexTask.cpp: rebuild
    the fulltext index from a snapshot, then drain the op-log buffered
    during the scan): the inverted file is a PERSISTED (token, doc_id)
    postings projection bucketed by token hash; the snapshot misses
    every 7th doc; the op-log then adds those docs' postings and deletes
    every 5th doc's postings (delete-after-add wins, reference op-log
    order).  The op-log entry for a delete carries the doc's encoded
    index keys — its tokens — exactly as the reference buffers encoded
    FT keys, so each delta row knows its bucket and the catch-up is ONE
    dynamic-partition-overwrite touching only the token buckets the
    delta hashes to (O(|delta| + touched buckets) at 100 TB, same
    posture as `index_incremental`).  Query: boolean AND retrieval of
    {dup, vector} over the updated index; oracle = the same retrieval
    over the post-op document set (live docs = doc_id % 5 != 0)."""
    from nebula_storage_spark.operators.index_rebuild import (
        apply_index_delta, rebuild_index_bucketed)
    docs = _docs(spark, sf_dir)
    # persisted: the projection feeds the snapshot write, both delta
    # legs, AND the delta's touched-bucket collect — unpersisted, the
    # explode+distinct recomputed per consumer (measured 0.7 s of the
    # ~3.2 s warm rebuild+apply at sf0.1; at 100 TB the snapshot scan
    # must run once, so the persist IS the scale posture)
    postings = (docs.select("doc_id",
                            F.explode(F.split("text", " ")).alias("token"))
                .distinct().select("token", "doc_id").persist())
    # per-process staging root: the index build is an in-place
    # read-modify-write (dynamic partition overwrite), so concurrent
    # drives at the same sf_dir (driver gate + bench + pytest) must not
    # interleave on one directory (staging.pid_staging_root reaps
    # dead-pid siblings so /tmp stays bounded).
    from .staging import pid_staging_root, sf_tag
    path = pid_staging_root("/tmp/nebula_spark_ft_incr", sf_tag(sf_dir))
    rebuild_index_bucketed(
        postings.filter(F.col("doc_id") % 7 != 0), ["token"], path,
        include_cols=["doc_id"])
    adds = postings.filter(F.col("doc_id") % 7 == 0)
    dels = postings.filter(F.col("doc_id") % 5 == 0)
    apply_index_delta(spark, path, adds, dels, ["token"],
                      key_col="doc_id")
    # the returned retrieval plan reads the written index + docs, never
    # the postings lineage — release the cache before handing it back
    postings.unpersist()
    terms = ["dup", "vector"]
    # retrieval reads ONLY the query terms' bucket directories: the
    # term list's bucket ids (same pmod(hash) the layout used) become a
    # partition filter on `_bucket=` — at 100 TB the AND query touches
    # 2 bucket dirs of the postings projection, not the whole index
    # (plan shows PartitionFilters on the parquet scan)
    term_buckets = [r.b for r in spark.createDataFrame(
        [(t,) for t in terms], "token string")
        .select(F.pmod(F.hash("token"), F.lit(8)).alias("b"))
        .distinct().collect()]
    idx = (spark.read.parquet(path)
           .filter(F.col("_bucket").isin(term_buckets)))
    hits = (idx.filter(F.col("token").isin(*terms))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("nterms"))
            .filter(F.col("nterms") == len(terms)))
    return (hits.join(docs.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source"))


ORACLE_FT_INCR = (
    "SELECT doc_id, source FROM documents "
    "WHERE doc_id % 5 <> 0 "
    "AND list_contains(string_split(text, ' '), 'dup') "
    "AND list_contains(string_split(text, ' '), 'vector')")


# ---------------------------------------------------------------------------
# fuzzy (edit-distance) dedup
# ---------------------------------------------------------------------------

def q_dedup_fuzzy(spark, sf_dir):
    """Blocked Levenshtein near-dup pairs: candidates share a block key
    (language, first token, n_chars DIV 200 length bucket), then exact
    edit distance on the 40-char prefix keeps pairs within 12 edits.
    Blocking is what makes fuzzy matching distributable — the quadratic
    verify runs only inside each block's equi-join group (same posture
    as the MinHash band join), never all-pairs; levenshtein() itself is
    JVM codegen, no Python. Recall is bounded by the blocking choice
    (documented, like every blocked dedup here); production blocks on a
    SimHash band instead of the first token for near-total recall."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang",
        F.split("text", " ").getItem(0).alias("tok0"),
        F.expr("n_chars DIV 200").alias("lbucket"),
        F.substring("text", 1, 40).alias("pfx"))
    a = docs.alias("a")
    b = docs.alias("b")
    cand = a.join(b, (F.col("a.lang") == F.col("b.lang"))
                  & (F.col("a.tok0") == F.col("b.tok0"))
                  & (F.col("a.lbucket") == F.col("b.lbucket"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
    return (cand.select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"),
                        F.levenshtein(F.col("a.pfx"), F.col("b.pfx"))
                        .cast("long").alias("dist"))
            .filter(F.col("dist") <= 12))


ORACLE_DEDUP_FUZZY = (
    "WITH d AS (SELECT doc_id, lang, "
    "string_split(text, ' ')[1] AS tok0, "
    "n_chars // 200 AS lbucket, "
    "substr(text, 1, 40) AS pfx FROM documents) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist "
    "FROM d a JOIN d b ON a.lang = b.lang AND a.tok0 = b.tok0 "
    "AND a.lbucket = b.lbucket AND a.doc_id < b.doc_id "
    "WHERE levenshtein(a.pfx, b.pfx) <= 12")


# ---------------------------------------------------------------------------
# streaming: stream-static enrichment
# ---------------------------------------------------------------------------

def q_stream_enrich(spark, sf_dir):
    """Stream-static broadcast enrichment + watermarked hourly counts per
    market segment; AvailableNow drains the snapshot so the result
    equals the batch join (the oracle)."""
    from .streaming.window import stream_events_enriched
    return stream_events_enriched(spark, sf_dir)


ORACLE_STREAM_ENRICH = (
    "SELECT date_trunc('hour', ts) AS hour, c_mktsegment, count(*) AS cnt "
    "FROM events JOIN customer ON user_id = c_custkey "
    "GROUP BY date_trunc('hour', ts), c_mktsegment")




# ---------------------------------------------------------------------------
# timeseries: forward fill, rolling window, anomaly score
# ---------------------------------------------------------------------------

def q_events_fill_forward(spark, sf_dir):
    """Forward-fill (last-observation-carried-forward): each event row
    annotated with the user's most recent purchase amount so far — the
    gap-fill primitive for sparse sensors/facts. last(ignorenulls) over
    a per-user ROWS frame: one shuffle on user_id, per-key sort,
    cluster-safe at any history length. Single-column fill, so the
    torn-attachment hazard of multi-column LOCF (fixed in asof.py by
    filling one struct) does not arise."""
    from pyspark.sql import Window as W
    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 80)
    cents = F.when(
        F.col("event_type") == "purchase",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return ev.select(
        "user_id", "event_id",
        F.last(cents, ignorenulls=True).over(w)
        .alias("last_purchase_cents"))


ORACLE_FILL_FORWARD = (
    "SELECT user_id, event_id, "
    "last_value(CASE WHEN event_type = 'purchase' THEN "
    "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END IGNORE NULLS) "
    "OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "AS last_purchase_cents "
    "FROM events WHERE user_id < 80")


def q_events_rolling_avg(spark, sf_dir):
    """Trailing 1-hour rolling mean per user: RANGE frame over epoch
    seconds (peers at the same second are in-frame in both engines, so
    ties cannot flip the result), truncating integer-cent mean. The
    event-time range window is the timeseries-smoothing primitive;
    partitioned by user, so no global sort at any scale."""
    from pyspark.sql import Window as W
    ev = (load_events(spark, sf_dir).filter(F.col("user_id") < 80)
          .select("user_id", "event_id",
                  F.unix_timestamp("ts").alias("sec"),
                  (F.col("value").cast("decimal(18,2)") * 100)
                  .cast("bigint").alias("cents")))
    w = W.partitionBy("user_id").orderBy("sec").rangeBetween(-3599, 0)
    return ev.select(
        "user_id", "event_id",
        F.count(F.lit(1)).over(w).alias("cnt_1h"),
        (F.sum("cents").over(w) / F.count(F.lit(1)).over(w))
        .cast("bigint").alias("avg_cents_1h"))


ORACLE_ROLLING_AVG = (
    "SELECT user_id, event_id, count(*) OVER w AS cnt_1h, "
    "sum(cents) OVER w // count(*) OVER w AS avg_cents_1h FROM ("
    "SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, "
    "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
    "FROM events WHERE user_id < 80) "
    "WINDOW w AS (PARTITION BY user_id ORDER BY sec "
    "RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)")


def q_events_anomaly_zscore(spark, sf_dir):
    """Hourly-count anomaly score per event type: z = (cnt - mean)/std
    over the type's hourly distribution, computed from exact integer
    (n, sum, sum-of-squares) with ONE final IEEE expression (the
    stats_variance / assortativity determinism pattern) and a zero-
    variance guard (NULL, not NaN — the cross-engine-safe encoding).
    Two hash aggregates + a broadcast join of the per-type stats row;
    no window over the raw event stream."""
    ev = load_events(spark, sf_dir)
    hourly = (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                         "event_type")
              .agg(F.count(F.lit(1)).alias("cnt")))
    stats = (hourly.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("cnt").alias("s1"),
                  F.sum(F.col("cnt") * F.col("cnt")).alias("s2")))
    return (hourly.join(F.broadcast(stats), "event_type")
            .select("hour", "event_type", "cnt",
                    F.expr(
                        "CASE WHEN n * s2 - s1 * s1 = 0 THEN NULL ELSE "
                        "round((cnt * n - s1) / "
                        "sqrt(CAST(n AS DOUBLE) * "
                        "CAST(n * s2 - s1 * s1 AS DOUBLE)), 4) END")
                    .alias("z")))


ORACLE_ANOMALY_Z = (
    "WITH hourly AS (SELECT date_trunc('hour', ts) AS hour, event_type, "
    "count(*) AS cnt FROM events GROUP BY 1, 2), "
    "stats AS (SELECT event_type, count(*) AS n, sum(cnt) AS s1, "
    "sum(cnt * cnt) AS s2 FROM hourly GROUP BY event_type) "
    "SELECT hour, hourly.event_type, cnt, "
    "CASE WHEN n * s2 - s1 * s1 = 0 THEN NULL ELSE "
    "round((cnt * n - s1) / "
    "sqrt(CAST(n AS DOUBLE) * CAST(n * s2 - s1 * s1 AS DOUBLE)), 4) END "
    "AS z FROM hourly JOIN stats ON hourly.event_type = stats.event_type")


# ---------------------------------------------------------------------------
# corpus curation: temperature mixture sampling + chunk-level dedup
# ---------------------------------------------------------------------------

def q_doc_mixture_sample(spark, sf_dir):
    """Temperature-reweighted source mixture (the multi-corpus training
    mix: weight each source by count^0.5 so small sources are
    up-sampled relative to their share): per-source targets are
    (floor(sqrt(cnt)) * 200) DIV sum-of-weights, picked docs are the
    target-many smallest md5 priorities per source. isqrt of an exact
    integer is IEEE-identical cross-engine; selection is a per-source
    window (partitioned — never global), and because every per-source
    target is bounded by the 200-doc total, a CONSTANT rank<=200
    pre-filter runs first: Spark executes that as WindowGroupLimit
    (map-side partial top-k per source), so a billion-doc source never
    feeds more than 200 rows per partition into the full sort — the
    variable-target filter then trims the survivors."""
    from pyspark.sql import Window as W
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    w_s = (docs.groupBy("source")
           .agg(F.count(F.lit(1)).alias("cnt"))
           .select("source",
                   F.floor(F.sqrt(F.col("cnt").cast("double")))
                   .cast("long").alias("wgt")))
    tot = w_s.agg(F.sum("wgt").alias("tot"))
    target = (w_s.crossJoin(F.broadcast(tot))
              .select("source", F.expr("(wgt * 200) DIV tot")
                      .alias("target")))
    rn = F.row_number().over(
        W.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (docs.withColumn("rn", rn)
            .filter(F.col("rn") <= 200)         # constant → WindowGroupLimit
            .join(F.broadcast(target), "source")
            .filter(F.col("rn") <= F.col("target"))
            .select("doc_id", "source"))


ORACLE_MIXTURE = (
    "WITH w AS (SELECT source, "
    "CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS wgt "
    "FROM documents GROUP BY source), "
    "t AS (SELECT sum(wgt) AS tot FROM w), "
    "tgt AS (SELECT source, (wgt * 200) // tot AS target FROM w, t), "
    "r AS (SELECT doc_id, source, row_number() OVER ("
    "PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) "
    "AS rn FROM documents) "
    "SELECT doc_id, r.source FROM r JOIN tgt ON r.source = tgt.source "
    "WHERE rn <= target")


def q_dedup_chunk_exact(spark, sf_dir):
    """Chunk-level exact dedup (the sub-document pass between whole-doc
    exact dedup and shingle near-dup): non-overlapping 5-token chunks,
    md5-hashed, keep hashes seen in more than one document. The chunk
    stream is O(total tokens / 5) rows shuffled once on the hash — the
    boilerplate/licence-block detector at corpus scale."""
    docs = _docs(spark, sf_dir)
    chunks = docs.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(0, (size(split(text, ' ')) + 4) DIV 5 - 1), "
            "i -> array_join(slice(split(text, ' '), i * 5 + 1, 5), ' '))"))
        .alias("chunk"))
    return (chunks.groupBy(F.md5(F.col("chunk")).alias("chunk_hash"))
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") > 1))


ORACLE_CHUNK_DEDUP = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
    "FROM documents), "
    "c AS (SELECT doc_id, "
    "array_to_string(toks[i * 5 + 1 : i * 5 + 5], ' ') AS chunk "
    "FROM t, LATERAL (SELECT unnest(range(0, (len(toks) + 4) // 5)) AS i)) "
    "SELECT md5(chunk) AS chunk_hash, count(DISTINCT doc_id) AS n_docs "
    "FROM c GROUP BY md5(chunk) HAVING count(DISTINCT doc_id) > 1")




# ---------------------------------------------------------------------------
# snapshot diff, exact set-similarity join, min_by/max_by surface
# ---------------------------------------------------------------------------

def q_store_snapshot_diff(spark, sf_dir):
    """Time travel between snapshots: mutate -> save -> checkpoint v1 ->
    destructive second mutation (drop most nations, rename one, add one)
    -> snapshot_diff(restore(v1), live) classifies every divergence as
    added / deleted / changed (store_io.snapshot_diff: one full-outer
    join on the key, null-safe compares). The read-side complement of
    the BR lifecycle gated by store_checkpoint."""
    import shutil
    from .graph import GraphStore
    from .store_io import (create_checkpoint, load_store,
                           restore_checkpoint, save_store, snapshot_diff)
    g = tpch_graph(spark, sf_dir)
    from .staging import pid_staging_root, sf_tag
    root = pid_staging_root("/tmp/nebula_spark_ckpt_diff", sf_tag(sf_dir))
    shutil.rmtree(root, ignore_errors=True)
    # state v1: even-keyed nations tagged #M1
    sub = GraphStore(catalog=g.catalog)
    m1 = g.vertices["nation"].withColumn(
        "n_name", F.when(F.col(VID) % 2 == 0,
                         F.concat(F.col("n_name"), F.lit("#M1")))
        .otherwise(F.col("n_name")))
    sub.add_vertices_df("nation", m1)
    sub.add_vertices_df("region", g.vertices["region"])
    sub.edges["nation_region"] = g.edges["nation_region"]
    save_store(sub, root, num_partitions=4)
    create_checkpoint(root, "v1")
    # live: keep vids < 5 (rename vid 1), add a brand-new vid 99
    live = load_store(spark, root, resident=False)
    kept = (live.vertices["nation"].filter(F.col(VID) < 5)
            .withColumn("n_name",
                        F.when(F.col(VID) == 1,
                               F.concat(F.col("n_name"), F.lit("#M2")))
                        .otherwise(F.col("n_name"))))
    novel = (kept.filter(F.col(VID) == 0)
             .select(F.lit(99).cast(kept.schema[VID].dataType).alias(VID),
                     F.lit("NEW_NATION").alias("n_name"),
                     *[F.col(c) for c in kept.columns
                       if c not in (VID, "n_name")]))
    live.vertices["nation"] = kept.unionByName(novel)
    save_store(live, root, num_partitions=4)
    old = restore_checkpoint(spark, root, "v1",
                             resident=False).tag_df("nation")
    new = load_store(spark, root, resident=False).tag_df("nation")
    return snapshot_diff(old, new, VID, ["n_name"])


ORACLE_SNAPSHOT_DIFF = (
    "WITH v1 AS (SELECT n_nationkey AS _vid, "
    "CASE WHEN n_nationkey % 2 = 0 THEN n_name || '#M1' ELSE n_name END "
    "AS name FROM nation), "
    "live AS (SELECT _vid, CASE WHEN _vid = 1 THEN name || '#M2' "
    "ELSE name END AS name FROM v1 WHERE _vid < 5 "
    "UNION ALL SELECT 99, 'NEW_NATION') "
    "SELECT coalesce(v1._vid, live._vid) AS _vid, "
    "CASE WHEN v1._vid IS NULL THEN 'added' "
    "WHEN live._vid IS NULL THEN 'deleted' ELSE 'changed' END AS change, "
    "v1.name AS old_n_name, live.name AS new_n_name "
    "FROM v1 FULL OUTER JOIN live ON v1._vid = live._vid "
    "WHERE v1._vid IS NULL OR live._vid IS NULL OR v1.name <> live.name")


def q_dedup_setsim_prefix(spark, sf_dir):
    """EXACT set-similarity self-join via prefix filtering (AllPairs/
    PPJoin candidate pruning): docs as distinct token sets, tokens
    totally ordered by (document-frequency, token); a pair with Jaccard
    >= 0.6 MUST share one of each side's first n - ceil(0.6 n) + 1
    tokens in that order, so candidates come from an equi-join on
    prefix tokens only — provably lossless (unlike MinHash's
    probabilistic recall) yet never all-pairs. Verification counts the
    real intersection and keeps 100*|a∩b| >= 60*|a∪b|; the rarest-first
    order makes prefixes land on low-df tokens, which is what keeps the
    candidate join groups small on a real (Zipfian) vocabulary.
    Output: (doc_a, doc_b, j_x100) — truncating integer Jaccard."""
    from .pipeline.dedup import setsim_prefix_join
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id",
                      F.explode(F.split("text", " ")).alias("t"))
    return setsim_prefix_join(tok, threshold_pct=60)


ORACLE_SETSIM = (
    "WITH tok AS (SELECT DISTINCT doc_id, "
    "unnest(string_split(text, ' ')) AS t FROM documents), "
    "n AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
    "FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2) "
    "SELECT doc_a, doc_b, (100 * i) // (na.n + nb.n - i) AS j_x100 "
    "FROM inter JOIN n na ON doc_a = na.doc_id "
    "JOIN n nb ON doc_b = nb.doc_id "
    "WHERE 100 * i >= 60 * (na.n + nb.n - i)")


def q_events_last_state(spark, sf_dir):
    """Per-user latest/earliest state via max_by/min_by (the argmax
    aggregate family — one hash aggregate, NO window, NO join-back: the
    per-key-latest pattern that replaces row_number()-rank-1 at scale).
    The ordering key is a zero-padded (epoch, event_id) string — total,
    unique, and compared identically by both engines."""
    ev = load_events(spark, sf_dir)
    key = F.concat(
        F.lpad(F.unix_timestamp("ts").cast("string"), 12, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"))
    return (ev.withColumn("k", key)
            .groupBy("user_id")
            .agg(F.expr("max_by(event_type, k)").alias("last_type"),
                 F.expr("min_by(event_type, k)").alias("first_type"),
                 F.count(F.lit(1)).alias("n_events")))


ORACLE_LAST_STATE = (
    "SELECT user_id, "
    "arg_max(event_type, lpad(CAST(CAST(floor(epoch(ts)) AS BIGINT) "
    "AS VARCHAR), 12, '0') || lpad(CAST(event_id AS VARCHAR), 10, '0')) "
    "AS last_type, "
    "arg_min(event_type, lpad(CAST(CAST(floor(epoch(ts)) AS BIGINT) "
    "AS VARCHAR), 12, '0') || lpad(CAST(event_id AS VARCHAR), 10, '0')) "
    "AS first_type, count(*) AS n_events "
    "FROM events GROUP BY user_id")




def q_k_truss_edges(spark, sf_dir):
    """Iterative k-truss (k=4, 2 peel rounds) over the co-order part
    projection: rounds of per-edge support recount + filter — the
    cohesive-subgraph operator one level up from edge_triangle_support
    (analytics.k_truss_fixed; oracle unrolls the same rounds)."""
    from .operators.analytics import k_truss_fixed
    from .workload import _co_order_pairs
    return k_truss_fixed(_co_order_pairs(spark, sf_dir), k=4, rounds=2)


def _oracle_k_truss() -> str:
    from .operators.analytics import k_truss_oracle_sql
    return k_truss_oracle_sql(
        "SELECT l1.l_partkey AS src, l2.l_partkey AS dst "
        "FROM lineitem l1 JOIN lineitem l2 "
        "ON l1.l_orderkey = l2.l_orderkey "
        "AND l1.l_partkey < l2.l_partkey", k=4, rounds=2)




def q_events_pivot(spark, sf_dir):
    """PIVOT with an explicit value list (groupBy().pivot(values) — the
    reshape surface; giving Spark the values up front keeps it one pass,
    no distinct-collect planning step): per-user event-type counts as
    columns. One hash aggregate; absent combos are 0, not NULL."""
    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 100)
    types = ["view", "click", "purchase", "signup", "error"]
    piv = (ev.groupBy("user_id")
           .pivot("event_type", types)
           .agg(F.count(F.lit(1)))
           .na.fill(0, types))
    return piv.select("user_id",
                      *[F.col(t).alias(f"n_{t}") for t in types])


ORACLE_PIVOT = (
    "SELECT user_id, "
    "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view, "
    "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click, "
    "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
    "AS n_purchase, "
    "sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup, "
    "sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error "
    "FROM events WHERE user_id < 100 GROUP BY user_id")


def q_source_logs_parse(spark, sf_dir):
    """Text-log ingestion (the unstructured entry of the sources family,
    next to csv/json/orc): events serialized one log line per row,
    read back with spark.read.text, fields re-extracted with
    regexp_extract (JVM codegen — the standard raw-log landing-zone
    pattern), then aggregated. The aggregate must match the original
    table exactly — proving the parse is lossless."""
    ev = load_events(spark, sf_dir)
    from .staging import pid_staging_root, sf_tag
    log_dir = (pid_staging_root("/tmp/nebula_logs", sf_tag(sf_dir))
               + "/events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    lines = ev.select(F.concat(
        F.lit("ts="), F.unix_timestamp("ts").cast("string"),
        F.lit(" user="), F.col("user_id").cast("string"),
        F.lit(" type="), F.col("event_type"),
        F.lit(" cents="), cents.cast("string")).alias("value"))
    lines.write.mode("overwrite").text(log_dir)
    raw = spark.read.text(log_dir)
    parsed = raw.select(
        F.regexp_extract("value", r" type=(\w+) ", 1).alias("event_type"),
        F.regexp_extract("value", r" cents=(-?\d+)$", 1).cast("bigint")
        .alias("cents"))
    return (parsed.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("cents").alias("sum_cents")))


ORACLE_LOGS_PARSE = (
    "SELECT event_type, count(*) AS cnt, "
    "sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sum_cents "
    "FROM events GROUP BY event_type")




def q_weighted_pagerank(spark, sf_dir):
    """Weighted PageRank (rank distributes proportionally to edge
    weight — the importance metric for weighted interaction graphs)
    over the directed customer→order→part layered graph: placed edges
    weigh 1, contains edges weigh l_quantity (integral, so the
    rank·w DIV Σw arithmetic is bit-exact vs the unrolled oracle).
    Same layer offsets as sssp_distances."""
    from .operators.analytics import weighted_pagerank_fixed
    g = tpch_graph(spark, sf_dir)
    placed = g.edge_df("placed").select(
        F.col(SRC).alias(SRC), (F.col(DST) + 10_000_000).alias(DST),
        F.lit(1).cast("long").alias("w"))
    contains = g.edge_df("contains").select(
        (F.col(SRC) + 10_000_000).alias(SRC),
        (F.col(DST) + 20_000_000).alias(DST),
        F.col("l_quantity").cast("long").alias("w"))
    return weighted_pagerank_fixed(placed.unionByName(contains),
                                   iterations=4)


def _oracle_weighted_pagerank() -> str:
    from .operators.analytics import weighted_pagerank_oracle_sql
    return weighted_pagerank_oracle_sql(
        "SELECT o_custkey AS src, o_orderkey + 10000000 AS dst, 1 AS w "
        "FROM orders UNION ALL "
        "SELECT l_orderkey + 10000000 AS src, l_partkey + 20000000 AS dst, "
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS w "
        "FROM lineitem", iterations=4)




def q_hits_scores(spark, sf_dir):
    """HITS hubs & authorities (integer fixed-point, max-normalized per
    round — analytics.hits_fixed) over the customer→order graph: high-
    hub customers place many well-cited orders, orders inherit authority
    from strong hubs. 3 exact iterations gated by the unrolled oracle;
    the companion ranking metric to (weighted) PageRank."""
    from .operators.analytics import hits_fixed
    g = tpch_graph(spark, sf_dir)
    edges = g.edge_df("placed").select(
        F.col(SRC).alias(SRC), (F.col(DST) + 10_000_000).alias(DST))
    return hits_fixed(edges, iterations=3)


def _oracle_hits() -> str:
    from .operators.analytics import hits_oracle_sql
    return hits_oracle_sql(
        "SELECT o_custkey AS src, o_orderkey + 10000000 AS dst "
        "FROM orders", iterations=3)


def q_dq_checks(spark, sf_dir):
    """Data-quality audit (the constraint layer a 100 TB ingest needs in
    front of it): five declarative checks — FK orphans both directions
    (left-anti joins), primary-key duplicates, domain violations,
    nullability — each one aggregate/anti-join, reported as
    (check_name, violations). At scale each check is one co-partitioned
    anti-join or a map-side conditional count; zero violations here is
    itself the assertion the synthetic data satisfies its own schema."""
    g = tpch_graph(spark, sf_dir)
    orders = g.edge_df("placed")
    li = g.edge_df("contains")
    cust = g.tag_df("customer").select(F.col(VID).alias("custkey"))
    checks = []

    def one(name, df):
        checks.append(df.agg(F.count(F.lit(1)).cast("long")
                             .alias("violations"))
                      .select(F.lit(name).alias("check_name"),
                              "violations"))

    one("lineitem_fk_orphan",
        li.join(orders.select(F.col(DST).alias(SRC)), SRC, "left_anti"))
    one("orders_fk_orphan",
        orders.join(cust, orders[SRC] == cust["custkey"], "left_anti"))
    one("orders_pk_dup",
        orders.groupBy(DST).agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1))
    one("lineitem_nonpositive_price",
        li.filter(F.col("l_extendedprice") <= 0))
    one("lineitem_null_shipdate",
        li.filter(F.col("l_shipdate").isNull()))
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


ORACLE_DQ = (
    "SELECT 'lineitem_fk_orphan' AS check_name, count(*) AS violations "
    "FROM lineitem WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_orderkey = l_orderkey) "
    "UNION ALL SELECT 'orders_fk_orphan', count(*) FROM orders "
    "WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey) "
    "UNION ALL SELECT 'orders_pk_dup', count(*) FROM ("
    "SELECT o_orderkey FROM orders GROUP BY o_orderkey "
    "HAVING count(*) > 1) "
    "UNION ALL SELECT 'lineitem_nonpositive_price', count(*) "
    "FROM lineitem WHERE l_extendedprice <= 0 "
    "UNION ALL SELECT 'lineitem_null_shipdate', count(*) "
    "FROM lineitem WHERE l_shipdate IS NULL")




def q_events_m4_downsample(spark, sf_dir):
    """M4 downsampling (the visualization-correct time-series reduction:
    per pixel-bucket keep min, max, first, last — the four values any
    line rendering of the bucket can need): 200 buckets over the event
    stream per type. Bucket edges come from the global [min,max] time
    span as a 1-row broadcast scalar; first/last use min_by/max_by over
    the zero-padded (epoch, event_id) total-order key, so ties cannot
    flip the result. One scalar agg + one hash aggregate — reduces any
    event count to 200·|types| rows."""
    ev = (load_events(spark, sf_dir)
          .select("event_type", "event_id",
                  F.unix_timestamp("ts").alias("sec"),
                  (F.col("value").cast("decimal(18,2)") * 100)
                  .cast("bigint").alias("cents")))
    span = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    key = F.concat(F.lpad(F.col("sec").cast("string"), 12, "0"),
                   F.lpad(F.col("event_id").cast("string"), 10, "0"))
    return (ev.crossJoin(F.broadcast(span))
            .withColumn("bucket",
                        F.expr("(sec - lo) * 200 DIV (hi - lo + 1)"))
            .withColumn("k", key)
            .groupBy("event_type", "bucket")
            .agg(F.min("cents").alias("vmin"),
                 F.max("cents").alias("vmax"),
                 F.expr("min_by(cents, k)").alias("vfirst"),
                 F.expr("max_by(cents, k)").alias("vlast"),
                 F.count(F.lit(1)).alias("n")))


ORACLE_M4 = (
    "WITH ev AS (SELECT event_type, event_id, "
    "CAST(floor(epoch(ts)) AS BIGINT) AS sec, "
    "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
    "FROM events), "
    "span AS (SELECT min(sec) AS lo, max(sec) AS hi FROM ev), "
    "b AS (SELECT event_type, "
    "(sec - lo) * 200 // (hi - lo + 1) AS bucket, cents, "
    "lpad(CAST(sec AS VARCHAR), 12, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 10, '0') AS k "
    "FROM ev, span) "
    "SELECT event_type, bucket, min(cents) AS vmin, max(cents) AS vmax, "
    "arg_min(cents, k) AS vfirst, arg_max(cents, k) AS vlast, "
    "count(*) AS n FROM b GROUP BY event_type, bucket")


EXT3_QUERIES = {
    "tpch_q9_shape": q_tpch_q9_shape,
    "tpch_q11_shape": q_tpch_q11_shape,
    "tpch_q20_shape": q_tpch_q20_shape,
    "harmonic_centrality": q_harmonic_centrality,
    "edge_triangle_support": q_edge_triangle_support,
    "revenue_grouping_sets": q_revenue_grouping_sets,
    "scd2_history": q_scd2_history,
    "store_compaction": q_store_compaction,
    "inverted_index_search": q_inverted_index_search,
    "ft_index_incremental": q_ft_index_incremental,
    "bm25_topk": q_bm25_topk,
    "dedup_fuzzy": q_dedup_fuzzy,
    "stream_enrich": q_stream_enrich,
    "events_fill_forward": q_events_fill_forward,
    "events_rolling_avg": q_events_rolling_avg,
    "events_anomaly_zscore": q_events_anomaly_zscore,
    "doc_mixture_sample": q_doc_mixture_sample,
    "dedup_chunk_exact": q_dedup_chunk_exact,
    "store_snapshot_diff": q_store_snapshot_diff,
    "dedup_setsim_prefix": q_dedup_setsim_prefix,
    "events_last_state": q_events_last_state,
    "k_truss_edges": q_k_truss_edges,
    "events_pivot": q_events_pivot,
    "source_logs_parse": q_source_logs_parse,
    "weighted_pagerank": q_weighted_pagerank,
    "hits_scores": q_hits_scores,
    "dq_checks": q_dq_checks,
    "events_m4_downsample": q_events_m4_downsample,
}


def build_ext3_oracles() -> dict[str, str]:
    return {
        "tpch_q9_shape": ORACLE_TPCH_Q9,
        "tpch_q11_shape": ORACLE_TPCH_Q11,
        "tpch_q20_shape": ORACLE_TPCH_Q20,
        "harmonic_centrality": _oracle_harmonic(),
        "edge_triangle_support": _oracle_edge_support(),
        "revenue_grouping_sets": ORACLE_GROUPING_SETS,
        "scd2_history": ORACLE_SCD2,
        "store_compaction": ORACLE_COMPACTION,
        "inverted_index_search": ORACLE_INVERTED,
        "ft_index_incremental": ORACLE_FT_INCR,
        "bm25_topk": ORACLE_BM25,
        "dedup_fuzzy": ORACLE_DEDUP_FUZZY,
        "stream_enrich": ORACLE_STREAM_ENRICH,
        "events_fill_forward": ORACLE_FILL_FORWARD,
        "events_rolling_avg": ORACLE_ROLLING_AVG,
        "events_anomaly_zscore": ORACLE_ANOMALY_Z,
        "doc_mixture_sample": ORACLE_MIXTURE,
        "dedup_chunk_exact": ORACLE_CHUNK_DEDUP,
        "store_snapshot_diff": ORACLE_SNAPSHOT_DIFF,
        "dedup_setsim_prefix": ORACLE_SETSIM,
        "events_last_state": ORACLE_LAST_STATE,
        "k_truss_edges": _oracle_k_truss(),
        "events_pivot": ORACLE_PIVOT,
        "source_logs_parse": ORACLE_LOGS_PARSE,
        "weighted_pagerank": _oracle_weighted_pagerank(),
        "hits_scores": _oracle_hits(),
        "dq_checks": ORACLE_DQ,
        "events_m4_downsample": ORACLE_M4,
    }
