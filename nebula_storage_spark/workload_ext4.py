"""Round-3 session-3 query extensions: second-order (node2vec) walks,
closeness/modularity analytics, bigram-LM scoring, market-basket lift,
distribution drift, Pareto skyline, and robust (MAD) outliers.

Same determinism contract as workload.py / workload_ext.py: exact
integer cents / fixed-point DIV arithmetic everywhere, md5-PRF for any
"random" choice, at most one final rounded IEEE expression — so every
query is bit-exact against the DuckDB oracle at any partitioning.

Reference anchors: these extend the analytics/pipeline families beyond
the reference's storage surface (nebula-storage has no walk/skyline/LM
surface; its AggregateNode and index scans are cited per-query where a
shape is parity-relevant, e.g. storage/exec/AggregateNode.h for the
grouped-aggregate shapes).
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W, functions as F
from .cache import pin as _pin

from .graph import DST, SRC, VID, load_events, tpch_graph
from .workload import _co_order_pairs, _seeds

_EV_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
_RETAIL_CENTS = "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _docs(spark, sf_dir):
    from .workload_pipeline import _docs as d
    return d(spark, sf_dir)


# ---------------------------------------------------------------------------
# closeness centrality (rides the harmonic BFS ball)
# ---------------------------------------------------------------------------

def q_closeness_centrality(spark, sf_dir):
    """Closeness centrality over the 2-hop BFS ball: n_reached, total
    hop distance, and the Wasserman-Faust-style closeness ratio
    (n_reached x10000 DIV total_dist) per start. Same frontier BFS as
    bfs_distances/harmonic_centrality (per-round anti-join against the
    visited set), one extra hash aggregate — integer throughout."""
    from .operators import bfs_min_hop
    g = tpch_graph(spark, sf_dir)
    bfs = bfs_min_hop(g, _seeds(spark, 20), ["placed", "contains"])
    return (bfs.groupBy("start_vid")
            .agg(F.count(F.lit(1)).alias("n_reached"),
                 F.sum("dist").alias("total_dist"))
            .select("start_vid", "n_reached", "total_dist",
                    F.expr("(n_reached * 10000) DIV total_dist")
                    .alias("closeness_x10000")))


def _oracle_closeness() -> str:
    from .workload import ORACLE_EXT
    return (f"WITH b AS ({ORACLE_EXT['bfs_distances']}) "
            "SELECT start_vid, count(*) AS n_reached, "
            "sum(dist) AS total_dist, "
            "(count(*) * 10000) // sum(dist) AS closeness_x10000 "
            "FROM b GROUP BY start_vid")


# ---------------------------------------------------------------------------
# modularity of a community assignment (communities = part brand)
# ---------------------------------------------------------------------------

def q_modularity_brands(spark, sf_dir):
    """Newman modularity decomposition of the co-order part projection
    under the brand partition (community(p) = p_brand): per community,
    intra-community edge count e_c, degree sum d_c, and the exact
    integer modularity contribution 4m*e_c - d_c^2 (so Q = sum(contrib)
    / (4m^2) — numerator/denominator kept integer, no negative DIV,
    since Spark DIV truncates toward zero while DuckDB // floors).
    Plan: the pair expansion is the one shuffle; brands attach via two
    broadcast joins of the part dim; three hash aggregates."""
    g = tpch_graph(spark, sf_dir)
    brand = g.vertices["part"].select(F.col(VID).alias("pk"),
                                      F.col("p_brand").alias("community"))
    pairs = _co_order_pairs(spark, sf_dir)
    lab = (pairs
           .join(F.broadcast(brand.withColumnsRenamed(
               {"pk": SRC, "community": "c1"})), SRC)
           .join(F.broadcast(brand.withColumnsRenamed(
               {"pk": DST, "community": "c2"})), DST))
    m = lab.agg(F.count(F.lit(1)).alias("m"))
    intra = (lab.filter(F.col("c1") == F.col("c2"))
             .groupBy(F.col("c1").alias("community"))
             .agg(F.count(F.lit(1)).alias("intra_edges")))
    deg = (lab.select(F.col("c1").alias("community"))
           .unionAll(lab.select(F.col("c2").alias("community")))
           .groupBy("community").agg(F.count(F.lit(1)).alias("degree_sum")))
    return (deg.join(intra, "community", "left")
            .select("community",
                    F.coalesce("intra_edges", F.lit(0)).alias("intra_edges"),
                    "degree_sum")
            .crossJoin(F.broadcast(m))
            .select("community", "intra_edges", "degree_sum", "m",
                    F.expr("4 * m * intra_edges - degree_sum * degree_sum")
                    .alias("contrib_x4m2")))


_ORACLE_CO_PAIRS = (
    "SELECT l1.l_partkey AS src, l2.l_partkey AS dst "
    "FROM lineitem l1 JOIN lineitem l2 "
    "ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey")

ORACLE_MODULARITY = (
    f"WITH pairs AS ({_ORACLE_CO_PAIRS}), "
    "lab AS (SELECT b1.p_brand AS c1, b2.p_brand AS c2 FROM pairs "
    "JOIN part b1 ON b1.p_partkey = pairs.src "
    "JOIN part b2 ON b2.p_partkey = pairs.dst), "
    "m AS (SELECT count(*) AS m FROM lab), "
    "intra AS (SELECT c1 AS community, count(*) AS intra_edges "
    "FROM lab WHERE c1 = c2 GROUP BY c1), "
    "deg AS (SELECT community, count(*) AS degree_sum FROM "
    "(SELECT c1 AS community FROM lab "
    "UNION ALL SELECT c2 FROM lab) GROUP BY community) "
    "SELECT d.community, coalesce(i.intra_edges, 0) AS intra_edges, "
    "d.degree_sum, m.m, "
    "4 * m.m * coalesce(i.intra_edges, 0) "
    "- d.degree_sum * d.degree_sum AS contrib_x4m2 "
    "FROM deg d LEFT JOIN intra i ON i.community = d.community CROSS JOIN m")


# ---------------------------------------------------------------------------
# bigram LM rarity (conditional-probability surrogate, integer)
# ---------------------------------------------------------------------------

def q_bigram_lm_rarity(spark, sf_dir):
    """Bigram-LM quality signal, integer surrogate for perplexity:
    rarity(prev, cur) = count(prev as bigram prefix) DIV count(prev,
    cur) — the truncated inverse of the conditional probability
    P(cur|prev) — and doc score = mean bigram rarity. Extends
    doc_rarity_score (unigram) to the conditional model; no float log,
    so bit-exact cross-engine. Plan: bigrams expand inside codegen via
    a higher-order transform over the token array (no positional
    self-join), one vocabulary aggregate, one re-join."""
    bigrams = (_docs(spark, sf_dir)
               .select("doc_id", F.split("text", " ").alias("l"))
               .select("doc_id", F.explode(F.expr(
                   "transform(sequence(2, size(l)), "
                   "i -> struct(element_at(l, i - 1) AS p, "
                   "element_at(l, i) AS c))")).alias("bg"))
               .select("doc_id", F.col("bg.p").alias("p"),
                       F.col("bg.c").alias("c")))
    c2 = (bigrams.groupBy("p", "c").agg(F.count(F.lit(1)).alias("c2")))
    c1 = c2.groupBy("p").agg(F.sum("c2").alias("c1"))
    rarity = c2.join(c1, "p").select(
        "p", "c", F.expr("c1 DIV c2").alias("rarity"))
    return (bigrams.join(rarity, ["p", "c"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.expr("sum(rarity) DIV count(*)").alias("bigram_rarity")))


ORACLE_BIGRAM_LM = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS l "
    "FROM documents), "
    "bg AS (SELECT doc_id, unnest(list_transform(range(2, len(l) + 1), "
    "i -> struct_pack(p := l[i-1], c := l[i]))) AS b FROM t), "
    "b2 AS (SELECT doc_id, b.p AS p, b.c AS c FROM bg), "
    "c2 AS (SELECT p, c, count(*) AS c2 FROM b2 GROUP BY p, c), "
    "c1 AS (SELECT p, sum(c2) AS c1 FROM c2 GROUP BY p), "
    "r AS (SELECT c2.p, c2.c, c1.c1 // c2.c2 AS rarity "
    "FROM c2 JOIN c1 USING (p)) "
    "SELECT doc_id, count(*) AS n_bigrams, "
    "sum(rarity) // count(*) AS bigram_rarity "
    "FROM b2 JOIN r USING (p, c) GROUP BY doc_id")


# ---------------------------------------------------------------------------
# market-basket lift (frequent co-occurring part pairs)
# ---------------------------------------------------------------------------

def q_basket_affinity(spark, sf_dir):
    """Top-20 part pairs by integer lift over the order baskets:
    lift_x1000 = co_cnt * n_orders * 1000 DIV (cnt1 * cnt2), support
    co_cnt >= 3 — the association-rule mining shape. The pair stream
    reuses the codegen HOF expansion of _co_order_pairs but on the
    per-order DISTINCT part sets (support = order count, not line
    count); top-20 via TakeOrderedAndProject, never a global window."""
    g = tpch_graph(spark, sf_dir)
    li = (g.edges["contains"]
          .select(F.col(SRC).alias("o"), F.col(DST).alias("p")).distinct())
    grouped = li.groupBy("o").agg(F.sort_array(F.collect_set("p"))
                                  .alias("ps"))
    pairs = (grouped.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps) - i - 1), "
        "y -> struct(x AS s, y AS d))))")).alias("e"))
        .select(F.col("e.s").alias("p1"), F.col("e.d").alias("p2")))
    co = (pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("co_cnt"))
          .filter(F.col("co_cnt") >= 3))
    cnt = li.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    n = li.select("o").distinct().agg(F.count(F.lit(1)).alias("n_orders"))
    return (co.join(cnt.withColumnsRenamed({"p": "p1", "cnt": "cnt1"}), "p1")
            .join(cnt.withColumnsRenamed({"p": "p2", "cnt": "cnt2"}), "p2")
            .crossJoin(F.broadcast(n))
            .select("p1", "p2", "co_cnt", "cnt1", "cnt2",
                    # co_cnt*n_orders*1000 ~ 1e23 at the 100 TB design
                    # point: accumulate in DECIMAL(38,0), emit BIGINT
                    F.expr("CAST(CAST(co_cnt AS DECIMAL(38,0)) * n_orders "
                           "* 1000 DIV (CAST(cnt1 AS DECIMAL(38,0)) * cnt2)"
                           " AS BIGINT)")
                    .alias("lift_x1000"))
            .orderBy(F.desc("lift_x1000"), "p1", "p2").limit(20))


ORACLE_BASKET = (
    "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
    "FROM lineitem), "
    "pairs AS (SELECT a.p AS p1, b.p AS p2 FROM li a JOIN li b "
    "ON a.o = b.o AND a.p < b.p), "
    "co AS (SELECT p1, p2, count(*) AS co_cnt FROM pairs "
    "GROUP BY p1, p2 HAVING count(*) >= 3), "
    "cnt AS (SELECT p, count(*) AS cnt FROM li GROUP BY p), "
    "n AS (SELECT count(DISTINCT o) AS n_orders FROM li) "
    "SELECT p1, p2, co_cnt, c1.cnt AS cnt1, c2.cnt AS cnt2, "
    "CAST(CAST(co_cnt AS HUGEINT) * n_orders * 1000 "
    "// (CAST(c1.cnt AS HUGEINT) * c2.cnt) AS BIGINT) AS lift_x1000 "
    "FROM co JOIN cnt c1 ON c1.p = co.p1 JOIN cnt c2 ON c2.p = co.p2 "
    "CROSS JOIN n ORDER BY lift_x1000 DESC, p1, p2 LIMIT 20")


# ---------------------------------------------------------------------------
# per-source distribution drift (total-variation distance, integer)
# ---------------------------------------------------------------------------

def q_source_tv_distance(spark, sf_dir):
    """Domain-shift detector: total-variation distance between each
    source's token distribution and the whole-corpus distribution,
    exact integer x1e6: tv = 1e6 * sum_t |c_s(t)*N - c(t)*N_s| DIV
    (2*N_s*N). The source x vocab frame is sources (tiny) x corpus
    vocab — built by a broadcast cross join so absent tokens (c_s = 0)
    are counted; no float division anywhere."""
    tok = (_docs(spark, sf_dir)
           .select("source", F.explode(F.split("text", " ")).alias("t")))
    per_src = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("cs"))
    corpus = per_src.groupBy("t").agg(F.sum("cs").alias("c"))
    ns = per_src.groupBy("source").agg(F.sum("cs").alias("ns"))
    total = corpus.agg(F.sum("c").alias("n"))
    full = (corpus.crossJoin(F.broadcast(ns))
            .join(per_src, ["source", "t"], "left")
            .select("source", "t", "c", "ns",
                    F.coalesce("cs", F.lit(0)).alias("cs"))
            .crossJoin(F.broadcast(total)))
    # cs*n at the 100 TB design point is ~1e26 — far past int64. The
    # cross-products accumulate in DECIMAL(38,0) INTERNALLY; the final
    # schema stays BIGINT (a decimal in the output would break the
    # driver's fetched-type identity — the r4 lesson).
    l1 = ("sum(abs(CAST(cs AS DECIMAL(38,0)) * n "
          "- CAST(c AS DECIMAL(38,0)) * ns))")
    return (full.groupBy("source")
            .agg(F.first("ns").alias("n_tokens"),
                 F.expr(f"CAST({l1} AS BIGINT)").alias("l1_num"),
                 F.expr(f"CAST((1000000 * {l1}) "
                        "DIV (2 * CAST(first(ns) AS DECIMAL(38,0)) "
                        "* first(n)) AS BIGINT)")
                 .alias("tv_x1e6")))


ORACLE_TV = (
    "WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t "
    "FROM documents), "
    "ps AS (SELECT source, t, count(*) AS cs FROM tok GROUP BY source, t), "
    "corpus AS (SELECT t, sum(cs) AS c FROM ps GROUP BY t), "
    "ns AS (SELECT source, sum(cs) AS ns FROM ps GROUP BY source), "
    "tot AS (SELECT sum(c) AS n FROM corpus), "
    "fl AS (SELECT ns.source, corpus.t, corpus.c, ns.ns, "
    "coalesce(ps.cs, 0) AS cs, tot.n "
    "FROM corpus CROSS JOIN ns CROSS JOIN tot "
    "LEFT JOIN ps ON ps.source = ns.source AND ps.t = corpus.t) "
    # HUGEINT internally (cs*n ~ 1e26 at scale); the registry-level
    # BIGINT cast wrapper restores the int64 final schema
    "SELECT source, first(ns) AS n_tokens, "
    "sum(abs(CAST(cs AS HUGEINT) * n - CAST(c AS HUGEINT) * ns)) AS l1_num, "
    "(1000000 * sum(abs(CAST(cs AS HUGEINT) * n - CAST(c AS HUGEINT) * ns)))"
    " // (2 * CAST(first(ns) AS HUGEINT) * first(n)) "
    "AS tv_x1e6 FROM fl GROUP BY source")


# ---------------------------------------------------------------------------
# Pareto skyline (min price, max size) via two-pass distributed cummax
# ---------------------------------------------------------------------------

def q_skyline_parts(spark, sf_dir):
    """2-D Pareto frontier of parts (minimize retail price, maximize
    size): p is on the skyline iff no part has strictly lower price
    with >= size, and no equal-price part has strictly greater size.
    Cluster-safe plan — the classic sort-based skyline needs a global
    cumulative max, which we run as the two-pass pattern of
    operators/prefix.py: per-price-bucket max size (hash agg), prefix
    max over the tiny bucket frame via a broadcast triangular join
    (never an unpartitioned WindowExec), then a bucket-local window
    for the intra-bucket running max. No all-pairs anti-join."""
    g = tpch_graph(spark, sf_dir)
    parts = g.vertices["part"].select(
        F.col(VID).alias("p_partkey"),
        F.expr(_RETAIL_CENTS).alias("price_cents"), "p_size")
    parts = parts.withColumn("bkt", F.expr("price_cents DIV 10000"))
    # pass 1: per-bucket max size; prefix max over STRICTLY preceding
    # buckets via the triangular broadcast join (bucket count is bounded
    # by the price domain DIV 100 — never data-sized).
    bmax = parts.groupBy("bkt").agg(F.max("p_size").alias("bmax"))
    prior = (bmax.alias("a")
             .join(F.broadcast(bmax.alias("b")),
                   F.col("b.bkt") < F.col("a.bkt"), "left")
             .groupBy(F.col("a.bkt").alias("bkt"))
             .agg(F.max("b.bmax").alias("prior_max")))
    # pass 2: intra-bucket running max over strictly-lower prices
    wb = (W.partitionBy("bkt").orderBy("price_cents")
          .rangeBetween(W.unboundedPreceding, -1))
    weq = W.partitionBy("bkt", "price_cents")
    out = (parts.join(F.broadcast(prior), "bkt")
           .withColumn("lower_max", F.greatest(
               F.coalesce(F.max("p_size").over(wb), F.lit(-1)),
               F.coalesce("prior_max", F.lit(-1))))
           .withColumn("eq_max", F.max("p_size").over(weq))
           .filter((F.col("p_size") > F.col("lower_max"))
                   & (F.col("p_size") == F.col("eq_max"))))
    return out.select("p_partkey", "price_cents", "p_size")


ORACLE_SKYLINE = (
    "WITH p AS (SELECT p_partkey, "
    "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
    "AS price_cents, p_size FROM part) "
    "SELECT p_partkey, price_cents, p_size FROM p a "
    "WHERE NOT EXISTS (SELECT 1 FROM p b "
    "WHERE b.price_cents < a.price_cents AND b.p_size >= a.p_size) "
    "AND NOT EXISTS (SELECT 1 FROM p c "
    "WHERE c.price_cents = a.price_cents AND c.p_size > a.p_size)")


# ---------------------------------------------------------------------------
# robust outliers: median absolute deviation (exact lower-median)
# ---------------------------------------------------------------------------

def q_events_mad_outliers(spark, sf_dir):
    """Robust per-type outliers: |cents - median| > 3 * MAD, both
    medians the exact LOWER median (rank (n+1) DIV 2 in (cents,
    event_id) order — integer-exact, unlike percentile interpolation
    which splits half-boundaries differently per engine). Windows are
    partitioned by event_type (bounded groups), never global; emits
    the outlier rows with their per-type med/mad evidence."""
    ev = (load_events(spark, sf_dir)
          .select("event_id", "event_type", F.expr(_EV_CENTS).alias("cents")))
    wt = W.partitionBy("event_type")
    r1 = (ev.withColumn("rn", F.row_number().over(
              wt.orderBy("cents", "event_id")))
          .withColumn("n", F.count(F.lit(1)).over(wt)))
    med = (r1.filter(F.expr("rn = (n + 1) DIV 2"))
           .select("event_type", F.col("cents").alias("med_cents")))
    dev = (ev.join(F.broadcast(med), "event_type")
           .withColumn("adev", F.abs(F.col("cents") - F.col("med_cents"))))
    r2 = (dev.withColumn("rn", F.row_number().over(
              wt.orderBy("adev", "event_id")))
          .withColumn("n", F.count(F.lit(1)).over(wt)))
    mad = (r2.filter(F.expr("rn = (n + 1) DIV 2"))
           .select("event_type", F.col("adev").alias("mad_cents")))
    return (dev.join(F.broadcast(mad), "event_type")
            .filter(F.col("adev") > 3 * F.col("mad_cents"))
            .select("event_id", "event_type", "cents", "med_cents",
                    "mad_cents"))


ORACLE_MAD = (
    "WITH e AS (SELECT event_id, event_type, "
    f"{_EV_CENTS} AS cents FROM events), "
    "r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type "
    "ORDER BY cents, event_id) AS rn, "
    "count(*) OVER (PARTITION BY event_type) AS n FROM e), "
    "med AS (SELECT event_type, cents AS med_cents FROM r1 "
    "WHERE rn = (n + 1) // 2), "
    "dev AS (SELECT e.event_id, e.event_type, e.cents, med.med_cents, "
    "abs(e.cents - med.med_cents) AS adev FROM e JOIN med USING (event_type)), "
    "r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type "
    "ORDER BY adev, event_id) AS rn, "
    "count(*) OVER (PARTITION BY event_type) AS n FROM dev), "
    "mad AS (SELECT event_type, adev AS mad_cents FROM r2 "
    "WHERE rn = (n + 1) // 2) "
    "SELECT d.event_id, d.event_type, d.cents, d.med_cents, m.mad_cents "
    "FROM dev d JOIN mad m USING (event_type) "
    "WHERE d.adev > 3 * m.mad_cents")


# ---------------------------------------------------------------------------
# node2vec second-order biased walks
# ---------------------------------------------------------------------------

def q_node2vec_walks(spark, sf_dir):
    """Deterministic 3-step node2vec walks (p=4, q=2 as integer weights
    1/4/2) from 100 customer seeds over the undirected customer↔order
    graph — the biased walk corpus behind node2vec embeddings, with the
    same md5-PRF reproducibility contract as random_walks."""
    from .operators.walk import node2vec_walks
    g = tpch_graph(spark, sf_dir)
    placed = g.edges["placed"].select(SRC, DST)
    fwd = placed.select(F.col(SRC).alias(SRC),
                        (F.col(DST) + 10_000_000).alias(DST))
    und = fwd.union(fwd.select(F.col(DST).alias(SRC),
                               F.col(SRC).alias(DST)))
    seeds = spark.range(0, 100).select(F.col("id").alias("node"))
    return node2vec_walks(und, seeds, steps=3)


def _oracle_node2vec() -> str:
    from .operators.walk import node2vec_walks_oracle_sql
    return node2vec_walks_oracle_sql(
        "SELECT o_custkey AS src, o_orderkey + 10000000 AS dst FROM orders "
        "UNION ALL SELECT o_orderkey + 10000000, o_custkey FROM orders",
        "SELECT range AS node FROM range(0, 100)", steps=3)


# ---------------------------------------------------------------------------
# parallel greedy coloring (Jones-Plassmann)
# ---------------------------------------------------------------------------

def q_greedy_coloring(spark, sf_dir):
    """Jones-Plassmann coloring (3 rounds) of the undirected
    customer↔order graph — the conflict-free scheduling primitive
    (adjacent vertices never share a color). On this star-forest
    topology the priority rounds PROVABLY converge in 3 rounds (a
    star's center waits only for its smaller-priority leaves, which
    are round-0 local minima), so every vertex is colored — unlike the
    dense co-order projection, whose overlapping per-order cliques
    build long priority chains that starve the local-minimum rule
    (measured: 47/2000 colored in 3 rounds there). Deterministic md5
    priorities, so reproducible on any engine and partitioning."""
    from .operators.analytics import greedy_coloring
    from .workload import _pagerank_gate_graph
    return greedy_coloring(_pagerank_gate_graph(spark, sf_dir), rounds=3)


def _oracle_coloring() -> str:
    from .operators.analytics import coloring_oracle_sql
    return coloring_oracle_sql(
        "SELECT o_custkey AS src, o_orderkey + 10000000 AS dst "
        "FROM orders UNION ALL "
        "SELECT o_orderkey + 10000000, o_custkey FROM orders", rounds=3)


# ---------------------------------------------------------------------------
# exact betweenness over the 2-layer traversal graph
# ---------------------------------------------------------------------------

def betweenness_2hop_frames(placed, contains):
    """The sigma-fraction betweenness plan over pre-built layer frames
    (placed: (c, o), contains: (o, p)) — shared by q_betweenness_2hop
    and tools/loop_scaling.py so the 10x/100x sweep measures EXACTLY
    the gated composition. Two hash joins + two aggregates; the sigma
    join shuffles on the (c, p) pair key, never materializing
    per-source DAGs."""
    paths = placed.join(contains, "o")
    sigma = paths.groupBy("c", "p").agg(F.count(F.lit(1)).alias("sig"))
    return (paths.join(sigma, ["c", "p"])
            .groupBy(F.col("o").alias("order_vid"))
            .agg(F.count(F.lit(1)).alias("n_paths"),
                 F.sum(F.expr("1000 DIV sig")).alias("bc_x1000")))


def q_betweenness_2hop(spark, sf_dir):
    """Exact betweenness centrality of the intermediate layer in the
    customer->order->part traversal graph: every customer-part geodesic
    has length exactly 2, so Brandes' dependency accumulation reduces
    to one sigma-fraction join — bc(o) = sum over (c,p) pairs of
    paths-through-o DIV total 2-paths, integer x1000 per pair
    (betweenness_2hop_frames)."""
    g = tpch_graph(spark, sf_dir)
    placed = g.edges["placed"].select(F.col(SRC).alias("c"),
                                      F.col(DST).alias("o"))
    contains = g.edges["contains"].select(F.col(SRC).alias("o"),
                                          F.col(DST).alias("p")).distinct()
    return betweenness_2hop_frames(placed, contains)


ORACLE_BETWEENNESS = (
    "WITH placed AS (SELECT o_custkey AS c, o_orderkey AS o FROM orders), "
    "cont AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
    "FROM lineitem), "
    "paths AS (SELECT placed.c, placed.o, cont.p "
    "FROM placed JOIN cont USING (o)), "
    "sigma AS (SELECT c, p, count(*) AS sig FROM paths GROUP BY c, p) "
    "SELECT o AS order_vid, count(*) AS n_paths, "
    "sum(1000 // sig) AS bc_x1000 "
    "FROM paths JOIN sigma USING (c, p) GROUP BY o")


# ---------------------------------------------------------------------------
# winsorized event statistics (exact order-statistic clamping)
# ---------------------------------------------------------------------------

def q_events_winsorize(spark, sf_dir):
    """Winsorized per-type mean: values clamped at the exact p5/p95
    order statistics (rank max(5n DIV 100, 1) / max(95n DIV 100, 1) in
    (cents, event_id) order — rank-based, so integer-exact, where
    interpolating percentiles would split half-boundaries differently
    per engine). The robust-mean counterpart of events_mad_outliers;
    windows partition by event_type, mean is truncating cent DIV."""
    ev = (load_events(spark, sf_dir)
          .select("event_id", "event_type", F.expr(_EV_CENTS).alias("cents")))
    wt = W.partitionBy("event_type")
    r = (ev.withColumn("rn", F.row_number().over(
             wt.orderBy("cents", "event_id")))
         .withColumn("n", F.count(F.lit(1)).over(wt)))
    lo = (r.filter(F.expr("rn = greatest((5 * n) DIV 100, 1)"))
          .select("event_type", F.col("cents").alias("lo_cents")))
    hi = (r.filter(F.expr("rn = greatest((95 * n) DIV 100, 1)"))
          .select("event_type", F.col("cents").alias("hi_cents")))
    return (ev.join(F.broadcast(lo), "event_type")
            .join(F.broadcast(hi), "event_type")
            .withColumn("w", F.expr(
                "least(greatest(cents, lo_cents), hi_cents)"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.first("lo_cents").alias("lo_cents"),
                 F.first("hi_cents").alias("hi_cents"),
                 F.expr("sum(w) DIV count(*)").alias("wmean_cents")))


ORACLE_WINSORIZE = (
    "WITH e AS (SELECT event_id, event_type, "
    f"{_EV_CENTS} AS cents FROM events), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY event_type "
    "ORDER BY cents, event_id) AS rn, "
    "count(*) OVER (PARTITION BY event_type) AS n FROM e), "
    "lo AS (SELECT event_type, cents AS lo_cents FROM r "
    "WHERE rn = greatest((5 * n) // 100, 1)), "
    "hi AS (SELECT event_type, cents AS hi_cents FROM r "
    "WHERE rn = greatest((95 * n) // 100, 1)) "
    "SELECT event_type, count(*) AS n, "
    "first(lo_cents) AS lo_cents, first(hi_cents) AS hi_cents, "
    "sum(least(greatest(cents, lo_cents), hi_cents)) // count(*) "
    "AS wmean_cents "
    "FROM e JOIN lo USING (event_type) JOIN hi USING (event_type) "
    "GROUP BY event_type")


# ---------------------------------------------------------------------------
# walk-visit centrality (composes the deterministic walk corpus)
# ---------------------------------------------------------------------------

def q_walk_visit_counts(spark, sf_dir):
    """Random-walk visit centrality: node visit counts over the
    deterministic 6-step walk corpus (random_walks) — the sampled
    stationary-distribution estimate that walk-based embedding and
    PPR-approximation pipelines consume. One explode of the path
    column + one hash aggregate on top of the walk corpus."""
    from .operators.walk import random_walks
    g = tpch_graph(spark, sf_dir)
    placed = g.edges["placed"].select(SRC, DST)
    fwd = placed.select(F.col(SRC).alias(SRC),
                        (F.col(DST) + 10_000_000).alias(DST))
    und = fwd.union(fwd.select(F.col(DST).alias(SRC),
                               F.col(SRC).alias(DST)))
    seeds = spark.range(0, 200).select(F.col("id").alias("node"))
    walks = random_walks(und, seeds, steps=6)
    return (walks
            .select(F.explode(F.split("path", "->")).alias("node_s"))
            .select(F.col("node_s").cast("bigint").alias("node"))
            .groupBy("node").agg(F.count(F.lit(1)).alias("visits")))


def _oracle_walk_visits() -> str:
    from .workload import ORACLE_EXT
    return (f"WITH w AS ({ORACLE_EXT['random_walks']}) "
            "SELECT CAST(u.node_s AS BIGINT) AS node, "
            "count(*) AS visits FROM w, "
            "unnest(string_split(w.path, '->')) AS u(node_s) "
            "GROUP BY CAST(u.node_s AS BIGINT)")


# ---------------------------------------------------------------------------
# deterministic training shuffle + token-balanced sharding
# ---------------------------------------------------------------------------

def q_training_shards(spark, sf_dir):
    """Pretraining shard assignment: docs are shuffled into a
    deterministic md5 order (the engine-portable permutation used by
    go_sample/stratified_sample) and packed greedily into shards of
    ~5000 tokens — shard_id = running-token-offset DIV budget, so shard
    sizes are balanced to one doc's tolerance and the whole layout is
    reproducible. The running offset is the two-pass distributed prefix
    sum (operators/prefix.py), so no single-partition WindowExec at any
    corpus size."""
    from .operators.prefix import global_running_sum
    docs = (_docs(spark, sf_dir)
            .select("doc_id",
                    F.md5(F.concat(F.lit("shard#"),
                                   F.col("doc_id").cast("string")))
                    .alias("k"),
                    F.size(F.split("text", " ")).alias("n_tokens")))
    return (global_running_sum(docs, ["k"], "n_tokens", "end_off")
            .select("doc_id", "k",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.expr("(end_off - n_tokens) DIV 5000")
                    .alias("shard_id")))


ORACLE_SHARDS = (
    "WITH d AS (SELECT doc_id, "
    "md5('shard#' || CAST(doc_id AS VARCHAR)) AS k, "
    "len(string_split(text, ' ')) AS n_tokens FROM documents), "
    "r AS (SELECT doc_id, k, n_tokens, "
    "sum(n_tokens) OVER (ORDER BY k "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off FROM d) "
    "SELECT doc_id, k, n_tokens, "
    "(end_off - n_tokens) // 5000 AS shard_id FROM r")


# ---------------------------------------------------------------------------
# BPE tokenizer training (iterative merge learning)
# ---------------------------------------------------------------------------

def q_bpe_train_merges(spark, sf_dir):
    """First 4 BPE merges learned over the document vocabulary — the
    actual tokenizer-training loop (bpe_pair_counts is its single-round
    counting step). Bracket-string rewrite keeps merge application
    bit-identical cross-engine; see pipeline/bpe.py."""
    from .pipeline.bpe import bpe_train_merges
    return bpe_train_merges(_docs(spark, sf_dir), rounds=4)


def _oracle_bpe_train() -> str:
    from .pipeline.bpe import bpe_train_oracle_sql
    return bpe_train_oracle_sql("SELECT text FROM documents", rounds=4)


# ---------------------------------------------------------------------------
# one-sweep Louvain community move + conductance of a partition
# ---------------------------------------------------------------------------

def q_louvain_one_sweep(spark, sf_dir):
    """First synchronous Louvain sweep over the co-order projection
    from singleton communities: each node joins the neighbor community
    with the best integer modularity gain 2m - deg(i)*deg(c) (positive
    gain required, ties to the smallest community id) — the
    community-detection refinement step beyond label_propagation's
    majority rule. One degree aggregate, one scored edge join, one
    per-node argmax window (partitioned by node, never global)."""
    pairs = _co_order_pairs(spark, sf_dir).distinct()
    both = pairs.union(pairs.select(F.col(DST).alias(SRC),
                                    F.col(SRC).alias(DST))).transform(_pin)
    deg = both.groupBy(SRC).agg(F.count(F.lit(1)).alias("deg"))
    m2 = both.agg(F.count(F.lit(1)).alias("m2"))  # 2m directed rows
    scored = (both
              .join(deg.withColumnRenamed("deg", "deg_i"), SRC)
              .join(deg.withColumnsRenamed({SRC: DST, "deg": "deg_c"}), DST)
              .crossJoin(F.broadcast(m2))
              .select(F.col(SRC).alias("node"), F.col(DST).alias("cand"),
                      F.expr("m2 - deg_i * deg_c").alias("gain")))
    w = W.partitionBy("node").orderBy(F.desc("gain"), "cand")
    best = (scored.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1"))
    return best.select(
        "node",
        F.expr("CASE WHEN gain > 0 THEN cand ELSE node END")
        .alias("community"), "gain")


ORACLE_LOUVAIN = (
    f"WITH p0 AS ({_ORACLE_CO_PAIRS}), "
    "p AS (SELECT DISTINCT src, dst FROM p0), "
    "b AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p), "
    "deg AS (SELECT src, count(*) AS deg FROM b GROUP BY src), "
    "m AS (SELECT count(*) AS m2 FROM b), "
    "scored AS (SELECT b.src AS node, b.dst AS cand, "
    "m.m2 - di.deg * dc.deg AS gain FROM b "
    "JOIN deg di ON di.src = b.src JOIN deg dc ON dc.src = b.dst "
    "CROSS JOIN m), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY node "
    "ORDER BY gain DESC, cand) AS rn FROM scored) "
    "SELECT node, CASE WHEN gain > 0 THEN cand ELSE node END AS community, "
    "gain FROM r WHERE rn = 1")


def q_conductance_brands(spark, sf_dir):
    """Conductance of the brand partition over the co-order projection:
    phi(c) = cut(c) / min(vol(c), 2m - vol(c)), integer x1e6 with cut
    and volume exact — the partition-quality metric dual to
    modularity_brands (low phi = well-separated community). Two
    broadcast joins of the brand dim + two hash aggregates."""
    g = tpch_graph(spark, sf_dir)
    brand = g.vertices["part"].select(F.col(VID).alias("pk"),
                                      F.col("p_brand").alias("community"))
    pairs = _co_order_pairs(spark, sf_dir)
    lab = (pairs
           .join(F.broadcast(brand.withColumnsRenamed(
               {"pk": SRC, "community": "c1"})), SRC)
           .join(F.broadcast(brand.withColumnsRenamed(
               {"pk": DST, "community": "c2"})), DST))
    m2 = lab.agg((2 * F.count(F.lit(1))).alias("m2"))
    cut = (lab.filter("c1 != c2")
           .select(F.explode(F.array("c1", "c2")).alias("community"))
           .groupBy("community").agg(F.count(F.lit(1)).alias("cut")))
    vol = (lab.select(F.col("c1").alias("community"))
           .unionAll(lab.select(F.col("c2").alias("community")))
           .groupBy("community").agg(F.count(F.lit(1)).alias("vol")))
    return (vol.join(cut, "community", "left")
            .select("community", F.coalesce("cut", F.lit(0)).alias("cut"),
                    "vol")
            .crossJoin(F.broadcast(m2))
            .select("community", "cut", "vol",
                    # a community holding EVERY endpoint has vol = 2m and
                    # cut = 0: define phi = 0 instead of dividing by zero
                    F.expr("CASE WHEN least(vol, m2 - vol) = 0 THEN 0 "
                           "ELSE (1000000 * cut) DIV least(vol, m2 - vol) "
                           "END").alias("phi_x1e6")))


# MATERIALIZED (r12 verdict Next #1): `lab` is consumed five times
# (m, cut x2, vol x2); DuckDB re-inlined it per consumer and the
# c1 <> c2 variants degraded the lineitem self-join to NESTED-LOOP
# plans — 221 s at sf0.1 on the r13 host. Forcing one hash-join
# evaluation: 1.5 s, bit-identical.
ORACLE_CONDUCTANCE = (
    f"WITH pairs AS MATERIALIZED ({_ORACLE_CO_PAIRS}), "
    "lab AS MATERIALIZED (SELECT b1.p_brand AS c1, b2.p_brand AS c2 FROM pairs "
    "JOIN part b1 ON b1.p_partkey = pairs.src "
    "JOIN part b2 ON b2.p_partkey = pairs.dst), "
    "m AS (SELECT 2 * count(*) AS m2 FROM lab), "
    "cut AS (SELECT community, count(*) AS cut FROM "
    "(SELECT c1 AS community FROM lab WHERE c1 <> c2 "
    "UNION ALL SELECT c2 FROM lab WHERE c1 <> c2) GROUP BY community), "
    "vol AS (SELECT community, count(*) AS vol FROM "
    "(SELECT c1 AS community FROM lab UNION ALL SELECT c2 FROM lab) "
    "GROUP BY community) "
    "SELECT v.community, coalesce(cut.cut, 0) AS cut, v.vol, "
    "CASE WHEN least(v.vol, m.m2 - v.vol) = 0 THEN 0 ELSE "
    "(1000000 * coalesce(cut.cut, 0)) // least(v.vol, m.m2 - v.vol) END "
    "AS phi_x1e6 "
    "FROM vol v LEFT JOIN cut ON cut.community = v.community CROSS JOIN m")


# ---------------------------------------------------------------------------
# product-quantization ANN (ADC scan)
# ---------------------------------------------------------------------------

def q_knn_pq_adc(spark, sf_dir):
    """Product-quantization ANN: 4 per-subspace integer k-means
    codebooks (k=4, 2 Lloyd steps), PQ codes for the corpus, and the
    asymmetric-distance top-5 for the first 3 query vectors — the
    64x-compression path of the similarity family (pipeline/pq.py),
    complementing knn_ivf's partition-pruning path."""
    from .pipeline.pq import pq_adc_topk
    from .workload_pipeline import _emb
    return pq_adc_topk(_emb(spark, sf_dir), n_queries=3, subspaces=4,
                       k=4, iterations=2, topk=5)


def _oracle_pq() -> str:
    from .pipeline.pq import pq_adc_oracle_sql
    return pq_adc_oracle_sql(n_queries=3, subspaces=4, k=4,
                             iterations=2, topk=5)


def q_knn_pq_rerank(spark, sf_dir):
    """PQ's production composition (r8 verdict, Next #2): the gate-
    config ADC scan picks each query's top-20 candidates by estimated
    distance, exact integer cosine re-ranks them to the final top-5 —
    knn_bruteforce's output contract over a candidate set the codes
    selected, so the 64x-compressed corpus answers retrieval without
    ever scanning full vectors (pipeline/pq.py pq_rerank_topk; the
    1 M-design-point recall of this composition is measured in
    tools/ann_crossover.py's pqr arm)."""
    from .pipeline.pq import pq_rerank_topk
    from .workload_pipeline import _emb
    return pq_rerank_topk(_emb(spark, sf_dir), n_queries=3, subspaces=4,
                          k=4, iterations=2, candidates=20, topk=5)


def _oracle_pq_rerank() -> str:
    from .pipeline.pq import pq_rerank_oracle_sql
    return pq_rerank_oracle_sql(n_queries=3, subspaces=4, k=4,
                                iterations=2, candidates=20, topk=5)


# ---------------------------------------------------------------------------
# daily new/cumulative users (growth accounting)
# ---------------------------------------------------------------------------

def q_events_new_users_daily(spark, sf_dir):
    """Growth accounting over the event stream: per day, the number of
    FIRST-SEEN users and the cumulative user base to date. First-seen
    is one per-user min(ts) aggregate; the cumulative count is a
    running sum over the tiny per-day frame, computed with the
    triangular broadcast join (day count is calendar-bounded, never
    data-sized) — no unpartitioned window."""
    ev = load_events(spark, sf_dir)
    first = (ev.groupBy("user_id")
             .agg(F.min(F.struct("ts", "event_id")).alias("m"))
             .select("user_id", F.to_date("m.ts").alias("day")))
    daily = first.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    cum = (daily.alias("a")
           .join(F.broadcast(daily.alias("b")),
                 F.col("b.day") <= F.col("a.day"))
           .groupBy(F.col("a.day").alias("day"))
           .agg(F.first("a.new_users").alias("new_users"),
                F.sum("b.new_users").alias("cumulative_users")))
    return cum


ORACLE_NEW_USERS = (
    "WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events "
    "GROUP BY user_id), "
    "d AS (SELECT CAST(first_ts AS DATE) AS day, count(*) AS new_users "
    "FROM f GROUP BY 1) "
    "SELECT a.day, first(a.new_users) AS new_users, "
    "sum(b.new_users) AS cumulative_users "
    "FROM d a JOIN d b ON b.day <= a.day GROUP BY a.day")


# ---------------------------------------------------------------------------
# shard balance audit (packing quality of training_shards)
# ---------------------------------------------------------------------------

def q_shard_balance_audit(spark, sf_dir):
    """Packing-quality audit of training_shards: per-shard doc and
    token totals plus the global balance spread (max_tokens x1e6 DIV
    min_tokens over FULL shards — the last, partial shard is excluded
    from the spread the way a training run drops its ragged tail).
    One aggregate over the shard assignment."""
    shards = q_training_shards(spark, sf_dir)
    per = (shards.groupBy("shard_id")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("tok")))
    last = per.agg(F.max("shard_id").alias("last_id"))
    spread = (per.crossJoin(F.broadcast(last))
              .filter("shard_id < last_id")
              .agg(F.expr("(1000000 * max(tok)) DIV min(tok)")
                   .alias("spread_x1e6")))
    return (per.crossJoin(F.broadcast(spread))
            .select("shard_id", "n_docs", F.col("tok").alias("n_tokens"),
                    "spread_x1e6"))


def _oracle_shard_balance() -> str:
    return (
        f"WITH s AS ({ORACLE_SHARDS}), "
        "per AS (SELECT shard_id, count(*) AS n_docs, "
        "sum(n_tokens) AS tok FROM s GROUP BY shard_id), "
        "last AS (SELECT max(shard_id) AS last_id FROM per), "
        "sp AS (SELECT (1000000 * max(tok)) // min(tok) AS spread_x1e6 "
        "FROM per CROSS JOIN last WHERE shard_id < last_id) "
        "SELECT shard_id, n_docs, tok AS n_tokens, spread_x1e6 "
        "FROM per CROSS JOIN sp")


# ---------------------------------------------------------------------------
# dedup candidate quality histogram
# ---------------------------------------------------------------------------

def q_dedup_jaccard_histogram(spark, sf_dir):
    """Quality profile of the MinHash-LSH candidate set: verified
    Jaccard similarities bucketed by decile — the precision evidence
    behind the banding parameters (most survivors should sit in the
    high buckets; a flat histogram means the bands are too loose). One
    aggregate over the gated pair frame."""
    from .pipeline.dedup import minhash_lsh_pairs
    from .workload_pipeline import _docs
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), n=3, num_hashes=12,
                              bands=4, rows=3, threshold_x10000=5000)
    return (pairs
            .select(F.expr("jaccard_x10000 DIV 1000").alias("decile"))
            .groupBy("decile").agg(F.count(F.lit(1)).alias("n_pairs")))


def _oracle_jaccard_hist() -> str:
    from .workload_pipeline import _oracle_minhash_lsh
    return (f"WITH lsh AS ({_oracle_minhash_lsh()}) "
            "SELECT jaccard_x10000 // 1000 AS decile, "
            "count(*) AS n_pairs FROM lsh GROUP BY decile")


# ---------------------------------------------------------------------------
# vocabulary coverage curve (tokenizer sizing)
# ---------------------------------------------------------------------------

def q_vocab_coverage_curve(spark, sf_dir):
    """Tokenizer-sizing curve: what fraction of the token stream the
    top-k vocabulary covers, for k in {10, 100, 1000} — the
    out-of-vocabulary budget a tokenizer design trades against. Each
    top-k is TakeOrderedAndProject (never a global rank window) + one
    sum; coverage is exact integer x1e6."""
    from .workload_pipeline import _docs
    tok = (_docs(spark, sf_dir)
           .select(F.explode(F.split("text", " ")).alias("t")))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c")).transform(_pin)
    total = counts.agg(F.sum("c").alias("n"))
    outs = []
    for k in (10, 100, 1000):
        topk = (counts.orderBy(F.desc("c"), "t").limit(k)
                .agg(F.lit(k).alias("k"),
                     F.count(F.lit(1)).alias("vocab_used"),
                     F.sum("c").alias("covered")))
        outs.append(topk)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return (out.crossJoin(F.broadcast(total))
            .select("k", "vocab_used", "covered",
                    F.expr("(1000000 * covered) DIV n")
                    .alias("coverage_x1e6")))


ORACLE_VOCAB_COVERAGE = (
    "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t "
    "FROM documents), "
    "counts AS (SELECT t, count(*) AS c FROM tok GROUP BY t), "
    "tot AS (SELECT sum(c) AS n FROM counts), "
    "r AS (SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rn "
    "FROM counts) "
    "SELECT k, count(*) AS vocab_used, sum(c) AS covered, "
    "(1000000 * sum(c)) // first(n) AS coverage_x1e6 "
    "FROM r CROSS JOIN tot CROSS JOIN "
    "(SELECT unnest([10, 100, 1000]) AS k) ks "
    "WHERE rn <= k GROUP BY k")


# ---------------------------------------------------------------------------
# churn detection over the event stream
# ---------------------------------------------------------------------------

def q_user_churn_flags(spark, sf_dir):
    """Churn segmentation: a user is churned when their last event
    is more than a full day before the corpus's last event (one idle
    day at the stream tail). Epoch-second integer cutoff from the
    global max scalar row; output per (churned, active-day bucket):
    user counts and total events — the retention counterpart of
    events_new_users_daily."""
    ev = load_events(spark, sf_dir)
    per = (ev.groupBy("user_id")
           .agg(F.min(F.unix_timestamp("ts")).alias("first_es"),
                F.max(F.unix_timestamp("ts")).alias("last_es"),
                F.count(F.lit(1)).alias("n_events")))
    span = per.agg(F.min("first_es").alias("lo"),
                   F.max("last_es").alias("hi"))
    return (per.crossJoin(F.broadcast(span))
            .select("user_id", "n_events",
                    F.expr("CASE WHEN last_es < hi - 86400 "
                           "THEN 1 ELSE 0 END").alias("churned"),
                    F.expr("(last_es - first_es) DIV 86400")
                    .alias("active_days"))
            .groupBy("churned")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("n_events").alias("n_events"),
                 F.expr("sum(active_days) DIV count(*)")
                 .alias("avg_active_days")))


ORACLE_CHURN = (
    "WITH per AS (SELECT user_id, "
    "CAST(floor(epoch(min(ts))) AS BIGINT) AS first_es, "
    "CAST(floor(epoch(max(ts))) AS BIGINT) AS last_es, "
    "count(*) AS n_events FROM events GROUP BY user_id), "
    "span AS (SELECT min(first_es) AS lo, max(last_es) AS hi FROM per) "
    "SELECT CASE WHEN last_es < hi - 86400 THEN 1 ELSE 0 END "
    "AS churned, count(*) AS n_users, sum(n_events) AS n_events, "
    "sum((last_es - first_es) // 86400) // count(*) AS avg_active_days "
    "FROM per CROSS JOIN span GROUP BY 1")


# ---------------------------------------------------------------------------
# per-dimension robust scaling stats (median / IQR, exact order stats)
# ---------------------------------------------------------------------------

def q_embedding_robust_scale(spark, sf_dir):
    """Robust-scaler fit over the embedding matrix: per dimension, the
    exact lower-median and lower-quartile order statistics (ranks
    (n+1) DIV 2, (n+3) DIV 4, (3n+1) DIV 4 in quantized-int order, id
    ties) — the outlier-insensitive normalization fit, integer-exact
    where mean/std would drift per engine. One posexplode + windows
    PARTITIONED BY dim (64 bounded groups)."""
    from .workload_pipeline import _emb
    ivec = F.expr("transform(embedding, x -> "
                  "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
    ex = (_emb(spark, sf_dir).select("vec_id", ivec.alias("v"))
          .select("vec_id", F.posexplode("v").alias("dim", "x")))
    wd = W.partitionBy("dim")
    r = (ex.withColumn("rn", F.row_number().over(
            wd.orderBy("x", "vec_id")))
         .withColumn("n", F.count(F.lit(1)).over(wd)))
    return (r.filter(F.expr(
        "rn = (n + 1) DIV 2 OR rn = (n + 3) DIV 4 OR rn = (3 * n + 1) DIV 4"))
        .groupBy("dim")
        .agg(F.expr("max(CASE WHEN rn = (n + 1) DIV 2 THEN x END)")
             .alias("median_q"),
             F.expr("max(CASE WHEN rn = (n + 3) DIV 4 THEN x END)")
             .alias("p25_q"),
             F.expr("max(CASE WHEN rn = (3 * n + 1) DIV 4 THEN x END)")
             .alias("p75_q"))
        .select(F.col("dim").cast("bigint").alias("dim"),
                "median_q", "p25_q", "p75_q",
                (F.col("p75_q") - F.col("p25_q")).alias("iqr_q")))


ORACLE_ROBUST_SCALE = (
    "WITH ex AS (SELECT vec_id, t.i - 1 AS dim, v[t.i] AS x FROM "
    "(SELECT vec_id, list_transform(embedding, "
    "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v "
    "FROM embeddings), UNNEST(generate_series(1, 64)) t(i)), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY dim "
    "ORDER BY x, vec_id) AS rn, "
    "count(*) OVER (PARTITION BY dim) AS n FROM ex) "
    "SELECT dim, "
    "max(CASE WHEN rn = (n + 1) // 2 THEN x END) AS median_q, "
    "max(CASE WHEN rn = (n + 3) // 4 THEN x END) AS p25_q, "
    "max(CASE WHEN rn = (3 * n + 1) // 4 THEN x END) AS p75_q, "
    "max(CASE WHEN rn = (3 * n + 1) // 4 THEN x END) "
    "- max(CASE WHEN rn = (n + 3) // 4 THEN x END) AS iqr_q "
    "FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 3) // 4 "
    "OR rn = (3 * n + 1) // 4 GROUP BY dim")


# ---------------------------------------------------------------------------
# distributed greedy set cover (coverage-driven selection)
# ---------------------------------------------------------------------------

def q_greedy_set_cover(spark, sf_dir):
    """Greedy set cover, 3 unrolled rounds: pick the supplier covering
    the most still-uncovered parts (ties to the smallest supplier),
    remove its parts, repeat — the ln(n)-approximation whose
    marginal-gain round IS one hash aggregate + a 1-row TakeOrdered,
    the same shape data-selection pipelines use for coverage-driven
    corpus curation. Output: (round, supplier, gain, covered_total)."""
    g = tpch_graph(spark, sf_dir)
    ps = (g.edges["supplied_by"]
          .select(F.col(DST).alias("s"), F.col(SRC).alias("p")).distinct()
          .transform(_pin))
    uncovered = ps
    picks = []
    for r in range(3):
        gain = (uncovered.groupBy("s").agg(F.count(F.lit(1)).alias("g"))
                .orderBy(F.desc("g"), "s").limit(1)
                .select(F.lit(r).alias("round"),
                        F.col("s").alias("supplier"),
                        F.col("g").alias("gain")).localCheckpoint())
        picks.append(gain)
        chosen_parts = (ps.join(gain.select(F.col("supplier").alias("s")),
                                "s").select("p").distinct())
        uncovered = uncovered.join(chosen_parts, "p", "left_anti")
    out = picks[0]
    for pdf in picks[1:]:
        out = out.unionByName(pdf)
    # running covered total over the 3-row picks frame: triangular join
    run = (out.alias("a")
           .join(F.broadcast(out.alias("b")),
                 F.col("b.round") <= F.col("a.round"))
           .groupBy(F.col("a.round").alias("round"))
           .agg(F.first("a.supplier").alias("supplier"),
                F.first("a.gain").alias("gain"),
                F.sum("b.gain").alias("covered_total")))
    return run


def _oracle_set_cover() -> str:
    parts = [
        "ps AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, "
        "l_partkey AS p FROM lineitem)",
        "u0 AS (SELECT * FROM ps)",
    ]
    for r in range(3):
        parts.append(
            f"g{r} AS (SELECT {r} AS round, s AS supplier, count(*) AS gain "
            f"FROM u{r} GROUP BY s ORDER BY gain DESC, s LIMIT 1)")
        parts.append(
            f"u{r+1} AS (SELECT u.* FROM u{r} u WHERE u.p NOT IN "
            f"(SELECT p FROM ps JOIN g{r} ON ps.s = g{r}.supplier))")
    sel = " UNION ALL ".join(f"SELECT * FROM g{i}" for i in range(3))
    return ("WITH " + ",\n".join(parts) + ", picks AS (" + sel + ") "
            "SELECT a.round, first(a.supplier) AS supplier, "
            "first(a.gain) AS gain, sum(b.gain) AS covered_total "
            "FROM picks a JOIN picks b ON b.round <= a.round "
            "GROUP BY a.round")


# ---------------------------------------------------------------------------
# cluster labeling: top distinctive terms per k-means cluster
# ---------------------------------------------------------------------------

def q_cluster_top_terms(spark, sf_dir):
    """Human-readable labels for the embedding clusters: per k-means
    cluster, the top-3 tokens by the integer lift score
    (cluster_tf * corpus_total) DIV (cluster_total * corpus_tf) x1000
    (>1000 = over-represented in the cluster), min support 5 — the
    topic-labeling step after kmeans_embeddings. Per-cluster top-3 is
    a WindowGroupLimit over the (cluster, token) aggregate."""
    from .pipeline.cluster import kmeans_fixed
    from .workload_pipeline import _docs, _emb
    clus = (kmeans_fixed(_emb(spark, sf_dir), k=8, iterations=2)
            .select(F.col("vec_id").alias("doc_id"), "cluster"))
    tok = (_docs(spark, sf_dir)
           .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
           .join(clus, "doc_id"))
    ct = (tok.groupBy("cluster", "t").agg(F.count(F.lit(1)).alias("ctf"))
          .filter(F.col("ctf") >= 5))
    corpus = tok.groupBy("t").agg(F.count(F.lit(1)).alias("tf"))
    ctot = tok.groupBy("cluster").agg(F.count(F.lit(1)).alias("ctot"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    scored = (ct.join(corpus, "t").join(F.broadcast(ctot), "cluster")
              .crossJoin(F.broadcast(tot))
              .select("cluster", "t", "ctf",
                      F.expr("(ctf * n * 1000) DIV (ctot * tf)")
                      .alias("lift_x1000")))
    w = W.partitionBy("cluster").orderBy(
        F.desc("lift_x1000"), F.desc("ctf"), "t")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter("rn <= 3")
            .select("cluster", F.col("rn").cast("bigint").alias("rank"),
                    "t", "ctf", "lift_x1000"))


def _oracle_cluster_terms() -> str:
    from .pipeline.cluster import kmeans_oracle_sql
    return (
        f"WITH km AS ({kmeans_oracle_sql(k=8, iterations=2)}), "
        "tok AS (SELECT d.doc_id, km.cluster, "
        "unnest(string_split(d.text, ' ')) AS t "
        "FROM documents d JOIN km ON km.vec_id = d.doc_id), "
        "ct AS (SELECT cluster, t, count(*) AS ctf FROM tok "
        "GROUP BY cluster, t HAVING count(*) >= 5), "
        "corpus AS (SELECT t, count(*) AS tf FROM tok GROUP BY t), "
        "ctot AS (SELECT cluster, count(*) AS ctot FROM tok "
        "GROUP BY cluster), "
        "tot AS (SELECT count(*) AS n FROM tok), "
        "scored AS (SELECT ct.cluster, ct.t, ct.ctf, "
        "(ct.ctf * tot.n * 1000) // (ctot.ctot * corpus.tf) AS lift_x1000 "
        "FROM ct JOIN corpus USING (t) JOIN ctot USING (cluster) "
        "CROSS JOIN tot) "
        "SELECT cluster, rn AS rank, t, ctf, lift_x1000 FROM ("
        "SELECT *, row_number() OVER (PARTITION BY cluster "
        "ORDER BY lift_x1000 DESC, ctf DESC, t) AS rn FROM scored) "
        "WHERE rn <= 3")


# ---------------------------------------------------------------------------
# log-binned degree histogram (power-law evidence)
# ---------------------------------------------------------------------------

def q_degree_log_histogram(spark, sf_dir):
    """Log2-binned degree distribution of the co-order projection —
    the heavy-tail evidence behind every skew mitigation in this
    engine (salting, AQE skew join, degree-ordered orientation): bin
    floor(log2(deg)) via the integer bit-length trick, counts plus
    the per-bin min/max degree. Two hash aggregates, no floats."""
    pairs = _co_order_pairs(spark, sf_dir).distinct()
    und = pairs.union(pairs.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    deg = und.groupBy(SRC).agg(F.count(F.lit(1)).alias("deg"))
    # floor(log2(d)) for BIGINT d >= 1 == 63 - leading zeros; express
    # engine-portably by comparing against powers of two in one CASE
    bin_expr = "CASE " + " ".join(
        f"WHEN deg < {1 << (b + 1)} THEN {b}" for b in range(31)
    ) + " ELSE 31 END"
    return (deg.select(F.expr(bin_expr).alias("log2_bin"), "deg")
            .groupBy("log2_bin")
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.min("deg").alias("min_deg"),
                 F.max("deg").alias("max_deg")))


def _oracle_degree_log_hist() -> str:
    bin_expr = "CASE " + " ".join(
        f"WHEN deg < {1 << (b + 1)} THEN {b}" for b in range(31)
    ) + " ELSE 31 END"
    return (
        f"WITH p AS (SELECT DISTINCT src, dst FROM ({_ORACLE_CO_PAIRS})), "
        "b AS (SELECT src FROM p UNION ALL SELECT dst FROM p), "
        "d AS (SELECT src, count(*) AS deg FROM b GROUP BY src) "
        f"SELECT {bin_expr} AS log2_bin, count(*) AS n_nodes, "
        "min(deg) AS min_deg, max(deg) AS max_deg "
        f"FROM d GROUP BY {bin_expr}")


# ---------------------------------------------------------------------------
# ANALYZE TABLE: per-column statistics profile
# ---------------------------------------------------------------------------

def q_analyze_table_stats(spark, sf_dir):
    """ANALYZE-TABLE statistics collection over lineitem — the
    cost-based-optimizer food the reference's StatisTask
    (admin/StatisTask.h) only gathers at row granularity: per column,
    row count, null count, exact distinct count, and integer min/max
    (money in cents, dates as epoch days). One pass per column batch;
    every stat is a plain aggregate, so the profile parallelizes like
    any scan."""
    g = tpch_graph(spark, sf_dir)
    li = g.edges["contains"]
    cols = {
        "l_quantity": F.col("l_quantity").cast("decimal(18,2)")
        .cast("bigint"),
        "l_extendedprice": (F.col("l_extendedprice")
                            .cast("decimal(18,2)") * 100).cast("bigint"),
        "l_returnflag_len": F.length("l_returnflag").cast("bigint"),
        "l_shipdate_day": F.datediff(
            F.to_date("l_shipdate"), F.lit("1970-01-01")).cast("bigint"),
    }
    outs = []
    for name, expr in cols.items():
        c = li.select(expr.alias("x"))
        outs.append(c.agg(
            F.lit(name).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CASE WHEN x IS NULL THEN 1 ELSE 0 END"))
            .alias("n_nulls"),
            F.countDistinct("x").alias("ndv"),
            F.min("x").alias("min_v"), F.max("x").alias("max_v")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


ORACLE_ANALYZE = (
    "WITH b AS (SELECT "
    "CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS q, "
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS ep, "
    "CAST(len(l_returnflag) AS BIGINT) AS rf, "
    "CAST(date_diff('day', DATE '1970-01-01', "
    "CAST(l_shipdate AS DATE)) AS BIGINT) AS sd FROM lineitem) "
    "SELECT 'l_quantity' AS \"column\", count(*) AS n_rows, "
    "sum(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS n_nulls, "
    "count(DISTINCT q) AS ndv, min(q) AS min_v, max(q) AS max_v FROM b "
    "UNION ALL SELECT 'l_extendedprice', count(*), "
    "sum(CASE WHEN ep IS NULL THEN 1 ELSE 0 END), count(DISTINCT ep), "
    "min(ep), max(ep) FROM b "
    "UNION ALL SELECT 'l_returnflag_len', count(*), "
    "sum(CASE WHEN rf IS NULL THEN 1 ELSE 0 END), count(DISTINCT rf), "
    "min(rf), max(rf) FROM b "
    "UNION ALL SELECT 'l_shipdate_day', count(*), "
    "sum(CASE WHEN sd IS NULL THEN 1 ELSE 0 END), count(DISTINCT sd), "
    "min(sd), max(sd) FROM b")


# ---------------------------------------------------------------------------
# event-type trigram sequence mining
# ---------------------------------------------------------------------------

def q_event_type_trigrams(spark, sf_dir):
    """Top-20 3-step behavioral sequences: per user in (ts, event_id)
    order, every consecutive event-type trigram, counted corpus-wide —
    the sequence-mining extension of events_markov_transitions
    (first-order transitions can't see 'view->click->purchase' as a
    unit). Per-user lead() windows + one hash aggregate +
    TakeOrderedAndProject."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"))
        .filter("t2 IS NOT NULL AND t3 IS NOT NULL"))
    return (tri.groupBy("t1", "t2", "t3")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "t1", "t2", "t3").limit(20))


ORACLE_TRIGRAMS = (
    "WITH s AS (SELECT event_type AS t1, "
    "lead(event_type, 1) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) AS t2, "
    "lead(event_type, 2) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) AS t3 FROM events) "
    "SELECT t1, t2, t3, count(*) AS n FROM s "
    "WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY t1, t2, t3 "
    "ORDER BY n DESC, t1, t2, t3 LIMIT 20")


# ---------------------------------------------------------------------------
# semantic dedup rerank (MinHash recall x embedding precision)
# ---------------------------------------------------------------------------

def q_dedup_semantic_rerank(spark, sf_dir):
    """The modern two-stage semantic dedup: MinHash-LSH candidate
    pairs (lexical recall) re-scored by the exact embedding cosine
    (semantic precision) — pairs survive when EITHER signal is strong
    (jaccard >= 0.5 came from the LSH verify; cosine adds the
    paraphrase dimension the shingle overlap can't see). One broadcast
    join of the candidate pairs against the quantized vectors; the
    cosine is the same single-IEEE-expression recipe as the knn
    family."""
    from .pipeline.dedup import minhash_lsh_pairs
    from .pipeline.similarity import _COS, _dot, quantize_embeddings
    from .workload_pipeline import _docs, _emb
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), n=3, num_hashes=12,
                              bands=4, rows=3, threshold_x10000=5000)
    q = quantize_embeddings(_emb(spark, sf_dir)).select(
        "vec_id", "qvec", "qnorm2")
    return (pairs
            .join(q.select(F.col("vec_id").alias("id_a"),
                           F.col("qvec").alias("qv"),
                           F.col("qnorm2").alias("_n2a")), "id_a")
            .join(q.select(F.col("vec_id").alias("id_b"),
                           F.col("qvec").alias("cv"),
                           F.col("qnorm2").alias("_n2b")), "id_b")
            .withColumn("_dot", _dot("qv", "cv"))
            .select("id_a", "id_b", "jaccard_x10000",
                    F.round(F.expr(_COS), 6).alias("cos")))


def _oracle_semantic_rerank() -> str:
    from .workload_pipeline import _oracle_minhash_lsh
    return (
        f"WITH lsh AS ({_oracle_minhash_lsh()}), "
        "nv AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v "
        "FROM embeddings), "
        "nn AS (SELECT vec_id, v, "
        "CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2 "
        "FROM nv) "
        "SELECT lsh.id_a, lsh.id_b, lsh.jaccard_x10000, "
        "round(CAST(CAST(list_sum(list_transform("
        "generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])) AS BIGINT) "
        "AS DOUBLE) / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)), 6) "
        "AS cos "
        "FROM lsh JOIN nn a ON a.vec_id = lsh.id_a "
        "JOIN nn b ON b.vec_id = lsh.id_b")


# ---------------------------------------------------------------------------
# FIND PATH: path-string reconstruction over the SSSP parent tree
# ---------------------------------------------------------------------------

def q_find_path_strings(spark, sf_dir):
    """FIND SHORTEST PATH parity (the graphd surface served by the
    reference's GetNeighbors chain): reconstruct the actual
    '->'-joined vertex paths from customer 1 to the 5 nearest
    part-layer vertices by walking the deterministic sssp parent tree
    4 hops — K parent-hop joins of a 5-row frame against the tree, the
    same plan at any graph size."""
    from .workload import q_sssp_parent_tree
    tree = q_sssp_parent_tree(spark, sf_dir).transform(_pin)
    targets = (tree.filter(F.col("node") >= 20_000_000)
               .orderBy("dist", "node").limit(5)
               .select(F.col("node").alias("target"), "dist"))
    state = targets.select(
        "target", "dist", F.col("target").alias("cur"),
        F.col("target").cast("string").alias("path"))
    hop = tree.select(F.col("node").alias("cur"), "parent")
    for _ in range(4):
        state = (state.join(hop, "cur", "left")
                 .select("target", "dist",
                         F.expr("CASE WHEN parent IS NULL OR parent = cur "
                                "THEN cur ELSE parent END").alias("cur"),
                         F.expr("CASE WHEN parent IS NULL OR parent = cur "
                                "THEN path ELSE concat(CAST(parent AS "
                                "STRING), '->', path) END").alias("path")))
    return state.select("target", "dist", "path")


def _oracle_find_path() -> str:
    from .workload import ORACLE_EXT
    parts = [
        f"tree AS MATERIALIZED ({ORACLE_EXT['sssp_parent_tree']})",
        "tg AS (SELECT node AS target, dist FROM tree "
        "WHERE node >= 20000000 ORDER BY dist, node LIMIT 5)",
        "s0 AS (SELECT target, dist, target AS cur, "
        "CAST(target AS VARCHAR) AS path FROM tg)",
    ]
    for i in range(4):
        parts.append(
            f"s{i+1} AS (SELECT s.target, s.dist, "
            f"CASE WHEN t.parent IS NULL OR t.parent = s.cur "
            f"THEN s.cur ELSE t.parent END AS cur, "
            f"CASE WHEN t.parent IS NULL OR t.parent = s.cur "
            f"THEN s.path ELSE CAST(t.parent AS VARCHAR) || '->' || s.path "
            f"END AS path FROM s{i} s LEFT JOIN tree t ON t.node = s.cur)")
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT target, dist, path FROM s4")


# ---------------------------------------------------------------------------
# embedding smoothing (1-round GNN-style neighbor aggregation)
# ---------------------------------------------------------------------------

def q_embedding_smoothing(spark, sf_dir):
    """One round of neighbor feature aggregation (the GraphSAGE-mean /
    label-smoothing primitive): for each of the first 10 vectors, the
    element-wise truncating-integer mean of its exact top-5 cosine
    neighbors' quantized vectors, reported per dimension. Composes the
    gated knn_bruteforce edge set with a posexplode + (q_id, dim) hash
    aggregate — vector math as columnar aggregation, no UDFs."""
    from .pipeline.similarity import knn_bruteforce
    from .workload_pipeline import KNN_QUERY_IDS, _emb
    emb = _emb(spark, sf_dir)
    nn = knn_bruteforce(emb, KNN_QUERY_IDS, k=5).select("q_id", "n_id")
    ivec = F.expr("transform(embedding, x -> "
                  "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
    vecs = emb.select(F.col("vec_id").alias("n_id"), ivec.alias("v"))
    return (nn.join(vecs, "n_id")
            .select("q_id", F.posexplode("v").alias("dim", "x"))
            .groupBy("q_id", F.col("dim").cast("bigint").alias("dim"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr("sum(x) DIV count(*)").alias("mean_q")))


def _oracle_smoothing() -> str:
    from .workload_pipeline import _oracle_knn_bruteforce
    return (
        f"WITH nn5 AS ({_oracle_knn_bruteforce()}), "
        "vecs AS (SELECT vec_id AS n_id, list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v "
        "FROM embeddings), "
        "ex AS (SELECT nn5.q_id, t.i - 1 AS dim, vecs.v[t.i] AS x "
        "FROM nn5 JOIN vecs USING (n_id), "
        "UNNEST(generate_series(1, 64)) t(i)) "
        "SELECT q_id, dim, count(*) AS n, sum(x) // count(*) AS mean_q "
        "FROM ex GROUP BY q_id, dim")


# ---------------------------------------------------------------------------
# k-center (farthest-point) seeding — the deterministic k-means++ analog
# ---------------------------------------------------------------------------

def q_kcenter_init(spark, sf_dir):
    """Farthest-point traversal (Gonzalez k-center, the deterministic
    analog of k-means++ D² seeding): start from vec_id 0, then K-1
    rounds of 'pick the point with the max exact integer distance² to
    its nearest chosen center' (ties to the smallest id). Each round is
    one broadcast distance pass + a 1-row TakeOrdered — the
    scalable-init story for pipeline/cluster.py's first-k seeding.
    Output: (center_idx, vec_id, d2_to_prev_centers)."""
    from .workload_pipeline import _emb
    k = 4
    ivec = F.expr("transform(embedding, x -> "
                  "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
    pts = (_emb(spark, sf_dir)
           .select("vec_id", ivec.alias("v")).transform(_pin))
    d2 = ("aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), "
          "CAST(0 AS BIGINT), (acc, d) -> acc + d)")
    centers = (pts.filter(F.col("vec_id") == 0)
               .select(F.lit(0).alias("center_idx"), "vec_id",
                       F.lit(0).cast("long").alias("d2"),
                       F.col("v").alias("c")))
    chosen = centers.localCheckpoint()
    for r in range(1, k):
        mind = (pts.crossJoin(F.broadcast(chosen.select("c")))
                .select("vec_id", "v", F.expr(d2).alias("dd"))
                .groupBy("vec_id")
                .agg(F.min("dd").alias("mind"), F.first("v").alias("v")))
        far = (mind.join(chosen.select("vec_id"), "vec_id", "left_anti")
               .orderBy(F.desc("mind"), "vec_id").limit(1)
               .select(F.lit(r).alias("center_idx"), "vec_id",
                       F.col("mind").alias("d2"), F.col("v").alias("c")))
        chosen = chosen.unionByName(far).localCheckpoint()
    return chosen.select("center_idx", "vec_id", "d2")


def _oracle_kcenter(k: int = 4) -> str:
    d2 = ("list_sum(list_transform(list_zip(p.v, c.c), "
          "s -> (s[1] - s[2]) * (s[1] - s[2])))")
    parts = [
        "pts AS MATERIALIZED (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v "
        "FROM embeddings)",
        "ch0 AS (SELECT 0 AS center_idx, vec_id, "
        "CAST(0 AS BIGINT) AS d2, v AS c FROM pts WHERE vec_id = 0)",
    ]
    for r in range(1, k):
        prev = " UNION ALL ".join(f"SELECT * FROM ch{i}" for i in range(r))
        parts.append(
            f"m{r} AS (SELECT p.vec_id, p.v, min({d2}) AS mind "
            f"FROM pts p CROSS JOIN ({prev}) c GROUP BY p.vec_id, p.v)")
        parts.append(
            f"ch{r} AS (SELECT {r} AS center_idx, vec_id, mind AS d2, "
            f"v AS c FROM m{r} WHERE vec_id NOT IN "
            f"(SELECT vec_id FROM ({prev})) "
            f"ORDER BY mind DESC, vec_id LIMIT 1)")
    sel = " UNION ALL ".join(
        f"SELECT center_idx, vec_id, d2 FROM ch{i}" for i in range(k))
    return "WITH " + ",\n".join(parts) + "\n" + sel


# ---------------------------------------------------------------------------
# rendezvous (highest-random-weight) part assignment
# ---------------------------------------------------------------------------

def q_rendezvous_parts(spark, sf_dir):
    """Elastic part placement: each customer vid lands on the part with
    the highest md5(vid '#' part) weight (rendezvous hashing). The
    reference pins vid -> part by modulo (utils/NebulaKeyUtils.h:97-99
    getPart), so growing the cluster reshuffles nearly every key;
    rendezvous moves only ~1/(P+1). Output: per-part row counts under
    P=8 and the count of keys that MOVE when P grows to 9 — the
    elasticity evidence, exact. One explode x P+1 + two aggregates."""
    g = tpch_graph(spark, sf_dir)
    vids = g.vertices["customer"].select(F.col(VID).alias("vid"))
    h = ("CAST(conv(substring(md5(concat(CAST(vid AS STRING), '#', "
         "CAST(p AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    w = (vids.select("vid", F.explode(F.expr(
            "sequence(0, 8)")).alias("p"))
         .withColumn("hw", F.expr(h)))
    a8 = (w.filter("p < 8").groupBy("vid")
          .agg(F.expr("max_by(p, struct(hw, p))").alias("part8")))
    a9 = (w.groupBy("vid")
          .agg(F.expr("max_by(p, struct(hw, p))").alias("part9")))
    both = a8.join(a9, "vid")
    per_part = both.groupBy(
        F.col("part8").cast("bigint").alias("part")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.expr("CASE WHEN part8 != part9 THEN 1 ELSE 0 END"))
        .alias("moved_keys"))
    return per_part


ORACLE_RENDEZVOUS = (
    "WITH vids AS (SELECT c_custkey AS vid FROM customer), "
    "w AS (SELECT vid, p, "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(substr(md5(CAST(vid AS VARCHAR) || '#' || "
    "CAST(p AS VARCHAR)), 1, 15), ''), "
    "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
    "(x, y) -> x * 16 + y) AS hw "
    "FROM vids, (SELECT unnest(generate_series(0, 8)) AS p)), "
    "a8 AS (SELECT vid, p AS part8 FROM w WHERE p < 8 "
    "QUALIFY row_number() OVER (PARTITION BY vid "
    "ORDER BY hw DESC, p DESC) = 1), "
    "a9 AS (SELECT vid, p AS part9 FROM w "
    "QUALIFY row_number() OVER (PARTITION BY vid "
    "ORDER BY hw DESC, p DESC) = 1) "
    "SELECT part8 AS part, count(*) AS n_keys, "
    "sum(CASE WHEN part8 <> part9 THEN 1 ELSE 0 END) AS moved_keys "
    "FROM a8 JOIN a9 USING (vid) GROUP BY part8")


# ---------------------------------------------------------------------------
# hard-negative mining (contrastive training pairs)
# ---------------------------------------------------------------------------

def q_hard_negative_mining(spark, sf_dir):
    """Contrastive-training pair mining: for each of the first 10
    vectors, the single most-similar vector from a DIFFERENT k-means
    cluster — the classic hard negative (high cosine, different
    semantic bucket). Composes the gated kmeans assignment with the
    broadcast cosine scan; per-query top-1 is WindowGroupLimit."""
    from .pipeline.cluster import kmeans_fixed
    from .pipeline.similarity import _COS, _dot, quantize_embeddings
    from .workload_pipeline import _emb
    emb = _emb(spark, sf_dir)
    clus = kmeans_fixed(emb, k=8, iterations=2).select("vec_id", "cluster")
    q = quantize_embeddings(emb).join(clus, "vec_id")
    corpus = q.select(F.col("vec_id").alias("n_id"),
                      F.col("qvec").alias("cv"), F.col("qnorm2").alias("_n2b"),
                      F.col("cluster").alias("n_cluster"))
    queries = (q.filter(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("qvec").alias("qv"),
                       F.col("qnorm2").alias("_n2a"),
                       F.col("cluster").alias("q_cluster")))
    pairs = (F.broadcast(queries).crossJoin(corpus)
             .filter(F.col("q_cluster") != F.col("n_cluster"))
             .withColumn("_dot", _dot("qv", "cv"))
             .withColumn("c", F.expr(_COS)))
    w = W.partitionBy("q_id").orderBy(F.col("c").desc(), F.col("n_id"))
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .select("q_id", "q_cluster", "n_id", "n_cluster",
                    F.round("c", 6).alias("cos")))


def _oracle_hard_negative() -> str:
    from .pipeline.cluster import kmeans_oracle_sql
    km = kmeans_oracle_sql(k=8, iterations=2)
    return (
        f"WITH km AS ({km}), "
        "n AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v "
        "FROM embeddings), "
        "nn AS (SELECT vec_id, v, "
        "CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2 "
        "FROM n), "
        "j AS (SELECT nn.vec_id, nn.v, nn.n2, km.cluster "
        "FROM nn JOIN km USING (vec_id)), "
        "p AS (SELECT a.vec_id AS q_id, a.cluster AS q_cluster, "
        "b.vec_id AS n_id, b.cluster AS n_cluster, "
        "CAST(CAST(list_sum(list_transform(generate_series(1, len(a.v)), "
        "i -> a.v[i] * b.v[i])) AS BIGINT) AS DOUBLE) / "
        "sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS c "
        "FROM j a JOIN j b ON a.cluster <> b.cluster WHERE a.vec_id < 10) "
        "SELECT q_id, q_cluster, n_id, n_cluster, round(c, 6) AS cos FROM p "
        "QUALIFY row_number() OVER (PARTITION BY q_id "
        "ORDER BY c DESC, n_id) <= 1")


# ---------------------------------------------------------------------------
# dangling-edge GC sweep
# ---------------------------------------------------------------------------

def q_store_bucketed_upsert(spark, sf_dir):
    """End-to-end driver gate for the bucketed WRITE path (r11 verdict
    Next #5): lay `part` out in the hash-bucketed `_bucket=` layout
    (the O(touched-bucket) partial-rewrite posture the reference prices
    as a per-part RocksDB WriteBatch, mutate/AddVerticesProcessor.cpp:
    227-283), then run the full mutation lifecycle IN PLACE through the
    shared bucketed_layout helper — a conditional upsert (update branch
    gated on the pre-image, UpdateNode.h:151-440 semantics) whose batch
    also INSERTS 50 new keys, followed by a keyed delete — and read the
    table back. The batch key is deliberately INT against the BIGINT
    table so the sidecar-validated dtype alignment path is driver-gated
    too. The oracle states the logical post-image; equality proves the
    pruned partial rewrites compose to exactly the full-table
    semantics (same hash => same bucket)."""
    import shutil
    from .graph import read_parquet
    from .mutate.bucketed import (delete_bucketed, read_bucketed,
                                  upsert_bucketed, write_bucketed)
    from .staging import pid_staging_root, sf_tag
    table = read_parquet(spark, f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("k"), F.col("p_brand").alias("brand"),
        F.expr(f"{_RETAIL_CENTS}").alias("cents"))
    root = pid_staging_root("/tmp/nebula_spark_bucketed", sf_tag(sf_dir))
    path = os.path.join(root, "part_store")
    shutil.rmtree(path, ignore_errors=True)
    write_bucketed(table, "k", path, n_buckets=8)
    # conditional upsert: +500 cents on even-cent rows of the k%7==3
    # slice (condition sees the PRE-image), plus 50 brand-new keys far
    # above the existing range; batch key INT vs table BIGINT exercises
    # align_key_types' widening path under the gate
    updates = table.filter(F.col("k") % 7 == 3).select(
        F.col("k").cast("int").alias("k"),
        F.lit(500).cast("bigint").alias("delta"),
        F.lit(None).cast("string").alias("brand"))
    inserts = spark.range(50).select(
        (F.lit(10 ** 9) + F.col("id")).cast("int").alias("k"),
        (F.col("id") * 100).cast("bigint").alias("delta"),
        F.lit("Brand#NEW").alias("brand"))
    upsert_bucketed(
        spark, path, updates.unionByName(inserts), ["k"],
        {"cents": "coalesce(t.cents, CAST(0 AS BIGINT)) + s.delta",
         "brand": "coalesce(t.brand, s.brand)"},
        condition="t.cents % 2 = 0")
    dels = read_bucketed(spark, path).filter(F.col("k") % 11 == 0)
    delete_bucketed(spark, path, dels.select("k"), "k")
    return (read_bucketed(spark, path)
            .select("k", "brand", "cents").orderBy("k"))


ORACLE_BUCKETED_UPSERT = (
    "WITH base AS (SELECT p_partkey AS k, p_brand AS brand, "
    "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
    "FROM part), "
    "upserted AS ("
    "SELECT k, brand, CASE WHEN k % 7 = 3 AND cents % 2 = 0 "
    "THEN cents + 500 ELSE cents END AS cents FROM base "
    "UNION ALL "
    "SELECT 1000000000 + range AS k, 'Brand#NEW' AS brand, "
    "CAST(range * 100 AS BIGINT) AS cents FROM range(50)) "
    "SELECT k, brand, cents FROM upserted WHERE k % 11 <> 0 ORDER BY k")


def q_store_orphan_gc(spark, sf_dir):
    """Dangling-edge garbage collection: after a NON-cascaded vertex
    delete (the crash-between-mutations state the reference's cascade
    normally prevents — mutate/DeleteVerticesProcessor removes the
    vertex row and its edges in one batch; a partial failure leaves
    orphans), the GC sweep reports every placed edge with an
    unresolvable endpoint. Two broadcast-able anti-join-shaped left
    joins, no full-table compare."""
    g = tpch_graph(spark, sf_dir)
    cust = (g.vertices["customer"].filter(F.col(VID) % 13 != 0)
            .select(F.col(VID).alias("c")))
    orders = (g.vertices["order"].filter(F.col(VID) % 17 != 0)
              .select(F.col(VID).alias("o")))
    placed = g.edges["placed"].select(SRC, DST, "_rank")
    marked = (placed
              .join(cust.withColumn("src_ok", F.lit(1)),
                    placed[SRC] == cust["c"], "left")
              .join(orders.withColumn("dst_ok", F.lit(1)),
                    placed[DST] == orders["o"], "left"))
    return (marked
            .filter("src_ok IS NULL OR dst_ok IS NULL")
            .select(SRC, DST, "_rank",
                    F.expr("CASE WHEN src_ok IS NULL AND dst_ok IS NULL "
                           "THEN 'both' WHEN src_ok IS NULL THEN 'src' "
                           "ELSE 'dst' END").alias("missing")))


ORACLE_ORPHAN_GC = (
    "WITH cust AS (SELECT c_custkey AS c FROM customer "
    "WHERE c_custkey % 13 <> 0), "
    "ords AS (SELECT o_orderkey AS o FROM orders "
    "WHERE o_orderkey % 17 <> 0), "
    "placed AS (SELECT o_custkey AS src, o_orderkey AS dst, "
    "0 AS rnk FROM orders) "
    "SELECT p.src AS _src, p.dst AS _dst, p.rnk AS _rank, "
    "CASE WHEN c.c IS NULL AND o.o IS NULL THEN 'both' "
    "WHEN c.c IS NULL THEN 'src' ELSE 'dst' END AS missing "
    "FROM placed p LEFT JOIN cust c ON c.c = p.src "
    "LEFT JOIN ords o ON o.o = p.dst "
    "WHERE c.c IS NULL OR o.o IS NULL")


# ---------------------------------------------------------------------------
# bipartite butterfly (K2,2) counting
# ---------------------------------------------------------------------------

def q_butterfly_count(spark, sf_dir):
    """Butterfly (K2,2) census of the part-supplier bipartite graph —
    the bipartite analog of triangle counting (cohesion of the supply
    network): butterflies = sum over vertex pairs of one side of
    C(shared_neighbours, 2), plus both wedge totals and the
    butterfly-per-supplier-wedge density x1e6. Pair expansion is the
    per-group HOF transform (codegen, no self-join), run on the side
    with FEWER wedges (Sanei-Mehri et al.'s side selection — both
    orientations count every K2,2 exactly once, so the result is
    identical; see the inline note for the measured 31x win)."""
    g = tpch_graph(spark, sf_dir)
    ps = (g.edges["supplied_by"]
          .select(F.col(SRC).alias("p"), F.col(DST).alias("s")).distinct()
          .transform(_pin))
    ws = (ps.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
          .agg(F.sum(F.expr("d * (d - 1) DIV 2")).alias("wedges_supplier")))
    wp = (ps.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
          .agg(F.sum(F.expr("d * (d - 1) DIV 2")).alias("wedges_part")))
    # DYNAMIC wedge orientation (r12, from the measured sf0.1 tail):
    # a K2,2 contributes exactly one wedge PAIR in each orientation, so
    # sum(C(shared,2)) over part-pairs grouped by shared suppliers ==
    # the same sum over supplier-pairs grouped by shared parts — count
    # from whichever side has FEWER wedges (two scalar aggregates we
    # already publish; bounded-metadata driver decision). On the sf0.1
    # graph that is the part side: 8.7 M wedges vs 175 M (avg supplier
    # degree 591 vs part degree 30) — measured 331 s → 10.5 s. At 100 TB
    # the low-wedge orientation IS the hub mitigation (the quadratic
    # fanout runs on the side where it is provably smaller); a graph
    # with hubs on BOTH sides needs degree-ordered wedge splitting,
    # triangle_counts' pattern.
    # `or 0`: sum() over an empty edge set is NULL → None driver-side;
    # a bare comparison would raise TypeError (r12 ADVICE low).
    w_s = ws.first()["wedges_supplier"] or 0
    w_p = wp.first()["wedges_part"] or 0
    key, val = ("p", "s") if w_p <= w_s else ("s", "p")
    grouped = ps.groupBy(key).agg(F.sort_array(F.collect_set(val))
                                  .alias("xs"))
    shared = (grouped.select(F.explode(F.expr(
        "flatten(transform(xs, (x, i) -> "
        "transform(slice(xs, i + 2, size(xs) - i - 1), "
        "y -> struct(x AS a, y AS b))))")).alias("e"))
        .groupBy(F.col("e.a").alias("k1"), F.col("e.b").alias("k2"))
        .agg(F.count(F.lit(1)).alias("shared")))
    bf = shared.agg(F.sum(F.expr("shared * (shared - 1) DIV 2"))
                    .alias("butterflies"))
    return (bf.crossJoin(F.broadcast(ws)).crossJoin(F.broadcast(wp))
            .select("butterflies", "wedges_supplier", "wedges_part",
                    F.expr("(1000000 * butterflies) DIV wedges_supplier")
                    .alias("density_x1e6")))


ORACLE_BUTTERFLY = (
    "WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s "
    "FROM lineitem), "
    # part-side wedge orientation, same as the Spark side's dynamic
    # pick on this graph (both orientations count every K2,2 once)
    "pairs AS (SELECT a.s AS s1, b.s AS s2, count(*) AS shared "
    "FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s "
    "GROUP BY a.s, b.s), "
    "bf AS (SELECT sum(shared * (shared - 1) // 2) AS butterflies "
    "FROM pairs), "
    "ws AS (SELECT sum(d * (d - 1) // 2) AS wedges_supplier FROM "
    "(SELECT s, count(*) AS d FROM ps GROUP BY s)), "
    "wp AS (SELECT sum(d * (d - 1) // 2) AS wedges_part FROM "
    "(SELECT p, count(*) AS d FROM ps GROUP BY p)) "
    "SELECT butterflies, wedges_supplier, wedges_part, "
    "(1000000 * butterflies) // wedges_supplier AS density_x1e6 "
    "FROM bf CROSS JOIN ws CROSS JOIN wp")


# ---------------------------------------------------------------------------
# ANN recall evaluation (IVF vs exact, inside the gate)
# ---------------------------------------------------------------------------

def q_ann_recall_eval(spark, sf_dir):
    """Recall@5 of the single-probe IVF index against the exact
    brute-force answer, per query — the accuracy/latency dial measured
    INSIDE the oracle gate (BENCH_NOTES holds the 1M-vector latency
    side; this pins the accuracy side at the driver's scale). One
    left-semi join of the two top-k frames + two tiny aggregates."""
    from .workload_pipeline import q_knn_bruteforce, q_knn_ivf
    ivf = q_knn_ivf(spark, sf_dir).select("q_id", "n_id")
    brute = q_knn_bruteforce(spark, sf_dir).select("q_id", "n_id")
    hits = (brute.join(ivf, ["q_id", "n_id"], "left_semi")
            .groupBy("q_id").agg(F.count(F.lit(1)).alias("hits")))
    base = brute.groupBy("q_id").agg(F.count(F.lit(1)).alias("k"))
    return (base.join(hits, "q_id", "left")
            .select("q_id", F.coalesce("hits", F.lit(0)).alias("hits"), "k",
                    F.expr("(1000000 * coalesce(hits, 0)) DIV k")
                    .alias("recall_x1e6")))


def _oracle_ann_recall() -> str:
    from .workload_pipeline import _oracle_knn_bruteforce, _oracle_knn_ivf
    return (
        f"WITH ivf AS ({_oracle_knn_ivf()}), "
        f"brute AS ({_oracle_knn_bruteforce()}), "
        "h AS (SELECT b.q_id, count(*) AS hits FROM brute b "
        "JOIN ivf i ON i.q_id = b.q_id AND i.n_id = b.n_id "
        "GROUP BY b.q_id), "
        "base AS (SELECT q_id, count(*) AS k FROM brute GROUP BY q_id) "
        "SELECT base.q_id, coalesce(h.hits, 0) AS hits, base.k, "
        "(1000000 * coalesce(h.hits, 0)) // base.k AS recall_x1e6 "
        "FROM base LEFT JOIN h ON h.q_id = base.q_id")


# ---------------------------------------------------------------------------
# streaming watermark late-data drop
# ---------------------------------------------------------------------------

def q_stream_late_data(spark, sf_dir):
    """Watermark drop/finalize semantics end-to-end: three staged
    micro-batches (newest half, next quarter, oldest quarter), 1 h
    watermark, append emission — the oracle encodes the measured drop
    boundary including Spark's one-batch watermark-propagation lag.
    See streaming/window.py stream_late_data."""
    from .streaming.window import stream_late_data
    return stream_late_data(spark, sf_dir)


ORACLE_LATE_DATA = (
    "WITH s AS (SELECT CAST(floor(epoch(max(ts)) * 1000) AS BIGINT) "
    "AS maxms, (CAST(floor(epoch(min(ts))) AS BIGINT) "
    "+ CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS cut, "
    "(CAST(floor(epoch(min(ts))) AS BIGINT) "
    "+ (CAST(floor(epoch(min(ts))) AS BIGINT) "
    "+ CAST(floor(epoch(max(ts))) AS BIGINT)) // 2) // 2 AS cut2 "
    "FROM events), "
    "e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, "
    "(CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS ws FROM events) "
    # the oldest quarter (es < cut2) arrives two batches behind the
    # watermark and is dropped; the mid quarter is inside the one-batch
    # propagation lag and accepted; append emits finalized windows only
    # make_timestamp(µs): to_timestamp() yields TIMESTAMPTZ, which the
    # driver fetches tz-aware (datetime64[ns, UTC]) while Spark's window
    # start fetches naive — a schema mismatch even when values agree
    # (r5 driver red row). CAST(to_timestamp(..) AS TIMESTAMP) fixed the
    # schema but rendered the epoch in DuckDB's SESSION timezone (host
    # TZ by default) while Spark pins UTC — correct only on a UTC host.
    # make_timestamp builds the naive TIMESTAMP from epoch micros
    # directly, timezone-free on any host (r6 advice).
    "SELECT make_timestamp(ws * 1000000) AS hour, event_type, "
    "count(*) AS cnt "
    "FROM e, s WHERE es >= cut2 "
    "AND (ws + 3600) * 1000 <= maxms - 3600000 "
    "GROUP BY ws, event_type")


# ---------------------------------------------------------------------------
# RFM customer segmentation (mean-split octants)
# ---------------------------------------------------------------------------

def q_rfm_segments(spark, sf_dir):
    """Recency/frequency/monetary segmentation of customers into the 8
    above/below-mean octants (segment = 4*recent + 2*frequent +
    1*big_spender), with per-segment size and exact aggregate sums.
    Mean comparisons use integer cross-multiplication (metric * n vs
    sum) — no division, no quantile window; the corpus-level sums ride
    one broadcast scalar row. Recency is days before the corpus's last
    order date."""
    g = tpch_graph(spark, sf_dir)
    orders = g.vertices["order"]
    placed = g.edges["placed"].select(F.col(SRC).alias("cust"),
                                      F.col(DST).alias(VID))
    per = (placed.join(orders, VID)
           .groupBy("cust")
           .agg(F.max(F.to_date("o_orderdate")).alias("last_day"),
                F.count(F.lit(1)).alias("freq"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("bigint").alias("cents")))
    scal = per.agg(
        F.max("last_day").alias("maxd"), F.count(F.lit(1)).alias("n"),
        F.sum("freq").alias("sf"), F.sum("cents").alias("sc"))
    feat = (per.crossJoin(F.broadcast(scal))
            .select("cust",
                    F.datediff("maxd", "last_day").alias("rec"),
                    "freq", "cents", "n", "sf", "sc"))
    rsum = feat.agg(F.sum("rec").alias("sr"))
    seg = (feat.crossJoin(F.broadcast(rsum))
           .select("cust", "rec", "freq", "cents",
                   # metric*n ~ 1e18+ at the 100 TB design point:
                   # cross-multiply in DECIMAL(38,0); segment stays int
                   F.expr("CASE WHEN CAST(rec AS DECIMAL(38,0)) * n <= sr "
                          "THEN 4 ELSE 0 END + "
                          "CASE WHEN CAST(freq AS DECIMAL(38,0)) * n > sf "
                          "THEN 2 ELSE 0 END + "
                          "CASE WHEN CAST(cents AS DECIMAL(38,0)) * n > sc "
                          "THEN 1 ELSE 0 END")
                   .alias("segment")))
    return (seg.groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("rec").alias("sum_recency_days"),
                 F.sum("freq").alias("sum_orders"),
                 F.sum("cents").alias("sum_cents")))


ORACLE_RFM = (
    "WITH per AS (SELECT o_custkey AS cust, "
    "max(CAST(o_orderdate AS DATE)) AS last_day, count(*) AS freq, "
    "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) "
    "AS cents FROM orders GROUP BY o_custkey), "
    "s AS (SELECT max(last_day) AS maxd, count(*) AS n, "
    "sum(freq) AS sf, sum(cents) AS sc FROM per), "
    "f AS (SELECT cust, date_diff('day', last_day, maxd) AS rec, "
    "freq, cents, n, sf, sc FROM per CROSS JOIN s), "
    "r AS (SELECT sum(rec) AS sr FROM f), "
    "seg AS (SELECT cust, rec, freq, cents, "
    "CASE WHEN CAST(rec AS HUGEINT) * n <= sr THEN 4 ELSE 0 END + "
    "CASE WHEN CAST(freq AS HUGEINT) * n > sf THEN 2 ELSE 0 END + "
    "CASE WHEN CAST(cents AS HUGEINT) * n > sc THEN 1 ELSE 0 END AS segment "
    "FROM f CROSS JOIN r) "
    "SELECT segment, count(*) AS n_customers, "
    "sum(rec) AS sum_recency_days, sum(freq) AS sum_orders, "
    "sum(cents) AS sum_cents FROM seg GROUP BY segment")


# ---------------------------------------------------------------------------
# Merkle-bucket replica diff (anti-entropy repair)
# ---------------------------------------------------------------------------

def q_store_merkle_diff(spark, sf_dir):
    """Replica anti-entropy: locate divergence between two copies of
    the customer tag via bucket digests before any row-level compare —
    the scalable repair protocol behind the reference's Raft replica
    consistency (raftex/RaftPart.h keeps replicas aligned by log; an
    engine on object storage detects drift by digest exchange instead).
    Level 1: 64 bucket digests (sum of md5 row-hashes) per replica —
    comparing replicas costs 64 rows, not |table|. Level 2: row-level
    full-outer compare ONLY inside diverging buckets. Replica B is
    replica A with seeded deletions (vid%97==3), a mutation (vid%101==5)
    and one insert, so the report is deterministic. Output: (vid,
    bucket, status in {missing_b, missing_a, mismatch})."""
    g = tpch_graph(spark, sf_dir)
    a = g.vertices["customer"].select(
        VID, "c_name", "c_nationkey", "c_mktsegment")
    b = (a.filter(F.col(VID) % 97 != 3)
         .withColumn("c_name", F.when(
             F.col(VID) % 101 == 5,
             F.concat(F.col("c_name"), F.lit("#drift")))
             .otherwise(F.col("c_name")))
         .unionByName(spark.createDataFrame(
             [(99_999_999, "phantom", 0, "NONE")],
             f"{VID} bigint, c_name string, c_nationkey int, "
             "c_mktsegment string")))
    h = ("CAST(conv(substring(md5(concat_ws('|', CAST(_vid AS STRING), "
         "c_name, CAST(c_nationkey AS STRING), c_mktsegment)), 1, 15), "
         "16, 10) AS BIGINT)")

    def digest(df):
        return (df.withColumn("h", F.expr(h))
                .withColumn("bucket", F.col(VID) % 64))
    da, db = digest(a), digest(b)
    # digest terms reduced mod 2^32 so the per-bucket sum stays far from
    # int64 overflow (safe to ~2^31 rows per bucket); the row-level
    # compare below still uses the full 60-bit hash
    sa = da.groupBy("bucket").agg(
        F.sum(F.col("h") % 4294967296).alias("dig_a"))
    sb = db.groupBy("bucket").agg(
        F.sum(F.col("h") % 4294967296).alias("dig_b"))
    div = (sa.join(sb, "bucket", "full_outer")
           .filter("dig_a IS DISTINCT FROM dig_b")
           .select("bucket"))
    ra = da.join(F.broadcast(div), "bucket").select(
        "bucket", VID, F.col("h").alias("ha"))
    rb = db.join(F.broadcast(div), "bucket").select(
        "bucket", VID, F.col("h").alias("hb"))
    return (ra.join(rb, ["bucket", VID], "full_outer")
            .filter("ha IS DISTINCT FROM hb")
            .select(F.col(VID).alias("vid"), "bucket",
                    F.expr("CASE WHEN hb IS NULL THEN 'missing_b' "
                           "WHEN ha IS NULL THEN 'missing_a' "
                           "ELSE 'mismatch' END").alias("status")))


ORACLE_MERKLE = (
    "WITH a AS (SELECT c_custkey AS vid, c_name, c_nationkey, "
    "c_mktsegment FROM customer), "
    "b AS (SELECT vid, CASE WHEN vid % 101 = 5 "
    "THEN c_name || '#drift' ELSE c_name END AS c_name, "
    "c_nationkey, c_mktsegment FROM a WHERE vid % 97 <> 3 "
    "UNION ALL SELECT 99999999, 'phantom', 0, 'NONE'), "
    "da AS (SELECT vid, vid % 64 AS bucket, "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(substr(md5(CAST(vid AS VARCHAR) || '|' || "
    "c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment), "
    "1, 15), ''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
    "(x, y) -> x * 16 + y) AS h FROM a), "
    "db AS (SELECT vid, vid % 64 AS bucket, "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(substr(md5(CAST(vid AS VARCHAR) || '|' || "
    "c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment), "
    "1, 15), ''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
    "(x, y) -> x * 16 + y) AS h FROM b), "
    "sa AS (SELECT bucket, sum(h % 4294967296) AS dig_a FROM da "
    "GROUP BY bucket), "
    "sb AS (SELECT bucket, sum(h % 4294967296) AS dig_b FROM db "
    "GROUP BY bucket), "
    "div AS (SELECT coalesce(sa.bucket, sb.bucket) AS bucket "
    "FROM sa FULL OUTER JOIN sb ON sa.bucket = sb.bucket "
    "WHERE dig_a IS DISTINCT FROM dig_b), "
    "ra AS (SELECT da.bucket, da.vid, da.h AS ha FROM da "
    "JOIN div USING (bucket)), "
    "rb AS (SELECT db.bucket, db.vid, db.h AS hb FROM db "
    "JOIN div USING (bucket)) "
    "SELECT coalesce(ra.vid, rb.vid) AS vid, "
    "coalesce(ra.bucket, rb.bucket) AS bucket, "
    "CASE WHEN hb IS NULL THEN 'missing_b' WHEN ha IS NULL "
    "THEN 'missing_a' ELSE 'mismatch' END AS status "
    "FROM ra FULL OUTER JOIN rb ON ra.bucket = rb.bucket "
    "AND ra.vid = rb.vid WHERE ha IS DISTINCT FROM hb")


# ---------------------------------------------------------------------------
# event-type Markov transition matrix
# ---------------------------------------------------------------------------

def q_events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of the per-user event
    stream: P(next_type | type) as integer x1e6 (truncating DIV over
    exact pair counts) plus the raw counts — the behavioral-model
    primitive on top of the lag() session features. The lag window
    partitions by user_id; the matrix aggregate is |types|^2 rows."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id",
                       F.lag("event_type").over(w).alias("from_type"),
                       F.col("event_type").alias("to_type"))
             .filter(F.col("from_type").isNotNull()))
    cnt = (pairs.groupBy("from_type", "to_type")
           .agg(F.count(F.lit(1)).alias("n")))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (cnt.join(tot, "from_type")
            .select("from_type", "to_type", "n", "row_total",
                    F.expr("(1000000 * n) DIV row_total").alias("p_x1e6")))


ORACLE_MARKOV = (
    "WITH p AS (SELECT user_id, "
    "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS from_type, event_type AS to_type FROM events), "
    "c AS (SELECT from_type, to_type, count(*) AS n FROM p "
    "WHERE from_type IS NOT NULL GROUP BY from_type, to_type), "
    "t AS (SELECT from_type, sum(n) AS row_total FROM c GROUP BY from_type) "
    "SELECT c.from_type, c.to_type, c.n, t.row_total, "
    "(1000000 * c.n) // t.row_total AS p_x1e6 "
    "FROM c JOIN t USING (from_type)")


# ---------------------------------------------------------------------------
# global transitivity (3x triangles / wedges)
# ---------------------------------------------------------------------------

def q_global_transitivity(spark, sf_dir):
    """Global transitivity of the co-order projection: 3*triangles /
    wedges as integer x1e6 — the one-number closure summary next to
    the per-node clustering_coefficient. Triangle count rides the
    degree-ordered enumeration (skew bound O(sqrt(|E|))); wedges are
    sum C(deg, 2) from one degree aggregate."""
    from .operators.analytics import triangle_counts
    pairs = _co_order_pairs(spark, sf_dir).distinct().transform(_pin)
    tri = (triangle_counts(pairs)
           .agg(F.expr("sum(n_triangles) DIV 3").alias("triangles")))
    und = pairs.union(pairs.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    wedges = (und.groupBy(SRC).agg(F.count(F.lit(1)).alias("deg"))
              .agg(F.sum(F.expr("deg * (deg - 1) DIV 2")).alias("wedges")))
    return (tri.crossJoin(F.broadcast(wedges))
            .select("triangles", "wedges",
                    F.expr("(1000000 * 3 * triangles) DIV wedges")
                    .alias("transitivity_x1e6")))


def _oracle_transitivity() -> str:
    from .operators.analytics import triangle_counts_oracle_sql
    tri = triangle_counts_oracle_sql(f"SELECT DISTINCT src, dst "
                                     f"FROM ({_ORACLE_CO_PAIRS})")
    return (
        f"WITH tc AS ({tri}), "
        "t AS (SELECT sum(n_triangles) // 3 AS triangles FROM tc), "
        f"p AS (SELECT DISTINCT src, dst FROM ({_ORACLE_CO_PAIRS})), "
        "b AS (SELECT src FROM p UNION ALL SELECT dst FROM p), "
        "d AS (SELECT src, count(*) AS deg FROM b GROUP BY src), "
        "w AS (SELECT sum(deg * (deg - 1) // 2) AS wedges FROM d) "
        "SELECT t.triangles, w.wedges, "
        "(1000000 * 3 * t.triangles) // w.wedges AS transitivity_x1e6 "
        "FROM t CROSS JOIN w")


EXT4_QUERIES = {
    "training_shards": q_training_shards,
    "bpe_train_merges": q_bpe_train_merges,
    "louvain_one_sweep": q_louvain_one_sweep,
    "conductance_brands": q_conductance_brands,
    "events_markov_transitions": q_events_markov_transitions,
    "global_transitivity": q_global_transitivity,
    "knn_pq_adc": q_knn_pq_adc,
    "knn_pq_rerank": q_knn_pq_rerank,
    "store_merkle_diff": q_store_merkle_diff,
    "events_new_users_daily": q_events_new_users_daily,
    "rfm_segments": q_rfm_segments,
    "stream_late_data": q_stream_late_data,
    "ann_recall_eval": q_ann_recall_eval,
    "butterfly_count": q_butterfly_count,
    "hard_negative_mining": q_hard_negative_mining,
    "store_bucketed_upsert": q_store_bucketed_upsert,
    "store_orphan_gc": q_store_orphan_gc,
    "kcenter_init": q_kcenter_init,
    "rendezvous_parts": q_rendezvous_parts,
    "embedding_smoothing": q_embedding_smoothing,
    "find_path_strings": q_find_path_strings,
    "dedup_semantic_rerank": q_dedup_semantic_rerank,
    "analyze_table_stats": q_analyze_table_stats,
    "event_type_trigrams": q_event_type_trigrams,
    "cluster_top_terms": q_cluster_top_terms,
    "degree_log_histogram": q_degree_log_histogram,
    "embedding_robust_scale": q_embedding_robust_scale,
    "greedy_set_cover": q_greedy_set_cover,
    "vocab_coverage_curve": q_vocab_coverage_curve,
    "user_churn_flags": q_user_churn_flags,
    "shard_balance_audit": q_shard_balance_audit,
    "dedup_jaccard_histogram": q_dedup_jaccard_histogram,
    "node2vec_walks": q_node2vec_walks,
    "greedy_coloring": q_greedy_coloring,
    "betweenness_2hop": q_betweenness_2hop,
    "events_winsorize": q_events_winsorize,
    "walk_visit_counts": q_walk_visit_counts,
    "closeness_centrality": q_closeness_centrality,
    "modularity_brands": q_modularity_brands,
    "bigram_lm_rarity": q_bigram_lm_rarity,
    "basket_affinity": q_basket_affinity,
    "source_tv_distance": q_source_tv_distance,
    "skyline_parts": q_skyline_parts,
    "events_mad_outliers": q_events_mad_outliers,
}


def build_ext4_oracles() -> dict[str, str]:
    return {
        "node2vec_walks": _oracle_node2vec(),
        "greedy_coloring": _oracle_coloring(),
        "betweenness_2hop": ORACLE_BETWEENNESS,
        "events_winsorize": ORACLE_WINSORIZE,
        "walk_visit_counts": _oracle_walk_visits(),
        "training_shards": ORACLE_SHARDS,
        "bpe_train_merges": _oracle_bpe_train(),
        "louvain_one_sweep": ORACLE_LOUVAIN,
        "conductance_brands": ORACLE_CONDUCTANCE,
        "events_markov_transitions": ORACLE_MARKOV,
        "global_transitivity": _oracle_transitivity(),
        "knn_pq_adc": _oracle_pq(),
        "knn_pq_rerank": _oracle_pq_rerank(),
        "store_merkle_diff": ORACLE_MERKLE,
        "events_new_users_daily": ORACLE_NEW_USERS,
        "rfm_segments": ORACLE_RFM,
        "stream_late_data": ORACLE_LATE_DATA,
        "ann_recall_eval": _oracle_ann_recall(),
        "butterfly_count": ORACLE_BUTTERFLY,
        "hard_negative_mining": _oracle_hard_negative(),
        "store_bucketed_upsert": ORACLE_BUCKETED_UPSERT,
        "store_orphan_gc": ORACLE_ORPHAN_GC,
        "kcenter_init": _oracle_kcenter(),
        "rendezvous_parts": ORACLE_RENDEZVOUS,
        "embedding_smoothing": _oracle_smoothing(),
        "find_path_strings": _oracle_find_path(),
        "dedup_semantic_rerank": _oracle_semantic_rerank(),
        "analyze_table_stats": ORACLE_ANALYZE,
        "event_type_trigrams": ORACLE_TRIGRAMS,
        "cluster_top_terms": _oracle_cluster_terms(),
        "degree_log_histogram": _oracle_degree_log_hist(),
        "embedding_robust_scale": ORACLE_ROBUST_SCALE,
        "greedy_set_cover": _oracle_set_cover(),
        "vocab_coverage_curve": ORACLE_VOCAB_COVERAGE,
        "user_churn_flags": ORACLE_CHURN,
        "shard_balance_audit": _oracle_shard_balance(),
        "dedup_jaccard_histogram": _oracle_jaccard_hist(),
        "closeness_centrality": _oracle_closeness(),
        "modularity_brands": ORACLE_MODULARITY,
        "bigram_lm_rarity": ORACLE_BIGRAM_LM,
        "basket_affinity": ORACLE_BASKET,
        "source_tv_distance": ORACLE_TV,
        "skyline_parts": ORACLE_SKYLINE,
        "events_mad_outliers": ORACLE_MAD,
    }
