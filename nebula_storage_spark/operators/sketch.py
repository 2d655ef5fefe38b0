"""Deterministic sketches: HyperLogLog cardinality estimation.

At 100 TB, COUNT(DISTINCT) over a high-cardinality key is a full
shuffle of every distinct value; an HLL sketch is a fixed 2^p-bucket
state mergeable across partitions — the standard cardinality primitive
of large-scale pipelines (and of every warehouse's approx_count_distinct).
Spark's built-in approx_count_distinct uses an engine-private hash, so
its output can't be oracle-checked. This implementation IS checkable:
md5-keyed 60-bit hashes, integer bucket/rank extraction via length(bin())
(exact msb, no float log2), and a final estimate computed with ONE
integer division from exact integer sums — bit-identical in any engine
with md5 + string ops, at any partitioning.

The small-range linear-counting correction (raw HLL overestimates badly
when n ≲ m) needs ln() — whose libm rounding differs across engines — so
the m-entry correction table round(m·ln(m/V)) is precomputed in Python
and embedded as identical integer constants in BOTH engines' expressions
(an array lookup on the zero-bucket count V). Every in-engine step stays
exact integer arithmetic.

Scale: one narrow map (hash/bucket/rank) + a (group, bucket) max
aggregate (≤ m rows per group survive the partial agg — the map-side
combine does almost all the work) + a group-level sum. Shuffle volume is
bounded by groups × m rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# raw-estimator alpha for m = 2^p, as an exact integer A(p) =
# round(alpha_m * m^2 * 2^53): est = A DIV S with
# S = sum over buckets of 2^(53 - max_rank)  (exact integers throughout)
_W_BITS = {p: 60 - p for p in range(4, 17)}


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _a_const(p: int) -> int:
    m = 1 << p
    return round(_alpha(m) * m * m * (1 << 53))


def _lc_table(p: int) -> list[int]:
    """Linear-counting estimates round(m·ln(m/V)) for V = 1..m zero
    buckets — precomputed so neither engine evaluates ln()."""
    import math
    m = 1 << p
    return [round(m * math.log(m / v)) for v in range(1, m + 1)]


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str],
                  p: int = 8, prefix: str = "hll#") -> DataFrame:
    """The materializable HLL STATE: per-group max-rank registers
    (group_cols…, __bucket, __r), ≤ 2^p rows per group regardless of
    input size. Registers merge by MAX — commutative, associative,
    idempotent — so a stored register table plus a delta's registers
    re-maxed is bit-identical to recomputing from all data: the law that
    makes COUNT(DISTINCT) maintainable incrementally at 100 TB."""
    if not 4 <= p <= 16:
        raise ValueError("hll needs 4 <= p <= 16")
    m = 1 << p
    wb = _W_BITS[p]                  # rank field width; rho ∈ [1, wb+1]
    top = wb + 1
    h = (f"CAST(conv(substring(md5(concat('{prefix}', "
         f"CAST({key_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    d = df.select(*group_cols, F.expr(h).alias("__h"))
    d = d.select(*group_cols,
                 (F.col("__h") % m).alias("__bucket"),
                 F.expr(f"__h DIV {m}").alias("__w"))
    rho = F.when(F.col("__w") == 0, F.lit(top)) \
        .otherwise(F.lit(top) - F.length(F.expr("bin(__w)")))
    return (d.select(*group_cols, "__bucket", rho.alias("__rho"))
            .groupBy(*group_cols, "__bucket")
            .agg(F.max("__rho").alias("__r")))


def hll_merge_registers(a: DataFrame, b: DataFrame,
                        group_cols: list[str]) -> DataFrame:
    """Merge two register tables (delta-apply): union → per-bucket MAX."""
    return (a.unionByName(b)
            .groupBy(*group_cols, "__bucket")
            .agg(F.max("__r").alias("__r")))


def hll_estimate(registers: DataFrame, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """Finish a register table into per-group estimates (n_est)."""
    m = 1 << p
    top = _W_BITS[p] + 1
    a = _a_const(p)
    sums = (registers.groupBy(*group_cols)
            .agg(F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {top} - __r)"))
                 .alias("__s_obs"),
                 F.count(F.lit(1)).alias("__nb")))
    lc = ", ".join(str(v) for v in _lc_table(p))
    raw = (f"{a} DIV (__s_obs + ({m} - __nb) * "
           f"shiftleft(CAST(1 AS BIGINT), {top}))")
    # standard HLL decision rule: below 2.5m with zero buckets present,
    # linear counting on the zero-bucket count V (table lookup) wins
    return sums.select(
        *group_cols,
        F.expr(f"CASE WHEN ({m} - __nb) > 0 AND ({raw}) * 2 <= {5 * m} "
               f"THEN element_at(array({lc}), CAST({m} - __nb AS INT)) "
               f"ELSE {raw} END").cast("long").alias("n_est"))


def hll_cardinality(df: DataFrame, key_col: str, group_cols: list[str],
                    p: int = 8, prefix: str = "hll#") -> DataFrame:
    """Per-group HLL cardinality estimate next to the exact distinct
    count (n_est, n_exact) — the exact column doubles as the operator's
    own accuracy witness. p ∈ [4, 16]."""
    regs = hll_registers(df, key_col, group_cols, p=p, prefix=prefix)
    est = hll_estimate(regs, group_cols, p=p)
    exact = (df.groupBy(*group_cols)
             .agg(F.countDistinct(key_col).alias("n_exact")))
    return est.join(exact, group_cols)


def _cm_bucket(j: int, col_sql: str, w: int, prefix: str) -> str:
    """Row-j bucket of the count-min sketch: 60-bit md5 prefix mod w —
    portable to any engine with md5 (the DuckDB oracle re-derives the
    identical expression)."""
    return (f"CAST(conv(substring(md5(concat('{prefix}{j}#', "
            f"CAST({col_sql} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            f" % {w}")


def count_min_estimates(items: DataFrame, queries: DataFrame,
                        item_col: str = "item", d: int = 4,
                        w: int = 1024, prefix: str = "cm") -> DataFrame:
    """Count-min sketch frequency estimates: build a d×w integer sketch
    over the item stream, then answer each query item with
    min_j sketch[j][h_j(x)] — an upper bound on the true count that
    overestimates by at most the colliding mass (≈ d-th order min of
    N/w). The sketch is d·w cells REGARDLESS of input size: the
    map-side partial aggregate compresses every partition to ≤ d·w
    rows, so the shuffle is constant-size — the 100 TB substitute for
    a full token histogram when only point lookups are needed.

    `queries` must carry `item_col`; output (item, cnt_est).
    """
    if d < 1 or w < 2:
        raise ValueError("count_min_estimates needs d >= 1 and w >= 2")
    rows = []
    for j in range(d):
        rows.append(items.select(
            F.lit(j).alias("__j"),
            F.expr(_cm_bucket(j, item_col, w, prefix)).alias("__b")))
    stream = rows[0]
    for r in rows[1:]:
        stream = stream.unionByName(r)
    sketch = (stream.groupBy("__j", "__b")
              .agg(F.count(F.lit(1)).alias("__c")))
    probes = None
    for j in range(d):
        p = queries.select(
            item_col, F.lit(j).alias("__j"),
            F.expr(_cm_bucket(j, item_col, w, prefix)).alias("__b"))
        probes = p if probes is None else probes.unionByName(p)
    # missing sketch cells are true zeros (no item hashed there)
    joined = probes.join(sketch, ["__j", "__b"], "left") \
        .select(item_col, F.coalesce("__c", F.lit(0)).alias("__c"))
    return (joined.groupBy(item_col)
            .agg(F.min("__c").alias("cnt_est")))


def count_min_oracle_sql(items_sql: str, queries_sql: str,
                         item_col: str = "item", d: int = 4,
                         w: int = 1024, prefix: str = "cm") -> str:
    """DuckDB oracle: identical sketch built with the hex-digit
    list_reduce hash. `items_sql` / `queries_sql` must yield `item_col`."""
    def bucket(j: int, col: str) -> str:
        return (f"(list_reduce(list_prepend(CAST(0 AS BIGINT), "
                f"list_transform(string_split(substr(md5('{prefix}{j}#' || "
                f"CAST({col} AS VARCHAR)), 1, 15), ''), "
                f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
                f"(a, b) -> a * 16 + b) % {w})")
    stream = " UNION ALL ".join(
        f"SELECT {j} AS j, {bucket(j, item_col)} AS b FROM its"
        for j in range(d))
    probes = " UNION ALL ".join(
        f"SELECT {item_col}, {j} AS j, {bucket(j, item_col)} AS b FROM qs"
        for j in range(d))
    return f"""
WITH its AS ({items_sql}),
qs AS ({queries_sql}),
stream AS ({stream}),
sk AS (SELECT j, b, count(*) AS c FROM stream GROUP BY j, b),
pr AS ({probes})
SELECT {item_col}, min(coalesce(sk.c, 0)) AS cnt_est
FROM pr LEFT JOIN sk USING (j, b) GROUP BY {item_col}"""


def bloom_membership(items: DataFrame, queries: DataFrame,
                     item_col: str = "item", k: int = 4,
                     m_bits: int = 16384,
                     prefix: str = "bf") -> DataFrame:
    """Bloom-filter membership: build the set-bit frame (≤ m_bits rows,
    whatever the input size) from k md5-keyed hash positions per item,
    then probe each query item — `maybe_present` is true iff ALL k of
    its positions are set. No false negatives; false-positive rate
    ≈ (1 - e^(-k·n/m))^k. This is the broadcast pre-filter pattern: at
    scale the tiny bit frame broadcasts to prune a huge probe side
    before an exact join (Spark's own runtime bloom filters do the same
    inside AQE; this one is portable and oracle-checkable).

    Output: (item, maybe_present).
    """
    if k < 1 or m_bits < 2:
        raise ValueError("bloom_membership needs k >= 1 and m_bits >= 2")
    bits = None
    for j in range(k):
        b = items.select(
            F.expr(_cm_bucket(j, item_col, m_bits, prefix)).alias("__pos"))
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct().withColumn("__hit", F.lit(1))
    probes = None
    for j in range(k):
        p = queries.select(
            item_col,
            F.expr(_cm_bucket(j, item_col, m_bits, prefix)).alias("__pos"))
        probes = p if probes is None else probes.unionByName(p)
    joined = probes.join(F.broadcast(bits), "__pos", "left")
    return (joined.groupBy(item_col)
            .agg((F.sum(F.coalesce("__hit", F.lit(0))) == k)
                 .alias("maybe_present")))


def bloom_oracle_sql(items_sql: str, queries_sql: str,
                     item_col: str = "item", k: int = 4,
                     m_bits: int = 16384, prefix: str = "bf") -> str:
    """DuckDB oracle for bloom_membership (hex-digit list_reduce hash)."""
    def bucket(j: int, col: str) -> str:
        return (f"(list_reduce(list_prepend(CAST(0 AS BIGINT), "
                f"list_transform(string_split(substr(md5('{prefix}{j}#' || "
                f"CAST({col} AS VARCHAR)), 1, 15), ''), "
                f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
                f"(a, b) -> a * 16 + b) % {m_bits})")
    bits = " UNION ".join(
        f"SELECT {bucket(j, item_col)} AS pos FROM its" for j in range(k))
    probes = " UNION ALL ".join(
        f"SELECT {item_col}, {bucket(j, item_col)} AS pos FROM qs"
        for j in range(k))
    return f"""
WITH its AS ({items_sql}),
qs AS ({queries_sql}),
bits AS ({bits}),
pr AS ({probes})
SELECT {item_col},
  sum(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) = {k}
    AS maybe_present
FROM pr LEFT JOIN bits USING (pos) GROUP BY {item_col}"""


def hll_oracle_sql(table: str, key_col: str, group_cols: list[str],
                   p: int = 8, prefix: str = "hll#") -> str:
    """DuckDB oracle: the same hash → bucket/rank → integer estimate.
    The 60-bit md5 prefix converts via the hex-digit list_reduce (DuckDB
    lacks conv(s, 16, 10) for arbitrary width)."""
    m = 1 << p
    top = _W_BITS[p] + 1
    a = _a_const(p)
    lc = ", ".join(str(v) for v in _lc_table(p))
    gc = ", ".join(group_cols)
    h = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
         f"list_transform(string_split(substr(md5('{prefix}' || "
         f"CAST({key_col} AS VARCHAR)), 1, 15), ''), "
         f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
         f"(a, b) -> a * 16 + b)")
    return f"""
WITH d AS (SELECT {gc}, {h} AS h FROM {table}),
b AS (SELECT {gc}, h % {m} AS bucket, h // {m} AS w FROM d),
r AS (SELECT {gc}, bucket,
      max(CASE WHEN w = 0 THEN {top}
          ELSE {top} - length(bin(w)) END) AS r
      FROM b GROUP BY {gc}, bucket),
s AS (SELECT {gc},
      sum((CAST(1 AS BIGINT) << ({top} - r))) AS s_obs,
      count(*) AS nb FROM r GROUP BY {gc}),
e AS (SELECT {gc}, CAST(CASE
      WHEN ({m} - nb) > 0 AND ({a} // (s_obs + ({m} - nb) *
           (CAST(1 AS BIGINT) << {top}))) * 2 <= {5 * m}
      THEN [{lc}][CAST({m} - nb AS INTEGER)]
      ELSE {a} // (s_obs + ({m} - nb) * (CAST(1 AS BIGINT) << {top}))
      END AS BIGINT) AS n_est
      FROM s),
x AS (SELECT {gc}, count(DISTINCT {key_col}) AS n_exact
      FROM {table} GROUP BY {gc})
SELECT e.*, x.n_exact FROM e JOIN x USING ({gc})"""
