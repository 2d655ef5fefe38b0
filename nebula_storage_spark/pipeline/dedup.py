"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Reference analog: the engine's DeDupNode (src/storage/exec/DeDupNode.h:19-58)
is exact-key distinct; a training-data pipeline additionally needs *near*-
duplicate detection. All four families below are expressed with built-in
DataFrame ops (explode / groupBy / join / higher-order functions) — the
whole pipeline is JVM-side and shuffle-parallel.

Determinism: hashes are md5 hex strings (identical in any engine);
similarity scores are x10000 integers via integer division.

Scale notes (100 TB posture):
  * exact_dedup — one hash-shuffle on the content hash; map-side partial
    via dropDuplicates-style first-win per partition is automatic.
  * candidate generation NEVER does the O(n²) cross join: n-gram Jaccard
    joins an inverted (shingle → doc) index; MinHash-LSH joins on band
    signatures. Both shuffle O(n·shingles) rows, not O(n²).
  * verification (exact Jaccard) runs only on candidate pairs.
  * super-common shingles (stop-shingles) would skew the inverted-index
    join at scale — `max_shingle_freq` drops them (textbook LSH trick,
    also kills the quadratic blowup of boilerplate text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F
from ..cache import pin as _pin

from .text import tokenize


def exact_dedup(docs: DataFrame, key_cols: list[str] | None = None,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the lowest-id document per identical content.

    Content identity = md5 of the key columns (default: the text itself).
    One shuffle on the 16-byte hash, never on the full text.
    """
    key = F.md5(F.concat_ws("\x1f", *(key_cols or [text_col])))
    w = W.partitionBy(key).orderBy(id_col)
    return (docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def doc_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, shingles) with shingles = distinct word n-grams. Documents with
    fewer than n tokens are dropped (no shingle support)."""
    toks = tokenize(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(F.col("__toks"), i + k)
                                     for k in range(n)]))
    return (docs.select(id_col, toks.alias("__toks"))
            .filter(F.size("__toks") >= n)
            .select(id_col, F.array_distinct(grams).alias("shingles")))


# exact Jaccard as an x10000 integer — integer DIV keeps it engine-portable
_JACCARD_X10000 = ("(CAST(size(array_intersect(sa, sb)) AS BIGINT) * 10000) DIV "
                   "size(array_distinct(concat(sa, sb)))")


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold_x10000: int = 5000,
                        max_shingle_freq: int | None = None,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard.

    Candidates = pairs sharing ≥1 shingle (inverted-index self-join — no
    cross join); verify = exact Jaccard ≥ threshold. Output
    (id_a, id_b, jaccard_x10000) with id_a < id_b.

    Scale (unpruned path): the verify NEVER joins candidate pairs to the
    shingle ARRAYS — measured in tools/dedup_scaling.py, carrying two
    ~300-element arrays per candidate row blows the intermediate past
    local disk at 500 k docs (each candidate ≈ 12 KB). Instead the
    shared-shingle count per pair is aggregated straight off the
    inverted-index self-join (map-side partial count, rows of 3 longs),
    and |A∪B| = |A|+|B|−|∩| from a per-doc size frame: identical
    integer Jaccard (shingles are per-doc distinct), intermediate
    O(Σf²) thin rows instead of O(candidates × array bytes).
    """
    # shingling feeds the index + the size frame: persist once —
    # recomputing the tokenizer per branch doubles the scan
    sh = doc_shingles(docs, n=n, id_col=id_col, text_col=text_col).transform(_pin)
    inv = sh.select(F.col(id_col).alias("_id"), F.explode("shingles").alias("g"))
    if max_shingle_freq is not None:
        # capped path: candidates from the pruned index, verified with
        # exact FULL-array Jaccard (the cap bounds the candidate count
        # by construction, so the array join stays small; counting ∩
        # off the capped index would UNDERCOUNT shared shingles)
        freq = inv.groupBy("g").agg(F.count(F.lit(1)).alias("_f"))
        inv = (inv.join(freq.filter(F.col("_f") <= max_shingle_freq), "g")
               .drop("_f"))
        cand = (inv.alias("a").join(inv.alias("b"), "g")
                .filter(F.col("a._id") < F.col("b._id"))
                .select(F.col("a._id").alias("id_a"),
                        F.col("b._id").alias("id_b"))
                .distinct())
        return _verify_jaccard(cand, sh, id_col, threshold_x10000,
                               broadcast_cand=False)
    inter = (inv.alias("a").join(inv.alias("b"), "g")
             .filter(F.col("a._id") < F.col("b._id"))
             .groupBy(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("_i")))
    sizes = sh.select(F.col(id_col).alias("_sid"),
                      F.size("shingles").cast("bigint").alias("_n"))
    jx = F.expr("(_i * 10000) DIV (_na + _nb - _i)")
    return (inter
            .join(sizes.select(F.col("_sid").alias("id_a"),
                               F.col("_n").alias("_na")), "id_a")
            .join(sizes.select(F.col("_sid").alias("id_b"),
                               F.col("_n").alias("_nb")), "id_b")
            .select("id_a", "id_b", jx.alias("jaccard_x10000"))
            .filter(F.col("jaccard_x10000") >= threshold_x10000))


def _verify_jaccard(cand: DataFrame, sh: DataFrame, id_col: str,
                    threshold_x10000: int,
                    broadcast_cand: bool = True) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs. LSH candidate sets
    are small by construction → broadcast them so shingle arrays join
    map-side without a shuffle; shingle-sharing candidate sets (plain
    inverted index) can be large → leave the strategy to Catalyst/AQE."""
    av = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sa"))
    bv = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sb"))
    if broadcast_cand:
        cand = F.broadcast(cand)
    jx = F.expr(_JACCARD_X10000)
    return (cand.join(av, "id_a").join(bv, "id_b")
            .select("id_a", "id_b", jx.alias("jaccard_x10000"))
            .filter(F.col("jaccard_x10000") >= threshold_x10000))


MINHASH_SLICE = 5  # hex chars per signature slot (16^5 ≈ 1M-value space)


def minhash_signature(sh: DataFrame, num_hashes: int = 12,
                      id_col: str = "doc_id") -> DataFrame:
    """MinHash signature: slot m{i} = min over shingles of a fixed-width
    hex slice of md5(shingle)||md5('x#'||shingle). Min over a hex slice =
    min over a fixed pseudo-random permutation of the shingle universe —
    the classic MinHash estimator; slicing two md5s into `num_hashes`
    independent slots costs 2 hashes per shingle instead of num_hashes
    (6× less CPU on the hot path), and stays engine-portable (md5 +
    substring + string-min are universal)."""
    if num_hashes * MINHASH_SLICE > 64:
        raise ValueError(
            f"num_hashes must be <= {64 // MINHASH_SLICE} "
            f"({MINHASH_SLICE} hex chars per slot over two md5s)")
    ex = sh.select(id_col, F.explode("shingles").alias("g"))
    ex = ex.withColumn(
        "hh", F.concat(F.md5("g"), F.md5(F.concat(F.lit("x#"), F.col("g")))))
    aggs = [F.min(F.substring("hh", i * MINHASH_SLICE + 1, MINHASH_SLICE))
            .alias(f"m{i}") for i in range(num_hashes)]
    return ex.groupBy(id_col).agg(*aggs)


def _banded(sig: DataFrame, bands: int, rows: int,
            id_col: str) -> DataFrame:
    """(id, band_idx, band_hash) rows — the LSH band index frame. This
    is what a deployment PERSISTS (partitioned by band hash): new docs
    append their band rows, and candidate discovery for a delta is an
    equi-join of the delta's rows against this index."""
    band_cols = [
        F.md5(F.concat_ws("", *[F.col(f"m{b * rows + r}") for r in range(rows)]))
        .alias(f"b{b}")
        for b in range(bands)]
    return sig.select(id_col, F.posexplode(F.array(*band_cols))
                      .alias("band_idx", "band"))


def lsh_candidate_pairs(sig: DataFrame, bands: int = 4, rows: int = 3,
                        id_col: str = "doc_id") -> DataFrame:
    """LSH banding: hash each band of `rows` signature slots; a pair is a
    candidate iff some band matches. Join is on (band_idx, band_hash) —
    O(n) shuffle, never O(n²)."""
    banded = _banded(sig, bands, rows, id_col)
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, ["band_idx", "band"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, num_hashes: int = 12,
                      bands: int = 4, rows: int = 3,
                      threshold_x10000: int = 5000,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → signature → band →
    candidate join → exact-Jaccard verify. Output
    (id_a, id_b, jaccard_x10000)."""
    sh = doc_shingles(docs, n=n, id_col=id_col, text_col=text_col).transform(_pin)
    sig = minhash_signature(sh, num_hashes=num_hashes, id_col=id_col)
    cand = lsh_candidate_pairs(sig, bands=bands, rows=rows, id_col=id_col)
    return _verify_jaccard(cand, sh, id_col, threshold_x10000)


def minhash_lsh_pairs_incremental(docs: DataFrame, delta_cond,
                                  n: int = 3, num_hashes: int = 12,
                                  bands: int = 4, rows: int = 3,
                                  threshold_x10000: int = 5000,
                                  id_col: str = "doc_id",
                                  text_col: str = "text") -> DataFrame:
    """Incremental near-dup maintenance — delta-apply for the LSH index.

    `delta_cond` marks the newly-arrived docs. The already-ingested
    base corpus's pairs are known (recomputed here to stand in for the
    stored result of the previous run), and its band index is persisted
    in a deployment — so the incremental work is ONLY:

      1. band the delta docs (O(|delta|) signatures);
      2. equi-join the delta's band rows against the full band index on
         (band_idx, band_hash) — touches just the buckets a delta doc
         lands in, never the corpus at large;
      3. exact-Jaccard-verify the new candidates.

    Output = stored base pairs ∪ delta-involved pairs, which must equal
    a full rebuild (the LSH band law: a pair's candidacy depends only on
    its own two signatures) — the query sharing the full-corpus oracle
    is the proof, mirroring append_ivf_index's contract.
    """
    delta_ids = docs.filter(delta_cond).select(id_col)
    base = docs.filter(~delta_cond)

    sh_all = doc_shingles(docs, n=n, id_col=id_col,
                          text_col=text_col).transform(_pin)
    sig_all = minhash_signature(sh_all, num_hashes=num_hashes,
                                id_col=id_col)
    banded_all = _banded(sig_all, bands, rows, id_col)

    # stored base result (per-doc signatures are independent, so the
    # base-only signature frame is identical to last run's)
    sig_base = sig_all.join(delta_ids, id_col, "left_anti")
    cand_base = lsh_candidate_pairs(sig_base, bands=bands, rows=rows,
                                    id_col=id_col)

    # incremental candidates: every pair with >= 1 delta member
    banded_delta = banded_all.join(delta_ids, id_col, "left_semi")
    cand_delta = (banded_delta.alias("a")
                  .join(banded_all.alias("b"), ["band_idx", "band"])
                  .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
                  .select(F.least(F.col(f"a.{id_col}"),
                                  F.col(f"b.{id_col}")).alias("id_a"),
                          F.greatest(F.col(f"a.{id_col}"),
                                     F.col(f"b.{id_col}")).alias("id_b"))
                  .distinct())

    cand = cand_base.unionByName(cand_delta).distinct()
    return _verify_jaccard(cand, sh_all, id_col, threshold_x10000)


def simhash(docs: DataFrame, bits: int = 64, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """SimHash fingerprint: for each bit position, sum ±1 votes from every
    token occurrence's md5 (bit j of hex digit k), take the sign. Output
    (id, simhash): a full `bits`-bit fingerprint (up to 64) carried in one
    int64. The 64-bit case assembles TWO 32-bit halves and combines them
    with explicit two's-complement arithmetic —
    (hi - 2³²)·2³² + lo when bit 63 is set — plain integer ops that never
    overflow and evaluate identically in any engine (no engine-specific
    shift/overflow semantics involved).

    Hot path: explode tokens → one md5 per token → `bits` conditional-sum
    aggregates → integer assembly. All JVM-side, one shuffle on id.
    """
    if bits % 4 != 0 or not 4 <= bits <= 64:
        raise ValueError("bits must be a multiple of 4 in [4, 64]")
    ex = docs.select(id_col, F.explode(tokenize(text_col)).alias("t"))
    ex = ex.withColumn("h", F.md5("t"))
    aggs = []
    for i in range(bits):
        k, j = divmod(i, 4)  # hex digit k, bit j within it
        vote = (f"CASE WHEN ((instr('0123456789abcdef', substr(h, {k + 1}, 1)) - 1)"
                f" DIV {1 << j}) % 2 = 1 THEN 1 ELSE -1 END")
        aggs.append(F.sum(F.expr(vote)).alias(f"s{i}"))
    per_doc = ex.groupBy(id_col).agg(*aggs)

    def half(lo_bit: int, hi_bit: int) -> str:
        terms = [f"CASE WHEN s{i} > 0 THEN CAST({1 << (i - lo_bit)} AS BIGINT)"
                 f" ELSE CAST(0 AS BIGINT) END"
                 for i in range(lo_bit, min(hi_bit, bits))]
        return " + ".join(terms) if terms else "CAST(0 AS BIGINT)"

    halves = per_doc.select(id_col, F.expr(half(0, 32)).alias("_lo"),
                            F.expr(half(32, 64)).alias("_hi"))
    combine = ("CASE WHEN _hi >= 2147483648 "
               "THEN (_hi - 4294967296) * 4294967296 + _lo "
               "ELSE _hi * 4294967296 + _lo END")
    return halves.select(id_col, F.expr(combine).alias("simhash"))


def simhash_pairs(docs: DataFrame, bits: int = 16, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    EXACT pigeonhole candidate join (no cross join): the fingerprint is
    split into (max_hamming + 1) disjoint bit-blocks; a pair within
    Hamming distance max_hamming must agree EXACTLY on at least one block
    (pigeonhole — max_hamming differing bits cannot touch all
    max_hamming+1 blocks), so an equi-join on (block_idx, block_value)
    has guaranteed 100 % recall. Candidates then get the exact
    bit_count(XOR) verification. Shuffle is O(n · (max_hamming+1)) rows
    of (id, fingerprint) — the same banded shape as lsh_candidate_pairs,
    never O(n²).
    """
    n_blocks = max_hamming + 1
    fp = simhash(docs, bits=bits, id_col=id_col, text_col=text_col).transform(_pin)
    base, rem = divmod(bits, n_blocks)
    blocks, off = [], 0
    for i in range(n_blocks):
        width = base + (1 if i < rem else 0)
        blocks.append(F.shiftright(F.col("simhash"), off)
                      .bitwiseAND(F.lit((1 << width) - 1)))
        off += width
    blocked = fp.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(F.array(*blocks)).alias("blk", "bval"))
    a = blocked.select(F.col(id_col).alias("id_a"),
                       F.col("simhash").alias("fa"), "blk", "bval")
    b = blocked.select(F.col(id_col).alias("id_b"),
                       F.col("simhash").alias("fb"), "blk", "bval")
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (a.join(b, ["blk", "bval"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "fa", "fb").distinct()
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def containment_pairs(docs: DataFrame, n: int = 3,
                      threshold_x10000: int = 6000,
                      max_shingle_freq: int | None = None,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Asymmetric near-duplication: shingle CONTAINMENT |A∩B| / |A| —
    catches quotes/subsets that symmetric Jaccard under-scores (a short
    doc fully embedded in a long one has high containment, low Jaccard).
    Ordered output (id_a, id_b, containment_x10000): the share of A's
    shingles also present in B, both directions emitted independently.
    Candidates come from the same inverted-index join as Jaccard dedup —
    never O(n²). `max_shingle_freq` drops stop-shingles from the inverted
    index before the self-join (same skew guard as ngram_jaccard_pairs —
    a boilerplate shingle shared by f docs alone contributes f² candidate
    rows; the cap bounds the hottest join key). Verification still scores
    FULL shingle sets — pruning only narrows candidates.

    Scale (unpruned path): the |∩| per pair aggregates straight off the
    inverted-index self-join and the denominator |A| comes from a
    per-doc size frame — same count-based exact verify as
    ngram_jaccard_pairs, after tools/dedup_scaling.py measured the
    candidates×shingle-ARRAY join overrunning local disk at 500 k docs.
    The capped path keeps the array verify: the cap bounds candidates
    by construction, and |∩| counted off the capped index would
    undercount shared shingles."""
    sh = doc_shingles(docs, n=n, id_col=id_col, text_col=text_col).transform(_pin)
    inv = sh.select(F.col(id_col).alias("_id"),
                    F.explode("shingles").alias("g"))
    if max_shingle_freq is not None:
        freq = inv.groupBy("g").agg(F.count(F.lit(1)).alias("_f"))
        inv = (inv.join(freq.filter(F.col("_f") <= max_shingle_freq), "g")
               .drop("_f"))
        und = (inv.alias("a").join(inv.alias("b"), "g")
               .filter(F.col("a._id") < F.col("b._id"))
               .select(F.col("a._id").alias("id_a"),
                       F.col("b._id").alias("id_b"))
               .distinct())
        cand = und.union(und.select(F.col("id_b").alias("id_a"),
                                    F.col("id_a").alias("id_b")))
        av = sh.select(F.col(id_col).alias("id_a"),
                       F.col("shingles").alias("sa"))
        bv = sh.select(F.col(id_col).alias("id_b"),
                       F.col("shingles").alias("sb"))
        cx = F.expr("(CAST(size(array_intersect(sa, sb)) AS BIGINT) "
                    "* 10000) DIV size(sa)")
        return (cand.join(av, "id_a").join(bv, "id_b")
                .select("id_a", "id_b", cx.alias("containment_x10000"))
                .filter(F.col("containment_x10000") >= threshold_x10000))
    inter = (inv.alias("a").join(inv.alias("b"), "g")
             .filter(F.col("a._id") < F.col("b._id"))
             .groupBy(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("_i")))
    both = inter.union(inter.select(F.col("id_b").alias("id_a"),
                                    F.col("id_a").alias("id_b"), "_i"))
    sizes = sh.select(F.col(id_col).alias("id_a"),
                      F.size("shingles").cast("bigint").alias("_na"))
    cx = F.expr("(_i * 10000) DIV _na")
    return (both.join(sizes, "id_a")
            .select("id_a", "id_b", cx.alias("containment_x10000"))
            .filter(F.col("containment_x10000") >= threshold_x10000))


def setsim_prefix_join(tok: DataFrame, threshold_pct: int = 60,
                       id_col: str = "doc_id") -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the AllPairs
    / PPJoin candidate-pruning principle): `tok` is the distinct
    (id, t) token-set frame; output is every pair with Jaccard >=
    threshold_pct/100 as (doc_a, doc_b, j_x100), truncating integer
    Jaccard, doc_a < doc_b.

    Tokens are totally ordered by (document-frequency, token); a pair
    meeting the threshold MUST share one of each side's first
    n - ceil(pct·n/100) + 1 tokens in that order, so candidate
    generation is an equi-join on prefix tokens only — provably
    lossless (unlike MinHash's probabilistic recall) and never
    all-pairs. Rarest-first ordering puts prefixes on low-df tokens,
    which keeps the candidate join groups small on a Zipfian
    vocabulary. The AllPairs LENGTH filter rides the candidate join
    (Jaccard >= t forces t·max(|a|,|b|) <= min(|a|,|b|) — exact).

    Verification (r12, from the measured sf0.1 tail): each candidate
    pair is verified by a codegen `array_intersect` of the two
    documents' token arrays — the arrays are a pure projection of the
    per_doc frame the prefix already built, attached by two hash joins
    keyed on doc id. The previous shape re-joined every candidate
    against BOTH sides' token tables and re-aggregated (a
    |cand|·|doc| row explosion through a shuffle — measured 1.2 B
    intermediate rows / 167 s at sf0.1 where the intersect form reads
    ~20 s); per-pair work is still O(|a|+|b|) but it stays inside
    whole-stage codegen with zero extra exchange, and at 100 TB the
    payload scales with the PREFIX-bounded candidate count, never with
    Σ df² (the stopword blowup the direct pair-count join suffers)."""
    tok = tok.select(F.col(id_col).alias("doc_id"), "t").distinct()
    dfreq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (tok.join(F.broadcast(dfreq), "t")
               .groupBy("doc_id")
               .agg(F.sort_array(F.collect_list(F.struct("df", "t")))
                    .alias("toks"),
                    F.count(F.lit(1)).alias("n")))
    pref = per_doc.select(
        "doc_id", "n",
        F.explode(F.expr(
            f"slice(toks, 1, n - ({threshold_pct} * n + 99) DIV 100 + 1)"))
        .alias("p"))
    cand = (pref.alias("a")
            .join(pref.alias("b"),
                  (F.col("a.p.t") == F.col("b.p.t"))
                  & (F.col("a.doc_id") < F.col("b.doc_id"))
                  & (100 * F.least(F.col("a.n"), F.col("b.n"))
                     >= threshold_pct
                     * F.greatest(F.col("a.n"), F.col("b.n"))))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    sets = per_doc.select("doc_id", "n",
                          F.expr("transform(toks, x -> x.t)").alias("ts"))
    return (cand
            .join(sets.select(F.col("doc_id").alias("doc_a"),
                              F.col("n").alias("na"),
                              F.col("ts").alias("ta")), "doc_a")
            .join(sets.select(F.col("doc_id").alias("doc_b"),
                              F.col("n").alias("nb"),
                              F.col("ts").alias("tb")), "doc_b")
            .withColumn("i", F.expr("size(array_intersect(ta, tb))"))
            .filter(100 * F.col("i")
                    >= threshold_pct * (F.col("na") + F.col("nb")
                                        - F.col("i")))
            .select("doc_a", "doc_b",
                    F.expr("(100 * i) DIV (na + nb - i)").alias("j_x100")))
