"""Text analysis operators: tokenization, quality features, language-ID,
document fingerprints.

All hot-path logic is built-in pyspark.sql.functions (JVM-side, whole-stage
codegen) — no Python UDFs. Ratios surface as x100 integers (integer DIV) so
results are bit-identical across engines and partitionings; every operator
has an ANSI-SQL oracle in workload_pipeline.py.

Scale posture: each operator is a narrow per-row map over one table — no
shuffle, trivially parallel at 100 TB. The only wide op anywhere in this
module is none; fingerprints and features are computed inside the scan
stage (check WholeStageCodegen spans in .explain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F
from ..cache import pin as _pin

# small marker vocabularies for the n-gram/stopword language heuristic —
# deliberately tiny: the operator contract is "deterministic argmax of
# marker hits", not a production langid model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "is", "of", "and", "to"),
    "es": ("el", "los", "las", "y", "es", "una"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("的", "是", "了", "在"),
}

STOPWORDS = ("the", "a", "an", "of", "and", "to", "is", "in", "it", "for")

# BPE-ish token regex: runs of letters, runs of digits, single other symbol.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

POLY_MOD = 1_000_000_007


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens (single-space corpus contract)."""
    return F.split(text if isinstance(text, Column) else F.col(text), " ")


def _count_in(tokens: Column, vocab: tuple[str, ...]) -> Column:
    """Number of tokens (with multiplicity) that appear in `vocab`."""
    return F.size(F.filter(tokens, lambda t: t.isin(*vocab)))


def text_features(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Quality features per document.

    Columns: n_chars, n_tokens, n_bpe_tokens, avg_token_len_x100,
    stop_ratio_x100, alpha_ratio_x100, quality (0-100 integer score).
    """
    toks = tokenize(text_col).alias("__toks")
    stop = _count_in(F.col("__toks"), STOPWORDS)
    out = (docs.select(id_col, text_col, toks)
           .withColumn("n_chars", F.length(text_col))
           .withColumn("n_tokens", F.size("__toks"))
           .withColumn("n_bpe_tokens",
                       F.size(F.expr(f"regexp_extract_all({text_col}, '{BPE_REGEX}', 0)")))
           .withColumn("avg_token_len_x100",
                       F.expr(f"(length(replace({text_col}, ' ', '')) * 100) DIV n_tokens"))
           .withColumn("__stop_cnt", stop)
           .withColumn("stop_ratio_x100",
                       F.expr("(__stop_cnt * 100) DIV n_tokens"))
           .withColumn("alpha_ratio_x100",
                       F.expr(f"(length(regexp_replace({text_col}, '[^a-z]', '')) * 100)"
                              f" DIV length({text_col})")))
    quality = (F.least(F.col("n_tokens"), F.lit(40))
               + F.when(F.col("stop_ratio_x100").between(3, 40), 30).otherwise(0)
               + F.when(F.col("avg_token_len_x100").between(300, 800), 30).otherwise(0))
    return out.withColumn("quality", quality).drop("__toks", "__stop_cnt", text_col)


def quality_filter(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_tokens: int = 30,
                   max_tokens: int = 100_000,
                   min_distinct_ratio: int = 40,
                   max_symbol_ratio: int = 10) -> DataFrame:
    """Gopher-style rule filter: per-document pass/fail verdict with the
    ordered list of failed rules (the audit trail a curation pipeline
    keeps next to the verdict). Rules, all exact integer arithmetic:

      too_short / too_long  — token count outside [min_tokens, max_tokens]
      word_len              — mean word length outside [300, 800] (x100)
      no_stopwords          — stopword ratio below 2 (x100)
      repetitive            — distinct-token ratio below min_distinct_ratio
      symbols               — non-alphanumeric char ratio above max

    Output: (doc_id, n_tokens, distinct_ratio_x100, symbol_ratio_x100,
    fail_csv, passes). fail_csv is the comma-joined rule names in fixed
    rule order — deterministic, and string-typed for engine-portable
    hashing. Narrow per-row map, no shuffle.
    """
    toks = tokenize(text_col).alias("__toks")
    out = (docs.select(id_col, text_col, toks)
           .withColumn("n_tokens", F.size("__toks"))
           .withColumn("__awl",
                       F.expr(f"(length(replace({text_col}, ' ', '')) * 100)"
                              " DIV n_tokens"))
           .withColumn("__stop",
                       (_count_in(F.col("__toks"), STOPWORDS) * 100)
                       .cast("long"))
           .withColumn("distinct_ratio_x100",
                       F.expr("(size(array_distinct(__toks)) * 100)"
                              " DIV n_tokens"))
           .withColumn("symbol_ratio_x100",
                       F.expr(f"(length(regexp_replace({text_col},"
                              f" '[a-z0-9 ]', '')) * 100)"
                              f" DIV length({text_col})")))
    reasons = F.array_compact(F.array(
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short")),
        F.when(F.col("n_tokens") > max_tokens, F.lit("too_long")),
        F.when(~F.col("__awl").between(300, 800), F.lit("word_len")),
        F.when(F.expr("__stop DIV n_tokens") < 2, F.lit("no_stopwords")),
        F.when(F.col("distinct_ratio_x100") < min_distinct_ratio,
               F.lit("repetitive")),
        F.when(F.col("symbol_ratio_x100") > max_symbol_ratio,
               F.lit("symbols")),
    ))
    return (out.withColumn("fail_csv", F.array_join(reasons, ","))
            .withColumn("passes", F.col("fail_csv") == "")
            .select(id_col, F.col("n_tokens").cast("bigint").alias("n_tokens"),
                    "distinct_ratio_x100",
                    "symbol_ratio_x100", "fail_csv", "passes"))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-vocabulary language heuristic: score = marker-token hits per
    language; predicted language = argmax, ties broken alphabetically.
    Output: (id, pred_lang, lang_score)."""
    toks = tokenize(text_col).alias("__toks")
    out = docs.select(id_col, toks)
    langs = sorted(LANG_MARKERS)
    for lg in langs:
        out = out.withColumn(f"s_{lg}", _count_in(F.col("__toks"), LANG_MARKERS[lg]))
    # alphabetical CASE chain = deterministic argmax with alphabetical ties
    pred = None
    for lg in langs:
        cond = F.lit(True)
        for other in langs:
            if other != lg:
                cond = cond & (F.col(f"s_{lg}") >= F.col(f"s_{other}"))
        pred = F.when(cond, lg) if pred is None else pred.when(cond, lg)
    out = out.withColumn("pred_lang", pred)
    score = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    return out.select(id_col, "pred_lang", score.alias("lang_score"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 32,
                    overlap: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-training chunking step. Output: (id, chunk_idx, chunk_text,
    chunk_n_tokens); stride = chunk_tokens - overlap; the tail chunk may
    be short but is never empty. Pure HOF fan-out (sequence + transform +
    explode) — no Python, no shuffle."""
    stride = chunk_tokens - overlap
    assert stride > 0
    toks = tokenize(text_col).alias("__toks")
    n = F.size("__toks")
    # chunk starts: 0, stride, 2*stride, ... while start < n
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(F.col("__toks"), s + 1, chunk_tokens))
            .alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - s).alias("chunk_n_tokens")))
    return (docs.select(id_col, toks)
            .select(id_col, F.explode(chunks).alias("c"))
            .select(id_col, "c.chunk_idx", "c.chunk_text",
                    F.col("c.chunk_n_tokens").cast("long")
                    .alias("chunk_n_tokens")))


def build_vocab(docs: DataFrame, size: int = 1000, text_col: str = "text",
                min_count: int = 1) -> DataFrame:
    """Frequency-ranked vocabulary: (token, token_id, cnt) with token_id =
    dense rank by (count desc, token) — deterministic, engine-portable."""
    tok = docs.select(F.explode(tokenize(text_col)).alias("token"))
    counts = (tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
              .filter(F.col("cnt") >= min_count))
    # Select the top-`size` tokens with orderBy+limit first (planned as
    # TakeOrderedAndProject — per-partition top-k, no global sort), then
    # assign ids over the already-`size`-bounded frame with a broadcast
    # triangular rank: no WindowExec at all, O(size²) pairs of a
    # size-row frame regardless of corpus size.
    from ..operators.prefix import broadcast_rank
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(size).transform(_pin)
    ranks = broadcast_rank(top, ["cnt", "token"], [False, True], "token_id")
    return (top.join(F.broadcast(ranks), ["cnt", "token"])
            .select("token", "token_id", "cnt"))


def encode_documents(docs: DataFrame, vocab: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     oov_id: int = 0) -> DataFrame:
    """Map documents to token-id sequences via the vocab (explode → join →
    re-assemble in position order). Output: (id, n_tokens, ids_csv) — the
    id sequence surfaced as a ','-joined string for engine-portable
    comparison. The vocab side is broadcast (it is top-k by construction)."""
    pos = (docs.select(id_col, F.posexplode(tokenize(text_col))
                       .alias("pos", "token")))
    mapped = (pos.join(F.broadcast(vocab.select("token", "token_id")),
                       "token", "left")
              .withColumn("tid", F.coalesce("token_id", F.lit(oov_id))))
    return (mapped.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", "tid"))),
                         lambda s: s["tid"].cast("string")), ",")
                 .alias("ids_csv")))


def split_assign(docs: DataFrame, train_pct: int = 80,
                 id_col: str = "doc_id", seed: str = "split1") -> DataFrame:
    """Deterministic train/test assignment: bucket = first 8 md5 hex chars
    of (seed, id) mod 100 — stable across engines, runs, and data order
    (the property a random() split lacks). Output: (id, bucket, split)."""
    bucket = F.expr(
        f"CAST(conv(substr(md5(concat('{seed}#', CAST({id_col} AS STRING))),"
        f" 1, 8), 16, 10) AS BIGINT) % 100")
    return (docs.select(id_col)
            .withColumn("bucket", bucket)
            .withColumn("split", F.when(F.col("bucket") < train_pct, "train")
                        .otherwise("test")))


def redact_text(docs: DataFrame, text_col: str = "text",
                out_col: str = "redacted") -> DataFrame:
    """Pattern scrubbing (the PII-redaction shape): digit runs → <NUM>,
    email-ish tokens → <EMAIL>. One codegen'd regexp chain."""
    c = F.regexp_replace(F.col(text_col),
                         "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>")
    c = F.regexp_replace(c, "[0-9]+", "<NUM>")
    return docs.withColumn(out_col, c)


def corpus_stats(docs: DataFrame, group_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Per-source corpus report: docs, token volume, mean doc length (x100
    integer) — the bookkeeping query every curation run ends with."""
    toks = F.size(tokenize(text_col))
    return (docs.select(group_col, toks.alias("_n"))
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_n").cast("long").alias("n_tokens"),
                 F.expr("(CAST(sum(_n) AS BIGINT) * 100) DIV count(*)")
                 .alias("avg_tokens_x100")))


def normalize_text(docs: DataFrame, text_col: str = "text",
                   out_col: str = "norm_text") -> DataFrame:
    """Canonical text normalization for dedup/hashing: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace runs, trim. One
    codegen'd expression — runs inside the scan stage."""
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return docs.withColumn(out_col, F.trim(c))


def doc_fingerprints(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", window: int = 8) -> DataFrame:
    """Two fingerprints per document:

    * poly_hash — order-sensitive rolling polynomial hash of the full char
      stream: fold (acc*31 + ascii(c)) % 1e9+7. Near-zero-cost content id.
    * min_window_md5 — winnowing-lite: min md5 over all `window`-char
      rolling substrings; stable under small appends (classic fingerprint
      for shift-tolerant content identity).
    """
    chars = F.expr(f"transform(split({text_col}, ''), c -> CAST(ascii(c) AS BIGINT))")
    poly = F.aggregate(chars, F.lit(0).cast("long"),
                       lambda acc, x: (acc * 31 + x) % POLY_MOD)
    win = F.expr(
        f"array_min(transform(sequence(1, length({text_col}) - {window - 1}),"
        f" i -> md5(substr({text_col}, i, {window}))))")
    return docs.select(
        id_col,
        poly.alias("poly_hash"),
        F.when(F.length(text_col) >= window, win).alias("min_window_md5"))


def token_ngrams(docs: DataFrame, n: int = 4, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Distinct token n-grams per document: (id, gram). Guarded for short
    docs (Spark's sequence(1,0) DESCENDS, unlike an empty range — filter
    first). HOF-only: split/sequence/transform/slice stay in codegen."""
    toks = tokenize(F.col(text_col))
    return (docs.select(F.col(id_col), toks.alias("__t"))
            .filter(F.size("__t") >= n)
            .select(id_col, F.explode(F.transform(
                F.sequence(F.lit(1), F.size("__t") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("__t", i, n))))
                .alias("gram"))
            .distinct())


def decontaminate(docs: DataFrame, bench_max_id: int = 20, n: int = 4,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag training docs (id >= bench_max_id)
    sharing any token n-gram with the benchmark slice (id < bench_max_id)
    — the n-gram-overlap test used to scrub eval sets out of pretraining
    corpora. Output (doc_id, contaminated_by = min overlapping bench doc,
    n_shared_grams), contaminated docs only.

    Scale: bench grams are DISTINCT and broadcast (eval sets are tiny
    next to the corpus); the corpus side streams through one hash join —
    no shuffle of the corpus grams."""
    grams = token_ngrams(docs, n, text_col, id_col)
    bench = (grams.filter(F.col(id_col) < bench_max_id)
             .select(F.col(id_col).alias("__bid"), "gram"))
    train = grams.filter(F.col(id_col) >= bench_max_id)
    return (train.join(F.broadcast(bench), "gram")
            .groupBy(id_col)
            .agg(F.min("__bid").alias("contaminated_by"),
                 F.countDistinct("gram").alias("n_shared_grams")))


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per doc: most-common-token count,
    its share of all tokens, and the distinct-token ratio (boilerplate and
    degenerate repetition push top_ratio up / distinct_ratio down).
    Integer x100 ratios with truncating DIV — engine-portable."""
    toks = (docs.select(id_col, F.explode(tokenize(F.col(text_col)))
                        .alias("tok"))
            .groupBy(id_col, "tok").agg(F.count("*").alias("cnt")))
    return (toks.groupBy(id_col)
            .agg(F.sum("cnt").alias("n_tokens"),
                 F.max("cnt").alias("top_tok_cnt"),
                 F.count("*").alias("n_distinct"))
            .select(id_col,
                    F.col("n_tokens"),
                    F.col("top_tok_cnt"),
                    F.expr("(top_tok_cnt * 100) DIV n_tokens")
                    .alias("top_ratio_x100"),
                    F.expr("(n_distinct * 100) DIV n_tokens")
                    .alias("distinct_ratio_x100")))


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k characteristic terms per doc by an integer tf-idf surrogate:
    score = (tf * 1_000_000) DIV df (monotone in tf and 1/df; integer, so
    cross-engine exact — a float idf log would hit libm divergence).
    Ties break (score desc, term asc). df is one broadcastable aggregate
    over the exploded token frame."""
    tf = (docs.select(id_col, F.explode(tokenize(F.col(text_col)))
                      .alias("term"))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(F.broadcast(df_), "term")
              .withColumn("score", F.expr("(tf * 1000000) DIV df")))
    w = W.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select(id_col, "term", "score"))


def stratified_sample(docs: DataFrame, group_col: str = "lang",
                      n_per_group: int = 20,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic stratified sampling: the first `n_per_group` docs of
    each group in md5-permutation order — how corpus mixing ratios are
    enforced (N docs per language/source) without an engine RNG. The
    md5 key is a fixed pseudo-random permutation, so any engine draws
    the identical sample. One shuffle on group_col; with Spark ≥3.5 the
    rank filter runs as WindowGroupLimit (map-side partial top-k)."""
    from ..functions import md5_permutation
    w = W.partitionBy(group_col).orderBy(md5_permutation(id_col), id_col)
    return (docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_group)
            .select(id_col, group_col))


def pack_sequences(docs: DataFrame, budget: int = 256,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Concat-then-split sequence packing: documents are laid out in
    id order as one token stream, cut into fixed `budget`-token training
    sequences; each doc reports the sequence ids its tokens land in
    (seq_first..seq_last) plus its offset in the stream — the standard
    pretraining batch-packing layout (no padding, docs may straddle a
    boundary). All integer window arithmetic.

    Scale: the global running offset is the two-pass distributed prefix
    sum (operators/prefix.py): range-partition by id, per-partition
    running sums in parallel, per-partition subtotals scanned via a
    broadcast P-row join — identical result to a single global window,
    but no single-partition WindowExec at any scale."""
    from ..operators.prefix import global_running_sum
    toks = docs.select(id_col,
                       F.size(tokenize(F.col(text_col))).alias("n_tokens"))
    return (global_running_sum(toks, [id_col], "n_tokens", "end_off")
            .withColumn("start_off", F.col("end_off") - F.col("n_tokens"))
            .select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"),
                    "start_off",
                    F.expr(f"start_off DIV {budget}").alias("seq_first"),
                    F.expr(f"(end_off - 1) DIV {budget}").alias("seq_last")))
