"""Training-data pipeline operators (beyond the reference surface).

The reference engine (vesoft-inc/nebula-storage) is a graph storage/query
layer; a 100 TB Spark deployment of this engine doubles as the backbone of
an LLM training-data pipeline. This package adds the first-class operators
such a pipeline needs, each expressed Spark-first (built-in functions and
higher-order functions on the JVM hot path; Pandas UDFs only for opaque
binary payloads):

  text.py        language-ID, quality scoring, token counting, fingerprints
  dedup.py       exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
  similarity.py  embedding similarity: brute-force cosine top-k, IVF, near-dup
  multimodal.py  opaque binary columns + Arrow-batched REAL header decode

Determinism contract (shared with the DuckDB oracles): every score that
feeds a comparison or ranking is either exact integer arithmetic (quantized
embeddings, x10000 ratios), an md5 hex string, or a double derived from
exact integers by one IEEE-deterministic expression.
"""

from .text import doc_fingerprints, lang_id, text_features, tokenize
from .dedup import (doc_shingles, exact_dedup, minhash_signature,
                    minhash_lsh_pairs, lsh_candidate_pairs,
                    ngram_jaccard_pairs, simhash, simhash_pairs)
from .similarity import (embedding_near_dup, hyperplane_lsh_topk,
                         hyperplanes, knn_bruteforce, knn_ivf,
                         quantize_embeddings)
from .multimodal import frame_sample, image_meta, with_binary_payload

__all__ = [
    "tokenize", "text_features", "lang_id", "doc_fingerprints",
    "exact_dedup", "doc_shingles", "minhash_signature", "minhash_lsh_pairs",
    "lsh_candidate_pairs", "ngram_jaccard_pairs", "simhash", "simhash_pairs",
    "quantize_embeddings", "knn_bruteforce", "knn_ivf", "embedding_near_dup",
    "with_binary_payload", "image_meta", "frame_sample",
]
