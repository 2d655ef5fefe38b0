"""End-to-end corpus curation: the composition proof that the pipeline
operators chain into a real training-data workflow.

    documents → quality features → near-dup detection (MinHash-LSH)
              → drop low-quality docs and non-canonical near-dups

Dedup policy: near-dup pairs (id_a < id_b) drop id_b — i.e. any doc that
is the HIGHER id of some detected pair is removed. This is pairwise, not
transitive: for pairs (1,3),(2,3) both 1 and 2 survive even though the
three form one connected near-dup cluster. The cluster-collapsing policy
(connected components → keep the minimum member) lives in
workload_pipeline.q_dedup_apply; this composition intentionally uses the
cheaper pairwise rule, the common large-corpus practice.

Scale: quality features are a narrow map; the only wide ops are the LSH
candidate join (O(n·shingles)) and two small joins on doc_id. The blob of
work is identical at 100 TB modulo partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import minhash_lsh_pairs
from .text import text_features


def curate_corpus(docs: DataFrame, min_quality: int = 60,
                  threshold_x10000: int = 5000,
                  id_col: str = "doc_id") -> DataFrame:
    """Kept (doc_id, quality) after quality gating + near-dup removal."""
    feats = text_features(docs, id_col=id_col)
    pairs = minhash_lsh_pairs(docs, threshold_x10000=threshold_x10000,
                              id_col=id_col)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (feats.filter(F.col("quality") >= min_quality)
            .join(F.broadcast(drop), id_col, "left_anti")
            .select(id_col, F.col("quality").cast("long").alias("quality")))
