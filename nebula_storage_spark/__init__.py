"""nebula_storage_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of vesoft-inc/nebula-storage.

This is NOT a port of the reference C++ engine. It re-expresses the
reference's *semantics* (schema-full property graph, storage-side query
operators, mutation semantics, TTL) as idiomatic Spark DataFrame plans so
that Catalyst/Tungsten pick the physical strategy. See SURVEY.md for the
operator-by-operator mapping with reference citations.

Layout:
  catalog    — tag/edge schema registry (nullable/default/TTL), ref: src/meta/
  graph      — GraphStore: one DataFrame per tag and per edge type,
               ref: src/utils/NebulaKeyUtils.h key layouts → tables
  operators  — read-side operators (go/lookup/scan/fetch/agg/dedup),
               ref: src/storage/exec/*, src/storage/query/*
  mutate     — write-side semantics (add/ifNotExists/delete/upsert/TTL purge),
               ref: src/storage/mutate/*, src/storage/exec/UpdateNode.h
  functions  — shared determinism/expression helpers (decimal sums,
               md5 permutation, quantized vectors)
  sources    — format adapters (parquet/orc/csv/json)
  store_io   — engine-owned warehouse layout save/load
  pipeline   — LLM-data-pipeline extensions (dedup, similarity search,
               text analysis, multimodal) — beyond the reference surface,
               per the north star in BASELINE.json
  streaming  — Structured Streaming change-feed analog of the reference's
               Raft listener (src/kvstore/Listener.h), strictly an extension
"""

__version__ = "0.1.0"
