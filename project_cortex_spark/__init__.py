"""project_cortex_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of mvp-joe/project-cortex.

The reference (read-only at /root/reference) is a Go CLI that indexes a
source repo into SQLite and serves vector/FTS/DSL/graph queries over it.
This package re-expresses every operator Spark-first: declarative
DataFrame/SQL plans optimized by Catalyst, Pandas UDFs only where built-in
operators can't express the semantics, and partitioning/broadcast choices
designed for a 1000-executor cluster at ~100 TB.

Layout:
  session    — tuned SparkSession factory
  sources    — parquet table registry (TPC-H-ish test tables + cortex tables)
  dsl        — the JSON query DSL -> DataFrame compiler (cortex_files parity)
  functions  — scalar/vector expression helpers (cosine, tokenize, hashing)
  operators  — KNN search, BM25 full-text, graph traversal, dedup,
               similarity join, text analysis, multimodal plumbing
  pipeline   — index-build dataflow: change detection, chunking, embedding
  streaming  — incremental watch-mode ingest (Structured Streaming)
"""

__version__ = "0.1.0"
