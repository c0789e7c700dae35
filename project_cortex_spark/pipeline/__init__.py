"""Index-build pipeline operators (SURVEY.md §2.9 — the Spark-native heart).

The reference's build pipeline (internal/indexer/indexer_v2.go:64-135) is
a 5-stage dataflow: discover -> detect changes -> parse/extract -> chunk +
embed -> write. Here each stage is a declarative DataFrame transform, so
Catalyst plans the whole index build as one DAG and the "stages" are just
plan regions:

- change_detection: D1 diff scan, D9 mtime repair, D11 branch fork
- chunks: D2 routing, D4 NL formatting, D5 chunk assembly, D6 doc chunking
- embed: D7 embedding batch-map (deterministic hash provider for tests)
- sink: D8 merge upsert, D10 cascade delete
"""

from project_cortex_spark.pipeline import change_detection, chunks, embed, sink

__all__ = ["change_detection", "chunks", "embed", "sink"]
