"""Incremental document-vector store — the embedding side of streaming
hybrid retrieval.

Same contract family as streaming/fts_index.py: an append-only
per-document store (trivial union monoid — each doc_id delivered once),
maintained by a file-source stream; queries run merge-on-read through
the SAME batch machinery (operators/search.py), so a hybrid RRF query
over the incrementally built stores must hash-match the one-shot batch
oracle. Updates/deletes are the merge sink's compaction job, exactly as
for the posting store.

Scale: per batch the cost is one Arrow-batched embed over the NEW
documents; the store is partitioned by delivery batch and can be
re-partitioned by any pruning key at compaction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from project_cortex_spark.operators.search import build_doc_vectors
from project_cortex_spark.streaming.incremental import watch_and_index


def continuous_doc_vectors(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 32,
    provider: str = "hash",
):
    """Maintain the (id, embedding) store incrementally from a
    file-source stream of documents. Returns the StreamingQuery."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        build_doc_vectors(
            batch,
            id_col=id_col,
            text_col=text_col,
            dim=dim,
            provider=provider,
        ).write.mode("append").parquet(
            os.path.join(store_dir, f"batch={batch_id}")
        )

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_doc_vectors(spark: SparkSession, store_dir: str) -> DataFrame:
    """Open the accumulated vector store (merge-on-read union of all
    delivered batches)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(
        store_dir
    )
