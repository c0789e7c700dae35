"""Incremental vector index — IVF assignments maintained from an
embedding stream, completing the incremental triptych with
fts_index.py (postings) and neardup.py (MinHash signatures): the
reference's three search surfaces (FTS, dedup, vector) all maintained
by streams, probed merge-on-read.

Centroids are TRAINED ONCE and frozen (the standard IVF deployment:
retraining moves every assignment, so it is a scheduled rebuild, not a
streaming concern); each batch then assigns only ITS vectors — one
Arrow matmul per batch — and appends (vec_id, cluster_id, embedding)
to the store. Probes read the store and equi-join on cluster_id
exactly like the batch path; assignments are deterministic given the
centroids, so an incrementally built store probes identically to a
one-shot assignment (unit-tested, and the full-probe form is gated
against the EXACT join oracle).

At 100 TB: write the store partitioned BY cluster_id (layout.py) so a
probe's nprobe clusters prune file listings; compaction folds small
per-batch files — posting-table maintenance, same as fts_index.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from project_cortex_spark.operators import knn as knn_mod
from project_cortex_spark.streaming.incremental import watch_and_index


def continuous_vec_index(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    index_dir: str,
    checkpoint_dir: str,
    centroids,
    vec_col: str = "embedding",
):
    """Assign each batch's vectors to the frozen centroids and append
    them to the store. Returns the StreamingQuery (AvailableNow)."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        knn_mod.assign_clusters(batch, centroids, vec_col=vec_col).write.mode(
            "append"
        ).parquet(os.path.join(index_dir, f"batch={batch_id}"))

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_vec_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The accumulated (vec_id, embedding, cluster_id) store."""
    return spark.read.option("recursiveFileLookup", "true").parquet(index_dir)
