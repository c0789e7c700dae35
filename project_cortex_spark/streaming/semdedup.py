"""Incremental SemDeDup — the online semantic-dedup ingestion filter.

The incremental-index pattern (rollup.py's split, like neardup/
paradedup/vec_index) applied to cluster-then-prune semantic dedup
(operators/dedup.py ``semdedup``): the cross-batch state is a KEEPER
store of (doc_id, cluster_id, vector) rows — the documents already
admitted to the training corpus. Each delivery runs the within-batch
SemDeDup keep rule, then additionally prunes any within-batch keeper
that duplicates a STORED keeper of its cluster, emits its per-document
decision frame immediately, and appends its surviving keepers to the
store.

Priority contract: stored keepers always outrank new arrivals (they
may already have been trained on — admission is irreversible), and
within a delivery the batch SemDeDup rule applies (farthest-from-
centroid representative wins). With id-ordered deliveries the whole
decision frame is deterministic and SQL-replayable, which is what the
gate asserts.

Centroids are a FROZEN reference tensor (trained once — the
drift_bounds contract): assignment must be stable across deliveries or
"same cluster" would drift under the store.

At 100 TB: per-batch cost is one assignment pass over the new vectors
plus a cluster-keyed equi-join against the store's matching clusters —
never all-pairs; the store grows only by admitted keepers (the
deduplicated corpus), and partitioning it BY cluster_id makes the
probe partition-local. Store compaction via
``layout.compact_store(spark, store_dir, partition_cols=["batch"])``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_cortex_spark.operators import dedup as dd
from project_cortex_spark.streaming.incremental import watch_and_index


def _store(
    spark: SparkSession, store_dir: str, *, exclude_batch: int | None = None
) -> DataFrame:
    """The keeper store, optionally excluding one batch's own partition
    (a REPLAYED delivery must not see its own keepers, or it would
    prune its entire batch as already-stored duplicates)."""
    if os.path.isdir(store_dir):
        parts = [
            os.path.join(store_dir, d)
            for d in sorted(os.listdir(store_dir))
            if d.startswith("batch=")
            and (exclude_batch is None or d != f"batch={exclude_batch}")
        ]
        if parts:
            return spark.read.parquet(*parts)
    return spark.createDataFrame(
        [], "doc_id bigint, cluster_id int, v array<double>"
    )


def dedup_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    centroids,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_batch: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One delivery -> (decision frame, new keepers).

    Decision frame = the batch :func:`~project_cortex_spark.operators.
    dedup.semdedup` frame with ``keep`` additionally false for any
    within-batch keeper scoring ``>= threshold`` against a STORED
    keeper of its cluster. New keepers = the final survivors with their
    vectors (what the next delivery's store sees).
    """
    within = dd.semdedup(
        batch,
        threshold=threshold,
        centroids=centroids,
        id_col=id_col,
        vec_col=vec_col,
    )
    vecs = batch.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v")
    )
    wk = within.filter(F.col("keep")).join(vecs, "doc_id")
    store = _store(spark, store_dir, exclude_batch=exclude_batch)
    pair_scores = dd.pair_scores_udf()
    pruned = (
        wk.alias("n")
        .join(
            store.alias("o"),
            F.col("n.cluster_id") == F.col("o.cluster_id"),
        )
        .select(
            F.col("n.doc_id").alias("doc_id"),
            pair_scores(F.col("n.v"), F.col("o.v")).alias("s"),
        )
        .filter(F.col("s") >= threshold)
        .select("doc_id")
        .distinct()
        .withColumn("_x", F.lit(True))
    )
    # both sinks derive from this frame and each write is its own job —
    # checkpoint so the assignment/self-join pipeline runs once
    decisions = (
        within.join(pruned, "doc_id", "left")
        .select(
            "doc_id",
            "cluster_id",
            "centroid_sim",
            "rank",
            (F.col("keep") & F.col("_x").isNull()).alias("keep"),
        )
        .localCheckpoint(eager=True)
    )
    keepers = (
        decisions.filter(F.col("keep"))
        .join(vecs, "doc_id")
        .select("doc_id", "cluster_id", "v")
    )
    return decisions, keepers


def continuous_semdedup(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    store_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    centroids,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maintain the keeper store + decision log incrementally from a
    file-source embedding stream. Returns the StreamingQuery
    (AvailableNow). Replay-idempotent: both sinks OVERWRITE their
    batch_id-keyed partition and the batch re-derives its decisions
    with its OWN store partition excluded."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        decisions, keepers = dedup_batch(
            spark,
            batch,
            store_dir,
            centroids,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            exclude_batch=batch_id,
        )
        decisions.withColumn("batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(os.path.join(decisions_dir, f"batch={batch_id}"))
        keepers.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch={batch_id}")
        )

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_decisions(spark: SparkSession, decisions_dir: str) -> DataFrame:
    """The accumulated per-document decision frame (doc_id, cluster_id,
    centroid_sim, rank, keep, batch) — with id-ordered deliveries this
    is exactly the frame the stream-SemDeDup oracle replays."""
    return spark.read.option("recursiveFileLookup", "true").parquet(
        decisions_dir
    )


def read_keepers(spark: SparkSession, store_dir: str) -> DataFrame:
    """The admitted (deduplicated) corpus so far."""
    return _store(spark, store_dir)
