"""Incremental connected components — a persisted (node -> root)
component map maintained by a STREAM of near-duplicate pairs.

This is distributed union-find with path compression, micro-batch form:
each batch maps its pairs' endpoints through the existing roots (the
"find"), runs the star-alternation CC
(:func:`~project_cortex_spark.operators.graph.connected_components`)
on the CONTRACTED root graph only — a frame bounded by the batch's
distinct roots, not by history — and patches the store (the "union").
Historical EDGES are never stored or re-scanned; the only persistent
state is the |nodes|-row map itself, swapped atomically with the same
two-rename discipline as the IVF/FTS stores.

Correctness: roots are component MINIMA at every step, and min is
associative — the min of merged min-roots is the global component min —
so the maintained map is row-identical to one-shot batch CC over the
full pair history. The gate exploits exactly that: the stream twin is
checked against the SAME duplicate_clusters oracle as the batch
operators.

At 100 TB: the per-batch cost is two probe joins of the batch against
the map (hash-partitioned on node; the batch side is small), a star CC
over the batch's contracted pairs (tiny — near-dup batches touch few
components), and a map rewrite bounded by |nodes| rows of two ids.
A production deployment shards the map by node hash and rewrites only
shards containing re-rooted entries.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_cortex_spark.streaming.incremental import watch_and_index


def _read_map(spark: SparkSession, store_dir: str) -> DataFrame | None:
    if not os.path.exists(store_dir):
        return None
    return spark.read.parquet(store_dir)


def _swap_in(df: DataFrame, store_dir: str) -> None:
    tmp = store_dir.rstrip("/") + "__new"
    bak = store_dir.rstrip("/") + "__bak"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.parquet(tmp)
    shutil.rmtree(bak, ignore_errors=True)
    if os.path.exists(store_dir):
        os.rename(store_dir, bak)
    os.rename(tmp, store_dir)
    shutil.rmtree(bak, ignore_errors=True)


def merge_pairs_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    *,
    a: str = "a",
    b: str = "b",
) -> None:
    """Fold one batch of (a, b) pairs into the component map at
    ``store_dir`` (find -> contracted star CC -> union -> atomic swap).
    Usable directly for batch-incremental merges too."""
    from project_cortex_spark.operators.graph import connected_components
    from project_cortex_spark.sources.layout import recover_store

    recover_store(store_dir)
    prev = _read_map(spark, store_dir)
    # ONE eager materialization of the micro-batch: every later
    # reference (pair frame, endpoint node set) reads the checkpoint
    # instead of re-scanning the batch's source files
    base = batch.select(F.col(a).alias("pa"), F.col(b).alias("pb")).localCheckpoint(
        eager=True
    )
    p = base.filter(F.col("pa") != F.col("pb"))
    # find: map endpoints through the existing roots
    if prev is not None:
        ra = prev.select(
            F.col("node").alias("pa"), F.col("root").alias("_ra")
        )
        rb = prev.select(
            F.col("node").alias("pb"), F.col("root").alias("_rb")
        )
        mapped = (
            p.join(ra, "pa", "left")
            .join(rb, "pb", "left")
            .select(
                F.coalesce("_ra", F.col("pa")).alias("x"),
                F.coalesce("_rb", F.col("pb")).alias("y"),
            )
        )
    else:
        mapped = p.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    contracted = mapped.filter(F.col("x") != F.col("y"))
    # union: star CC over the contracted root graph only
    patch = connected_components(contracted, a="x", b="y").select(
        F.col("doc_id").alias("pnode"), F.col("cluster_id").alias("proot")
    )
    # batch nodes enter the map at their contracted id, then re-root
    if prev is not None:
        self_map = prev.select(
            F.col("node").alias("bnode"), F.col("root").alias("_r")
        )
        new_rows = (
            base.select(F.col("pa").alias("bnode"))
            .unionByName(base.select(F.col("pb").alias("bnode")))
            .distinct()
            .join(self_map, "bnode", "left")
            .select(
                F.col("bnode").alias("node"),
                F.coalesce("_r", F.col("bnode")).alias("cid"),
            )
        )
    else:
        new_rows = (
            base.select(F.col("pa").alias("node"))
            .unionByName(base.select(F.col("pb").alias("node")))
            .distinct()
            .withColumn("cid", F.col("node"))
        )
    new_rows = (
        new_rows.join(patch, new_rows["cid"] == patch["pnode"], "left")
        .select(
            "node", F.coalesce("proot", F.col("cid")).alias("root")
        )
    )
    if prev is not None:
        rerooted = (
            prev.join(patch, prev["root"] == patch["pnode"], "left")
            .select(
                "node", F.coalesce("proot", F.col("root")).alias("root")
            )
        )
        merged = rerooted.unionByName(new_rows).distinct()
    else:
        merged = new_rows
    # localCheckpoint BEFORE the swap: the plan still reads the old
    # store files, which the swap renames away mid-write otherwise
    _swap_in(merged.localCheckpoint(eager=True), store_dir)


def continuous_components(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    store_dir: str,
    checkpoint_dir: str,
    a: str = "a",
    b: str = "b",
):
    """Maintain the component map from a file-source stream of pair
    rows. Returns the StreamingQuery (AvailableNow)."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        merge_pairs_batch(spark, batch, store_dir, a=a, b=b)

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_components(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge-on-read view of the maintained map — identical contract to
    the batch operators: (doc_id, cluster_id, keep)."""
    from project_cortex_spark.sources.layout import recover_store

    recover_store(store_dir)
    m = spark.read.parquet(store_dir)
    return m.select(
        F.col("node").alias("doc_id"),
        F.col("root").alias("cluster_id"),
        (F.col("node") == F.col("root")).alias("keep"),
    )
