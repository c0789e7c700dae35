"""The watch loop as a stream: file source + foreachBatch index upkeep.

Replaces the reference's fsnotify watcher + daemon actor
(internal/watcher/file_watcher.go, internal/indexer/daemon/actor.go):
the file source's checkpointed listing IS the change journal (each file
processed exactly once, restarts resume), ``foreachBatch`` runs the
batch index pipeline on each micro-batch, and ``Trigger.AvailableNow``
gives the catch-up-then-stop semantics of a manual ``cortex index``.

The serialized-index-runs property of the daemon actor
(actor.go:209-227) falls out for free: micro-batches of one query never
overlap.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def watch_and_index(
    spark: SparkSession,
    input_glob: str,
    schema,
    index_batch: Callable[[DataFrame, int], None],
    *,
    checkpoint_dir: str,
    fmt: str = "parquet",
    available_now: bool = True,
):
    """Start the incremental-index stream; returns the StreamingQuery.

    ``index_batch(df, batch_id)`` receives each micro-batch of newly
    seen files/rows and applies the batch pipeline (chunk -> embed ->
    merge_upsert). With ``available_now`` the query drains pending input
    and stops (W1's catch-up mode); without it, it keeps watching.
    """
    stream = spark.readStream.schema(schema).format(fmt).load(input_glob)
    writer = (
        stream.writeStream.foreachBatch(index_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
