"""Continuous aggregate — the hypertable-rollup shape on Spark.

A TimescaleDB-style continuous aggregate keeps a per-(time bucket, key)
rollup up to date as rows arrive, so dashboards never re-scan raw data.
Spark has no built-in incremental materialized view; this module builds
one from two monoid facts:

- count and an exact scaled-integer sum are ASSOCIATIVE, so per-batch
  partial aggregates can be blindly APPENDED and re-merged on read;
- the file-source checkpoint guarantees each input file contributes to
  exactly one batch, so no row is double-counted across restarts.

Write path (per micro-batch): aggregate the batch to (window, key)
partials, append as parquet. No read-modify-write, no merge locks —
appends from a failed batch are re-written under the same batch, never
duplicated, because ``foreachBatch`` re-runs the whole batch.

Read path: re-aggregate the partials (sum of counts, sum of sums).
Cost is O(partials), which grows with batch count, not data size; at
scale, compact periodically by rewriting the partials dir through the
same read-path aggregate (idempotent — the compacted file is just a
bigger partial). This is the classic log-structured rollup; the exact
incremental semantics are asserted by the contract: two separate
incremental deliveries must hash-match the one-shot batch aggregate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_cortex_spark.streaming.incremental import watch_and_index


def rollup_partial(batch: DataFrame, *, minutes: int = 60) -> DataFrame:
    """Aggregate one batch of events to (window_start, event_type)
    partials with monoid (count, exact scaled-int sum) state."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        batch.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias(
                "sum_value_e4"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_e4",
        )
    )


def continuous_rollup(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    partials_dir: str,
    checkpoint_dir: str,
    minutes: int = 60,
):
    """Maintain the rollup incrementally from a file-source stream.
    Returns the StreamingQuery (AvailableNow: drain-and-stop)."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        rollup_partial(batch, minutes=minutes).write.mode("append").parquet(
            os.path.join(partials_dir, f"batch={batch_id}")
        )

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_rollup(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Merge partials to the current rollup — identical to the batch
    aggregate over every row delivered so far."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(partials_dir)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_e4").alias("sum_value_e4"),
        )
    )


def read_ewma(
    spark: SparkSession, partials_dir: str, *, alpha: float = 0.25
) -> DataFrame:
    """EWMA over the merged rollup: the streaming twin of
    operators.events.ewma_series — merge the monoid count partials,
    then the identical left fold over the ordered bucket array. Two
    incremental deliveries must hash-match the one-shot batch EWMA
    (same fold shape, same oracle)."""
    from pyspark.sql import Window

    base = read_rollup(spark, partials_dir).select(
        "event_type", "window_start", "n_events"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    xs = F.collect_list(F.col("n_events").cast("double")).over(w)
    fold = lambda y, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * y  # noqa: E731
    return base.withColumn("xs", xs).select(
        "event_type",
        "window_start",
        "n_events",
        F.round(
            F.aggregate(
                F.slice(F.col("xs"), F.lit(2), F.size("xs") - 1),
                F.element_at(F.col("xs"), 1),
                fold,
            ),
            6,
        ).alias("ewma"),
    )
