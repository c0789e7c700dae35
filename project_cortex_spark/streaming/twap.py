"""Incremental time-weighted average — interval closure across batches.

Unlike count/sum rollups (rollup.py), TWAP's per-sample weight (the
holding period) is unknown until the NEXT sample arrives, so an
interval can CLOSE across a micro-batch boundary. The incremental
decomposition: per batch, close every within-batch interval with a
lead window; close the boundary interval by joining the carried state
(one (last_us, last_value) row per type) against the batch's first
event per type; append the batch's monoid partial
(n, Σ v·dt, Σ dt, Σ v) and the new last-sample state, each into its
own ``batch=N`` partition. Replay is idempotent the paradedup way:
per-batch partitions overwrite and a re-run excludes its own state
partition.

Read path: sum the partials per type — identical output to the batch
``events.twap`` when deliveries arrive in event-time order (the gate's
contract, matching the batch oracle's global ordering). State reads
take the max-``last_us`` row per type, which under time-ordered
deliveries is always the newest even though old partitions remain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_cortex_spark.streaming.incremental import watch_and_index

_STATE_SCHEMA = "event_type string, last_us long, last_value double"


def _state(
    spark: SparkSession, state_dir: str, *, exclude_batch: int | None = None
) -> DataFrame:
    if os.path.isdir(state_dir):
        parts = [
            os.path.join(state_dir, d)
            for d in sorted(os.listdir(state_dir))
            if d.startswith("batch=")
            and (exclude_batch is None or d != f"batch={exclude_batch}")
        ]
        if parts:
            raw = spark.read.parquet(*parts)
            # newest open sample per type: last_us is monotone under
            # time-ordered deliveries, so max_by is the latest state
            return raw.groupBy("event_type").agg(
                F.max("last_us").alias("last_us"),
                F.max_by("last_value", "last_us").alias("last_value"),
            )
    return spark.createDataFrame([], _STATE_SCHEMA)


def twap_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    *,
    exclude_batch: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One delivery -> (partial aggregate, new last-sample state)."""
    rows = batch.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.col("value").cast("double").alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    iv = (
        rows.withColumn("_dt", F.lead("us").over(w) - F.col("us"))
        .filter(F.col("_dt").isNotNull())
        .select("event_type", "v", F.col("_dt").alias("dt"))
    )
    firsts = (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", F.col("us").alias("first_us"))
    )
    boundary = (
        _state(spark, state_dir, exclude_batch=exclude_batch)
        .join(firsts, "event_type")
        .select(
            "event_type",
            F.col("last_value").alias("v"),
            (F.col("first_us") - F.col("last_us")).alias("dt"),
        )
    )
    partial = (
        iv.unionByName(boundary)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("v") * F.col("dt")).alias("sum_vdt"),
            F.sum("dt").alias("sum_dt"),
            F.sum("v").alias("sum_v"),
        )
    )
    lasts = (
        rows.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("us").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            F.col("us").alias("last_us"),
            F.col("v").alias("last_value"),
        )
    )
    return partial, lasts


def continuous_twap(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    partials_dir: str,
    state_dir: str,
    checkpoint_dir: str,
):
    """Maintain TWAP partials incrementally from a file-source document
    stream (AvailableNow). Both sinks overwrite their per-batch
    partition and the batch re-derives with its OWN state partition
    excluded — replay-idempotent."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        partial, lasts = twap_batch(
            spark, batch, state_dir, exclude_batch=batch_id
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(partials_dir, f"batch={batch_id}")
        )
        lasts.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_twap(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Merge-on-read: identical output to the one-shot ``events.twap``
    over everything delivered so far (what the oracle gates)."""
    raw = spark.read.option("recursiveFileLookup", "true").parquet(partials_dir)
    return raw.groupBy("event_type").agg(
        F.sum("n_intervals").alias("n_intervals"),
        F.round(
            F.sum("sum_vdt") / F.nullif(F.sum("sum_dt"), F.lit(0)), 6
        ).alias("twap"),
        F.round(F.sum("sum_v") / F.sum("n_intervals"), 6).alias("plain_avg"),
    )
