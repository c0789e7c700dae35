"""Streaming sources over the synthetic parquet tables.

A streaming scan needs an explicit schema; we take it from a (lazy,
metadata-only) batch read of the same path so batch and stream can never
drift, and re-apply the TIMESTAMP(NANOS)->timestamp restore the batch
registry does (sources/registry.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_cortex_spark.sources.registry import _ensure_conf, _nano_timestamp_columns


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``readStream`` twin of ``registry.table(name)``."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # same defensive confs as registry.read_parquet, BEFORE the schema
    # probe: on a bare caller session the probe itself fails on legacy
    # TIMESTAMP(NANOS) data without nanosAsLong. The probe must keep the
    # raw on-disk schema (nanos as long) — the restore happens below —
    # so read_parquet().schema (already converted) is not reusable here.
    _ensure_conf(spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    _ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    if _nano_timestamp_columns(path):
        _ensure_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # directory-layout table (the production case: a parquet table
        # IS a directory of part files) — stream the directory itself.
        # A pathGlobFilter of "<name>.parquet" here would match the
        # LEAF file names, discover zero part files, and silently
        # stream nothing (found via the sf1 layout, SCALE.md r5).
        df = spark.readStream.schema(schema).parquet(path)
    else:
        # single-file table (the driver's sf<=0.1 layout): the file
        # stream source requires a directory, so stream the parent
        # scoped to this table's file via pathGlobFilter
        df = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    # same guard as registry.read_parquet: pyspark 4.1.2 reads
    # TIMESTAMP(NANOS) natively as TimestampType (micros truncation) and
    # ignores nanosAsLong, so the div-1000 restore must only run when the
    # column actually materialized as LONG — unconditional restore is an
    # AnalysisException on natively-read nanos (found via the sf1
    # directory-layout sweep, r6)
    dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
    for c in _nano_timestamp_columns(path):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


from contextlib import contextmanager


@contextmanager
def scoped_state_partitions(spark: SparkSession, n: int):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming query
    definition + run, then restore.

    For stateful streaming this conf fixes the number of state-store
    instances per stateful operator for the lifetime of the query — AQE
    never resizes it — and every micro-batch pays a per-store commit
    cost, so it must be sized to stream volume, not inherited from the
    batch default. At the local bench's stream sizes a handful of state
    partitions removes ~2-3 s of pure store-commit overhead per run
    (measured: interval join at sf0.01 5.05 s @32 → 2.34 s @8); a
    production deployment sizes it to keys × state-bytes per executor.
    Results are partitioning-invariant — only the physical state layout
    changes.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def run_to_memory(stream_df: DataFrame, *, query_name: str, output_mode: str) -> DataFrame:
    """Execute a finite stream (Trigger.AvailableNow) into a memory sink
    and return the result as a batch DataFrame. Used to oracle-check
    streaming operators against the same DuckDB SQL as their batch twins.
    """
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return spark.table(query_name)
