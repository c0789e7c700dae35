"""SparkSession factory tuned for the engine.

Local mode is used for tests/bench; the config block is written so the
same settings scale to a real cluster: AQE on (runtime coalesce, skew
join splitting, broadcast conversion), shuffle partitions sized to the
environment, Arrow enabled for the few pandas-UDF operators, UTC session
timezone so results hash-match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "project_cortex_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    At 100 TB the same knobs matter, with different values supplied by the
    cluster manager: ``spark.sql.shuffle.partitions`` should be ~2-3x total
    executor cores, ``spark.sql.files.maxPartitionBytes`` stays 128-256 MB
    so each scan task fits comfortably in executor memory, and AQE handles
    post-shuffle coalescing plus skew-join splitting at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata timestamps are naive (no UTC adjustment); read them as
        # TimestampType in the UTC session so values match the DuckDB oracle
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # older testdata wrote TIMESTAMP(NANOS); read as long then the
        # registry converts to TimestampType (micros) via `div 1000`
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
