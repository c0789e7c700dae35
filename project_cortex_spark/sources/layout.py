"""Physical layout: partitioning and bucketing for the 100 TB design.

The reference's 28 B-tree indexes (schema.go:320-370) have no Spark
equivalent — their job (skip irrelevant data, avoid re-sorting) is done
by physical layout instead:

- ``write_partitioned``: hive-style directory partitioning on low-
  cardinality filter columns (language, module, branch). Filters on the
  partition column prune whole directories at planning time — the scan
  never lists them.
- ``write_bucketed``: hash-bucket + sort within buckets on a join key.
  Two tables bucketed the same way join with ZERO shuffle (and zero
  sort if sorted): the join the reference does per-query against
  B-trees becomes a merge of co-located files. This is the layout for
  chunks⋈files, calls⋈functions, and any hot equi-join at scale.

Tests assert the *plan properties* (no Exchange under a bucketed join;
PartitionFilters pruning on partitioned reads) — the properties that
survive a 1000-executor scale-up, not timings that don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, *, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Parquet with hive-style directory partitioning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table (bucketBy requires saveAsTable).

    Size ``n_buckets`` so each bucket file lands in the 100-500 MB range
    at the target scale; both sides of a co-located join must use the
    same n_buckets and bucket columns.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def plan_of(df: DataFrame) -> str:
    """Formatted physical plan as a string (for plan-property assertions)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
