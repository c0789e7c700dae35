"""JSONL / CSV ingestion and export — the raw-corpus interchange formats.

Large-scale training corpora arrive as line-delimited JSON (and
occasionally CSV) drops, not parquet; the reference ingests raw files
from the filesystem walk (internal/indexer/scanner.go) and this module
is the equivalent seam for record-oriented text formats, Spark-first:

- ``spark.read.json`` / ``spark.read.csv`` scans are line-splittable, so
  a 100 TB drop fans out across executors with no custom reader; with a
  compression codec extension (``.gz`` is NOT splittable, ``.zst``/
  ``.bz2``/none are) the same code path applies.
- Schemas are REQUIRED here on purpose: schema inference is an extra
  full pass over the data (and non-deterministic under sampling) — at
  corpus scale you always know the record shape.
- Timestamps ride through the same defensive session contract as the
  parquet registry (UTC session; see sources/registry.read_parquet).

Round-trip contract (tested + oracle-gated): write(df) then read back
is value-identical for string/long/double columns — JSON via JSONL
lines, CSV via RFC 4180 quoting (quote doubled as its own escape, so
embedded commas/quotes/newlines survive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',  # RFC 4180: quotes escape by doubling
    "multiLine": "true",  # quoted embedded newlines survive the trip
}


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Line-delimited JSON scan with an explicit schema (no inference
    pass). Corrupt lines land in no row rather than failing the job —
    the standard posture for web-scale drops — via PERMISSIVE mode with
    a dropped corrupt-record column."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """One JSON object per line, one file per partition — the shard
    layout every downstream tokenizer/loader expects. ``compression``
    ('gzip' | 'bzip2' | 'zstd' | None): prefer zstd/bzip2 for shards a
    reader must SPLIT (gzip shards are one task each on read); readers
    auto-detect by file extension, so read_jsonl needs no flag."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, *, sep: str = ","
) -> DataFrame:
    return (
        spark.read.schema(schema).options(**_CSV_OPTS).option("sep", sep).csv(path)
    )


def write_csv(
    df: DataFrame, path: str, *, sep: str = ",", mode: str = "overwrite"
) -> None:
    df.write.mode(mode).options(**_CSV_OPTS).option("sep", sep).csv(path)
