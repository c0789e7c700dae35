"""File discovery scan + content stats (SURVEY §2.1 S1/S2).

The reference walks the repo with compiled include/ignore globs
(internal/indexer/discovery.go:26-60), then per file computes line
stats, SHA-256 and text/binary detection
(internal/indexer/processor.go:84-141, internal/indexer/helpers.go).

Spark-first: the walk IS a datasource — ``binaryFile`` with
``pathGlobFilter``/``recursiveFileLookup`` gives (path, modificationTime,
length, content) with partition-parallel listing; every stat is a column
expression over the decoded content, so the whole "collect metadata"
phase is one narrow projection in codegen. Nothing here shuffles.

At 100 TB the discovery scan parallelizes by file naturally; stats ride
along with the scan, and the change-detection join (pipeline/
change_detection.py) consumes (file_path, mtime, content_hash) straight
from this frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def discover_files(
    spark: SparkSession,
    root: str,
    *,
    glob: str = "*",
    recursive: bool = False,
) -> DataFrame:
    """S1: glob-filtered file listing with raw content.

    Returns (file_path, mtime, size_bytes, content:binary). Ignore rules
    beyond one glob = `.filter(~col("file_path").rlike(...))` on top.

    Note the Hadoop listing convention: files whose names start with
    ``_`` or ``.`` are hidden and never surfaced (e.g. ``__init__.py``,
    ``_SUCCESS``); the reference's ignore-glob set is a superset of this.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
    )
    df = reader.load(root)
    return df.select(
        F.regexp_replace(F.col("path"), "^file:", "").alias("file_path"),
        F.col("modificationTime").alias("mtime"),
        F.col("length").alias("size_bytes"),
        F.col("content"),
    )


def file_stats(files: DataFrame) -> DataFrame:
    """S2: per-file metadata — SHA-256, text/binary flag, line counts
    classified into blank / comment / code (helpers.go's loop as column
    expressions; comment = leading '#', the fixture corpus is Python)."""
    text = F.decode(F.col("content"), "UTF-8")
    lines = F.split(text, "\n", -1)
    n_lines = F.size(lines)
    n_blank = F.size(F.filter(lines, lambda x: F.trim(x) == ""))
    n_comment = F.size(
        F.filter(lines, lambda x: F.startswith(F.trim(x), F.lit("#")))
    )
    return files.select(
        "file_path",
        "size_bytes",
        F.sha2(F.col("content"), 256).alias("content_hash"),
        (~F.contains(F.col("content"), F.lit(b"\x00"))).alias("is_text"),
        F.length(text).alias("n_chars"),
        n_lines.cast("long").alias("n_lines"),
        n_blank.cast("long").alias("n_blank"),
        n_comment.cast("long").alias("n_comment"),
        (n_lines - n_blank - n_comment).cast("long").alias("n_code"),
    )
