"""Incremental full-text index — the reference's core loop, Spark-first.

The reference's watcher maintains a SQLite FTS5 index as files change
(internal/watcher + files_fts). The Spark analogue: a document-ingest
stream appends each batch's posting rows and doc-length rows to an
append-only index store (per-doc facts — the monoid is trivial union),
and BM25 queries run merge-on-read over the accumulated store through
the SAME FtsIndex/search machinery as the batch path, with corpus
stats (n_docs, avg_dl) re-derived lazily from the stored doc stats.

Contract: append-only ingest (each doc_id delivered once). Document
UPDATES are the merge sink's job (pipeline/sink.py apply_changeset
replaces a file's rows before re-indexing) — composing that with this
store means partitioning the store by batch and compacting, exactly
the posting-table maintenance a 100 TB deployment schedules anyway.

Scale: per batch, cost is one tokenize+aggregate over the NEW
documents; the store is bucketable/sortable by term so read-side term
filters become file skips (see build_fts_index's docstring on why the
batch path deliberately avoids caching postings).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_cortex_spark.functions.text import tokens
from project_cortex_spark.operators import fts as fts_mod
from project_cortex_spark.streaming.incremental import watch_and_index


def continuous_fts_index(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Maintain the postings + doc-stats store incrementally from a
    file-source stream of documents. Returns the StreamingQuery."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        toks = batch.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        toks.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).alias("tf")
        ).write.mode("append").parquet(
            os.path.join(index_dir, "postings", f"batch={batch_id}")
        )
        batch.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens(F.col(text_col))).alias("dl"),
        ).write.mode("append").parquet(
            os.path.join(index_dir, "doc_stats", f"batch={batch_id}")
        )

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_fts_index(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> fts_mod.FtsIndex:
    """Open the accumulated store as an FtsIndex — same search/scoring
    machinery as the batch index, so a query over the incrementally
    built store must equal the batch oracle over every document
    delivered so far."""
    rd = lambda sub: (  # noqa: E731
        spark.read.option("recursiveFileLookup", "true").parquet(
            os.path.join(index_dir, sub)
        )
    )
    return fts_mod.FtsIndex(
        postings=rd("postings"),
        doc_stats=rd("doc_stats"),
        docs=docs,
        id_col=id_col,
        text_col=text_col,
    )
