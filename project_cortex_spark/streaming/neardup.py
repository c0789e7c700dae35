"""Incremental near-duplicate index — MinHash signatures maintained by
a document-ingest stream, near-dup pairs derived merge-on-read.

The rollup.py split applied to dedup: the stream's foreachBatch appends
each new batch's MinHash signatures to an append-only signature store
(the monoid here is trivial — signatures are per-doc facts), and the
banded candidate join + exact Jaccard verification run at read time
over the accumulated store. Incremental cost per batch is ONE
shingle+min-agg pass over the new documents only; history is never
re-shingled.

At 100 TB: the signature store is the small derived table (K hex
hashes per doc — a few hundred bytes vs the raw document), so the
read-side band join runs over ~0.1% of the corpus bytes; the raw
corpus is touched again only to verify candidate pairs (bounded by the
banding's collision rate). A production deployment would additionally
restrict the read-side probe to new-vs-all (join the latest batch's
bands against the store) for per-batch alerting — the store layout
already supports it (band keys are plain columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_cortex_spark.operators import dedup as dd
from project_cortex_spark.streaming.incremental import watch_and_index


def signature_partial(
    batch: DataFrame,
    *,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """One batch of documents -> (doc_id, h0..h{K-1}) signature rows."""
    return dd.minhash_signatures(
        batch, num_hashes=num_hashes, shingle_n=shingle_n
    )


def continuous_signatures(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    sigs_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
):
    """Maintain the signature store incrementally from a file-source
    stream of documents. Returns the StreamingQuery (AvailableNow)."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        signature_partial(
            batch, num_hashes=num_hashes, shingle_n=shingle_n
        ).write.mode("append").parquet(
            os.path.join(sigs_dir, f"batch={batch_id}")
        )

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_near_duplicates(
    spark: SparkSession,
    sigs_dir: str,
    docs: DataFrame,
    *,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Merge-on-read: banded candidates over the accumulated signature
    store, exact Jaccard verification against the documents — identical
    output to the one-shot ``dedup.minhash_near_duplicates`` over every
    document delivered so far (which is what the oracle gates)."""
    sigs = spark.read.option("recursiveFileLookup", "true").parquet(sigs_dir)
    pairs = dd.lsh_candidate_pairs(sigs, num_hashes=num_hashes, bands=bands)
    return (
        dd.jaccard_for_pairs(pairs, docs, shingle_n=shingle_n)
        .filter(F.col("jaccard") >= threshold)
    )
