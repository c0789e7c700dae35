"""Incremental edit-distance near-dup index — fixed-width key prefixes
maintained by a document-ingest stream, ED pairs derived merge-on-read.

The neardup.py split applied to the PassJoin ED join
(operators/dedup.py ``edit_distance_pairs``): foreachBatch OVERWRITES
each batch's (doc_id, key) fact rows into a batch_id-keyed partition
(replay-idempotent — the paradedup/vec_index discipline), and the
candidate generation + levenshtein verification run at read time over
the accumulated store. Incremental cost per batch is ONE projection of
the new documents; history is never re-read.

At 100 TB: the key store is a few dozen bytes per doc; the read-side
PassJoin runs over DISTINCT keys (template prefixes collapse before the
candidate join), and a production deployment alerting per batch would
probe new-vs-all by generating probe substrings for the latest batch
only — the store layout (plain key column) already supports it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from project_cortex_spark.operators import dedup as dd
from project_cortex_spark.streaming.incremental import watch_and_index


def continuous_keys(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    keys_dir: str,
    checkpoint_dir: str,
    key_len: int = 32,
):
    """Maintain the (doc_id, key) store incrementally from a
    file-source document stream. Returns the StreamingQuery
    (AvailableNow). Replays overwrite their own batch partition."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        dd.edit_distance_keys(batch, key_len=key_len).write.mode(
            "overwrite"
        ).parquet(os.path.join(keys_dir, f"batch={batch_id}"))

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_pairs(
    spark: SparkSession,
    keys_dir: str,
    *,
    k: int = 2,
    key_len: int = 32,
) -> DataFrame:
    """Merge-on-read: the PassJoin candidate join + levenshtein verify
    over the accumulated key store — identical output to the one-shot
    ``dedup.edit_distance_pairs`` over every document delivered so far
    (which is what the oracle gates)."""
    keyed = spark.read.option("recursiveFileLookup", "true").parquet(
        keys_dir
    )
    return dd.edit_distance_pairs_on_keys(keyed, k=k, key_len=key_len)
