"""Incremental cross-corpus paragraph dedup — the streaming C4 step.

The incremental-index pattern (rollup.py's split, like neardup/fts/vec):
the cross-batch state is a SEEN-PARAGRAPH store of md5 keys (first
occurrences); each delivery splits only ITS documents, drops paragraphs
already registered (or repeated within the batch), emits its cleaned
documents immediately, and appends the batch's new first-occurrence
hashes to the store. History is never re-split, per-batch cost is one
pass over the new documents plus an anti-join against the store.

Ordering contract: "first occurrence" is delivery order, then
(doc_id, pos) within a delivery. When deliveries arrive in id order
this equals the batch operator's global (doc_id, pos) rule — which is
what the gate asserts; out-of-order deliveries still keep exactly ONE
copy of every duplicated paragraph (the C4 invariant), just not
necessarily the globally-first one.

At 100 TB: the store is hash-per-unique-paragraph (a few dozen bytes
vs the paragraph), the anti-join is a plain hash join keyed on md5 —
broadcastable while the store is small, shuffle-partitioned after; the
per-batch window sees only the batch's paragraphs. Store compaction is
`layout.compact_store(spark, seen_dir, partition_cols=["batch"])` — the
partition_cols argument is MANDATORY here because `_seen` reads the
store through its ``batch=N`` subdirs (both for the normal read and for
replay's exclude-own-batch rule); a flat rewrite would leave a store
the reader finds empty.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_cortex_spark.operators import dedup as dd
from project_cortex_spark.streaming.incremental import watch_and_index


def _seen(
    spark: SparkSession, seen_dir: str, *, exclude_batch: int | None = None
) -> DataFrame:
    """The seen store, optionally excluding one batch's own partition —
    a REPLAYED batch (crash between output and store write, or between
    store write and checkpoint commit) must not see its own hashes, or
    it would drop its first occurrences as already-seen."""
    if os.path.isdir(seen_dir):
        parts = [
            os.path.join(seen_dir, d)
            for d in sorted(os.listdir(seen_dir))
            if d.startswith("batch=")
            and (exclude_batch is None or d != f"batch={exclude_batch}")
        ]
        if parts:
            return spark.read.parquet(*parts)
    return spark.createDataFrame([], "para_md5 string")


def dedup_batch(
    spark: SparkSession,
    batch: DataFrame,
    seen_dir: str,
    *,
    sep: str = "\n\n",
    min_chars: int = 20,
    exclude_batch: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One delivery -> (cleaned docs, new first-occurrence hashes).

    Keep rule per paragraph: short fragments always; otherwise the
    within-batch first occurrence by (id, pos), provided its hash is
    not already in the seen store.
    """
    paras = dd.paragraph_rows(batch, sep=sep)
    w = Window.partitionBy(F.md5(F.col("para"))).orderBy(
        F.col("doc_id").asc(), F.col("pos").asc()
    )
    flagged = paras.withColumn("_rn", F.row_number().over(w))
    short = flagged.filter(F.length("para") < min_chars)
    first_long = (
        flagged.filter(
            (F.length("para") >= min_chars) & (F.col("_rn") == 1)
        )
        .withColumn("_h", F.md5(F.col("para")))
        .join(
            _seen(spark, seen_dir, exclude_batch=exclude_batch)
            .withColumnRenamed("para_md5", "_h"),
            "_h",
            "left_anti",
        )
        # both sinks (cleaned output AND new-firsts append) derive from
        # this frame, and each write is its own Spark job — without the
        # checkpoint the window shuffle and the ever-growing seen-store
        # anti-join would run twice per delivery
        .localCheckpoint(eager=True)
    )
    kept = short.select("doc_id", "pos", "para").union(
        first_long.select("doc_id", "pos", "para")
    )
    out = dd.reassemble_paragraphs(batch, kept, paras, sep=sep)
    new_firsts = first_long.select(F.col("_h").alias("para_md5")).distinct()
    return out, new_firsts


def continuous_paragraph_dedup(
    spark: SparkSession,
    input_glob: str,
    schema,
    *,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    sep: str = "\n\n",
    min_chars: int = 20,
):
    """Maintain the cleaned corpus + seen-paragraph store incrementally
    from a file-source document stream. Returns the StreamingQuery
    (AvailableNow). Replay-idempotent: both sinks OVERWRITE their
    per-batch partition, and the batch re-derives its keep set with its
    OWN store partition excluded — so a crash anywhere between output
    write and checkpoint commit replays to byte-identical state."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        out, new_firsts = dedup_batch(
            spark,
            batch,
            seen_dir,
            sep=sep,
            min_chars=min_chars,
            exclude_batch=batch_id,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        new_firsts.write.mode("overwrite").parquet(
            os.path.join(seen_dir, f"batch={batch_id}")
        )

    return watch_and_index(
        spark, input_glob, schema, upsert, checkpoint_dir=checkpoint_dir
    )


def read_cleaned_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated cleaned corpus — with in-id-order deliveries,
    identical to the one-shot ``dedup.dedup_paragraphs`` over every
    document delivered so far (what the oracle gates)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)
