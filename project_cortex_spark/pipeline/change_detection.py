"""Change detection: filesystem state vs indexed state as one plan (D1).

The reference walks the repo and compares each file against the DB row:
mtime fast-path, SHA-256 slow-path, yielding {Added, Modified, Deleted,
Unchanged} (internal/indexer/change_detector.go:46-180). Declaratively
that whole loop is a single full-outer join on the natural key plus a
CASE classification — Spark shuffles both sides once on file_path and
every comparison happens map-side after the join.

Also here:
- ``touched`` status (mtime differs, hash equal) = the reference's
  mtime-drift repair input (D9, indexer_v2.go:91-97).
- ``detect_changes_lazy_hash``: the mtime fast-path as *plan structure* —
  content hashing only runs for rows whose mtime differs, which is the
  scale-relevant property (hashing is the expensive part at 100 TB; the
  mtime-equal majority never touches file content).
- ``fork_branch`` (D11/S8): seed a new branch namespace by copying rows
  for unchanged files from the merge-base ancestor
  (internal/indexer/branch_synchronizer.go:198-424) — a left_anti join,
  cheap because Parquet is columnar-immutable.

Scale notes: one shuffle on file_path for the outer join; the changed
set (output of the filter) is normally tiny relative to the corpus, so
every downstream stage (parse/chunk/embed) runs on a broadcast-sized
frame while the unchanged majority is never rescanned.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUSES = ("added", "deleted", "modified", "touched", "unchanged")


def detect_changes(
    fs_state: DataFrame,
    indexed_state: DataFrame,
    *,
    key: str = "file_path",
    mtime_col: str = "mtime",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Full-outer diff of filesystem vs index: (key, status).

    Classification mirrors change_detector.go:46-180: present only on
    disk -> added; present only in index -> deleted; mtime equal ->
    unchanged (fast path — hash never consulted); hash equal -> touched
    (mtime drift, D9); else modified.
    """
    fs = fs_state.select(
        F.col(key).alias("fs_key"),
        F.col(mtime_col).alias("fs_mtime"),
        F.col(hash_col).alias("fs_hash"),
    )
    idx = indexed_state.select(
        F.col(key).alias("idx_key"),
        F.col(mtime_col).alias("idx_mtime"),
        F.col(hash_col).alias("idx_hash"),
    )
    joined = fs.join(idx, fs.fs_key == idx.idx_key, "full_outer")
    status = (
        F.when(F.col("idx_key").isNull(), F.lit("added"))
        .when(F.col("fs_key").isNull(), F.lit("deleted"))
        .when(F.col("fs_mtime") == F.col("idx_mtime"), F.lit("unchanged"))
        .when(F.col("fs_hash") == F.col("idx_hash"), F.lit("touched"))
        .otherwise(F.lit("modified"))
    )
    return joined.select(
        F.coalesce("fs_key", "idx_key").alias(key), status.alias("status")
    )


def detect_changes_lazy_hash(
    fs_meta: DataFrame,
    indexed_state: DataFrame,
    hash_fn: Callable[[DataFrame], DataFrame],
    *,
    key: str = "file_path",
    mtime_col: str = "mtime",
    hash_col: str = "content_hash",
) -> DataFrame:
    """D1 with the mtime fast-path expressed in the plan: ``fs_meta`` has
    no hash column; ``hash_fn`` (e.g. ``lambda df: df.withColumn(
    "content_hash", F.sha2("content", 256))``) is applied ONLY to rows
    whose mtime differs from the indexed state, so content is read/hashed
    for the minority.

    Returns the same (key, status) frame as :func:`detect_changes`.
    """
    idx = indexed_state.select(
        F.col(key).alias("idx_key"),
        F.col(mtime_col).alias("idx_mtime"),
        F.col(hash_col).alias("idx_hash"),
    )
    joined = fs_meta.join(idx, fs_meta[key] == idx.idx_key, "full_outer")

    fast = joined.filter(
        F.col("idx_key").isNull()
        | F.col(key).isNull()
        | (F.col(mtime_col) == F.col("idx_mtime"))
    ).select(
        F.coalesce(key, "idx_key").alias(key),
        F.when(F.col("idx_key").isNull(), F.lit("added"))
        .when(F.col(key).isNull(), F.lit("deleted"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )

    slow_in = joined.filter(
        F.col("idx_key").isNotNull()
        & F.col(key).isNotNull()
        & (F.col(mtime_col) != F.col("idx_mtime"))
    ).drop("idx_key", "idx_mtime")
    slow = hash_fn(slow_in).select(
        F.col(key),
        F.when(F.col(hash_col) == F.col("idx_hash"), F.lit("touched"))
        .otherwise(F.lit("modified"))
        .alias("status"),
    )
    return fast.unionByName(slow)


def changed_keys(changes: DataFrame, *, key: str = "file_path") -> DataFrame:
    """Keys needing reprocessing (added|modified) — the frame the parse/
    chunk/embed stages join against (stable-chunk-id re-embed skip,
    CLAUDE.md:1083, becomes this anti-join)."""
    return changes.filter(F.col("status").isin("added", "modified")).select(key)


def fork_branch(
    ancestor: DataFrame, changed: DataFrame, *, key: str = "file_path"
) -> DataFrame:
    """D11/S8 branch fork: ancestor rows for files NOT in the changed set
    are copied verbatim into the new branch namespace
    (branch_synchronizer.go:66-130 does this row-by-row; here it is one
    left_anti join, broadcast when the changed set is small)."""
    return ancestor.join(F.broadcast(changed.select(key)), key, "left_anti")


# ---------------------------------------------------------------------------
# Simulated states over the synthetic `documents` table — used by the
# registered oracle query and tests (there is no real filesystem in the
# harness; the shapes match collectFileMetadata, processor.go:84-93).
# ---------------------------------------------------------------------------


def simulated_indexed_state(docs: DataFrame) -> DataFrame:
    """Docs indexed in a previous pass: every doc_id % 13 != 0 (the %13
    rows are 'new on disk' -> added)."""
    return docs.filter(F.col("doc_id") % 13 != 0).select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("file_path"),
        (F.col("doc_id") % 1000).alias("mtime"),
        F.md5("text").alias("content_hash"),
    )


def simulated_fs_state(docs: DataFrame) -> DataFrame:
    """Current disk state: %10 rows deleted; %7 rows edited (content +
    mtime); %11 rows touched (mtime bumped, content identical)."""
    edited = F.col("doc_id") % 7 == 0
    touched = F.col("doc_id") % 11 == 0
    return docs.filter(F.col("doc_id") % 10 != 0).select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("file_path"),
        (
            F.col("doc_id") % 1000
            + F.when(edited, 1).otherwise(0)
            + F.when(touched, 2).otherwise(0)
        ).alias("mtime"),
        F.md5(
            F.when(edited, F.concat(F.col("text"), F.lit(" changed"))).otherwise(
                F.col("text")
            )
        ).alias("content_hash"),
    )
