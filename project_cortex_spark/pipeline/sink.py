"""Sinks: merge upsert (D8/S3-S5) and cascade delete (D10).

The reference writes chunks/FTS/vec rows transactionally per batch with
delete-then-insert upsert (chunk_writer.go:139-225) and relies on FK
CASCADE for file deletion (schema.go:196,233,307). On immutable columnar
storage both become set operations on the table state:

- ``merge_upsert``: logical MERGE keyed on the natural key — keep every
  existing row whose key is absent from the updates (left_anti), then
  union the updates. On Delta this is literally ``MERGE INTO``; on plain
  Parquet it is this anti-join + overwrite, idempotent by construction
  (re-running the same batch yields the same table — the pipeline's
  cross-table consistency story, SURVEY §2.9 D8).
- ``cascade_delete``: FK cascade enforced in the pipeline — one
  left_anti per child table against the deleted-keys frame.

Scale notes: the updates side of a merge is the changed-file minority,
so Spark broadcasts it; the full-table side is scanned once and never
shuffled. Partitioning the physical table by a path prefix (or module)
turns the overwrite into partition-overwrite instead of full rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(existing: DataFrame, updates: DataFrame, *, key: str) -> DataFrame:
    """Logical MERGE: updates win on key collision, everything else kept."""
    kept = existing.join(F.broadcast(updates.select(key)), key, "left_anti")
    return kept.unionByName(updates.select(*existing.columns))


def delete_keys(existing: DataFrame, deleted: DataFrame, *, key: str) -> DataFrame:
    """Remove rows whose key appears in ``deleted``."""
    return existing.join(F.broadcast(deleted.select(key)), key, "left_anti")


def cascade_delete(
    tables: dict[str, DataFrame], deleted: DataFrame, *, key: str
) -> dict[str, DataFrame]:
    """D10: apply the delete to every child table (chunks, types,
    functions, ... in the reference's schema) in one pass."""
    return {name: delete_keys(df, deleted, key=key) for name, df in tables.items()}


def apply_changeset(
    fs_state: DataFrame,
    indexed_state: DataFrame,
    *,
    key: str = "file_path",
) -> DataFrame:
    """The incremental-index invariant, end to end: detect changes (D1),
    upsert added/modified rows (D8), repair touched mtimes (D9), cascade
    the deletes (D10). The returned state must equal the filesystem
    state exactly — the pipeline's idempotence/convergence property
    (indexer_v2.go:64-135 achieves the same via per-file transactions).
    """
    from project_cortex_spark.pipeline.change_detection import detect_changes

    changes = detect_changes(fs_state, indexed_state, key=key)
    to_upsert = fs_state.join(
        changes.filter(F.col("status").isin("added", "modified", "touched")).select(key),
        key,
        "left_semi",
    )
    merged = merge_upsert(indexed_state, to_upsert, key=key)
    return delete_keys(
        merged, changes.filter(F.col("status") == "deleted"), key=key
    )
