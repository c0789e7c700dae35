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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the (large, skewed) left side gets a
    random salt in [0, n_salts); the right side is replicated once per
    salt; the join key becomes (key, salt), splitting each hot key's
    rows across ``n_salts`` reducers.

    Result set is identical to ``left.join(right, key, how)`` for inner/
    left joins (each left row still meets every matching right row,
    exactly once). Use when AQE's skew-join splitting can't apply —
    broadcast-ineligible sides, or persisted pre-partitioned layouts.
    Cost: right side scanned/shuffled n_salts times — size n_salts by
    hot-key row count / target partition size.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_l = left.withColumn(
        "_salt", (F.rand(42) * n_salts).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_l.join(salted_r, [key, "_salt"], how).drop("_salt")


def recover_store(path: str) -> bool:
    """Heal a store dir after a compaction crash. ``compact_store``'s
    swap is two renames, so there is a (two-syscall) window where only
    ``<path>__bak`` exists; recovery is keyed on which dirs survive:

    * live + ``__bak`` — the crash happened before/after the window;
      ``__bak`` is a stale copy, delete it.
    * ``__bak`` only — the crash happened INSIDE the window; ``__bak``
      IS the live data, rename it back.

    Returns True if a restore happened. CRASH recovery only — call it
    when no compaction/store of this path can be in flight (same
    single-administrator assumption as compact_store itself): invoked
    concurrently with a LIVE swap it races the two renames — it can
    restore __bak into the compactor's rename target or delete the
    __bak the compactor is about to remove, crashing the compactor. A
    reader that hits a missing dir while a compactor may be running
    should simply retry (the window is two syscalls); recover_store is
    for afterwards, when the missing dir persists because the writer
    died.
    """
    import os
    import shutil

    bak = path.rstrip("/") + "__bak"
    if os.path.exists(bak):
        if os.path.exists(path):
            shutil.rmtree(bak)
        else:
            os.rename(bak, path)
            return True
    return False


def compact_store(
    spark: SparkSession,
    path: str,
    *,
    target_files: int = 4,
    partition_cols: list[str] | None = None,
) -> dict[str, int]:
    """Compact an append-only parquet store (the maintenance step every
    per-batch-appending stream sink needs — streaming/fts_index,
    neardup, vec_index each write one small file per micro-batch, and a
    long-running ingest turns that into the classic small-files problem:
    file-listing latency and one scan task per tiny file).

    Rewrites the store to ``target_files`` files when flat; with
    ``partition_cols`` the rewrite preserves the hive directory layout
    (and its pruning) and lands ONE file per partition value — which is
    the goal when compacting many small per-batch files (rows of one
    partition value hash to one task; ``target_files`` only caps the
    task count). Then swaps: write to a sibling temp dir, rename
    old -> .bak, temp -> live, drop .bak. A reader never sees a MIX of
    old and new files, but in the instant between the two renames the
    live path does not exist — a concurrent read can fail and must
    retry (it then sees the complete new store), and a crash in that
    window leaves the .bak for recovery. True lost-update-free
    atomicity needs a manifest pointer swap (object stores / table
    formats); this is the plain-filesystem approximation, fine for the
    scheduled-maintenance use.

    Stores whose READERS depend on the directory layout must preserve
    it: the paradedup seen store is read via its ``batch=N`` subdirs,
    so compact it with ``partition_cols=["batch"]`` — a flat rewrite
    would silently empty what its reader can find.

    Returns {"files_before": n, "files_after": m} so schedulers can log
    the win. Content is proven identical by tests (and by the streaming
    index gates, which re-run against compacted stores unchanged —
    merge-on-read reads the directory, not the file list).
    """
    import glob
    import os
    import shutil

    def _count(p: str) -> int:
        return sum(
            1
            for f in glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
            if os.path.isfile(f)
        )

    # Heal any previous compaction crash BEFORE reading: if only __bak
    # survives, it is the live data (see recover_store). Callers must
    # not compact a store a running stream is actively reading (a
    # reader racing the two-rename window sees a missing dir and should
    # RETRY — not recover_store, which must never run against a live
    # swap); compact between triggers, or on a quiesced store.
    recover_store(path)
    before = _count(path)
    if partition_cols:
        # hive partition discovery must stay on: the partition column
        # lives in directory names, which recursiveFileLookup discards
        df = spark.read.parquet(path)
    else:
        df = spark.read.option("recursiveFileLookup", "true").parquet(path)
    tmp, bak = path.rstrip("/") + "__compact", path.rstrip("/") + "__bak"
    if partition_cols:
        writer = (
            df.repartition(target_files, *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
        )
    else:
        writer = df.repartition(target_files).write.mode("overwrite")
    writer.parquet(tmp)
    # the entry-time recover_store cleared/restored __bak; under the
    # single-administrator assumption nothing recreated it since (a
    # concurrent recover/compact of the same path is a caller bug —
    # see recover_store's docstring)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return {"files_before": before, "files_after": _count(path)}
