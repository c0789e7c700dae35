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

    Broadcast dispatch (r10, guide §2.5/§3.1): a broadcast hash join has
    no skew problem — the big side is never shuffled, so per-reducer hot
    keys cannot exist and the salt is pure overhead (n_salts x the
    broadcast build: measured 1.38 s salted vs 0.43 s broadcast on the
    same inputs at sf0.1). When the right side's optimizer-estimated
    size fits ``spark.sql.autoBroadcastJoinThreshold`` — the planner's
    own broadcast statistic — the join runs as a plain broadcast join
    (identical result); the salted (key, salt) shuffle join remains the
    path for broadcast-ineligible right sides, which is the regime the
    operator exists for. Set the threshold to -1 to force salting.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    spark = left.sparkSession
    try:
        thresh = spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
        r_bytes = int(
            right._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        broadcastable = int(thresh) > 0 and 0 < r_bytes <= int(thresh)
    except Exception:
        broadcastable = False  # stats unavailable: keep the salted path
    if broadcastable:
        return left.join(F.broadcast(right), key, how)
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


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering and runtime Bloom-filter join pruning: the
# two layout/plan techniques that matter most at 100 TB and are gated
# exactly (z-order stats replay in DuckDB from the same bit formula; the
# bloom prefilter is result-preserving, so its oracle is the plain join).


def morton_sql(x: str, y: str, *, bits: int, shift_fmt: str) -> str:
    """Bit-interleave expression text shared by BOTH engines: z =
    sum_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1). ``shift_fmt`` renders the
    engine's right-shift — ``shiftright({v}, {i})`` for Spark SQL,
    ``({v} >> {i})`` for DuckDB; masks and weights are plain arithmetic
    so the rest of the text is engine-neutral."""
    terms = []
    for i in range(bits):
        sx = shift_fmt.format(v=x, i=i)
        sy = shift_fmt.format(v=y, i=i)
        terms.append(f"({sx} % 2) * {1 << (2 * i)}")
        terms.append(f"({sy} % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_bucket_stats(
    orders: DataFrame,
    *,
    x_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    bits: int = 10,
    bucket_bits: int = 6,
) -> DataFrame:
    """Z-order layout audit: rank-normalize two filter dimensions to
    ``bits``-bit integers, interleave them into a Morton key, split the
    key range into 2^bucket_bits buckets (the files a writer would
    produce), and emit each bucket's row count and per-dimension
    min/max envelope.

    WHY: a 100 TB table is pruned by file-level min/max statistics; a
    single-column sort gives perfect pruning on one dimension and NONE
    on the other, while z-order bounds BOTH envelopes per file — this
    operator measures exactly that (the test asserts the summed bucket
    area is a small fraction of buckets x full area). The normalization
    and interleave are integer-exact (`div`, `%`, shifts), so the
    DuckDB oracle reproduces the stats bit-for-bit.

    Scale shape: one 1-row min/max aggregate broadcast into a codegen
    projection, then one groupBy over 2^bucket_bits keys — map-side
    combined, shuffle width = bucket count. An actual rewrite would
    ``repartitionByRange(z).sortWithinPartitions(z)`` + write; the
    stats here are the decision input for that rewrite.
    """
    from pyspark.sql import functions as F

    mm = orders.agg(
        F.min(x_col).alias("xmin"),
        F.max(x_col).alias("xmax"),
        F.min(F.datediff(F.col(date_col).cast("date"), F.lit("1992-01-01"))).alias(
            "ymin"
        ),
        F.max(F.datediff(F.col(date_col).cast("date"), F.lit("1992-01-01"))).alias(
            "ymax"
        ),
    )
    top = (1 << bits) - 1
    base = orders.select(
        F.col(x_col).alias("x"),
        F.datediff(F.col(date_col).cast("date"), F.lit("1992-01-01")).alias("y"),
    ).crossJoin(F.broadcast(mm))
    norm = base.select(
        F.expr(f"(cast(x - xmin as bigint) * {top}) div "
               f"cast(greatest(xmax - xmin, 1) as bigint)").alias("nx"),
        F.expr(f"(cast(y - ymin as bigint) * {top}) div "
               f"cast(greatest(ymax - ymin, 1) as bigint)").alias("ny"),
    )
    z = morton_sql("nx", "ny", bits=bits, shift_fmt="shiftright({v}, {i})")
    zb = norm.select(
        F.expr(f"{z} div {1 << (2 * bits - bucket_bits)}").alias("bucket"),
        "nx",
        "ny",
    )
    return (
        zb.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("nx").alias("nx_min"),
            F.max("nx").alias("nx_max"),
            F.min("ny").alias("ny_min"),
            F.max("ny").alias("ny_max"),
        )
        .orderBy("bucket")
    )


def bloom_semi_filter(
    probe: DataFrame,
    probe_key: str,
    build_keys: DataFrame,
    build_key: str,
    *,
    width: int = 1 << 16,
    hashes: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Runtime Bloom-filter prefilter: hash the build side's keys into
    ``hashes`` positions over a ``width``-bit space, then keep only the
    probe rows whose EVERY position is occupied. No false negatives by
    construction (a present key's positions are all set), so a join
    after the prefilter returns exactly the unfiltered join — the gate
    exploits that: the oracle is the plain join.

    WHY at 100 TB: when the build side is selective (a filtered dim),
    the probe scan drops most rows BEFORE the join shuffle — this is
    what Spark's own runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.enabled) injects for
    shuffle joins; the explicit form works where the optimizer won't
    reach — pre-shuffle pruning in custom pipelines, persisted
    prefilters reused across queries, or semi-structured probe sides.

    Plan shape: the position set is a distinct aggregate of at most
    ``hashes x |build|`` (capped by ``width``) rows, cached after the
    first materialization (r9 — the baseline plan re-ran the whole
    aggregate inside every broadcast, ``hashes`` x |union legs| build
    scans), then broadcast into ``hashes`` successive LEFT SEMI joins —
    zero probe-side shuffles.
    """
    from pyspark.sql import functions as F

    def pos(col, j):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{j}:"), col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        return h % F.lit(width)

    bits = None
    for j in range(hashes):
        b = build_keys.select(pos(F.col(build_key), j).alias("pos"))
        bits = b if bits is None else bits.unionAll(b)
    bits = bits.distinct()
    # materialize the position set ONCE: each of the `hashes`
    # broadcasts below otherwise re-runs the whole union+distinct
    # aggregate (the r9 baseline plan showed hashes x |union legs|
    # build-side scans). cache(), not localCheckpoint: the first
    # broadcast build populates the cache in-line, the rest read it —
    # a lazy checkpoint added a blocking materialization job and
    # measured WORSE (2.16 -> 2.31 s); a literal-bitmask variant
    # (collect + element_at filter) was also A/B'd and REJECTED, a
    # width-length array literal is re-built per evaluated row (not
    # constant-folded), 20x worse. At 100 TB the cache bounds are the
    # position set's (<= width rows), not the build table's.
    bits = bits.cache()
    out = probe
    for j in range(hashes):
        out = out.join(
            F.broadcast(bits),
            pos(F.col(probe_key), j) == F.col("pos"),
            "left_semi",
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    x_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    bits: int = 10,
    n_files: int = 8,
) -> None:
    """The rewrite :func:`zorder_bucket_stats` is the decision input
    for: compute the Morton key, range-partition into ``n_files`` and
    sort within partitions by it, write parquet. Each output file's
    min/max footer statistics then bound BOTH dimensions (the test
    reads the footers back and checks the envelopes beat a 1-D sort's),
    so a reader filtering on either column — or both — skips files.

    At 100 TB this runs per partition/day as a compaction pass;
    repartitionByRange samples the z keys, so skewed key spaces still
    split evenly.
    """
    from pyspark.sql import functions as F

    mm = df.agg(
        F.min(x_col).alias("xmin"),
        F.max(x_col).alias("xmax"),
        F.min(F.datediff(F.col(date_col).cast("date"), F.lit("1992-01-01"))).alias(
            "ymin"
        ),
        F.max(F.datediff(F.col(date_col).cast("date"), F.lit("1992-01-01"))).alias(
            "ymax"
        ),
    )
    top = (1 << bits) - 1
    base = df.withColumn(
        "_y", F.datediff(F.col(date_col).cast("date"), F.lit("1992-01-01"))
    ).crossJoin(F.broadcast(mm))
    normed = base.withColumn(
        "_nx",
        F.expr(
            f"(cast({x_col} - xmin as bigint) * {top}) div "
            f"cast(greatest(xmax - xmin, 1) as bigint)"
        ),
    ).withColumn(
        "_ny",
        F.expr(
            f"(cast(_y - ymin as bigint) * {top}) div "
            f"cast(greatest(ymax - ymin, 1) as bigint)"
        ),
    )
    z = morton_sql("_nx", "_ny", bits=bits, shift_fmt="shiftright({v}, {i})")
    keyed = normed.withColumn("_z", F.expr(z))
    # INT96 timestamps (a writer default in several Spark lineages)
    # carry NO min/max statistics — which silently disables the very
    # pruning this layout exists for. Force int64 micros for the write.
    conf = df.sparkSession.conf
    key = "spark.sql.parquet.outputTimestampType"
    old = conf.get(key, None)
    conf.set(key, "TIMESTAMP_MICROS")
    try:
        (
            keyed.repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_y", "_nx", "_ny", "_z", "xmin", "xmax", "ymin", "ymax")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if old is None:
            conf.unset(key)
        else:
            conf.set(key, old)
