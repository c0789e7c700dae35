"""Branch/partition retention: the cache-eviction policy as a relational
operator.

Reference: `EvictStaleBranches` (internal/cache/eviction.go:15-135)
walks branch metadata sorted (git-deleted first, then oldest
last-accessed) and evicts when (1) the branch no longer exists in git,
(2) it was not accessed within MaxAgeDays, or (3) the cache is still
over MaxSizeMB — decrementing the running total as it goes. Protected
branches (main/master by default) are never candidates.

The sequential running-total rule collapses to a window expression:
pre-cutoff every candidate evicts (deleted/stale rows unconditionally,
size rows because the total is still over cap), so the running total at
any row equals ``total - cumsum(sizes of ALL preceding candidates)``;
once that drops to the cap it can never rise again. Hence

    evict(r) = deleted(r) OR stale(r)
               OR total - cumsum_before(r) > max_size_mb

over the (deleted DESC, last_accessed ASC) order — ONE window over the
(tiny) metadata table, no loop, same result as the reference's walk.

At 100 TB this is the data-retention control operator: its output
(branch, reason) drives partition-level deletes of the per-branch
tables (`sink.cascade_delete` per branch = drop the branch's partition
directories).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_AGE_DAYS = 30
DEFAULT_MAX_SIZE_MB = 500.0
DEFAULT_PROTECT = ("main", "master")


def evict_stale_branches(
    meta: DataFrame,
    *,
    live_branches: list[str] | None = None,
    now_us: int,
    max_age_days: int = DEFAULT_MAX_AGE_DAYS,
    max_size_mb: float = DEFAULT_MAX_SIZE_MB,
    protect: tuple[str, ...] = DEFAULT_PROTECT,
    branch_col: str = "branch",
    accessed_col: str = "last_accessed_us",
    size_col: str = "size_mb",
) -> DataFrame:
    """(branch, reason, size_mb, last_accessed_us) rows to evict.

    ``meta`` is the branch-metadata frame (one row per branch);
    ``live_branches`` is the set still existing in git (None = treat all
    as live, the reference's git-failure fallback: safer to keep data).
    ``now_us`` is an explicit clock for determinism. ``reason`` is the
    FIRST matching rule like the reference's check order:
    deleted > stale > size.
    """
    c = meta.filter(~F.col(branch_col).isin(*protect))
    if live_branches is not None:
        deleted = ~F.col(branch_col).isin(*live_branches) if live_branches else F.lit(True)
    else:
        deleted = F.lit(False)
    c = c.withColumn("_deleted", deleted)
    stale = (
        F.lit(now_us) - F.col(accessed_col)
        > F.lit(int(max_age_days) * 86_400 * 1_000_000)
    ) if max_age_days > 0 else F.lit(False)
    c = c.withColumn("_stale", stale)

    # total size spans ALL branches (protected included) — only candidate
    # evictions shrink it. The metadata table is tiny (one row per
    # branch), so single-partition windows are fine by construction.
    total = F.sum(size_col).over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    meta_total = meta.select(total.alias("_t")).limit(1)
    order = Window.orderBy(
        F.col("_deleted").desc(), F.col(accessed_col).asc(),
        F.col(branch_col).asc(),
    )
    cum_before = F.coalesce(
        F.sum(size_col).over(
            order.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0.0),
    )
    out = (
        c.crossJoin(F.broadcast(meta_total))
        .withColumn("_cum_before", cum_before)
        .withColumn(
            "_evict",
            F.col("_deleted")
            | F.col("_stale")
            | (
                (F.col("_t") - F.col("_cum_before") > F.lit(float(max_size_mb)))
                if max_size_mb > 0
                else F.lit(False)
            ),
        )
        .filter(F.col("_evict"))
        .select(
            F.col(branch_col).alias("branch"),
            F.when(F.col("_deleted"), F.lit("deleted"))
            .when(F.col("_stale"), F.lit("stale"))
            .otherwise(F.lit("size"))
            .alias("reason"),
            F.col(size_col).alias("size_mb"),
            F.col(accessed_col).alias("last_accessed_us"),
        )
    )
    return out
