"""Event-stream analytics operators (batch twins of the streaming ops).

The reference has no event-time processing (SURVEY.md §2.10 — its
"streaming" is a filesystem watch loop, internal/watcher/file_watcher.go),
so these are beyond-parity operators for the 100 TB pipeline goal: the
same windowed/sessionized shapes a training-data ingest needs. Each has
an exact DuckDB oracle (oracle.py) and a Structured Streaming twin in
``streaming/`` that reuses the identical column expressions.

Scale notes:
- ``windowed_agg`` is a single hash aggregate keyed on (window,
  event_type) — map-side partial aggregation means the shuffle carries
  only one row per (window, type) per task, not per event.
- ``sessionize`` shuffles once on ``user_id`` (the window partition key);
  the follow-up session aggregate reuses the same partitioning, so
  Catalyst plans exactly one exchange for the whole operator.
- ``top_users_per_type`` pre-aggregates (event_type, user_id) before the
  rank window, so the window sort sees |users|x|types| rows, not raw
  events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sum6(col: str = "value"):
    """round(sum(col), 6) with an EXACT e4-scaled BIGINT accumulator.

    A plain float sum's last ulp depends on accumulation order; at
    sf0.1 a windowed avg landed on a round-half boundary where Spark
    and DuckDB rounded to different 6th decimals. The fixture's value
    columns carry <= 4 decimals, so summing round(value*1e4)::long is
    lossless and both engines derive the rounded double from the SAME
    integer. Oracle twin: oracle._SUM6_SQL."""
    return F.round(
        F.sum(F.round(F.col(col) * 10000).cast("long")) / 10000.0, 6
    )


def _avg6(col: str = "value"):
    """round(avg(col), 6) derived ENTIRELY in integer arithmetic from
    the exact e4 sum (see _sum6): q = half-away-round(100·s / n) as
    (200·|s| + n) DIV (2·n) on BIGINTs, then ONE exact double division
    by 1e6. The previous double form — round((s/1e4)/n, 6) — can land
    exactly on a 6-decimal half boundary (first seen at sf1:
    13911.3/320 = 43.4728125) where Spark's and DuckDB's round() of
    1-ulp-apart doubles disagree; integer rounding makes the boundary
    decision exact on both engines. The (num − pmod)/den division is
    exact in doubles because the quotient is an integer ≪ 2^53.
    count(col) mirrors avg's NULL semantics (all-NULL group → NULL).
    Oracle twin: oracle._AVG6_SQL."""
    s = F.sum(F.round(F.col(col) * 10000).cast("long"))
    n = F.count(col)
    num = F.lit(200) * F.abs(s) + n
    den = F.lit(2) * F.greatest(n, F.lit(1))
    q = ((num - F.pmod(num, den)) / den).cast("long")
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        F.signum(s) * q / F.lit(1000000.0)
    )


def windowed_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time windows (epoch-aligned, like streaming
    ``F.window``): per (window, event_type) count / sum / avg.

    The sum is accumulated as an EXACT e4-scaled BIGINT (the sessionize
    idiom) and sum/avg are derived from that one integer: a plain
    float sum's last ulp depends on accumulation order, and at sf0.1 a
    window landed on a round-half boundary where Spark's and DuckDB's
    float sums rounded to different 6th decimals. Integer-in,
    identical-double-arithmetic-out makes both engines bit-equal at
    any scale (values are generated with <= 4 decimals, so the scaling
    is lossless)."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum6().alias("sum_value"),
            _avg6().alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``. One shuffle on user_id;
    session numbering and the final aggregate share that partitioning.

    Batch twin of ``F.session_window`` / ``applyInPandasWithState``
    (streaming/stateful.py); microsecond-exact via ``unix_micros``.

    ``sum_value_e4`` is the per-session value total as an exact scaled
    integer (each value rounded to 4 decimals and scaled by 10^4 BEFORE
    summing). Integer addition is associative, so the result is
    bit-identical regardless of partitioning / aggregation order — a
    float sum rounded after aggregation drifts at the rounding boundary
    between engines (~1 session in 10^4 at round-6), which is exactly
    what broke the round-1 driver hash for this operator.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = events.withColumn(
        "prev_us", F.lag(F.unix_micros("ts")).over(w)
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull()
            | (F.unix_micros("ts") - F.col("prev_us") > gap_us),
            1,
        ).otherwise(0),
    )
    numbered = with_gap.withColumn(
        "session_seq", F.sum("new_session").over(w)
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sum_value_e4"),
    )


def props_extract(events: DataFrame) -> DataFrame:
    """JSON property extraction + bucketed aggregate: pulls ``$.k`` out of
    the ``props`` JSON string (JVM-side ``get_json_object``, no Python
    UDF) and aggregates by decade bucket and event_type."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy((F.floor(F.col("k") / 10) * 10).alias("k_bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _avg6().alias("avg_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    *,
    horizon_minutes: int = 7 * 24 * 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered three-step funnel: per user, how far the sequence
    step1 → step2 → step3 progresses, anchored at the user's FIRST step1
    event, each later step strictly after the previous one and within
    ``horizon_minutes`` of the anchor. Returns the funnel report
    (steps_completed ∈ 0..3, n_users) over every user seen in events.

    Semantics are deterministic and oracle-matchable: stepK's time is the
    MINIMUM timestamp of a stepK event strictly after step(K-1)'s time
    (ties at equal timestamps are excluded by strictness, so intra-tie
    order never matters), all within anchor + horizon.

    Scale notes: ONE shuffle over events (the groupBy user) — non-step
    events become NULL before the partial ``collect_list``, which drops
    them map-side, so the shuffle carries only funnel-step structs while
    every user (even step-less ones) still gets a row; no second scan,
    no distinct-users join. The per-user sequence is folded with a JVM
    higher-order ``aggregate`` over the sorted (ts_us, type) array —
    no self-joins, nothing leaves codegen, state per user is one
    (stage, anchor, prev) struct. The collect_list is bounded by
    funnel-step events per user, the usual cardinality contract for
    per-entity sequence analytics. The funnel-report aggregate after the
    fold shuffles ≤4 partial rows per task.
    """
    s1, s2, s3 = steps
    horizon_us = horizon_minutes * 60 * 1_000_000
    seq = (
        events.select(
            F.col(user_col),
            F.when(
                F.col(type_col).isin(list(steps)),
                F.struct(
                    F.unix_micros(F.col(ts_col)).alias("ts_us"),
                    F.col(type_col).alias("et"),
                ),
            ).alias("e"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("e")).alias("seq"))
    )
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("tp"),
    )

    def fold(acc, e):
        in_h = e["ts_us"] <= acc["t1"] + F.lit(horizon_us)
        adv1 = (acc["stage"] == 0) & (e["et"] == s1)
        adv2 = (acc["stage"] == 1) & (e["et"] == s2) & (e["ts_us"] > acc["tp"]) & in_h
        adv3 = (acc["stage"] == 2) & (e["et"] == s3) & (e["ts_us"] > acc["tp"]) & in_h
        adv = adv1 | adv2 | adv3
        return F.struct(
            F.when(adv, acc["stage"] + 1).otherwise(acc["stage"]).alias("stage"),
            F.when(adv1, e["ts_us"]).otherwise(acc["t1"]).alias("t1"),
            F.when(adv, e["ts_us"]).otherwise(acc["tp"]).alias("tp"),
        )

    return (
        seq.select(F.aggregate("seq", init, fold)["stage"].alias("steps_completed"))
        .groupBy("steps_completed")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: cohort = the epoch-aligned ``days``-bucket
    of a user's first event; for each (cohort_bucket, bucket_offset) the
    number of that cohort's users active in cohort + offset buckets.
    The product-analytics classic (offset 0 row = cohort size).

    All bucketing is integer epoch-micros division — exact on both
    engines, no timezone/calendar arithmetic to drift.

    Scale notes: two aggregates over a (user, bucket) projection — the
    distinct active set and the per-user min — both hash-partial map-side;
    the join back is on user_id (broadcastable cohort side when users ≪
    events, AQE decides). No windows over raw events, no event-row
    shuffle beyond the distinct.
    """
    bucket_us = days * 86_400 * 1_000_000
    pairs = (
        events.select(
            F.col(user_col),
            F.expr(f"unix_micros({ts_col}) div {bucket_us}").alias("bucket"),
        )
        .distinct()
    )
    cohorts = pairs.groupBy(user_col).agg(F.min("bucket").alias("cohort_bucket"))
    return (
        pairs.join(cohorts, user_col)
        .groupBy(
            "cohort_bucket",
            (F.col("bucket") - F.col("cohort_bucket")).alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rolling_anomaly(
    events: DataFrame,
    *,
    bucket_minutes: int = 60,
    lookback: int = 24,
    z_threshold: float = 3.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Rolling z-score anomaly detection on per-type event volume:
    bucket events into epoch-aligned ``bucket_minutes`` windows, then
    flag buckets whose count deviates from the trailing ``lookback``
    buckets' mean by more than ``z_threshold`` sample standard
    deviations. The monitoring classic (traffic spikes / drops per
    event type); the trailing window EXCLUDES the current bucket so an
    anomaly cannot suppress its own signal.

    Buckets with fewer than 2 trailing rows or zero trailing variance
    are never flagged (z is undefined there).

    All bucketing is integer epoch-micros division; the rolling stats
    run over counts (exact integers), so mean/std agree across engines
    to float ulps and the emitted values are rounded well above that.

    Scale notes: one hash aggregate over events (map-side partial → one
    row per (type, bucket)), then a bounded rows-window per type over
    the tiny bucket frame. The window partition key is the event type —
    if one type dominated, the aggregate has already collapsed volume
    to |buckets| rows, so no skew reaches the sort.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000
    counts = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.expr(f"unix_micros({ts_col}) div {bucket_us}").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return rolling_anomaly_on_buckets(
        counts,
        bucket_minutes=bucket_minutes,
        lookback=lookback,
        z_threshold=z_threshold,
    )


def rolling_anomaly_on_buckets(
    buckets: DataFrame,
    *,
    bucket_minutes: int = 60,
    lookback: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """The z-score half of :func:`rolling_anomaly`, factored over a
    (event_type, bucket, n_events) frame so the streaming twin
    (streaming/windows.py — the stream maintains the bucket counts,
    the reader derives the judgment, rollup-style merge-on-read) runs
    the IDENTICAL expressions as the batch operator."""
    bucket_us = bucket_minutes * 60 * 1_000_000
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-lookback, -1)
    )
    stats = buckets.select(
        "event_type",
        (F.col("bucket") * bucket_us).alias("bucket_start_us"),
        "n_events",
        F.avg("n_events").over(w).alias("_mean"),
        F.stddev_samp("n_events").over(w).alias("_std"),
        F.count("n_events").over(w).alias("_n_prev"),
    )
    z = (F.col("n_events") - F.col("_mean")) / F.col("_std")
    return (
        stats.filter(
            (F.col("_n_prev") >= 2)
            & (F.col("_std") > 0)
            & (F.abs(z) > z_threshold)
        )
        .select(
            "event_type",
            "bucket_start_us",
            "n_events",
            F.round("_mean", 4).alias("mean_prev"),
            F.round(z, 4).alias("z_score"),
        )
    )


def ohlc_resample(
    events: DataFrame,
    *,
    bucket_minutes: int = 60,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-series downsampling to OHLC bars: per (type, epoch bucket)
    the first/highest/lowest/last value — the metrics-resample shape
    (and the candlestick classic). First/last are made deterministic
    under timestamp ties by the (ts, event_id) total order on both
    engines, via row_number rather than first/last aggregates (whose
    tie behavior is engine-defined).

    Scale notes: ONE shuffle — the row_number window partitions by
    (type, bucket) and the follow-up aggregate groups by the same keys,
    so Catalyst reuses the partitioning; high/low/count are plain
    map-side-partial aggregates riding along.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000
    bucket = F.expr(f"unix_micros({ts_col}) div {bucket_us}")
    base = events.select(
        F.col(type_col).alias("event_type"),
        bucket.alias("_b"),
        F.col(ts_col).alias("_ts"),
        F.col("event_id"),
        F.col(value_col).alias("_v"),
    )
    w = Window.partitionBy("event_type", "_b")
    asc = w.orderBy(F.col("_ts").asc(), F.col("event_id").asc())
    desc = w.orderBy(F.col("_ts").desc(), F.col("event_id").desc())
    return (
        base.withColumn("_ra", F.row_number().over(asc))
        .withColumn("_rd", F.row_number().over(desc))
        .groupBy("event_type", "_b")
        .agg(
            F.round(F.max(F.when(F.col("_ra") == 1, F.col("_v"))), 6).alias("open"),
            F.round(F.max("_v"), 6).alias("high"),
            F.round(F.min("_v"), 6).alias("low"),
            F.round(F.max(F.when(F.col("_rd") == 1, F.col("_v"))), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            (F.col("_b") * bucket_us).alias("bucket_start_us"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def user_totals(events: DataFrame) -> DataFrame:
    """Per-(event_type, user) totals — the aggregate half of
    :func:`top_users_per_type`, factored so the streaming twin can
    maintain it as watermarked state and rank merge-on-read."""
    return events.groupBy("event_type", "user_id").agg(
        _sum6().alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rank_top_users(totals: DataFrame, k: int = 3) -> DataFrame:
    """The rank half of :func:`top_users_per_type`: deterministic
    (total DESC, user_id ASC) row_number per event_type."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def top_users_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k users by total value within each event_type. Aggregates
    before ranking so the window sort input is |users|x|types|, with a
    deterministic (total DESC, user_id ASC) tie order."""
    return rank_top_users(user_totals(events), k)


def debounce(
    events: DataFrame, *, quiet_seconds: int = 300
) -> DataFrame:
    """Leading-edge debounce per (user, event_type): keep an event iff
    the PREVIOUS event of the same key is more than ``quiet_seconds``
    older (or absent) — the telemetry-collapse rule that turns a burst
    of repeated signals into its first occurrence. A burst is a chain of
    events each within the quiet window of its predecessor, i.e. exactly
    a gap-session; kept events are the session leaders, which is why
    this is ONE lag window over one shuffle on the key — the seemingly
    sequential "previous KEPT event" rule needs no iteration.

    Emits the kept events plus ``burst_len`` (how many raw events the
    kept one absorbed, itself included) — the count an alerting or
    billing consumer needs. Integer-microsecond comparisons keep both
    engines exact; (ts, event_id) ordering makes ties deterministic.
    """
    gap_us = quiet_seconds * 1_000_000
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    t_us = F.unix_micros("ts")
    prev = F.lag(t_us).over(w)
    marked = events.withColumn(
        "_lead", (prev.isNull() | (t_us - prev > gap_us)).cast("int")
    )
    # burst id = running count of leaders; size each burst, keep leaders
    burst = F.sum("_lead").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = (
        marked.withColumn("_burst", burst)
        .withColumn(
            "burst_len",
            F.count(F.lit(1)).over(
                Window.partitionBy("user_id", "event_type", "_burst")
            ).cast("bigint"),
        )
    )
    return sized.filter(F.col("_lead") == 1).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "burst_len",
    )


def gapfill_resample(events: DataFrame, *, bucket_minutes: int = 60) -> DataFrame:
    """Resample each event_type onto its full regular time grid
    (min..max bucket), emitting a row for EVERY bucket: observed buckets
    carry their aggregate, gap buckets carry n_events=0 with the last
    observed sum forward-filled — the dense-series contract downstream
    time-series models (and SQL window baselines) need, which a plain
    groupBy cannot produce (it never emits empty buckets).

    Scale notes: events collapse to |buckets| rows in ONE map-side-
    partial hash aggregate before anything else; the grid explodes from
    a per-type (min, max) bounds frame — two tiny rows per type — so
    ``sequence()`` fan-out is |grid| rows, never |events|; the fill is
    one window over the grid keyed per type (same partitioning as the
    join, one exchange of grid-sized data). Integer-microsecond buckets
    keep every engine comparison exact; bucketing is FLOOR division
    (``(x - pmod(x, d)) div d``), so pre-1970 timestamps bucket
    correctly instead of truncating toward zero.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000
    agg = events.groupBy(
        F.col("event_type"),
        F.expr(
            f"(unix_micros(ts) - pmod(unix_micros(ts), {bucket_us}))"
            f" div {bucket_us}"
        ).alias("_b"),
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        _sum6().alias("_sum"),
    )
    bounds = agg.groupBy("event_type").agg(
        F.min("_b").alias("_b0"), F.max("_b").alias("_b1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("_b0", "_b1")).alias("_b")
    )
    joined = grid.join(agg, ["event_type", "_b"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        (F.col("_b") * bucket_us).alias("bucket_start_us"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.last("_sum", ignorenulls=True).over(w).alias("filled_sum"),
        F.col("_n").isNull().cast("int").alias("is_gap"),
    )


def value_histogram(events: DataFrame, *, width: float = 25.0) -> DataFrame:
    """Fixed-width value histogram per event_type — the numeric-profiling
    twin of ``corpus_profile``'s length buckets: bin = floor(value/width),
    with per-bin count / min / max / mean.

    Fixed width (vs equi-depth or min/max-scaled bins) is deliberate: the
    bin of a row depends on nothing but the row, so the whole operator is
    ONE map-side-partial hash aggregate keyed on (event_type, bin) — no
    pre-pass over the data, no global sort, and the shuffle carries one
    row per occupied bin per task. At 100 TB an equi-depth histogram
    needs a quantile sketch first; this is the exact, single-pass shape.
    """
    b = F.floor(F.col("value") / F.lit(float(width)))
    return (
        events.groupBy(F.col("event_type"), b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            _avg6().alias("avg_value"),
        )
        .withColumn("bin_lo", F.round(F.col("bin") * F.lit(float(width)), 6))
    )


def twap(events: DataFrame) -> DataFrame:
    """Time-weighted average value per event_type over the irregular
    sample series — the TWAP/telemetry-mean that a plain AVG gets wrong
    when samples cluster (a value held for an hour must weigh 3600x one
    held for a second). Each sample is weighted by its holding period
    ``dt = next_ts - ts`` within its type (lead window); the final
    sample has no holding period and drops out, the standard
    right-open-interval convention.

    One lag/lead window (one shuffle on event_type) + one map-side-
    partial aggregate. Integer-microsecond holding periods keep the
    weights engine-exact; the weighted sum is double with a round-6
    contract.
    """
    w = Window.partitionBy("event_type").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    dt = F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    intervals = events.withColumn("_dt", dt).filter(F.col("_dt").isNotNull())
    # NULLIF guard: a type whose every holding period is zero (all
    # samples share one timestamp) has no elapsed time to weight over —
    # twap is NULL, not a division error (ANSI mode throws) and not the
    # engine-dependent inf a bare double division would give
    return intervals.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(
            F.sum(F.col("value") * F.col("_dt"))
            / F.nullif(F.sum("_dt"), F.lit(0)),
            6,
        ).alias("twap"),
        _avg6().alias("plain_avg"),
    )


def activity_heatmap(events: DataFrame) -> DataFrame:
    """(day-of-week, hour-of-day) activity matrix — the classic usage
    heatmap. Bucketing is pure integer epoch arithmetic (1970-01-01 was
    a Thursday, so dow = (epoch_days + 4) % 7 with 0 = Sunday) — no
    calendar/timezone functions, so both engines agree exactly and the
    whole operator is ONE map-side-partial hash aggregate over ≤168
    keys. Day bucketing is FLOOR division via pmod (``x - pmod(x, d))
    div d`` is exact at any long magnitude, unlike a double floor), so
    pre-1970 timestamps land on the correct calendar day/hour instead
    of truncating toward zero."""
    day_us = 86_400 * 1_000_000
    hour_us = 3_600 * 1_000_000
    days = F.expr(
        f"(unix_micros(ts) - pmod(unix_micros(ts), {day_us})) div {day_us}"
    )
    dow = F.pmod(days + F.lit(4), F.lit(7))
    hour = F.expr(f"pmod(unix_micros(ts), {day_us}) div {hour_us}")
    return events.groupBy(
        dow.alias("dow"), hour.alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _sum6().alias("sum_value"),
    )


def sliding_window_agg(
    events: DataFrame, *, minutes: int = 60, slide_minutes: int = 15
) -> DataFrame:
    """Sliding (overlapping) event-time windows — the smoothing variant
    of :func:`windowed_agg`: each event contributes to
    ``minutes/slide_minutes`` windows, so rates read as a moving curve
    instead of tumbling steps. Native ``F.window(ts, size, slide)``:
    Catalyst expands each row to its covering windows BEFORE the one
    map-side-partial hash aggregate — fan-out is the window ratio (a
    constant), never |events|². Epoch-aligned starts keep both engines
    integer-exact.
    """
    w = F.window("ts", f"{minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum6().alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def ewma_series(
    events: DataFrame, *, minutes: int = 60, alpha: float = 0.25
) -> DataFrame:
    """Exponentially weighted moving average of per-type event volume:
    y_t = α·x_t + (1−α)·y_{t−1}, seeded y_0 = x_0, over the observed
    hourly buckets in time order — the classic smoother behind
    alerting baselines and trend monitors.

    The recursion is evaluated as an explicit LEFT FOLD over the
    cumulative ordered bucket array (collect_list over an ordered
    window, then ``aggregate`` seeded with the first element), which is
    bit-identical to DuckDB's ``list_reduce`` on the same array — so
    unlike most "stateful" time-series ops this one is fully
    hash-gateable. State per row is the cumulative array: fine for
    bounded series (buckets-per-key), the same envelope as any
    unbounded-preceding window; at 100 TB the shuffle key is
    (event_type) and the per-key series length is hours-of-history,
    not event count.
    """
    base = (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    xs = F.collect_list(F.col("n_events").cast("double")).over(w)
    fold = lambda y, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * y  # noqa: E731
    return base.withColumn("xs", xs).select(
        "event_type",
        "window_start",
        "n_events",
        F.round(
            F.aggregate(
                F.slice(F.col("xs"), F.lit(2), F.size("xs") - 1),
                F.element_at(F.col("xs"), 1),
                fold,
            ),
            6,
        ).alias("ewma"),
    )


def cusum_series(
    events: DataFrame,
    *,
    minutes: int = 60,
    slack_sigmas: float = 0.5,
    alarm_sigmas: float = 4.0,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Two-sided CUSUM change-point detection on per-group event volume
    (Page 1954): S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k)) and
    S⁻_t = max(0, S⁻_{t-1} − (x_t − μ + k)) over the ordered hourly
    buckets, with reference slack k = ``slack_sigmas``·σ and alarm
    threshold h = ``alarm_sigmas``·σ — the classical sequential drift
    localizer that complements :func:`ks_drift`/:func:`psi_drift`
    (those score WHETHER the distribution moved between halves; CUSUM
    reports the bucket WHERE the level shifted).

    μ and σ derive from exact integer power sums of the bucket counts
    over the WHOLE series (identical in both engines) — the
    self-referential form, which flags BOTH segments of a level shift
    (the low segment drives S⁻, the high segment S⁺); a production
    deployment would freeze μ/σ from an in-control reference window
    (the drift_bounds pattern) so only new deviation alarms. The
    recursion is the same explicit
    left fold as :func:`ewma_series` — seeded 0.0 via Spark's
    ``aggregate`` initial value, replayed in DuckDB as ``list_reduce``
    over ``list_prepend(0.0, xs)`` — so the "stateful" detector is
    fully hash-gateable. Same scale envelope as ewma: the shuffle key
    is the group, per-key series length is buckets-of-history.

    Returns (group, window_start, n_events, cusum_pos, cusum_neg,
    alarm).
    """
    base = cusum_cells(
        events, minutes=minutes, group_col=group_col, ts_col=ts_col
    )
    return cusum_on_cells(
        base,
        slack_sigmas=slack_sigmas,
        alarm_sigmas=alarm_sigmas,
        group_col=group_col,
    )


def bucket_count_cells(
    events: DataFrame,
    *,
    minutes: int = 60,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(group, time bucket) event counts — a pure count monoid
    (micro-batches merge by summing), so this frame IS the streaming
    state for every per-bucket-volume detector built on it (CUSUM,
    Holt smoothing, autocorrelation); state is bounded by active
    buckets per group. Detectors derive their statistics from these
    counts merge-on-read."""
    return (
        events.groupBy(
            F.window(ts_col, f"{minutes} minutes").alias("w"), group_col
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), group_col, "n_events"
        )
    )


def cusum_cells(
    events: DataFrame,
    *,
    minutes: int = 60,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """CUSUM state cells: the shared :func:`bucket_count_cells` monoid
    (kept as a named twin so the streaming registration reads as the
    detector it feeds)."""
    return bucket_count_cells(
        events, minutes=minutes, group_col=group_col, ts_col=ts_col
    )


def cusum_on_cells(
    base: DataFrame,
    *,
    slack_sigmas: float = 0.5,
    alarm_sigmas: float = 4.0,
    group_col: str = "event_type",
) -> DataFrame:
    """Merge-on-read CUSUM finisher over the (group, window_start,
    n_events) cells: exact-integer μ/σ power sums plus the seed-0
    fold — shared by the batch and streaming twins, and by the
    oracle."""
    wg = Window.partitionBy(group_col)
    wrun = (
        Window.partitionBy(group_col)
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mu = F.col("s1") / F.col("cnt")
    sigma = F.sqrt(
        F.greatest(
            F.col("s2") / F.col("cnt") - mu * mu,
            F.lit(0.0),
        )
    )
    staged = base.select(
        group_col,
        "window_start",
        "n_events",
        F.count(F.lit(1)).over(wg).alias("cnt"),
        F.sum("n_events").over(wg).alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(wg).alias("s2"),
        F.collect_list(F.col("n_events").cast("double"))
        .over(wrun)
        .alias("xs"),
    ).select(
        group_col,
        "window_start",
        "n_events",
        "xs",
        mu.alias("mu"),
        sigma.alias("sigma"),
    )
    slack = F.lit(slack_sigmas) * F.col("sigma")
    pos = F.aggregate(
        F.col("xs"),
        F.lit(0.0),
        lambda y, x: F.greatest(
            F.lit(0.0), y + (x - F.col("mu") - slack)
        ),
    )
    neg = F.aggregate(
        F.col("xs"),
        F.lit(0.0),
        lambda y, x: F.greatest(
            F.lit(0.0), y - (x - F.col("mu") + slack)
        ),
    )
    h = F.lit(alarm_sigmas) * F.col("sigma")
    return staged.select(
        group_col,
        "window_start",
        "n_events",
        F.round(pos, 6).alias("cusum_pos"),
        F.round(neg, 6).alias("cusum_neg"),
        ((pos > h) | (neg > h)).alias("alarm"),
    )


def throttle(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    minutes: int = 60,
    limit: int = 5,
) -> DataFrame:
    """Fixed-window rate limiting: keep at most ``limit`` events per
    (user, window), in arrival order (ties by ``id_col``) — the
    ingestion guard that bounds any single producer's share of a
    pipeline before the expensive stages.

    Output is the per-user audit: total events, kept events, and the
    number of saturated windows — collectable at any scale; the kept
    rows themselves are the same window filtered to rk <= limit.

    Scale: one window shuffle keyed on (user, bucket) — high
    cardinality, arrival order is a per-window sort, nothing global.
    """
    win = Window.partitionBy(user_col, "w_start").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    bucketed = events.withColumn(
        "w_start", F.window(ts_col, f"{minutes} minutes")["start"]
    ).withColumn("rk", F.row_number().over(win))
    per_window = bucketed.groupBy(user_col, "w_start").agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum((F.col("rk") <= limit).cast("bigint")).alias("k_w"),
    )
    return (
        per_window.groupBy(user_col)
        .agg(
            F.sum("n_w").alias("n_total"),
            F.sum("k_w").alias("n_kept"),
            F.sum((F.col("n_w") > limit).cast("bigint")).alias(
                "n_saturated_windows"
            ),
        )
        .filter(F.col("n_total") > F.col("n_kept"))
        .orderBy(user_col)
    )


def throttle_counts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    minutes: int = 60,
) -> DataFrame:
    """The state behind :func:`throttle`'s audit view: per-(user,
    window) event counts — a SUM monoid, so the identical expression is
    a streaming aggregate in complete mode (the twin's gate)."""
    return (
        events.groupBy(
            user_col, F.window(ts_col, f"{minutes} minutes")["start"].alias("w_start")
        )
        .agg(F.count(F.lit(1)).alias("n_w"))
    )


def throttle_audit_on_counts(
    counts: DataFrame, *, user_col: str = "user_id", limit: int = 5
) -> DataFrame:
    """Merge-on-read finisher: the saturated-producer audit from the
    count state alone — kept-per-window is least(n, limit), no rank
    needed (ranks matter only for selecting WHICH rows survive)."""
    return (
        counts.groupBy(user_col)
        .agg(
            F.sum("n_w").alias("n_total"),
            F.sum(F.least(F.col("n_w"), F.lit(limit))).alias("n_kept"),
            F.sum((F.col("n_w") > limit).cast("bigint")).alias(
                "n_saturated_windows"
            ),
        )
        .filter(F.col("n_total") > F.col("n_kept"))
        .orderBy(user_col)
    )


def drift_bounds(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group bounds frame (grp, lo, hi, vlo, vhi) both drift
    monitors key off: the time-span midpoint split and PSI's bucket
    grid. In a streaming deployment this is the FROZEN reference — one
    tiny frame computed once from the reference window, broadcast into
    every micro-batch; the batch forms compute it from the input
    itself. Same NULL exclusion as the monitors (a NULL value has no
    bucket/CDF step, a NULL timestamp has no side)."""
    return (
        events.filter(
            F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.min(F.unix_micros(F.col(ts_col))).alias("lo"),
            F.max(F.unix_micros(F.col(ts_col))).alias("hi"),
            F.min(value_col).alias("vlo"),
            F.max(value_col).alias("vhi"),
        )
    )


# integer midpoint: lo + (hi - lo) DIV 2 — true BIGINT division (not
# float-divide-then-floor, which only matches // while the span is
# < 2^53 us), literally replaying the oracle's //
_MID = "lo + (hi - lo) div 2"


def ks_drift_cells(
    events: DataFrame,
    bounds: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """KS state cells: per-(group, distinct value) early/late counts —
    a pure (sum, sum) monoid, so this IS the streaming form (complete-
    mode aggregate; micro-batches merge by summing). State size is the
    distinct-value cardinality per group, not the row count — quantize
    the value upstream if its domain is unbounded. ``bounds`` supplies
    the frozen (grp, lo, hi) frame (:func:`drift_bounds`)."""
    # NULL values carry no CDF information and Spark/DuckDB disagree on
    # their window sort position (NULLS FIRST vs LAST) — exclude them
    # from the empirical CDF on both sides. NULL timestamps get the
    # same treatment: (us <= mid) is NULL in Spark (row silently
    # dropped from both halves) but the oracle's CASE sends it LATE —
    # the only consistent convention is exclusion on both engines.
    src = events.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    early = (F.col("us") <= F.expr(_MID)).cast("int")
    return (
        src.join(F.broadcast(bounds.select("grp", "lo", "hi")), "grp")
        .select("grp", "v", early.alias("early"))
        .groupBy("grp", "v")
        .agg(
            F.sum("early").alias("c1w"),
            F.sum(1 - F.col("early")).alias("c2w"),
        )
    )


def ks_drift_on_cells(
    cells: DataFrame, *, group_col: str = "event_type"
) -> DataFrame:
    """Merge-on-read KS finisher over the (grp, v, c1w, c2w) cells:
    running sums over distinct values reproduce the per-row RANGE-frame
    running counts exactly (ties are already merged into one cell), so
    batch and streaming twins share this finisher AND the oracle."""
    w_run = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("grp")
    stepped = cells.select(
        "grp",
        F.sum("c1w").over(w_run).alias("c1"),
        F.sum("c2w").over(w_run).alias("c2"),
        F.sum("c1w").over(w_all).alias("n1"),
        F.sum("c2w").over(w_all).alias("n2"),
    )
    return (
        stepped.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("n1").alias("n_early"),
            F.max("n2").alias("n_late"),
            # try_divide: an empty side yields NULL (matching DuckDB's
            # NULL on float division by zero) instead of an ANSI raise —
            # the honest answer for a one-sided group is "no statistic"
            F.max(
                F.abs(
                    F.try_divide(F.col("c1"), F.col("n1"))
                    - F.try_divide(F.col("c2"), F.col("n2"))
                )
            ).alias("_ks"),
        )
        .select(
            group_col,
            "n_early",
            "n_late",
            F.round("_ks", 6).alias("ks_stat"),
        )
    )


def ks_drift(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift per group: split each
    group's events at the midpoint of its time span (integer
    microseconds, exact both engines) into EARLY and LATE samples and
    report D = max over x of |F_early(x) - F_late(x)| — the standard
    distribution-shift monitor for a training-data pipeline (has the
    value column's distribution moved between ingestion windows?).

    Exact, not sketched: the sup runs over every distinct value. Plan
    shape: one per-group min/max aggregate broadcast back, one
    (group, value) count aggregate (:func:`ks_drift_cells` — the
    streaming monoid), then ONE window pass over the distinct-value
    cells with RANGE frames — running counts include ties on both
    sides (F(x) counts <= x, the right-continuous empirical CDF), so
    tied values cannot split a step. The CDF fractions are divisions
    of identical integers in both engines, so the round-6 contract is
    safe. At 100 TB the cells aggregate is the only data-sized shuffle
    and it rides the group key; the window then sorts cells, not rows.

    Returns (group, n_early, n_late, ks_stat); groups with an empty
    side report NULL ks_stat rather than a misleading 0.
    """
    bounds = drift_bounds(
        events, group_col=group_col, value_col=value_col, ts_col=ts_col
    )
    cells = ks_drift_cells(
        events,
        bounds,
        group_col=group_col,
        value_col=value_col,
        ts_col=ts_col,
    )
    return ks_drift_on_cells(cells, group_col=group_col)


def psi_drift(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index per group between the time-span
    halves — the industry-standard drift score that complements
    :func:`ks_drift` (KS is sup-norm and tail-insensitive; PSI weights
    every bucket's log-ratio): PSI = Σ_b (pe_b - pl_b) · ln(pe_b/pl_b)
    over ``n_buckets`` fixed-width buckets spanning the group's
    combined [min, max]. Conventional read: <0.1 stable, 0.1-0.25
    drifting, >0.25 shifted.

    Bucket fractions are Laplace-smoothed ((c + 0.5) / (n + 0.5·k)) so
    a bucket empty on ONE side contributes a finite penalty instead of
    ±inf; buckets with zero rows on BOTH sides are skipped (their
    smoothed contribution would be an artifact of the prior, not the
    data) — the deterministic convention the oracle replays. Bucket index is pure
    per-row arithmetic (no quantile pre-pass): one bounds aggregate
    broadcast back, ONE count aggregate on (group, bucket, side), and a
    k-row-per-group fold — nothing after the scan is data-sized, and at
    100 TB the single exchange rides the (group, bucket) key.

    Returns (group, n_early, n_late, psi); one-sided groups report
    NULL psi (no distribution to compare).
    """
    bounds = drift_bounds(
        events, group_col=group_col, value_col=value_col, ts_col=ts_col
    )
    cells = psi_drift_cells(
        events,
        bounds,
        group_col=group_col,
        value_col=value_col,
        ts_col=ts_col,
        n_buckets=n_buckets,
    )
    return psi_drift_on_cells(
        cells, group_col=group_col, n_buckets=n_buckets
    )


def psi_drift_cells(
    events: DataFrame,
    bounds: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    n_buckets: int = 10,
) -> DataFrame:
    """PSI state cells: per-(group, bucket) early/late counts — a pure
    (sum, sum) monoid with at most ``n_buckets`` rows per group, so
    this IS the streaming form (complete-mode aggregate) and the state
    is bounded by construction. ``bounds`` supplies the frozen
    (grp, lo, hi, vlo, vhi) frame (:func:`drift_bounds`)."""
    # same NULL exclusion as ks_drift: a NULL value has no bucket and
    # a NULL timestamp has no side
    src = events.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    # bucket = min(k-1, floor((v - vlo) / width)); degenerate ranges
    # (vhi == vlo) collapse to bucket 0
    width = (F.col("vhi") - F.col("vlo")) / F.lit(float(n_buckets))
    bucket = F.when(F.col("vhi") == F.col("vlo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("v") - F.col("vlo")) / width).cast("int"),
        )
    )
    early = (F.col("us") <= F.expr(_MID)).cast("int")
    return (
        src.join(F.broadcast(bounds), "grp")
        .select("grp", bucket.alias("b"), early.alias("early"))
        .groupBy("grp", "b")
        .agg(
            F.sum("early").alias("ce"),
            F.sum(1 - F.col("early")).alias("cl"),
        )
    )


def psi_drift_on_cells(
    cells: DataFrame,
    *,
    group_col: str = "event_type",
    n_buckets: int = 10,
) -> DataFrame:
    """Merge-on-read PSI finisher over the (grp, b, ce, cl) cells:
    Laplace smoothing over OBSERVED buckets + the log-ratio fold —
    shared by the batch and streaming twins, and by the oracle."""
    w_all = Window.partitionBy("grp")
    smoothed = cells.select(
        "grp",
        F.sum("ce").over(w_all).alias("n1"),
        F.sum("cl").over(w_all).alias("n2"),
        (F.col("ce") + F.lit(0.5)).alias("se"),
        (F.col("cl") + F.lit(0.5)).alias("sl"),
    ).select(
        "grp",
        "n1",
        "n2",
        F.try_divide(
            F.col("se"), F.col("n1") + F.lit(0.5 * n_buckets)
        ).alias("pe"),
        F.try_divide(
            F.col("sl"), F.col("n2") + F.lit(0.5 * n_buckets)
        ).alias("pl"),
    )
    return (
        smoothed.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("n1").alias("n_early"),
            F.max("n2").alias("n_late"),
            F.sum(
                F.when(
                    (F.col("n1") > 0) & (F.col("n2") > 0),
                    (F.col("pe") - F.col("pl"))
                    * F.log(F.col("pe") / F.col("pl")),
                )
            ).alias("_psi"),
        )
        .select(
            group_col,
            "n_early",
            "n_late",
            F.round("_psi", 6).alias("psi"),
        )
    )


def mad_outliers(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier detection via the modified z-score
    (Iglewicz & Hoaglin 1993): M = 0.6745·(x − median)/MAD with
    MAD = median(|x − median|), flagging |M| > ``threshold`` (their
    published 3.5). Complements :func:`rolling_anomaly` (mean/std on
    VOLUME over time) with a distribution-shape detector on VALUES —
    the robust pair survives the heavy tails that wreck a plain
    z-score, the classic first-pass filter on training-metric columns.

    Both medians are EXACT interpolating percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``): order-insensitive per
    group, so the only floats downstream are scalar expressions on
    identical inputs — hash-gateable. NULL values are excluded up
    front (both engines). Zero MAD (>50% of a group at one value)
    yields NULL M via ``try_divide`` → never flagged; same in SQL.

    Scale notes: exact medians need the per-group value multiset —
    two aggregate passes shuffled on the group key, with the tiny
    per-group stat frames broadcast back into codegen projections (no
    second shuffle of the fact side; the rows were already
    type-partitioned for pass 2). Per-group state is the sorted
    buffer, the same envelope as any exact quantile; at 100 TB swap
    the inner percentile for the equidepth-histogram sketch
    (stats_equidepth_histogram) and keep this exact form for
    bounded-cardinality groups.
    """
    base = events.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("v"),
    )
    med = base.groupBy("grp").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    devs = base.join(F.broadcast(med), "grp").withColumn(
        "dev", F.abs(F.col("v") - F.col("med"))
    )
    mad = devs.groupBy("grp").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    m = F.lit(0.6745) * F.try_divide(
        F.col("v") - F.col("med"), F.col("mad")
    )
    return (
        devs.join(F.broadcast(mad), "grp")
        .filter(F.abs(m) > F.lit(threshold))
        .select(
            F.col("grp").alias(group_col),
            F.col("_id").alias(id_col),
            F.col("v").alias(value_col),
            F.round("med", 6).alias("median"),
            F.round("mad", 6).alias("mad"),
            F.round(m, 4).alias("m_score"),
        )
    )


def autocorr_series(
    events: DataFrame,
    *,
    minutes: int = 60,
    max_lag: int = 6,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Lag-k autocorrelation of per-group event volume, k = 1..
    ``max_lag`` — the ACF diagnostic behind seasonality detection and
    forecast-model selection (a daily-periodic signal shows a peak at
    its period's lag; white noise shows none)."""
    cells = bucket_count_cells(
        events, minutes=minutes, group_col=group_col, ts_col=ts_col
    )
    return autocorr_on_cells(
        cells, minutes=minutes, max_lag=max_lag, group_col=group_col
    )


def autocorr_on_cells(
    cells: DataFrame,
    *,
    minutes: int = 60,
    max_lag: int = 6,
    group_col: str = "event_type",
) -> DataFrame:
    """Merge-on-read ACF finisher over (group, window_start, n_events)
    cells — shared by the batch and streaming twins and replayed by
    the oracle.

    Lags are TIME lags (bucket-index deltas), not row positions: a
    pair exists for (t, t+k·bucket) only where both buckets were
    observed, so gaps contribute no pairs rather than misaligning the
    series. Pearson r per (group, lag) is assembled from exact BIGINT
    power sums of the integer counts (n, Σx, Σy, Σxy, Σx², Σy²), so
    both engines feed the identical integers into the same scalar
    float expression — bit-identical before the 6-dp round.
    Degenerate lags (constant series → zero variance, or <2 pairs)
    yield NULL acf via ``try_divide``.

    Scale notes: the lagged side fans each cell out ``max_lag`` ways
    BEFORE the equi-join on (group, bucket) — one shuffle of
    max_lag·|buckets| rows, then a map-side-combined aggregate down to
    |groups|·max_lag rows. Power-sum envelope: Σxy ≤ |buckets|·max²,
    and n·Σxy must stay inside BIGINT — at 10⁹-count buckets switch
    the accumulators to DECIMAL(38) before this overflows; the
    integer-exactness contract is what the gate replays.
    """
    bucket_us = minutes * 60 * 1_000_000
    base = cells.select(
        F.col(group_col).alias("grp"),
        F.expr(f"unix_micros(window_start) div {bucket_us}").alias("b"),
        F.col("n_events").cast("long").alias("x"),
    )
    lagged = base.select(
        "grp",
        F.col("x").alias("y"),
        F.explode(
            F.sequence(F.lit(1), F.lit(max_lag))
        ).alias("lag"),
        "b",
    ).select("grp", "lag", (F.col("b") - F.col("lag")).alias("b"), "y")
    pairs = base.join(lagged, ["grp", "b"])
    sums = pairs.groupBy("grp", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return sums.select(
        F.col("grp").alias(group_col),
        "lag",
        F.col("n").alias("n_pairs"),
        F.round(
            F.try_divide(num, F.sqrt(vx) * F.sqrt(vy)), 6
        ).alias("acf"),
    )


def holt_series(
    events: DataFrame,
    *,
    minutes: int = 60,
    alpha: float = 0.5,
    beta: float = 0.25,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing of per-group event
    volume: level l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1}), trend
    b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}, with the one-step-ahead
    forecast l_{t−1} + b_{t−1} and its residual — the trend-aware
    upgrade of :func:`ewma_series` (a ramping series shows a constant
    EWMA lag but a near-zero Holt residual), and the standard
    forecasting baseline whose residuals feed anomaly thresholds."""
    cells = bucket_count_cells(
        events, minutes=minutes, group_col=group_col, ts_col=ts_col
    )
    return holt_on_cells(
        cells, alpha=alpha, beta=beta, group_col=group_col
    )


def holt_on_cells(
    cells: DataFrame,
    *,
    alpha: float = 0.5,
    beta: float = 0.25,
    group_col: str = "event_type",
) -> DataFrame:
    """Merge-on-read Holt finisher over (group, window_start, n_events)
    cells — shared by the batch and streaming twins and replayed by
    the oracle.

    The coupled (level, trend) recursion is evaluated as an explicit
    LEFT FOLD with a STRUCT accumulator: Spark ``aggregate`` folds the
    ordered cumulative bucket array seeded {l: x₁, b: 0}, and DuckDB
    replays it with ``list_reduce`` over a struct-typed list (its
    accumulator must share the element type, so the oracle lifts each
    x into {l: x, b: 0} and prepends the seed — same ops, same
    order). l_t appears in both update equations and is recomputed
    textually in each, identically in both engines, so the fold is
    bit-identical before the 6-dp round. Defaults α=1/2, β=1/4 are
    binary-exact. The forecast at t folds the one-shorter prefix
    (NULL at t=1, where no prior state exists).

    Same scale envelope as :func:`ewma_series`/CUSUM: shuffle key is
    the group; per-row state is the cumulative array, fine for
    buckets-of-history series lengths (the fold is O(t) per row →
    O(T²) per group — for month-long hourly series T≈720, trivial;
    for unbounded history window the series first).
    """
    wrun = (
        Window.partitionBy(group_col)
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    a, b1 = float(alpha), float(beta)

    def step(acc, x):
        l_new = F.lit(a) * x + F.lit(1.0 - a) * (acc.l + acc.b)
        return F.struct(
            l_new.alias("l"),
            (
                F.lit(b1)
                * (
                    F.lit(a) * x
                    + F.lit(1.0 - a) * (acc.l + acc.b)
                    - acc.l
                )
                + F.lit(1.0 - b1) * acc.b
            ).alias("b"),
        )

    def fold(xs_slice):
        seed = F.struct(
            F.element_at(F.col("xs"), 1).alias("l"),
            F.lit(0.0).alias("b"),
        )
        return F.aggregate(xs_slice, seed, step)

    n = F.size("xs")
    cur = fold(F.slice(F.col("xs"), F.lit(2), F.greatest(n - 1, F.lit(0))))
    prev = fold(F.slice(F.col("xs"), F.lit(2), F.greatest(n - 2, F.lit(0))))
    forecast = F.when(n >= 2, prev["l"] + prev["b"])
    return (
        cells.withColumn(
            "xs",
            F.collect_list(F.col("n_events").cast("double")).over(wrun),
        )
        .select(
            group_col,
            "window_start",
            "n_events",
            F.round(cur["l"], 6).alias("level"),
            F.round(cur["b"], 6).alias("trend"),
            F.round(forecast, 6).alias("forecast"),
            F.round(
                F.col("n_events").cast("double") - forecast, 6
            ).alias("residual"),
        )
    )


def seasonal_decompose(
    events: DataFrame,
    *,
    minutes: int = 60,
    period: int = 24,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Additive seasonal decomposition of per-group event volume:
    x_t = trend + seasonal(phase) + residual, the classical-
    decomposition workhorse behind "is Monday 9am always like this or
    is something wrong" — trend is a centered (period+1)-row moving
    average, seasonal the per-phase mean of the detrended series,
    residual the rest. ``period`` = 24 on hourly buckets = daily
    seasonality.

    Determinism: the trend MA sums INTEGER counts over a rows-window
    (exact, associative), so trend is identical across engines; the
    detrended value is then quantized to an e6-scaled BIGINT before
    the per-phase mean (the ``_sum6`` idiom) — phase sums are exact
    integers and seasonal/residual derive from them with the same
    scalar expressions on both engines. Only interior rows (full
    centered window) are emitted — the classical convention, and it
    keeps every emitted trend exact.

    Scale notes: one bucket-count aggregate (map-side partial), one
    rows-window per group over the CELL frame (|buckets| rows, not
    events), one tiny (group, phase) aggregate broadcast back. Row-
    based MA assumes a dense series (the streaming gapfill op exists
    for sparse ones); phase count is bounded by ``period``.
    """
    cells = bucket_count_cells(
        events, minutes=minutes, group_col=group_col, ts_col=ts_col
    )
    return seasonal_on_cells(
        cells, minutes=minutes, period=period, group_col=group_col
    )


def seasonal_on_cells(
    cells: DataFrame,
    *,
    minutes: int = 60,
    period: int = 24,
    group_col: str = "event_type",
) -> DataFrame:
    """Decomposition finisher over (group, window_start, n_events)
    cells — merge-on-read (duplicate cells from micro-batch deliveries
    sum first), so the streaming twin shares it AND the batch oracle
    (the autocorr/holt/cusum bucket-count monoid contract)."""
    bucket_us = minutes * 60 * 1_000_000
    cells = cells.groupBy(group_col, "window_start").agg(
        F.sum("n_events").alias("n_events")
    )
    half = period // 2
    w = (
        Window.partitionBy(group_col)
        .orderBy("window_start")
        .rowsBetween(-half, half)
    )
    base = cells.select(
        group_col,
        "window_start",
        "n_events",
        F.expr(f"unix_micros(window_start) div {bucket_us} % {period}")
        .alias("phase"),
        F.sum("n_events").over(w).alias("_ws"),
        F.count(F.lit(1)).over(w).alias("_wn"),
    ).filter(F.col("_wn") == 2 * half + 1)
    trend = F.col("_ws").cast("double") / F.col("_wn")
    detr = base.select(
        group_col,
        "window_start",
        "n_events",
        "phase",
        trend.alias("trend"),
        F.round((F.col("n_events") - trend) * 1_000_000)
        .cast("long")
        .alias("_d_e6"),
    )
    # renamed join keys: the phase-mean side re-reads the same cell
    # lineage as detr, and the streaming twin's memory-sink view trips
    # "Conflicting attributes" on a same-name self-join otherwise
    phase_means = detr.groupBy(
        F.col(group_col).alias("_pgrp"), F.col("phase").alias("_pphase")
    ).agg(
        (
            F.sum("_d_e6").cast("double")
            / F.count(F.lit(1))
            / F.lit(1_000_000.0)
        ).alias("seasonal")
    )
    return detr.join(
        F.broadcast(phase_means),
        (detr[group_col] == phase_means["_pgrp"])
        & (detr["phase"] == phase_means["_pphase"]),
    ).select(
        group_col,
        "window_start",
        "n_events",
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round(
            F.col("_d_e6") / F.lit(1_000_000.0) - F.col("seasonal"), 6
        ).alias("residual"),
    )


def ttest_cells(
    events: DataFrame,
    bounds: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    max_abs_value: float = 1e9,
) -> DataFrame:
    """Welch t-test state cells: per-(group, side) exact power sums
    (n, s1, s2) of the e4-quantized value — a pure sum monoid with at
    most TWO rows per group, so this is simultaneously the streaming
    state form (complete-mode aggregate, micro-batches merge by
    summing) and the smallest possible shuffle for the batch form.
    ``bounds`` supplies the frozen (grp, lo, hi) frame
    (:func:`drift_bounds`); NULL values/timestamps are excluded on
    both engines (same convention as the KS/PSI cells).

    Exactness: v = round(value*1e4) is lossless on the fixture's
    <= 4-decimal values and the sums are exact decimal(38,0) integers
    (DuckDB mirrors with HUGEINT). Per-row v^2 fits while
    |value| <= ~1e15; the guard RAISES beyond ``max_abs_value``
    (default 1e9 — sums then stay exact past 1e12 rows) instead of
    letting non-ANSI decimal multiplication NULL rows silently (the
    :func:`~project_cortex_spark.operators.sketches.moment_partials`
    discipline).
    """
    src = events.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("val"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    ok = F.coalesce(
        F.abs(F.col("val").cast("double")) <= F.lit(float(max_abs_value)),
        F.lit(True),
    )
    guard = F.assert_true(
        ok,
        F.concat(
            F.lit(
                "ttest_cells: |value| exceeds the exact decimal(38,0)"
                " range (max_abs_value="
            ),
            F.lit(str(max_abs_value)),
            F.lit("): "),
            F.col("val").cast("string"),
        ),
    )
    v = F.round(F.col("val") * 10000).cast("decimal(38,0)")
    v = F.when(guard.isNull(), v)
    early = (F.col("us") <= F.expr(_MID)).cast("int")
    return (
        src.join(F.broadcast(bounds.select("grp", "lo", "hi")), "grp")
        .select("grp", early.alias("early"), v.alias("v"))
        .groupBy("grp", "early")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s1"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
        )
    )


def ttest_on_cells(
    cells: DataFrame, *, group_col: str = "event_type"
) -> DataFrame:
    """Finalize (grp, early, n, s1, s2) cells into the Welch unequal-
    variance t statistic + Welch–Satterthwaite df per group. Merge-on-
    read: duplicate cells (one per micro-batch delivery) sum first, so
    batch and streaming twins share this finisher AND the oracle.

    Every float derivation runs the SAME expression order on both
    engines over identical exact integers; ``try_divide`` yields NULL
    (DuckDB's float-division-by-zero convention) for degenerate
    groups — a one-sided group, n <= 1 on a side, or zero pooled
    variance reports "no statistic", never a misleading number.
    """
    merged = cells.groupBy("grp", "early").agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
    )

    def _side(col: str, side: int):
        return F.sum(F.when(F.col("early") == side, F.col(col)))

    piv = merged.groupBy("grp").agg(
        F.coalesce(_side("n", 1), F.lit(0)).alias("n1"),
        F.coalesce(_side("n", 0), F.lit(0)).alias("n2"),
        _side("s1", 1).cast("double").alias("a1"),
        _side("s2", 1).cast("double").alias("b1"),
        _side("s1", 0).cast("double").alias("a2"),
        _side("s2", 0).cast("double").alias("b2"),
    )
    stats = piv.select(
        "grp",
        "n1",
        "n2",
        F.try_divide(F.col("a1"), F.col("n1")).alias("m1"),
        F.try_divide(F.col("a2"), F.col("n2")).alias("m2"),
        F.try_divide(
            F.try_divide(
                F.col("b1") - F.col("a1") * F.col("a1") / F.col("n1"),
                F.col("n1") - 1,
            ),
            F.lit(1e8),
        ).alias("v1"),
        F.try_divide(
            F.try_divide(
                F.col("b2") - F.col("a2") * F.col("a2") / F.col("n2"),
                F.col("n2") - 1,
            ),
            F.lit(1e8),
        ).alias("v2"),
    ).select(
        "grp",
        "n1",
        "n2",
        "m1",
        "m2",
        "v1",
        "v2",
        (F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")).alias("se2"),
    )
    return stats.select(
        F.col("grp").alias(group_col),
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        F.round(F.col("m1") / 10000.0, 6).alias("mean_early"),
        F.round(F.col("m2") / 10000.0, 6).alias("mean_late"),
        F.round(
            F.try_divide(
                F.col("m1") / 10000.0 - F.col("m2") / 10000.0,
                F.sqrt("se2"),
            ),
            6,
        ).alias("t_stat"),
        F.round(
            F.try_divide(
                F.col("se2") * F.col("se2"),
                F.col("v1")
                * F.col("v1")
                / F.col("n1")
                / F.col("n1")
                / (F.col("n1") - 1)
                + F.col("v2")
                * F.col("v2")
                / F.col("n2")
                / F.col("n2")
                / (F.col("n2") - 1),
            ),
            6,
        ).alias("welch_df"),
    )


def ttest_drift(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Welch two-sample t-test per group between the EARLY and LATE
    halves of each group's time span (same integer-microsecond
    midpoint split as :func:`ks_drift`): has the value column's MEAN
    moved, and by how many standard errors? The parametric complement
    of KS (any distributional change) and PSI (binned mass shift) —
    the t statistic localizes level shifts and scales to arbitrarily
    many groups as pure aggregation.

    Plan shape: one min/max bounds aggregate broadcast back, one
    (group, side) power-sum aggregate (:func:`ttest_cells` — exact
    decimal integers, at most 2 cells per group), then scalar-only
    derivations. At 100 TB the cells aggregate is the only data-sized
    shuffle and it is map-side combinable on the group key.

    Returns (group, n_early, n_late, mean_early, mean_late, t_stat,
    welch_df); degenerate groups (one-sided, n <= 1 per side, zero
    variance) report NULL statistics.
    """
    bounds = drift_bounds(
        events, group_col=group_col, value_col=value_col, ts_col=ts_col
    )
    cells = ttest_cells(
        events,
        bounds,
        group_col=group_col,
        value_col=value_col,
        ts_col=ts_col,
    )
    return ttest_on_cells(cells, group_col=group_col)


def seasonal_outliers(
    events: DataFrame,
    *,
    minutes: int = 60,
    period: int = 24,
    threshold: float = 3.5,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Seasonality-adjusted volume anomalies: flag buckets whose
    DESEASONALIZED residual is a robust outlier — "is Monday 9am
    unusually quiet GIVEN that 9am is always busy", the question both
    :func:`rolling_anomaly` (raw volume) and :func:`mad_outliers`
    (raw values) answer wrongly on cyclic series, where the daily
    swing itself dwarfs real anomalies.

    Pure composition: :func:`seasonal_decompose`'s residual column
    (already round-6 quantized, hash-gated on its own) feeds the
    Iglewicz–Hoaglin modified z-score rule of :func:`mad_outliers`
    (exact interpolating medians, try_divide zero-MAD contract). The
    oracle nests the decomposition SQL verbatim, so the composition is
    gated end to end.

    Scale notes: everything downstream of the decomposition operates
    on the CELL frame (|buckets| rows); the two median passes shuffle
    cells on the group key and broadcast tiny stat frames back —
    nothing event-sized beyond the decomposition's first aggregate.
    """
    dec = seasonal_decompose(
        events,
        minutes=minutes,
        period=period,
        group_col=group_col,
        ts_col=ts_col,
    )
    base = dec.select(
        F.col(group_col).alias("grp"),
        "window_start",
        "n_events",
        F.col("residual").alias("v"),
    )
    med = base.groupBy("grp").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    devs = base.join(F.broadcast(med), "grp").withColumn(
        "dev", F.abs(F.col("v") - F.col("med"))
    )
    mad = devs.groupBy("grp").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    m = F.lit(0.6745) * F.try_divide(
        F.col("v") - F.col("med"), F.col("mad")
    )
    return (
        devs.join(F.broadcast(mad), "grp")
        .filter(F.abs(m) > F.lit(threshold))
        .select(
            F.col("grp").alias(group_col),
            "window_start",
            "n_events",
            F.col("v").alias("residual"),
            F.round("med", 6).alias("median"),
            F.round("mad", 6).alias("mad"),
            F.round(m, 4).alias("m_score"),
        )
    )
