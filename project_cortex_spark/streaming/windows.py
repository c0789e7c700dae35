"""Event-time windowed operators — streaming twins of operators/events.py.

Each function is a pure transform on a (streaming or batch) DataFrame;
the streaming variant only adds the watermark. Because the aggregation
expressions are THE SAME objects as the batch twin's, a finite stream
run in complete mode must produce byte-identical results to the batch
operator — which is exactly what the oracle gate checks.

Scale notes: a watermark bounds state: Spark drops window state older
than (max event time - watermark), so per-executor state is
O(active windows x keys), not O(stream length). Sessionization state is
bounded the same way via session_window merge + watermark eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_cortex_spark.operators import events as ev


def windowed_agg_stream(
    events: DataFrame, *, minutes: int = 60, watermark_minutes: int = 120
) -> DataFrame:
    """Tumbling event-time aggregate with late-data tolerance of
    ``watermark_minutes`` (the reference has no late-data story at all —
    SURVEY §2.10 calls this out as new design, not parity)."""
    return ev.windowed_agg(
        events.withWatermark("ts", f"{watermark_minutes} minutes"), minutes=minutes
    )


def sessionize_stream(
    events: DataFrame, *, gap_minutes: int = 30, watermark_minutes: int = 120
) -> DataFrame:
    """Gap sessions via the built-in ``session_window`` (merging windows
    + watermark state eviction). Emits the same (user_id, session_start,
    session_end, n_events, sum_value_e4) shape as the batch sessionizer;
    session identity matches the batch twin because both define a break
    as gap > ``gap_minutes``. The sum is an exact scaled integer
    (see operators/events.py sessionize) so batch and stream results are
    bit-identical, not merely close.
    """
    w = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(F.col("user_id"), w.alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias(
                "sum_value_e4"
            ),
        )
        .drop("w")
    )


def volume_buckets_stream(
    events: DataFrame, *, bucket_minutes: int = 60, watermark_minutes: int = 120
) -> DataFrame:
    """Per-(event_type, epoch bucket) volume counts as a watermarked
    streaming aggregate — the state-maintained half of the streaming
    anomaly detector. The rolling z-score itself is merge-on-read (the
    same split as rollup.py: the stream maintains monoid partials, the
    reader derives the judgment), because a rows-window over an
    evolving aggregate is not a streaming-expressible operator — each
    new bucket would retro-enter 24 later buckets' baselines.

    Identical bucketing expression to operators.events.rolling_anomaly,
    so a finite complete-mode run feeds the batch z-score verbatim.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.col("event_type"),
            F.expr(f"unix_micros(ts) div {bucket_us}").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def anomaly_on_buckets(
    buckets: DataFrame,
    *,
    bucket_minutes: int = 60,
    lookback: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Read-side rolling z-score over materialized volume buckets — the
    merge-on-read half of the streaming anomaly detector. Delegates to
    the batch operator's factored expression set, so stream-fed and
    batch-fed results are definitionally identical."""
    return ev.rolling_anomaly_on_buckets(
        buckets,
        bucket_minutes=bucket_minutes,
        lookback=lookback,
        z_threshold=z_threshold,
    )


def user_totals_stream(
    events: DataFrame, *, watermark_minutes: int = 120
) -> DataFrame:
    """Watermarked streaming aggregate of per-(event_type, user) totals
    — the state-maintained half of the streaming top-k; the rank is
    merge-on-read via the batch twin's factored
    ``events.rank_top_users`` (a row_number over an evolving aggregate
    is not streaming-expressible: a new total can re-rank the whole
    partition)."""
    return ev.user_totals(
        events.withWatermark("ts", f"{watermark_minutes} minutes")
    )


def ohlc_stream(
    events: DataFrame, *, bucket_minutes: int = 60, watermark_minutes: int = 120
) -> DataFrame:
    """Streaming OHLC bars — unlike the rolling anomaly, this one IS a
    pure streaming aggregate: open/close are ``min_by``/``max_by`` over
    the (ts, event_id) total order, which are algebraic (a partial's
    best candidate merges associatively), so no merge-on-read split is
    needed. Emits the identical shape/rounding as the batch
    ``events.ohlc_resample`` (which uses row_number — rn=1 under
    (ts, event_id) ASC is exactly arg-min of that key), so a finite
    complete-mode run is gated by the same oracle.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000
    key = F.struct(F.unix_micros("ts").alias("u"), F.col("event_id").alias("e"))
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.col("event_type"),
            F.expr(f"unix_micros(ts) div {bucket_us}").alias("_b"),
        )
        .agg(
            F.round(F.min_by("value", key), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", key), 6).alias("close"),
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


def value_histogram_stream(
    events: DataFrame, *, width: float = 25.0, watermark_minutes: int = 120
) -> DataFrame:
    """Streaming twin of ``events.value_histogram`` — every emitted stat
    (count, min, max, avg) is algebraic, so like the OHLC bars this is a
    pure streaming aggregate with no merge-on-read split: state is one
    row per occupied (event_type, bin). Reuses the batch operator's
    column expressions verbatim, so a finite complete-mode run is gated
    by the same oracle."""
    return ev.value_histogram(
        events.withWatermark("ts", f"{watermark_minutes} minutes"), width=width
    )


def activity_heatmap_stream(
    events: DataFrame, *, watermark_minutes: int = 120
) -> DataFrame:
    """Streaming twin of ``events.activity_heatmap`` — like the value
    histogram, every emitted stat is algebraic and the bucketing is a
    pure per-row integer function, so this is a plain streaming
    aggregate with at most 168 state rows. Same oracle as batch."""
    return ev.activity_heatmap(
        events.withWatermark("ts", f"{watermark_minutes} minutes")
    )


def sliding_window_stream(
    events: DataFrame,
    *,
    minutes: int = 60,
    slide_minutes: int = 15,
    watermark_minutes: int = 120,
) -> DataFrame:
    """Streaming twin of ``events.sliding_window_agg`` — the built-in
    sliding window is watermark-aware state (one row per open window ×
    type, bounded by size/slide × horizon); reuses the batch operator's
    expressions verbatim, same oracle."""
    return ev.sliding_window_agg(
        events.withWatermark("ts", f"{watermark_minutes} minutes"),
        minutes=minutes,
        slide_minutes=slide_minutes,
    )
