"""Stream-stream interval join — the watermark-bounded join shape.

The reference has no stream processing at all (SURVEY §2.10: its
"streaming" is a filesystem watch loop), so like the other streaming
twins this is new design for the 100 TB goal, not parity: correlating
two live event streams (requests with their retries, actions with their
follow-ups) within a bounded event-time window.

Semantics: an ordered pair (a, b) joins when both share the join key and
b happens within ``minutes`` after a — strictly after in (ts, event_id)
order, so a pair is emitted exactly once and never with itself.

Scale notes: Spark keeps BOTH sides' state until the watermark plus the
interval passes, so per-executor state is O(events per key within the
window + watermark horizon), not O(stream length) — that is exactly what
the time-range join condition plus ``withWatermark`` on each side buys.
Inner-join results emit as soon as a match arrives (the watermark only
governs state eviction), so a finite AvailableNow run produces the
complete pair set and must hash-match the batch self-join oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "user_id",
    minutes: int = 60,
    watermark_minutes: int = 120,
) -> DataFrame:
    """Pairs (a = left row, b = right row) with ``a.ts <= b.ts <=
    a.ts + minutes`` and (ts, event_id)-strict ordering, per ``on`` key.

    Returns (user_id, a_event_id, b_event_id, gap_us). Works identically
    on batch frames (the oracle twin) — the watermark is added only when
    the input is streaming.
    """
    a = left
    b = right
    if a.isStreaming:
        a = a.withWatermark("ts", f"{watermark_minutes} minutes")
    if b.isStreaming:
        b = b.withWatermark("ts", f"{watermark_minutes} minutes")
    a = a.select(
        F.col(on).alias("_k"),
        F.col("event_id").alias("a_event_id"),
        F.col("ts").alias("a_ts"),
    )
    b = b.select(
        F.col(on).alias("_k2"),
        F.col("event_id").alias("b_event_id"),
        F.col("ts").alias("b_ts"),
    )
    cond = (
        (F.col("_k") == F.col("_k2"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {minutes} MINUTES"))
        & (
            (F.col("a_ts") < F.col("b_ts"))
            | (F.col("a_event_id") < F.col("b_event_id"))
        )
    )
    return a.join(b, cond, "inner").select(
        F.col("_k").alias("user_id"),
        "a_event_id",
        "b_event_id",
        (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"),
    )
