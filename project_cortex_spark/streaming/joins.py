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


DEFAULT_MAX_SNAPSHOT_ROWS = 1_000_000


def asof_join_stream(
    stream: DataFrame,
    snapshots: DataFrame,
    *,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_payload: list[str],
    max_snapshot_rows: int = DEFAULT_MAX_SNAPSHOT_ROWS,
) -> DataFrame:
    """Stream-static as-of join: each streaming row matched to the latest
    static snapshot row at-or-before its event time, per key — LEFT
    semantics (no prior snapshot ⇒ NULL payload), identical to the batch
    :func:`operators.asof.as_of_join`.

    Design: the static side is a snapshot/config/rate table — small by
    contract — so it is collected once, sorted per key, and shipped to
    executors inside a ``mapInPandas`` closure that binary-searches each
    Arrow batch. That makes the operator STATELESS in streaming terms:
    no watermark, no join state, append mode, and every micro-batch row
    resolves immediately. (The alternative — a stream-static inequality
    join plus a latest-per-event aggregate — would hold unbounded
    aggregation state for no benefit, since each output row derives from
    exactly one input row.) The driver-sized contract on the collected
    side is ENFORCED: more than ``max_snapshot_rows`` snapshot rows
    raises instead of silently risking a driver OOM; for a LARGE right
    side use the batch union+window as-of inside ``foreachBatch``.

    Timezone posture: all event-time comparison happens on integer epoch
    micros. The snapshot side is collected as ``unix_micros(right_time)``
    (computed JVM-side, timezone-free); the stream side's Arrow batches
    deliver session-timezone-naive timestamps (UTC — the registry forces
    ``spark.sql.session.timeZone=UTC``) which are cast to int64 micros.
    No wall-clock ``datetime`` ever enters the bisect, so a non-UTC
    driver OS timezone cannot shift the as-of matches.
    """
    import bisect
    from collections import defaultdict

    import pandas as pd

    snap_rows = (
        snapshots.select(
            F.col(on).alias("_k"),
            F.unix_micros(right_time).alias("_t_us"),
            *right_payload,
        )
        .limit(max_snapshot_rows + 1)
        .collect()
    )
    if len(snap_rows) > max_snapshot_rows:
        raise ValueError(
            f"asof_join_stream: snapshot side exceeds max_snapshot_rows="
            f"{max_snapshot_rows}; the static side must stay driver-sized. "
            "For a large right side run the batch as_of_join inside "
            "foreachBatch instead (operators/asof.py), or raise the bound "
            "explicitly if the driver has the memory."
        )
    by_key: dict = defaultdict(list)
    for r in snap_rows:
        by_key[r[0]].append((r[1], tuple(r[i + 2] for i in range(len(right_payload)))))
    table = {}
    for k, lst in by_key.items():
        lst.sort(key=lambda x: x[0])
        table[k] = ([t for t, _ in lst], [p for _, p in lst])

    from pyspark.sql.types import StructField, StructType

    in_cols = stream.columns
    out_schema = StructType(
        stream.schema.fields
        + [
            StructField(f"right_{c}", snapshots.schema[c].dataType, True)
            for c in right_payload
        ]
    )

    def resolve(batches):
        for pdf in batches:
            n = len(pdf)
            extra = {f"right_{c}": [None] * n for c in right_payload}
            keys = pdf[on].tolist()
            ts = pdf[left_time]
            if isinstance(ts.dtype, pd.DatetimeTZDtype):
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            # naive values are session-tz (UTC by registry contract), so
            # the int64 cast yields true epoch micros
            times = ts.astype("datetime64[us]").astype("int64").tolist()
            for i in range(n):
                entry = table.get(keys[i])
                if entry is None:
                    continue
                ts_list, payloads = entry
                j = bisect.bisect_right(ts_list, times[i]) - 1
                if j >= 0:
                    p = payloads[j]
                    for c, v in zip(right_payload, p):
                        extra[f"right_{c}"][i] = v
            for c in extra:
                pdf[c] = extra[c]
            yield pdf[in_cols + [f"right_{c}" for c in right_payload]]

    return stream.mapInPandas(resolve, out_schema)


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
