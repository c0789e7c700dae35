"""Custom stateful operator: gap sessionization via applyInPandasWithState.

``session_window`` covers plain gap sessions; this is the escape hatch
for session logic the built-in can't express (per-session aggregates
beyond min/max/sum, custom break predicates, capped session length...).
It is the Spark idiom SURVEY §2.12 maps the reference's extension
interfaces onto: an Arrow-batched per-key stateful function.

State model: per user_id we keep the open session's
(start_us, last_us, n_events, sum_value). An incoming batch's rows are
sorted by event time, folded into the open session, and a session is
EMITTED only when it is closed — either by a later event beyond the gap,
or by event-time timeout once the watermark passes last_us + gap (so the
output is final, append-mode semantics; state is bounded by the
watermark exactly like the built-in).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value_e4", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_e4", LongType()),
    ]
)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, sv = state.get
                closed.append((user_id, s0, s1, n, sv))
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            rows = pd.concat(list(pdfs))
            ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
            order = ts_us.argsort(kind="stable")
            for us, val in zip(
                ts_us.iloc[order], rows["value"].iloc[order].astype(float)
            ):
                us = int(us)
                v_e4 = int(round(val * 10000))
                if cur is None:
                    cur = [us, us, 0, 0]
                elif us < cur[0] - gap_us:
                    # cross-batch late event older than the open session
                    # by more than the gap: it is its own (already
                    # closed) session — the open session's start proves
                    # a later event exists within one gap of it.
                    closed.append((user_id, us, us, 1, v_e4))
                    continue
                elif us - cur[1] > gap_us:
                    closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = [us, us, 0, 0]
                # late-but-in-gap events may lower the session start
                cur[0] = min(cur[0], us)
                cur[1] = max(cur[1], us)
                cur[2] += 1
                cur[3] += v_e4
            state.update(tuple(cur))
            # close the open session once the watermark passes its gap
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "start_us", "last_us", "n_events", "sum_value_e4"],
            )
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"],
                    "session_start": pd.to_datetime(out["start_us"], unit="us"),
                    "session_end": pd.to_datetime(out["last_us"], unit="us"),
                    "n_events": out["n_events"],
                    "sum_value_e4": out["sum_value_e4"],
                }
            )

    return fn


def sessionize_with_state(
    events: DataFrame, *, gap_minutes: int = 30, watermark_minutes: int = 120
) -> DataFrame:
    """Append-mode gap sessionization with explicit per-key state."""
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Rolling volume anomaly with explicit per-type state (append mode)
# ---------------------------------------------------------------------------

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket_start_us", LongType()),
        StructField("n_events", LongType()),
        StructField("mean_prev", DoubleType()),
        StructField("z_score", DoubleType()),
    ]
)

ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("open_buckets", ArrayType(LongType())),
        StructField("open_counts", ArrayType(LongType())),
        StructField("trail_counts", ArrayType(LongType())),
    ]
)


def _anomaly_fn(bucket_minutes: int, lookback: int, z_threshold: float):
    bucket_us = bucket_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        import numpy as np

        (event_type,) = key
        if state.exists:
            open_b, open_c, trail = (
                list(state.get[0]),
                list(state.get[1]),
                list(state.get[2]),
            )
        else:
            open_b, open_c, trail = [], [], []

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            if len(rows):
                buckets = (rows["ts"].astype("int64") // 1000) // bucket_us
                for b, n in buckets.value_counts().items():
                    b = int(b)
                    if b in open_b:
                        open_c[open_b.index(b)] += int(n)
                    else:
                        open_b.append(b)
                        open_c.append(int(n))

        # close every bucket whose end has passed the watermark, in
        # bucket order — identical trailing-window semantics to the
        # batch rolling_anomaly (previous `lookback` CLOSED buckets,
        # current excluded; n_prev >= 2 and std > 0 required)
        wm_us = state.getCurrentWatermarkMs() * 1000
        flagged: list[tuple] = []
        for b in sorted(open_b):
            if (b + 1) * bucket_us > wm_us:
                break
            n = open_c[open_b.index(b)]
            if len(trail) >= 2:
                arr = np.array(trail[-lookback:], dtype=np.float64)
                std = arr.std(ddof=1)
                if std > 0:
                    z = (n - arr.mean()) / std
                    if abs(z) > z_threshold:
                        flagged.append(
                            (
                                event_type,
                                b * bucket_us,
                                n,
                                round(float(arr.mean()), 4),
                                round(float(z), 4),
                            )
                        )
            i = open_b.index(b)
            del open_b[i], open_c[i]
            trail.append(n)
            if len(trail) > lookback:
                del trail[: len(trail) - lookback]

        if open_b:
            state.update((open_b, open_c, trail))
            # wake up when the watermark passes the earliest open bucket
            state.setTimeoutTimestamp((min(open_b) + 1) * bucket_us // 1000)
        elif state.exists:
            if trail:
                state.update(([], [], trail))
            else:
                state.remove()

        if flagged:
            yield pd.DataFrame(
                flagged,
                columns=[
                    "event_type",
                    "bucket_start_us",
                    "n_events",
                    "mean_prev",
                    "z_score",
                ],
            )

    return fn


def anomaly_with_state(
    events: DataFrame,
    *,
    bucket_minutes: int = 60,
    lookback: int = 24,
    z_threshold: float = 3.0,
    watermark_minutes: int = 120,
) -> DataFrame:
    """Append-mode streaming twin of operators.events.rolling_anomaly
    with explicit per-event-type state: open (not-yet-closed) bucket
    counts accumulate across micro-batches; a bucket is finalized and
    judged once the watermark passes its end, entering the trailing
    baseline afterwards. State per key is O(open buckets + lookback) —
    bounded by the watermark and the window, never by stream length.
    Emitted rows are final (append semantics): a bucket is judged
    exactly once, against exactly the baseline the batch twin uses.
    """
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _anomaly_fn(bucket_minutes, lookback, z_threshold),
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Leading-edge debounce with explicit per-(user, type) state (append mode)
# ---------------------------------------------------------------------------

DEBOUNCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts_us", LongType()),
        StructField("burst_len", LongType()),
    ]
)

DEBOUNCE_STATE_SCHEMA = StructType(
    [
        StructField("leader_id", LongType()),
        StructField("leader_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _debounce_fn(quiet_seconds: int):
    quiet_us = quiet_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user_id, event_type = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                lid, lus, _last, n = state.get
                closed.append((lid, user_id, event_type, lus, n))
                state.remove()
        else:
            cur = list(state.get) if state.exists else None
            rows = pd.concat(list(pdfs))
            ts_us = rows["ts"].astype("int64") // 1000
            # (ts, event_id) — the batch operator and its oracle break
            # timestamp ties by event_id, so a stable ts-only sort would
            # make the emitted burst leader depend on arrival row order.
            order = np.lexsort(
                (rows["event_id"].to_numpy(), ts_us.to_numpy())
            )
            for us, eid in zip(
                ts_us.iloc[order], rows["event_id"].iloc[order].astype(int)
            ):
                us, eid = int(us), int(eid)
                if cur is None:
                    cur = [eid, us, us, 1]
                elif us - cur[2] > quiet_us:
                    # burst closed by a fresh leader
                    closed.append((cur[0], user_id, event_type, cur[1], cur[3]))
                    cur = [eid, us, us, 1]
                else:
                    cur[2] = max(cur[2], us)
                    cur[3] += 1
            state.update(tuple(cur))
            # a burst is final once the watermark passes its quiet window
            state.setTimeoutTimestamp((cur[2] + quiet_us) // 1000)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=["event_id", "user_id", "event_type", "ts_us", "burst_len"],
            )
            yield out

    return fn


def debounce_with_state(
    events: DataFrame, *, quiet_seconds: int = 300, watermark_minutes: int = 120
) -> DataFrame:
    """Append-mode streaming twin of ``events.debounce``: per
    (user, type) the state is one open burst (leader id/ts, last ts,
    count); a burst emits when a later event falls beyond the quiet
    window or the watermark passes ``last + quiet`` — so every emission
    is FINAL, and a finite in-time-order run reproduces the batch
    operator exactly (the same oracle gates both). State per key is one
    4-field struct, bounded by the watermark like the built-ins."""
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .select("event_id", "user_id", "event_type", "ts")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _debounce_fn(quiet_seconds),
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
