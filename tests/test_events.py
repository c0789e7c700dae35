"""Event analytics operators vs generated DuckDB oracles."""

from __future__ import annotations

from project_cortex_spark import oracle
from project_cortex_spark.operators.events import (
    funnel,
    props_extract,
    retention_cohorts,
    rolling_anomaly,
    sessionize,
    top_users_per_type,
    windowed_agg,
)

from .conftest import assert_matches_oracle


def test_windowed_agg_hour(registry, duck):
    df = windowed_agg(registry.table("events"), minutes=60)
    assert_matches_oracle(df, duck, oracle.windowed_agg_sql(minutes=60))


def test_windowed_agg_quarter_hour(registry, duck):
    df = windowed_agg(registry.table("events"), minutes=15)
    assert_matches_oracle(df, duck, oracle.windowed_agg_sql(minutes=15))


def test_sessionize(registry, duck):
    df = sessionize(registry.table("events"), gap_minutes=30)
    assert_matches_oracle(df, duck, oracle.sessionize_sql(gap_minutes=30))


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10, 1.0),
        (2, "2024-01-01 00:10:00", 10, 2.0),  # 10 min gap: same session
        (3, "2024-01-01 01:00:00", 10, 3.0),  # 50 min gap: new session
        (4, "2024-01-01 00:00:00", 20, 4.0),  # other user: own session
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "value"]
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "value")
    got = sessionize(events, gap_minutes=30)
    sessions = {
        (r["user_id"], r["session_seq"]): r["n_events"] for r in got.collect()
    }
    assert sessions == {(10, 1): 2, (10, 2): 1, (20, 1): 1}


def test_funnel(registry, duck):
    df = funnel(registry.table("events"), horizon_minutes=1440)
    assert_matches_oracle(df, duck, oracle.funnel_sql(horizon_minutes=1440))


def test_funnel_semantics(spark):
    """Anchored-at-first-step1, strictly-after ordering, horizon cutoff:
    u10 completes all 3; u20's purchase precedes its click (stuck at 2);
    u30's click is outside the horizon (stuck at 1); u40 has no view (0)."""
    rows = [
        (1, "2024-01-01 00:00:00", 10, "view"),
        (2, "2024-01-01 01:00:00", 10, "click"),
        (3, "2024-01-01 02:00:00", 10, "purchase"),
        (4, "2024-01-01 00:00:00", 20, "purchase"),
        (5, "2024-01-01 01:00:00", 20, "view"),
        (6, "2024-01-01 02:00:00", 20, "click"),
        (7, "2024-01-01 00:00:00", 30, "view"),
        (8, "2024-01-03 00:00:00", 30, "click"),  # > 24 h after anchor
        (9, "2024-01-01 00:00:00", 40, "click"),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type")
    got = {
        r["steps_completed"]: r["n_users"]
        for r in funnel(events, horizon_minutes=1440).collect()
    }
    assert got == {3: 1, 2: 1, 1: 1, 0: 1}


def test_rolling_anomaly(registry, duck):
    df = rolling_anomaly(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.rolling_anomaly_sql())


def test_rolling_anomaly_semantics(spark):
    """Alternating 2/3 hourly volume with one 50-event spike: only the
    spike bucket is flagged, its baseline excludes the spike itself
    (mean_prev = mean of [2,3,2,3,2,3,2] = 2.4286), and the buckets
    AFTER the spike are not flagged because the spike inflates their
    trailing std. A flat series would have std=0 and never flag."""
    hour_us = 3_600 * 1_000_000
    rows = []
    eid = 0
    for b in range(10):
        n = 50 if b == 7 else (2 if b % 2 == 0 else 3)
        for _ in range(n):
            rows.append((eid, b * hour_us, "view"))
            eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "us", "event_type"]
    ).selectExpr("event_id", "timestamp_micros(us) AS ts", "event_type")
    got = rolling_anomaly(events, z_threshold=3.0).collect()
    assert [(r["bucket_start_us"], r["n_events"]) for r in got] == [
        (7 * hour_us, 50)
    ]
    assert got[0]["mean_prev"] == 2.4286


def test_retention_cohorts(registry, duck):
    df = retention_cohorts(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.retention_sql())


def test_retention_semantics(spark):
    """Cohort = bucket of first activity; offsets count returning users.
    u1 active in buckets {0, 1}; u2 only bucket 0; u3 first seen bucket 1."""
    day_us = 86_400 * 1_000_000
    rows = []
    for uid, days in ((1, [0, 8]), (2, [1]), (3, [9])):
        for d in days:
            rows.append((uid, d * day_us))
    events = spark.createDataFrame(rows, ["user_id", "us"]).selectExpr(
        "user_id", "timestamp_micros(us) AS ts"
    )
    got = {
        (r["cohort_bucket"], r["bucket_offset"]): r["n_users"]
        for r in retention_cohorts(events, days=7).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (1, 0): 1}


def test_props_extract(registry, duck):
    df = props_extract(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.props_extract_sql())


def test_top_users_per_type(registry, duck):
    df = top_users_per_type(registry.table("events"), k=3)
    assert_matches_oracle(df, duck, oracle.top_users_per_type_sql(k=3))


def test_ohlc_resample(registry, duck):
    from project_cortex_spark.operators.events import ohlc_resample

    got = ohlc_resample(registry.table("events"))
    assert_matches_oracle(got, duck, oracle.ohlc_sql())


def test_ohlc_semantics(spark):
    """Open/close follow (ts, event_id) order even under timestamp
    ties; high/low are plain extremes; one bar per (type, bucket)."""
    from project_cortex_spark.operators.events import ohlc_resample

    hour_us = 3_600 * 1_000_000
    rows = [
        # bucket 0: tie at t=0 -> event_id 1 opens; event 4 closes
        (1, 0, "view", 5.0),
        (2, 0, "view", 9.0),
        (3, 1_000_000, "view", 1.0),
        (4, 2_000_000, "view", 7.0),
        # bucket 1: single event
        (5, hour_us, "view", 3.0),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "us", "event_type", "value"]
    ).selectExpr("event_id", "timestamp_micros(us) AS ts", "event_type", "value")
    got = {
        r["bucket_start_us"]: (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in ohlc_resample(events).collect()
    }
    assert got == {0: (5.0, 9.0, 1.0, 7.0, 4), hour_us: (3.0, 3.0, 3.0, 3.0, 1)}


def test_value_histogram_matches_oracle(registry, duck):
    from project_cortex_spark import oracle as oracle_mod
    from project_cortex_spark.operators.events import value_histogram

    df = value_histogram(registry.table("events"), width=25.0)
    assert_matches_oracle(df, duck, oracle_mod.value_histogram_sql(width=25.0))


def test_value_histogram_partitions_all_rows(registry):
    from project_cortex_spark.operators.events import value_histogram

    ev = registry.table("events")
    rows = value_histogram(ev, width=100.0).collect()
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert r["bin_lo"] <= r["min_value"] <= r["max_value"] < r["bin_lo"] + 100.0


def test_gapfill_matches_oracle(registry, duck):
    from project_cortex_spark.operators.events import gapfill_resample

    df = gapfill_resample(registry.table("events"), bucket_minutes=60)
    assert_matches_oracle(df, duck, oracle.gapfill_sql(bucket_minutes=60))


def test_gapfill_emits_dense_grid(spark):
    import datetime as dt

    from project_cortex_spark.operators.events import gapfill_resample

    base = dt.datetime(2026, 1, 1, 0, 30)
    rows = [
        (1, base, "click", 1.0),
        (2, base + dt.timedelta(hours=3), "click", 2.0),  # 2-bucket gap
        (3, base + dt.timedelta(hours=3, minutes=10), "click", 3.0),
    ]
    ev_df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    got = sorted(
        gapfill_resample(ev_df, bucket_minutes=60).collect(),
        key=lambda r: r["bucket_start_us"],
    )
    assert len(got) == 4  # hours 0..3 inclusive — gaps emitted
    assert [r["is_gap"] for r in got] == [0, 1, 1, 0]
    assert [r["n_events"] for r in got] == [1, 0, 0, 2]
    # forward fill: the gap hours carry hour-0's sum
    assert [r["filled_sum"] for r in got] == [1.0, 1.0, 1.0, 5.0]


def test_debounce_matches_oracle(registry, duck):
    from project_cortex_spark.operators.events import debounce

    df = debounce(registry.table("events"), quiet_seconds=300)
    assert_matches_oracle(df, duck, oracle.debounce_sql(quiet_seconds=300))


def test_debounce_collapses_chained_bursts(spark):
    import datetime as dt

    from project_cortex_spark.operators.events import debounce

    t0 = dt.datetime(2026, 1, 1)
    # chain: each event within 300s of the PREVIOUS — one burst of 4
    # even though the last is 900s after the first; then a fresh leader
    rows = [
        (1, t0, 7, "click", 0.0),
        (2, t0 + dt.timedelta(seconds=290), 7, "click", 0.0),
        (3, t0 + dt.timedelta(seconds=580), 7, "click", 0.0),
        (4, t0 + dt.timedelta(seconds=870), 7, "click", 0.0),
        (5, t0 + dt.timedelta(seconds=1300), 7, "click", 0.0),
        (6, t0, 7, "view", 0.0),  # other type: independent
    ]
    ev_df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = {r["event_id"]: r["burst_len"] for r in debounce(ev_df).collect()}
    assert got == {1: 4, 5: 1, 6: 1}


def test_twap_matches_oracle(registry, duck):
    from project_cortex_spark.operators.events import twap

    assert_matches_oracle(twap(registry.table("events")), duck, oracle.twap_sql())


def test_twap_weights_by_holding_period(spark):
    import datetime as dt

    from project_cortex_spark.operators.events import twap

    t0 = dt.datetime(2026, 1, 1)
    # value 10 held for 3600s, value 100 held for 1s, final sample drops
    rows = [
        (1, t0, 7, "m", 10.0),
        (2, t0 + dt.timedelta(seconds=3600), 7, "m", 100.0),
        (3, t0 + dt.timedelta(seconds=3601), 7, "m", 0.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    r = twap(df).collect()[0]
    assert r["n_intervals"] == 2
    assert r["plain_avg"] == 55.0
    assert abs(r["twap"] - (10.0 * 3600 + 100.0 * 1) / 3601) < 1e-6


def test_activity_heatmap_matches_oracle(registry, duck):
    from project_cortex_spark.operators.events import activity_heatmap

    df = activity_heatmap(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.activity_heatmap_sql())


def test_activity_heatmap_dow_anchor(spark):
    import datetime as dt

    from project_cortex_spark.operators.events import activity_heatmap

    # 1970-01-01 was a Thursday; 2026-01-04 is a Sunday (dow 0)
    rows = [
        (1, dt.datetime(2026, 1, 4, 15, 30), 1, "click", 1.0),
        (2, dt.datetime(2026, 1, 5, 0, 0), 1, "click", 2.0),  # Monday
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    got = {(r["dow"], r["hour"]): r["n_events"] for r in activity_heatmap(df).collect()}
    assert got == {(0, 15): 1, (1, 0): 1}


def test_heatmap_and_gapfill_floor_pre_epoch(spark, duck):
    """Pre-1970 timestamps must FLOOR-bucket (truncation toward zero
    would put 1969-12-31 23:30 on Thursday hour 0 instead of Wednesday
    hour 23) — and Spark must agree with the DuckDB oracle on them."""
    import datetime as dt

    from project_cortex_spark.operators.events import (
        activity_heatmap,
        gapfill_resample,
    )

    rows = [
        # Wednesday 1969-12-31 23:30 UTC → dow 3, hour 23
        (1, dt.datetime(1969, 12, 31, 23, 30), 1, "click", 1.0),
        # Thursday 1970-01-01 00:30 UTC → dow 4, hour 0
        (2, dt.datetime(1970, 1, 1, 0, 30), 1, "click", 2.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = {(r["dow"], r["hour"]): r["n_events"] for r in activity_heatmap(df).collect()}
    assert got == {(3, 23): 1, (4, 0): 1}

    gf = {
        r["bucket_start_us"]: r["n_events"]
        for r in gapfill_resample(df, bucket_minutes=60).collect()
    }
    hour_us = 3_600 * 1_000_000
    assert gf == {-hour_us: 1, 0: 1}

    duck.register("pre_epoch_events", df.toPandas())
    o_heat = {
        (int(r[0]), int(r[1])): int(r[2])
        for r in duck.sql(
            oracle.activity_heatmap_sql("pre_epoch_events")
        ).fetchall()
    }
    assert o_heat == got
    o_gf = {
        int(r[1]): int(r[2])
        for r in duck.sql(oracle.gapfill_sql("pre_epoch_events")).fetchall()
    }
    assert o_gf == gf


def test_sliding_window_matches_oracle(registry, duck):
    from project_cortex_spark.operators.events import sliding_window_agg

    df = sliding_window_agg(registry.table("events"), minutes=60, slide_minutes=15)
    assert_matches_oracle(
        df, duck, oracle.sliding_window_sql(minutes=60, slide_minutes=15)
    )


def test_sliding_window_covers_each_event_ratio_times(spark):
    import datetime as dt

    from project_cortex_spark.operators.events import sliding_window_agg

    rows = [(1, dt.datetime(2026, 1, 1, 0, 37), 7, "m", 1.0)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    got = sorted(
        r["window_start_us"]
        for r in sliding_window_agg(df, minutes=60, slide_minutes=15).collect()
    )
    # 00:37 belongs to windows starting 23:45, 00:00, 00:15, 00:30
    base = int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * 10**6
    q = 15 * 60 * 10**6
    assert got == [base - q, base, base + q, base + 2 * q]


def test_ewma_series_recursion(spark):
    from datetime import datetime

    from project_cortex_spark.operators.events import ewma_series

    rows = []
    # type 'a': hours 0,1,2 with 1, 4, 2 events
    for h, n in [(0, 1), (1, 4), (2, 2)]:
        for i in range(n):
            rows.append((len(rows), datetime(2024, 1, 1, h, 5 + i), 1, "a", 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r.window_start.hour: (r.n_events, r.ewma)
        for r in ewma_series(df).collect()
    }
    # y0=1; y1=0.25*4+0.75*1=1.75; y2=0.25*2+0.75*1.75=1.8125
    assert got[0] == (1, 1.0)
    assert got[1] == (4, 1.75)
    assert got[2] == (2, 1.8125)


def test_ewma_matches_oracle_at_alpha_half(registry, duck):
    from project_cortex_spark import oracle as orc
    from project_cortex_spark.operators.events import ewma_series

    from .conftest import assert_matches_oracle

    df = ewma_series(registry.table("events"), minutes=30, alpha=0.5)
    assert_matches_oracle(
        df, duck, orc.ewma_sql(minutes=30, alpha=0.5)
    )


def test_throttle_caps_per_window_and_keeps_arrival_order(spark):
    """7 events in one hour for one user, limit 5: exactly 5 kept, one
    saturated window; a quiet user never appears in the audit."""
    import datetime as dt

    from project_cortex_spark.operators.events import throttle

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [(i, base + dt.timedelta(minutes=i), 1) for i in range(7)]
    rows += [(100, base, 2)]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint")
    out = throttle(df, minutes=60, limit=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.n_total, r.n_kept, r.n_saturated_windows) == (1, 7, 5, 1)


def test_ks_drift_known_values(spark):
    """Hand-computed two-sample KS: shifted uniform halves give
    D = 0.5; identical halves give exactly 0 (RANGE frames absorb the
    cross-half ties); a group with everything in one half reports NULL
    rather than a fake 0."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import ks_drift

    t0 = datetime(2026, 1, 1)
    rows = []
    # group a: early [1,2,3,4] (hours 0-3), late [3,4,5,6] (hours 20-23)
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append(("a", v, t0 + timedelta(hours=i)))
    for i, v in enumerate([3.0, 4.0, 5.0, 6.0]):
        rows.append(("a", v, t0 + timedelta(hours=20 + i)))
    # group b: identical halves -> D = 0
    for i, v in enumerate([1.0, 5.0, 9.0]):
        rows.append(("b", v, t0 + timedelta(hours=i)))
        rows.append(("b", v, t0 + timedelta(hours=20 + i)))
    # group c: single event -> late side empty -> NULL stat
    rows.append(("c", 7.0, t0))
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    got = {r["event_type"]: r for r in ks_drift(df).collect()}
    assert (got["a"]["n_early"], got["a"]["n_late"]) == (4, 4)
    assert got["a"]["ks_stat"] == 0.5
    assert got["b"]["ks_stat"] == 0.0
    assert got["c"]["n_early"] == 1 and got["c"]["n_late"] == 0
    assert got["c"]["ks_stat"] is None


def test_psi_drift_known_values(spark):
    """PSI conventions pinned: identical halves give exactly 0 (every
    observed bucket's smoothed fractions match when n1 == n2); a gross
    shift scores far above the 0.25 'shifted' rule of thumb; a
    degenerate constant-value group collapses to bucket 0 and scores 0;
    one-sided groups report NULL."""
    import math
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import psi_drift

    t0 = datetime(2026, 1, 1)
    rows = []
    # group a: early uniform low [0..9], late uniform high [90..99]
    for i in range(10):
        rows.append(("a", float(i), t0 + timedelta(hours=i % 4)))
        rows.append(("a", 90.0 + i, t0 + timedelta(hours=20 + i % 4)))
    # group b: identical halves
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append(("b", v, t0 + timedelta(hours=i)))
        rows.append(("b", v, t0 + timedelta(hours=20 + i)))
    # group c: constant value both halves
    rows.append(("c", 5.0, t0))
    rows.append(("c", 5.0, t0 + timedelta(hours=20)))
    # group d: one-sided
    rows.append(("d", 1.0, t0))
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    got = {r["event_type"]: r for r in psi_drift(df).collect()}
    assert got["b"]["psi"] == 0.0
    assert got["c"]["psi"] == 0.0
    assert got["a"]["psi"] > 0.25  # gross shift
    # hand-check group a: observed buckets 0 and 9, (10 vs 0) each way;
    # pe0 = 10.5/15, pl0 = 0.5/15 and symmetric for bucket 9
    expect = 2 * (10.5 / 15 - 0.5 / 15) * math.log(10.5 / 0.5)
    assert abs(got["a"]["psi"] - round(expect, 6)) < 1e-9
    assert got["d"]["psi"] is None


def test_ks_drift_ignores_null_values(spark):
    """NULL values are excluded from the empirical CDF (Spark and
    DuckDB disagree on NULL sort position, and a NULL carries no
    distribution information)."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import ks_drift

    t0 = datetime(2026, 1, 1)
    rows = []
    for i, v in enumerate([1.0, 2.0, None, 3.0, 4.0]):
        rows.append(("a", v, t0 + timedelta(hours=i % 4)))
    for i, v in enumerate([None, 3.0, 4.0, 5.0, 6.0]):
        rows.append(("a", v, t0 + timedelta(hours=20 + i % 4)))
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    got = ks_drift(df).collect()[0]
    assert (got["n_early"], got["n_late"]) == (4, 4)
    assert got["ks_stat"] == 0.5  # same halves as the known-values test


def test_drift_ignores_null_timestamps(spark):
    """ADVICE r8 (medium): a NULL timestamp has no side — Spark's
    (us <= mid) is NULL (row silently dropped from both halves) while
    a CASE WHEN oracle would send it LATE. Both drift monitors must
    EXCLUDE NULL-ts rows, matching their oracles' explicit
    ts IS NOT NULL filter: output with NULL-ts rows present equals
    output with them absent, on every column including the counts."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import ks_drift, psi_drift

    t0 = datetime(2026, 1, 1)
    clean = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        clean.append(("a", v, t0 + timedelta(hours=i)))
    for i, v in enumerate([3.0, 4.0, 5.0, 6.0]):
        clean.append(("a", v, t0 + timedelta(hours=20 + i)))
    noisy = clean + [("a", 100.0, None), ("a", -100.0, None)]
    schema = "event_type string, value double, ts timestamp"
    df_clean = spark.createDataFrame(clean, schema)
    df_noisy = spark.createDataFrame(noisy, schema)
    for op in (ks_drift, psi_drift):
        a = [tuple(r) for r in op(df_clean).collect()]
        b = [tuple(r) for r in op(df_noisy).collect()]
        assert a == b, op.__name__
    got = ks_drift(df_noisy).collect()[0]
    assert (got["n_early"], got["n_late"]) == (4, 4)


def test_cusum_localizes_planted_level_shift(spark):
    """A flat 10-per-hour series that jumps to 30 at hour 24, with the
    default self-derived reference (global mu=20, sigma=10): the LOW
    half is a negative deviation (S- climbs from bucket 0, alarms once
    it crosses 4 sigma, then decays to 0 after the shift) and the HIGH
    half a positive one (S+ is exactly 0 before the shift, climbs from
    bucket 24, alarms a few buckets later). A steady group never
    alarms."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import cusum_series

    t0 = datetime(2026, 1, 1)
    rows = []
    for h in range(48):
        n = 10 if h < 24 else 30
        for i in range(n):
            rows.append(("shifted", 1.0, t0 + timedelta(hours=h, seconds=i)))
        for i in range(10):
            rows.append(("steady", 1.0, t0 + timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    out = {
        (r["event_type"], r["window_start"].hour + 24 * (r["window_start"].day - 1)): r
        for r in cusum_series(df).collect()
    }
    assert all(not out[("steady", h)]["alarm"] for h in range(48))
    # S+ exactly 0 through the low half, first positive at the shift
    assert all(out[("shifted", h)]["cusum_pos"] == 0.0 for h in range(24))
    assert out[("shifted", 24)]["cusum_pos"] > 0.0
    # mu=20, sigma=10, k=5, h=40: S+ climbs 5/bucket from h=24 -> first
    # S+ alarm at h=24+8=32; S- climbs 5/bucket from h=0 -> alarm at 8
    pos_alarms = [
        h for h in range(48) if out[("shifted", h)]["cusum_pos"] > 40.0
    ]
    neg_alarms = [
        h for h in range(48) if out[("shifted", h)]["cusum_neg"] > 40.0
    ]
    assert min(pos_alarms) == 32 and min(neg_alarms) == 8
    assert all(out[("shifted", h)]["alarm"] for h in (8, 32))
    # S- decays 15/bucket after the shift: zero again by hour 24+8
    assert out[("shifted", 47)]["cusum_neg"] == 0.0


def test_drift_cells_merge_monoid(spark):
    """The streaming-twin contract: cells computed on disjoint
    micro-batch splits against ONE frozen bounds frame, merged by
    summing, finish to the exact batch answer — for both monitors."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from project_cortex_spark.operators import events as ev

    rnd = random.Random(11)
    t0 = datetime(2026, 1, 1)
    rows = [
        (
            "a" if i % 3 else "b",
            round(rnd.uniform(0, 100), 4),
            t0 + timedelta(minutes=i),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    bounds = ev.drift_bounds(df)
    lo = df.filter(F.col("value") < 50)
    hi = df.filter(F.col("value") >= 50)

    ks_merged = (
        ev.ks_drift_cells(lo, bounds)
        .unionByName(ev.ks_drift_cells(hi, bounds))
        .groupBy("grp", "v")
        .agg(F.sum("c1w").alias("c1w"), F.sum("c2w").alias("c2w"))
    )
    want = sorted(map(tuple, ev.ks_drift(df).collect()))
    got = sorted(map(tuple, ev.ks_drift_on_cells(ks_merged).collect()))
    assert got == want

    psi_merged = (
        ev.psi_drift_cells(lo, bounds)
        .unionByName(ev.psi_drift_cells(hi, bounds))
        .groupBy("grp", "b")
        .agg(F.sum("ce").alias("ce"), F.sum("cl").alias("cl"))
    )
    want = sorted(map(tuple, ev.psi_drift(df).collect()))
    got = sorted(map(tuple, ev.psi_drift_on_cells(psi_merged).collect()))
    assert got == want


def test_drift_midpoint_is_integer_division(spark):
    """ADVICE r8 (low): the midpoint must be true BIGINT division
    (replaying the oracle's //), not float-divide-then-floor. With an
    odd 3-microsecond span, mid = lo + 1: the row AT lo+1 is EARLY.
    (Float division also lands early here; this pins the semantics so
    a regression to float arithmetic at >2^53-us spans has a guard to
    trip when the expression changes.)"""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import ks_drift

    t0 = datetime(2026, 1, 1)
    us = timedelta(microseconds=1)
    rows = [
        ("a", 1.0, t0),
        ("a", 2.0, t0 + 1 * us),  # == mid -> early
        ("a", 3.0, t0 + 2 * us),
        ("a", 4.0, t0 + 3 * us),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    got = ks_drift(df).collect()[0]
    assert (got["n_early"], got["n_late"]) == (2, 2)


def test_mad_outliers_oracle(registry, duck):
    from project_cortex_spark.operators.events import mad_outliers

    df = mad_outliers(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.mad_outliers_sql())


def test_mad_outliers_semantics(spark):
    """A planted far point is flagged with the Iglewicz-Hoaglin score;
    a >50%-constant group has MAD 0 and NEVER flags (try_divide ->
    NULL, not inf); NULL values are ignored."""
    from project_cortex_spark.operators.events import mad_outliers

    rows = [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 100])]
    rows += [("z", 10 + i, 7.0) for i in range(5)] + [("z", 20, 1e9)]
    rows += [("a", 99, None)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    got = mad_outliers(df, threshold=3.5).collect()
    assert [(r["event_type"], r["event_id"]) for r in got] == [("a", 5)]
    r = got[0]
    # a-group: median 3.5, MAD 1.5, M = .6745*(100-3.5)/1.5
    assert r["median"] == 3.5 and r["mad"] == 1.5
    assert r["m_score"] == round(0.6745 * (100 - 3.5) / 1.5, 4)


def test_autocorr_oracle(registry, duck):
    from project_cortex_spark.operators.events import autocorr_series

    df = autocorr_series(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.autocorr_sql())


def test_autocorr_alternating_series(spark):
    """x = 1,3,1,3,... : lag-1 pairs are perfectly anti-correlated
    (acf -1), lag-2 perfectly correlated (acf 1) — exact from the
    integer power sums. A missing bucket removes exactly its pairs
    (time lags, not row lags)."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import autocorr_series

    t0 = datetime(2026, 1, 1)
    rows = []
    for h in range(12):
        n = 1 if h % 2 == 0 else 3
        for i in range(n):
            rows.append(("alt", 1.0, t0 + timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    out = {r["lag"]: r for r in autocorr_series(df, max_lag=3).collect()}
    assert out[1]["acf"] == -1.0 and out[1]["n_pairs"] == 11
    assert out[2]["acf"] == 1.0 and out[2]["n_pairs"] == 10
    # drop hour 5 entirely: lag-1 loses the (4,5) and (5,6) pairs
    rows2 = [r for r in rows if r[2].hour != 5]
    df2 = spark.createDataFrame(rows2, "event_type string, value double, ts timestamp")
    out2 = {r["lag"]: r for r in autocorr_series(df2, max_lag=3).collect()}
    assert out2[1]["n_pairs"] == 9


def test_holt_oracle(registry, duck):
    from project_cortex_spark.operators.events import holt_series

    df = holt_series(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.holt_sql())


def test_holt_linear_trend_semantics(spark):
    """Hand-checked two-step recursion (alpha=1/2, beta=1/4 exact
    binary): x=[2,4] -> level 3, trend 0.25, forecast x1=2, residual
    2; and on a long pure ramp the one-step residual shrinks toward 0
    while EWMA's lag would stay constant — the trend term earns its
    keep."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import holt_series

    t0 = datetime(2026, 1, 1)
    rows = []
    for h, n in enumerate([2, 4]):
        for i in range(n):
            rows.append(("two", 1.0, t0 + timedelta(hours=h, seconds=i)))
    for h in range(40):
        for i in range(h + 1):
            rows.append(("ramp", 1.0, t0 + timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    out = holt_series(df).collect()
    two = sorted(
        [r for r in out if r["event_type"] == "two"],
        key=lambda r: r["window_start"],
    )
    assert two[0]["level"] == 2.0 and two[0]["trend"] == 0.0
    assert two[0]["forecast"] is None and two[0]["residual"] is None
    assert two[1]["level"] == 3.0 and two[1]["trend"] == 0.25
    assert two[1]["forecast"] == 2.0 and two[1]["residual"] == 2.0
    ramp = sorted(
        [r for r in out if r["event_type"] == "ramp"],
        key=lambda r: r["window_start"],
    )
    assert abs(ramp[-1]["residual"]) < 0.05


def test_bucket_cells_finishers_merge_monoid(spark):
    """Streaming-twin contract for the autocorr/holt finishers: cells
    computed on disjoint micro-batch splits, merged by summing counts,
    finish to the exact batch answer."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from project_cortex_spark.operators import events as ev

    rnd = random.Random(13)
    t0 = datetime(2026, 1, 1)
    rows = [
        (
            rnd.choice(["a", "b"]),
            1.0,
            t0 + timedelta(hours=rnd.randrange(48), seconds=rnd.randrange(600)),
        )
        for _ in range(600)
    ]
    schema = "event_type string, value double, ts timestamp"
    df = spark.createDataFrame(rows, schema)
    half1 = spark.createDataFrame(rows[:300], schema)
    half2 = spark.createDataFrame(rows[300:], schema)
    merged = (
        ev.bucket_count_cells(half1)
        .unionByName(ev.bucket_count_cells(half2))
        .groupBy("window_start", "event_type")
        .agg(F.sum("n_events").alias("n_events"))
    )
    for fin in (ev.autocorr_on_cells, ev.holt_on_cells, ev.seasonal_on_cells):
        batch = {
            tuple(r)[:2]: tuple(r)
            for r in fin(ev.bucket_count_cells(df)).collect()
        }
        twin = {tuple(r)[:2]: tuple(r) for r in fin(merged).collect()}
        assert batch == twin, fin.__name__


def test_seasonal_oracle(registry, duck):
    from project_cortex_spark.operators.events import seasonal_decompose

    df = seasonal_decompose(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.seasonal_decompose_sql())


def test_seasonal_recovers_planted_daily_pattern(spark):
    """A series that is base 10 + phase bump (5 extra events at hour
    14 of every day) + a linear ramp: the decomposition's seasonal
    component concentrates the bump at phase 14, the trend follows
    the ramp, and residuals are near zero — interior rows only."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import seasonal_decompose

    t0 = datetime(2026, 1, 1)
    rows = []
    for h in range(24 * 8):
        n = 10 + (5 if h % 24 == 14 else 0) + h // 48
        for i in range(n):
            rows.append(("s", 1.0, t0 + timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    )
    out = seasonal_decompose(df).collect()
    # interior rows only: 192 buckets - 2*12 edge rows
    assert len(out) == 24 * 8 - 24
    by_phase = {}
    for r in out:
        ph = (r["window_start"].hour) % 24
        by_phase.setdefault(ph, []).append(r)
    mean_seasonal = {
        ph: sum(x["seasonal"] for x in rs) / len(rs)
        for ph, rs in by_phase.items()
    }
    # the bump phase carries ~+5 (minus the small mean shift); every
    # other phase stays within the ramp's step noise
    assert mean_seasonal[14] > 4.0
    assert all(abs(v) < 0.5 for ph, v in mean_seasonal.items() if ph != 14)
    assert max(abs(r["residual"]) for r in out) < 1.0


def test_ttest_drift_oracle(registry, duck):
    from project_cortex_spark.operators.events import ttest_drift

    df = ttest_drift(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.ttest_drift_sql())


def test_ttest_drift_planted_shift(spark):
    """Planted mean shift: group 'a' steps 10.0 -> 13.0 at the halfway
    point (tight noise), group 'b' stays flat. Welch t on a's halves
    must be hugely negative (early < late) with df ~ n-2; b's |t|
    small. Hand-check the exact t for a tiny third group."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import ttest_drift

    t0 = datetime(2026, 1, 1)
    rows = []
    for i in range(400):
        noise = 0.01 * (i % 7)
        rows.append(
            ("a", (10.0 if i < 200 else 13.0) + noise,
             t0 + timedelta(minutes=i))
        )
        rows.append(("b", 5.0 + noise, t0 + timedelta(minutes=i)))
    # tiny group: early {1, 2}, late {3, 5} -> m1=1.5 m2=4, v1=.5 v2=2
    # se2 = .25 + 1 = 1.25, t = -2.5/sqrt(1.25), df = 1.25^2/(.03125+.5)
    for j, (v, mins) in enumerate(
        [(1.0, 0), (2.0, 10), (3.0, 30), (5.0, 40)]
    ):
        rows.append(("c", v, t0 + timedelta(minutes=mins)))
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    got = {r["event_type"]: r for r in ttest_drift(df).collect()}
    assert got["a"]["t_stat"] < -100
    assert abs(got["b"]["t_stat"]) < 3
    import math

    assert got["c"]["n_early"] == 2 and got["c"]["n_late"] == 2
    assert got["c"]["mean_early"] == 1.5 and got["c"]["mean_late"] == 4.0
    assert got["c"]["t_stat"] == round(-2.5 / math.sqrt(1.25), 6)
    assert got["c"]["welch_df"] == round(1.25**2 / (0.5**2 / 2 / 2 / 1 + 2.0**2 / 2 / 2 / 1), 6)


def test_ttest_degenerate_groups_null(spark):
    """One-sided and n=1-per-side groups report NULL statistics, and
    NULL values/timestamps are excluded like the KS/PSI monitors."""
    from datetime import datetime

    from project_cortex_spark.operators.events import ttest_drift

    ts = lambda m: datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        ("one_sided", 1.0, ts(0)),
        ("one_sided", 2.0, ts(1)),  # both land early of their midpoint?
        ("n1_each", 1.0, ts(0)),
        ("n1_each", 9.0, ts(40)),
        ("nulls", None, ts(0)),
        ("nulls", 4.0, None),
        ("nulls", 1.0, ts(0)),
        ("nulls", 2.0, ts(40)),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    )
    got = {r["event_type"]: r for r in ttest_drift(df).collect()}
    # midpoint of [0,1min] splits 1 early / 1 late -> n<=1 per side
    assert got["one_sided"]["t_stat"] is None
    assert got["n1_each"]["t_stat"] is None and got["n1_each"]["welch_df"] is None
    # NULL value + NULL ts rows excluded -> 1 early, 1 late
    assert (got["nulls"]["n_early"], got["nulls"]["n_late"]) == (1, 1)
    assert got["nulls"]["t_stat"] is None


def test_ttest_cells_merge_monoid(spark):
    """Splitting events into two arbitrary deliveries and summing the
    cells reproduces the single-batch statistics — the streaming twin
    contract (merge-on-read in ttest_on_cells)."""
    from project_cortex_spark.operators.events import (
        drift_bounds,
        ttest_cells,
        ttest_on_cells,
    )

    import random
    from datetime import datetime, timedelta

    rnd = random.Random(29)
    t0 = datetime(2026, 1, 1)
    rows = [
        (
            rnd.choice(["a", "b", "c"]),
            round(rnd.uniform(-50, 50), 4),
            t0 + timedelta(minutes=rnd.randrange(2000)),
        )
        for _ in range(600)
    ]
    schema = "event_type string, value double, ts timestamp"
    events = spark.createDataFrame(rows, schema)
    h1 = spark.createDataFrame(rows[:250], schema)
    h2 = spark.createDataFrame(rows[250:], schema)
    bounds = drift_bounds(events)
    whole = ttest_on_cells(ttest_cells(events, bounds))
    merged = ttest_cells(h1, bounds).unionByName(ttest_cells(h2, bounds))
    twin = ttest_on_cells(merged)
    a = {tuple(r) for r in whole.collect()}
    b = {tuple(r) for r in twin.collect()}
    assert a == b


def test_seasonal_outliers_oracle(registry, duck):
    from project_cortex_spark.operators.events import seasonal_outliers

    df = seasonal_outliers(registry.table("events"))
    assert_matches_oracle(df, duck, oracle.seasonal_outliers_sql())


def test_seasonal_outliers_ignore_daily_cycle(spark):
    """A strongly cyclic series (hour-14 bump every day) with ONE
    planted anomaly (hour 14 of day 5 missing its bump): the raw
    rolling/MAD detectors would flag every bump hour, but the
    seasonality-adjusted rule flags exactly the anomalous bucket."""
    from datetime import datetime, timedelta

    from project_cortex_spark.operators.events import seasonal_outliers

    t0 = datetime(2026, 1, 1)
    rows = []
    for h in range(24 * 10):
        # h*7 % 5 jitter: without it most residuals are EXACTLY zero,
        # the median absolute deviation is zero, and the zero-MAD
        # contract (NULL M, never flagged) correctly reports "no
        # statistic" — the detector needs a live noise floor
        n = 10 + (h * 7 % 5) + (15 if h % 24 == 14 else 0)
        if h == 24 * 5 + 14:  # the planted anomaly: bump missing
            n = 10 + (h * 7 % 5)
        for i in range(n):
            rows.append(("s", 1.0, t0 + timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    )
    got = seasonal_outliers(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r["window_start"] == t0 + timedelta(hours=24 * 5 + 14)
    assert r["n_events"] == 10 + (24 * 5 + 14) * 7 % 5  # 13: base+jitter
    assert r["m_score"] < -3.5
