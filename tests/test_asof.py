"""As-of join vs DuckDB's native ASOF JOIN + strictness semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_cortex_spark.operators.asof import as_of_join

from .conftest import assert_matches_oracle


def _checkpoints(events):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    return (
        events.filter(F.col("event_id") % 10 == 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "value")
    )


ASOF_ORACLE = """
    WITH ckpt AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 10 = 0
      ) WHERE rn = 1
    )
    SELECT l.event_id, l.user_id, l.ts,
           round(l.value, 6) AS value,
           round(r.value, 6) AS ckpt_value
    FROM events l
    ASOF LEFT JOIN ckpt r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def test_asof_join_matches_duckdb(registry, duck):
    events = registry.table("events")
    got = as_of_join(
        events.select("event_id", "user_id", "ts", "value"),
        _checkpoints(events),
        on="user_id",
        right_payload=["value"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 6).alias("value"),
        F.round("right_value", 6).alias("ckpt_value"),
    )
    assert_matches_oracle(got, duck, ASOF_ORACLE)


def test_asof_strictness(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (2, "2024-01-01 00:20:00"),
         (3, "2024-01-01 00:05:00")],
        ["id", "ts"],
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) ts", "1 AS k")
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00"), ("b", "2024-01-01 00:15:00")],
        ["tag", "ts"],
    ).selectExpr("tag", "CAST(ts AS TIMESTAMP) ts", "1 AS k")

    inclusive = {
        r["id"]: r["right_tag"]
        for r in as_of_join(left, right, on="k", right_payload=["tag"]).collect()
    }
    assert inclusive == {1: "a", 2: "b", 3: None}

    strict = {
        r["id"]: r["right_tag"]
        for r in as_of_join(
            left, right, on="k", right_payload=["tag"], strict=True
        ).collect()
    }
    # id 1 sits exactly on checkpoint 'a': strictly-before excludes it
    assert strict == {1: None, 2: "b", 3: None}


def test_asof_forward_and_tolerance(spark):
    """direction='forward' matches the EARLIEST right at-or-after;
    tolerance nulls (not drops) matches further than the bound."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (2, "2024-01-01 00:16:00"),
         (3, "2024-01-01 00:30:00")],
        ["id", "ts"],
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) ts", "1 AS k")
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00"), ("b", "2024-01-01 00:15:00")],
        ["tag", "ts"],
    ).selectExpr("tag", "CAST(ts AS TIMESTAMP) ts", "1 AS k")

    fwd = {
        r["id"]: r["right_tag"]
        for r in as_of_join(
            left, right, on="k", right_payload=["tag"], direction="forward"
        ).collect()
    }
    # id1 sits ON 'a' (inclusive); id2 (00:16) and id3 (00:30) are
    # after every right row -> no later match
    assert fwd == {1: "a", 2: None, 3: None}

    strict_fwd = {
        r["id"]: r["right_tag"]
        for r in as_of_join(
            left, right, on="k", right_payload=["tag"],
            direction="forward", strict=True,
        ).collect()
    }
    # strictly-after excludes id1's own-time 'a'; 'b' at 00:15 is next
    assert strict_fwd == {1: "b", 2: None, 3: None}

    tol = {
        r["id"]: r["right_tag"]
        for r in as_of_join(
            left, right, on="k", right_payload=["tag"],
            tolerance_us=4 * 60 * 1_000_000,
        ).collect()
    }
    # backward with 4 min tolerance: id2 (1 min after 'b') keeps it;
    # id3 (15 min after 'b') is nulled; id1 on 'a' at distance 0 keeps
    assert tol == {1: "a", 2: "b", 3: None}


# ---------------------------------------------------------------------------
# range joins
# ---------------------------------------------------------------------------


def test_range_join_events_to_sessions(registry, duck):
    """Assigning events to their session interval is a keyed range join;
    every event lands in exactly one of its user's sessions."""
    from project_cortex_spark import oracle
    from project_cortex_spark.operators import events as ev
    from project_cortex_spark.operators.asof import range_join

    events = registry.table("events")
    sessions = ev.sessionize(events, gap_minutes=30)
    got = range_join(
        events.select("event_id", "user_id", "ts"),
        sessions.select("user_id", "session_seq", "session_start", "session_end"),
        on="user_id",
        point="ts",
        start="session_start",
        end="session_end",
    ).select("event_id", "user_id", "session_seq")
    assert got.count() == events.count()
    assert_matches_oracle(
        got,
        duck,
        f"""
        WITH s AS ({oracle.sessionize_sql(gap_minutes=30)})
        SELECT e.event_id, e.user_id, s.session_seq
        FROM events e JOIN s ON e.user_id = s.user_id
         AND e.ts BETWEEN s.session_start AND s.session_end
        """,
    )


def test_range_join_bucketed_equals_naive(spark):
    from project_cortex_spark.operators.asof import range_join_bucketed

    points = spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(200)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [(j, float(j * 13 % 90), float(j * 13 % 90 + j % 17)) for j in range(40)],
        ["iid", "lo", "hi"],
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_bucketed(
            points, intervals, point="x", start="lo", end="hi", bucket_width=8.0
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .collect()
    }
    assert got == naive and got


def test_asof_null_payload_stays_atomic(spark):
    """A matched right row with NULL in one payload column must deliver
    that NULL — never back-fill the column from an older right row
    (the matched row travels as ONE struct through the window fill)."""
    left = spark.createDataFrame(
        [(1, 10), (2, 20)], ["id", "t"]
    ).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [(5, "x1", "y1"), (15, None, "y2")], ["t", "a", "b"]
    ).withColumn("k", F.lit(1))
    got = {
        r["id"]: (r["right_a"], r["right_b"])
        for r in as_of_join(
            left, right, on="k", left_time="t", right_time="t",
            right_payload=["a", "b"],
        ).collect()
    }
    assert got[1] == ("x1", "y1")
    # matched row is (15, NULL, y2): 'a' must be NULL, not "x1"
    assert got[2] == (None, "y2")


def test_asof_rejects_bad_direction(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, 1)], ["id", "k", "t"])
    with pytest.raises(ValueError, match="backward|forward"):
        as_of_join(
            df, df, on="k", left_time="t", right_time="t",
            right_payload=["id"], direction="sideways",
        )


def test_asof_nearest_picks_closer_side_ties_backward(spark):
    # key 1: left t=10 with right at 7 (gap 3) and 12 (gap 2) -> forward
    # key 2: left t=10 with right at 8 and 12 (both gap 2) -> tie: backward
    # key 3: left t=10 with only an earlier right -> backward fallback
    # key 4: left t=10 with only a later right -> forward fallback
    left = spark.createDataFrame(
        [(1, 1, 10), (2, 2, 10), (3, 3, 10), (4, 4, 10)],
        ["id", "k", "t"],
    )
    right = spark.createDataFrame(
        [(1, 7, "b1"), (1, 12, "f1"),
         (2, 8, "b2"), (2, 12, "f2"),
         (3, 5, "b3"),
         (4, 30, "f4")],
        ["k", "t", "v"],
    )
    got = {
        r["id"]: r["right_v"]
        for r in as_of_join(
            left, right, on="k", left_time="t", right_time="t",
            right_payload=["v"], direction="nearest",
        ).collect()
    }
    assert got == {1: "f1", 2: "b2", 3: "b3", 4: "f4"}


def test_asof_nearest_strict_and_tolerance(spark):
    # equal-time right exists; strict must skip it on BOTH sides
    left = spark.createDataFrame([(1, 1, 10)], ["id", "k", "t"])
    right = spark.createDataFrame(
        [(1, 10, "eq"), (1, 6, "b"), (1, 13, "f")], ["k", "t", "v"]
    )
    pick = lambda **kw: as_of_join(
        left, right, on="k", left_time="t", right_time="t",
        right_payload=["v"], direction="nearest", **kw
    ).collect()[0]["right_v"]
    assert pick() == "eq"  # non-strict: distance 0 wins
    assert pick(strict=True) == "f"  # 13 is closer than 6
    # tolerance in the time column's own units: 2 excludes both
    assert pick(strict=True, tolerance_us=2) is None
    assert pick(strict=True, tolerance_us=3) == "f"


def test_asof_nearest_rejects_fractional_time(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, 1.5)], ["id", "k", "t"])
    with pytest.raises(ValueError, match="integer or timestamp"):
        as_of_join(
            df, df, on="k", left_time="t", right_time="t",
            right_payload=["id"], direction="nearest",
        )
    # directional forms still accept float time (exact-value ordering)
    assert as_of_join(
        df, df, on="k", left_time="t", right_time="t",
        right_payload=["id"],
    ).count() == 1
