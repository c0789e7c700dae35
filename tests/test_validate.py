"""Data-quality expectations operator (operators/validate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_cortex_spark.operators.validate import check_expectations


def test_expectations_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (2, "X", -5.0, "9-BOGUS"),
            (3, None, 200.0, "2-HIGH"),
            (3, "F", None, None),
        ],
        ["k", "status", "price", "prio"],
    )
    rules = [
        {"type": "not_null", "col": "status"},
        {"type": "range", "col": "price", "lo": 0, "hi": 100},
        {"type": "accepted_values", "col": "status", "values": ["O", "F"]},
        {"type": "regex", "col": "prio", "pattern": "^[1-5]-"},
        {"type": "unique", "cols": ["k"]},
    ]
    got = {r["rule"]: (r["n_violations"], r["passed"])
           for r in check_expectations(df, rules).collect()}
    assert got["not_null(status)"] == (1, False)
    assert got["range(price)"] == (2, False)      # -5 and 200; NULL exempt
    assert got["accepted_values(status)"] == (1, False)  # X; NULL exempt
    assert got["regex(prio)"] == (1, False)       # 9-BOGUS; NULL exempt
    assert got["unique(k)"] == (1, False)         # one excess row for k=3


def test_expectations_clean_table_passes(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    rows = check_expectations(
        df,
        [{"type": "not_null", "col": "v"}, {"type": "unique", "cols": ["k"]}],
    ).collect()
    assert all(r["passed"] for r in rows)
    assert all(r["n_rows"] == 2 for r in rows)


def test_expectations_unique_ignores_null_keys(spark):
    """dbt's unique test exempts NULL keys: three NULL keys are not
    'duplicates of each other' (flagging NULLs is not_null's job), but
    they still count in n_rows; real duplicates still flag."""
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (None, "c"), (7, "d"), (7, "e")],
        "k INT, v STRING",
    )
    rows = {
        r["rule"]: r
        for r in check_expectations(
            df, [{"type": "unique", "cols": ["k"]}]
        ).collect()
    }
    r = rows["unique(k)"]
    assert (r["n_violations"], r["n_rows"], r["passed"]) == (1, 5, False)

    # composite key: NULL in EITHER column exempts the row
    df2 = spark.createDataFrame(
        [(1, None), (1, None), (1, 2), (1, 2)], "a INT, b INT"
    )
    r2 = check_expectations(df2, [{"type": "unique", "cols": ["a", "b"]}]) \
        .collect()[0]
    assert (r2["n_violations"], r2["n_rows"]) == (1, 4)


def test_expectations_rejects_unknown_rule(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="unknown expectation"):
        check_expectations(df, [{"type": "wat", "col": "k"}]).collect()
    with pytest.raises(ValueError, match="no rules"):
        check_expectations(df, [])


def test_expectations_references_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], ["k", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    got = {
        r["rule"]: (r["n_violations"], r["n_rows"], r["passed"])
        for r in check_expectations(
            child,
            [{"type": "references", "col": "fk", "to": parent, "to_col": "pk"}],
        ).collect()
    }
    # 99 is an orphan; NULL fk is exempt (not_null's job)
    assert got["references(fk)"] == (1, 4, False)
