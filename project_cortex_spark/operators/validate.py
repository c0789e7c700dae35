"""Data-quality expectations — declarative validation gates over any
table (the dbt-test / Great-Expectations shape a production ingest runs
before publishing a partition).

Each rule compiles to plain JVM expressions; the whole suite is
evaluated in ONE pass per table (a single aggregate of conditional
counts) plus one aggregate per uniqueness rule (count-distinct needs its
own shuffle). Output is one row per rule: violations, row count, pass.

At 100 TB: the conditional-count pass is map-side partial at scan
bandwidth; uniqueness rules are the expensive ones (a full groupBy on
the key) — run them on the columns you actually publish as keys.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict[str, Any]) -> Column:
    """Column expression that is TRUE on a row violating the rule."""
    kind = rule["type"]
    if kind == "not_null":
        return F.col(rule["col"]).isNull()
    if kind == "range":
        c = F.col(rule["col"])
        bad = F.lit(False)
        if "lo" in rule:
            bad = bad | (c < rule["lo"])
        if "hi" in rule:
            bad = bad | (c > rule["hi"])
        return c.isNotNull() & bad
    if kind == "accepted_values":
        c = F.col(rule["col"])
        return c.isNotNull() & ~c.isin(*rule["values"])
    if kind == "regex":
        c = F.col(rule["col"])
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown expectation type: {kind!r}")


def _rule_name(rule: dict[str, Any]) -> str:
    if rule["type"] == "unique":
        return f"unique({','.join(rule['cols'])})"
    if rule["type"] == "references":
        return f"references({rule['col']})"
    return f"{rule['type']}({rule['col']})"


def check_expectations(
    df: DataFrame, rules: list[dict[str, Any]]
) -> DataFrame:
    """Evaluate every rule; returns (rule, n_violations, n_rows, passed).

    Row-level rules (not_null / range / accepted_values / regex) share
    ONE conditional-count aggregate over a single scan. Uniqueness rules
    (``{"type": "unique", "cols": [...]}``) each add a groupBy counting
    keys seen more than once — the violation count is the number of
    EXCESS rows (rows beyond the first per duplicated key), so a clean
    table reports 0. Rows with a NULL in any key column are EXEMPT from
    uniqueness (dbt's ``unique`` test ignores NULL keys — flagging NULLs
    is ``not_null``'s job), but still count in n_rows. Referential rules
    (``{"type": "references", "col": ..., "to": other_df,
    "to_col": ...}``) count orphan rows via a left_anti join against
    the referenced key set (dbt's ``relationships`` test) — at scale
    the anti join broadcasts when the key side is dimension-sized, and
    NULL foreign keys are exempt (that is ``not_null``'s job).
    """
    row_rules = [
        r for r in rules if r["type"] not in ("unique", "references")
    ]
    uniq_rules = [r for r in rules if r["type"] == "unique"]
    ref_rules = [r for r in rules if r["type"] == "references"]

    out: DataFrame | None = None
    if row_rules:
        aggs = [
            F.count(F.lit(1)).cast("bigint").alias("_n_rows")
        ] + [
            F.sum(_violation_expr(r).cast("bigint"))
            .cast("bigint")
            .alias(f"_v{i}")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{_rule_name(r)}', _v{i}" for i, r in enumerate(row_rules)
        )
        out = wide.selectExpr(
            f"stack({len(row_rules)}, {stack}) AS (rule, n_violations)",
            "_n_rows AS n_rows",
        )
    for r in uniq_rules:
        keys = [F.col(c) for c in r["cols"]]
        all_keys_set = F.lit(True)
        for c in r["cols"]:
            all_keys_set = all_keys_set & F.col(c).isNotNull()
        dupes = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(
                F.lit(_rule_name(r)).alias("rule"),
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("_c") > 1) & all_keys_set,
                            F.col("_c") - 1,
                        )
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_violations"),
                F.sum("_c").cast("bigint").alias("n_rows"),
            )
        )
        out = dupes if out is None else out.unionByName(dupes)
    for r in ref_rules:
        fk = df.filter(F.col(r["col"]).isNotNull()).select(
            F.col(r["col"]).alias("_fk")
        )
        keys = r["to"].select(F.col(r["to_col"]).alias("_fk")).distinct()
        orphans = (
            fk.join(keys, "_fk", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(_rule_name(r)).alias("rule"),
                "n_violations",
            )
        )
        n_rows = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        ref_row = orphans.join(n_rows)
        out = ref_row if out is None else out.unionByName(ref_row)
    if out is None:
        raise ValueError("check_expectations: no rules given")
    return out.withColumn("passed", F.col("n_violations") == 0)
