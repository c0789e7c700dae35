"""As-of join: match each left row to the latest right row at-or-before
its timestamp, per key.

Spark has no ASOF JOIN (the reference has equi-joins only, SURVEY §2.3);
this is the canonical custom time-series operator a training-data /
event pipeline needs (join events to the prevailing config/model/rate
snapshot). DuckDB has a native ``ASOF JOIN``, which the oracle uses —
the two implementations share only semantics, not mechanics.

Implementation idiom (the one that scales): tag and UNION the two
inputs, sort within key by (time, side) so each right row precedes the
left rows it governs, and propagate the right payload forward with
``last_value(ignoreNulls)`` over an unbounded-preceding window. ONE
shuffle on the key — no per-row range probe, no broadcast of either
side, no skew beyond what the key distribution already has. Contrast
with the naive inequality join (O(|L|x|R|) per key) or per-row
subqueries (the SQLite shape): both collapse at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """left columns + right_payload of the as-of match (NULL if no right
    row precedes). ``strict=True`` matches strictly-before instead of
    at-or-before.

    Right rows must be unique per (key, time) — enforce upstream (the
    deterministic snapshot contract); duplicate right timestamps make
    every engine's as-of pick arbitrary.
    """
    lt, rt = F.col(left_time), F.col(right_time)
    l_tag = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_payload],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        rt.alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    # at equal time: side 0 (right) sorts first => left sees it (<=).
    # strict mode flips the tags so a left row precedes its own-time right.
    order = ["_t", "_side"] if not strict else ["_t", F.col("_side").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_payload
        ],
    )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col(f"_f_{c}").alias(f"right_{c}") for c in right_payload],
    )
    return out
