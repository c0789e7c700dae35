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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _time_us(col: Column, dtype) -> Column:
    """Numeric form of a time column: integer micros for timestamps,
    the column's own units for numerics (pandas tolerance semantics)."""
    from pyspark.sql.types import TimestampType

    if isinstance(dtype, TimestampType):
        return F.unix_micros(col)
    return col.cast("long")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_payload: list[str],
    strict: bool = False,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """left columns + right_payload of the as-of match (NULL if none).
    ``direction="backward"`` (default) matches the latest right row
    at-or-before the left time; ``"forward"`` matches the earliest right
    row at-or-after it; ``"nearest"`` matches whichever of the two is
    closer in absolute time, ties to backward (pandas ``merge_asof``
    semantics). ``strict=True`` excludes the equal-time match.
    ``tolerance_us`` bounds the match's staleness (pandas
    ``merge_asof(tolerance=...)`` semantics): a match further away than
    that is nulled, not dropped — microseconds for timestamp time
    columns, the column's own units for numeric ones.

    ``nearest`` costs the same single shuffle as the directional forms:
    both candidate fills are RANGE-frame window functions over one sort
    on (key, numeric time) — the frames (strictly-before / strictly- or
    at-or-after) make the side-tag tie ordering irrelevant, so one
    ordering serves both directions and strictness is a frame bound,
    not a sort flip.

    Right rows must be unique per (key, time) — enforce upstream (the
    deterministic snapshot contract); duplicate right timestamps make
    every engine's as-of pick arbitrary.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        from pyspark.sql.types import FractionalType

        # nearest orders its RANGE frames on the integer time (_tm);
        # a float time column would silently truncate and make same-
        # integer-part rows frame peers (arbitrary pick, broken strict).
        # The directional forms sort by the exact value and stay fine.
        for side, col_name, df in (
            ("left", left_time, left), ("right", right_time, right)
        ):
            if isinstance(df.schema[col_name].dataType, FractionalType):
                raise ValueError(
                    "direction='nearest' needs an integer or timestamp "
                    f"time column; {side} time {col_name!r} is "
                    f"{df.schema[col_name].dataType.simpleString()} — "
                    "scale it to integer units first"
                )
    lt, rt = F.col(left_time), F.col(right_time)
    # The right payload rides as ONE struct column, so a single
    # last(ignorenulls) propagates the whole matched row atomically — a
    # per-column fill would back-fill a NULL payload field from an OLDER
    # right row, fabricating a row that never existed (DuckDB's native
    # ASOF JOIN returns the matched row's NULL, and so do we). The
    # matched row's own time rides along as ``_rt`` for the
    # tolerance check.
    r_struct = F.struct(
        *[F.col(c).alias(c) for c in right_payload],
        rt.alias("_rt"),
    )
    r_struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_dtype = left.schema[left_time].dataType
    r_dtype = right.schema[right_time].dataType
    l_tag = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        _time_us(lt, l_dtype).alias("_tm"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        rt.alias("_t"),
        _time_us(rt, r_dtype).alias("_tm"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        r_struct.alias("_r"),
    )
    if direction == "nearest":
        base = Window.partitionBy("_k").orderBy(F.col("_tm").asc())
        wb = base.rangeBetween(
            Window.unboundedPreceding, -1 if strict else 0
        )
        wf = base.rangeBetween(
            1 if strict else 0, Window.unboundedFollowing
        )
        bf = F.last("_r", ignorenulls=True).over(wb)
        ff = F.first("_r", ignorenulls=True).over(wf)
        gap_b = F.col("_tm") - _time_us(bf["_rt"], r_dtype)
        gap_f = _time_us(ff["_rt"], r_dtype) - F.col("_tm")
        chosen = (
            F.when(bf.isNull(), ff)
            .when(ff.isNull(), bf)
            .when(gap_f < gap_b, ff)  # tie -> backward, pandas semantics
            .otherwise(bf)
        )
        filled = l_tag.unionByName(r_tag).select("*", chosen.alias("_f"))
        if tolerance_us is not None:
            near_gap = F.abs(
                F.col("_tm") - _time_us(F.col("_f")["_rt"], r_dtype)
            )
            filled = filled.withColumn(
                "_f", F.when(near_gap <= F.lit(tolerance_us), F.col("_f"))
            )
        return filled.filter(F.col("_side") == 1).select(
            *[F.col("_lrow")[c].alias(c) for c in left.columns],
            *[F.col("_f")[c].alias(f"right_{c}") for c in right_payload],
        )
    # Walk order: backward walks time ascending (a left row sees the
    # latest earlier right); forward walks time DESCENDING (a left row
    # sees the earliest later right). At equal time, side 0 (right)
    # sorts first so the left row sees it — unless strict, which flips
    # the tie so a left row precedes its own-time right.
    t_key = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    order = [t_key, F.col("_side").desc() if strict else F.col("_side").asc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f")
    )
    if tolerance_us is not None:
        gap = F.col("_tm") - _time_us(F.col("_f")["_rt"], r_dtype)
        if direction == "forward":
            gap = -gap
        filled = filled.withColumn(
            "_f", F.when(gap <= F.lit(tolerance_us), F.col("_f"))
        )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_f")[c].alias(f"right_{c}") for c in right_payload],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    point: str,
    start: str,
    end: str,
) -> DataFrame:
    """Keyed interval containment: point rows joined to the interval rows
    of the same key that contain them (start <= point <= end).

    With an equi key this is just a hash join plus a residual range
    predicate — Catalyst plans the shuffle on ``on`` and evaluates the
    range filter during the probe, so no special machinery is needed.
    The hard case is the KEYLESS range join; see
    :func:`range_join_bucketed`.
    """
    p, iv = points.alias("p"), intervals.alias("iv")
    cond = (
        (F.col(f"p.{on}") == F.col(f"iv.{on}"))
        & (F.col(f"p.{point}") >= F.col(f"iv.{start}"))
        & (F.col(f"p.{point}") <= F.col(f"iv.{end}"))
    )
    return p.join(iv, cond).select(
        "p.*", *[F.col(f"iv.{c}") for c in intervals.columns if c != on]
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    bucket_width: float,
) -> DataFrame:
    """Keyless interval containment without the cross product: both sides
    map to coarse buckets of ``bucket_width`` (intervals explode into
    every bucket they overlap), candidates meet in an equi-join on the
    bucket id, and the exact containment predicate filters the survivors.

    Cost: |points| + sum(interval_width/bucket_width) rows shuffled on
    the bucket key instead of |points| x |intervals| comparisons — the
    standard bucketing trick Spark's optimizer doesn't apply on its own.
    Pick ``bucket_width`` near the median interval width: much smaller
    explodes the interval side, much bigger fans candidates per bucket.
    """
    pb = points.withColumn(
        "_bucket", F.floor(F.col(point) / F.lit(bucket_width)).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(end) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    p, iv = pb.alias("p"), ib.alias("iv")
    out = p.join(iv, F.col("p._bucket") == F.col("iv._bucket")).filter(
        (F.col(f"p.{point}") >= F.col(f"iv.{start}"))
        & (F.col(f"p.{point}") <= F.col(f"iv.{end}"))
    )
    return out.select(
        *[F.col(f"p.{c}") for c in points.columns],
        *[F.col(f"iv.{c}") for c in intervals.columns],
    )
