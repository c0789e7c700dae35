"""JSON query DSL -> DataFrame compiler (the ``cortex_files`` engine).

The reference translates the JSON body to a SQL string with Squirrel and
lets SQLite execute it (/root/reference/internal/files/translator.go:12-93).
Here the same JSON compiles straight to a **declarative DataFrame plan**,
so Catalyst applies predicate pushdown, column pruning, join selection
(broadcast vs sort-merge via AQE) and partition pruning — optimizations
the reference delegates to SQLite's planner, but which matter enormously
at 100 TB: a `where` on a partition column prunes files before any I/O,
and narrow `fields` lists reach the parquet reader as ReadSchema.

Semantic notes vs the reference:
  * FULL OUTER JOIN actually executes (SQLite rejects it; the reference
    documents the failure path, translator.go:232-234). Improvement kept.
  * Join ON clauses: a string value of the form ``table.column`` naming a
    column of an in-scope table is a column reference (the spec's join
    example compares files.file_path to "types.file_path"); anything else
    is a literal.
  * NULL comparison semantics are SQL ternary (Spark and SQLite agree).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .model import (
    Aggregation,
    AndFilter,
    FieldFilter,
    Filter,
    NotFilter,
    OrFilter,
    QueryDefinition,
    WindowSpec,
    parse_query,
)
from .validator import _Scope, validate_query


def _filter_to_column(f: Filter, scope: _Scope, in_join_on: bool) -> Column:
    """Recursive filter tree -> Column expr (translator.go:96-144 analogue)."""
    if isinstance(f, AndFilter):
        out = _filter_to_column(f.and_[0], scope, in_join_on)
        for sub in f.and_[1:]:
            out = out & _filter_to_column(sub, scope, in_join_on)
        return out
    if isinstance(f, OrFilter):
        out = _filter_to_column(f.or_[0], scope, in_join_on)
        for sub in f.or_[1:]:
            out = out | _filter_to_column(sub, scope, in_join_on)
        return out
    if isinstance(f, NotFilter):
        return ~_filter_to_column(f.not_, scope, in_join_on)
    assert isinstance(f, FieldFilter)
    return _field_filter_to_column(f, scope, in_join_on)


def _operand(value: Any, scope: _Scope, in_join_on: bool) -> Column:
    """RHS operand: column ref inside join ON when it names a column."""
    if in_join_on and isinstance(value, str) and scope.is_column_ref(value):
        return F.col(value)
    return F.lit(value)


def _field_filter_to_column(f: FieldFilter, scope: _Scope, in_join_on: bool) -> Column:
    col = F.col(f.field)
    op = f.operator
    if op == "IS NULL":
        return col.isNull()
    if op == "IS NOT NULL":
        return col.isNotNull()
    if op == "IN":
        return col.isin([v for v in f.value])
    if op == "NOT IN":
        return ~col.isin([v for v in f.value])
    if op == "BETWEEN":
        lo, hi = f.value
        return (col >= F.lit(lo)) & (col <= F.lit(hi))
    if op == "LIKE":
        return col.like(f.value)
    if op == "NOT LIKE":
        return ~col.like(f.value)
    rhs = _operand(f.value, scope, in_join_on)
    if op == "=":
        return col == rhs
    if op == "!=":
        return col != rhs
    if op == ">":
        return col > rhs
    if op == ">=":
        return col >= rhs
    if op == "<":
        return col < rhs
    if op == "<=":
        return col <= rhs
    raise ValueError(f"unknown operator: {op!r}")  # pragma: no cover


def _agg_expr(a: Aggregation) -> Column:
    """Aggregation -> Column (translator.go buildAggregation analogue).

    Identifiers were validated, so the F.expr forms are injection-safe.
    """
    if a.function == "COUNT":
        if a.field is None:
            expr = F.count(F.lit(1))
        elif a.distinct:
            expr = F.countDistinct(F.col(a.field))
        else:
            expr = F.count(F.col(a.field))
    elif a.distinct:
        # SUM/AVG DISTINCT: no dedicated python builder for avg — use expr
        expr = F.expr(f"{a.function.lower()}(DISTINCT {a.field})")
    elif a.function == "SUM":
        expr = F.sum(F.col(a.field))
    elif a.function == "AVG":
        expr = F.avg(F.col(a.field))
    elif a.function == "MIN":
        expr = F.min(F.col(a.field))
    elif a.function == "MAX":
        expr = F.max(F.col(a.field))
    else:  # pragma: no cover
        raise ValueError(f"unknown aggregation: {a.function!r}")
    return expr.alias(a.alias)


def _window_expr(w: WindowSpec) -> Column:
    """WindowSpec -> Column. Default cumulative frames only (RANGE
    UNBOUNDED PRECEDING..CURRENT ROW with ORDER BY — identical in Spark
    and ANSI SQL, peers included), so RUNNING_* replay exactly in the
    oracle; rank/offset functions ignore frames entirely."""
    ordering = [
        F.col(o.field).asc() if o.direction == "ASC" else F.col(o.field).desc()
        for o in w.order_by
    ]
    if w.partition_by:
        spec = Window.partitionBy(
            *[F.col(c) for c in w.partition_by]
        ).orderBy(*ordering)
    else:
        spec = Window.orderBy(*ordering)
    if w.function == "ROW_NUMBER":
        expr = F.row_number()
    elif w.function == "RANK":
        expr = F.rank()
    elif w.function == "DENSE_RANK":
        expr = F.dense_rank()
    elif w.function == "LAG":
        expr = F.lag(F.col(w.field), w.offset or 1)
    elif w.function == "LEAD":
        expr = F.lead(F.col(w.field), w.offset or 1)
    elif w.function == "RUNNING_SUM":
        expr = F.sum(F.col(w.field))
    elif w.function == "RUNNING_AVG":
        expr = F.avg(F.col(w.field))
    else:  # pragma: no cover
        raise ValueError(f"unknown window function: {w.function!r}")
    return expr.over(spec)


def compile_query(registry, query: dict[str, Any] | QueryDefinition) -> DataFrame:
    """Compile a cortex_files JSON query into a (lazy) DataFrame plan.

    SQL clause ordering is honored: FROM/JOIN -> WHERE -> GROUP BY/agg ->
    HAVING -> windows -> QUALIFY -> SELECT -> ORDER BY -> OFFSET/LIMIT.
    """
    qd = query if isinstance(query, QueryDefinition) else parse_query(query)
    validate_query(registry, qd)
    scope = _Scope(registry, qd)

    df = registry.table(qd.from_).alias(qd.from_)

    # JOINs. The join condition compiles to a Column expression over the
    # aliased frames; Catalyst extracts equi-keys for hash joins and AQE
    # converts to broadcast when the built side is small.
    for j in qd.joins:
        other = registry.table(j.table).alias(j.table)
        cond = _filter_to_column(j.on, scope, in_join_on=True)
        df = df.join(other, cond, j.type.lower())

    if qd.where is not None:
        df = df.filter(_filter_to_column(qd.where, scope, in_join_on=False))

    if qd.aggregations:
        aggs = [_agg_expr(a) for a in qd.aggregations]
        if qd.group_by:
            df = df.groupBy(*[F.col(g) for g in qd.group_by]).agg(*aggs)
        else:
            df = df.agg(*aggs)
        if qd.having is not None:
            df = df.filter(_filter_to_column(qd.having, scope, in_join_on=False))
        # reference: select list = groupBy cols + agg aliases (translator.go:26-35)
        out_cols = [g.split(".")[-1] for g in qd.group_by] + [
            a.alias for a in qd.aggregations
        ]
        df = df.select(*out_cols)
    elif qd.windows:
        # windows append named columns (SQL SELECT-clause computation);
        # qualify is the post-window filter (SQL QUALIFY, or the
        # subquery-then-filter shape in ANSI engines). Catalyst fuses
        # same-(partition, order) windows into one Window node, so
        # top-N-per-group costs exactly one shuffle on the partition key
        # at 100 TB — never a self-join.
        for w in qd.windows:
            df = df.withColumn(w.alias, _window_expr(w))
        if qd.qualify is not None:
            df = df.filter(
                _filter_to_column(qd.qualify, scope, in_join_on=False)
            )
        if qd.fields:
            df = df.select(*[F.col(f) for f in qd.fields])
    elif qd.fields:
        df = df.select(*[F.col(f) for f in qd.fields])

    if qd.order_by:
        df = df.orderBy(
            *[
                F.col(o.field).asc() if o.direction == "ASC" else F.col(o.field).desc()
                for o in qd.order_by
            ]
        )

    # LIMIT n OFFSET m semantics: skip m rows, then take n.
    if qd.offset:
        df = df.offset(qd.offset)
    if qd.limit is not None:
        df = df.limit(qd.limit)

    return df
