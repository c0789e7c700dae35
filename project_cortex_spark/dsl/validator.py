"""Query validation against the live table registry.

The reference validates identifiers against a static schema registry and
an ``[A-Za-z_][A-Za-z0-9_]*`` identifier rule before any SQL is built
(/root/reference/internal/files/validator.go, translator.go:246-331,
schema.go:28-179). Here validation runs against the registry's actual
DataFrame schemas, so unknown tables/columns are rejected before a plan
is constructed — the same injection-safety property, enforced earlier.
"""

from __future__ import annotations

import re

from .model import (
    AGG_FUNCTIONS,
    COMPARISON_OPERATORS,
    JOIN_TYPES,
    MAX_LIMIT,
    MIN_LIMIT,
    NO_VALUE_OPERATORS,
    OFFSET_WINDOW_FUNCTIONS,
    SORT_DIRECTIONS,
    VALUE_WINDOW_FUNCTIONS,
    WINDOW_FUNCTIONS,
    AndFilter,
    FieldFilter,
    Filter,
    NotFilter,
    OrFilter,
    QueryDefinition,
)

IDENTIFIER_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class QueryValidationError(ValueError):
    pass


def _is_identifier(s: str) -> bool:
    return bool(s) and IDENTIFIER_RE.match(s) is not None


def _split_qualified(name: str) -> tuple[str | None, str]:
    """'table.column' -> (table, column); bare 'column' -> (None, column)."""
    if "." in name:
        table, _, column = name.partition(".")
        return table, column
    return None, name


class _Scope:
    """Tables visible to a query: FROM table + all joined tables."""

    def __init__(self, registry, qd: QueryDefinition):
        self.registry = registry
        self.tables: list[str] = [qd.from_] + [j.table for j in qd.joins]
        # aliases introduced by aggregations are valid in having/orderBy
        self.agg_aliases = {a.alias for a in qd.aggregations}
        # window aliases are valid in qualify/fields/orderBy (they only
        # exist once the windows clause has been validated)
        self.window_aliases = {w.alias for w in qd.windows}

    def check_column(self, name: str, allow_alias: bool = False) -> None:
        table, column = _split_qualified(name)
        if not _is_identifier(column) or (table is not None and not _is_identifier(table)):
            raise QueryValidationError(f"invalid identifier: {name!r}")
        if allow_alias and table is None and name in (
            self.agg_aliases | self.window_aliases
        ):
            return
        if table is not None:
            if table not in self.tables:
                raise QueryValidationError(
                    f"table {table!r} not in query scope {self.tables}"
                )
            if column not in self.registry.columns(table):
                raise QueryValidationError(f"unknown column {name!r}")
            return
        # bare column: must exist in at least one in-scope table
        for t in self.tables:
            if column in self.registry.columns(t):
                return
        raise QueryValidationError(
            f"unknown column {column!r} (scope: {self.tables})"
        )

    def is_column_ref(self, value: str) -> bool:
        """True when a string value in a join ON clause denotes a column of
        an in-scope table ('types.file_path' in the spec's join example)."""
        table, column = _split_qualified(value)
        return (
            table is not None
            and _is_identifier(table)
            and _is_identifier(column)
            and table in self.tables
            and table in self.registry
            and column in self.registry.columns(table)
        )


def _validate_filter(f: Filter, scope: _Scope, allow_alias: bool, in_join_on: bool) -> None:
    if isinstance(f, AndFilter):
        if not f.and_:
            raise QueryValidationError("AND filter requires at least one clause")
        for sub in f.and_:
            _validate_filter(sub, scope, allow_alias, in_join_on)
    elif isinstance(f, OrFilter):
        if not f.or_:
            raise QueryValidationError("OR filter requires at least one clause")
        for sub in f.or_:
            _validate_filter(sub, scope, allow_alias, in_join_on)
    elif isinstance(f, NotFilter):
        _validate_filter(f.not_, scope, allow_alias, in_join_on)
    elif isinstance(f, FieldFilter):
        if f.operator not in COMPARISON_OPERATORS:
            raise QueryValidationError(f"unknown operator: {f.operator!r}")
        scope.check_column(f.field, allow_alias=allow_alias)
        if f.operator in NO_VALUE_OPERATORS:
            if f.value is not None:
                raise QueryValidationError(f"{f.operator} takes no value")
        else:
            if f.value is None:
                raise QueryValidationError(f"{f.operator} requires a value")
            if f.operator in ("IN", "NOT IN") and not isinstance(f.value, (list, tuple)):
                raise QueryValidationError(f"{f.operator} requires an array value")
            if f.operator == "BETWEEN" and (
                not isinstance(f.value, (list, tuple)) or len(f.value) != 2
            ):
                raise QueryValidationError("BETWEEN requires an array of 2 values")
    else:  # pragma: no cover
        raise QueryValidationError(f"invalid filter node: {f!r}")


def validate_query(registry, qd: QueryDefinition) -> None:
    """Raise QueryValidationError unless qd is well-formed against registry."""
    if qd.from_ not in registry:
        raise QueryValidationError(f"unknown table: {qd.from_!r}")
    for j in qd.joins:
        if j.table not in registry:
            raise QueryValidationError(f"unknown join table: {j.table!r}")
        if j.type not in JOIN_TYPES:
            raise QueryValidationError(f"unknown join type: {j.type!r}")

    scope = _Scope(registry, qd)

    for f in qd.fields:
        # window aliases are selectable once declared (bool(qd.windows)
        # keeps the pre-windows behavior bit-identical: agg aliases were
        # never valid in fields and still are not — check_column only
        # admits names in the union when they exist, and window_aliases
        # is empty without a windows clause)
        scope.check_column(f, allow_alias=bool(qd.windows))
    for g in qd.group_by:
        scope.check_column(g)
    if qd.where is not None:
        _validate_filter(qd.where, scope, allow_alias=False, in_join_on=False)
    for j in qd.joins:
        _validate_filter(j.on, scope, allow_alias=False, in_join_on=True)
    if qd.having is not None:
        if not qd.aggregations:
            raise QueryValidationError("HAVING requires aggregations")
        _validate_filter(qd.having, scope, allow_alias=True, in_join_on=False)
    for o in qd.order_by:
        if o.direction not in SORT_DIRECTIONS:
            raise QueryValidationError(f"invalid sort direction: {o.direction!r}")
        scope.check_column(o.field, allow_alias=True)

    for a in qd.aggregations:
        if a.function not in AGG_FUNCTIONS:
            raise QueryValidationError(f"unknown aggregation: {a.function!r}")
        if not _is_identifier(a.alias):
            raise QueryValidationError(f"invalid aggregation alias: {a.alias!r}")
        if a.field is None:
            if a.function != "COUNT":
                raise QueryValidationError(f"{a.function} requires a field")
        else:
            scope.check_column(a.field)
    if qd.aggregations and qd.fields:
        # reference replaces the field list with groupBy+aggs (translator.go:26-35)
        pass

    if qd.windows and qd.aggregations:
        # window-over-aggregate needs alias scoping the JSON surface
        # does not define; keep the clauses orthogonal (run the
        # aggregate query, feed its result to a windowed query)
        raise QueryValidationError(
            "windows cannot be combined with aggregations"
        )
    seen_aliases: set[str] = set()
    for w in qd.windows:
        if w.function not in WINDOW_FUNCTIONS:
            raise QueryValidationError(
                f"unknown window function: {w.function!r}"
            )
        if not _is_identifier(w.alias):
            raise QueryValidationError(f"invalid window alias: {w.alias!r}")
        if w.alias in seen_aliases:
            raise QueryValidationError(f"duplicate window alias: {w.alias!r}")
        seen_aliases.add(w.alias)
        for c in w.partition_by:
            scope.check_column(c)
        if not w.order_by:
            raise QueryValidationError(
                f"window {w.alias!r} requires orderBy (every supported "
                "function is order-sensitive)"
            )
        for o in w.order_by:
            if o.direction not in SORT_DIRECTIONS:
                raise QueryValidationError(
                    f"invalid sort direction: {o.direction!r}"
                )
            scope.check_column(o.field)
        if w.function in VALUE_WINDOW_FUNCTIONS:
            if w.field is None:
                raise QueryValidationError(f"{w.function} requires a field")
            scope.check_column(w.field)
        elif w.field is not None:
            raise QueryValidationError(f"{w.function} takes no field")
        if w.offset is not None:
            if w.function not in OFFSET_WINDOW_FUNCTIONS:
                raise QueryValidationError(f"{w.function} takes no offset")
            if not isinstance(w.offset, int) or w.offset < 1:
                raise QueryValidationError(
                    f"window offset must be an integer >= 1, got {w.offset!r}"
                )
    if qd.qualify is not None:
        if not qd.windows:
            raise QueryValidationError("qualify requires windows")
        _validate_filter(qd.qualify, scope, allow_alias=True, in_join_on=False)

    if qd.limit is not None and not (MIN_LIMIT <= qd.limit <= MAX_LIMIT):
        raise QueryValidationError(
            f"limit must be between {MIN_LIMIT} and {MAX_LIMIT}, got {qd.limit}"
        )
    if qd.offset is not None and qd.offset < 0:
        raise QueryValidationError(f"offset must be >= 0, got {qd.offset}")
