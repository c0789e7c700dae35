"""JSON query DSL model — the ``cortex_files`` query surface.

Mirrors the reference's query schema (a discriminated-union filter tree
plus from/fields/joins/groupBy/having/orderBy/limit/offset/aggregations):
/root/reference/internal/files/types.go:17-107 (operators, join types,
aggregation functions) and types.go:270-281 (QueryDefinition shape).

The model is deliberately plain dataclasses parsed from ``dict`` — the
public API accepts the same JSON a cortex_files MCP client would send.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union

COMPARISON_OPERATORS = {
    "=",
    "!=",
    ">",
    ">=",
    "<",
    "<=",
    "LIKE",
    "NOT LIKE",
    "IN",
    "NOT IN",
    "IS NULL",
    "IS NOT NULL",
    "BETWEEN",
}
# Operators that take no value operand (types.go:44-47).
NO_VALUE_OPERATORS = {"IS NULL", "IS NOT NULL"}

# INNER/LEFT/RIGHT/FULL mirror the reference (types.go:49-55); SEMI and
# ANTI are a beyond-parity extension (EXISTS / NOT EXISTS shapes — the
# right side filters the left and contributes no columns), compiled to
# Spark's native left_semi / left_anti hash joins.
JOIN_TYPES = {"INNER", "LEFT", "RIGHT", "FULL", "SEMI", "ANTI"}
AGG_FUNCTIONS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}
SORT_DIRECTIONS = {"ASC", "DESC"}

# Window surface (beyond parity — the reference has no window functions,
# types.go has no such clause; every analytics user of a 100 TB engine
# hits "top-N per group" immediately). RUNNING_* use each engine's
# DEFAULT cumulative frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW —
# peers included), so ties cannot diverge between engines.
WINDOW_FUNCTIONS = {
    "ROW_NUMBER",
    "RANK",
    "DENSE_RANK",
    "LAG",
    "LEAD",
    "RUNNING_SUM",
    "RUNNING_AVG",
}
# These take a value field (and LAG/LEAD an optional offset >= 1).
VALUE_WINDOW_FUNCTIONS = {"LAG", "LEAD", "RUNNING_SUM", "RUNNING_AVG"}
OFFSET_WINDOW_FUNCTIONS = {"LAG", "LEAD"}

# Limits from the reference validator (internal/files/validator.go:159-160).
MAX_LIMIT = 1000
MIN_LIMIT = 1


@dataclass
class FieldFilter:
    field: str
    operator: str
    value: Any = None


@dataclass
class AndFilter:
    and_: list["Filter"]


@dataclass
class OrFilter:
    or_: list["Filter"]


@dataclass
class NotFilter:
    not_: "Filter"


Filter = Union[FieldFilter, AndFilter, OrFilter, NotFilter]


@dataclass
class Join:
    table: str
    type: str
    on: Filter


@dataclass
class Aggregation:
    function: str
    alias: str
    field: Optional[str] = None
    distinct: bool = False


@dataclass
class OrderBy:
    field: str
    direction: str = "ASC"


@dataclass
class WindowSpec:
    """One entry of the ``windows:`` clause: a named window column."""

    function: str
    alias: str
    partition_by: list[str] = field(default_factory=list)
    order_by: list[OrderBy] = field(default_factory=list)
    field: Optional[str] = None
    offset: Optional[int] = None


@dataclass
class QueryDefinition:
    from_: str
    fields: list[str] = field(default_factory=list)
    where: Optional[Filter] = None
    joins: list[Join] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    having: Optional[Filter] = None
    order_by: list[OrderBy] = field(default_factory=list)
    limit: Optional[int] = None
    offset: Optional[int] = None
    aggregations: list[Aggregation] = field(default_factory=list)
    windows: list[WindowSpec] = field(default_factory=list)
    # post-window filter (SQL QUALIFY / the top-N-per-group subquery):
    # may reference window aliases; only valid alongside ``windows``
    qualify: Optional[Filter] = None


def parse_filter(obj: Any) -> Filter:
    """Parse the discriminated union: {and:[..]} | {or:[..]} | {not:..} |
    {field, operator, value?} — same key-sniffing dispatch as the
    reference's Filter.UnmarshalJSON (types.go:218-260)."""
    if not isinstance(obj, dict):
        raise ValueError(f"filter must be a JSON object, got {type(obj).__name__}")
    if "and" in obj:
        return AndFilter([parse_filter(f) for f in obj["and"]])
    if "or" in obj:
        return OrFilter([parse_filter(f) for f in obj["or"]])
    if "not" in obj:
        return NotFilter(parse_filter(obj["not"]))
    if "field" not in obj or "operator" not in obj:
        raise ValueError(f"field filter requires 'field' and 'operator': {obj!r}")
    return FieldFilter(
        field=obj["field"], operator=obj["operator"], value=obj.get("value")
    )


def parse_query(obj: dict[str, Any]) -> QueryDefinition:
    """Parse a query dict (the cortex_files JSON body) into the model."""
    if not isinstance(obj, dict):
        raise ValueError("query must be a JSON object")
    if "from" not in obj:
        raise ValueError("query requires 'from'")
    return QueryDefinition(
        from_=obj["from"],
        fields=list(obj.get("fields") or []),
        where=parse_filter(obj["where"]) if obj.get("where") is not None else None,
        joins=[
            Join(table=j["table"], type=j.get("type", "INNER"), on=parse_filter(j["on"]))
            for j in (obj.get("joins") or [])
        ],
        group_by=list(obj.get("groupBy") or []),
        having=parse_filter(obj["having"]) if obj.get("having") is not None else None,
        order_by=[
            OrderBy(field=o["field"], direction=o.get("direction", "ASC"))
            for o in (obj.get("orderBy") or [])
        ],
        limit=obj.get("limit"),
        offset=obj.get("offset"),
        aggregations=[
            Aggregation(
                function=a["function"],
                alias=a["alias"],
                field=a.get("field"),
                distinct=bool(a.get("distinct", False)),
            )
            for a in (obj.get("aggregations") or [])
        ],
        windows=[
            WindowSpec(
                function=w["function"],
                alias=w["alias"],
                partition_by=list(w.get("partitionBy") or []),
                order_by=[
                    OrderBy(field=o["field"], direction=o.get("direction", "ASC"))
                    for o in (w.get("orderBy") or [])
                ],
                field=w.get("field"),
                offset=w.get("offset"),
            )
            for w in (obj.get("windows") or [])
        ],
        qualify=(
            parse_filter(obj["qualify"])
            if obj.get("qualify") is not None
            else None
        ),
    )
