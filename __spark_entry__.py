"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2;
each callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

Column names are aliased identically on both sides so the driver's
sorted-by-name value hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from project_cortex_spark.dsl import compile_query
from project_cortex_spark.sources.registry import load_tables

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_REGISTRY_CACHE: dict[tuple[int, str], object] = {}


def _registry(spark: SparkSession, sf_dir: str):
    key = (id(spark), sf_dir)
    if key not in _REGISTRY_CACHE:
        _REGISTRY_CACHE[key] = load_tables(spark, sf_dir)
    return _REGISTRY_CACHE[key]


def _dsl(query: dict) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return compile_query(_registry(spark, sf_dir), query)

    return run


# ---------------------------------------------------------------------------
# DSL queries (SURVEY §2.2-§2.6) — cortex_files parity over the synthetic
# tables; the DSL is schema-agnostic (reference registry is a table->cols
# map, internal/files/schema.go:28-179)
# ---------------------------------------------------------------------------

_DSL_QUERIES: dict[str, tuple[dict, str]] = {
    # P2/P7: comparison ops + nested boolean tree
    "dsl_filter_bool_tree": (
        {
            "from": "lineitem",
            "fields": ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
            "where": {
                "or": [
                    {
                        "and": [
                            {"field": "l_returnflag", "operator": "=", "value": "R"},
                            {"field": "l_quantity", "operator": ">=", "value": 30},
                        ]
                    },
                    {
                        "not": {
                            "field": "l_linestatus",
                            "operator": "!=",
                            "value": "F",
                        }
                    },
                ]
            },
        },
        """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
           FROM lineitem
           WHERE (l_returnflag = 'R' AND l_quantity >= 30)
              OR NOT (l_linestatus <> 'F')""",
    ),
    # P3: LIKE / NOT LIKE
    "dsl_like": (
        {
            "from": "part",
            "fields": ["p_partkey", "p_name", "p_type"],
            "where": {
                "and": [
                    {"field": "p_name", "operator": "LIKE", "value": "%bolt%"},
                    {"field": "p_type", "operator": "NOT LIKE", "value": "SMALL%"},
                ]
            },
        },
        """SELECT p_partkey, p_name, p_type FROM part
           WHERE p_name LIKE '%bolt%' AND p_type NOT LIKE 'SMALL%'""",
    ),
    # P4: IN / NOT IN
    "dsl_in": (
        {
            "from": "customer",
            "fields": ["c_custkey", "c_mktsegment", "c_nationkey"],
            "where": {
                "and": [
                    {
                        "field": "c_mktsegment",
                        "operator": "IN",
                        "value": ["BUILDING", "MACHINERY", "AUTOMOBILE"],
                    },
                    {"field": "c_nationkey", "operator": "NOT IN", "value": [0, 1, 2]},
                ]
            },
        },
        """SELECT c_custkey, c_mktsegment, c_nationkey FROM customer
           WHERE c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE')
             AND c_nationkey NOT IN (0,1,2)""",
    ),
    # P6: BETWEEN (+ timestamp comparison)
    "dsl_between_dates": (
        {
            "from": "orders",
            "fields": ["o_orderkey", "o_orderdate", "o_totalprice"],
            "where": {
                "and": [
                    {
                        "field": "o_orderdate",
                        "operator": "BETWEEN",
                        "value": ["1996-01-01", "1997-06-30"],
                    },
                    {"field": "o_totalprice", "operator": ">", "value": 100000},
                ]
            },
        },
        """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate <= TIMESTAMP '1997-06-30'
             AND o_totalprice > 100000""",
    ),
    # J1 INNER + composite ON (equi key + residual predicate)
    "dsl_join_inner": (
        {
            "from": "orders",
            "fields": ["orders.o_orderkey", "customer.c_name", "customer.c_mktsegment"],
            "joins": [
                {
                    "table": "customer",
                    "type": "INNER",
                    "on": {
                        "field": "orders.o_custkey",
                        "operator": "=",
                        "value": "customer.c_custkey",
                    },
                }
            ],
            "where": {"field": "o_orderstatus", "operator": "=", "value": "F"},
        },
        """SELECT o_orderkey, c_name, c_mktsegment
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE o_orderstatus = 'F'""",
    ),
    # J1 LEFT
    "dsl_join_left": (
        {
            "from": "customer",
            "fields": ["customer.c_custkey", "orders.o_orderkey"],
            "joins": [
                {
                    "table": "orders",
                    "type": "LEFT",
                    "on": {
                        "field": "customer.c_custkey",
                        "operator": "=",
                        "value": "orders.o_custkey",
                    },
                }
            ],
        },
        """SELECT c_custkey, o_orderkey
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey""",
    ),
    # J1 FULL — executes in Spark (reference's SQLite could not)
    "dsl_join_full": (
        {
            "from": "supplier",
            "fields": ["supplier.s_suppkey", "nation.n_nationkey", "nation.n_name"],
            "joins": [
                {
                    "table": "nation",
                    "type": "FULL",
                    "on": {
                        "field": "supplier.s_nationkey",
                        "operator": "=",
                        "value": "nation.n_nationkey",
                    },
                }
            ],
        },
        """SELECT s_suppkey, n_nationkey, n_name
           FROM supplier FULL JOIN nation ON s_nationkey = n_nationkey""",
    ),
    # A1-A7: every aggregate ± DISTINCT, multi-col groupBy
    "dsl_agg_full": (
        {
            "from": "lineitem",
            "groupBy": ["l_returnflag", "l_linestatus"],
            "aggregations": [
                {"function": "COUNT", "alias": "n"},
                {
                    "function": "COUNT",
                    "field": "l_partkey",
                    "alias": "n_parts",
                    "distinct": True,
                },
                {"function": "SUM", "field": "l_quantity", "alias": "sum_qty"},
                {"function": "AVG", "field": "l_extendedprice", "alias": "avg_price"},
                {"function": "MIN", "field": "l_shipdate", "alias": "min_ship"},
                {"function": "MAX", "field": "l_discount", "alias": "max_disc"},
            ],
        },
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
                  count(DISTINCT l_partkey) AS n_parts,
                  sum(l_quantity) AS sum_qty,
                  avg(l_extendedprice) AS avg_price,
                  min(l_shipdate) AS min_ship,
                  max(l_discount) AS max_disc
           FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    ),
    # A6: HAVING on aggregate alias
    "dsl_agg_having": (
        {
            "from": "orders",
            "groupBy": ["o_custkey"],
            "aggregations": [
                {"function": "COUNT", "alias": "n_orders"},
                {"function": "SUM", "field": "o_totalprice", "alias": "spend"},
            ],
            "having": {"field": "n_orders", "operator": ">", "value": 10},
        },
        """SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
           FROM orders GROUP BY o_custkey HAVING count(*) > 10""",
    ),
    # join + group by + having + order: the flagship composite
    "dsl_revenue_by_nation": (
        {
            "from": "orders",
            "joins": [
                {
                    "table": "customer",
                    "type": "INNER",
                    "on": {
                        "field": "orders.o_custkey",
                        "operator": "=",
                        "value": "customer.c_custkey",
                    },
                },
                {
                    "table": "nation",
                    "type": "INNER",
                    "on": {
                        "field": "customer.c_nationkey",
                        "operator": "=",
                        "value": "nation.n_nationkey",
                    },
                },
            ],
            "groupBy": ["nation.n_name"],
            "aggregations": [
                {"function": "SUM", "field": "o_totalprice", "alias": "revenue"},
                {"function": "COUNT", "alias": "n_orders"},
            ],
            "orderBy": [
                {"field": "revenue", "direction": "DESC"},
                {"field": "n_name", "direction": "ASC"},
            ],
        },
        """SELECT n_name, sum(o_totalprice) AS revenue, count(*) AS n_orders
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name ORDER BY revenue DESC, n_name""",
    ),
    # O1/O2: multi-key order + limit + offset
    "dsl_order_limit_offset": (
        {
            "from": "orders",
            "fields": ["o_orderkey", "o_orderstatus", "o_totalprice"],
            "orderBy": [
                {"field": "o_orderstatus", "direction": "ASC"},
                {"field": "o_totalprice", "direction": "DESC"},
                {"field": "o_orderkey", "direction": "ASC"},
            ],
            "limit": 50,
            "offset": 10,
        },
        """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
           ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey
           LIMIT 50 OFFSET 10""",
    ),
}


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation through a
    3-table join + aggregation, compiled from the JSON DSL."""
    return _dsl(_DSL_QUERIES["dsl_revenue_by_nation"][0])(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (query, _sql) in _DSL_QUERIES.items():
        out[name] = _dsl(query)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_q, sql) in _DSL_QUERIES.items()}
