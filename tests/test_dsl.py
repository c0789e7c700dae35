"""DSL compiler correctness vs DuckDB oracle — covers SURVEY §2.2-§2.6:
every comparison operator, LIKE, IN, BETWEEN, IS NULL, nested and/or/not,
all four join types, every aggregate ±DISTINCT, groupBy+having, multi-key
orderBy, limit/offset."""

from __future__ import annotations

import pytest

from project_cortex_spark.dsl import QueryValidationError, compile_query
from project_cortex_spark.dsl.model import parse_query
from project_cortex_spark.dsl.validator import validate_query

from .conftest import assert_matches_oracle


def check(registry, duck, query, sql, ordered=False):
    df = compile_query(registry, query)
    assert_matches_oracle(df, duck, sql, ordered=ordered)


class TestFilters:
    def test_eq(self, registry, duck):
        check(
            registry,
            duck,
            {"from": "orders", "where": {"field": "o_orderstatus", "operator": "=", "value": "F"}},
            "SELECT * FROM orders WHERE o_orderstatus = 'F'",
        )

    def test_neq_gt_lte(self, registry, duck):
        q = {
            "from": "lineitem",
            "where": {
                "and": [
                    {"field": "l_returnflag", "operator": "!=", "value": "A"},
                    {"field": "l_quantity", "operator": ">", "value": 30},
                    {"field": "l_discount", "operator": "<=", "value": 0.05},
                ]
            },
        }
        check(
            registry,
            duck,
            q,
            "SELECT * FROM lineitem WHERE l_returnflag <> 'A' AND l_quantity > 30 AND l_discount <= 0.05",
        )

    def test_like_not_like(self, registry, duck):
        q = {
            "from": "part",
            "where": {
                "and": [
                    {"field": "p_name", "operator": "LIKE", "value": "%bolt%"},
                    {"field": "p_type", "operator": "NOT LIKE", "value": "SMALL%"},
                ]
            },
        }
        check(
            registry,
            duck,
            q,
            "SELECT * FROM part WHERE p_name LIKE '%bolt%' AND p_type NOT LIKE 'SMALL%'",
        )

    def test_in_not_in(self, registry, duck):
        q = {
            "from": "customer",
            "where": {
                "and": [
                    {"field": "c_mktsegment", "operator": "IN", "value": ["BUILDING", "MACHINERY"]},
                    {"field": "c_nationkey", "operator": "NOT IN", "value": [1, 2, 3]},
                ]
            },
        }
        check(
            registry,
            duck,
            q,
            "SELECT * FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY') AND c_nationkey NOT IN (1,2,3)",
        )

    def test_between(self, registry, duck):
        q = {
            "from": "orders",
            "where": {"field": "o_totalprice", "operator": "BETWEEN", "value": [1000, 5000]},
        }
        check(
            registry,
            duck,
            q,
            "SELECT * FROM orders WHERE o_totalprice >= 1000 AND o_totalprice <= 5000",
        )

    def test_nested_bool_tree(self, registry, duck):
        q = {
            "from": "lineitem",
            "where": {
                "or": [
                    {
                        "and": [
                            {"field": "l_returnflag", "operator": "=", "value": "R"},
                            {"field": "l_quantity", "operator": "<", "value": 10},
                        ]
                    },
                    {"not": {"field": "l_linestatus", "operator": "=", "value": "O"}},
                ]
            },
        }
        check(
            registry,
            duck,
            q,
            "SELECT * FROM lineitem WHERE (l_returnflag = 'R' AND l_quantity < 10) OR NOT (l_linestatus = 'O')",
        )

    def test_timestamp_compare(self, registry, duck):
        q = {
            "from": "orders",
            "where": {"field": "o_orderdate", "operator": ">=", "value": "1997-01-01"},
        }
        check(
            registry,
            duck,
            q,
            "SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'",
        )


class TestJoins:
    def test_inner_join(self, registry, duck):
        q = {
            "fields": ["orders.o_orderkey", "customer.c_name"],
            "from": "orders",
            "joins": [
                {
                    "table": "customer",
                    "type": "INNER",
                    "on": {"field": "orders.o_custkey", "operator": "=", "value": "customer.c_custkey"},
                }
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey",
        )

    def test_left_join(self, registry, duck):
        q = {
            "fields": ["customer.c_custkey", "orders.o_orderkey"],
            "from": "customer",
            "joins": [
                {
                    "table": "orders",
                    "type": "LEFT",
                    "on": {"field": "customer.c_custkey", "operator": "=", "value": "orders.o_custkey"},
                }
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT c_custkey, o_orderkey FROM customer LEFT JOIN orders ON c_custkey = o_custkey",
        )

    def test_right_join(self, registry, duck):
        q = {
            "fields": ["supplier.s_name", "nation.n_name"],
            "from": "supplier",
            "joins": [
                {
                    "table": "nation",
                    "type": "RIGHT",
                    "on": {"field": "supplier.s_nationkey", "operator": "=", "value": "nation.n_nationkey"},
                }
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT s_name, n_name FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey",
        )

    def test_full_join(self, registry, duck):
        # The reference generates FULL but SQLite rejects it; Spark runs it.
        q = {
            "fields": ["supplier.s_suppkey", "nation.n_nationkey"],
            "from": "supplier",
            "joins": [
                {
                    "table": "nation",
                    "type": "FULL",
                    "on": {"field": "supplier.s_nationkey", "operator": "=", "value": "nation.n_nationkey"},
                }
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT s_suppkey, n_nationkey FROM supplier FULL JOIN nation ON s_nationkey = n_nationkey",
        )

    def test_semi_join(self, registry, duck):
        # beyond-parity: EXISTS shape; right side contributes no columns
        q = {
            "fields": ["c_custkey", "c_name"],
            "from": "customer",
            "joins": [
                {
                    "table": "orders",
                    "type": "SEMI",
                    "on": {"field": "customer.c_custkey", "operator": "=", "value": "orders.o_custkey"},
                }
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT c_custkey, c_name FROM customer "
            "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
        )

    def test_anti_join(self, registry, duck):
        # beyond-parity: NOT EXISTS shape
        q = {
            "fields": ["c_custkey"],
            "from": "customer",
            "joins": [
                {
                    "table": "orders",
                    "type": "ANTI",
                    "on": {"field": "customer.c_custkey", "operator": "=", "value": "orders.o_custkey"},
                }
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT c_custkey FROM customer "
            "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
        )

    def test_join_with_composite_on(self, registry, duck):
        # ON with an extra literal predicate alongside the equi-key
        q = {
            "fields": ["orders.o_orderkey", "lineitem.l_linenumber"],
            "from": "orders",
            "joins": [
                {
                    "table": "lineitem",
                    "type": "INNER",
                    "on": {
                        "and": [
                            {"field": "orders.o_orderkey", "operator": "=", "value": "lineitem.l_orderkey"},
                            {"field": "lineitem.l_quantity", "operator": ">", "value": 45},
                        ]
                    },
                }
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT o_orderkey, l_linenumber FROM orders JOIN lineitem ON o_orderkey = l_orderkey AND l_quantity > 45",
        )


class TestAggregations:
    def test_count_star_group(self, registry, duck):
        q = {
            "from": "orders",
            "groupBy": ["o_orderstatus"],
            "aggregations": [{"function": "COUNT", "alias": "n"}],
        }
        check(
            registry,
            duck,
            q,
            "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
        )

    def test_all_aggs(self, registry, duck):
        q = {
            "from": "lineitem",
            "groupBy": ["l_returnflag", "l_linestatus"],
            "aggregations": [
                {"function": "COUNT", "alias": "n"},
                {"function": "COUNT", "field": "l_partkey", "alias": "n_part", "distinct": True},
                {"function": "SUM", "field": "l_quantity", "alias": "sum_qty"},
                {"function": "AVG", "field": "l_extendedprice", "alias": "avg_price"},
                {"function": "MIN", "field": "l_shipdate", "alias": "min_ship"},
                {"function": "MAX", "field": "l_discount", "alias": "max_disc"},
            ],
        }
        check(
            registry,
            duck,
            q,
            """SELECT l_returnflag, l_linestatus, count(*) AS n,
                      count(DISTINCT l_partkey) AS n_part,
                      sum(l_quantity) AS sum_qty,
                      avg(l_extendedprice) AS avg_price,
                      min(l_shipdate) AS min_ship,
                      max(l_discount) AS max_disc
               FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        )

    def test_sum_avg_distinct(self, registry, duck):
        q = {
            "from": "lineitem",
            "groupBy": ["l_returnflag"],
            "aggregations": [
                {"function": "SUM", "field": "l_quantity", "alias": "sd", "distinct": True},
                {"function": "AVG", "field": "l_quantity", "alias": "ad", "distinct": True},
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT l_returnflag, sum(DISTINCT l_quantity) AS sd, avg(DISTINCT l_quantity) AS ad FROM lineitem GROUP BY l_returnflag",
        )

    def test_having(self, registry, duck):
        q = {
            "from": "orders",
            "groupBy": ["o_custkey"],
            "aggregations": [{"function": "COUNT", "alias": "n_orders"}],
            "having": {"field": "n_orders", "operator": ">", "value": 12},
        }
        check(
            registry,
            duck,
            q,
            "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey HAVING count(*) > 12",
        )

    def test_global_agg_no_group(self, registry, duck):
        q = {
            "from": "lineitem",
            "aggregations": [
                {"function": "SUM", "field": "l_extendedprice", "alias": "total"},
                {"function": "COUNT", "alias": "n"},
            ],
        }
        check(
            registry,
            duck,
            q,
            "SELECT sum(l_extendedprice) AS total, count(*) AS n FROM lineitem",
        )


class TestOrderLimit:
    def test_order_multi_key(self, registry, duck):
        q = {
            "fields": ["o_orderkey", "o_totalprice"],
            "from": "orders",
            "orderBy": [
                {"field": "o_orderstatus", "direction": "ASC"},
                {"field": "o_totalprice", "direction": "DESC"},
                {"field": "o_orderkey", "direction": "ASC"},
            ],
        }
        # ordered compare needs the sort keys in the output; restrict to a
        # deterministic projection
        q["fields"] = ["o_orderstatus", "o_totalprice", "o_orderkey"]
        check(
            registry,
            duck,
            q,
            "SELECT o_orderstatus, o_totalprice, o_orderkey FROM orders ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey",
            ordered=True,
        )

    def test_limit_offset(self, registry, duck):
        q = {
            "fields": ["o_orderkey"],
            "from": "orders",
            "orderBy": [{"field": "o_orderkey", "direction": "ASC"}],
            "limit": 20,
            "offset": 5,
        }
        check(
            registry,
            duck,
            q,
            "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 5",
            ordered=True,
        )


class TestValidation:
    def test_unknown_table(self, registry):
        with pytest.raises(QueryValidationError):
            compile_query(registry, {"from": "nope"})

    def test_unknown_join_type(self, registry):
        with pytest.raises(QueryValidationError):
            compile_query(
                registry,
                {
                    "from": "customer",
                    "joins": [
                        {
                            "table": "orders",
                            "type": "CROSS",
                            "on": {
                                "field": "customer.c_custkey",
                                "operator": "=",
                                "value": "orders.o_custkey",
                            },
                        }
                    ],
                },
            )

    def test_unknown_column(self, registry):
        with pytest.raises(QueryValidationError):
            compile_query(
                registry,
                {"from": "orders", "where": {"field": "bogus", "operator": "=", "value": 1}},
            )

    def test_injection_identifier(self, registry):
        with pytest.raises(QueryValidationError):
            compile_query(
                registry,
                {
                    "from": "orders",
                    "aggregations": [
                        {"function": "COUNT", "alias": "x; DROP TABLE orders"}
                    ],
                },
            )

    def test_limit_range(self, registry):
        with pytest.raises(QueryValidationError):
            compile_query(registry, {"from": "orders", "limit": 1001})
        with pytest.raises(QueryValidationError):
            compile_query(registry, {"from": "orders", "limit": 0})

    def test_in_requires_array(self, registry):
        with pytest.raises(QueryValidationError):
            validate_query(
                registry,
                parse_query(
                    {"from": "orders", "where": {"field": "o_orderkey", "operator": "IN", "value": 5}}
                ),
            )

    def test_between_requires_pair(self, registry):
        with pytest.raises(QueryValidationError):
            validate_query(
                registry,
                parse_query(
                    {
                        "from": "orders",
                        "where": {"field": "o_totalprice", "operator": "BETWEEN", "value": [1]},
                    }
                ),
            )

    def test_having_requires_aggregation(self, registry):
        with pytest.raises(QueryValidationError):
            compile_query(
                registry,
                {"from": "orders", "having": {"field": "o_orderkey", "operator": ">", "value": 1}},
            )


def test_window_running_avg_and_dense_rank_match_oracle(registry, duck):
    """The two window functions with no gated query of their own:
    RUNNING_AVG over an integer column (exact int sum / int count ->
    identical doubles) and DENSE_RANK (tie-collapsing rank)."""
    from pyspark.sql import functions as F

    from .conftest import assert_matches_oracle

    df = compile_query(
        registry,
        {
            "from": "part",
            "windows": [
                {
                    "function": "RUNNING_AVG",
                    "alias": "size_avg",
                    "field": "p_size",
                    "partitionBy": ["p_brand"],
                    "orderBy": [{"field": "p_partkey"}],
                },
                {
                    "function": "DENSE_RANK",
                    "alias": "size_drank",
                    "partitionBy": ["p_brand"],
                    "orderBy": [{"field": "p_size"}],
                },
            ],
            "fields": ["p_brand", "p_partkey", "size_avg", "size_drank"],
        },
    )
    assert_matches_oracle(
        df.withColumn("size_avg", F.round("size_avg", 6)),
        duck,
        """SELECT p_brand, p_partkey,
                  round(avg(p_size) OVER (PARTITION BY p_brand
                    ORDER BY p_partkey), 6) AS size_avg,
                  CAST(dense_rank() OVER (PARTITION BY p_brand
                    ORDER BY p_size) AS INT) AS size_drank
           FROM part""",
    )


_WIN_OK = {
    "function": "ROW_NUMBER",
    "alias": "rn",
    "partitionBy": ["o_custkey"],
    "orderBy": [{"field": "o_orderkey"}],
}


class TestWindowValidation:
    """P11-style pre-plan rejection for the windows/qualify clauses."""

    def _q(self, registry, **over):
        q = {"from": "orders", "windows": [dict(_WIN_OK, **over)]}
        return compile_query(registry, q)

    def test_unknown_function(self, registry):
        with pytest.raises(QueryValidationError, match="window function"):
            self._q(registry, function="NTILE")

    def test_requires_order_by(self, registry):
        with pytest.raises(QueryValidationError, match="orderBy"):
            self._q(registry, orderBy=[])

    def test_unknown_partition_column(self, registry):
        with pytest.raises(QueryValidationError):
            self._q(registry, partitionBy=["bogus"])

    def test_unknown_order_column(self, registry):
        with pytest.raises(QueryValidationError):
            self._q(registry, orderBy=[{"field": "bogus"}])

    def test_injection_alias(self, registry):
        with pytest.raises(QueryValidationError, match="alias"):
            self._q(registry, alias="x; DROP TABLE orders")

    def test_duplicate_alias(self, registry):
        with pytest.raises(QueryValidationError, match="duplicate"):
            compile_query(
                registry,
                {"from": "orders", "windows": [_WIN_OK, dict(_WIN_OK)]},
            )

    def test_rank_takes_no_field(self, registry):
        with pytest.raises(QueryValidationError, match="takes no field"):
            self._q(registry, function="RANK", field="o_totalprice")

    def test_lag_requires_field(self, registry):
        with pytest.raises(QueryValidationError, match="requires a field"):
            self._q(registry, function="LAG")

    def test_offset_only_for_lag_lead(self, registry):
        with pytest.raises(QueryValidationError, match="takes no offset"):
            self._q(registry, offset=2)

    def test_offset_must_be_positive_int(self, registry):
        with pytest.raises(QueryValidationError, match="offset"):
            self._q(registry, function="LAG", field="o_totalprice", offset=0)

    def test_qualify_requires_windows(self, registry):
        with pytest.raises(QueryValidationError, match="qualify"):
            compile_query(
                registry,
                {
                    "from": "orders",
                    "qualify": {"field": "o_orderkey", "operator": "<=", "value": 3},
                },
            )

    def test_windows_exclusive_with_aggregations(self, registry):
        with pytest.raises(QueryValidationError, match="aggregations"):
            compile_query(
                registry,
                {
                    "from": "orders",
                    "windows": [_WIN_OK],
                    "aggregations": [{"function": "COUNT", "alias": "n"}],
                },
            )

    def test_qualify_sees_window_alias(self, registry):
        df = compile_query(
            registry,
            {
                "from": "orders",
                "windows": [_WIN_OK],
                "qualify": {"field": "rn", "operator": "<=", "value": 2},
                "fields": ["o_custkey", "o_orderkey", "rn"],
            },
        )
        rows = df.collect()
        assert rows and all(r["rn"] <= 2 for r in rows)
        assert set(df.columns) == {"o_custkey", "o_orderkey", "rn"}
