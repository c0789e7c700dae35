"""Repo-wide audit of the driver correctness contracts.

Two defect classes have produced driver-red rows despite locally-correct
engine results (VERDICT r2):

1. DuckDB ``sum(INTEGER)``/``sum(BIGINT)`` returns HUGEINT, which pandas
   coerces to float64, so the driver's value hash sees ``3.0`` vs Spark's
   ``3`` — hash mismatch on identical results.
2. LIST-typed output columns are unhashable for the driver's pandas
   sort/factorize canonicalizer (``TypeError: unhashable type: 'list'``).

This test runs every registered oracle through DuckDB's type checker
(``DESCRIBE`` — no data scanned) with views over the sf0.001 testdata and
fails on any output column of a forbidden type.  Any new oracle added to
``__spark_entry__.oracle_sql()`` is audited automatically.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402

FORBIDDEN_EXACT = {"HUGEINT", "UHUGEINT"}


def _forbidden(duck_type: str) -> bool:
    t = duck_type.upper()
    if t in FORBIDDEN_EXACT:
        return True
    # DuckDB prints list types as 'INTEGER[]', nested as 'STRUCT(...)'/'MAP(...)'
    return "[]" in t or t.startswith("STRUCT") or t.startswith("MAP(")


@pytest.fixture(scope="module")
def duck_views():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def test_no_oracle_emits_hugeint_or_list_columns(duck_views):
    oracles = entry.oracle_sql()
    assert oracles, "oracle_sql() returned nothing"
    bad: list[str] = []
    for name, sql in sorted(oracles.items()):
        try:
            desc = duck_views.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as exc:  # noqa: BLE001 - surface which oracle broke
            bad.append(f"{name}: DESCRIBE failed: {exc}")
            continue
        for col, duck_type, *_ in desc:
            if _forbidden(duck_type):
                bad.append(f"{name}.{col}: {duck_type}")
    assert not bad, (
        "oracle output columns with driver-hostile types "
        "(wrap integer sums in CAST(... AS BIGINT); serialize lists with "
        "array_to_string):\n  " + "\n  ".join(bad)
    )


_ROWS_ONLY_BY_DESIGN = {
    # structurally un-oracle-able (gaussian random-indexing composite),
    # with a driver-graded recall contract (see COVERAGE.md). r7
    # converted graph_pattern_search + pipeline_parse_entities to
    # golden-oracled fixed-corpus queries via the frozen snapshot
    # corpus (VERDICT r6 item 4).
    "search_semantic_lexical",
}


def test_rows_only_set_is_exactly_the_documented_one():
    """A query silently missing its oracle downgrades to a weak
    rows-only check — every such downgrade must be a documented
    design decision, not a registration typo."""
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert qs - oracles == _ROWS_ONLY_BY_DESIGN
    # orphan oracles (oracle key without a query) are dead weight
    assert oracles - qs == set()


def test_gate_head_is_the_first_fifty_registered_queries():
    """The driver gates the FIRST 50 keys in queries() dict order;
    _GATE_FIRST is the round's gate plan and must be exactly that
    prefix (a name drift here silently changes what gets driver
    evidence)."""
    keys = list(entry.queries())
    assert len(entry._GATE_FIRST) == 50
    assert keys[:50] == entry._GATE_FIRST
