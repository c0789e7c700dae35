"""Structural AST pattern matching (cortex_pattern parity:
internal/pattern/executor.go strictness tiers, ast-grep metavariable
semantics)."""

from __future__ import annotations

import pytest

from project_cortex_spark.operators.astpattern import (
    match_pattern_source,
    parse_pattern,
    pattern_search_ast,
)

SRC = '''\
import os

def helper(x):
    return os.path.join(x, "y")

class G:
    def greet(self, name, punct="!"):
        if name:
            return helper(name) + punct
        return name

def main():
    xs = []
    xs.append(1)
    xs.append(xs)
    g = G()
    return g.greet("hi")
'''


def _lines(pat, strict="smart"):
    return [(s, e) for s, e, _m, _b in
            match_pattern_source(pat, SRC, strictness=strict)]


def test_call_pattern_with_metavar():
    assert _lines("helper($X)") == [(9, 9)]


def test_attribute_call_pattern():
    assert sorted(_lines("$OBJ.append($X)")) == [(14, 14), (15, 15)]


def test_metavar_binding_consistency():
    # $X.append($X): receiver and argument must be the SAME expression
    assert _lines("$X.append($X)") == [(15, 15)]


def test_qualified_call():
    assert _lines("os.path.join($A, $B)") == [(4, 4)]


def test_function_def_with_multi_metavar():
    assert _lines("def $F(self, $$$): $$$") == [(7, 10)]
    assert len(_lines("def $F($$$): $$$")) == 3


def test_relaxed_matches_name_against_attribute():
    assert _lines("append($X)", "relaxed") == [(14, 14), (15, 15)]
    assert _lines("append($X)", "ast") == []  # strict: Name != Attribute


def test_statement_pattern():
    assert len(_lines("return $X")) == 4


def test_bindings_surface():
    ms = match_pattern_source("$OBJ.append($X)", SRC)
    b = ms[0][3]
    assert set(b) == {"OBJ", "X"}


def test_unparseable_pattern_raises():
    with pytest.raises(SyntaxError):
        parse_pattern("def (((")


def test_syntax_error_source_yields_no_matches():
    assert match_pattern_source("$X", "def oops(:") == []


def test_spark_operator(spark):
    files = spark.createDataFrame(
        [("demo.py", SRC), ("skip.go", "package x")],
        ["file_path", "content"],
    )
    rows = pattern_search_ast(files, "$OBJ.append($X)").collect()
    assert [(r["file_path"], r["start_line"]) for r in rows] == [
        ("demo.py", 14), ("demo.py", 15),
    ]
    assert all(r["n_bindings"] == 2 for r in rows)
