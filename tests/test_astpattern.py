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


# ---------------------------------------------------------------------------
# token tier (Go / TS / JS / C-like) — VERDICT r5 item 4
# ---------------------------------------------------------------------------

from project_cortex_spark.operators.astpattern import (  # noqa: E402
    lex_clike,
    match_pattern_tokens,
    pattern_search_tokens,
)


class TestClikeLexer:
    def test_comments_and_strings_masked(self):
        toks = [t[0] for t in lex_clike(
            'x = "a // b {" // trailing\n/* block } */ y', )]
        assert toks == ["x", "=", '"a // b {"', "y"]

    def test_multichar_operators(self):
        toks = [t[0] for t in lex_clike("a := b <- c; d === e => f != g")]
        assert ":=" in toks and "<-" in toks and "===" in toks and "=>" in toks

    def test_raw_string_backtick(self):
        toks = [t[0] for t in lex_clike('s := `raw " { //`')]
        assert toks == ["s", ":=", '`raw " { //`']

    def test_hash_comments_opt_in(self):
        assert [t[0] for t in lex_clike("a # b", hash_comments=True)] == ["a"]
        assert "#" in [t[0] for t in lex_clike("a # b")]


class TestTokenMatcher:
    def test_go_if_with_multi(self):
        from project_cortex_spark.pipeline.fixtures import GO_SRC

        got = match_pattern_tokens("if $COND { $$$ }", GO_SRC)
        assert [(s, e, b) for s, e, _m, b in got] == [
            (32, 34, {"COND": "port <= 0"})
        ]

    def test_ts_if_parenthesized(self):
        from project_cortex_spark.pipeline.fixtures import TS_SRC

        got = match_pattern_tokens("if ($COND) { $$$ }", TS_SRC)
        assert [(s, b["COND"]) for s, _e, _m, b in got] == [
            (21, "this . items . length < LIMIT && item . id"),
            (29, "it . id === id"),
        ]

    def test_go_method_receiver_and_name_binding(self):
        from project_cortex_spark.pipeline.fixtures import GO_SRC

        got = match_pattern_tokens(
            "func ($R *Config) $NAME($$$) $RET {", GO_SRC
        )
        assert len(got) == 1
        b = got[0][3]
        assert b == {"R": "c", "NAME": "Addr", "RET": "string"}

    def test_repeated_metavar_must_bind_equal(self):
        src = "a.push(a); a.push(b);"
        got = match_pattern_tokens("$X.push($X)", src)
        assert len(got) == 1 and got[0][3] == {"X": "a"}

    def test_smart_skips_type_annotations(self):
        from project_cortex_spark.pipeline.fixtures import TS_SRC

        got = match_pattern_tokens(
            "function lookup($A, $B) { $$$ }", TS_SRC
        )
        assert len(got) == 1
        assert got[0][3] == {"A": "id", "B": "strict"}
        # ast tier takes tokens literally — the annotated source no
        # longer matches
        assert match_pattern_tokens(
            "function lookup($A, $B) { $$$ }", TS_SRC, strictness="ast"
        ) == []

    def test_smart_annotation_object_type_ambiguity(self):
        src = "function f(x: {a: number}, y): void { return; }"
        got = match_pattern_tokens("function f($A, $B) { $$$ }", src)
        assert len(got) == 1 and got[0][3] == {"A": "x", "B": "y"}

    def test_relaxed_dotted_prefix_single_match(self):
        got = match_pattern_tokens(
            "push($X)", "this.items.push(item);", strictness="relaxed"
        )
        assert [(m, b) for _s, _e, m, b in got] == [
            ("this.items.push(item)", {"X": "item"})
        ]
        # smart does NOT relax the name: it can still anchor on the bare
        # `push` token, but the matched span excludes the dotted prefix
        smart = match_pattern_tokens("push($X)", "this.items.push(item);")
        assert [m for _s, _e, m, _b in smart] == ["push(item)"]

    def test_multi_balances_nested_braces(self):
        src = "class A { m() { if (x) { y(); } } }"
        got = match_pattern_tokens("class $N { $$$ }", src)
        assert len(got) == 1
        assert got[0][2] == src.rstrip()

    def test_metavar_does_not_cross_commas_or_scope(self):
        got = match_pattern_tokens("f($A)", "f(x, y)")
        assert got == []  # $A is ONE argument; two-arg call needs $$$
        assert len(match_pattern_tokens("f($$$)", "f(x, y)")) == 1

    def test_spark_operator_language_routing(self, spark):
        from project_cortex_spark.pipeline.fixtures import MULTILANG_FILES

        files = spark.createDataFrame(
            MULTILANG_FILES, "file_path string, content string"
        )
        go_rows = pattern_search_tokens(
            files, "if $COND { $$$ }", language="go"
        ).collect()
        assert [(r["file_path"], r["start_line"]) for r in go_rows] == [
            ("srv.go", 32)
        ]
        ts_rows = pattern_search_tokens(
            files, "if ($COND) { $$$ }", language="typescript"
        ).collect()
        assert [(r["file_path"], r["start_line"]) for r in ts_rows] == [
            ("store.ts", 21), ("store.ts", 29),
        ]

    def test_unknown_language_raises(self, spark):
        files = spark.createDataFrame(
            [("a.go", "package x")], "file_path string, content string"
        )
        with pytest.raises(ValueError, match="unknown token-tier"):
            pattern_search_tokens(files, "$X", language="cobol")


class TestCstTier:
    """cst = concrete-syntax-exact: comments are tokens, no leniency."""

    GO = (
        "package notes\n"
        "func emit() {\n"
        "\ttrack(1, 2)\n"
        "\ttrack(1, /* mid */ 2)\n"
        "\t// TODO drop retries\n"
        "\tretry()\n"
        "}\n"
    )

    def test_comment_between_literals_breaks_cst_not_smart(self):
        smart = match_pattern_tokens("track(1, 2)", self.GO, strictness="smart")
        cst = match_pattern_tokens("track(1, 2)", self.GO, strictness="cst")
        assert len(smart) == 2
        assert [m for _s, _e, m, _b in cst] == ["track(1, 2)"]

    def test_metavar_span_may_absorb_a_comment(self):
        cst = match_pattern_tokens("track($A, $B)", self.GO, strictness="cst")
        assert [b["B"] for _s, _e, _m, b in cst] == ["2", "/* mid */ 2"]

    def test_literal_comment_pattern_matches_comment_token(self):
        got = match_pattern_tokens(
            "// TODO drop retries", self.GO, strictness="cst"
        )
        assert [(s, m) for s, _e, m, _b in got] == [(5, "// TODO drop retries")]
        # outside cst, comments are trivia — a comment-only pattern
        # compiles to nothing and is rejected
        with pytest.raises(ValueError, match="empty pattern"):
            match_pattern_tokens(
                "// TODO drop retries", self.GO, strictness="smart"
            )

    def test_cst_requires_annotations_spelled_out(self):
        ts = "function lookup(id: Key, strict: boolean): Item | undefined {}\n"
        pat_bare = "function lookup($A, $B) {"
        pat_full = "function lookup($A, $B): Item | undefined {"
        assert len(match_pattern_tokens(pat_bare, ts, strictness="smart")) == 1
        assert match_pattern_tokens(pat_bare, ts, strictness="cst") == []
        got = match_pattern_tokens(pat_full, ts, strictness="cst")
        assert [b for _s, _e, _m, b in got] == [
            {"A": "id : Key", "B": "strict : boolean"}
        ]

    def test_hash_comment_language_cst(self):
        php = "<?php\nrun(1); # fast path\nrun(1);\n"
        got = match_pattern_tokens(
            "run(1); # fast path", php, strictness="cst", hash_comments=True
        )
        assert [s for s, _e, _m, _b in got] == [2]

    def test_python_cst_routes_to_token_stream(self):
        py = "def f():\n    log(x)  # audit\n    log(y)\n"
        got = match_pattern_source("log($X)  # audit", py, strictness="cst")
        assert [(s, b["X"]) for s, _e, _m, b in got] == [(2, "x")]
        # repeated metavariables still bind token-identically under cst
        assert match_pattern_source("log($X, $X)", "log(a, b)\n",
                                    strictness="cst") == []


class TestRubyTokenTier:
    def test_def_signature_lines(self):
        from project_cortex_spark.pipeline.fixtures import RB_SRC

        got = match_pattern_tokens(
            "def $NAME($ARG)", RB_SRC, strictness="smart", hash_comments=True
        )
        assert [b["NAME"] for _s, _e, _m, b in got] == [
            "initialize", "advance", "make_cursor",
        ]

    def test_scope_resolution_and_relaxed_path(self):
        from project_cortex_spark.pipeline.fixtures import RB_SRC

        exact = match_pattern_tokens(
            "Paging::Cursor.new($X)", RB_SRC,
            strictness="smart", hash_comments=True,
        )
        assert [b["X"] for _s, _e, _m, b in exact] == ["offset"]

    def test_hash_comment_is_trivia_outside_cst(self):
        src = "run(1) # fast\nrun(2)\n"
        smart = match_pattern_tokens(
            "run($X)", src, strictness="smart", hash_comments=True
        )
        assert len(smart) == 2
        cst = match_pattern_tokens(
            "run(1) # fast", src, strictness="cst", hash_comments=True
        )
        assert [m for _s, _e, m, _b in cst] == ["run(1) # fast"]

    def test_spark_routing(self, spark):
        from project_cortex_spark.operators.astpattern import (
            pattern_search_tokens,
        )
        from project_cortex_spark.pipeline.fixtures import MULTILANG_FILES

        files = spark.createDataFrame(
            MULTILANG_FILES, "file_path string, content string"
        )
        rows = pattern_search_tokens(
            files, "def $NAME($ARG)", language="ruby"
        ).collect()
        assert [(r["file_path"], r["start_line"]) for r in rows] == [
            ("cursor.rb", 7), ("cursor.rb", 11), ("cursor.rb", 18),
        ]


class TestPythonCstLexing:
    def test_floor_division_is_not_a_comment(self):
        src = "half = total // 2\n"
        # pre-fix, '// 2' lexed as a comment: the divisor vanished from
        # every match span and literal patterns containing // matched
        # nothing
        got = match_pattern_source("total // $Y", src, strictness="cst")
        assert [b for _s, _e, _m, b in got] == [{"Y": "2"}]
        full = match_pattern_source("half = total // 2", src,
                                    strictness="cst")
        assert [m for _s, _e, m, _b in full] == ["half = total // 2"]

    def test_block_comment_chars_are_ordinary_python_tokens(self):
        # /* has no meaning in Python: it must lex as '/' '*', not eat
        # the rest of the source
        src = "y = a /*b\nz = 1\n"
        got = match_pattern_source("z = 1", src, strictness="cst")
        assert [s for s, _e, _m, _b in got] == [2]
