"""Structural AST pattern matching (cortex_pattern parity beyond the
signature tier).

Reference: `cortex_pattern` shells out to ast-grep with a pattern string
containing metavariables and a strictness tier
(internal/mcp/tools_pattern.go:20-45, internal/pattern/executor.go:36-100).
No ast-grep binary exists in this container, so the PATTERN SEMANTICS are
implemented directly for Python on the stdlib ``ast``:

* ``$NAME`` is a metavariable matching any single node; repeated
  occurrences must bind to structurally-equal nodes
  (``$X.append($X)`` matches ``a.append(a)`` but not ``a.append(b)``).
* ``$$$`` (ast-grep's multi-metavariable) matches any remaining
  arguments in a call / statements in a body.
* Strictness tiers (executor.go's cst/smart/ast/relaxed/signature):
  ``ast`` compares all semantic fields; ``smart`` (default) additionally
  ignores type annotations, default values, and decorator lists;
  ``relaxed`` also treats any Name/Attribute in the pattern as matching
  an Attribute/Name with the same terminal name (``append`` matches
  ``xs.append``). The signature tier lives in
  :func:`operators.graph.pattern_search` over parsed entities.

The Spark surface is :func:`pattern_search_ast`: an Arrow-batched
``mapInPandas`` over (file_path, content) — same narrow, shuffle-free
shape as the parse UDF; matching cost is per-file CPU, embarrassingly
parallel at corpus scale.
"""

from __future__ import annotations

import ast as pyast
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_MV_PREFIX = "__mv_"
_MULTI_MV = "__mvmulti__"

_IGNORED_FIELDS = {"ctx", "type_comment", "type_ignores", "lineno",
                   "col_offset", "end_lineno", "end_col_offset"}
_SMART_IGNORED = {"annotation", "returns", "decorator_list", "type_params",
                  "defaults", "kw_defaults"}


def _encode_pattern(pattern: str) -> str:
    """Rewrite ast-grep metavariables into parseable identifiers."""
    out = pattern.replace("$$$", _MULTI_MV)
    return re.sub(r"\$([A-Z_][A-Z0-9_]*)", lambda m: _MV_PREFIX + m.group(1), out)


def parse_pattern(pattern: str):
    """Parse a pattern string to an AST node (expression preferred; falls
    back to a statement block). Raises SyntaxError for unparseable
    patterns, like ast-grep's own error surface."""
    encoded = _encode_pattern(pattern)
    try:
        return pyast.parse(encoded, mode="eval").body
    except SyntaxError:
        body = pyast.parse(encoded).body
        return body[0] if len(body) == 1 else body


def _is_metavar(node) -> str | None:
    if isinstance(node, pyast.Name) and node.id.startswith(_MV_PREFIX):
        return node.id[len(_MV_PREFIX):]
    if isinstance(node, pyast.arg) and node.arg.startswith(_MV_PREFIX):
        return node.arg[len(_MV_PREFIX):]
    if isinstance(node, pyast.Expr):
        return _is_metavar(node.value)
    return None


def _is_multi(node) -> bool:
    return (
        (isinstance(node, pyast.Name) and node.id == _MULTI_MV)
        or (isinstance(node, pyast.arg) and node.arg == _MULTI_MV)
        or (isinstance(node, pyast.Expr) and _is_multi(node.value))
    )


def _terminal_name(node) -> str | None:
    if isinstance(node, pyast.Name):
        return node.id
    if isinstance(node, pyast.Attribute):
        return node.attr
    return None


def _match(pat, node, bindings: dict, strictness: str) -> bool:
    mv = _is_metavar(pat)
    if mv is not None:
        want = bindings.get(mv)
        dumped = pyast.dump(node) if isinstance(node, pyast.AST) else repr(node)
        if want is None:
            bindings[mv] = dumped
            return True
        return want == dumped
    if strictness == "relaxed" and isinstance(pat, (pyast.Name, pyast.Attribute)):
        pn, nn = _terminal_name(pat), _terminal_name(node)
        if pn is not None and nn is not None:
            return pn == nn
    if type(pat) is not type(node):
        return False
    if not isinstance(pat, pyast.AST):
        return pat == node
    for field, pval in pyast.iter_fields(pat):
        if field in _IGNORED_FIELDS:
            continue
        if strictness in ("smart", "relaxed") and field in _SMART_IGNORED:
            continue
        nval = getattr(node, field, None)
        if isinstance(pval, list):
            if not isinstance(nval, list):
                return False
            # $$$ absorbs any tail of the list
            if pval and _is_multi(pval[-1]):
                head = pval[:-1]
                if len(nval) < len(head):
                    return False
                pairs = zip(head, nval[:len(head)])
            else:
                if len(pval) != len(nval):
                    return False
                pairs = zip(pval, nval)
            for p, n in pairs:
                if not _match(p, n, bindings, strictness):
                    return False
        else:
            if isinstance(pval, pyast.AST) or isinstance(nval, pyast.AST):
                if not _match(pval, nval, bindings, strictness):
                    return False
            elif isinstance(pval, str) and pval.startswith(_MV_PREFIX):
                # metavariable in an identifier-string field (function/
                # class/argument names): binds like a node metavar
                key = pval[len(_MV_PREFIX):]
                if bindings.setdefault(key, nval) != nval:
                    return False
            elif strictness != "relaxed" and pval != nval:
                return False
            elif strictness == "relaxed" and pval is not None and pval != nval:
                return False
    return True


def match_pattern_source(
    pattern: str, source: str, *, strictness: str = "smart"
) -> list[tuple[int, int, str, dict]]:
    """All subtrees of ``source`` matching ``pattern``:
    (start_line, end_line, matched_text, metavar_bindings)."""
    pat = parse_pattern(pattern)
    try:
        tree = pyast.parse(source)
    except SyntaxError:
        return []
    lines = source.split("\n")
    out = []
    for node in pyast.walk(tree):
        if not hasattr(node, "lineno"):
            continue
        target = node
        # an expression pattern should match expression VALUES, not the
        # wrapping Expr statement
        if isinstance(node, pyast.Expr) and not isinstance(pat, pyast.Expr):
            continue
        bindings: dict = {}
        if _match(pat, target, bindings, strictness):
            s, e = node.lineno, node.end_lineno or node.lineno
            text = "\n".join(lines[s - 1:e])
            out.append((s, e, text,
                        {k: v for k, v in bindings.items()}))
    return out


PATTERN_SCHEMA = (
    "file_path string, start_line long, end_line long, matched string, "
    "n_bindings long"
)


def pattern_search_ast(
    files: DataFrame,
    pattern: str,
    *,
    strictness: str = "smart",
    path_col: str = "file_path",
    content_col: str = "content",
    limit: int | None = 50,
) -> DataFrame:
    """cortex_pattern's structural tier over a files frame: Arrow-batched
    per-file matching, then a global ordered limit (the reference caps at
    50 results, tools_pattern.go:20-45)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["file_path", "start_line", "end_line", "matched", "n_bindings"]
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                text = (
                    bytes(content).decode("utf-8", errors="replace")
                    if not isinstance(content, str)
                    else content
                )
                if not path.endswith(".py"):
                    continue  # structural tier is Python-first here
                for s, e, m, b in match_pattern_source(
                    pattern, text, strictness=strictness
                ):
                    rows.append((path, s, e, m, len(b)))
            yield pd.DataFrame(rows, columns=cols)

    out = files.select(path_col, content_col).mapInPandas(
        run, schema=PATTERN_SCHEMA
    )
    from pyspark.sql import functions as F

    out = out.orderBy(F.col("file_path"), F.col("start_line"))
    return out.limit(limit) if limit else out
