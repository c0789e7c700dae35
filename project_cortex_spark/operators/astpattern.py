"""Structural AST pattern matching (cortex_pattern parity beyond the
signature tier).

Reference: `cortex_pattern` shells out to ast-grep with a pattern string
containing metavariables and a strictness tier
(internal/mcp/tools_pattern.go:20-45, internal/pattern/executor.go:36-100).
No ast-grep binary exists in this container, so the PATTERN SEMANTICS are
implemented directly: for Python on the stdlib ``ast`` (below), and for
the other languages (Go, TypeScript, JavaScript, Java, C, C++, Rust,
PHP, Ruby) on a comment/string-aware token stream (:func:`match_pattern_tokens`
/ :func:`pattern_search_tokens` at the end of this module). The cst
(concrete-syntax-exact) tier runs on the token stream for EVERY language
(including Python, whose ast module erases trivia): comments are lexed
as concrete tokens and all smart/relaxed leniencies are off, so a match
must reproduce the source's concrete token sequence exactly — ast-grep's
"all nodes including unnamed must match" semantics.

Python AST tier:

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
    (start_line, end_line, matched_text, metavar_bindings).

    ``strictness="cst"`` routes to the concrete-syntax token matcher
    (comments significant, ``#`` form ONLY — ``//`` stays floor
    division and ``/* */`` is not a Python comment): Python's ast
    module erases trivia, so the cst tier runs on the token stream for
    every language."""
    if strictness == "cst":
        return match_pattern_tokens(
            pattern,
            source,
            strictness="cst",
            hash_comments=True,
            slash_comments=False,
        )
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


# ---------------------------------------------------------------------------
# Token-level structural matching for C-like languages (Go, TypeScript,
# JavaScript, Java, C, C++, Rust, PHP). The reference's cortex_pattern
# supports these via ast-grep's per-language grammars
# (internal/pattern/executor.go:36-100, tools_pattern.go language list);
# no tree-sitter runtime exists in this container, so the SEMANTICS are
# approximated over a comment/string-aware token stream:
#
# * ``$NAME`` matches the shortest balanced token span (never crossing a
#   top-level ``,`` ``;`` or an unopened closer) that lets the rest of
#   the pattern match — the token analogue of "one AST node". Repeated
#   occurrences must bind token-identical spans.
# * ``$$$`` matches any balanced span, commas included (arguments /
#   statement lists), lazily.
# * Strictness: ``ast`` = literal token equality; ``smart`` (default)
#   additionally skips TS/Go-style type annotations (``: T`` before an
#   expected ``,`` ``)`` ``=`` ``{``); ``relaxed`` additionally lets a
#   bare identifier in the pattern match a dotted path with the same
#   terminal name (``Close($X)`` matches ``conn.Close(x)``).
#
# Known divergence from a real grammar (documented, pinned by goldens):
# left-nested binary chains — ``$X + $Y`` over ``a + b + c`` yields the
# token spans ``a + b`` and ``b + c`` rather than the parse-tree pair
# ``(a+b)+c`` / ``(a,b)``.
# ---------------------------------------------------------------------------

_PUNCT_MULTI = (
    "===", "!==", "...", "<<=", ">>=", "**=", "&&=", "||=", "??=",
    "=>", ":=", "<-", "==", "!=", "<=", ">=", "&&", "||", "++", "--",
    "+=", "-=", "*=", "/=", "%=", "<<", ">>", "->", "::", "?.", "??",
    "**",
)
_IDENT_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_NUM_RE = re.compile(r"\d[\w.]*")
_OPENERS = {"(": ")", "[": "]", "{": "}"}
_CLOSERS = {")", "]", "}"}

# token tuple layout: (text, line, start_char, end_char)


def lex_clike(
    src: str,
    *,
    hash_comments: bool = False,
    keep_comments: bool = False,
    slash_comments: bool = True,
) -> list[tuple]:
    """Comment/string-aware tokenizer shared by the C-like languages.

    ``keep_comments=True`` (the cst tier) emits each comment as a single
    token — trailing whitespace stripped, interior text verbatim — so
    comments participate in matching as concrete nodes instead of being
    trivia. ``slash_comments=False`` (Python, whose ``//`` is floor
    division and ``#`` the only comment form) disables the ``//`` and
    ``/* */`` comment rules entirely."""
    toks: list[tuple] = []
    i, n, line = 0, len(src), 1
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if slash_comments and c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            j = n if j == -1 else j
            if keep_comments:
                toks.append((src[i:j].rstrip(), line, i, j))
            i = j
            continue
        if slash_comments and c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            end = n if j == -1 else j + 2
            seg = src[i:end]
            if keep_comments:
                toks.append((seg, line, i, end))
            line += seg.count("\n")
            i = end
            continue
        if c == "#" and hash_comments:
            j = src.find("\n", i)
            j = n if j == -1 else j
            if keep_comments:
                toks.append((src[i:j].rstrip(), line, i, j))
            i = j
            continue
        if c in "\"'":
            j = i + 1
            while j < n and src[j] != c:
                j += 2 if src[j] == "\\" else 1
            j = min(j + 1, n)
            toks.append((src[i:j], line, i, j))
            line += src.count("\n", i, j)
            i = j
            continue
        if c == "`":
            j = src.find("`", i + 1)
            j = n if j == -1 else j + 1
            toks.append((src[i:j], line, i, j))
            line += src.count("\n", i, j)
            i = j
            continue
        m = _IDENT_RE.match(src, i) or _NUM_RE.match(src, i)
        if m:
            toks.append((m.group(), line, i, m.end()))
            i = m.end()
            continue
        for p in _PUNCT_MULTI:
            if src.startswith(p, i):
                toks.append((p, line, i, i + len(p)))
                i += len(p)
                break
        else:
            toks.append((c, line, i, i + 1))
            i += 1
    return toks


_TOKEN_MV_RE = re.compile(r"^\$[A-Z_][A-Z0-9_]*$")
_MAX_SPAN = 400  # tokens a single metavar/multi may absorb


def _compile_token_pattern(
    pattern: str,
    *,
    hash_comments: bool = False,
    keep_comments: bool = False,
    slash_comments: bool = True,
) -> list[tuple]:
    """('lit', text) | ('mv', name) | ('multi', None) steps. In cst mode
    (``keep_comments``) a comment in the pattern compiles to a literal
    comment-token step; metavariables INSIDE comment text are not
    expanded (a comment is one concrete token)."""
    steps = []
    for text, _ln, _s, _e in lex_clike(
        pattern,
        hash_comments=hash_comments,
        keep_comments=keep_comments,
        slash_comments=slash_comments,
    ):
        if text == "$$$":
            steps.append(("multi", None))
        elif _TOKEN_MV_RE.match(text):
            steps.append(("mv", text[1:]))
        else:
            steps.append(("lit", text))
    if not steps:
        raise ValueError("empty pattern")
    return steps


def _span_candidates(toks, si, *, allow_commas: bool, allow_empty: bool):
    """End indices (ascending = lazy order) of balanced spans from si."""
    if allow_empty:
        yield si
    depth = 0
    j = si
    while j < len(toks) and j - si < _MAX_SPAN:
        t = toks[j][0]
        if t in _OPENERS:
            depth += 1
        elif t in _CLOSERS:
            if depth == 0:
                return  # closer of an enclosing scope — span cannot cross
            depth -= 1
        elif depth == 0 and not allow_commas and t in (",", ";"):
            return
        elif depth == 0 and allow_commas and t == ";" and not allow_empty:
            pass
        j += 1
        if depth == 0:
            yield j


def _skip_annotation(toks, si):
    """Candidate resume points after a ``: <balanced type>`` annotation
    (the smart tier's annotation-insensitivity): a depth-0 ``,`` ``=``
    ``;`` or enclosing closer ends the type definitively; a depth-0
    ``{`` is ambiguous — it may be the function body (stop BEFORE it) or
    an object-type annotation (balanced, continue) — so both are
    yielded and the caller backtracks."""
    j, depth = si + 1, 0
    while j < len(toks):
        t = toks[j][0]
        if depth == 0 and t == "{":
            yield j
            depth += 1
        elif t in _OPENERS:
            depth += 1
        elif t in _CLOSERS:
            if depth == 0:
                yield j
                return
            depth -= 1
        elif depth == 0 and t in (",", "=", ";"):
            yield j
            return
        j += 1
    yield j


def _match_token_pattern(steps, toks, si, strictness):
    """End index of the lazy match of ``steps`` at ``si``, with bindings
    — or (None, None)."""
    bindings: dict = {}

    def rec(pi: int, i: int) -> int | None:
        if pi == len(steps):
            return i
        kind, val = steps[pi]
        if kind == "lit":
            if i < len(toks) and toks[i][0] == val:
                return rec(pi + 1, i + 1)
            if (
                strictness == "relaxed"
                and i < len(toks)
                and _IDENT_RE.fullmatch(val)
            ):
                # a bare identifier matches a dotted path with the same
                # terminal name: skip leading `ident .` pairs
                j = i
                while (
                    j + 2 < len(toks)
                    and _IDENT_RE.fullmatch(toks[j][0])
                    and toks[j + 1][0] == "."
                ):
                    j += 2
                    if toks[j][0] == val:
                        return rec(pi + 1, j + 1)
            if (
                strictness in ("smart", "relaxed")
                and i < len(toks)
                and toks[i][0] == ":"
                and val in (",", ")", "=", "{", ";")
            ):
                for k in _skip_annotation(toks, i):
                    r = rec(pi, k)
                    if r is not None:
                        return r
            return None
        if kind == "mv":
            for j in _span_candidates(
                toks, i, allow_commas=False, allow_empty=False
            ):
                seg = tuple(t[0] for t in toks[i:j])
                prev = bindings.get(val)
                if prev is not None and prev != seg:
                    continue
                bindings[val] = seg
                r = rec(pi + 1, j)
                if r is not None:
                    return r
                if prev is None:
                    del bindings[val]
                else:
                    bindings[val] = prev
            return None
        # multi
        for j in _span_candidates(toks, i, allow_commas=True, allow_empty=True):
            r = rec(pi + 1, j)
            if r is not None:
                return r
        return None

    end = rec(0, si)
    return (end, bindings) if end is not None else (None, None)


def match_pattern_tokens(
    pattern: str,
    source: str,
    *,
    strictness: str = "smart",
    hash_comments: bool = False,
    slash_comments: bool = True,
) -> list[tuple[int, int, str, dict]]:
    """All token spans of ``source`` matching ``pattern``:
    (start_line, end_line, matched_text, metavar_bindings). Matches may
    overlap (nested matches are reported, like ast-grep).

    ``strictness="cst"`` is concrete-syntax-exact: comments become
    ordinary tokens (a comment between two literal pattern tokens breaks
    the match unless the pattern spells it out; metavariable spans may
    absorb comments like any other token), and none of the smart/relaxed
    leniencies apply — no annotation skipping, no dotted-path matching.
    Mirrors ast-grep's cst tier where unnamed/trivia nodes must match
    (internal/pattern/executor.go:36-100)."""
    keep = strictness == "cst"
    steps = _compile_token_pattern(
        pattern,
        hash_comments=hash_comments,
        keep_comments=keep,
        slash_comments=slash_comments,
    )
    toks = lex_clike(
        source,
        hash_comments=hash_comments,
        keep_comments=keep,
        slash_comments=slash_comments,
    )
    first = steps[0]
    out = []
    for si in range(len(toks)):
        # cheap prefilter: a literal-headed pattern anchors on its token
        if first[0] == "lit" and toks[si][0] != first[1]:
            if not (strictness == "relaxed" and _IDENT_RE.fullmatch(first[1])):
                continue
        end, bindings = _match_token_pattern(steps, toks, si, strictness)
        if end is None or end == si:
            continue
        s_char, e_char = toks[si][2], toks[end - 1][3]
        out.append(
            (
                toks[si][1],
                toks[end - 1][1],
                source[s_char:e_char],
                {k: " ".join(v) for k, v in bindings.items()},
                e_char,
                s_char,
            )
        )
    # the relaxed dotted-prefix rule can re-match the same span from each
    # later dot segment (`this.items.push(x)` from `this`, `items`,
    # `push`) — keep only the earliest start per end offset, like the
    # single AST node ast-grep would report
    best: dict[int, tuple] = {}
    for row in out:
        e_char = row[4]
        if e_char not in best or row[5] < best[e_char][5]:
            best[e_char] = row
    return [
        (s, e, m, b)
        for s, e, m, b, _ec, _sc in sorted(best.values(), key=lambda r: r[5])
    ]


# extension routing for the token tier (reference language list,
# internal/pattern/validator.go / tools_pattern.go)
_TOKEN_LANGS = {
    "go": ((".go",), False),
    "typescript": ((".ts", ".tsx"), False),
    "javascript": ((".js", ".jsx", ".mjs"), False),
    "java": ((".java",), False),
    "c": ((".c", ".h"), False),
    "cpp": ((".cpp", ".cc", ".hpp", ".cxx"), False),
    "rust": ((".rs",), False),
    "php": ((".php",), True),
    # Ruby: hash comments; paren/bracket-balanced expression patterns
    # (calls, assignments, signature lines) match fine, but ``$$$``
    # cannot absorb a def/end statement body — Ruby blocks are keyword-
    # delimited, not brace-delimited, and the balanced-span matcher only
    # tracks () [] {}. Use line-level patterns for defs.
    "ruby": ((".rb",), True),
}


def pattern_search_tokens(
    files: DataFrame,
    pattern: str,
    *,
    language: str,
    strictness: str = "smart",
    path_col: str = "file_path",
    content_col: str = "content",
    limit: int | None = 50,
) -> DataFrame:
    """cortex_pattern's structural tier for non-Python languages: the
    token matcher applied per file via Arrow-batched ``mapInPandas`` —
    same narrow shuffle-free shape as :func:`pattern_search_ast`, cost
    is per-file CPU, embarrassingly parallel at corpus scale. Files are
    filtered to the language's extensions BEFORE the Python stage, so
    the scan prunes JVM-side (ast-grep's --lang contract)."""
    if language not in _TOKEN_LANGS:
        raise ValueError(
            f"unknown token-tier language {language!r}; "
            f"one of {sorted(_TOKEN_LANGS)}"
        )
    exts, hash_comments = _TOKEN_LANGS[language]

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
                for s, e, m, b in match_pattern_tokens(
                    pattern, text,
                    strictness=strictness, hash_comments=hash_comments,
                ):
                    rows.append((path, s, e, m, len(b)))
            yield pd.DataFrame(rows, columns=cols)

    from pyspark.sql import functions as F

    cond = None
    for ext in exts:
        c = F.col(path_col).endswith(ext)
        cond = c if cond is None else (cond | c)
    out = (
        files.filter(cond)
        .select(path_col, content_col)
        .mapInPandas(run, schema=PATTERN_SCHEMA)
        .orderBy(F.col("file_path"), F.col("start_line"), F.col("end_line"))
    )
    return out.limit(limit) if limit else out
