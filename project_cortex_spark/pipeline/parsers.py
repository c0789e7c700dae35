"""Multi-language source parsers (G9/D3 beyond Python).

Reference contract: extension routing in internal/indexer/parser.go:49-86
feeds per-language parsers that emit three tiers — symbols (types +
functions with receiver/signature), definitions, data (consts/vars) —
per file (internal/indexer/parser.go:117-163 for go/ast,
internal/indexer/parsers/typescript.go:87-105 for the tree-sitter
family), plus parameter/field rows and a complexity column persisted by
internal/storage/schema.go:200-249.

No tree-sitter wheel exists in this container, so these are
deterministic scanner parsers, not grammar ports: a masking pass blanks
string/comment CONTENTS (preserving offsets and newlines) so that brace
matching and declaration regexes are robust to braces/quotes inside
literals; names, types, and values are then read from the raw text at
the same offsets. That covers the reference's extraction contract —
entity kinds, receivers, parameter positions/types, return types, line
spans, cyclomatic complexity — on well-formed source. Pathological
syntax degrades to missed entities, never to wrong spans or crashes
(same posture as the reference's log-and-skip).

Row shape = pipeline.parse.ENTITY_SCHEMA; kinds emitted here:
  package, type, function, call, import, const, var, param, field.
"""

from __future__ import annotations

import re
from bisect import bisect_right

# ---------------------------------------------------------------------------
# shared scanning utilities
# ---------------------------------------------------------------------------


def mask_code(
    src: str,
    *,
    line_comment: str = "//",
    block_comment: tuple[str, str] | None = ("/*", "*/"),
    strings: str = "\"'",
    raw_strings: str = "",
) -> str:
    """Blank comments and string literals to spaces, preserving length and
    newlines, so structural scans (braces, keywords) can't be fooled by
    ``"}"`` in a literal. Escapes (``\\``) are honored inside ``strings``
    but not ``raw_strings`` (Go backticks, which have none).
    """
    out = list(src)
    i, n = 0, len(src)

    def blank(a: int, b: int) -> None:
        for j in range(a, b):
            if out[j] != "\n":
                out[j] = " "

    while i < n:
        c = src[i]
        if line_comment and src.startswith(line_comment, i):
            j = src.find("\n", i)
            j = n if j == -1 else j
            blank(i, j)
            i = j
        elif block_comment and src.startswith(block_comment[0], i):
            j = src.find(block_comment[1], i + len(block_comment[0]))
            j = n if j == -1 else j + len(block_comment[1])
            blank(i, j)
            i = j
        elif c in strings:
            j = i + 1
            while j < n and src[j] != c:
                j = j + 2 if src[j] == "\\" else j + 1
            j = min(j + 1, n)
            blank(i, j)
            i = j
        elif c in raw_strings:
            j = src.find(c, i + 1)
            j = n if j == -1 else j + 1
            blank(i, j)
            i = j
        else:
            i += 1
    return "".join(out)


_CHAR_LIT_RE = re.compile(r"'(?:\\.|[^'\\\n])'")


def mask_char_literals(src: str) -> str:
    """Blank closed single-quote char literals (``'}'``, ``'\\n'``) to
    spaces, length-preserving. Unlike treating ``'`` as a string
    delimiter, this leaves Rust lifetimes (``&'a str`` — no closing
    quote) untouched, while a brace/paren inside a char literal can no
    longer unbalance structural matching."""
    return _CHAR_LIT_RE.sub(lambda m: " " * len(m.group(0)), src)


_PHP_HEREDOC_RE = re.compile(
    # terminator: a line whose only content is the label (PHP 7.3+ allows
    # indentation) followed by ; , ) or end-of-line. The \b keeps a longer
    # identifier sharing the prefix (EOS vs EOS_TAIL) from closing early,
    # and [ \t]* (not \s*) keeps the close on a single line.
    r"<<<\s*(['\"]?)(\w+)\1\r?\n.*?\r?\n[ \t]*\2\b(?=[;,)\s]|\Z)", re.S
)


_CPP_RAW_STR_RE = re.compile(r'R"([^()\\\s]{0,16})\(.*?\)\1"', re.S)


def mask_cpp_raw_strings(src: str) -> str:
    """Blank C++11 raw string literals (``R"delim( ... )delim"``),
    preserving newlines/offsets — their contents are uninterpreted, so
    quotes and braces inside would desync the plain string masker."""

    def blank(m: re.Match) -> str:
        return "".join(c if c == "\n" else " " for c in m.group(0))

    return _CPP_RAW_STR_RE.sub(blank, src)


_IF0_RE = re.compile(r"^\s*#\s*if\s+0\b")
_IF_ANY_RE = re.compile(r"^\s*#\s*if(?:def|ndef)?\b")
_ENDIF_RE = re.compile(r"^\s*#\s*endif\b")
_ELSE_RE = re.compile(r"^\s*#\s*el(?:se\b|if\b)")


def mask_if0_regions(src: str) -> str:
    """Blank ``#if 0 ... #endif`` regions (the C idiom for commenting
    out code, which need not be brace-balanced), honoring nested
    conditionals. An ``#else``/``#elif`` belonging to the opening
    ``#if 0`` ends the blanking — that branch is the code that actually
    compiles, so its functions/types must still be extracted (an
    ``#elif`` condition is assumed live, the conservative choice).
    Other preprocessor conditions are left alone — both branches are
    usually real code. An unterminated ``#if 0`` blanks to EOF, matching
    how a compiler would skip it. Limitation: a nested ``#if 0`` inside
    the live ``#else`` branch is not re-masked (depth tracking only)."""
    lines = src.split("\n")
    depth = 0
    blanking = False
    for i, line in enumerate(lines):
        if depth == 0:
            if _IF0_RE.match(line):
                depth = 1
                blanking = True
                lines[i] = " " * len(line)
        else:
            if _IF_ANY_RE.match(line):
                depth += 1
            elif _ENDIF_RE.match(line):
                depth -= 1
                if depth == 0:
                    lines[i] = " " * len(line)
                    blanking = False
                    continue
            elif depth == 1 and blanking and _ELSE_RE.match(line):
                blanking = False
                lines[i] = " " * len(line)
                continue
            if blanking:
                lines[i] = " " * len(line)
    return "\n".join(lines)


_RUBY_HEREDOC_RE = re.compile(
    # uppercase-initial identifier required: `x<<b` is a shift, and an
    # unclosed false positive simply fails to match (no-op). The
    # terminator must be a standalone line — only whitespace around the
    # label ([ \t]*, not \s*, so the close cannot span lines and a longer
    # identifier like EOS_TAIL cannot close an EOS heredoc early).
    r"<<[-~]?(['\"]?)([A-Z_]\w*)\1\r?\n.*?\r?\n[ \t]*\2[ \t]*(?=\r?\n|\Z)", re.S
)


def mask_ruby_heredocs(src: str) -> str:
    """Blank Ruby heredoc bodies (``<<~EOT``/``<<-EOT``/``<<EOT``),
    preserving newlines/offsets — def/end keywords inside them must not
    emit phantom entities or desync the keyword block tracker."""

    def blank(m: re.Match) -> str:
        return "".join(c if c == "\n" else " " for c in m.group(0))

    return _RUBY_HEREDOC_RE.sub(blank, src)


_TEXT_BLOCK_RE = re.compile(r'""".*?"""', re.S)


def mask_text_blocks(src: str) -> str:
    """Blank Java 15+ text blocks (``\"\"\" ... \"\"\"``), preserving
    newlines/offsets — quote/brace soup inside them must not desync the
    plain string masker."""

    def blank(m: re.Match) -> str:
        return "".join(c if c == "\n" else " " for c in m.group(0))

    return _TEXT_BLOCK_RE.sub(blank, src)


def mask_php_heredocs(src: str) -> str:
    """Blank PHP heredoc/nowdoc bodies (``<<<EOT ... EOT``), preserving
    newlines/offsets, so declaration-shaped text inside them cannot emit
    phantom entities or unbalance braces."""

    def blank(m: re.Match) -> str:
        return "".join(c if c == "\n" else " " for c in m.group(0))

    return _PHP_HEREDOC_RE.sub(blank, src)


def line_starts(src: str) -> list[int]:
    starts = [0]
    for i, c in enumerate(src):
        if c == "\n":
            starts.append(i + 1)
    return starts


def line_of(starts: list[int], pos: int) -> int:
    """1-indexed line containing byte offset ``pos``."""
    return bisect_right(starts, pos)


def line_text(src: str, starts: list[int], ln: int) -> str:
    """Raw text of 1-indexed line ``ln`` (safe on the last line)."""
    if ln < 1 or ln > len(starts):
        return ""
    end = starts[ln] - 1 if ln < len(starts) else len(src)
    return src[starts[ln - 1]: end]


def match_brace(masked: str, open_pos: int) -> int:
    """Index of the ``}`` matching the ``{`` at ``open_pos`` (masked text:
    literals are already blanked). Returns len(masked)-1 if unbalanced."""
    depth = 0
    for i in range(open_pos, len(masked)):
        if masked[i] == "{":
            depth += 1
        elif masked[i] == "}":
            depth -= 1
            if depth == 0:
                return i
    return len(masked) - 1


def match_paren(masked: str, open_pos: int) -> int:
    depth = 0
    for i in range(open_pos, len(masked)):
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return len(masked) - 1


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at bracket depth 0 ((), [], {}, <>)."""
    parts, depth, cur = [], 0, []
    for c in s:
        if c in "([{<":
            depth += 1
        elif c in ")]}>":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


_CALL_RE = re.compile(r"([A-Za-z_$][\w$]*)\s*\(")


def extract_calls(
    masked: str,
    raw: str,
    starts: list[int],
    func_spans: list[tuple[int, int, str]],
    keywords: frozenset[str],
) -> list[tuple]:
    """Best-effort call sites: identifier followed by ``(``, attributed to
    the innermost enclosing function span. Same stated limitation as the
    reference's extractor (no dynamic dispatch resolution,
    internal/graph/extractor.go:848-859): the *name* is the callee.
    """
    spans = sorted(func_spans)
    out = []
    for m in _CALL_RE.finditer(masked):
        name = m.group(1)
        if name in keywords:
            continue
        pos = m.start()
        parent = None
        for s, e, fname in spans:  # innermost = last containing span
            if s <= pos <= e:
                parent = fname
        if parent is None:
            continue  # module-level calls: skip (decl headers match too)
        ln = line_of(starts, pos)
        out.append((parent, name, ln))
    return out


def cyclomatic(masked_body: str, branch_re: re.Pattern) -> int:
    """1 + number of decision points (if/for/while/case/catch + && + ||):
    the classic McCabe count the reference stores per function
    (internal/storage/schema.go:226)."""
    return (
        1
        + len(branch_re.findall(masked_body))
        + masked_body.count("&&")
        + masked_body.count("||")
    )


# ---------------------------------------------------------------------------
# Go  (contract: internal/indexer/parser.go:117-287)
# ---------------------------------------------------------------------------

_GO_KEYWORDS = frozenset(
    "if for switch select return func range defer go else case break continue "
    "goto fallthrough var const type import package map chan interface struct".split()
)
_GO_BRANCH_RE = re.compile(r"\b(?:if|for|case)\b")
_GO_FUNC_RE = re.compile(
    # receiver may carry a type-param list (func (b *Box[T]) Get(...));
    # the function name may carry one too (func Map[T, U any](...)) —
    # single bracket level; deeper constraint nesting degrades to a miss
    r"^func\s*(?:\(\s*(?:(\w+)\s+)?\*?([\w]+)\s*(?:\[[^\[\]]*\])?\s*\)\s*)?"
    r"(\w+)\s*(?:\[[^\[\]]*\])?\s*\(",
    re.M,
)
_GO_TYPE_RE = re.compile(r"^type\s+(\w+)(?:\[[^\[\]]*\])?\s+(.+)$", re.M)
_GO_IMPORT_ONE_RE = re.compile(r'^import\s+(?:(\w+|\.)\s+)?"([^"]+)"', re.M)
_GO_IMPORT_BLOCK_RE = re.compile(r"^import\s*\(", re.M)
_GO_IMPORT_ITEM_RE = re.compile(r'^\s*(?:(\w+|\.)\s+)?"([^"]+)"')
_GO_VALUE_BLOCK_RE = re.compile(r"^(const|var)\s*\(", re.M)
_GO_VALUE_ONE_RE = re.compile(
    r"^(const|var)\s+(\w+)(?:\s+([^=\n]+?))?\s*(?:=|$)", re.M
)
_GO_FIELD_RE = re.compile(r"^\s*(\w+(?:\s*,\s*\w+)*)\s+(\S[^`\n]*?)\s*(?:`[^`]*`)?$")


def _go_params(raw_params: str) -> list[tuple[str, str]]:
    """(name, type) pairs with Go's grouped-type sugar resolved:
    ``a, b int`` gives both params type int (right-to-left fill)."""
    items = split_top_level(raw_params)
    out: list[tuple[str, str]] = []
    for item in items:
        toks = item.split(None, 1)
        if len(toks) == 2:
            out.append((toks[0], toks[1].strip()))
        elif toks:
            out.append((toks[0], ""))  # unnamed param OR grouped name
    # right-to-left: a grouped name inherits the next declared type
    for i in range(len(out) - 2, -1, -1):
        if out[i][1] == "" and out[i + 1][1] != "":
            out[i] = (out[i][0], out[i + 1][1])
    return out


def parse_go(path: str, source: str, row) -> list[tuple]:
    """Go extraction via the scanner contract (types/structs/interfaces,
    functions with receiver, params + returns, const/var incl. blocks,
    struct fields, imports, calls, complexity)."""
    masked = mask_code(source, raw_strings="`")
    starts = line_starts(source)
    out: list[tuple] = []

    m = re.search(r"^package\s+(\w+)", masked, re.M)
    if m:
        out.append(row(path, "package", m.group(1), start=1, end=1))

    for m in _GO_IMPORT_ONE_RE.finditer(source):
        ln = line_of(starts, m.start())
        out.append(
            row(path, "import", m.group(2), start=ln, end=ln, detail=m.group(1))
        )
    for m in _GO_IMPORT_BLOCK_RE.finditer(masked):
        close = match_paren(masked, masked.find("(", m.start()))
        for ln0 in range(line_of(starts, m.start()), line_of(starts, close)):
            raw_line = line_text(source, starts, ln0 + 1)
            im = _GO_IMPORT_ITEM_RE.match(raw_line)
            if im:
                out.append(
                    row(path, "import", im.group(2), start=ln0 + 1, end=ln0 + 1,
                        detail=im.group(1))
                )

    # types (+ struct fields)
    for m in _GO_TYPE_RE.finditer(masked):
        name, rest = m.group(1), m.group(2).strip()
        ln = line_of(starts, m.start())
        kind = (
            "struct"
            if rest.startswith("struct")
            else "interface"
            if rest.startswith("interface")
            else "alias"
        )
        end_ln = ln
        if "{" in rest:
            open_pos = masked.find("{", m.start())
            close = match_brace(masked, open_pos)
            end_ln = line_of(starts, close)
            if kind == "struct":
                pos = 0
                for ln0 in range(ln, end_ln - 1):
                    raw_line = line_text(source, starts, ln0 + 1)
                    fm = _GO_FIELD_RE.match(raw_line)
                    if fm and fm.group(1) not in ("struct", "interface"):
                        for fname in re.split(r"\s*,\s*", fm.group(1)):
                            out.append(
                                row(path, "field", fname, parent=name,
                                    start=ln0 + 1, end=ln0 + 1, position=pos,
                                    param_type=fm.group(2).strip())
                            )
                            pos += 1
        out.append(row(path, "type", name, start=ln, end=end_ln, detail=kind))

    # const / var (singles and blocks); detail carries the first value
    # line (ConstantInfo.Value / VariableInfo.Value parity)
    def _value_of(raw_line: str) -> str | None:
        return (
            raw_line.split("=", 1)[1].strip() or None
            if "=" in raw_line
            else None
        )

    for m in _GO_VALUE_ONE_RE.finditer(masked):
        ln = line_of(starts, m.start())
        typ = (m.group(3) or "").strip() or None
        out.append(
            row(path, m.group(1), m.group(2), start=ln, end=ln, param_type=typ,
                detail=_value_of(line_text(source, starts, ln)))
        )
    for m in _GO_VALUE_BLOCK_RE.finditer(masked):
        kind = m.group(1)
        close = match_paren(masked, masked.find("(", m.start()))
        for ln0 in range(line_of(starts, m.start()), line_of(starts, close)):
            mline = line_text(masked, starts, ln0 + 1)
            vm = re.match(r"^\s*(\w+)(?:\s+([^=\n]+?))?\s*(?:=|$)", mline)
            if vm and vm.group(1) not in ("struct", "interface"):
                typ = (vm.group(2) or "").strip() or None
                out.append(
                    row(path, kind, vm.group(1), start=ln0 + 1, end=ln0 + 1,
                        param_type=typ,
                        detail=_value_of(line_text(source, starts, ln0 + 1)))
                )

    # functions / methods
    func_spans: list[tuple[int, int, str]] = []
    for m in _GO_FUNC_RE.finditer(masked):
        recv_type, fname = m.group(2), m.group(3)
        ln = line_of(starts, m.start())
        p_open = masked.find("(", m.end() - 1)
        p_close = match_paren(masked, p_open)
        params = _go_params(source[p_open + 1 : p_close])
        # returns: between param close and body brace (or line end)
        b_open = masked.find("{", p_close)
        sig_end = b_open if b_open != -1 else len(masked)
        ret = source[p_close + 1 : sig_end].strip()
        end_ln = ln
        body = ""
        if b_open != -1:
            b_close = match_brace(masked, b_open)
            end_ln = line_of(starts, b_close)
            body = masked[b_open:b_close]
            func_spans.append((b_open, b_close, fname))
        out.append(
            row(path, "function", fname, parent=recv_type, start=ln, end=end_ln,
                n_params=len(params), is_method=recv_type is not None,
                complexity=cyclomatic(body, _GO_BRANCH_RE))
        )
        for i, (pname, ptype) in enumerate(params):
            out.append(
                row(path, "param", pname, parent=fname, start=ln, end=ln,
                    position=i, param_type=ptype or None,
                    detail="variadic" if "..." in ptype else None)
            )
        if ret:
            rets = (
                split_top_level(ret[1:-1])
                if ret.startswith("(") and ret.endswith(")")
                else [ret]
            )
            for i, r in enumerate(rets):
                # named return ("err error") only when the first token is
                # a plain identifier that is not a type keyword — an
                # unnamed composite like ``Pair[V, K]`` or ``chan int``
                # also splits on whitespace but is a TYPE, not a name
                toks = r.split(None, 1)
                named = (
                    len(toks) == 2
                    and re.fullmatch(r"\w+", toks[0]) is not None
                    and toks[0] not in _GO_KEYWORDS
                )
                out.append(
                    row(path, "param", toks[0] if named else "",
                        parent=fname, start=ln, end=ln, position=i,
                        param_type=toks[1] if named else r, is_return=True)
                )

    for parent, name, ln in extract_calls(
        masked, source, starts, func_spans, _GO_KEYWORDS
    ):
        out.append(row(path, "call", name, parent=parent, start=ln, end=ln))
    return out


# ---------------------------------------------------------------------------
# TypeScript / JavaScript  (contract: parsers/typescript.go:87-359; JS
# reuses the same grammar, typescript.go:361-385)
# ---------------------------------------------------------------------------

_TS_KEYWORDS = frozenset(
    "if for while switch catch function return else do try typeof new in of "
    "instanceof void delete yield await case break continue throw with super "
    "constructor import export default class interface type const let var".split()
)
_TS_BRANCH_RE = re.compile(r"\b(?:if|for|while|case|catch)\b")
# optional generic parameter list between a name and `(`/`extends`,
# balanced to three nesting levels (Map<string, Array<number>> etc.;
# deeper nesting degrades to a missed match, never a wrong span)
_TS_GENERIC = r"(?:\s*<(?:[^<>]|<(?:[^<>]|<[^<>]*>)*>)*>)?"
_TS_CLASS_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+(\w+)"
    + _TS_GENERIC
    + r"(\s+extends\s+[\w.]+" + _TS_GENERIC + r")?(\s+implements\s+[\w,\s.]+)?",
    re.M,
)
_TS_IFACE_RE = re.compile(
    r"^\s*(?:export\s+)?interface\s+(\w+)(\s+extends\s+[\w,\s.]+)?", re.M
)
_TS_ALIAS_RE = re.compile(r"^\s*(?:export\s+)?type\s+(\w+)\s*=", re.M)
_TS_FUNC_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*(\w+)"
    + _TS_GENERIC
    + r"\s*\(",
    re.M,
)
_TS_IMPORT_RE = re.compile(
    r"""^\s*import\s+(?:(.+?)\s+from\s+)?['"]([^'"]+)['"]""", re.M
)
_TS_REQUIRE_RE = re.compile(
    r"""(?:const|let|var)\s+(\w+|\{[^}]*\})\s*=\s*require\(['"]([^'"]+)['"]\)"""
)
_TS_VALUE_RE = re.compile(
    r"^(?:export\s+)?(const|let|var)\s+(\w+)\s*(?::\s*([^=\n]+?))?\s*(=|;|$)", re.M
)
_TS_METHOD_RE = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|static\s+|readonly\s+|async\s+"
    r"|get\s+|set\s+|\*\s*)*(\w+)" + _TS_GENERIC + r"\s*\(",
    re.M,
)
_TS_IFACE_MEMBER_RE = re.compile(r"^\s*(?:readonly\s+)?(\w+)\s*(\??)\s*[:(]")
_TS_ARROW_RE = re.compile(r"=\s*(?:async\s+)?(?:\(|[\w$]+\s*=>)")


def _ts_params(raw_params: str) -> list[tuple[str, str]]:
    """(name, declared type or '') — destructured params get a positional
    pseudo-name, mirroring how the reference stores tree-sitter's text."""
    out = []
    for i, item in enumerate(split_top_level(raw_params)):
        item = item.split("=", 1)[0].strip()  # drop defaults
        if item.startswith(("{", "[")):
            out.append((f"arg{i}", ""))
            continue
        name, _, typ = item.partition(":")
        name = name.strip().lstrip(".")  # ...rest
        out.append((name or f"arg{i}", typ.strip()))
    return out


def _ts_emit_function(
    out, row, path, masked, source, starts, m, fname, parent, func_spans
):
    # anchor on the identifier, not the match start: leading `\s*` in the
    # regexes can span blank lines, which would skew the reported line
    ln = line_of(starts, m.start(1))
    p_open = masked.find("(", m.end() - 1)
    p_close = match_paren(masked, p_open)
    params = _ts_params(source[p_open + 1 : p_close])
    b_open = masked.find("{", p_close)
    # the return type sits between ) and { : e.g. `): User | undefined {`
    ret = ""
    end_ln = ln
    body = ""
    if b_open != -1:
        between = source[p_close + 1 : b_open].strip()
        if between.startswith(":"):
            ret = between[1:].strip()
        b_close = match_brace(masked, b_open)
        end_ln = line_of(starts, b_close)
        body = masked[b_open:b_close]
        func_spans.append((b_open, b_close, fname))
    out.append(
        row(path, "function", fname, parent=parent, start=ln, end=end_ln,
            n_params=len(params), is_method=parent is not None,
            complexity=cyclomatic(body, _TS_BRANCH_RE))
    )
    for i, (pname, ptype) in enumerate(params):
        out.append(
            row(path, "param", pname, parent=fname, start=ln, end=ln,
                position=i, param_type=ptype or None)
        )
    if ret:
        out.append(
            row(path, "param", "", parent=fname, start=ln, end=ln, position=0,
                param_type=ret, is_return=True)
        )


def parse_ts(path: str, source: str, row) -> list[tuple]:
    """TypeScript/JavaScript extraction: classes (+methods), interfaces
    (+member fields), type aliases, functions (incl. top-level arrow
    consts), const/let/var data rows, imports (ESM + require), calls,
    params/returns, complexity."""
    masked = mask_code(source, raw_strings="`")
    starts = line_starts(source)
    out: list[tuple] = []
    func_spans: list[tuple[int, int, str]] = []
    class_spans: list[tuple[int, int, str]] = []

    for m in _TS_IMPORT_RE.finditer(source):
        ln = line_of(starts, m.start())
        out.append(
            row(path, "import", m.group(2), start=ln, end=ln,
                detail=(m.group(1) or "").strip() or None)
        )
    for m in _TS_REQUIRE_RE.finditer(source):
        ln = line_of(starts, m.start())
        out.append(row(path, "import", m.group(2), start=ln, end=ln,
                       detail=m.group(1)))

    for m in _TS_CLASS_RE.finditer(masked):
        name = m.group(1)
        ln = line_of(starts, m.start(1))
        b_open = masked.find("{", m.end())
        b_close = match_brace(masked, b_open) if b_open != -1 else m.end()
        end_ln = line_of(starts, b_close)
        detail = " ".join(
            s.strip() for s in (m.group(2), m.group(3)) if s
        ) or None
        out.append(row(path, "type", name, start=ln, end=end_ln,
                       detail=f"class{' ' + detail if detail else ''}"))
        class_spans.append((b_open, b_close, name))

    for m in _TS_IFACE_RE.finditer(masked):
        name = m.group(1)
        ln = line_of(starts, m.start(1))
        b_open = masked.find("{", m.end())
        b_close = match_brace(masked, b_open) if b_open != -1 else m.end()
        end_ln = line_of(starts, b_close)
        ext = (m.group(2) or "").strip() or None
        out.append(row(path, "type", name, start=ln, end=end_ln,
                       detail=f"interface{' ' + ext if ext else ''}"))
        pos = 0
        for ln0 in range(ln, end_ln - 1):
            raw_line = line_text(source, starts, ln0 + 1)
            fm = _TS_IFACE_MEMBER_RE.match(raw_line)
            if fm:
                ftype = raw_line.split(":", 1)[1].strip().rstrip(";") if ":" in raw_line else None
                out.append(
                    row(path, "field", fm.group(1), parent=name,
                        start=ln0 + 1, end=ln0 + 1, position=pos,
                        param_type=ftype,
                        detail="optional" if fm.group(2) else None)
                )
                pos += 1

    for m in _TS_FUNC_RE.finditer(masked):
        _ts_emit_function(
            out, row, path, masked, source, starts, m, m.group(1), None,
            func_spans,
        )

    # class methods: member-position identifiers followed by ( inside a
    # class body at member depth (class depth + 1). `\s*` in the regex
    # spans blank lines, so scan positions from consecutive newlines can
    # hit the SAME identifier — dedupe on the identifier offset.
    for c_open, c_close, cname in class_spans:
        depth_at = 0
        seen_at: set[int] = set()
        i = c_open + 1
        while i < c_close:
            ch = masked[i]
            if ch == "{":
                depth_at += 1
            elif ch == "}":
                depth_at -= 1
            elif ch == "\n" and depth_at == 0:
                mm = _TS_METHOD_RE.match(masked, i + 1)
                if (
                    mm
                    and mm.end() <= c_close
                    and mm.start(1) not in seen_at
                    and (
                        mm.group(1) == "constructor"
                        or mm.group(1) not in _TS_KEYWORDS
                    )
                ):
                    seen_at.add(mm.start(1))
                    _ts_emit_function(
                        out, row, path, masked, source, starts, mm,
                        mm.group(1), cname, func_spans,
                    )
            i += 1

    for m in _TS_ALIAS_RE.finditer(masked):
        ln = line_of(starts, m.start(1))
        out.append(row(path, "type", m.group(1), start=ln, end=ln,
                       detail="alias"))

    # top-level const/let/var — arrow/function-expression initializers
    # become function rows (the dominant JS/TS function style)
    for m in _TS_VALUE_RE.finditer(masked):
        pos = m.start()
        if any(s <= pos <= e for s, e, _ in class_spans) or any(
            s <= pos <= e for s, e, _ in func_spans
        ):
            continue
        kw, name = m.group(1), m.group(2)
        ln = line_of(starts, pos)
        arrow_params = None  # (params, body_search_from) when a function
        if m.group(4) == "=":
            rhs = m.end(4)
            rm = re.match(r"\s*(?:async\s+)?", masked[rhs:])
            rhs += rm.end()
            if masked.startswith("function", rhs):
                p_open = masked.find("(", rhs)
                p_close = match_paren(masked, p_open)
                arrow_params = (source[p_open + 1 : p_close], p_close)
            elif masked[rhs : rhs + 1] == "(":
                p_close = match_paren(masked, rhs)
                # `(...)` then optional `: Type` then `=>` marks an arrow
                trail = masked[p_close + 1 : p_close + 120]
                if "=>" in trail.split("\n", 1)[0] or re.match(
                    r"\s*:\s*[^=\n]+=>", trail
                ):
                    arrow_params = (source[rhs + 1 : p_close], p_close)
            else:
                sm = re.match(r"([\w$]+)\s*=>", masked[rhs:])
                if sm:  # single-param arrow: `const f = x => ...`
                    arrow_params = (sm.group(1), rhs + sm.end())
        if arrow_params is not None:
            raw_params, body_from = arrow_params
            params = _ts_params(raw_params)
            b_open = masked.find("{", body_from)
            stmt_end = masked.find("\n", body_from)
            end_ln, body = ln, ""
            # a `{` belongs to this function only if it opens right after
            # the arrow/params (same statement), not a later block
            if b_open != -1 and (stmt_end == -1 or b_open < stmt_end + 2):
                b_close = match_brace(masked, b_open)
                end_ln = line_of(starts, b_close)
                body = masked[b_open:b_close]
                func_spans.append((b_open, b_close, name))
            out.append(
                row(path, "function", name, start=ln, end=end_ln,
                    n_params=len(params),
                    complexity=cyclomatic(body, _TS_BRANCH_RE),
                    detail="arrow")
            )
            for i, (pname, ptype) in enumerate(params):
                out.append(
                    row(path, "param", pname, parent=name, start=ln, end=ln,
                        position=i, param_type=ptype or None)
                )
            continue
        typ = (m.group(3) or "").strip() or None
        value = None
        if m.group(4) == "=":  # first value line (ConstantInfo.Value parity)
            eol = source.find("\n", m.end(4))
            eol = len(source) if eol == -1 else eol
            value = source[m.end(4) : eol].strip().rstrip(";") or None
        out.append(
            row(path, "const" if kw == "const" else "var", name, start=ln,
                end=ln, param_type=typ, detail=value)
        )

    for parent, name, ln in extract_calls(
        masked, source, starts, func_spans, _TS_KEYWORDS
    ):
        out.append(row(path, "call", name, parent=parent, start=ln, end=ln))
    return out


parse_js = parse_ts  # same grammar family (typescript.go:374-385)


# ---------------------------------------------------------------------------
# Rust  (contract: parsers/rust.go:90-107 — struct/enum/trait/impl/fn/
# const/static items)
# ---------------------------------------------------------------------------

_RUST_KEYWORDS = frozenset(
    "if for while match loop return fn let mut impl struct enum trait use "
    "pub mod const static else break continue move ref where unsafe async "
    "await dyn Box Some None Ok Err".split()
)
_RUST_BRANCH_RE = re.compile(r"\b(?:if|for|while|match)\b")
_RUST_TYPE_RE = re.compile(
    r"^\s*(?:pub(?:\([\w:]+\))?\s+)?(struct|enum|trait|union)\s+(\w+)", re.M
)
_RUST_IMPL_RE = re.compile(
    r"^\s*impl(?:<[^>{]*>)?\s+(?:([\w:]+)(?:<[^>{]*>)?\s+for\s+)?([\w:]+)", re.M
)
_RUST_FN_RE = re.compile(
    r"^\s*(?:pub(?:\([\w:]+\))?\s+)?(?:async\s+)?(?:unsafe\s+)?(?:extern\s+\S+\s+)?"
    r"fn\s+(\w+)\s*(?:<[^>(]*>)?\s*\(",
    re.M,
)
_RUST_USE_RE = re.compile(r"^\s*(?:pub\s+)?use\s+([^;]+);", re.M)
_RUST_VALUE_RE = re.compile(
    r"^\s*(?:pub(?:\([\w:]+\))?\s+)?(const|static)\s+(?:mut\s+)?(\w+)\s*:\s*([^=;]+)",
    re.M,
)
_RUST_FIELD_RE = re.compile(r"^\s*(?:pub(?:\([\w:]+\))?\s+)?(\w+)\s*:\s*(.+?),?\s*$")

# Brace-form macros: `macro_rules! name { ... }` definitions and
# `name! { ... }` invocations (quote!/html!/lazy_static!). `!=` cannot
# match: the brace must follow `ident!` (plus the name, for
# macro_rules) modulo whitespace.
_RUST_MACRO_BRACE_RE = re.compile(r"\b(?:macro_rules!\s*\w+\s*\{|\w+!\s*\{)")


def mask_rust_macro_bodies(masked: str) -> str:
    """Blank the brace-delimited bodies of Rust macros, preserving
    newlines/offsets. Macro bodies are uninterpreted token trees — a
    `fn phantom()` inside `macro_rules!` (or `quote!`, `html!`) is not a
    declaration and must not be extracted; tree-sitter likewise parses
    them as token-tree nodes, not items (parsers/rust.go:90-107).
    Documented degrade: branch keywords/call names inside macro bodies no
    longer count toward complexity/call extraction."""
    out = list(masked)
    pos = 0
    while True:
        m = _RUST_MACRO_BRACE_RE.search(masked, pos)
        if not m:
            break
        b_open = m.end() - 1
        b_close = match_brace(masked, b_open)
        for i in range(b_open + 1, b_close):
            if out[i] != "\n":
                out[i] = " "
        pos = b_close + 1
    return "".join(out)


def parse_rust(path: str, source: str, row) -> list[tuple]:
    """Rust extraction: struct/enum/trait/union types (+ struct fields),
    impl-block methods with the impl target as receiver, free functions,
    use imports, const/static data, calls, complexity. `'` is NOT a
    string delimiter here (lifetimes have no closing quote); closed char
    literals are blanked separately so ``'{'``/``'}'`` cannot unbalance
    brace matching while ``&'a str`` survives."""
    masked = mask_rust_macro_bodies(
        mask_code(mask_char_literals(source), strings='"')
    )
    starts = line_starts(source)
    out: list[tuple] = []
    func_spans: list[tuple[int, int, str]] = []

    for m in _RUST_USE_RE.finditer(masked):
        ln = line_of(starts, m.start(1))
        out.append(row(path, "import", source[m.start(1):m.end(1)].strip(),
                       start=ln, end=ln))

    for m in _RUST_VALUE_RE.finditer(masked):
        ln = line_of(starts, m.start(2))
        raw_line = line_text(source, starts, ln)
        value = raw_line.split("=", 1)[1].strip().rstrip(";") if "=" in raw_line else None
        out.append(row(path, "const" if m.group(1) == "const" else "var",
                       m.group(2), start=ln, end=ln,
                       param_type=m.group(3).strip(), detail=value))

    for m in _RUST_TYPE_RE.finditer(masked):
        kind, name = m.group(1), m.group(2)
        ln = line_of(starts, m.start(2))
        b_open = masked.find("{", m.end())
        semi = masked.find(";", m.end())
        end_ln = ln
        if b_open != -1 and (semi == -1 or b_open < semi):
            b_close = match_brace(masked, b_open)
            end_ln = line_of(starts, b_close)
            if kind == "struct":
                pos = 0
                for ln0 in range(ln, end_ln - 1):
                    raw_line = line_text(source, starts, ln0 + 1)
                    fm = _RUST_FIELD_RE.match(raw_line)
                    if fm and fm.group(1) not in _RUST_KEYWORDS:
                        out.append(row(path, "field", fm.group(1), parent=name,
                                       start=ln0 + 1, end=ln0 + 1, position=pos,
                                       param_type=fm.group(2).strip().rstrip(",")))
                        pos += 1
        out.append(row(path, "type", name, start=ln, end=end_ln,
                       detail="interface" if kind == "trait" else kind))

    # impl blocks give their target as the receiver for contained fns
    impl_spans: list[tuple[int, int, str, str | None]] = []
    for m in _RUST_IMPL_RE.finditer(masked):
        b_open = masked.find("{", m.end())
        if b_open == -1:
            continue
        b_close = match_brace(masked, b_open)
        target = m.group(2).split("::")[-1]
        trait = m.group(1).split("::")[-1] if m.group(1) else None
        impl_spans.append((b_open, b_close, target, trait))

    # trait bodies: methods there belong to the trait (interface methods)
    trait_spans: list[tuple[int, int, str]] = []
    for m in _RUST_TYPE_RE.finditer(masked):
        if m.group(1) == "trait":
            b_open = masked.find("{", m.end())
            if b_open != -1:
                trait_spans.append((b_open, match_brace(masked, b_open), m.group(2)))

    for m in _RUST_FN_RE.finditer(masked):
        fname = m.group(1)
        ln = line_of(starts, m.start(1))
        p_open = masked.find("(", m.end() - 1)
        p_close = match_paren(masked, p_open)
        items = split_top_level(source[p_open + 1: p_close])
        parent = None
        for s, e, target, trait in impl_spans:
            if s <= m.start() <= e:
                parent = target
        if parent is None:
            for s, e, tname in trait_spans:
                if s <= m.start() <= e:
                    parent = tname
        b_open = masked.find("{", p_close)
        semi = masked.find(";", p_close)
        ret = ""
        sig_end = b_open if b_open != -1 and (semi == -1 or b_open < semi) else semi
        if sig_end != -1:
            between = source[p_close + 1: sig_end].strip()
            if between.startswith("->"):
                ret = between[2:].strip()
        end_ln, body = ln, ""
        if b_open != -1 and (semi == -1 or b_open < semi):
            b_close = match_brace(masked, b_open)
            end_ln = line_of(starts, b_close)
            body = masked[b_open:b_close]
            func_spans.append((b_open, b_close, fname))
        out.append(row(path, "function", fname, parent=parent, start=ln,
                       end=end_ln, n_params=len(items),
                       is_method=parent is not None,
                       complexity=cyclomatic(body, _RUST_BRANCH_RE)))
        for i, item in enumerate(items):
            name_part, _, typ = item.partition(":")
            out.append(row(path, "param", name_part.strip().lstrip("&").replace("mut ", "").strip(),
                           parent=fname, start=ln, end=ln, position=i,
                           param_type=typ.strip() or None))
        if ret:
            out.append(row(path, "param", "", parent=fname, start=ln, end=ln,
                           position=0, param_type=ret, is_return=True))

    for parent, name, ln in extract_calls(masked, source, starts, func_spans,
                                          _RUST_KEYWORDS):
        out.append(row(path, "call", name, parent=parent, start=ln, end=ln))
    return out


# ---------------------------------------------------------------------------
# Java  (contract: parsers/java.go:110-121 — class/interface/enum/fields)
# ---------------------------------------------------------------------------

_JAVA_KEYWORDS = frozenset(
    "if for while switch catch return new else do try synchronized throw "
    "this super class interface enum import package public private protected "
    "static final abstract void case break continue instanceof assert".split()
)
_JAVA_BRANCH_RE = re.compile(r"\b(?:if|for|while|case|catch)\b")
_JAVA_TYPE_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|static|final|abstract)\s+)*"
    r"(class|interface|enum)\s+(\w+)",
    re.M,
)
_JAVA_IMPORT_RE = re.compile(r"^\s*import\s+(?:static\s+)?([\w.\*]+);", re.M)
_JAVA_MEMBER_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|static|final|abstract|synchronized|"
    r"native|default|transient|volatile)\s+)*"
    r"(?:([\w<>\[\],\.\s]+?)\s+)?(\w+)\s*\(",
    re.M,
)
_JAVA_FIELD_RE = re.compile(
    r"^\s*((?:(?:public|private|protected|static|final|transient|volatile)\s+)*)"
    r"([\w<>\[\],\.]+)\s+(\w+)\s*(?:=\s*(.+?))?;\s*$",
)


def parse_java(path: str, source: str, row) -> list[tuple]:
    """Java extraction: class/interface/enum types, member methods (ctor =
    method named like its class), fields (static final => const), package
    + imports, calls, complexity. Text blocks are blanked first so their
    contents cannot desync string masking."""
    masked = mask_code(mask_text_blocks(source))
    starts = line_starts(source)
    out: list[tuple] = []
    func_spans: list[tuple[int, int, str]] = []

    m = re.search(r"^\s*package\s+([\w.]+);", masked, re.M)
    if m:
        ln = line_of(starts, m.start(1))
        out.append(row(path, "package", m.group(1), start=ln, end=ln))

    for m in _JAVA_IMPORT_RE.finditer(masked):
        ln = line_of(starts, m.start(1))
        out.append(row(path, "import", m.group(1), start=ln, end=ln))

    type_spans: list[tuple[int, int, str]] = []
    for m in _JAVA_TYPE_RE.finditer(masked):
        kind, name = m.group(1), m.group(2)
        ln = line_of(starts, m.start(2))
        b_open = masked.find("{", m.end())
        end_ln = ln
        if b_open != -1:
            b_close = match_brace(masked, b_open)
            end_ln = line_of(starts, b_close)
            type_spans.append((b_open, b_close, name))
        out.append(row(path, "type", name, start=ln, end=end_ln, detail=kind))

    for c_open, c_close, cname in type_spans:
        # member depth scan (same shape as the TS class scan)
        depth_at, seen_at, i = 0, set(), c_open + 1
        field_pos = 0
        while i < c_close:
            ch = masked[i]
            if ch == "{":
                depth_at += 1
            elif ch == "}":
                depth_at -= 1
            elif ch == "\n" and depth_at == 0:
                nl_end = masked.find("\n", i + 1)
                nl_end = c_close if nl_end == -1 else min(nl_end, c_close)
                mline = masked[i + 1: nl_end]
                raw_line = source[i + 1: nl_end]
                fm = _JAVA_FIELD_RE.match(mline)
                if fm and fm.group(3) not in _JAVA_KEYWORDS and fm.group(2) not in (
                    "return", "throw"
                ):
                    ln0 = line_of(starts, i + 1)
                    mods = fm.group(1)
                    value = (raw_line.split("=", 1)[1].strip().rstrip(";")
                             if "=" in raw_line else None)
                    kind = ("const" if "static" in mods and "final" in mods
                            else "field")
                    out.append(row(path, kind, fm.group(3), parent=cname,
                                   start=ln0, end=ln0, position=field_pos,
                                   param_type=fm.group(2), detail=value))
                    field_pos += 1
                else:
                    mm = _JAVA_MEMBER_RE.match(masked, i + 1)
                    if (mm and mm.end() <= c_close and mm.start(2) not in seen_at
                            and mm.group(2) not in _JAVA_KEYWORDS):
                        seen_at.add(mm.start(2))
                        fname = mm.group(2)
                        ln0 = line_of(starts, mm.start(2))
                        p_open = masked.find("(", mm.end() - 1)
                        p_close = match_paren(masked, p_open)
                        items = split_top_level(source[p_open + 1: p_close])
                        b_open = masked.find("{", p_close)
                        semi = masked.find(";", p_close)
                        end_ln, body = ln0, ""
                        if b_open != -1 and (semi == -1 or b_open < semi):
                            b_close = match_brace(masked, b_open)
                            end_ln = line_of(starts, b_close)
                            body = masked[b_open:b_close]
                            func_spans.append((b_open, b_close, fname))
                        ret = (mm.group(1) or "").strip() or None
                        out.append(row(path, "function", fname, parent=cname,
                                       start=ln0, end=end_ln,
                                       n_params=len(items), is_method=True,
                                       complexity=cyclomatic(body, _JAVA_BRANCH_RE)))
                        for pi, item in enumerate(items):
                            toks = item.rsplit(None, 1)
                            pname = toks[-1] if toks else f"arg{pi}"
                            ptype = toks[0] if len(toks) == 2 else None
                            out.append(row(path, "param", pname, parent=fname,
                                           start=ln0, end=ln0, position=pi,
                                           param_type=ptype))
                        if ret and ret != "void" and fname != cname:
                            out.append(row(path, "param", "", parent=fname,
                                           start=ln0, end=ln0, position=0,
                                           param_type=ret, is_return=True))
            i += 1

    for parent, name, ln in extract_calls(masked, source, starts, func_spans,
                                          _JAVA_KEYWORDS):
        out.append(row(path, "call", name, parent=parent, start=ln, end=ln))
    return out


# ---------------------------------------------------------------------------
# C / C++  (contract: parsers/c.go:98-108 — struct/union/enum,
# function_definition, declaration)
# ---------------------------------------------------------------------------

_C_KEYWORDS = frozenset(
    "if for while switch return sizeof else do case break continue goto "
    "struct union enum typedef static const extern inline void defined "
    "include define ifdef ifndef endif pragma".split()
)
_C_BRANCH_RE = re.compile(r"\b(?:if|for|while|case)\b")
_C_INCLUDE_RE = re.compile(r'^\s*#\s*include\s+[<"]([^>"]+)[>"]', re.M)
_C_DEFINE_RE = re.compile(r"^\s*#\s*define\s+(\w+)(?:\s+(.+?))?\s*$", re.M)
_C_TYPE_RE = re.compile(r"^\s*(?:typedef\s+)?(struct|union|enum)\s+(\w+)\s*\{", re.M)
_C_TYPEDEF_RE = re.compile(r"^\s*typedef\s+(.+?)\s+(\w+)\s*;", re.M)
_C_GLOBAL_RE = re.compile(
    r"^\s*((?:static\s+|const\s+|extern\s+)*)([\w\*]+(?:\s+[\w\*]+)*?)\s+"
    r"\**(\w+)\s*=\s*",
    re.M,
)
_C_FUNC_RE = re.compile(
    r"^([\w\*]+(?:\s+[\w\*]+)*?)\s*\**\s*(\w+)\s*\(", re.M
)
_C_FIELD_RE = re.compile(r"^\s*((?:struct\s+|unsigned\s+|const\s+)?[\w\*]+)\s+"
                         r"\**(\w+)(?:\[[^\]]*\])?\s*;")


def parse_c(path: str, source: str, row) -> list[tuple]:
    """C/C++ extraction: #include imports, #define + global consts,
    struct/union/enum types (+ struct fields), typedef aliases, top-level
    function DEFINITIONS (body present), calls, complexity. ``#if 0``
    regions and C++ raw strings are blanked first — both may contain
    unbalanced braces/quotes."""
    masked = mask_code(mask_cpp_raw_strings(mask_if0_regions(source)))
    starts = line_starts(source)
    out: list[tuple] = []
    func_spans: list[tuple[int, int, str]] = []

    for m in _C_INCLUDE_RE.finditer(masked):
        ln = line_of(starts, m.start(1))
        out.append(row(path, "import", m.group(1), start=ln, end=ln))
    for m in _C_DEFINE_RE.finditer(source):
        ln = line_of(starts, m.start(1))
        out.append(row(path, "const", m.group(1), start=ln, end=ln,
                       detail=(m.group(2) or "").strip() or None))
    for m in _C_GLOBAL_RE.finditer(masked):
        if m.group(2).strip() in ("return",):
            continue
        ln = line_of(starts, m.start(3))
        # only top-level globals: crude but effective — must start at col 0
        if source[starts[ln - 1]] in " \t":
            continue
        raw_line = line_text(source, starts, ln)
        value = raw_line.split("=", 1)[1].strip().rstrip(";") if "=" in raw_line else None
        kind = "const" if "const" in m.group(1) else "var"
        out.append(row(path, kind, m.group(3), start=ln, end=ln,
                       param_type=m.group(2).strip(), detail=value))

    for m in _C_TYPE_RE.finditer(masked):
        kind, name = m.group(1), m.group(2)
        ln = line_of(starts, m.start(2))
        b_open = masked.find("{", m.start())
        b_close = match_brace(masked, b_open)
        end_ln = line_of(starts, b_close)
        if kind in ("struct", "union"):
            pos = 0
            for ln0 in range(ln, end_ln - 1):
                fm = _C_FIELD_RE.match(line_text(source, starts, ln0 + 1))
                if fm:
                    out.append(row(path, "field", fm.group(2), parent=name,
                                   start=ln0 + 1, end=ln0 + 1, position=pos,
                                   param_type=fm.group(1).strip()))
                    pos += 1
        out.append(row(path, "type", name, start=ln, end=end_ln, detail=kind))

    for m in _C_TYPEDEF_RE.finditer(masked):
        ln = line_of(starts, m.start(2))
        out.append(row(path, "type", m.group(2), start=ln, end=ln,
                       detail="alias", param_type=m.group(1).strip()))

    for m in _C_FUNC_RE.finditer(masked):
        ret_t, fname = m.group(1).strip(), m.group(2)
        first_tok = ret_t.split()[0] if ret_t else ""
        # reject statement keywords masquerading as return types
        # ("return foo(...)", "typedef ..."), but keep real type keywords
        # (void/struct/unsigned/...)
        if fname in _C_KEYWORDS or first_tok in (
            "typedef", "return", "else", "do", "goto", "case", "sizeof"
        ):
            continue
        p_open = masked.find("(", m.end() - 1)
        p_close = match_paren(masked, p_open)
        b_open = masked.find("{", p_close)
        semi = masked.find(";", p_close)
        if b_open == -1 or (semi != -1 and semi < b_open):
            continue  # prototype, not a definition
        between = masked[p_close + 1: b_open].strip()
        if between:
            continue  # not a function header (e.g. struct init)
        ln = line_of(starts, m.start(2))
        items = [
            it for it in split_top_level(source[p_open + 1: p_close])
            if it != "void"
        ]
        b_close = match_brace(masked, b_open)
        end_ln = line_of(starts, b_close)
        body = masked[b_open:b_close]
        func_spans.append((b_open, b_close, fname))
        out.append(row(path, "function", fname, start=ln, end=end_ln,
                       n_params=len(items),
                       complexity=cyclomatic(body, _C_BRANCH_RE)))
        for i, item in enumerate(items):
            toks = item.replace("*", " ").rsplit(None, 1)
            pname = toks[-1] if toks else f"arg{i}"
            ptype = item[: item.rfind(pname)].strip() if pname in item else None
            out.append(row(path, "param", pname, parent=fname, start=ln,
                           end=ln, position=i, param_type=ptype or None))
        if ret_t and ret_t != "void":
            out.append(row(path, "param", "", parent=fname, start=ln, end=ln,
                           position=0, param_type=ret_t, is_return=True))

    for parent, name, ln in extract_calls(masked, source, starts, func_spans,
                                          _C_KEYWORDS):
        out.append(row(path, "call", name, parent=parent, start=ln, end=ln))
    return out


# ---------------------------------------------------------------------------
# PHP  (contract: parsers/php.go:107-119 — class/interface/trait,
# function_definition, const_declaration)
# ---------------------------------------------------------------------------

_PHP_KEYWORDS = frozenset(
    "if for foreach while switch catch return new else do try function "
    "echo print isset unset empty array list require include use namespace "
    "public private protected static final abstract const class interface "
    "trait case break continue throw match".split()
)
_PHP_BRANCH_RE = re.compile(r"\b(?:if|for|foreach|while|case|catch)\b")
_PHP_TYPE_RE = re.compile(
    r"^\s*(?:(?:final|abstract|readonly)\s+)*(class|interface|trait)\s+(\w+)",
    re.M,
)
_PHP_USE_RE = re.compile(r"^\s*use\s+([\w\\]+)(?:\s+as\s+(\w+))?\s*;", re.M)
_PHP_CONST_RE = re.compile(
    r"^\s*(?:(?:public|private|protected)\s+)?const\s+(\w+)\s*=", re.M
)
_PHP_FUNC_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|static|final|abstract)\s+)*"
    r"function\s+(\w+)\s*\(",
    re.M,
)
_PHP_PROP_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|static|readonly)\s+)+"
    r"([\?\w\\\[\]]+\s+)?\$(\w+)\s*[=;]",
)


def parse_php(path: str, source: str, row) -> list[tuple]:
    """PHP extraction: class/interface/trait types (+ typed properties as
    fields), methods/functions with typed params and return types, use
    imports, const rows, calls, complexity. Heredoc/nowdoc bodies are
    blanked first — declaration-shaped text inside them must not emit
    phantom entities."""
    masked = mask_code(mask_php_heredocs(source))
    starts = line_starts(source)
    out: list[tuple] = []
    func_spans: list[tuple[int, int, str]] = []

    m = re.search(r"^\s*namespace\s+([\w\\]+);", masked, re.M)
    if m:
        ln = line_of(starts, m.start(1))
        out.append(row(path, "package", m.group(1), start=ln, end=ln))

    for m in _PHP_USE_RE.finditer(masked):
        # class-body `use TraitName;` lines also match; keep both — trait
        # mixins ARE imports of behavior
        ln = line_of(starts, m.start(1))
        out.append(row(path, "import", m.group(1), start=ln, end=ln,
                       detail=m.group(2)))

    for m in _PHP_CONST_RE.finditer(masked):
        ln = line_of(starts, m.start(1))
        raw_line = line_text(source, starts, ln)
        value = raw_line.split("=", 1)[1].strip().rstrip(";") if "=" in raw_line else None
        out.append(row(path, "const", m.group(1), start=ln, end=ln, detail=value))

    type_spans: list[tuple[int, int, str]] = []
    for m in _PHP_TYPE_RE.finditer(masked):
        kind, name = m.group(1), m.group(2)
        ln = line_of(starts, m.start(2))
        b_open = masked.find("{", m.end())
        end_ln = ln
        if b_open != -1:
            b_close = match_brace(masked, b_open)
            end_ln = line_of(starts, b_close)
            type_spans.append((b_open, b_close, name))
        out.append(row(path, "type", name, start=ln, end=end_ln, detail=kind))

    # typed properties as field rows
    for c_open, c_close, cname in type_spans:
        pos = 0
        for ln0 in range(line_of(starts, c_open), line_of(starts, c_close) - 1):
            fm = _PHP_PROP_RE.match(line_text(masked, starts, ln0 + 1))
            if fm:
                out.append(row(path, "field", fm.group(2), parent=cname,
                               start=ln0 + 1, end=ln0 + 1, position=pos,
                               param_type=(fm.group(1) or "").strip() or None))
                pos += 1

    for m in _PHP_FUNC_RE.finditer(masked):
        fname = m.group(1)
        ln = line_of(starts, m.start(1))
        parent = None
        for s, e, cname in type_spans:
            if s <= m.start() <= e:
                parent = cname
        p_open = masked.find("(", m.end() - 1)
        p_close = match_paren(masked, p_open)
        items = split_top_level(source[p_open + 1: p_close])
        b_open = masked.find("{", p_close)
        semi = masked.find(";", p_close)
        ret = ""
        sig_end = b_open if b_open != -1 and (semi == -1 or b_open < semi) else semi
        if sig_end != -1:
            between = source[p_close + 1: sig_end].strip()
            if between.startswith(":"):
                ret = between[1:].strip()
        end_ln, body = ln, ""
        if b_open != -1 and (semi == -1 or b_open < semi):
            b_close = match_brace(masked, b_open)
            end_ln = line_of(starts, b_close)
            body = masked[b_open:b_close]
            func_spans.append((b_open, b_close, fname))
        out.append(row(path, "function", fname, parent=parent, start=ln,
                       end=end_ln, n_params=len(items),
                       is_method=parent is not None,
                       complexity=cyclomatic(body, _PHP_BRANCH_RE)))
        for i, item in enumerate(items):
            item = item.split("=", 1)[0].strip()
            pm = re.match(r"(?:([\?\w\\\|\[\]]+)\s+)?[&.]*\$(\w+)", item)
            if pm:
                out.append(row(path, "param", pm.group(2), parent=fname,
                               start=ln, end=ln, position=i,
                               param_type=pm.group(1)))
        if ret:
            out.append(row(path, "param", "", parent=fname, start=ln, end=ln,
                           position=0, param_type=ret, is_return=True))

    for parent, name, ln in extract_calls(masked, source, starts, func_spans,
                                          _PHP_KEYWORDS):
        out.append(row(path, "call", name, parent=parent, start=ln, end=ln))
    return out


# ---------------------------------------------------------------------------
# Ruby  (contract: parsers/ruby.go:96-108 — class/module/method/assignment;
# block structure is keyword...end, not braces)
# ---------------------------------------------------------------------------

_RUBY_KEYWORDS = frozenset(
    "if unless while until case begin do end def class module return puts "
    "print require require_relative attr_reader attr_writer attr_accessor "
    "new raise yield lambda proc loop then else elsif when rescue ensure "
    "include extend".split()
)
_RUBY_BRANCH_RE = re.compile(r"^\s*(?:if|unless|while|until|when|elsif|rescue)\b", re.M)
_RUBY_OPENER_RE = re.compile(
    r"^\s*(?:(class|module)\s+([A-Z]\w*)|(def)\s+(?:self\.)?([\w?!=\[\]<>+\-*\/%]+)"
    r"|(if|unless|while|until|case|begin)\b)"
)
_RUBY_REQUIRE_RE = re.compile(r"""^\s*require(?:_relative)?\s+['"]([^'"]+)['"]""", re.M)


def parse_ruby(path: str, source: str, row) -> list[tuple]:
    """Ruby extraction via keyword...end block tracking (no braces):
    class/module types, def methods with their enclosing class as
    receiver, require imports, UPPERCASE constants and $globals,
    paren-call sites, complexity. Modifier-position if/unless (trailing)
    do not open blocks; `do` blocks and one-line `{ }` blocks close on
    the same structure they opened on. Heredoc bodies are blanked first
    (keyword-shaped text inside them must not open/close blocks)."""
    masked = mask_code(
        mask_ruby_heredocs(source), line_comment="#", block_comment=None
    )
    starts = line_starts(source)
    lines_m = masked.split("\n")
    lines_r = source.split("\n")
    out: list[tuple] = []
    # stack of (kind, name, start_line) — kind in class/module/def/other
    stack: list[tuple[str, str | None, int]] = []
    func_lines: dict[str, tuple[int, int]] = {}
    spans: list[tuple[int, int, str]] = []  # line spans for defs
    type_rows: list[tuple] = []

    for m in _RUBY_REQUIRE_RE.finditer(source):
        ln = line_of(starts, m.start(1))
        out.append(row(path, "import", m.group(1), start=ln, end=ln))

    for i, (ml, rl) in enumerate(zip(lines_m, lines_r)):
        ln = i + 1
        stripped = ml.strip()
        if stripped == "end" or stripped.startswith("end "):
            if stack:
                kind, name, s_ln = stack.pop()
                if kind == "def":
                    spans.append((s_ln, ln, name))
                elif kind in ("class", "module"):
                    parent = next(
                        (n for k, n, _ in reversed(stack) if k in ("class", "module")),
                        None,
                    )
                    type_rows.append(row(
                        path, "type", name, parent=parent, start=s_ln, end=ln,
                        detail=kind,
                    ))
            continue
        om = _RUBY_OPENER_RE.match(ml)
        if om:
            if om.group(1):  # class/module
                stack.append((om.group(1), om.group(2), ln))
            elif om.group(3):  # def
                stack.append(("def", om.group(4), ln))
                n_params = 0
                params = []
                pm = re.search(r"\(([^)]*)\)", ml)
                if pm:
                    params = split_top_level(pm.group(1))
                elif ml.strip().startswith("def") and " " in ml.strip():
                    rest = ml.split(om.group(4), 1)[-1].strip()
                    if rest and not rest.startswith("#"):
                        params = split_top_level(rest)
                parent = next(
                    (n for k, n, _ in reversed(stack[:-1]) if k == "class"), None
                )
                func_lines[f"{ln}"] = (ln, len(params))
                # emitted at close (spans) — record params now
                for pi, p in enumerate(params):
                    pname = p.split("=", 1)[0].strip().lstrip("*&")
                    out.append(row(path, "param", pname, parent=om.group(4),
                                   start=ln, end=ln, position=pi))
            else:  # control-flow opener (statement position only)
                stack.append(("other", None, ln))
        # `do` block opener at line end (e.g. `items.each do |x|`)
        elif re.search(r"\bdo\s*(\|[^|]*\|)?\s*$", ml):
            stack.append(("other", None, ln))
        # constants / globals at top or class level (not inside def)
        if not any(k == "def" for k, _, _ in stack):
            cm = re.match(r"^\s*([A-Z][A-Z0-9_]*)\s*=\s*(.+)$", rl)
            gm = re.match(r"^\s*\$(\w+)\s*=\s*(.+)$", rl)
            if cm:
                out.append(row(path, "const", cm.group(1), start=ln, end=ln,
                               detail=cm.group(2).strip()))
            elif gm:
                out.append(row(path, "var", "$" + gm.group(1), start=ln,
                               end=ln, detail=gm.group(2).strip()))

    # close any unterminated blocks at EOF (malformed input tolerance)
    while stack:
        kind, name, s_ln = stack.pop()
        if kind == "def":
            spans.append((s_ln, len(lines_r), name))
        elif kind in ("class", "module"):
            type_rows.append(row(path, "type", name, start=s_ln,
                                 end=len(lines_r), detail=kind))
    out.extend(type_rows)

    # function rows: receiver = innermost class containing the def line
    class_spans = [
        (r_[4], r_[5], r_[2]) for r_ in type_rows if r_[8] == "class"
    ]
    for s_ln, e_ln, fname in spans:
        parent = None
        for cs, ce, cname in class_spans:
            if cs <= s_ln <= ce:
                parent = cname
        n_params = sum(
            1 for r_ in out
            if r_[1] == "param" and r_[3] == fname and r_[4] == s_ln
        )
        body = "\n".join(lines_m[s_ln - 1: e_ln])
        cx = 1 + len(_RUBY_BRANCH_RE.findall(body)) + body.count("&&") + body.count("||")
        out.append(row(path, "function", fname, parent=parent, start=s_ln,
                       end=e_ln, n_params=n_params, is_method=parent is not None,
                       complexity=cx))

    # paren-style calls attributed to the enclosing def
    def_spans_sorted = sorted(spans)
    for m in _CALL_RE.finditer(masked):
        name = m.group(1)
        if name in _RUBY_KEYWORDS:
            continue
        ln = line_of(starts, m.start())
        parent = None
        for s_ln, e_ln, fname in def_spans_sorted:
            if s_ln <= ln <= e_ln:
                parent = fname
        if parent and name != parent:
            out.append(row(path, "call", name, parent=parent, start=ln, end=ln))
    return out


# ---------------------------------------------------------------------------
# C++  (reference routes .cpp to the C parser, parser.go:67-68; this layer
# adds what C lacks: classes with const-qualified methods + initializer
# lists, namespaced types)
# ---------------------------------------------------------------------------

# classes (template-headed or not), plus the template-struct forms the
# C parser cannot see: SPECIALIZATIONS (``template <> struct Hash<int>
# {``, full or partial) and SINGLE-LINE template primaries
# (``template <typename T> struct Box { ... }`` — the C struct regex
# anchors ``struct`` at line start, which a same-line template header
# defeats). Plain structs (and two-line template structs, whose
# ``struct X {`` line the C parser matches) stay with the C parser so
# their fields aren't extracted twice; a specialization defines the
# same base name, so it lands as a second type row at its own line.
_CPP_CLASS_RE = re.compile(
    # the struct-specialization branch REQUIRES the template header
    # (specializations always have one) — without it, ``struct
    # Hash<int> h{1};`` (a brace-initialized variable of a specialized
    # type) would emit a spurious type row
    r"^\s*(?:template\s*<[^>]*>\s*)?class\s+(\w+)[^;{]*\{"
    r"|^\s*template\s*<[^>]*>\s*struct\s+(\w+)\s*<[^>{;]*>[^;{=]*\{"
    r"|^[ \t]*template\s*<[^>]*>[ \t]*struct\s+(\w+)[^;{<]*\{",
    re.M,
)
_CPP_MEMBER_RE = re.compile(
    r"^\s*(?:virtual\s+|static\s+|inline\s+|explicit\s+|constexpr\s+)*"
    r"(?:([\w:<>,&\*\s]+?)\s+)?([\w~]+)\s*\(",
    re.M,
)
_CPP_FIELD_RE = re.compile(
    r"^\s*(?:mutable\s+|static\s+|const\s+)*([\w:<>,\*&]+(?:\s*<[^;]*>)?)\s+"
    r"[&\*]*(\w+)\s*(?:=[^;]*)?;\s*$"
)
_CPP_KEYWORDS = _C_KEYWORDS | frozenset(
    "class public private protected virtual override template typename "
    "namespace new delete this nullptr try catch throw operator".split()
)


def parse_cpp(path: str, source: str, row) -> list[tuple]:
    """C++ extraction: everything the C parser finds (includes, defines,
    globals, structs, typedefs, free functions) plus classes with their
    methods (const qualifiers / initializer lists tolerated) and typed
    member fields."""
    out = parse_c(path, source, row)
    masked = mask_code(mask_cpp_raw_strings(mask_if0_regions(source)))
    starts = line_starts(source)
    func_spans: list[tuple[int, int, str]] = []
    have = {(r[1], r[2], r[4]) for r in out}

    for m in _CPP_CLASS_RE.finditer(masked):
        # 1 = class, 2 = struct specialization, 3 = single-line template
        gi = 1 if m.group(1) else (2 if m.group(2) else 3)
        name = m.group(gi)
        ln = line_of(starts, m.start(gi))
        b_open = masked.find("{", m.start())
        b_close = match_brace(masked, b_open)
        end_ln = line_of(starts, b_close)
        if ("type", name, ln) not in have:
            out.append(row(path, "type", name, start=ln, end=end_ln,
                           detail="class" if gi == 1 else "struct"))
        # member scan at class depth
        depth_at, seen_at, i = 0, set(), b_open + 1
        field_pos = 0
        while i < b_close:
            ch = masked[i]
            if ch == "{":
                depth_at += 1
            elif ch == "}":
                depth_at -= 1
            elif ch == "\n" and depth_at == 0:
                nl_end = masked.find("\n", i + 1)
                nl_end = b_close if nl_end == -1 else min(nl_end, b_close)
                mline = masked[i + 1: nl_end]
                if re.match(r"^\s*(?:public|private|protected)\s*:", mline) or (
                    mline.lstrip().startswith((":", ","))
                ):
                    # access specifiers and constructor initializer-list
                    # continuation lines are not members
                    i += 1
                    continue
                fm = _CPP_FIELD_RE.match(mline)
                mm = _CPP_MEMBER_RE.match(masked, i + 1)
                if fm and fm.group(2) not in _CPP_KEYWORDS:
                    ln0 = line_of(starts, i + 1)
                    out.append(row(path, "field", fm.group(2), parent=name,
                                   start=ln0, end=ln0, position=field_pos,
                                   param_type=fm.group(1)))
                    field_pos += 1
                elif (mm and mm.end() <= b_close and mm.start(2) not in seen_at
                      and mm.group(2).lstrip("~") not in _CPP_KEYWORDS):
                    seen_at.add(mm.start(2))
                    fname = mm.group(2)
                    ln0 = line_of(starts, mm.start(2))
                    p_open = masked.find("(", mm.end() - 1)
                    p_close = match_paren(masked, p_open)
                    items = [
                        it for it in split_top_level(source[p_open + 1: p_close])
                        if it != "void"
                    ]
                    # tolerate `const`, `override`, `noexcept`, `: init(...)`
                    j = p_close + 1
                    while j < b_close:
                        rest = masked[j: j + 40].lstrip()
                        if rest.startswith(("{", ";")):
                            break
                        j += 1
                    end_ln0, body = ln0, ""
                    if j < b_close and masked[j: j + 1] != ";" and "{" in masked[j: j + 2]:
                        mb_open = masked.find("{", p_close)
                        mb_close = match_brace(masked, mb_open)
                        end_ln0 = line_of(starts, mb_close)
                        body = masked[mb_open:mb_close]
                        func_spans.append((mb_open, mb_close, fname))
                    out.append(row(path, "function", fname, parent=name,
                                   start=ln0, end=end_ln0, n_params=len(items),
                                   is_method=True,
                                   complexity=cyclomatic(body, _C_BRANCH_RE)))
                    for pi, item in enumerate(items):
                        item = item.split("=", 1)[0].strip()
                        toks = item.replace("*", " ").replace("&", " ").rsplit(None, 1)
                        pname = toks[-1] if len(toks) == 2 else f"arg{pi}"
                        ptype = item[: item.rfind(pname)].strip() if len(toks) == 2 else item
                        out.append(row(path, "param", pname, parent=fname,
                                       start=ln0, end=ln0, position=pi,
                                       param_type=ptype or None))
            i += 1

    for parent, cname, ln in extract_calls(masked, source, starts, func_spans,
                                           _CPP_KEYWORDS):
        out.append(row(path, "call", cname, parent=parent, start=ln, end=ln))
    return out
