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


def line_starts(src: str) -> list[int]:
    starts = [0]
    for i, c in enumerate(src):
        if c == "\n":
            starts.append(i + 1)
    return starts


def line_of(starts: list[int], pos: int) -> int:
    """1-indexed line containing byte offset ``pos``."""
    return bisect_right(starts, pos)


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
    r"^func\s*(?:\(\s*(?:(\w+)\s+)?\*?([\w]+)\s*\)\s*)?(\w+)\s*\(", re.M
)
_GO_TYPE_RE = re.compile(r"^type\s+(\w+)\s+(.+)$", re.M)
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
            raw_line = source[starts[ln0] : starts[ln0 + 1] - 1] if ln0 < len(
                starts
            ) else ""
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
                    raw_line = source[starts[ln0] : starts[ln0 + 1] - 1]
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
                detail=_value_of(source[starts[ln - 1] : starts[ln] - 1]))
        )
    for m in _GO_VALUE_BLOCK_RE.finditer(masked):
        kind = m.group(1)
        close = match_paren(masked, masked.find("(", m.start()))
        for ln0 in range(line_of(starts, m.start()), line_of(starts, close)):
            mline = masked[starts[ln0] : starts[ln0 + 1] - 1]
            vm = re.match(r"^\s*(\w+)(?:\s+([^=\n]+?))?\s*(?:=|$)", mline)
            if vm and vm.group(1) not in ("struct", "interface"):
                typ = (vm.group(2) or "").strip() or None
                out.append(
                    row(path, kind, vm.group(1), start=ln0 + 1, end=ln0 + 1,
                        param_type=typ,
                        detail=_value_of(source[starts[ln0] : starts[ln0 + 1] - 1]))
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
                toks = r.split(None, 1)  # named returns: "err error"
                rtype = toks[1] if len(toks) == 2 else toks[0]
                out.append(
                    row(path, "param", toks[0] if len(toks) == 2 else "",
                        parent=fname, start=ln, end=ln, position=i,
                        param_type=rtype, is_return=True)
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
_TS_CLASS_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+(\w+)"
    r"(\s+extends\s+[\w.]+)?(\s+implements\s+[\w,\s.]+)?",
    re.M,
)
_TS_IFACE_RE = re.compile(
    r"^\s*(?:export\s+)?interface\s+(\w+)(\s+extends\s+[\w,\s.]+)?", re.M
)
_TS_ALIAS_RE = re.compile(r"^\s*(?:export\s+)?type\s+(\w+)\s*=", re.M)
_TS_FUNC_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*(\w+)\s*\(",
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
    r"|get\s+|set\s+|\*\s*)*(\w+)\s*\(",
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
            raw_line = source[starts[ln0] : starts[ln0 + 1] - 1]
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
