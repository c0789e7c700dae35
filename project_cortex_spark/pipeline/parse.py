"""Parse + 3-tier extraction (D3) and graph extraction (G9).

The reference parses Go with go/ast and 8 other languages with
tree-sitter (internal/indexer/parser.go:49-163, internal/indexer/
parsers/*.go), emitting types/functions/params/fields/calls/imports per
file plus a complexity metric (internal/storage/schema.go:200-249).
The Spark shape is a per-file parse UDF: ``mapInPandas`` over
(file_path, content) batches, one parser process per executor core,
emitting one flat row per entity with a discriminator column.

Language routing (parser.go:49-86) maps extension -> parser through the
``PARSERS`` registry seam. Python parses with the stdlib ``ast`` module
(a full grammar); Go / TypeScript / JavaScript parse with the scanner
parsers in :mod:`.parsers` (comment/string masking + brace matching +
declaration regexes — no tree-sitter wheel exists in this container, so
the extraction CONTRACT is implemented directly rather than ported).
All parsers share the reference's stated call-extraction limitation: no
dynamic dispatch resolution (extractor.go:848-859).

Scale notes: parsing is a narrow batch map (no shuffle); the parse UDF
is CPU-bound Python, which is exactly the workload Arrow batching
amortizes. Entity frames downstream partition by file_path, so the
per-changed-file MERGE (D8/G12) is partition-local.
"""

from __future__ import annotations

import ast as pyast
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import parsers as lang_parsers

# one row per extracted entity; `kind` discriminates the target table
# (files/types/functions/function_parameters/type_fields/imports/calls
# in the reference schema, internal/storage/schema.go:160-279)
ENTITY_SCHEMA = (
    "file_path string, kind string, name string, parent string, "
    "start_line long, end_line long, n_params long, is_method boolean, "
    "detail string, complexity long, position long, param_type string, "
    "is_return boolean"
)

KINDS = (
    "package", "type", "function", "call", "import", "const", "var",
    "param", "field",
)


def _row(
    path: str,
    kind: str,
    name: str,
    *,
    parent: str | None = None,
    start: int = 0,
    end: int = 0,
    n_params: int = 0,
    is_method: bool = False,
    detail: str | None = None,
    complexity: int = 0,
    position: int = 0,
    param_type: str | None = None,
    is_return: bool = False,
) -> tuple:
    return (path, kind, name, parent, start, end, n_params, is_method,
            detail, complexity, position, param_type, is_return)


def _py_complexity(node) -> int:
    """McCabe cyclomatic complexity: 1 + decision points (if/elif, loops,
    except handlers, boolean operators, ternaries, comprehension ifs,
    match cases, asserts) — mirroring schema.go:226's per-function
    complexity column."""
    c = 1
    for n in pyast.walk(node):
        if isinstance(n, (pyast.If, pyast.For, pyast.AsyncFor, pyast.While,
                          pyast.ExceptHandler, pyast.IfExp, pyast.Assert)):
            c += 1
        elif isinstance(n, pyast.BoolOp):
            c += len(n.values) - 1
        elif isinstance(n, pyast.comprehension):
            c += len(n.ifs)
        elif isinstance(n, pyast.match_case):
            c += 1
    return c


def _parse_python(path: str, source: str) -> list[tuple]:
    out: list[tuple] = []
    try:
        tree = pyast.parse(source)
    except SyntaxError as e:
        return [_row(path, "error", "SyntaxError",
                     start=e.lineno or 0, end=e.lineno or 0, detail=str(e.msg))]

    def ann(a) -> str | None:
        return pyast.unparse(a) if a is not None else None

    class V(pyast.NodeVisitor):
        def __init__(self):
            self.klass: list[str] = []
            self.func: list[str] = []

        def visit_ClassDef(self, node):
            bases = ",".join(
                b.id if isinstance(b, pyast.Name) else pyast.unparse(b)
                for b in node.bases
            )
            out.append(_row(path, "type", node.name,
                            parent=self.klass[-1] if self.klass else None,
                            start=node.lineno, end=node.end_lineno,
                            detail=bases))
            # class-body fields (type_fields, schema.go:200-213):
            # annotated and plain class-level assignments
            pos = 0
            for stmt in node.body:
                if isinstance(stmt, pyast.AnnAssign) and isinstance(
                    stmt.target, pyast.Name
                ):
                    out.append(_row(path, "field", stmt.target.id,
                                    parent=node.name, start=stmt.lineno,
                                    end=stmt.end_lineno, position=pos,
                                    param_type=ann(stmt.annotation)))
                    pos += 1
                elif isinstance(stmt, pyast.Assign):
                    for t in stmt.targets:
                        if isinstance(t, pyast.Name):
                            out.append(_row(path, "field", t.id,
                                            parent=node.name,
                                            start=stmt.lineno,
                                            end=stmt.end_lineno, position=pos))
                            pos += 1
            self.klass.append(node.name)
            self.generic_visit(node)
            self.klass.pop()

        def _func(self, node):
            receiver = self.klass[-1] if self.klass else None
            args = node.args
            all_args = args.posonlyargs + args.args + args.kwonlyargs
            out.append(_row(path, "function", node.name, parent=receiver,
                            start=node.lineno, end=node.end_lineno,
                            n_params=len(args.args),
                            is_method=receiver is not None,
                            complexity=_py_complexity(node)))
            # function_parameters rows (schema.go:238-249): position,
            # declared type, varargs flagged, return type as is_return
            for i, a in enumerate(all_args):
                out.append(_row(path, "param", a.arg, parent=node.name,
                                start=node.lineno, end=node.lineno,
                                position=i, param_type=ann(a.annotation)))
            base = len(all_args)
            if args.vararg is not None:
                out.append(_row(path, "param", args.vararg.arg,
                                parent=node.name, start=node.lineno,
                                end=node.lineno, position=base,
                                param_type=ann(args.vararg.annotation),
                                detail="variadic"))
                base += 1
            if args.kwarg is not None:
                out.append(_row(path, "param", args.kwarg.arg,
                                parent=node.name, start=node.lineno,
                                end=node.lineno, position=base,
                                param_type=ann(args.kwarg.annotation),
                                detail="variadic"))
            if node.returns is not None:
                out.append(_row(path, "param", "", parent=node.name,
                                start=node.lineno, end=node.lineno,
                                position=0, param_type=ann(node.returns),
                                is_return=True))
            self.func.append(node.name)
            self.generic_visit(node)
            self.func.pop()

        visit_FunctionDef = _func
        visit_AsyncFunctionDef = _func

        def visit_Call(self, node):
            callee = None
            if isinstance(node.func, pyast.Name):
                callee = node.func.id
            elif isinstance(node.func, pyast.Attribute):
                callee = node.func.attr
            if callee:
                caller = self.func[-1] if self.func else "<module>"
                out.append(_row(path, "call", callee, parent=caller,
                                start=node.lineno, end=node.end_lineno,
                                n_params=len(node.args)))
            self.generic_visit(node)

        def visit_Import(self, node):
            for a in node.names:
                out.append(_row(path, "import", a.name, start=node.lineno,
                                end=node.end_lineno, detail=a.asname))

        def visit_ImportFrom(self, node):
            for a in node.names:
                out.append(_row(path, "import",
                                f"{node.module or ''}.{a.name}",
                                start=node.lineno, end=node.end_lineno,
                                detail=a.asname))

    V().visit(tree)
    # module-level data tier (python.go:99-103 extracts top-level
    # assignments): UPPERCASE names are constants, others variables
    for stmt in tree.body:
        targets = []
        if isinstance(stmt, pyast.Assign):
            targets = [t.id for t in stmt.targets if isinstance(t, pyast.Name)]
            typ = None
        elif isinstance(stmt, pyast.AnnAssign) and isinstance(
            stmt.target, pyast.Name
        ):
            targets = [stmt.target.id]
            typ = pyast.unparse(stmt.annotation)
        for t in targets:
            out.append(_row(path, "const" if t.isupper() else "var", t,
                            start=stmt.lineno, end=stmt.end_lineno,
                            param_type=typ if isinstance(stmt, pyast.AnnAssign)
                            else None))
    return out


def _lang(fn):
    def parse(path: str, source: str) -> list[tuple]:
        return fn(path, source, _row)

    return parse


# extension routing (parser.go:331-358): all 9 reference languages
PARSERS = {
    "py": _parse_python,
    "go": _lang(lang_parsers.parse_go),
    "ts": _lang(lang_parsers.parse_ts),
    "tsx": _lang(lang_parsers.parse_ts),
    "js": _lang(lang_parsers.parse_ts),  # same grammar family
    "jsx": _lang(lang_parsers.parse_ts),
    "mjs": _lang(lang_parsers.parse_ts),
    "rs": _lang(lang_parsers.parse_rust),
    "java": _lang(lang_parsers.parse_java),
    "c": _lang(lang_parsers.parse_c),
    "h": _lang(lang_parsers.parse_c),
    "cpp": _lang(lang_parsers.parse_cpp),
    "cc": _lang(lang_parsers.parse_cpp),
    "hpp": _lang(lang_parsers.parse_cpp),
    "php": _lang(lang_parsers.parse_php),
    "rb": _lang(lang_parsers.parse_ruby),
}


def _language(path: str) -> str:
    return path.rsplit(".", 1)[-1].lower() if "." in path else ""


def parse_entities(files: DataFrame) -> DataFrame:
    """D3/G9: (file_path, content) -> flat entity rows (ENTITY_SCHEMA).

    Unknown languages yield a single ``error`` row instead of failing
    the job (the reference logs-and-skips unparseable files).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["file_path", "kind", "name", "parent", "start_line",
                "end_line", "n_params", "is_method", "detail", "complexity",
                "position", "param_type", "is_return"]
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["file_path"], pdf["content"]):
                lang = _language(path)
                parser = PARSERS.get(lang)
                if parser is None:
                    rows.append(_row(path, "error", "UnsupportedLanguage",
                                     detail=lang))
                    continue
                text = bytes(content).decode("utf-8", errors="replace")
                rows.extend(parser(path, text))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("file_path", "content").mapInPandas(
        run, schema=ENTITY_SCHEMA
    )


def call_edges(entities: DataFrame) -> DataFrame:
    """G9 -> graph feed: intra-corpus call edges (caller, callee) resolved
    by function name where a definition exists (the reference leaves
    callee_function_id NULL for externals, schema.go:266-279; we keep
    unresolved edges out of the traversal frame the same way)."""
    defs = (
        entities.filter(F.col("kind") == "function")
        .select(F.col("name").alias("callee"))
        .distinct()
    )
    calls = entities.filter(F.col("kind") == "call").select(
        F.col("parent").alias("src"), F.col("name").alias("callee")
    )
    return (
        calls.join(F.broadcast(defs), "callee")
        .select("src", F.col("callee").alias("dst"))
        .distinct()
    )


def format_entities(entities: DataFrame) -> DataFrame:
    """D4 NL formatting (formatter.go:19-158): per file, a prose summary
    of its types / functions / imports — pure aggregation + concat
    expressions (embeddings prefer prose, CLAUDE.md:793)."""
    per_kind = (
        entities.filter(
            F.col("kind").isin("type", "function", "import", "const", "var")
        )
        .groupBy("file_path", "kind")
        .agg(F.sort_array(F.collect_set("name")).alias("names"))
    )
    lines = per_kind.select(
        "file_path",
        F.concat(
            F.initcap("kind"),
            F.lit("s: "),
            F.array_join(F.slice("names", 1, 20), ", "),
        ).alias("line"),
        F.col("kind"),
    )
    return (
        lines.groupBy("file_path")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.struct("kind", "line"))).line,
                "\n",
            ).alias("summary")
        )
    )
