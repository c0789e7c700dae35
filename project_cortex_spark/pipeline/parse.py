"""Parse + 3-tier extraction (D3) and graph extraction (G9).

The reference parses Go with go/ast and 8 other languages with
tree-sitter (internal/indexer/parser.go:49-163, internal/indexer/
parsers/*.go), emitting types/functions/params/calls/imports per file.
The Spark shape is a per-file parse UDF: ``mapInPandas`` over
(file_path, content) batches, one parser process per executor core,
emitting one nested row per entity; ``explode``-free because we emit
pre-flattened entity rows with a discriminator column.

Language routing (parser.go:49-86) maps extension -> parser. This
container has no tree-sitter wheel, so the ONLY real parser is Python
via the stdlib ``ast`` module — a genuine parser, not a stub: it
resolves classes, methods (with receiver = enclosing class, mirroring
the reference's is_method/receiver_type), parameter counts, best-effort
call targets (Name / Attribute calls, extractor.go's stated limitations
— no dynamic dispatch resolution, extractor.go:848-859), and imports
with their module paths. Other languages raise cleanly through the
``PARSERS`` registry seam where a tree-sitter-backed parser would drop
in per language.

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

# one row per extracted entity; `kind` discriminates the target table
ENTITY_SCHEMA = (
    "file_path string, kind string, name string, parent string, "
    "start_line long, end_line long, n_params long, is_method boolean, "
    "detail string"
)

KINDS = ("type", "function", "call", "import")


def _parse_python(path: str, source: str) -> list[tuple]:
    out: list[tuple] = []
    try:
        tree = pyast.parse(source)
    except SyntaxError as e:
        return [(path, "error", "SyntaxError", None, e.lineno or 0, e.lineno or 0,
                 0, False, str(e.msg))]

    class V(pyast.NodeVisitor):
        def __init__(self):
            self.klass: list[str] = []
            self.func: list[str] = []

        def visit_ClassDef(self, node):
            bases = ",".join(
                b.id if isinstance(b, pyast.Name) else pyast.unparse(b)
                for b in node.bases
            )
            out.append((path, "type", node.name, self.klass[-1] if self.klass else None,
                        node.lineno, node.end_lineno, 0, False, bases))
            self.klass.append(node.name)
            self.generic_visit(node)
            self.klass.pop()

        def _func(self, node):
            receiver = self.klass[-1] if self.klass else None
            out.append((path, "function", node.name, receiver,
                        node.lineno, node.end_lineno, len(node.args.args),
                        receiver is not None, None))
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
                out.append((path, "call", callee, caller, node.lineno,
                            node.end_lineno, len(node.args), False, None))
            self.generic_visit(node)

        def visit_Import(self, node):
            for a in node.names:
                out.append((path, "import", a.name, None, node.lineno,
                            node.end_lineno, 0, False, a.asname))

        def visit_ImportFrom(self, node):
            for a in node.names:
                out.append((path, "import", f"{node.module or ''}.{a.name}",
                            None, node.lineno, node.end_lineno, 0, False,
                            a.asname))

    V().visit(tree)
    return out


PARSERS = {"py": _parse_python}


def _language(path: str) -> str:
    return path.rsplit(".", 1)[-1].lower() if "." in path else ""


def parse_entities(files: DataFrame) -> DataFrame:
    """D3/G9: (file_path, content) -> flat entity rows (ENTITY_SCHEMA).

    Unknown languages yield a single ``error`` row instead of failing
    the job (the reference logs-and-skips unparseable files).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["file_path", "kind", "name", "parent", "start_line",
                "end_line", "n_params", "is_method", "detail"]
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["file_path"], pdf["content"]):
                lang = _language(path)
                parser = PARSERS.get(lang)
                if parser is None:
                    rows.append((path, "error", "UnsupportedLanguage", None,
                                 0, 0, 0, False, lang))
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
        entities.filter(F.col("kind").isin("type", "function", "import"))
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
