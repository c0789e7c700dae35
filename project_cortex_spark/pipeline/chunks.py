"""Chunking + assembly: D2 routing, D4 NL formatting, D5/D6 chunkers.

Reference behavior being re-expressed:
- D2 code/doc routing by extension (processor.go:196-207) — a ``when``
  over one frame, not two scans.
- D4 NL formatting (formatter.go:19-158): structured extraction ->
  prose, because embeddings prefer prose. Pure ``format_string`` /
  ``concat_ws`` column expressions — whole-stage codegen, no UDF.
- D5 chunk assembly (processor.go:249-332): <=3 chunks per file with
  stable ids ``code-{tier}-{path}`` — stable ids are what let the embed
  stage skip unchanged files (CLAUDE.md:1083).
- D6 doc chunking (chunker.go:31-333): split to ~target-token chunks
  with stable ids ``doc-{path}-s{N}``. The reference splits at markdown
  headers/paragraphs/sentences; the synthetic corpus has no structure,
  so the registered operator is the token-window variant — same id
  scheme, span tracking, and determinism properties, expressed with
  ``sequence``+``slice`` so it stays JVM-side and matches the DuckDB
  oracle exactly.

Scale notes: everything here is narrow (per-row) — no shuffle at all.
Chunking 100 TB of text is embarrassingly parallel; the only wide edge
in the build pipeline is the change-detection join upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_EXTENSIONS = ("md", "markdown")


def route(files: DataFrame, *, path_col: str = "file_path") -> DataFrame:
    """D2: adds ``route`` = 'docs' | 'code' by file extension."""
    ext = F.lower(F.regexp_extract(F.col(path_col), r"\.([A-Za-z0-9]+)$", 1))
    return files.withColumn(
        "route",
        F.when(ext.isin(*DOC_EXTENSIONS), F.lit("docs")).otherwise(F.lit("code")),
    )


def chunk_fixed_tokens(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_chunk: int = 32,
) -> DataFrame:
    """D6: whitespace-token windows of ``tokens_per_chunk``; one output
    row per chunk with stable id ``doc-{id}-s{N}`` and token count.

    ``sequence(0, n_chunks-1)`` + ``slice`` (instead of posexplode +
    re-group) keeps it a single narrow projection: no shuffle, no
    re-aggregation, and the chunk text is reassembled identically on the
    DuckDB side (array_to_string over the same slice).
    """
    # split on whitespace, dropping empties: trim() strips only spaces,
    # so leading/trailing \n or \t would otherwise yield "" tokens
    # (caught by the chunker property test)
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    n_chunks = F.ceil(F.size(words) / F.lit(tokens_per_chunk)).cast("int")
    per_doc = docs.select(
        F.col(id_col), words.alias("_words"), n_chunks.alias("_n")
    ).filter(F.col("_n") > 0)
    i = F.col("chunk_idx")
    piece = F.slice(F.col("_words"), i * tokens_per_chunk + 1, tokens_per_chunk)
    return per_doc.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("chunk_idx"),
        F.col("_words"),
    ).select(
        F.concat(F.lit("doc-"), F.col(id_col), F.lit("-s"), i).alias("chunk_id"),
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def assemble_code_chunks(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """D5 + D4: three tiered chunks per file — symbols / definitions /
    data (processor.go:264-331) — each a plain projection with the NL
    formatting (formatter.go) inlined as concat expressions, unioned by
    name. Stable ids ``code-{tier}-{id}``.

    On the synthetic corpus the "tiers" summarize what a parser would
    emit: symbols = leading tokens, definitions = a prose metadata line,
    data = a content excerpt.
    """
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )

    def tier(name: str, text_expr) -> DataFrame:
        return docs.select(
            F.concat(F.lit(f"code-{name}-"), F.col(id_col)).alias("chunk_id"),
            F.col(id_col),
            F.lit(name).alias("chunk_type"),
            text_expr.alias("chunk_text"),
        )

    symbols = tier(
        "symbols",
        F.concat(F.lit("Symbols: "), F.array_join(F.slice(words, 1, 8), " ")),
    )
    definitions = tier(
        "definitions",
        F.format_string(
            "Language: %s; source: %s; tokens: %d",
            F.col("lang"),
            F.col("source"),
            F.size(words),
        ),
    )
    data = tier("data", F.substring(F.col(text_col), 1, 100))
    return symbols.unionByName(definitions).unionByName(data)
