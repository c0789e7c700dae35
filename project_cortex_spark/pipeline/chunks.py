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


def estimate_tokens(text: str) -> int:
    """Reference approximation: 1 token ≈ 4 chars (chunker.go:330-333)."""
    return len(text) // 4


def chunk_markdown_doc(
    path: str, text: str, *, target_tokens: int = 200
) -> list[tuple]:
    """Structure-aware markdown chunking (chunker.go:31-333 semantics):

    1. split into sections at ``##`` headers (preamble keeps line 1);
    2. a section within ``target_tokens`` is ONE chunk;
    3. an oversize section packs whole paragraphs greedily (blank-line
       boundaries), NEVER splitting inside a ``` fence — a fence is one
       atomic paragraph;
    4. a single oversize paragraph falls back to sentence packing
       (``[.!?]+\\s+`` boundaries), flagged ``is_split``;
    5. every chunk carries its 1-indexed line span.

    Pure sequential per-document logic — runs driverless inside
    ``mapInPandas`` (see :func:`chunk_markdown`); this function is the
    unit-testable core. Returns tuples of (chunk_id, file_path,
    section_idx, chunk_idx, chunk_text, start_line, end_line, n_tokens,
    is_split); ids are the stable ``doc-{path}-s{N}-c{M}`` scheme the
    embed stage keys on.
    """
    import re

    if not text.strip():
        return []
    lines = text.split("\n")

    # 1. sections at ## headers — fence-aware: a `## ` line inside a
    # ``` fence is code, not a header (the reference's header scan is
    # fence-blind, chunker.go:67-90, which contradicts its own rule #4;
    # we honor the documented rule)
    sections: list[tuple[int, list[str]]] = []  # (start_line, lines)
    cur_start, cur = 1, []
    in_fence = False
    for i, line in enumerate(lines):
        if line.startswith("```"):
            in_fence = not in_fence
        if not in_fence and re.match(r"^##\s+", line) and i > 0:
            if cur:
                sections.append((cur_start, cur))
            cur_start, cur = i + 1, [line]
        else:
            cur.append(line)
    if cur:
        sections.append((cur_start, cur))

    out: list[tuple] = []

    def emit(sec_idx, chunk_idx, chunk_text, start, end, is_split):
        out.append((
            f"doc-{path}-s{sec_idx}-c{chunk_idx}", path, sec_idx, chunk_idx,
            chunk_text, start, end, estimate_tokens(chunk_text), is_split,
        ))

    for sec_idx, (start_line, sec_lines) in enumerate(sections):
        sec_text = "\n".join(sec_lines)
        if estimate_tokens(sec_text) <= target_tokens:
            emit(sec_idx, 0, sec_text.strip(), start_line,
                 start_line + len(sec_lines) - 1, False)
            continue

        # 2. paragraphs, fences atomic
        paras: list[tuple[str, int, int, bool]] = []  # (text, start, end, code)
        p_start, p_lines, in_fence = start_line, [], False
        for i, line in enumerate(sec_lines):
            ln = start_line + i
            if line.startswith("```"):
                if not in_fence:
                    if p_lines and "\n".join(p_lines).strip():
                        paras.append(
                            ("\n".join(p_lines).strip(), p_start, ln - 1, False)
                        )
                    p_start, p_lines, in_fence = ln, [line], True
                else:
                    p_lines.append(line)
                    paras.append(("\n".join(p_lines).strip(), p_start, ln, True))
                    p_start, p_lines, in_fence = ln + 1, [], False
                continue
            if in_fence:
                p_lines.append(line)
            elif not line.strip():
                if p_lines and "\n".join(p_lines).strip():
                    paras.append(
                        ("\n".join(p_lines).strip(), p_start, ln - 1, False)
                    )
                p_start, p_lines = ln + 1, []
            else:
                p_lines.append(line)
        if p_lines and "\n".join(p_lines).strip():
            paras.append(("\n".join(p_lines).strip(), p_start,
                          start_line + len(sec_lines) - 1, in_fence))

        # 3. greedy paragraph packing; sentence fallback for oversize
        chunk_idx = 0
        pack: list[tuple[str, int, int, bool]] = []
        pack_tokens = 0

        def flush():
            nonlocal pack, pack_tokens, chunk_idx
            if pack:
                emit(sec_idx, chunk_idx,
                     "\n\n".join(p[0] for p in pack), pack[0][1],
                     pack[-1][2], False)
                chunk_idx += 1
                pack, pack_tokens = [], 0

        for p_text, p_s, p_e, p_code in paras:
            p_tok = estimate_tokens(p_text)
            if pack_tokens and pack_tokens + p_tok > target_tokens:
                flush()
            if p_tok > target_tokens and p_code:
                # an oversize CODE block stays atomic — "never split
                # inside a fence" wins over the token ceiling (the
                # reference's documented rule, chunker.go:29; its
                # implementation would sentence-split here, which shreds
                # code — we keep the fence whole instead)
                flush()
                emit(sec_idx, chunk_idx, p_text, p_s, p_e, False)
                chunk_idx += 1
                continue
            if p_tok > target_tokens:
                # oversize paragraph -> sentence packing (span = paragraph)
                flush()
                sentences = [
                    s.strip()
                    for s in re.split(r"[.!?]+\s+", p_text)
                    if s.strip()
                ]
                s_pack: list[str] = []
                s_tokens = 0
                for s in sentences:
                    s_tok = estimate_tokens(s)
                    if s_tokens and s_tokens + s_tok > target_tokens:
                        emit(sec_idx, chunk_idx, " ".join(s_pack), p_s, p_e,
                             True)
                        chunk_idx += 1
                        s_pack, s_tokens = [], 0
                    s_pack.append(s)
                    s_tokens += s_tok
                if s_pack:
                    emit(sec_idx, chunk_idx, " ".join(s_pack), p_s, p_e, True)
                    chunk_idx += 1
                continue
            pack.append((p_text, p_s, p_e, p_code))
            pack_tokens += p_tok
        flush()

    return out


MARKDOWN_CHUNK_SCHEMA = (
    "chunk_id string, file_path string, section_idx long, chunk_idx long, "
    "chunk_text string, start_line long, end_line long, n_tokens long, "
    "is_split boolean"
)


def chunk_markdown(
    files: DataFrame,
    *,
    path_col: str = "file_path",
    text_col: str = "text",
    target_tokens: int = 200,
) -> DataFrame:
    """D6 structure-aware variant: :func:`chunk_markdown_doc` applied per
    row via ``mapInPandas`` — narrow, Arrow-batched, zero shuffle (the
    same scale shape as the parse UDF; chunking is embarrassingly
    parallel)."""
    from collections.abc import Iterator

    import pandas as pd

    cols = ["chunk_id", "file_path", "section_idx", "chunk_idx",
            "chunk_text", "start_line", "end_line", "n_tokens", "is_split"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path, text in zip(pdf[path_col], pdf[text_col]):
                rows.extend(
                    chunk_markdown_doc(path, text, target_tokens=target_tokens)
                )
            yield pd.DataFrame(rows, columns=cols)

    return files.select(
        F.col(path_col).alias(path_col), F.col(text_col).alias(text_col)
    ).mapInPandas(run, schema=MARKDOWN_CHUNK_SCHEMA)


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
