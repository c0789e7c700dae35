"""Text scalar functions shared by FTS, dedup, and text-analysis operators.

Tokenization parity: the reference indexes with FTS5 tokenizer
``unicode61 separators '._'`` (/root/reference/internal/storage/
schema.go:174-180, fts_index.go:21-39) — tokens are maximal runs of
unicode letters/digits, with ``.`` and ``_`` forced to be separators,
lowercased. The regex class ``[^\\p{L}\\p{N}]+`` reproduces that (``.``
and ``_`` are already non-alphanumeric) and parses identically in Java
regex (Spark) and RE2 (DuckDB), which the oracle tests rely on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Separator class between tokens. Keep in sync with SEP_SQL below.
SEP_RE = r"[^\p{L}\p{N}]+"
# The same pattern for DuckDB oracle SQL (RE2 syntax, identical here).
SEP_SQL = SEP_RE
# Python-`re` equivalent for driver-side string work (no \p support):
# \w = [letter digit _] so [\W_] = "not letter/digit, or underscore".
SEP_PY = r"[\W_]+"


def tokens(text: Column) -> Column:
    """array<string> of lowercase tokens; empty strings removed (split on
    leading/trailing separators yields '')."""
    return F.filter(
        F.split(F.lower(text), SEP_RE),
        lambda t: t != F.lit(""),
    )


def token_count(text: Column) -> Column:
    """Whitespace/punctuation token count (the reference estimates tokens
    as len/4 for chunk sizing, internal/indexer/chunker.go:330-333; this
    is the exact count used for doc stats)."""
    return F.size(tokens(text))


def estimate_llm_tokens(text: Column) -> Column:
    """The reference's chunk-sizing heuristic: len(text)/4
    (chunker.go:330-333)."""
    return F.floor(F.length(text) / F.lit(4)).cast("long")


def shingles(text: Column, n: int = 3) -> Column:
    """array<string> of word n-grams ('a b c') over the token stream —
    the unit for MinHash/Jaccard near-dup detection."""
    toks = tokens(text)
    # guard: F.sequence(0, negative) would generate a descending sequence
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def char_ngrams(text: Column, n: int = 5) -> Column:
    """array<string> of character n-grams of the lowercased text."""
    lowered = F.lower(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(lowered) - n + 1, F.lit(0)))
    return F.filter(
        F.transform(idx, lambda i: F.substring(lowered, i, n)),
        lambda s: F.length(s) == n,
    )
