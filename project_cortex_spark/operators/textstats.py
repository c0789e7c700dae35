"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All formulas are pinned, engine-portable expressions (no UDFs): every
operator runs fully inside whole-stage codegen and has a DuckDB oracle
builder in oracle.py. At 100 TB each of these is a single narrow
projection over the documents scan — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams, estimate_llm_tokens, tokens

# Marker stopwords per language: deliberately small, pinned lists (the
# language-ID heuristic is n-gram/marker based, not a trained model).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "un", "una", "es"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("was", "on", "with", "as", "at", "by")


def token_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_unique_tokens, avg_token_len,
    est_llm_tokens) — est_llm_tokens is the reference's len/4 heuristic
    (internal/indexer/chunker.go:330-333)."""
    toks = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
            )
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("avg_token_len"),
        estimate_llm_tokens(F.col(text_col)).alias("est_llm_tokens"),
    )


def _ratio(part: Column, whole: Column) -> Column:
    return part.cast("double") / F.greatest(whole, F.lit(1)).cast("double")


def quality_scores(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, stopword_ratio, alpha_ratio, unique_ratio, quality).

    quality = 0.4*stopword_ratio + 0.3*alpha_ratio + 0.3*unique_ratio,
    a pinned heuristic: prose-like text has stopwords, mostly letters,
    and non-degenerate vocabulary. Deterministic double math both engines.
    """
    text = F.col(text_col)
    toks = tokens(text)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    alpha_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    stopword_ratio = _ratio(stop_hits, F.size(toks))
    alpha_ratio = _ratio(alpha_chars, F.length(text))
    unique_ratio = _ratio(F.size(F.array_distinct(toks)), F.size(toks))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(unique_ratio, 6).alias("unique_ratio"),
        F.round(
            0.4 * stopword_ratio + 0.3 * alpha_ratio + 0.3 * unique_ratio, 6
        ).alias("quality"),
    )


def language_id(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, lang_pred, lang_hits): marker-word vote; argmax with
    alphabetical tie-break; 'und' when no marker hits."""
    toks = tokens(F.col(text_col))
    hit_cols = [
        F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    with_hits = docs.select(F.col(id_col).alias("doc_id"), *hit_cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_{l}") for l in langs])
    pred = F.lit("und")
    # alphabetical tie-break: first lang reaching the max wins
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return with_hits.select(
        "doc_id", pred.alias("lang_pred"), best.alias("lang_hits")
    )


def fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
) -> DataFrame:
    """(doc_id, fingerprint): min-hash of character n-grams of the
    normalized text — a winnowing-style rolling fingerprint that is
    stable under small edits outside the minimal window."""
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    grams = char_ngrams(norm, ngram)
    fp = F.array_min(F.transform(grams, lambda g: F.md5(g)))
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
