"""Embedding stage (D7): Arrow-batched pandas_udf with a deterministic
hash provider.

The reference embeds chunk text via a provider interface
(internal/embed/provider.go:20-39) whose production impl is an ONNX
BGE-small model behind a Rust FFI batch API (embeddings-ffi/src/lib.rs:
215-293: rayon-parallel batches, mean pooling lib.rs:178-182, L2
normalize lib.rs:87). The Spark shape is identical: a batch map —
``pandas_udf`` receives Arrow record batches on executors, the model
loads once per worker, and passage-vs-query mode is a parameter.

The default provider here is a *deterministic* hashed bag-of-tokens
(crc32 -> bucket, L2-normalized), the test seam SURVEY §7 calls for:
same text -> same vector on every run/process, no model download, and
the output distribution is non-degenerate so cosine math downstream is
meaningful. A real sentence-transformers/ONNX provider drops into the
same function body (load-once via a module-level cache) without touching
any caller.

Scale notes: embedding dominates index-build cost; the operator is a
narrow batch map (no shuffle) and the upstream anti-join on stable chunk
ids (change_detection.changed_keys) keeps unchanged text from ever
reaching it. Arrow batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64


def hash_embed_series(
    texts: pd.Series, *, dim: int = DEFAULT_DIM, mode: str = "passage"
) -> pd.Series:
    """Deterministic hashed bag-of-tokens embedding, L2-normalized.

    ``mode`` ('passage' | 'query') mirrors the reference's asymmetric
    embedding modes (provider.go:25-31) the way real asymmetric encoders
    do: both modes share ONE vector space (same token hashing), and the
    mode contributes a distinguishing component (a virtual mode token).
    Same text embedded in both modes stays near-identical in cosine, so
    query->passage retrieval works; the vectors are still distinct.

    The token hash is md5 (not crc32) ON PURPOSE: md5 exists in DuckDB,
    so the whole embed→score→top-k chain is replayable in SQL — the
    search_semantic oracle rebuilds these exact signed bucket sums,
    float32-quantizes them the way the stored vectors are, and must
    hash-match. Per-token md5 is slower than crc32, but this provider
    is the deterministic test double; the production path is ONNX.
    """
    import hashlib

    out = []
    for text in texts:
        vec = np.zeros(dim, dtype=np.float64)
        for tok in [f"[{mode}]"] + (text or "").lower().split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            vec[h % dim] += 1.0 if (h >> 16) % 2 == 0 else -1.0
        norm = np.linalg.norm(vec)
        if norm > 0:
            vec /= norm
        out.append(vec.astype(np.float32))
    return pd.Series(out)


# Executor-local model cache (the W4 "embed daemon" shape: load-once per
# worker process, shared across Arrow batches). Bounded: code-token
# vocabularies are heavy-tailed and effectively unbounded, so an
# uncapped cache is an executor-OOM risk over a large corpus. Directions
# are cheap to regenerate from crc32, so eviction (FIFO — insertion
# order IS rough recency for a skewed vocab) only costs a recompute.
_TOKEN_DIRS: dict[tuple[str, int], np.ndarray] = {}
_TOKEN_DIRS_MAX = 200_000  # ~100 MB at dim=64 float64, the ceiling


def _token_direction(tok: str, dim: int) -> np.ndarray:
    """Deterministic unit direction for a token (random indexing).

    Each token maps to a pseudo-random Gaussian direction seeded by its
    crc32, so the mapping is stable across processes/executors with no
    trained artifact to ship. Documents sharing tokens land near each
    other in cosine — a real distributional embedding (Kanerva-style
    random indexing), unlike the bucketed hash provider whose collisions
    are structureless.
    """
    key = (tok, dim)
    v = _TOKEN_DIRS.get(key)
    if v is None:
        rng = np.random.default_rng(zlib.crc32(tok.encode()))
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        while len(_TOKEN_DIRS) >= _TOKEN_DIRS_MAX:
            _TOKEN_DIRS.pop(next(iter(_TOKEN_DIRS)))
        _TOKEN_DIRS[key] = v
    return v


_TOKEN_RE = None


def lexical_embed_series(
    texts: pd.Series, *, dim: int = DEFAULT_DIM, mode: str = "passage"
) -> pd.Series:
    """Random-indexing lexical embedding: sublinear-tf-weighted sum of
    per-token deterministic Gaussian directions, L2-normalized.

    The closest no-model-runtime stand-in for the reference's BGE-small
    provider (internal/embed/provider.go:20-39): cosine similarity is
    monotone in weighted token overlap, so retrieval quality tracks
    lexical relatedness rather than hash-bucket coincidence. Asymmetric
    ``mode`` adds a virtual mode token exactly like the hash provider.
    """
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[^0-9a-z]+")
    out = []
    for text in texts:
        toks = [t for t in _TOKEN_RE.split((text or "").lower()) if t]
        vec = _token_direction(f"[{mode}]", dim).copy()
        if toks:
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t, c in counts.items():
                vec += (1.0 + np.log(c)) * _token_direction(t, dim)
        norm = np.linalg.norm(vec)
        if norm > 0:
            vec /= norm
        out.append(vec.astype(np.float32))
    return pd.Series(out)


def _onnx_embed_series(
    texts: pd.Series, *, dim: int = DEFAULT_DIM, mode: str = "passage"
) -> pd.Series:
    """Production provider slot (reference: ONNX BGE-small behind
    provider.go:20-39). No onnxruntime / sentence-transformers wheel is
    available in this container; wiring one in means replacing this body
    with a module-level-cached model call — no caller changes.

    Probe ledger (re-checked each round): r3, r4, r6, r7 — import of
    onnxruntime/onnx/torch/tensorflow/transformers/sentence_transformers/
    tokenizers/sklearn all absent, and pip download cannot reach any
    index (no network). Environment-blocked, not a design gap."""
    raise NotImplementedError(
        "onnxruntime is not installed; register a provider via "
        "register_provider() or install a model runtime"
    )


# provider registry (the §2.12 extension seam): providers are
# (pd.Series, dim=, mode=) -> pd.Series of float32 vectors. Everything
# downstream — embed_chunks callers, KNN, dedup — is provider-agnostic.
PROVIDERS = {
    "hash": hash_embed_series,
    "lexical": lexical_embed_series,
    "onnx": _onnx_embed_series,
}


def register_provider(name: str, fn) -> None:
    PROVIDERS[name] = fn


def embedding_udf(
    *, dim: int = DEFAULT_DIM, mode: str = "passage", provider: str = "hash"
):
    """Arrow-batched embedding UDF; executor-side, load-once shape."""
    fn = PROVIDERS[provider]

    @pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return fn(texts, dim=dim, mode=mode)

    return embed


def embed_chunks(
    chunks: DataFrame,
    *,
    text_col: str = "chunk_text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    mode: str = "passage",
    provider: str = "hash",
) -> DataFrame:
    """D7: append an ``array<float>`` embedding column (batch map)."""
    return chunks.withColumn(
        out_col, embedding_udf(dim=dim, mode=mode, provider=provider)(F.col(text_col))
    )
