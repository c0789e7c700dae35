"""Vector scalar functions as native Catalyst expressions.

The reference scores KNN with sqlite-vec's ``vec_distance_cosine``
(/root/reference/internal/storage/vector_index.go:140-149) and converts
distance to similarity with ``1 - d/2``
(/root/reference/internal/mcp/search_sqlite.go:191-194). Here the same
math is ``zip_with`` + ``aggregate`` over ``array<float>`` — pure JVM
expressions inside whole-stage codegen, no Python in the hot path, so a
100 TB scoring scan is bounded by parquet read bandwidth, not serde.

All arithmetic is done in double precision (matching DuckDB's list
functions) so oracle comparisons agree to float64 rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """sum_i a_i*b_i in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_normalize(a: Column) -> Column:
    """Divide each component by the L2 norm (reference normalizes all
    embeddings at encode time: internal/embeddings-ffi/src/lib.rs:87)."""
    norm = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / norm)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """sqlite-vec cosine distance: 1 - cos(a,b), range [0, 2]."""
    return F.lit(1.0) - cosine_similarity(a, b)


def similarity_score(a: Column, b: Column) -> Column:
    """The reference's user-facing score: 1 - distance/2 ∈ [0, 1]
    (search_sqlite.go:191-194)."""
    return F.lit(1.0) - cosine_distance(a, b) / F.lit(2.0)
