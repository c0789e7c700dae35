"""Embedding-space moment statistics: the mean/covariance aggregation
behind whitening, drift monitoring, and PCA over a vector corpus.

Large-scale embedding pipelines track the second moment of the vector
distribution (covariance) to whiten retrieval spaces, detect encoder
drift between corpus snapshots, and size PCA truncation. The reference
stores vectors but computes no distributional stats; this is the
beyond-parity aggregation a 100 TB embedding table needs.

Scale shape: a two-stage distributed moment reduce — per Arrow batch a
numpy partial (count, Σx, XᵀX) so each executor emits ONE row per
partition regardless of row count (the Gram matrix is the classic
map-side-combine for covariance), then a position-exploded elementwise
sum over the tiny partial frame. Nothing corpus-sized crosses the
shuffle: P partitions × (1 + dim + dim²) doubles.

The whole chain is oracle-replayable (sums of products in SQL); the
eigen-decomposition consumers (whitening transform, PCA basis) are
driver-side numpy over the dim×dim result and stay unit-tested —
eigensolver numerics are not SQL-expressible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Upper-triangle sample covariance of the vector corpus:
    (i, j, n, cov) for 0 ≤ i ≤ j < dim, cov = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/(n−1).

    NULL and wrong-dimension vectors are excluded (they carry no
    moment information and would corrupt the Gram accumulation);
    callers wanting strictness should validate upstream.
    """
    part_schema = "n long, s array<double>, xx array<double>"
    emb = emb.filter(F.size(F.col(vec_col)) == dim)

    def partials(batches):
        n = 0
        s = np.zeros(dim)
        xx = np.zeros(dim * dim)
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            n += x.shape[0]
            s += x.sum(axis=0)
            xx += (x.T @ x).ravel()
        if n:
            yield pd.DataFrame([{"n": n, "s": list(s), "xx": list(xx)}])

    parts = emb.select(vec_col).mapInPandas(partials, part_schema)

    # elementwise reduce of the partial rows: explode positions, sum.
    # The partial frame is P rows (one per non-empty partition) — the
    # explode is P×dim² tiny doubles, never corpus-sized.
    s_sum = (
        parts.select(F.posexplode("s").alias("k", "v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    xx_sum = (
        parts.select("n", F.posexplode("xx").alias("p", "v"))
        .groupBy("p")
        .agg(F.sum("v").alias("xx"))
    )
    n_total = parts.agg(F.sum("n").alias("n"))

    ij = xx_sum.select(
        (F.col("p") / dim).cast("int").alias("i"),
        (F.col("p") % dim).alias("j"),
        "xx",
    ).filter(F.col("i") <= F.col("j"))
    si = s_sum.select(F.col("k").alias("i"), F.col("s").alias("s_i"))
    sj = s_sum.select(F.col("k").alias("j"), F.col("s").alias("s_j"))
    return (
        ij.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_total))
        .select(
            "i",
            "j",
            "n",
            # + 0.0 canonicalizes -0.0 (a tiny negative covariance
            # rounds to the sign-preserving -0.0 in IEEE; DuckDB and
            # Spark disagree on which zero they print, and the gate
            # compares rendered values)
            (
                F.round(
                    (F.col("xx") - F.col("s_i") * F.col("s_j") / F.col("n"))
                    / (F.col("n") - 1),
                    round_digits,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def whitening_transform(cov_rows, *, dim: int = 64, eps: float = 1e-6):
    """Driver-side consumer: ZCA whitening matrix from the covariance
    rows (list of Row(i, j, cov)). numpy eigh — unit-tested, not
    oracle-gated (eigensolver numerics are not SQL-expressible)."""
    c = np.zeros((dim, dim))
    for r in cov_rows:
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    w, v = np.linalg.eigh(c)
    return v @ np.diag(1.0 / np.sqrt(np.maximum(w, eps))) @ v.T
