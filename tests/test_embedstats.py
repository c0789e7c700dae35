"""Embedding moment statistics vs DuckDB (covariance) + whitening
consumer contract."""

from __future__ import annotations

import numpy as np

from project_cortex_spark import oracle
from project_cortex_spark.operators.embedstats import (
    embedding_covariance,
    whitening_transform,
)

from .conftest import assert_matches_oracle


def test_embedding_covariance_matches_oracle(registry, duck):
    df = embedding_covariance(registry.table("embeddings"))
    assert_matches_oracle(df, duck, oracle.embedding_covariance_sql())


def test_embedding_covariance_small_exact(spark):
    # hand-checkable 2-vector corpus in a 64-d space: only dims 0,1 vary
    v1 = [1.0, 2.0] + [0.0] * 62
    v2 = [3.0, 6.0] + [0.0] * 62
    df = spark.createDataFrame(
        [(0, v1), (1, v2)], "vec_id long, embedding array<float>"
    )
    rows = {(r.i, r.j): r.cov for r in embedding_covariance(df).collect()}
    # sample covariance with n-1: var(x0)=2, var(x1)=8, cov(x0,x1)=4
    assert rows[(0, 0)] == 2.0
    assert rows[(1, 1)] == 8.0
    assert rows[(0, 1)] == 4.0
    assert rows[(2, 63)] == 0.0
    assert len(rows) == 64 * 65 // 2


def test_whitening_transform_whitens(spark, registry):
    # W from the corpus covariance must map the corpus to ~identity
    # second moment: cov(XW) ≈ I on the varying subspace
    emb = registry.table("embeddings")
    rows = embedding_covariance(emb).collect()
    w = whitening_transform(rows)
    x = np.asarray(
        [np.asarray(r.embedding, dtype=float) for r in emb.collect()]
    )
    xc = x - x.mean(axis=0)
    c = np.cov((xc @ w).T)
    # eigenvalues clamped at eps stay un-whitened; check the bulk
    diag = np.diag(c)
    assert np.quantile(np.abs(diag - 1.0), 0.9) < 0.05
    off = c - np.diag(diag)
    assert np.abs(off).max() < 0.1
