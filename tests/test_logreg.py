"""Distributed logistic-regression trainer vs the independent DuckDB
chained-CTE replay + learning-behavior contracts."""

from __future__ import annotations

import math

from project_cortex_spark import oracle
from project_cortex_spark.operators.logreg import logreg_train, quality_features

from .conftest import assert_matches_oracle


def test_logreg_train_matches_independent_replay(registry, duck):
    df = logreg_train(registry.table("documents"), iters=5, lr=1.0)
    assert_matches_oracle(
        df, duck, oracle.logreg_train_oracle_sql(iters=5, lr=1.0),
        ordered=True,
    )


def test_logreg_learns_a_separable_label(spark):
    """On a corpus where the label is exactly 'long doc', the trained
    model must order a long doc above a short one — the trainer
    actually descends, not just executes."""
    rows = [
        (i, ("word " * (200 if i % 2 == 0 else 5)).strip(),
         "en" if i % 2 == 0 else "xx")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    trace = logreg_train(docs, iters=20, lr=1.0).collect()
    w = trace[-1]

    def score(n_tok, n_chars, ttr):
        z = (w.w_bias + w.w_ntok * n_tok / 100.0
             + w.w_nchar * n_chars / 1000.0 + w.w_ttr * ttr)
        return 1.0 / (1.0 + math.exp(-z))

    long_s = score(200, 1000, 1 / 200)
    short_s = score(5, 25, 1 / 5)
    assert long_s > 0.5 > short_s
    # loss monotonicity proxy: |gradient step| shrinks as it converges
    d_first = abs(trace[1].w_ntok - trace[0].w_ntok)
    d_last = abs(trace[-1].w_ntok - trace[-2].w_ntok)
    assert d_last < d_first


def test_quality_features_exact_values(spark):
    docs = spark.createDataFrame(
        [(0, "a b b", "en")], "doc_id long, text string, lang string"
    )
    r = quality_features(docs).collect()[0]
    assert r.x1 == 3 / 100.0
    assert r.x2 == 5 / 1000.0
    assert r.x3 == 2 / 3
    assert r.y == 1.0


def test_logreg_score_matches_replay(registry, duck):
    from project_cortex_spark.operators.logreg import logreg_score

    df = logreg_score(registry.table("documents"), iters=5, lr=1.0)
    assert_matches_oracle(
        df, duck, oracle.logreg_score_oracle_sql(iters=5, lr=1.0)
    )
