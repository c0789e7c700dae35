"""Distributed logistic-regression training for model-based quality
filtering — the trainer behind the classifier-scored corpus filters
(CCNet/LLaMA-style "quality model" stages, public technique) as a
first-class Spark operator.

Batch gradient descent: per iteration ONE distributed aggregate
computes the gradient sums (Σe, Σe·xᵢ with e = σ(w·x) − y) over the
feature frame, a 1-row collect updates the weights on the driver, and
the next iteration's sigmoid runs with the new weights as literals —
the same bounded-collect iterative-trainer shape as bpe_train and
pagerank. At 100 TB the per-iteration cost is one map-side-combined
aggregate over the corpus; the state that moves is k+1 doubles.

Features are exact-integer-derived (token count, char count,
type-token ratio) so both engines compute bit-identical feature rows;
the oracle (oracle.logreg_train_oracle_sql) is a fully INDEPENDENT
replay — chained CTEs re-derive every iteration's gradient from their
own state, so a wrong gradient, a wrong update, or a wrong sigmoid
diverges immediately. Cross-engine float drift (sum reassociation,
exp ulp) stays ~1e-12 on O(1) weights over 8 iterations — absorbed by
the 6 dp projection, same envelope as every float oracle here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def quality_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    label_lang: str = "en",
) -> DataFrame:
    """(x1, x2, x3, y): scaled token count, scaled char count,
    type-token ratio, and the language label — exact-integer-derived
    doubles, bit-identical across engines."""
    toks = tokens(F.col(text_col))
    return docs.select(
        (F.size(toks) / F.lit(100.0)).alias("x1"),
        (F.length(F.col(text_col)) / F.lit(1000.0)).alias("x2"),
        (
            F.size(F.array_distinct(toks))
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("x3"),
        F.when(F.col(lang_col) == label_lang, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )


def logreg_train(
    docs: DataFrame,
    *,
    iters: int = 8,
    lr: float = 1.0,
    text_col: str = "text",
    lang_col: str = "lang",
    label_lang: str = "en",
) -> DataFrame:
    """Train w on σ(b + w·x) ≈ y by full-batch gradient descent from
    zero init; returns the per-iteration weight TRACE
    (iteration, w_bias, w_ntok, w_nchar, w_ttr) — the auditable output
    the oracle replays end to end."""
    feats = quality_features(
        docs, text_col=text_col, lang_col=lang_col, label_lang=label_lang
    ).localCheckpoint(eager=True)
    n = feats.count()
    if n == 0:
        raise ValueError("logreg_train: empty corpus")
    w = [0.0, 0.0, 0.0, 0.0]  # bias, x1, x2, x3
    trace: list[tuple] = []
    for it in range(1, iters + 1):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
        )
        e = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
        g = feats.agg(
            F.sum(e).alias("gb"),
            F.sum(e * F.col("x1")).alias("g1"),
            F.sum(e * F.col("x2")).alias("g2"),
            F.sum(e * F.col("x3")).alias("g3"),
        ).first()
        w = [
            w[0] - lr * g["gb"] / n,
            w[1] - lr * g["g1"] / n,
            w[2] - lr * g["g2"] / n,
            w[3] - lr * g["g3"] / n,
        ]
        trace.append((it, w[0], w[1], w[2], w[3]))
    out = docs.sparkSession.createDataFrame(
        trace,
        "iteration int, w_bias double, w_ntok double,"
        " w_nchar double, w_ttr double",
    )
    return out.select(
        "iteration",
        *[
            F.round(c, 6).alias(c)
            for c in ("w_bias", "w_ntok", "w_nchar", "w_ttr")
        ],
    )


def logreg_score(
    docs: DataFrame,
    *,
    iters: int = 8,
    lr: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    label_lang: str = "en",
) -> DataFrame:
    """Train-then-score: every document's quality probability under the
    trained classifier — the filter stage that consumes the trainer
    (keep/downsample by score at pipeline time). Scoring is one narrow
    codegen projection with the final weights as literals; at 100 TB
    the trainer's aggregates and this scan are the only corpus-sized
    work.

    Output (doc_id, y, score): label carried along so downstream
    filters can measure separation. The weight collect is ``iters``
    rows — the sanctioned bounded trainer collect."""
    trace = logreg_train(
        docs,
        iters=iters,
        lr=lr,
        text_col=text_col,
        lang_col=lang_col,
        label_lang=label_lang,
    ).orderBy("iteration").collect()
    w = trace[-1]
    toks = tokens(F.col(text_col))
    x1 = F.size(toks) / F.lit(100.0)
    x2 = F.length(F.col(text_col)) / F.lit(1000.0)
    x3 = F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    )
    z = (
        F.lit(w["w_bias"])
        + F.lit(w["w_ntok"]) * x1
        + F.lit(w["w_nchar"]) * x2
        + F.lit(w["w_ttr"]) * x3
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(lang_col) == label_lang, F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
    )
