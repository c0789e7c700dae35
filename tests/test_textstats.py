"""Text-analysis operators vs generated DuckDB oracles."""

from __future__ import annotations

from project_cortex_spark import oracle
from project_cortex_spark.operators.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    token_stats,
)

from .conftest import assert_matches_oracle


def test_token_stats(registry, duck):
    df = token_stats(registry.table("documents"))
    assert_matches_oracle(df, duck, oracle.token_stats_sql())


def test_quality_scores(registry, duck):
    df = quality_scores(registry.table("documents"))
    assert_matches_oracle(df, duck, oracle.quality_scores_sql())


def test_language_id(registry, duck):
    df = language_id(registry.table("documents"))
    assert_matches_oracle(df, duck, oracle.language_id_sql())


def test_language_id_markers(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is in that house"),
            (2, "el gato y la casa de que los perros"),
            (3, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert got == {1: "en", 2: "es", 3: "und"}


def test_fingerprints(registry, duck):
    df = fingerprints(registry.table("documents"))
    assert_matches_oracle(df, duck, oracle.fingerprints_sql())


def test_fingerprint_stability(spark):
    # small edits far from the minimal window usually keep the fingerprint;
    # identical text always does
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).collect()}
    assert fps[1] == fps[2]
