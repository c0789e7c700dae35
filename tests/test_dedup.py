"""Dedup operators vs generated DuckDB oracles: exact groups, MinHash+LSH,
n-gram Jaccard, SimHash, embedding-cosine."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_cortex_spark.operators.dedup import (
    dedup_exact,
    embedding_near_duplicates,
    exact_duplicate_groups,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_duplicates,
)
from project_cortex_spark import oracle
from project_cortex_spark.operators import dedup

from .conftest import assert_matches_oracle


def test_exact_duplicate_groups(registry, duck):
    # part names repeat heavily -> real dup groups
    df = exact_duplicate_groups(
        registry.table("part"), id_col="p_partkey", text_col="p_name"
    )
    sql = oracle.exact_duplicate_groups_sql(
        table="part", id_col="p_partkey", text_col="p_name"
    )
    assert_matches_oracle(df, duck, sql)


def test_dedup_exact_keeps_min_id(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "Hello, world!"), (3, "different")],
        ["doc_id", "text"],
    )
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [1, 3]  # 2 normalizes to the same content as 1


def test_minhash_near_duplicates(registry, duck):
    df = minhash_near_duplicates(registry.table("documents"), threshold=0.5).withColumn(
        "jaccard", F.round("jaccard", 6)
    )
    sql = oracle.minhash_near_duplicates_sql(threshold=0.5)
    assert_matches_oracle(df, duck, sql)
    assert df.count() > 0, "synthetic corpus plants near-dups; none found"


def test_ngram_jaccard_pairs(registry, duck):
    df = ngram_jaccard_pairs(registry.table("documents"), threshold=0.5).withColumn(
        "jaccard", F.round("jaccard", 6)
    )
    sql = oracle.ngram_jaccard_pairs_sql(threshold=0.5)
    assert_matches_oracle(df, duck, sql)


def test_simhash_fingerprints(registry, duck):
    df = simhash_fingerprints(registry.table("documents"))
    assert_matches_oracle(df, duck, oracle.simhash_fingerprints_sql())


def test_simhash_near_duplicates(registry, duck):
    df = simhash_near_duplicates(registry.table("documents"), max_hamming=2)
    assert_matches_oracle(df, duck, oracle.simhash_near_duplicates_sql(max_hamming=2))


def test_embedding_near_duplicates(registry, duck):
    df = embedding_near_duplicates(registry.table("embeddings"), threshold=0.9).withColumn(
        "score", F.round("score", 6)
    )
    assert_matches_oracle(df, duck, oracle.embedding_near_duplicates_sql(threshold=0.9))


def test_duplicate_clusters_semantics(spark):
    # two chains (1-2-3 via pairs, 7-8) and an isolated pair (5,6)
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (5, 6), (8, 7)], ["a", "b"]
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        5: (5, True), 6: (5, False),
        7: (7, True), 8: (7, False),
    }


def test_duplicate_clusters_oracle(registry, duck):
    pairs = dedup.minhash_near_duplicates(registry.table("documents"), threshold=0.5)
    got = dedup.duplicate_clusters(pairs.select("a", "b"))
    assert_matches_oracle(
        got,
        duck,
        oracle.duplicate_clusters_sql(
            oracle.minhash_near_duplicates_sql(threshold=0.5)
        ),
    )
