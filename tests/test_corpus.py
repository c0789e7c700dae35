"""Corpus-management operators: stable splits, mixing, decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_cortex_spark import oracle
from project_cortex_spark.operators import corpus

from .conftest import assert_matches_oracle


def test_hash_split_matches_oracle(registry, duck):
    got = corpus.hash_split(registry.table("documents"))
    assert_matches_oracle(got, duck, oracle.hash_split_sql())


def test_hash_split_stability(registry):
    """A document's split is unchanged when the corpus shrinks — the
    property rand()-based splits lack."""
    docs = registry.table("documents")
    full = {r["doc_id"]: r["split"] for r in corpus.hash_split(docs).collect()}
    subset = {
        r["doc_id"]: r["split"]
        for r in corpus.hash_split(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    }
    assert subset == {k: v for k, v in full.items() if k % 2 == 0}
    # fractions roughly respected
    n = len(full)
    train = sum(1 for v in full.values() if v == "train")
    assert 0.9 < train / n <= 1.0


def test_weighted_mix_matches_oracle(registry, duck):
    keep = (("src0", 0.5), ("src1", 0.25))
    got = corpus.weighted_mix(
        registry.table("documents"), keep_fractions=dict(keep)
    )
    assert_matches_oracle(got, duck, oracle.weighted_mix_sql(keep))


def test_decontaminate_matches_oracle(registry, duck):
    docs = registry.table("documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    got = corpus.decontaminate(docs, bench, ngram=8)
    assert_matches_oracle(
        got, duck, oracle.decontaminate_sql(bench_filter="doc_id % 97 = 0", ngram=8)
    )


def test_decontaminate_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text with no overlap here at all"),
            (3, "short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    kept = {r["doc_id"] for r in corpus.decontaminate(docs, bench, ngram=8).collect()}
    # doc 1 shares an 8-gram with the benchmark; doc 3 is too short to shingle
    assert kept == {2, 3}


def test_sample_per_key_matches_oracle(registry, duck):
    got = corpus.sample_per_key(registry.table("documents"), key_col="lang", k=25)
    assert_matches_oracle(got, duck, oracle.sample_per_key_sql(k=25))


def test_sample_per_key_semantics(spark):
    rows = [(i, "s" if i < 3 else "b") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = corpus.sample_per_key(docs, key_col="lang", k=5).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["lang"], []).append(r)
    # exactly min(k, |stratum|) rows per key, ranks 1..n
    assert len(by_key["s"]) == 3 and len(by_key["b"]) == 5
    assert sorted(r["sample_rank"] for r in by_key["b"]) == [1, 2, 3, 4, 5]
    # deterministic: a second run picks the identical sample
    again = corpus.sample_per_key(docs, key_col="lang", k=5).collect()
    assert {(r["doc_id"], r["sample_rank"]) for r in got} == {
        (r["doc_id"], r["sample_rank"]) for r in again
    }
