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


def test_importance_sample_matches_oracle(registry, duck):
    from project_cortex_spark.operators.textstats import quality_scores

    scored = quality_scores(registry.table("documents"))
    got = corpus.importance_sample(scored, weight_col="quality", scale=1.2).select(
        "doc_id", "quality"
    )
    assert_matches_oracle(got, duck, oracle.importance_sample_sql(scale=1.2))


def test_importance_sample_semantics(spark):
    rows = [(i, 1.0 if i < 50 else 0.0) for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = corpus.importance_sample(docs, weight_col="w").collect()
    # weight 1.0 always survives; weight 0.0 never does
    assert {r["doc_id"] for r in kept} == set(range(50))
    # scale pushes sub-1.0 weights proportionally: ~30% of 1000 at w=0.3
    many = spark.createDataFrame([(i, 0.3) for i in range(1000)], ["doc_id", "w"])
    n = corpus.importance_sample(many, weight_col="w").count()
    assert 230 <= n <= 370


def test_contamination_pairs_matches_oracle(registry, duck):
    docs = registry.table("documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    got = corpus.contamination_pairs(
        docs, bench, ngram=3, threshold_e4=450, max_df=50
    ).filter(F.col("doc_id") != F.col("bench_id"))
    sql = f"""
        SELECT * FROM ({oracle.contamination_pairs_sql(
            bench_filter="doc_id % 97 = 0", ngram=3,
            threshold_e4=450, max_df=50)})
        WHERE doc_id <> bench_id
    """
    assert_matches_oracle(got, duck, sql)


def test_contamination_directional_containment(spark):
    docs = spark.createDataFrame(
        [
            # embeds the whole benchmark item inside unrelated padding
            (1, "alpha beta gamma delta " + " ".join(f"pad{i}" for i in range(40))),
            # shares one trigram only
            (2, "alpha beta gamma nothing else in common here at all"),
            (3, "totally unrelated text with no overlap whatsoever"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(9, "alpha beta gamma delta")], ["doc_id", "text"])
    pairs = {
        r["doc_id"]: r["containment_e4"]
        for r in corpus.contamination_pairs(
            docs, bench, ngram=3, threshold_e4=0
        ).collect()
    }
    # doc 1 covers ALL of the benchmark's trigrams despite the padding
    assert pairs[1] == 10_000
    # doc 2 covers exactly 1 of 2 trigrams
    assert pairs[2] == 5_000
    assert 3 not in pairs
    survivors = {
        r["doc_id"]
        for r in corpus.fuzzy_decontaminate(
            docs, bench, ngram=3, threshold_e4=6_000
        ).collect()
    }
    assert survivors == {2, 3}


def test_shuffle_shards_matches_oracle(registry, duck):
    got = corpus.shuffle_shards(
        registry.table("documents"), seed="epoch0", shards=8
    ).select("doc_id", "shard", "pos")
    assert_matches_oracle(
        got, duck, oracle.shuffle_shards_sql(seed="epoch0", shards=8)
    )


def test_shuffle_shards_is_seeded_permutation(registry):
    docs = registry.table("documents")
    a = corpus.shuffle_shards(docs, seed="epoch0", shards=4).select(
        "doc_id", "shard", "pos"
    )
    b = corpus.shuffle_shards(docs, seed="epoch1", shards=4).select(
        "doc_id", "shard", "pos"
    )
    rows_a = {(r["doc_id"]): (r["shard"], r["pos"]) for r in a.collect()}
    rows_a2 = {(r["doc_id"]): (r["shard"], r["pos"]) for r in a.collect()}
    rows_b = {(r["doc_id"]): (r["shard"], r["pos"]) for r in b.collect()}
    # deterministic per seed
    assert rows_a == rows_a2
    # every doc appears exactly once; (shard, pos) is a proper layout:
    # positions within a shard are 1..n with no gaps
    n_docs = docs.count()
    assert len(rows_a) == n_docs
    by_shard = {}
    for shard, pos in rows_a.values():
        by_shard.setdefault(shard, []).append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed yields a different permutation
    assert rows_a != rows_b


def test_token_budget_mix_semantics(spark):
    """Greedy best-quality-first fill: kept while tokens BEFORE the doc
    are under budget (overshoot by at most one doc); quality DESC with
    doc_id tie-break; budgets independent per stratum."""
    from project_cortex_spark.operators.corpus import token_budget_mix

    rows = [
        # source a: quality order 1 (q .9, 60 tok), 2 (.8, 50), 3 (.7, 40)
        (1, "a", 60, 0.9),
        (2, "a", 50, 0.8),
        (3, "a", 40, 0.7),
        # source b: tie on quality -> doc_id decides; 5 before 6
        (5, "b", 100, 0.5),
        (6, "b", 100, 0.5),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens", "quality"])
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_mix(docs, budget_tokens=100).collect()
    }
    # a: doc1 starts at 0 (<100, keep, cum 60); doc2 starts at 60
    # (<100, keep -> overshoot to 110); doc3 starts at 110 (drop).
    # b: doc5 starts at 0 (keep); doc6 starts at 100 (not < 100, drop).
    assert got == {1: 60, 2: 110, 5: 100}


def test_weighted_sample_matches_oracle(registry, duck):
    from project_cortex_spark.operators import textstats as ts

    docs = registry.table("documents")
    scored = docs.join(
        ts.quality_scores(docs).select("doc_id", "quality"), "doc_id"
    )
    df = corpus.weighted_sample_per_key(
        scored, key_col="lang", weight_col="quality", k=10
    ).select("doc_id", "lang", "quality", "sample_key", "sample_rank")
    assert_matches_oracle(df, duck, oracle.weighted_sample_sql(k=10))


def test_weighted_sample_exact_count_and_weight_bias(spark):
    # 2000 docs in one stratum, half weight 1.0 / half 0.05: the
    # heavy-weight half must dominate the selected set (A-Res property),
    # and the count is exactly k
    rows = [(i, "en", 1.0 if i % 2 == 0 else 0.05) for i in range(2000)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "quality"])
    got = corpus.weighted_sample_per_key(
        docs, key_col="lang", weight_col="quality", k=100
    ).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert heavy > 80  # E[heavy] ≈ 95+; uniform sampling would give ~50


def test_weighted_sample_is_deterministic_and_caps_small_strata(spark):
    rows = [(i, "xx" if i < 3 else "en", 0.5) for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "quality"])
    a = sorted(map(tuple, corpus.weighted_sample_per_key(docs, k=5).collect()))
    b = sorted(map(tuple, corpus.weighted_sample_per_key(docs, k=5).collect()))
    assert a == b
    per_key = {}
    for r in a:
        per_key[r[1]] = per_key.get(r[1], 0) + 1
    assert per_key == {"xx": 3, "en": 5}


def test_curriculum_matches_oracle(registry, duck):
    from project_cortex_spark.operators import textstats as ts

    docs = registry.table("documents")
    scored = docs.join(
        ts.quality_scores(docs).select("doc_id", "quality"), "doc_id"
    )
    df = corpus.curriculum_stages(scored, n_stages=4).select(
        "doc_id", "source", "quality", "stage"
    )
    assert_matches_oracle(df, duck, oracle.curriculum_sql(n_stages=4))


def test_curriculum_stage_balance_and_order(spark):
    rows = [(i, "web", float(100 - i)) for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
    got = {r["doc_id"]: r["stage"]
           for r in corpus.curriculum_stages(docs, key_col="source").collect()}
    # best quality -> stage 1, equal counts per stage
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 4}


def test_temperature_mix_upweights_low_resource_groups(registry, duck):
    """alpha=0.5 sampling: the smallest group keeps a LARGER fraction of
    itself than the largest group (the whole point of temperature
    mixing), total kept is ~the 30% target, and the audit row replays
    exactly in DuckDB."""
    from project_cortex_spark import oracle as ora
    from project_cortex_spark.operators.corpus import temperature_mix
    from tests.conftest import assert_matches_oracle

    docs = registry.table("documents")
    out = temperature_mix(docs)
    rows = sorted(out.collect(), key=lambda r: r.n_docs)
    assert len(rows) >= 2
    small, big = rows[0], rows[-1]
    if big.n_docs > 2 * small.n_docs:  # meaningful skew in the fixture
        assert small.n_kept / small.n_docs > big.n_kept / big.n_docs
    total = sum(r.n_docs for r in rows)
    kept = sum(r.n_kept for r in rows)
    assert kept <= 0.31 * total  # quotas never overshoot the target
    assert all(r.n_kept == r.quota for r in rows)  # quota <= n_docs held
    assert_matches_oracle(out, duck, ora.temperature_mix_sql())


def test_cluster_balance_quota_and_determinism(registry):
    from project_cortex_spark.operators.corpus import cluster_balance

    emb = registry.table("embeddings")
    out = cluster_balance(emb, n_clusters=8, per_cluster=10).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    # quota respected everywhere; ranks are 1..n within each cluster
    for cid, rows in by_cluster.items():
        assert len(rows) <= 10
        assert sorted(r.sample_rank for r in rows) == list(
            range(1, len(rows) + 1)
        )
    # deterministic: a second run picks the identical rows
    again = cluster_balance(emb, n_clusters=8, per_cluster=10).collect()
    key = lambda rows: sorted((r.vec_id, r.cluster_id, r.sample_rank) for r in rows)
    assert key(out) == key(again)


def test_cluster_balance_matches_oracle(registry, duck, monkeypatch):
    from project_cortex_spark import oracle
    from project_cortex_spark.operators.corpus import cluster_balance

    from .conftest import SF_DIR

    # the oracle's trainer loads embeddings itself — point it at the
    # test fixture's scale factor (check_entry does the same per sweep)
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
    df = cluster_balance(
        registry.table("embeddings"), n_clusters=16, per_cluster=25
    )
    assert_matches_oracle(
        df, duck, oracle.cluster_balance_sql(n_clusters=16, per_cluster=25)
    )


def test_length_buckets_capacities_and_waste(spark):
    from project_cortex_spark.operators.corpus import length_buckets

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 8), (7, 9), (8, 0)],
        ["doc_id", "n_tokens"],
    )
    rows = {r["bucket_cap"]: r for r in length_buckets(df).collect()}
    # n=1 -> cap 1; n=2 -> 2; n in {3,4} -> 4; n in {5,8} -> 8; n=9 -> 16
    assert set(rows) == {1, 2, 4, 8, 16}
    assert rows[4]["n_docs"] == 2 and rows[4]["sum_tokens"] == 7
    assert rows[4]["padding_waste"] == 1  # 2*4 - 7
    assert rows[8]["n_docs"] == 2 and rows[8]["padding_waste"] == 3
    assert rows[16]["padding_waste"] == 7
    assert abs(rows[16]["fill_ratio"] - 9 / 16) < 1e-9
    # zero-length docs are dropped, not bucketed
    assert sum(r["n_docs"] for r in rows.values()) == 7


def test_cluster_split_no_leakage_and_singleton_parity(spark):
    """The leakage contract: every near-dup pair's two docs land in the
    SAME split; singletons get exactly the split hash_split would give
    them (rep == own id, same salt)."""
    from project_cortex_spark.operators import corpus as corpus_mod
    from project_cortex_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog "
    rows = []
    for i in range(40):
        rows.append((2 * i, base + f"uniq{i} alpha beta gamma delta"))
        rows.append((2 * i + 1, base + f"uniq{i} alpha beta gamma epsilon"))
    for i in range(80, 120):  # singletons: all-unique text
        rows.append((i + 1000, " ".join(f"s{i}w{j}" for j in range(12))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dd.duplicate_clusters(pairs.select("a", "b"))
    out = corpus_mod.cluster_split(docs, clusters)
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(split_of) == docs.count()
    for p in pairs.collect():
        assert split_of[p["a"]] == split_of[p["b"]], (p["a"], p["b"])
    singles = {r["doc_id"]: r["split"] for r in out.filter(
        F.col("doc_id") == F.col("rep")).collect()}
    plain = {
        r["doc_id"]: r["split"]
        for r in corpus_mod.hash_split(docs).collect()
    }
    for d, s in singles.items():
        # a doc that represents itself hashes identically either way
        assert plain[d] == s
    # the per-doc split DOES leak on this corpus (sanity that the
    # operator exists for a reason): some near-dup pair straddles
    leaks = [p for p in pairs.collect() if plain[p["a"]] != plain[p["b"]]]
    assert leaks or len(set(plain.values())) == 1
