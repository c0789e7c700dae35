"""BPE trainer vs the fully independent DuckDB replay (SURVEY beyond-
parity: tokenizer training as a distributed pipeline stage)."""

from __future__ import annotations

import duckdb

from project_cortex_spark import oracle
from project_cortex_spark.operators.bpe import bpe_train, word_frequencies

from .conftest import assert_matches_oracle


def test_bpe_train_matches_independent_replay(registry, duck):
    df = bpe_train(registry.table("documents"), n_merges=6, top_words=80)
    assert_matches_oracle(
        df,
        duck,
        oracle.bpe_train_oracle_sql(n_merges=6, top_words=80),
        ordered=True,
    )


def test_bpe_merge_scan_overlap_semantics(spark):
    """The aaaa case: one scan pass merges (a,a) twice — [aa, aa], NOT
    [aa, a, a] — and the next round's top pair is (aa, aa). Pins the
    leftmost-first non-overlapping rescan contract the oracle's
    iterated first-occurrence replacement must (and does) reproduce."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    rows = bpe_train(docs, n_merges=3, top_words=10).collect()
    got = [(r.merge_round, r.lhs, r.rhs, r.pair_count) for r in rows]
    # round 1: pairs of [a,a,a,a,</w>] ×3: (a,a) count 9, (a,</w>) 3
    # round 2: [aa,aa,</w>] ×3: (aa,aa) 3, (aa,</w>) 3 — tie, lhs 'aa'
    #          sorts before 'aa' equal, rhs '</w>' < 'aa' so (aa,</w>)
    # round 3: [aa,aa</w>] ×3: (aa, aa</w>) 3
    assert got[0] == (1, "a", "a", 9)
    assert got[1] == (2, "aa", "</w>", 3)
    assert got[2] == (3, "aa", "aa</w>", 3)
    # the same tiny corpus through the SQL replay agrees exactly
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 0 AS doc_id, 'aaaa aaaa aaaa' AS text"
    )
    replay = con.execute(
        oracle.bpe_train_oracle_sql(n_merges=3, top_words=10)
    ).fetchall()
    assert [tuple(r) for r in replay] == got
    con.close()


def test_bpe_driver_and_distributed_paths_agree(registry, monkeypatch):
    """The r9 bounded driver-side merge loop must reproduce the
    distributed loop row-for-row (same counts, same tie-breaks, same
    scan-merge) — forcing _DRIVER_VOCAB_MAX to 0 exercises the
    distributed arm on the same corpus."""
    import project_cortex_spark.operators.bpe as bpe_mod

    docs = registry.table("documents")
    fast = bpe_train(docs, n_merges=6, top_words=80).collect()
    monkeypatch.setattr(bpe_mod, "_DRIVER_VOCAB_MAX", 0)
    slow = bpe_train(docs, n_merges=6, top_words=80).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
    assert len(fast) == 6


def test_word_frequencies_filters_non_alpha(spark):
    docs = spark.createDataFrame(
        [(0, "The cat cat 42 c4t  sat!")], "doc_id long, text string"
    )
    got = {r.word: r.freq for r in word_frequencies(docs).collect()}
    # '42', 'c4t' and 'sat!' all fail ^[a-z]+$; 'The' lowercases in
    assert got == {"the": 1, "cat": 2}


def test_bpe_segment_matches_replay(registry, duck):
    from project_cortex_spark.operators.bpe import bpe_token_frequencies

    df = bpe_token_frequencies(
        registry.table("documents"), n_merges=6, top_words=80, top_k=20
    )
    assert_matches_oracle(
        df,
        duck,
        oracle.bpe_segment_oracle_sql(n_merges=6, top_words=80, top_k=20),
        ordered=True,
    )


def test_bpe_segment_words_applies_merges_in_order(spark):
    from project_cortex_spark.operators.bpe import bpe_segment_words

    words = spark.createDataFrame(
        [("banana", 3), ("bandana", 1)], "word string, freq long"
    )
    # merge order matters: (a,n) first turns every 'an' into one symbol,
    # then (b,an) can fire; reversed order could never fire (b,an)
    out = {
        r.word: list(r.tokens)
        for r in bpe_segment_words(
            words, [("a", "n"), ("b", "an")]
        ).collect()
    }
    assert out["banana"] == ["ban", "an", "a", "</w>"]
    assert out["bandana"] == ["ban", "d", "an", "a", "</w>"]
