"""Round-2 training-pipeline additions: sequence packing, bigram-LM
scoring, per-doc TF-IDF keywords, int8 embedding quantization, ANN
recall self-measurement."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from project_cortex_spark import oracle
from project_cortex_spark.operators import corpus, knn, textstats

from .conftest import assert_matches_oracle


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_sequences_matches_oracle(registry, duck):
    got = corpus.pack_sequences(
        registry.table("documents"), seq_tokens=256, writers=16
    )
    assert_matches_oracle(
        got, duck, oracle.pack_sequences_sql(seq_tokens=256, writers=16)
    )


def test_pack_sequences_layout(spark):
    docs = spark.createDataFrame(
        [(i, "x" * 400) for i in range(10)], ["doc_id", "text"]
    )  # 100 tokens each at len/4
    got = corpus.pack_sequences(docs, seq_tokens=256, writers=1).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert len(by_id) == 10
    # single writer: offsets are 0,100,...,900 in hash order; each seq_id
    # is floor(offset/256) and consecutive offsets tile the stream
    offsets = sorted(r["start_offset"] for r in got)
    assert offsets == [100 * i for i in range(10)]
    for r in got:
        assert r["seq_id"] == r["start_offset"] // 256
        assert r["n_tokens"] == 100
    # stability: same layout on re-run
    again = corpus.pack_sequences(docs, seq_tokens=256, writers=1).collect()
    assert {(r["doc_id"], r["start_offset"]) for r in got} == {
        (r["doc_id"], r["start_offset"]) for r in again
    }


def test_pack_sequences_writer_isolation(spark):
    """A document's (writer, start_offset) never depends on other
    writers' contents — removing every doc from OTHER writers leaves
    this writer's layout untouched."""
    docs = spark.createDataFrame(
        [(i, "y" * (40 + 8 * (i % 7))) for i in range(40)], ["doc_id", "text"]
    )
    full = corpus.pack_sequences(docs, seq_tokens=64, writers=4).collect()
    target = full[0]["writer"]
    keep_ids = [r["doc_id"] for r in full if r["writer"] == target]
    sub = corpus.pack_sequences(
        docs.filter(F.col("doc_id").isin(keep_ids)), seq_tokens=64, writers=4
    ).collect()
    assert {(r["doc_id"], r["start_offset"], r["seq_id"]) for r in sub} == {
        (r["doc_id"], r["start_offset"], r["seq_id"])
        for r in full
        if r["writer"] == target
    }


# ---------------------------------------------------------------------------
# bigram_lm_score
# ---------------------------------------------------------------------------


def test_bigram_lm_matches_oracle(registry, duck):
    got = textstats.bigram_lm_score(registry.table("documents"))
    assert_matches_oracle(got, duck, oracle.bigram_lm_sql())


def test_bigram_lm_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # all mass on a->b / b->a
            (2, "a b c d e f"),  # unique bigrams
            (3, "a"),  # no bigrams
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in textstats.bigram_lm_score(docs).collect()}
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_logprob"] == 0.0
    assert got[1]["n_bigrams"] == 5 and got[2]["n_bigrams"] == 5
    # doc 1 repeats the corpus's dominant bigrams -> higher (less negative)
    assert got[1]["avg_logprob"] > got[2]["avg_logprob"]
    # hand check: V=6; c(a,b)=4 (docs 1+2), c(a,.)=4 -> P(b|a)=(4+1)/(4+6);
    # c(b,a)=2, c(b,.)=3 -> P(a|b)=(2+1)/(3+6)
    v = 6
    p_ab = math.log((4 + 1) / (4 + v))
    p_ba = math.log((2 + 1) / (3 + v))
    expected1 = round((3 * p_ab + 2 * p_ba) / 5, 6)
    assert abs(got[1]["avg_logprob"] - expected1) < 1e-6


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def test_tfidf_matches_oracle(registry, duck):
    got = textstats.tfidf_top_terms(registry.table("documents"))
    assert_matches_oracle(got, duck, oracle.tfidf_top_terms_sql(k=5))


def test_tfidf_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared shared rare rare rare"),
            (2, "shared shared shared other"),
        ],
        ["doc_id", "text"],
    )
    got = textstats.tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'rare' (df=1) outranks 'shared' (df=2) in doc 1 despite tf parity shift
    assert by_doc[1][0]["term"] == "rare" and by_doc[1][0]["rank"] == 1
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2
    r1 = by_doc[1][0]
    assert abs(r1["score"] - round(3 * math.log(1 + 2 / 1), 6)) < 1e-6


# ---------------------------------------------------------------------------
# quantize_embeddings
# ---------------------------------------------------------------------------


def test_quantize_matches_oracle(registry, duck):
    got = knn.quantize_embeddings(registry.table("embeddings"))
    assert_matches_oracle(got, duck, oracle.quantize_embeddings_sql())


def test_quantize_semantics(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: r for r in knn.quantize_embeddings(emb).collect()}
    # scale = 1/127; q = [127, -63 (floor(-63.5+0.5) = floor(-63) — halves
    # round toward +inf, identically in both engines), 32, 0]
    scale = 1.0 / 127.0
    assert got[1]["scale_e9"] == math.floor(scale * 1e9)
    assert got[1]["qnorm_sq"] == 127 * 127 + 63 * 63 + 32 * 32
    # max per-component error is scale/2
    assert got[1]["recon_err"] <= scale / 2 * math.sqrt(4) + 1e-9
    # zero vector: scale 0, all-zero q, zero error
    assert got[2]["scale_e9"] == 0 and got[2]["qnorm_sq"] == 0
    assert got[2]["recon_err"] == 0.0


# ---------------------------------------------------------------------------
# ann_recall
# ---------------------------------------------------------------------------


def test_ann_recall_exact_vs_itself(registry):
    emb = registry.table("embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn.knn_join(q, emb, k=5)
    got = knn.ann_recall(exact, exact).collect()
    assert len(got) == 3
    assert all(r["recall_e4"] == 10_000 and r["n_hit"] == 5 for r in got)


def test_ann_recall_partial(spark):
    exact = spark.createDataFrame(
        [(1, i, 1.0, i) for i in range(1, 6)],
        ["query_id", "vec_id", "score", "rank"],
    )
    # approx found 3 of the 5, plus a spurious neighbor
    approx = spark.createDataFrame(
        [(1, 1, 1.0, 1), (1, 2, 1.0, 2), (1, 3, 1.0, 3), (1, 99, 1.0, 4)],
        ["query_id", "vec_id", "score", "rank"],
    )
    r = knn.ann_recall(approx, exact).collect()[0]
    assert r["n_exact"] == 5 and r["n_hit"] == 3 and r["recall_e4"] == 6000


# ---------------------------------------------------------------------------
# c4_clean
# ---------------------------------------------------------------------------


def test_c4_clean_semantics(spark):
    page = "\n".join(
        [
            "This is a perfectly good sentence.",  # kept
            "Please enable JavaScript to continue.",  # blocklist
            "We use cookie tracking on this site.",  # blocklist
            "short line.",  # < 4 words
            "No terminal punctuation on this line",  # no punct
            'He said "stop right there."',  # kept (quote terminal)
            "if (x) { return 1; }",  # brace
        ]
    )
    docs = spark.createDataFrame(
        [(1, page), (2, "one good sentence stands alone.")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in textstats.c4_clean(docs).collect()}
    assert got[1]["n_lines"] == 7 and got[1]["n_kept"] == 2
    assert got[1]["kept"] is True
    assert got[1]["cleaned"].split("\n") == [
        "This is a perfectly good sentence.",
        'He said "stop right there."',
    ]
    # one surviving line < MIN_KEPT_LINES -> document dropped, empty text
    assert got[2]["kept"] is False and got[2]["cleaned"] == ""


def test_c4_clean_plan_is_narrow(spark):
    docs = spark.createDataFrame([(1, "a good line here.")], ["doc_id", "text"])
    plan = textstats.c4_clean(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# corpus profile
# ---------------------------------------------------------------------------


def test_corpus_profile_matches_oracle(registry, duck):
    got = corpus.profile(registry.table("documents"))
    assert_matches_oracle(got, duck, oracle.corpus_profile_sql())


def test_corpus_profile_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en"),
            (2, "alpha beta gamma", "en"),  # exact dup of 1
            (3, "alpha delta", "fr"),
        ],
        ["doc_id", "text", "lang"],
    )
    got = {r["metric"]: r["value"] for r in corpus.profile(docs).collect()}
    assert got["n_docs"] == 3
    assert got["total_tokens"] == 8
    assert got["vocab_size"] == 4  # alpha beta gamma delta
    assert got["n_langs"] == 2
    assert got["exact_dup_docs"] == 1  # one redundant copy
    assert got["avg_doc_tokens_e4"] == 10_000 * 8 // 3


# ---------------------------------------------------------------------------
# bpe_token_stats
# ---------------------------------------------------------------------------


def test_bpe_tokens_matches_oracle(registry, duck):
    got = textstats.bpe_token_stats(registry.table("documents"))
    assert_matches_oracle(got, duck, oracle.bpe_token_stats_sql())


def test_bpe_tokens_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "It's 2024, isn't it?"), (2, "    ")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in textstats.bpe_token_stats(docs).collect()}
    # pieces of "it's 2024, isn't it?" (lowered):
    # [it]['s][ 2024][,][ isn]['t][ it][?] = 8 non-space pieces
    assert got[1]["n_bpe_pieces"] == 8
    assert got[1]["est_llm_tokens"] == 5  # len 20 // 4
    assert got[1]["pieces_per_est_e4"] == 16_000
    # whitespace-only doc: zero pieces
    assert got[2]["n_bpe_pieces"] == 0
