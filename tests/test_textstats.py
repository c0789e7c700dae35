"""Text-analysis operators vs generated DuckDB oracles."""

from __future__ import annotations

from project_cortex_spark import oracle
from project_cortex_spark.operators.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    redact_pii,
    repetition_stats,
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


def test_repetition_stats_matches_oracle(registry, duck):
    df = repetition_stats(registry.table("documents"))
    assert_matches_oracle(df, duck, oracle.repetition_stats_sql())


def test_repetition_stats_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),  # dup: two extra 'a'; bigrams: "a a"×2, "a b"
            (2, "x"),  # single token: no bigrams
            (3, ""),  # empty: no tokens at all
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["n_dup_tokens"] == 2
    assert got[1]["top_bigram_count"] == 2
    assert got[1]["dup_token_frac_e4"] == 5000  # 2/4
    assert got[1]["top_bigram_frac_e4"] == 6666  # floor(1e4*2/3)
    assert got[2]["n_tokens"] == 1 and got[2]["top_bigram_count"] == 0
    assert got[3]["n_tokens"] == 0 and got[3]["dup_token_frac_e4"] == 0


def test_redact_pii_known_values(spark):
    docs = spark.createDataFrame(
        [
            (
                1,
                "mail bob.smith+x@corp.example.org or 192.168.1.10 "
                "tel 415-555-0199 ssn 219-09-9999",
            ),
            (2, "no pii here"),
            # IP-shaped host inside an email: the email pattern (applied
            # first) consumes it, so it must NOT also count as an IP
            (3, "root@10.0.0.1.net end"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in redact_pii(docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_ip"] == 1
    assert got[1]["n_phone"] == 1 and got[1]["n_ssn"] == 1
    assert got[1]["redacted"] == "mail <EMAIL> or <IP> tel <PHONE> ssn <SSN>"
    assert got[2]["redacted"] == "no pii here"
    assert got[2]["n_email"] == 0
    assert got[3]["n_email"] == 1 and got[3]["n_ip"] == 0
    assert got[3]["redacted"] == "<EMAIL> end"


def test_fingerprint_stability(spark):
    # small edits far from the minimal window usually keep the fingerprint;
    # identical text always does
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).collect()}
    assert fps[1] == fps[2]


def test_char_entropy_matches_oracle(registry, duck):
    from project_cortex_spark.operators.textstats import char_entropy

    assert_matches_oracle(
        char_entropy(registry.table("documents")), duck, oracle.char_entropy_sql()
    )


def test_char_entropy_known_values(spark):
    """'aaaa' has zero entropy; 'abab' exactly 1 bit; empty text keeps a
    zero row (no dropped documents)."""
    import math

    from project_cortex_spark.operators.textstats import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, "abcd")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert got[1]["char_entropy"] == 0.0 and got[1]["n_distinct_chars"] == 1
    assert got[2]["char_entropy"] == 1.0
    assert got[3]["n_chars"] == 0 and got[3]["char_entropy"] == 0.0
    assert math.isclose(got[4]["char_entropy"], 2.0)


def test_gopher_rules_matches_oracle(registry, duck):
    from project_cortex_spark.operators.textstats import gopher_rules

    df = gopher_rules(registry.table("documents"))
    assert_matches_oracle(df, duck, oracle.gopher_rules_sql())


def test_gopher_rules_known_values(spark):
    from project_cortex_spark.operators.textstats import gopher_rules

    prose = (
        "the data and results show that we have built a pipeline "
        "to filter text of low quality with care and it works well "
        "in practice for corpus curation and the rules are simple "
        "and the counts be what they be when measured with rigor "
        "over many documents that we have kept with the tools"
    )
    docs = spark.createDataFrame(
        [
            (1, prose),  # passes every rule (51 words, all stops present)
            (2, "short text that we have"),  # fails min_words only
            (3, "- one\n- two\n- three\nplain"),  # bullet-heavy
            (4, "wait...\nmore...\nok\n"),  # ellipsis line endings
            (5, "# a # b # c # d"),  # hash symbol ratio
            (6, "12 34 56 78 90 11 22"),  # no alphabetic words
            (7, ""),  # empty doc: zero denominators
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert got[1]["keep"] is True and got[1]["n_stop_hits"] >= 2
    assert got[2]["keep"] is False and got[2]["n_words"] == 5
    assert got[3]["bullet_line_ratio"] == 0.75
    # trailing empty line after the final \n counts in the denominator
    assert got[4]["ellipsis_line_ratio"] == 0.5
    assert got[5]["hash_ratio"] == 0.5 and got[5]["keep"] is False
    assert got[6]["alpha_word_ratio"] == 0.0 and got[6]["keep"] is False
    assert got[7]["n_words"] == 0 and got[7]["keep"] is False


def test_gopher_repetition_matches_oracle(registry, duck):
    from project_cortex_spark.operators.textstats import gopher_repetition

    df = gopher_repetition(registry.table("documents"))
    assert_matches_oracle(df, duck, oracle.gopher_repetition_sql())


def test_gopher_repetition_known_values(spark):
    from project_cortex_spark.operators.textstats import gopher_repetition

    docs = spark.createDataFrame(
        [
            # line "ab" ×5 + "cdef": 4 dup occurrences, 8 dup chars of
            # 14; paragraphs "ab\nab" ×2 + "ab\ncdef": 1 dup of 3
            (1, "ab\nab\n\nab\ncdef\n\nab\nab"),
            (2, "xy\nzw"),  # no duplicates at all
            (3, ""),  # empty: all zeros, no NULL leak from the oracle
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    assert got[1]["n_lines"] == 6 and got[1]["dup_line_frac"] == round(4 / 6, 6)
    assert got[1]["dup_line_char_frac"] == round(8 / 14, 6)
    assert got[1]["n_paras"] == 3 and got[1]["dup_para_frac"] == round(1 / 3, 6)
    assert got[2]["dup_line_frac"] == 0.0
    assert got[3]["n_lines"] == 0 and got[3]["dup_line_char_frac"] == 0.0


def test_dsir_importance_ranks_target_like_docs_first(spark, duck):
    """Docs sharing the target slice's vocabulary must outscore docs
    that don't — the selection property DSIR exists for — and the
    scores replay exactly in DuckDB."""
    from project_cortex_spark import oracle as ora
    from project_cortex_spark.operators.textstats import dsir_importance
    from tests.conftest import assert_matches_oracle

    en = "the model trains on clean curated text data "
    xx = "zzz qqq vvv kkk jjj www yyy xxx uuu ooo "
    rows = [(i, en * 3, "en") for i in range(5)]
    rows += [(100 + i, xx * 3, "xx") for i in range(5)]
    # unlabeled docs: one looks like the target, one does not
    rows += [(200, en * 2 + "extra tail", "mys"), (201, xx * 2 + "extra tail", "mys")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {r.doc_id: r.importance_e9 for r in dsir_importance(df, k=12).collect()}
    assert got[200] > got[201]
    assert min(got[i] for i in range(5)) > max(got[100 + i] for i in range(5))
