"""Structure-aware markdown chunker (D6): header/paragraph/fence/sentence
cascade with line spans (reference: internal/indexer/chunker.go:31-333)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from project_cortex_spark.pipeline.chunks import (
    chunk_markdown,
    chunk_markdown_doc,
    estimate_tokens,
)

MD = """\
# Guide

Preamble paragraph.

## Install

Run the installer. It is quick.

```bash
make install  ## this ## is ## not ## a ## header
echo "done"
```

Post-install note.

## Reference

""" + ("This sentence pads the reference section to force splitting. " * 30) + """

Tail paragraph.
"""


def test_small_section_is_one_chunk():
    rows = chunk_markdown_doc("a.md", "## One\n\nshort text", target_tokens=100)
    assert len(rows) == 1
    cid, _, sec, idx, text, s, e, n, split = rows[0]
    assert cid == "doc-a.md-s0-c0" and text.startswith("## One")
    assert (s, e) == (1, 3) and not split


def test_empty_doc_yields_nothing():
    assert chunk_markdown_doc("a.md", "   \n  ") == []


def test_sections_split_at_h2_only():
    rows = chunk_markdown_doc("g.md", MD, target_tokens=100)
    # preamble (s0, includes the # h1), Install (s1), Reference (s2)
    assert {r[2] for r in rows} == {0, 1, 2}
    s1 = [r for r in rows if r[2] == 1]
    assert s1[0][4].startswith("## Install")


def test_fence_never_split_and_h2_inside_fence_ignored():
    rows = chunk_markdown_doc("g.md", MD, target_tokens=40)
    for r in rows:
        assert r[4].count("```") % 2 == 0, f"fence split in {r[0]}"
    # the ## lines inside the fence did not create sections
    assert {r[2] for r in rows} == {0, 1, 2}


def test_h2_at_line_start_inside_fence_is_code_not_header():
    md = "## Top\n\n```\n## looks like a header\n```\n\ntail"
    rows = chunk_markdown_doc("x.md", md, target_tokens=100)
    assert {r[2] for r in rows} == {0}  # one section only
    assert rows[0][4].count("```") == 2


def test_oversize_paragraph_sentence_split_with_flag():
    rows = chunk_markdown_doc("g.md", MD, target_tokens=60)
    split_rows = [r for r in rows if r[8]]
    assert split_rows, "oversize paragraph must be sentence-split"
    for r in split_rows:
        assert r[7] <= 2 * 60  # a single sentence can overshoot, packs can't
    # all split chunks carry the paragraph's line span
    spans = {(r[5], r[6]) for r in split_rows}
    assert len(spans) == 1


def test_line_spans_cover_document_monotonically():
    rows = chunk_markdown_doc("g.md", MD, target_tokens=60)
    assert all(r[5] <= r[6] for r in rows)
    starts = [r[5] for r in rows]
    assert starts == sorted(starts)
    assert rows[0][5] == 1


def test_ids_stable_and_unique():
    rows = chunk_markdown_doc("g.md", MD, target_tokens=60)
    ids = [r[0] for r in rows]
    assert len(ids) == len(set(ids))
    assert ids == [r[0] for r in chunk_markdown_doc("g.md", MD, target_tokens=60)]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sampled_from([
            "## Header",
            "plain paragraph text that has some words in it",
            "",
            "```",
            "code line with ## inside",
            "short",
            "A long sentence that keeps going and going. " * 6,
        ]),
        min_size=0,
        max_size=30,
    ),
    st.integers(min_value=10, max_value=80),
)
def test_chunker_invariants(lines, target):
    """Fences stay intact; packed (non-split) chunks respect the ceiling
    unless a single atomic paragraph exceeds it; spans are in-document."""
    text = "\n".join(lines)
    rows = chunk_markdown_doc("p.md", text, target_tokens=target)
    n_lines = len(lines) or 1
    # fence-aware section splitting: every section's fences are balanced
    # except a trailing unterminated fence, which yields at most one odd
    # fence-to-EOF chunk in the LAST section
    odd = [r for r in rows if r[4].count("```") % 2]
    n_fence_lines = sum(1 for l in lines if l.startswith("```"))
    assert len(odd) <= (1 if n_fence_lines % 2 else 0)
    if odd:
        assert odd[0][2] == max(r[2] for r in rows)
    for cid, path, sec, idx, chunk, s, e, n_tok, is_split in rows:
        assert 1 <= s <= e <= n_lines
        assert n_tok == estimate_tokens(chunk)
        if not is_split and "\n\n" in chunk and not chunk.startswith("```"):
            # multi-paragraph packs only form under the ceiling; the last
            # paragraph may overshoot, plus floor-rounding slop (the
            # packed estimate sums per-paragraph floors, the final
            # estimate floors the joined text with its \n\n separators)
            n_paras = chunk.count("\n\n") + 1
            assert n_tok <= (
                target + estimate_tokens(chunk.split("\n\n")[-1]) + n_paras
            )


def test_spark_operator_matches_pure_function(spark):
    df = spark.createDataFrame(
        [("g.md", MD), ("a.md", "## One\n\nshort")], ["file_path", "text"]
    )
    got = {
        tuple(r)
        for r in chunk_markdown(df, target_tokens=60).collect()
    }
    want = {
        tuple(r)
        for r in (
            chunk_markdown_doc("g.md", MD, target_tokens=60)
            + chunk_markdown_doc("a.md", "## One\n\nshort", target_tokens=60)
        )
    }
    assert got == want
