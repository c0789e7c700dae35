"""Document text extraction for web/PDF corpora — stdlib only.

Two REAL extractors for the two biggest raw-document classes an LLM
training pipeline ingests:

* :func:`html_to_text` — boilerplate-removing main-text extraction
  over stdlib ``html.parser``: script/style/template contents dropped,
  structural chrome (nav/header/footer/aside) excluded, per-block link
  density computed from the ACTUAL anchor spans and high-link-density
  blocks dropped (the trafilatura/jusText-family heuristic), entity
  references decoded, paragraphs joined with newlines.
* :func:`pdf_to_text` — text extraction from real PDF files: object
  scan, stream decoding (FlateDecode via stdlib zlib, or raw), content
  tokenization for the text-showing operators ``Tj``/``'``/``\"`` and
  ``TJ`` arrays, PDF string unescaping (backslash escapes + octal),
  page-ordered output. Encrypted or exotic-filter PDFs raise
  ValueError (-> ok=false rows), never wrong text.

Both run as Arrow-batched narrow maps (``mapInPandas``) — per-document
pure functions, no shuffle, document-level parallelism at 100 TB. The
correctness gates synthesize REAL containers (a full HTML page with
nav/footer chrome around the doc text; a real multi-object PDF with
Flate-compressed content streams and a byte-exact xref table) whose
extracted text is a closed-form function of the documents table, so
the oracle states md5(text) exactly.
"""
from __future__ import annotations

import html.parser
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_DROP_SUBTREE = {"script", "style", "template", "noscript",
                 "head", "title", "nav", "header", "footer", "aside"}
_BLOCK = {"p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
          "article", "section", "td", "pre", "blockquote"}


class _Extractor(html.parser.HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.link_depth = 0
        self.dropped_links = 0
        # (text, linked_chars, n_anchors) per flushed block
        self.blocks: list[tuple[str, int, int]] = []
        self._text: list[str] = []
        self._linked = 0
        self._anchors = 0

    def _flush(self) -> None:
        text = "".join(self._text).strip()
        if text:
            self.blocks.append((text, self._linked, self._anchors))
        self._text, self._linked, self._anchors = [], 0, 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_SUBTREE:
            self.drop_depth += 1
            return
        if tag == "a":
            if self.drop_depth:
                self.dropped_links += 1
            else:
                self.link_depth += 1
                self._anchors += 1
        if tag in _BLOCK and not self.drop_depth:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREE:
            self.drop_depth = max(0, self.drop_depth - 1)
            return
        if tag == "a" and not self.drop_depth:
            self.link_depth = max(0, self.link_depth - 1)
        if tag in _BLOCK and not self.drop_depth:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self.drop_depth:
            return
        self._text.append(data)
        if self.link_depth:
            self._linked += len(data)


def html_to_text(
    doc: str, *, max_link_density: float = 0.5
) -> tuple[str, int, int]:
    """-> (main_text, n_paragraphs, n_boilerplate_links).

    Boilerplate = structural chrome subtrees plus any text block whose
    linked-character density exceeds ``max_link_density``."""
    p = _Extractor()
    p.feed(doc)
    p.close()
    p._flush()
    kept = []
    dropped_links = p.dropped_links
    for text, linked, anchors in p.blocks:
        if linked and linked / len(text) > max_link_density:
            dropped_links += anchors
            continue
        kept.append(text)
    return "\n".join(kept), len(kept), dropped_links


def synthesize_html(doc_id: int, text: str, *, words_per_para: int = 8) -> str:
    """A realistic page around the doc text: head chrome, a nav with
    ``doc_id % 3 + 2`` links, the text as <p> paragraphs of
    ``words_per_para`` words, a link-farm div (killed by the density
    heuristic, not by tag), and a footer."""
    import html as _html

    words = text.split(" ")
    paras = [
        " ".join(words[i: i + words_per_para])
        for i in range(0, len(words), words_per_para)
    ]
    nav = " ".join(
        f'<a href="/s{i}">section {i}</a>' for i in range(doc_id % 3 + 2)
    )
    body = "\n".join(f"<p>{_html.escape(p)}</p>" for p in paras)
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        "<style>body{margin:0}</style>"
        "<script>var tracker=1;</script></head>"
        f"<body><nav>{nav}</nav>"
        f'<div id="main">{body}</div>'
        f'<div class="related"><a href="/r1">more</a> <a href="/r2">links</a></div>'
        f'<footer><a href="/tos">terms</a> (c) example</footer>'
        "</body></html>"
    )


def synthesize_html_docs(docs: DataFrame, *, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(doc_id, html) — each doc's text wrapped in the realistic page
    of :func:`synthesize_html`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "html": [
                        synthesize_html(int(d), t)
                        for d, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, html string"
    )


def synthesize_pdf_docs(docs: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(doc_id, pdf) — each doc's text typeset into the real PDF of
    :func:`synthesize_pdf`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "pdf": [
                        synthesize_pdf(int(d), t)
                        for d, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, pdf binary"
    )


HTML_EXTRACT_SCHEMA = (
    "doc_id long, n_paragraphs long, n_boilerplate_links long, "
    "main_chars long, text_md5 string, ok boolean"
)


def extract_html_text(docs: DataFrame, *, id_col: str = "doc_id",
                      html_col: str = "html") -> DataFrame:
    """Arrow-batched main-text extraction; emits per-doc block counts,
    boilerplate-link counts, and md5 of the extracted text (the gate's
    content hash)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, doc in zip(pdf[id_col], pdf[html_col]):
                try:
                    text, n_par, n_drop = html_to_text(doc)
                    rows.append(
                        (did, n_par, n_drop, len(text),
                         hashlib.md5(text.encode("utf-8")).hexdigest(), True)
                    )
                except Exception:
                    rows.append((did, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_paragraphs", "n_boilerplate_links",
                         "main_chars", "text_md5", "ok"],
            )

    return docs.mapInPandas(run, schema=HTML_EXTRACT_SCHEMA)


# --- encoding repair ---------------------------------------------------

def fix_mojibake(text: str, *, max_rounds: int = 3) -> tuple[str, int]:
    """Repair UTF-8-decoded-as-Latin-1/cp1252 mojibake (the ftfy
    class): re-encode with the single-byte codec and re-decode as
    UTF-8, iterating for doubly-encoded text, stopping as soon as a
    round is not cleanly reversible. Returns (fixed, n_rounds).
    Plain ASCII and already-clean unicode pass through untouched —
    clean non-Latin-1 text fails the re-encode and clean Latin-1 text
    fails the UTF-8 re-decode, so false repairs need a string that is
    SIMULTANEOUSLY valid mojibake, which real prose essentially never
    is."""
    cur = text
    rounds = 0
    while rounds < max_rounds:
        raw = None
        for codec in ("cp1252", "latin-1"):
            try:
                raw = cur.encode(codec)
                break
            except UnicodeEncodeError:
                continue
        if raw is None:
            break
        try:
            dec = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if dec == cur:
            break
        cur = dec
        rounds += 1
    return cur, rounds


def make_mojibake(text: str, *, rounds: int = 1) -> str:
    """The damage direction (for gates/tests): UTF-8 bytes mis-decoded
    as Latin-1, ``rounds`` times."""
    cur = text
    for _ in range(rounds):
        cur = cur.encode("utf-8").decode("latin-1")
    return cur


MOJIBAKE_SUFFIXES = (" café", " naïve", " 東京", " Übermaß")


def synthesize_mojibake_docs(docs: DataFrame, *, id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """(doc_id, text) with deterministic damage: a non-ASCII suffix
    keyed on ``doc_id % 4`` appended, then UTF-8-as-Latin-1 mojibake
    applied ``doc_id % 2 + 1`` times (odd ids are DOUBLY encoded)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts = [], []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                orig = t + MOJIBAKE_SUFFIXES[did % 4]
                ids.append(did)
                texts.append(make_mojibake(orig, rounds=did % 2 + 1))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, text string"
    )


MOJIBAKE_SCHEMA = (
    "doc_id long, n_rounds long, changed boolean, fixed_md5 string, "
    "fixed_chars long"
)


def repair_mojibake(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Arrow-batched encoding repair over a text column; emits the
    repair depth and md5/length of the repaired text. No shuffle —
    document-parallel like the other extractors."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                fixed, rounds = fix_mojibake(t)
                rows.append(
                    (did, rounds, fixed != t,
                     hashlib.md5(fixed.encode("utf-8")).hexdigest(),
                     len(fixed))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_rounds", "changed", "fixed_md5",
                         "fixed_chars"],
            )

    return docs.mapInPandas(run, schema=MOJIBAKE_SCHEMA)


# --- PDF ---------------------------------------------------------------

def synthesize_pdf(doc_id: int, text: str, *, words_per_line: int = 8,
                   lines_per_page: int = 12) -> bytes:
    """A REAL multi-page PDF: catalog/pages/page objects, per-page
    FlateDecode content streams of ``Tj`` text lines, a Type1 font
    object, and a byte-exact xref table + trailer."""
    words = text.split(" ")
    lines = [
        " ".join(words[i: i + words_per_line])
        for i in range(0, len(words), words_per_line)
    ]
    pages = [
        lines[i: i + lines_per_page]
        for i in range(0, len(lines), lines_per_page)
    ] or [[]]

    objs: list[bytes] = []

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page:
    # (4 + 2i) page, (5 + 2i) its content stream
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, page_lines in enumerate(pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td", "14 TL"]
        for j, line in enumerate(page_lines):
            if j:
                ops.append("T*")
            ops.append(f"({esc(line)}) Tj")
        ops.append("ET")
        stream = zlib.compress("\n".join(ops).encode("utf-8"))
        objs.append(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\n"
            .encode() + b"stream\n" + stream + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_TEXT_OP_RE = re.compile(
    rb"\((?P<s>(?:[^()\\]|\\.)*)\)\s*(?P<op>Tj|')"
    rb"|\[(?P<arr>(?:[^\[\]\\]|\\.)*)\]\s*TJ"
    rb"|(?P<star>T\*)",
    re.S,
)
_ARR_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.S)
_PDF_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_pdf_string(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i: i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1: i + 2]
        if nxt.isdigit():
            oct_digits = raw[i + 1: i + 4]
            k = 1
            while k < 3 and k < len(oct_digits) and oct_digits[:k + 1].isdigit():
                k += 1
            out.append(int(raw[i + 1: i + 1 + k], 8) & 0xFF)
            i += 1 + k
        elif nxt in _PDF_ESC:
            out += _PDF_ESC[nxt]
            i += 2
        else:
            out += nxt  # unknown escape: the char itself
            i += 2
    return bytes(out)


def pdf_to_text(buf: bytes) -> tuple[str, int, int]:
    """-> (text, n_pages, n_text_ops). Text-showing strings in content
    order; ``T*`` and ``'`` start new lines, pages join with newlines."""
    if not buf.startswith(b"%PDF-"):
        raise ValueError("not a PDF file")
    if b"/Encrypt" in buf:
        raise ValueError("encrypted PDFs not supported")
    n_pages = buf.count(b"/Type /Page ") + buf.count(b"/Type/Page ")
    page_texts: list[str] = []
    n_ops = 0
    for m in _OBJ_RE.finditer(buf):
        body = m.group(3)
        kw = re.search(rb"stream(\r?\n)", body)
        if not kw:
            continue
        head = body[: kw.start()]
        # /Length is authoritative (PDF 1.7 §7.3.8): compressed bytes
        # may END in \r or \n, so delimiter-guessing with
        # `\r?\nendstream` can silently truncate the stream by a byte
        lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
        if lm:
            start = kw.end()
            data = body[start: start + int(lm.group(1))]
        elif re.search(rb"/Length\s+\d+\s+\d+\s+R", head):
            raise ValueError("indirect /Length not supported")
        else:
            sm = _STREAM_RE.search(body)
            if not sm:
                continue
            data = sm.group(1)
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"bad Flate stream: {e}") from None
        elif b"/Filter" in head:
            raise ValueError("unsupported stream filter")
        if b"BT" not in data:
            continue
        parts: list[str] = []
        for tm in _TEXT_OP_RE.finditer(data):
            if tm.group("star") is not None:
                parts.append("\n")
                continue
            n_ops += 1
            if tm.group("op") is not None:
                if tm.group("op") == b"'":
                    parts.append("\n")
                parts.append(
                    _unescape_pdf_string(tm.group("s")).decode(
                        "latin-1"
                    )
                )
            else:
                for sm2 in _ARR_STR_RE.finditer(tm.group("arr")):
                    parts.append(
                        _unescape_pdf_string(sm2.group(0)[1:-1]).decode(
                            "latin-1"
                        )
                    )
        page_texts.append("".join(parts))
    return "\n".join(t for t in page_texts if t), max(n_pages, 0), n_ops


def _mm_errors() -> tuple:
    """The shared poison-payload exception tuple (see multimodal.py)."""
    from .multimodal import DECODE_ERRORS

    return DECODE_ERRORS


PDF_EXTRACT_SCHEMA = (
    "doc_id long, n_pages long, n_text_ops long, main_chars long, "
    "text_md5 string, ok boolean"
)


def extract_pdf_text(docs: DataFrame, *, id_col: str = "doc_id",
                     pdf_col: str = "pdf") -> DataFrame:
    """Arrow-batched PDF text extraction; emits page/op counts and md5
    of the extracted text. Undecodable payloads -> ok=false rows."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[pdf_col]):
                try:
                    text, n_pages, n_ops = pdf_to_text(bytes(payload))
                    rows.append(
                        (did, n_pages, n_ops, len(text),
                         hashlib.md5(text.encode("utf-8")).hexdigest(), True)
                    )
                except _mm_errors():
                    rows.append((did, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_pages", "n_text_ops", "main_chars",
                         "text_md5", "ok"],
            )

    return docs.mapInPandas(run, schema=PDF_EXTRACT_SCHEMA)
