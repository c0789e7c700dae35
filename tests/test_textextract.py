"""HTML boilerplate removal + PDF text extraction."""
import math
import zlib

import pytest

from project_cortex_spark.operators import textextract as tx


class TestHtmlExtract:
    def test_recovers_exact_paragraphs(self):
        text = " ".join(f"w{i}" for i in range(21))
        main, n_par, n_drop = tx.html_to_text(tx.synthesize_html(7, text))
        words = text.split(" ")
        expect = "\n".join(
            " ".join(words[i: i + 8]) for i in range(0, len(words), 8)
        )
        assert main == expect
        assert n_par == math.ceil(len(words) / 8)
        assert n_drop == 7 % 3 + 5  # nav + footer + link farm anchors
        assert len(main) == len(text)

    def test_entities_and_chrome(self):
        main, _, _ = tx.html_to_text(tx.synthesize_html(0, "x<y & z q"))
        assert main == "x<y & z q"
        # title/script/style never leak into main text
        assert "Doc 0" not in main and "tracker" not in main

    def test_link_density_heuristic(self):
        doc = (
            "<html><body>"
            '<p>plain prose with no links at all here</p>'
            '<div><a href="/1">one</a> <a href="/2">two</a></div>'
            "</body></html>"
        )
        main, n_par, n_drop = tx.html_to_text(doc)
        assert main == "plain prose with no links at all here"
        assert n_par == 1 and n_drop == 2

    def test_inline_link_in_prose_is_kept(self):
        doc = ('<html><body><p>read the <a href="/d">docs</a> '
               "for much more detailed context</p></body></html>")
        main, n_par, n_drop = tx.html_to_text(doc)
        assert "read the docs for much more" in main
        assert n_drop == 0


class TestPdfExtract:
    def test_recovers_exact_text_multi_page(self):
        text = " ".join(f"w{i}" for i in range(8 * 25))  # 25 lines, 3 pages
        pdf = tx.synthesize_pdf(3, text)
        out, n_pages, n_ops = tx.pdf_to_text(pdf)
        words = text.split(" ")
        expect = "\n".join(
            " ".join(words[i: i + 8]) for i in range(0, len(words), 8)
        )
        assert out == expect
        assert n_pages == 3 and n_ops == 25

    def test_string_escapes(self):
        text = "a(b) c\\d " + " ".join(f"w{i}" for i in range(16))
        out, _, _ = tx.pdf_to_text(tx.synthesize_pdf(1, text))
        words = text.split(" ")
        expect = "\n".join(
            " ".join(words[i: i + 8]) for i in range(0, len(words), 8)
        )
        assert out == expect

    def test_length_is_authoritative_over_delimiter_guessing(self):
        # regression: doc 459's Flate bytes END in 0x0D; a
        # `\r?\nendstream` regex eats it and truncates the stream
        for tail in (b"\r", b"\n"):
            payload = b"BT (hello) Tj ET"
            comp = None
            # find a compressed stream ending in the hazardous byte by
            # varying padding (zlib output is deterministic)
            for pad in range(200):
                c = zlib.compress(payload + b" " * pad)
                if c.endswith(tail):
                    comp = zlib.compress(payload + b" " * pad)
                    break
            if comp is None:
                continue
            body = (
                b"%PDF-1.4\n1 0 obj\n<< /Length "
                + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n"
                + comp
                + b"\nendstream\nendobj\n%%EOF\n"
            )
            out, _, n_ops = tx.pdf_to_text(body)
            assert out.startswith("hello") and n_ops == 1

    def test_tj_array_and_uncompressed_stream(self):
        body = (
            b"%PDF-1.4\n1 0 obj\n<< /Length 33 >>\nstream\n"
            b"BT [(ab) (cd)] TJ (ef) Tj T* ET\nendstream\nendobj\n%%EOF\n"
        )
        out, _, n_ops = tx.pdf_to_text(body)
        assert out == "abcdef\n"

    def test_rejects_non_pdf_encrypted_indirect_length(self):
        with pytest.raises(ValueError):
            tx.pdf_to_text(b"not a pdf")
        with pytest.raises(ValueError):
            tx.pdf_to_text(b"%PDF-1.4 /Encrypt 5 0 R")
        body = (
            b"%PDF-1.4\n1 0 obj\n<< /Length 2 0 R >>\nstream\nBT ET"
            b"\nendstream\nendobj\n"
        )
        with pytest.raises(ValueError):
            tx.pdf_to_text(body)


class TestMojibake:
    def test_repairs_every_suffix_single_and_double(self):
        for suf in tx.MOJIBAKE_SUFFIXES:
            for rounds in (1, 2):
                orig = "plain ascii words here" + suf
                fixed, n = tx.fix_mojibake(tx.make_mojibake(orig, rounds=rounds))
                assert fixed == orig and n == rounds

    def test_clean_text_is_untouched(self):
        for t in ("pure ascii", "café déjà vu", "東京 123", ""):
            fixed, n = tx.fix_mojibake(t)
            assert fixed == t and n == 0

    def test_cp1252_flavor_also_repairs(self):
        # damage made with cp1252 (curly quote U+2019 -> 0xE2 0x80 0x99
        # -> 'â€™') must repair through the cp1252-first encode
        orig = "it’s fine"
        bad = orig.encode("utf-8").decode("cp1252")
        fixed, n = tx.fix_mojibake(bad)
        assert fixed == orig and n == 1

    def test_spark_operator(self, spark):
        import hashlib

        from pyspark.sql import functions as F

        docs = spark.range(0, 8).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("body text num "), F.col("id")).alias("text"),
        )
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        rows = {r["doc_id"]: r for r in tx.repair_mojibake(
            tx.synthesize_mojibake_docs(docs)).collect()}
        for did, t in texts.items():
            orig = t + tx.MOJIBAKE_SUFFIXES[did % 4]
            r = rows[did]
            assert r["changed"] and r["n_rounds"] == did % 2 + 1
            assert r["fixed_md5"] == hashlib.md5(orig.encode()).hexdigest()
            assert r["fixed_chars"] == len(orig)


class TestSparkPath:
    def test_extract_operators_end_to_end(self, spark):
        import hashlib

        from pyspark.sql import functions as F

        docs = spark.range(0, 15).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", *[F.concat(F.lit(f"t{i}x"), F.col("id")) for i in range(20)]
            ).alias("text"),
        )
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        h_rows = {r["doc_id"]: r for r in
                  tx.extract_html_text(tx.synthesize_html_docs(docs)).collect()}
        p_rows = {r["doc_id"]: r for r in
                  tx.extract_pdf_text(tx.synthesize_pdf_docs(docs)).collect()}
        for did, text in texts.items():
            words = text.split(" ")
            expect = "\n".join(
                " ".join(words[i: i + 8]) for i in range(0, len(words), 8)
            )
            md5 = hashlib.md5(expect.encode()).hexdigest()
            assert h_rows[did]["ok"] and h_rows[did]["text_md5"] == md5
            assert p_rows[did]["ok"] and p_rows[did]["text_md5"] == md5
            assert h_rows[did]["main_chars"] == len(text)

    def test_bad_payloads_are_ok_false(self, spark):
        bad = spark.createDataFrame(
            [(1, bytearray(b"plainly not a pdf"))], "doc_id long, pdf binary"
        )
        rows = tx.extract_pdf_text(bad).collect()
        assert rows[0]["ok"] is False and rows[0]["text_md5"] is None
