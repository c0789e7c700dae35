"""Parse UDF (D3/G9): real Python ast extraction + graph feed."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_cortex_spark.pipeline import embed as em
from project_cortex_spark.pipeline import parse as ps
from project_cortex_spark.sources import files as fsrc

SAMPLE = '''\
import os
from collections import defaultdict as dd

def helper(x):
    return os.path.join(x, "y")

class Greeter:
    def greet(self, name, punct):
        return helper(name) + punct

def main():
    g = Greeter()
    return g.greet("hi", "!")
'''


def _sample_files(spark):
    return spark.createDataFrame(
        [("demo.py", bytearray(SAMPLE.encode()))], "file_path string, content binary"
    )


def test_parse_python_entities(spark):
    ents = ps.parse_entities(_sample_files(spark)).collect()
    by_kind = {}
    for r in ents:
        by_kind.setdefault(r["kind"], []).append(r)
    assert [t["name"] for t in by_kind["type"]] == ["Greeter"]
    funcs = {f["name"]: f for f in by_kind["function"]}
    assert set(funcs) == {"helper", "greet", "main"}
    assert funcs["greet"]["is_method"] and funcs["greet"]["parent"] == "Greeter"
    assert funcs["greet"]["n_params"] == 3  # self, name, punct
    assert not funcs["main"]["is_method"]
    imports = {i["name"]: i["detail"] for i in by_kind["import"]}
    assert imports == {"os": None, "collections.defaultdict": "dd"}
    calls = {(c["parent"], c["name"]) for c in by_kind["call"]}
    assert {("greet", "helper"), ("main", "Greeter"), ("main", "greet"),
            ("helper", "join")} <= calls
    assert "error" not in by_kind


def test_parse_error_rows(spark):
    bad = spark.createDataFrame(
        [("broken.py", bytearray(b"def oops(:")),
         ("data.bin", bytearray(b"\x00\x01"))],
        "file_path string, content binary",
    )
    rows = {r["file_path"]: r for r in ps.parse_entities(bad).collect()}
    assert rows["broken.py"]["kind"] == "error"
    assert rows["broken.py"]["name"] == "SyntaxError"
    assert rows["data.bin"]["name"] == "UnsupportedLanguage"


def test_call_edges_resolution(spark):
    ents = ps.parse_entities(_sample_files(spark))
    edges = {(r["src"], r["dst"]) for r in ps.call_edges(ents).collect()}
    # helper->join and main->Greeter are unresolved (no such function def)
    assert edges == {("greet", "helper"), ("main", "greet")}


def test_format_entities_prose(spark):
    ents = ps.parse_entities(_sample_files(spark))
    row = ps.format_entities(ents).first()
    assert row["file_path"] == "demo.py"
    lines = row["summary"].split("\n")
    assert "Functions: greet, helper, main" in lines
    assert "Types: Greeter" in lines
    assert any(line.startswith("Imports: ") for line in lines)


def test_index_build_end_to_end_own_sources(spark):
    """The full build pipeline over this repo's own package: discover ->
    parse -> NL format -> embed. Every .py file parses and yields a
    normalized embedding."""
    files = fsrc.discover_files(
        spark, "/root/repo/project_cortex_spark", glob="*.py", recursive=True
    )
    ents = ps.parse_entities(files).cache()
    assert ents.filter(F.col("kind") == "error").count() == 0
    summaries = ps.format_entities(ents)
    embedded = em.embed_chunks(summaries, text_col="summary", dim=32)
    rows = embedded.select("file_path", F.size("embedding").alias("d")).collect()
    assert len(rows) == files.count()
    assert all(r["d"] == 32 for r in rows)
    # the extracted call graph knows this package: callers() calls bfs()
    edges = ps.call_edges(ents)
    assert edges.filter((F.col("src") == "callers") & (F.col("dst") == "bfs")).count() == 1
    ents.unpersist()
