"""Build-pipeline operators (SURVEY §2.9) vs DuckDB oracles + semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from project_cortex_spark import oracle
from project_cortex_spark.pipeline import change_detection as cd
from project_cortex_spark.pipeline import chunks as ch
from project_cortex_spark.pipeline import embed as em
from project_cortex_spark.pipeline import sink

from .conftest import assert_matches_oracle


def _states(registry):
    docs = registry.table("documents")
    return cd.simulated_fs_state(docs), cd.simulated_indexed_state(docs)


def test_change_detection(registry, duck):
    fs, idx = _states(registry)
    got = cd.detect_changes(fs, idx)
    assert_matches_oracle(got, duck, oracle.change_detection_sql())


def test_change_detection_lazy_hash_equivalent(registry):
    """The mtime fast-path plan must classify identically to the dense
    version, and only hash rows whose mtime differs."""
    fs, idx = _states(registry)
    fs_meta = fs  # hash col present but lazy path must not consult it early
    hashed_counter = {"rows": 0}

    def hash_fn(df):
        hashed_counter["rows"] = df.count()
        return df

    lazy = cd.detect_changes_lazy_hash(fs_meta, idx, hash_fn)
    dense = cd.detect_changes(fs, idx)
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, dense.collect()))
    n_mtime_diff = dense.filter(F.col("status").isin("modified", "touched")).count()
    assert hashed_counter["rows"] == n_mtime_diff


def test_apply_changeset_converges_to_fs(registry, duck):
    fs, idx = _states(registry)
    got = sink.apply_changeset(fs, idx)
    assert_matches_oracle(got, duck, oracle.apply_changeset_sql())


def test_branch_fork(registry, duck):
    fs, idx = _states(registry)
    changed = cd.detect_changes(fs, idx).filter(F.col("status") != "unchanged")
    got = cd.fork_branch(idx, changed)
    assert_matches_oracle(got, duck, oracle.branch_fork_sql())


def test_cascade_delete(registry):
    fs, idx = _states(registry)
    deleted = cd.detect_changes(fs, idx).filter(F.col("status") == "deleted")
    tables = {"files": idx, "chunks": idx.select("file_path", "mtime")}
    out = sink.cascade_delete(tables, deleted, key="file_path")
    n_del = deleted.count()
    assert out["files"].count() == idx.count() - n_del
    assert out["chunks"].count() == idx.count() - n_del
    assert (
        out["files"].join(deleted, "file_path", "inner").count() == 0
    )


def test_route_by_extension(spark):
    files = spark.createDataFrame(
        [("a/readme.md",), ("b/x.go",), ("c/y.MARKDOWN",), ("d/noext",)],
        ["file_path"],
    )
    got = {r["file_path"]: r["route"] for r in ch.route(files).collect()}
    assert got == {
        "a/readme.md": "docs",
        "b/x.go": "code",
        "c/y.MARKDOWN": "docs",
        "d/noext": "code",
    }


def test_chunk_fixed_tokens(registry, duck):
    got = ch.chunk_fixed_tokens(registry.table("documents"), tokens_per_chunk=32)
    assert_matches_oracle(got, duck, oracle.chunk_fixed_tokens_sql(tokens_per_chunk=32))


def test_chunk_ids_stable_and_spanning(registry):
    docs = registry.table("documents").limit(50)
    chunks = ch.chunk_fixed_tokens(docs, tokens_per_chunk=10)
    joined = (
        chunks.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("total"))
        .join(
            docs.select(
                "doc_id",
                F.size(
                    F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
                ).alias("n_words"),
            ),
            "doc_id",
        )
    )
    assert joined.filter(F.col("total") != F.col("n_words")).count() == 0


def test_chunk_assembly(registry, duck):
    got = ch.assemble_code_chunks(registry.table("documents"))
    assert_matches_oracle(got, duck, oracle.chunk_assembly_sql())


def test_merge_upsert_semantics(spark):
    existing = spark.createDataFrame(
        [("a", 1, "h1"), ("b", 2, "h2")], ["file_path", "mtime", "content_hash"]
    )
    updates = spark.createDataFrame(
        [("b", 3, "h2b"), ("c", 4, "h3")], ["file_path", "mtime", "content_hash"]
    )
    got = {
        r["file_path"]: (r["mtime"], r["content_hash"])
        for r in sink.merge_upsert(existing, updates, key="file_path").collect()
    }
    assert got == {"a": (1, "h1"), "b": (3, "h2b"), "c": (4, "h3")}


def test_embedding_deterministic_and_normalized():
    texts = pd.Series(["key agg row scan", "merge batch part", "key agg row scan"])
    a = em.hash_embed_series(texts, dim=32)
    assert len(a[0]) == 32
    assert np.allclose(np.linalg.norm(a[0]), 1.0, atol=1e-6)
    assert np.array_equal(a[0], a[2])
    assert not np.array_equal(a[0], a[1])
    # query mode differs from passage mode (asymmetric embedding seam)
    q = em.hash_embed_series(texts, dim=32, mode="query")
    assert not np.array_equal(a[0], q[0])


def test_embed_chunks_udf(registry):
    docs = registry.table("documents").limit(20)
    chunks = ch.chunk_fixed_tokens(docs, tokens_per_chunk=16)
    out = em.embed_chunks(chunks, dim=16)
    rows = out.select("chunk_id", "embedding").collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    norms = [sum(x * x for x in r["embedding"]) for r in rows]
    assert all(abs(n - 1.0) < 1e-5 for n in norms if n > 0)


# ---------------------------------------------------------------------------
# Discovery scan (S1/S2) — over this package's own source files
# ---------------------------------------------------------------------------

SRC_DIR = "/root/repo/project_cortex_spark"


def test_discover_file_stats(spark, duck):
    from project_cortex_spark.sources import files as fsrc

    got = fsrc.file_stats(
        fsrc.discover_files(spark, SRC_DIR, glob="*.py")
    ).drop("is_text")
    assert_matches_oracle(got, duck, oracle.file_stats_sql(f"{SRC_DIR}/*.py"))


def test_discover_recursive_and_text_flag(spark):
    from project_cortex_spark.sources import files as fsrc

    flat = fsrc.discover_files(spark, SRC_DIR, glob="*.py")
    deep = fsrc.discover_files(spark, SRC_DIR, glob="*.py", recursive=True)
    assert deep.count() > flat.count()
    stats = fsrc.file_stats(deep)
    assert stats.filter(~stats.is_text).count() == 0  # all sources are text
    # discovery feeds change detection directly
    from project_cortex_spark.pipeline import change_detection as cdet

    state = stats.select("file_path", F.lit(0).alias("mtime"), "content_hash")
    changes = cdet.detect_changes(state, state)
    assert changes.filter(F.col("status") != "unchanged").count() == 0


def test_embed_provider_swap(spark):
    """The provider seam: a swapped-in provider changes vectors without
    touching any embed_chunks caller (VERDICT: swap test for D7)."""
    import numpy as np
    import pandas as pd

    from project_cortex_spark.pipeline import embed as em

    def unit_axis(texts: pd.Series, *, dim: int, mode: str) -> pd.Series:
        # trivially-verifiable provider: one-hot on text length % dim
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float32)
            v[len(t or "") % dim] = 1.0
            out.append(v)
        return pd.Series(out)

    em.register_provider("unit-axis", unit_axis)
    df = spark.createDataFrame([("c1", "abc"), ("c2", "abcd")],
                               ["chunk_id", "chunk_text"])
    rows = {
        r["chunk_id"]: r["embedding"]
        for r in em.embed_chunks(df, dim=8, provider="unit-axis").collect()
    }
    assert rows["c1"][3] == 1.0 and sum(rows["c1"]) == 1.0
    assert rows["c2"][4] == 1.0
    # default provider unchanged
    base = {
        r["chunk_id"]: r["embedding"]
        for r in em.embed_chunks(df, dim=8).collect()
    }
    assert base["c1"] != rows["c1"]


def test_onnx_provider_slot_raises_cleanly(spark):
    import pytest as pt

    from project_cortex_spark.pipeline import embed as em

    df = spark.createDataFrame([("c1", "abc")], ["chunk_id", "chunk_text"])
    with pt.raises(Exception, match="onnxruntime|NotImplemented"):
        em.embed_chunks(df, provider="onnx").collect()
