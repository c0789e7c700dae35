"""JSONL / CSV round-trip contract: write -> read is value-identical,
including CSV-hostile content (commas, quotes, newlines, unicode)."""

from __future__ import annotations

from project_cortex_spark.sources import text_formats as tf

ROWS = [
    (1, 'plain words', 'en', 'src0', 11),
    (2, 'comma, "quoted", more', 'en', 'src1', 21),
    (3, 'line\nbreak\tand tab', 'de', 'src0', 18),
    (4, 'unicode: café — 中文', 'zh', 'src2', 14),
    (5, '', 'en', 'src1', 0),
]
COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _df(spark):
    return spark.createDataFrame(ROWS, COLS)


def _sorted(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


def test_jsonl_roundtrip(spark, tmp_path):
    df = _df(spark)
    tf.write_jsonl(df, str(tmp_path / "j"))
    back = tf.read_jsonl(spark, str(tmp_path / "j"), df.schema)
    assert _sorted(back.select(*COLS)) == _sorted(df)


def test_csv_roundtrip(spark, tmp_path):
    df = _df(spark)
    tf.write_csv(df, str(tmp_path / "c"))
    back = tf.read_csv(spark, str(tmp_path / "c"), df.schema)
    got, want = _sorted(back.select(*COLS)), _sorted(df)
    # CSV cannot distinguish empty string from NULL — both land as NULL;
    # normalize that one documented lossy case before comparing
    fix = lambda rows: [  # noqa: E731
        tuple("" if v is None else v for v in r) for r in rows
    ]
    assert fix(got) == fix(want)


def test_jsonl_compressed_roundtrip(spark, tmp_path):
    """Compressed shards round-trip with no reader-side flag (codec
    detected from the file extension)."""
    import glob

    df = _df(spark)
    tf.write_jsonl(df, str(tmp_path / "z"), compression="gzip")
    assert glob.glob(str(tmp_path / "z" / "*.gz"))
    back = tf.read_jsonl(spark, str(tmp_path / "z"), df.schema)
    assert _sorted(back.select(*COLS)) == _sorted(df)


class TestTarShards:
    """WebDataset-style tar shard IO (sources/tar_shards.py)."""

    def test_roundtrip_with_binary_member(self, spark, tmp_path):
        from project_cortex_spark.sources import tar_shards

        rows = [
            (1, "hello world", bytes([0, 255, 10, 13, 27])),
            (2, "zwei", b"\x89PNG\r\n"),
            (3, "drei", None),  # null payload: member simply absent
        ]
        df = spark.createDataFrame(
            rows, "k long, text string, img binary"
        )
        path = str(tmp_path / "shards")
        manifest = tar_shards.write_tar_shards(
            df, path, key_col="k",
            members={"txt": "text", "png": "img"}, n_shards=2,
        )
        m = manifest.collect()
        assert sum(r["n_samples"] for r in m) == 3
        back = tar_shards.read_tar_shards(
            spark, path, members={"txt": "text", "png": "img"},
            binary=("png",),
        ).collect()
        got = {int(r["sample_key"]): (r["text"], r["img"]) for r in back}
        assert got[1] == ("hello world", bytearray([0, 255, 10, 13, 27]))
        assert got[2][1] == bytearray(b"\x89PNG\r\n")
        assert got[3] == ("drei", None)

    def test_shards_are_byte_deterministic(self, spark, tmp_path):
        import hashlib
        import os

        from project_cortex_spark.sources import tar_shards

        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(20)], "k long, text string"
        )

        def digest(p):
            out = {}
            for f in sorted(os.listdir(p)):
                with open(os.path.join(p, f), "rb") as fh:
                    out[f] = hashlib.md5(fh.read()).hexdigest()
            return out

        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        tar_shards.write_tar_shards(
            df, p1, key_col="k", members={"txt": "text"}, n_shards=3
        )
        tar_shards.write_tar_shards(
            df.repartition(7), p2, key_col="k",
            members={"txt": "text"}, n_shards=3,
        )
        d1, d2 = digest(p1), digest(p2)
        assert d1 == d2 and len(d1) >= 1  # same bytes per shard name

    def test_rewrite_clears_stale_shards(self, spark, tmp_path):
        from project_cortex_spark.sources import tar_shards

        path = str(tmp_path / "s")
        big = spark.createDataFrame(
            [(i, "x") for i in range(50)], "k long, text string"
        )
        tar_shards.write_tar_shards(
            big, path, key_col="k", members={"txt": "text"}, n_shards=8
        )
        small = spark.createDataFrame([(1, "y")], "k long, text string")
        tar_shards.write_tar_shards(
            small, path, key_col="k", members={"txt": "text"}, n_shards=8
        )
        back = tar_shards.read_tar_shards(
            spark, path, members={"txt": "text"}
        ).collect()
        assert [(r["sample_key"], r["text"]) for r in back] == [("1", "y")]

    def test_read_empty_shard_dir(self, spark, tmp_path):
        import os

        from project_cortex_spark.sources import tar_shards

        p = str(tmp_path / "none")
        os.makedirs(p)
        got = tar_shards.read_tar_shards(
            spark, p, members={"txt": "text"}
        )
        assert got.count() == 0
        assert got.columns == ["sample_key", "text"]

    def test_duplicate_keys_rejected(self, spark, tmp_path):
        import pytest

        from project_cortex_spark.sources import tar_shards

        df = spark.createDataFrame(
            [(1, "a"), (1, "b")], "k long, text string"
        )
        with pytest.raises(Exception, match="duplicate sample keys"):
            tar_shards.write_tar_shards(
                df, str(tmp_path / "d"), key_col="k",
                members={"txt": "text"}, n_shards=2,
            )
