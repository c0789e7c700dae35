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
