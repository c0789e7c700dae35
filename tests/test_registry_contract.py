"""Session-contract tests: the registry's UTC requirement is enforced
(and loud), and the lexical embed cache stays bounded.

The hazard (ADVICE r3): a caller-supplied session with a non-UTC
``spark.sql.session.timeZone`` shifts naive-parquet timestamps and
breaks ``unix_micros`` oracle parity — the exact failure class that
cost round 2 five driver rows.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from project_cortex_spark.sources import registry as reg_mod
from tests.conftest import SF_DIR


def test_read_parquet_restores_utc_and_warns(spark):
    """A session whose timezone was switched to America/New_York must be
    forced back to UTC by read_parquet — with a UserWarning so the
    overwrite is visible — and timestamp epochs must be unshifted."""
    path = f"{SF_DIR}/events.parquet"
    baseline = (
        reg_mod.read_parquet(spark, path)
        .select(F.min(F.unix_micros("ts")).alias("m"))
        .collect()[0]["m"]
    )
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            df = reg_mod.read_parquet(spark, path)
            shifted = df.select(F.min(F.unix_micros("ts")).alias("m")).collect()[0]["m"]
        assert any("timeZone" in str(w.message) for w in caught)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert shifted == baseline
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_read_parquet_silent_when_already_utc(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        reg_mod.read_parquet(spark, f"{SF_DIR}/events.parquet")
    assert not [w for w in caught if "timeZone" in str(w.message)]


def test_token_direction_cache_bounded_and_deterministic(monkeypatch):
    """The random-indexing token-direction cache must not grow without
    bound over a heavy-tailed vocabulary (executor OOM risk), and
    eviction must not change results — directions regenerate
    deterministically from crc32."""
    from project_cortex_spark.pipeline import embed

    monkeypatch.setattr(embed, "_TOKEN_DIRS", {})
    monkeypatch.setattr(embed, "_TOKEN_DIRS_MAX", 50)
    texts = pd.Series([f"tok{i} tok{i + 1} shared" for i in range(300)])
    first = embed.lexical_embed_series(texts, dim=16)
    assert len(embed._TOKEN_DIRS) <= 50
    again = embed.lexical_embed_series(texts, dim=16)
    for a, b in zip(first, again):
        assert np.allclose(a, b)


def test_token_direction_recompute_identical_after_eviction(monkeypatch):
    from project_cortex_spark.pipeline import embed

    monkeypatch.setattr(embed, "_TOKEN_DIRS", {})
    monkeypatch.setattr(embed, "_TOKEN_DIRS_MAX", 4)
    v1 = embed._token_direction("alpha", 16).copy()
    for i in range(10):  # force eviction of 'alpha'
        embed._token_direction(f"filler{i}", 16)
    assert ("alpha", 16) not in embed._TOKEN_DIRS
    v2 = embed._token_direction("alpha", 16)
    assert np.allclose(v1, v2)


def test_nano_timestamp_probe_handles_directory_layout(tmp_path):
    """A directory-layout table with TIMESTAMP(NANOS) parts must still
    be detected (pq.read_schema raises on directories; the probe must
    fall through to a part file's footer, not silently return [])."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "events.parquet"
    d.mkdir()
    t = pa.table(
        {
            "ts": pa.array([1, 2], type=pa.timestamp("ns")),
            "v": pa.array([1.0, 2.0]),
        }
    )
    pq.write_table(t, d / "part-00000.parquet")
    assert reg_mod._nano_timestamp_columns(str(d)) == ["ts"]
    # file layout still works, empty dir degrades to []
    f = tmp_path / "flat.parquet"
    pq.write_table(t, f)
    assert reg_mod._nano_timestamp_columns(str(f)) == ["ts"]
    empty = tmp_path / "empty.parquet"
    empty.mkdir()
    assert reg_mod._nano_timestamp_columns(str(empty)) == []


def test_read_parquet_nanos_table_reads_as_timestamp(spark, tmp_path):
    """A TIMESTAMP(NANOS) table (file or directory layout) must land as
    TimestampType with micros-truncated values. pyspark 4.1.2 reads ns
    natively and ignores nanosAsLong, so the legacy div-1000 restore
    must NOT fire on a TimestampType column (it would be an
    AnalysisException); it exists only for Sparks where the legacy conf
    still maps ns to LONG."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    us = 1_700_000_000_123_456  # epoch micros
    t = pa.table({"ts": pa.array([us * 1000 + 789], type=pa.timestamp("ns"))})
    d = tmp_path / "dirtable.parquet"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")
    for path in (str(d),):
        df = reg_mod.read_parquet(spark, path)
        assert dict(df.dtypes)["ts"] == "timestamp"
        got = df.select(F.unix_micros("ts").alias("us")).collect()[0]["us"]
        assert got == us
