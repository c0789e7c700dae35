"""Multimodal binary-column operators: stub codec, real plumbing."""

from __future__ import annotations

import math

import pytest

from project_cortex_spark import oracle
from project_cortex_spark.operators import multimodal as mm

from .conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def media(registry):
    return mm.synthesize_media(registry.table("documents"))


def test_decode_meta_matches_oracle(media, duck):
    got = mm.decode_media(media).drop("mean_byte")
    assert_matches_oracle(got, duck, oracle.media_decode_meta_sql())


def test_decode_mean_byte_sane(media):
    rows = mm.decode_media(media).limit(50).collect()
    # payloads are ascii text, so mean byte lands in the printable band
    assert all(32.0 <= r["mean_byte"] <= 127.0 for r in rows)


def test_features_normalized_deterministic(media):
    sub = media.limit(20)
    a = {r["media_id"]: list(r["features"]) for r in mm.extract_features(sub, dim=16).collect()}
    b = {r["media_id"]: list(r["features"]) for r in mm.extract_features(sub, dim=16).collect()}
    assert a == b
    for v in a.values():
        assert len(v) == 16
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-5)


def test_resize_payload_shape(media):
    rows = mm.resize_media(media.limit(10), width=8, height=4).collect()
    assert all(len(bytes(r["payload"])) == 32 for r in rows)
    assert all((r["width"], r["height"]) == (8, 4) for r in rows)


def test_frame_sample_counts(media, registry):
    frame_size, every_n = 16, 2
    got = mm.frame_sample(media.limit(30), frame_size=frame_size, every_n=every_n)
    per_media = {
        r["media_id"]: r["cnt"]
        for r in got.groupBy("media_id").count().withColumnRenamed("count", "cnt").collect()
    }
    payload_sizes = {
        r["media_id"]: len(bytes(r["payload"])) for r in media.limit(30).collect()
    }
    for mid, size in payload_sizes.items():
        n_frames = size // frame_size
        want = math.ceil(n_frames / every_n) if n_frames else 0
        assert per_media.get(mid, 0) == want
    # frames are correctly strided
    sample = got.filter(got.media_id == min(payload_sizes)).collect()
    assert all(r["frame_idx"] % every_n == 0 for r in sample)


def test_real_decode_stub_gated(media):
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(media)
