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


def test_bmp_decode_exact_pixels():
    """encode_bmp -> _decode_bmp must be the identity on pixels —
    including non-multiple-of-4 widths (row padding) and the BGR/
    bottom-up storage details."""
    import numpy as np

    rng = np.random.default_rng(7)
    for w, h in [(3, 2), (4, 4), (5, 1), (1, 3)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(mm._decode_bmp(mm.encode_bmp(px)), px)


def test_bmp_decode_rejects_unsupported():
    import numpy as np

    with pytest.raises(ValueError):
        mm._decode_bmp(b"PNG not a bmp")
    buf = bytearray(mm.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    buf[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError):
        mm._decode_bmp(bytes(buf))


def test_ppm_decode_exact_pixels():
    import numpy as np

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    assert np.array_equal(mm._decode_ppm(buf), px)
    with pytest.raises(ValueError):
        mm._decode_ppm(b"P6\n3 2\n255\n\x00")  # truncated


def test_decode_image_real_spark_path(spark):
    """End-to-end through mapInPandas: real BMP and PPM payloads decode
    with exact channel means; an undecodable payload yields ok=false
    instead of failing the batch."""
    import numpy as np

    bmp_px = np.zeros((2, 2, 3), dtype=np.uint8)
    bmp_px[:, :, 0] = 10  # R
    bmp_px[:, :, 1] = 20  # G
    bmp_px[:, :, 2] = 30  # B
    ppm_px = np.full((1, 4, 3), 7, dtype=np.uint8)
    rows = [
        (1, bytearray(mm.encode_bmp(bmp_px))),
        (2, bytearray(b"P6\n4 1\n255\n" + ppm_px.tobytes())),
        (3, bytearray(b"\x89PNG not decodable here")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in mm.decode_image_real(media).collect()}
    assert got[1]["codec"] == "bmp" and got[1]["ok"]
    assert (got[1]["width"], got[1]["height"]) == (2, 2)
    assert (got[1]["mean_r"], got[1]["mean_g"], got[1]["mean_b"]) == (10.0, 20.0, 30.0)
    assert got[2]["codec"] == "ppm" and got[2]["ok"]
    assert got[2]["mean_r"] == 7.0
    assert got[3]["ok"] is False and got[3]["codec"] is None


def test_bmp_decode_handcrafted_bottom_up_orientation():
    """Decode a BYTE-LEVEL hand-built BMP (not via encode_bmp, so a
    symmetric encode+decode flip bug cannot mask itself): 1x2 bottom-up
    file whose FIRST stored row is blue and second is red must decode
    with red on TOP."""
    import struct

    import numpy as np

    w, h = 1, 2
    stride = (w * 3 + 3) & ~3  # 4
    # bottom-up storage: stored row 0 = IMAGE BOTTOM = blue (BGR: 255,0,0)
    body = bytes([255, 0, 0, 0]) + bytes([0, 0, 255, 0])  # + 1 pad byte each
    pixel_off = 54
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    px = mm._decode_bmp(header + dib + body)
    assert px.shape == (2, 1, 3)
    assert px[0, 0].tolist() == [255, 0, 0]  # top row RED
    assert px[1, 0].tolist() == [0, 0, 255]  # bottom row BLUE

    # negative height = top-down storage: same bytes, no flip
    dib_td = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    px_td = mm._decode_bmp(header + dib_td + body)
    assert px_td[0, 0].tolist() == [0, 0, 255]  # first stored row stays on top


class TestPngCodec:
    """Real PNG decode (stdlib zlib): filters, RGBA, CRC, roundtrip."""

    @staticmethod
    def _forward_filter(px, ftype):
        # independent encoder-side filtering: the decoder must invert it
        import struct
        import zlib

        import numpy as np

        from project_cortex_spark.operators.multimodal import (
            _PNG_SIG, _png_chunk,
        )

        h, w, c = px.shape
        arr = px.astype(np.int64).reshape(h, w * c)
        raw = bytearray()
        prev = np.zeros(w * c, dtype=np.int64)
        for y in range(h):
            rec = arr[y]
            raw.append(ftype)
            for x in range(w * c):
                a = rec[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                elif ftype == 4:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = (
                        a if (pa <= pb and pa <= pc)
                        else (b if pb <= pc else cc)
                    )
                else:
                    pred = 0
                raw.append((rec[x] - pred) & 255)
            prev = rec
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    def test_roundtrip_and_all_filters(self):
        import numpy as np

        from project_cortex_spark.operators.multimodal import (
            _decode_png, encode_png,
        )

        px = np.random.RandomState(7).randint(
            0, 256, (13, 9, 3), dtype=np.uint8
        )
        assert np.array_equal(_decode_png(encode_png(px)), px)
        for ftype in (1, 2, 3, 4):
            assert np.array_equal(
                _decode_png(self._forward_filter(px, ftype)), px
            ), f"filter {ftype}"

    def test_rgba_drops_alpha_and_crc_rejected(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from project_cortex_spark.operators.multimodal import (
            _PNG_SIG, _decode_png, _png_chunk, encode_png,
        )

        rgba = np.random.RandomState(3).randint(
            0, 256, (5, 4, 4), dtype=np.uint8
        )
        ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 6, 0, 0, 0)
        raw = b"".join(b"\x00" + row.tobytes() for row in rgba)
        png6 = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(_decode_png(png6), rgba[:, :, :3])

        bad = bytearray(
            encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
        )
        bad[40] ^= 0xFF
        with pytest.raises(ValueError):
            _decode_png(bytes(bad))

    def test_unsupported_layout_is_ok_false_row(self, spark):
        # palette PNG (color type 3) must surface as ok=false, not fail
        import struct
        import zlib

        from project_cortex_spark.operators.multimodal import (
            _PNG_SIG, _png_chunk, decode_image_real,
        )

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        pal = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", b"\x00\x00\x00")
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
            + _png_chunk(b"IEND", b"")
        )
        df = spark.createDataFrame(
            [(1, bytearray(pal))], "media_id long, payload binary"
        )
        rows = decode_image_real(df).collect()
        assert len(rows) == 1 and rows[0]["ok"] is False


class TestWavCodec:
    def test_roundtrip_stereo_16bit(self):
        import numpy as np

        from project_cortex_spark.operators.multimodal import (
            _decode_wav, encode_wav,
        )

        s = np.random.RandomState(11).randint(
            -32768, 32768, (300, 2), dtype=np.int16
        )
        back, rate = _decode_wav(encode_wav(s, sample_rate=44100))
        assert rate == 44100 and np.array_equal(back, s)

    def test_extra_chunks_skipped_and_8bit_centered(self):
        import struct

        import numpy as np

        from project_cortex_spark.operators.multimodal import _decode_wav

        # hand-built 8-bit mono WAV with a LIST chunk before data and an
        # odd-sized chunk (word-alignment padding must be honored)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        samples8 = bytes([0, 128, 255, 200])
        buf = (
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + samples8
        )
        back, rate = _decode_wav(buf)
        assert rate == 8000
        assert back[:, 0].tolist() == [
            (0 - 128) * 256, 0, (255 - 128) * 256, (200 - 128) * 256
        ]

    def test_compressed_format_is_ok_false(self, spark):
        import struct

        from project_cortex_spark.operators.multimodal import (
            decode_audio_real,
        )

        fmt = struct.pack("<HHIIHH", 85, 2, 44100, 0, 0, 0)  # tag 85 = MP3
        buf = (
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 2) + b"\x00\x00"
        )
        df = spark.createDataFrame(
            [(1, bytearray(buf)), (2, bytearray(b"ID3\x04garbage"))],
            "media_id long, payload binary",
        )
        rows = {r["media_id"]: r["ok"] for r in decode_audio_real(df).collect()}
        assert rows == {1: False, 2: False}


class TestG711Codec:
    def test_canonical_idle_codes(self):
        import numpy as np

        from project_cortex_spark.operators import audio as A

        # the published G.711 silence bytes every implementation emits
        assert A.ulaw_encode(np.array([0], np.int16))[0] == 0xFF
        assert A.alaw_encode(np.array([0], np.int16))[0] == 0xD5
        # published maximum decode magnitudes (segment-table endpoints)
        assert A.ulaw_decode(np.array([0x80], np.uint8))[0] == 32124
        assert int(A.alaw_decode(A.alaw_encode(
            np.array([32767], np.int16)))[0]) == 32256

    def test_roundtrip_error_bounded_and_monotone(self):
        import numpy as np

        from project_cortex_spark.operators import audio as A

        x = np.arange(-32768, 32768, dtype=np.int32)
        xi = x.astype(np.int16)
        u = A.ulaw_decode(A.ulaw_encode(xi)).astype(np.int32)
        a = A.alaw_decode(A.alaw_encode(xi)).astype(np.int32)
        # error bounded by half the top-segment quantization step
        assert np.abs(u - np.clip(x, -32635, 32635)).max() <= 512
        assert np.abs(a - x).max() <= 512
        # decode must be monotone non-decreasing over the input range
        assert (np.diff(u) >= 0).all()
        assert (np.diff(a) >= 0).all()

    def test_container_roundtrip_dispatch(self):
        import numpy as np

        from project_cortex_spark.operators import audio as A
        from project_cortex_spark.operators.multimodal import (
            decode_wav_full,
        )

        s = np.random.RandomState(5).randint(
            -32768, 32768, (64, 2), dtype=np.int16
        )
        for law in ("ulaw", "alaw"):
            buf = A.encode_wav_g711(s, law=law, sample_rate=8000)
            back, rate, codec = decode_wav_full(buf)
            assert codec == law and rate == 8000
            dec = (A.ulaw_decode if law == "ulaw" else A.alaw_decode)(
                (A.ulaw_encode if law == "ulaw" else A.alaw_encode)(
                    s.reshape(-1)
                )
            ).reshape(-1, 2)
            assert np.array_equal(back, dec)


class TestAdpcmCodec:
    def test_small_delta_ramp_is_lossless(self):
        import numpy as np

        from project_cortex_spark.operators import audio as A

        # +1 steps are exactly representable at the minimum step size,
        # so the ramp decodes bit-exactly (no wrap cliff below id 1536)
        s = (np.arange(400, dtype=np.int32) - 200).astype(np.int16)
        buf = A.adpcm_encode(s, block_samples=505)
        back = A.adpcm_decode(buf, block_align=256, n_samples=400)
        assert np.array_equal(back, s)

    def test_block_boundary_carries_index_and_snaps_predictor(self):
        import numpy as np

        from project_cortex_spark.operators import audio as A

        rng = np.random.RandomState(7)
        s = rng.randint(-30000, 30000, 1200, dtype=np.int16)
        buf = A.adpcm_encode(s, block_samples=505)
        back = A.adpcm_decode(buf, block_align=256, n_samples=1200)
        # block-start samples are stored verbatim in the headers
        assert back[0] == s[0] and back[505] == s[505] and back[1010] == s[1010]
        # decode tracks the signal within the max single-step delta
        steps = A.IMA_STEP_TABLE
        max_delta = int(steps[-1] + (steps[-1] >> 1) + (steps[-1] >> 2)
                        + (steps[-1] >> 3))
        assert np.abs(back.astype(np.int64) - s.astype(np.int64)).max() \
            <= max_delta

    def test_wav_container_roundtrip_and_fact_trim(self):
        import numpy as np

        from project_cortex_spark.operators import audio as A
        from project_cortex_spark.operators.multimodal import (
            decode_wav_full,
        )

        s = (np.arange(137, dtype=np.int32) * 3 - 200).astype(np.int16)
        buf = A.encode_wav_adpcm(s, sample_rate=8000)
        back, rate, codec = decode_wav_full(buf)
        # fact chunk must trim the zero-nibble padding of the last block
        assert codec == "adpcm" and rate == 8000 and back.shape == (137, 1)
        assert np.array_equal(
            back[:, 0], A.adpcm_decode(
                A.adpcm_encode(s), block_align=256, n_samples=137
            )
        )

    def test_rejects_stereo_and_bad_index(self):
        import struct

        import numpy as np
        import pytest

        from project_cortex_spark.operators import audio as A

        with pytest.raises(ValueError):
            A.encode_wav_adpcm(
                np.zeros((4, 2), np.int16), sample_rate=8000
            )
        bad = struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4
        with pytest.raises(ValueError):
            A.adpcm_decode(bad, block_align=8, n_samples=5)


class TestFlacCodec:
    def test_lossless_roundtrip_all_subframe_types(self):
        import numpy as np

        from project_cortex_spark.operators import flac as FL

        rng = np.random.RandomState(3)
        cases = [
            np.full((300, 1), -5, np.int16),              # CONSTANT
            rng.randint(-32768, 32768, (700, 1)).astype(np.int16),  # ~VERBATIM
            (1000 * np.sin(np.arange(900) / 7)).astype(np.int16).reshape(-1, 1),
            rng.randint(-2000, 2000, (513, 2)).astype(np.int16),    # stereo
            np.array([[42]], np.int16),                   # single sample
            np.arange(-256, 256, dtype=np.int16).reshape(-1, 1),    # ramp
        ]
        for s in cases:
            back, rate = FL.flac_decode(FL.flac_encode(s, sample_rate=8000))
            assert rate == 8000 and np.array_equal(back, s)

    def test_compresses_predictable_signals(self):
        import numpy as np

        from project_cortex_spark.operators import flac as FL

        s = np.arange(512, dtype=np.int16).reshape(-1, 1)
        assert len(FL.flac_encode(s)) < s.size * 2 // 4

    def test_single_bit_corruption_is_caught(self):
        import numpy as np
        import pytest

        from project_cortex_spark.operators import flac as FL

        s = (1000 * np.sin(np.arange(600) / 5)).astype(np.int16).reshape(-1, 1)
        buf = FL.flac_encode(s, sample_rate=16000)
        for at in (60, len(buf) // 2, len(buf) - 3):
            b = bytearray(buf)
            b[at] ^= 0x40
            with pytest.raises(ValueError):
                FL.flac_decode(bytes(b))

    def test_utf8_frame_numbers_roundtrip(self):
        from project_cortex_spark.operators.flac import (
            _BitReader, _BitWriter, _read_utf8_number, _utf8_number,
        )

        for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 1 << 20, 1 << 30):
            w = _BitWriter()
            _utf8_number(w, v)
            assert _read_utf8_number(_BitReader(w.getvalue())) == v

    def test_decode_audio_real_dispatches_flac(self, spark):
        from pyspark.sql import functions as F

        docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
        media = mm.synthesize_flac_media(docs)
        rows = mm.decode_audio_real(media).collect()
        assert len(rows) == 8
        assert all(r["ok"] and r["codec"] == "flac" for r in rows)
        byid = {r["media_id"]: r for r in rows}
        assert byid[3]["first_sample"] == 3 - 1024
        assert byid[3]["n_samples"] == (3 % 16 + 1) * 32


class TestAviVideo:
    def test_mux_demux_roundtrip_exact_payloads(self):
        import numpy as np

        from project_cortex_spark.operators import avi as AV
        from project_cortex_spark.operators.jpeg import encode_jpeg

        frames = [
            encode_jpeg(np.full((16, 16), (7 + 37 * f) % 256, np.uint8))
            for f in range(5)
        ]
        buf = AV.avi_encode(frames, width=16, height=16, fps=24)
        back, w, h, fps = AV.avi_decode(buf)
        assert (w, h, fps) == (16, 16, 24)
        assert back == frames  # byte-exact through the container

    def test_rejects_non_avi_and_foreign_codec(self):
        import struct

        import numpy as np
        import pytest

        from project_cortex_spark.operators import avi as AV
        from project_cortex_spark.operators.jpeg import encode_jpeg

        with pytest.raises(ValueError):
            AV.avi_decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
        buf = bytearray(AV.avi_encode(
            [encode_jpeg(np.full((8, 8), 9, np.uint8))], width=8, height=8
        ))
        buf[buf.find(b"MJPG")] = ord("X")  # strh handler -> XJPG
        with pytest.raises(ValueError):
            AV.avi_decode(bytes(buf))

    def test_frame_sampling_stride_and_closed_form(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
        media = mm.synthesize_mjpeg_media(docs)
        rows = mm.sample_video_frames(media, every=2).collect()
        assert all(r["ok"] for r in rows)
        for r in rows:
            assert r["frame_idx"] % 2 == 0
            assert r["n_frames"] == r["media_id"] % 6 + 2
            c = (r["media_id"] + 37 * r["frame_idx"]) % 256
            ex = min(255, max(0, 2 * int(np.floor(8 * (c - 128) / 16.0 + 0.5))
                              + 128))
            assert r["mean_gray"] == float(ex)
        # stride covers ceil(nf/2) frames per clip
        per = {}
        for r in rows:
            per[r["media_id"]] = per.get(r["media_id"], 0) + 1
        assert all(cnt == (mid % 6 + 2 + 1) // 2 for mid, cnt in per.items())

    def test_corrupt_clip_is_ok_false_row(self, spark):
        from pyspark.sql import functions as F

        docs = spark.range(0, 2).select(F.col("id").alias("doc_id"))
        media = mm.synthesize_mjpeg_media(docs).withColumn(
            "payload",
            F.when(F.col("media_id") == 1,
                   F.lit(bytearray(b"not a container"))).otherwise(
                F.col("payload")),
        )
        rows = {r["media_id"]: r["ok"]
                for r in mm.sample_video_frames(media).collect()
                if r["media_id"] == 1 or r["frame_idx"] == 0}
        assert rows == {0: True, 1: False}


class TestGifCodec:
    def test_lzw_known_vector(self):
        from project_cortex_spark.operators import gif as G

        # hand-computed per the GIF spec: mcs=2, pixels [0,1,1,0]
        # codes clear,0,1,1 @3 bits then 0,EOI @4 bits, LSB-first
        got = G._lzw_encode(bytes([0, 1, 1, 0]), 2)
        assert got == bytes.fromhex("440205")
        assert G._lzw_decode(got, 2, 4) == bytes([0, 1, 1, 0])

    def test_roundtrip_random_repetitive_small_palette(self):
        import numpy as np

        from project_cortex_spark.operators import gif as G

        rng = np.random.RandomState(0)
        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        # random (width bumps), repetitive (KwKwK + 4096 clear), tiny
        cases = [
            rng.randint(0, 256, (64, 64)).astype(np.uint8),
            np.tile(np.arange(8, dtype=np.uint8), 4096).reshape(128, 256),
            np.array([[1]], dtype=np.uint8),
        ]
        for idx in cases:
            back = G.decode_gif(G.encode_gif(idx, pal))
            assert back.shape == idx.shape + (3,)
            assert np.array_equal(back[:, :, 0], idx)
            assert np.array_equal(back[:, :, 2], idx)
        idx3 = (np.arange(100) % 3).astype(np.uint8).reshape(10, 10)
        back = G.decode_gif(G.encode_gif(idx3, pal[:3]))
        assert np.array_equal(back[:, :, 1], idx3)

    def test_extensions_skipped_interlace_rejected(self):
        import numpy as np
        import pytest

        from project_cortex_spark.operators import gif as G

        pal = np.stack([np.arange(4)] * 3, axis=1).astype(np.uint8)
        idx = (np.arange(16) % 4).astype(np.uint8).reshape(4, 4)
        buf = G.encode_gif(idx, pal)
        at = buf.find(b"\x2c")
        with_ext = (b"GIF89a" + buf[6:at]
                    + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + buf[at:])
        assert np.array_equal(G.decode_gif(with_ext)[:, :, 0], idx)
        interlaced = bytearray(buf)
        interlaced[at + 9] |= 0x40
        with pytest.raises(ValueError):
            G.decode_gif(bytes(interlaced))

    def test_decode_image_real_dispatches_gif(self, spark):
        from pyspark.sql import functions as F

        docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        rows = mm.decode_image_real(mm.synthesize_gif_media(docs)).collect()
        assert len(rows) == 10
        for r in rows:
            assert r["ok"] and r["codec"] == "gif"
            assert r["top_left_r"] == r["media_id"] % 256
            assert r["width"] == (r["media_id"] % 8 + 1) * 4


class TestMultimodalShards:
    def test_sample_triple_roundtrip(self, spark, tmp_path):
        import json

        import numpy as np
        from pyspark.sql import functions as F

        from project_cortex_spark.operators.flac import flac_decode
        from project_cortex_spark.operators.gif import decode_gif
        from project_cortex_spark.sources import tar_shards

        docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
        media = mm.synthesize_multimodal_media(docs)
        out = str(tmp_path / "mm")
        manifest = tar_shards.write_tar_shards(
            media, out, key_col="media_id",
            members={"gif": "image", "flac": "audio", "json": "meta"},
            n_shards=3,
        )
        assert manifest.agg(F.sum("n_samples")).first()[0] == 20
        back = tar_shards.read_tar_shards(
            spark, out,
            members={"gif": "image", "flac": "audio", "json": "meta"},
            binary=("gif", "flac"),
        ).collect()
        assert len(back) == 20
        for r in back:
            mid = int(r["sample_key"])
            px = decode_gif(bytes(r["image"]))
            assert px[0, 0, 0] == mid % 256
            samples, rate = flac_decode(bytes(r["audio"]))
            assert rate == 8000
            assert np.array_equal(samples[:, 0], mm._ramp_samples(mid))
            assert json.loads(r["meta"]) == {"id": mid, "cls": mid % 10}


class TestAudioFeatures:
    def test_square_wave_pitch_is_the_period(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
        media = mm.synthesize_square_wav_media(docs)
        rows = mm.extract_audio_features(media, max_lag=64).collect()
        assert len(rows) == 24 and all(r["ok"] for r in rows)
        for r in rows:
            mid = r["media_id"]
            n = (mid % 16 + 1) * 32
            p = 2 * (mid % 12 + 2)
            assert r["n_samples"] == n
            assert r["energy"] == n * 500 * 500
            # brute-force reference over the synthesis signal
            k = np.arange(n, dtype=np.int64)
            s = np.where((k % p) < p // 2, 500, -500).astype(np.int64)
            rs = {lag: int(np.dot(s[lag:], s[:-lag]))
                  for lag in range(1, min(64, n - 1) + 1)}
            best = min(sorted(rs), key=lambda lag: (-rs[lag], lag))
            assert r["pitch_lag"] == best and r["ac_peak"] == rs[best]
            # with >= 4 full periods the peak IS the period (short clips
            # can prefer lag 1: R(1)=(n-1-2z)A^2 can beat R(p)=(n-p)A^2)
            if n >= 4 * p:
                assert r["pitch_lag"] == p
                assert r["ac_peak"] == (n - p) * 500 * 500
            neg = s < 0
            assert r["zcr"] == int((neg[1:] != neg[:-1]).sum())

    def test_features_decode_through_compressed_codecs(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from project_cortex_spark.operators import audio as A
        from project_cortex_spark.operators import flac as FL

        p, n = 8, 256
        k = np.arange(n, dtype=np.int64)
        s = np.where((k % p) < p // 2, 500, -500).astype(np.int16)
        payloads = [
            (1, FL.flac_encode(s.reshape(-1, 1), sample_rate=8000)),
            (2, A.encode_wav_adpcm(s, sample_rate=8000)),
        ]
        media = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in payloads],
            "media_id long, payload binary",
        )
        rows = {r["media_id"]: r
                for r in mm.extract_audio_features(media).collect()}
        # FLAC is lossless: exact integers; ADPCM is lossy but tracks a
        # +-500 square closely enough that the pitch peak still lands
        # on the period
        assert rows[1]["energy"] == n * 500 * 500
        assert rows[1]["pitch_lag"] == p
        assert rows[2]["ok"] and rows[2]["pitch_lag"] == p

    def test_unsupported_payload_is_ok_false(self, spark):
        media = spark.createDataFrame(
            [(9, bytearray(b"OggS not supported"))],
            "media_id long, payload binary",
        )
        rows = mm.extract_audio_features(media).collect()
        assert rows[0]["ok"] is False and rows[0]["pitch_lag"] is None


class TestResizeReal:
    def test_nearest_downsample_known_pixels(self, spark):
        import numpy as np

        from project_cortex_spark.operators.multimodal import (
            _decode_bmp, encode_bmp, resize_image_real,
        )

        # 4x4 ramp -> 2x2 nearest: picks rows/cols 0 and 2
        px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        df = spark.createDataFrame(
            [(1, bytearray(encode_bmp(px)))],
            "media_id long, payload binary",
        )
        out = resize_image_real(df, width=2, height=2).collect()[0]
        got = _decode_bmp(bytes(out["payload"]))
        assert np.array_equal(got, px[[0, 2]][:, [0, 2]])

    def test_upsample_and_cross_codec(self, spark):
        import numpy as np

        from project_cortex_spark.operators.jpeg import encode_jpeg
        from project_cortex_spark.operators.multimodal import (
            _decode_bmp, encode_png, resize_image_real,
        )

        flat = np.full((8, 8, 3), 77, dtype=np.uint8)
        rows = [
            (1, bytearray(encode_png(flat))),
            (2, bytearray(encode_jpeg(np.full((8, 8), 77, dtype=np.uint8)))),
            (3, bytearray(b"not an image")),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {r["media_id"]: r for r in
               resize_image_real(df, width=16, height=16).collect()}
        png16 = _decode_bmp(bytes(out[1]["payload"]))
        assert png16.shape == (16, 16, 3) and set(png16.reshape(-1)) == {77}
        jpg16 = _decode_bmp(bytes(out[2]["payload"]))
        # flat JPEG at 77: closed-form decoded value 2*round_half_up(8*(77-128)/16)+128
        assert set(jpg16.reshape(-1)) == {78}
        assert out[3]["payload"] is None
