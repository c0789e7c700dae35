"""Baseline JPEG codec (operators/jpeg.py): spec-level verification."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from project_cortex_spark.operators.jpeg import (
    HUFF_AC_CHROMA,
    HUFF_AC_LUMA,
    HUFF_DC_CHROMA,
    HUFF_DC_LUMA,
    QTABLE_CHROMA,
    QTABLE_LUMA,
    ZIGZAG,
    _BitWriter,
    _build_codes,
    _dht_segment,
    _dqt_segment,
    _encode_block,
    _idct,
    decode_jpeg,
    encode_jpeg,
)


def test_idct_matches_spec_double_sum():
    # independent check: Annex A inverse DCT as an explicit double sum
    rng = np.random.RandomState(2)
    coef = rng.randint(-200, 200, (8, 8)).astype(np.float64)

    def spec_idct(S):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        acc += (
                            cu * cv * S[u, v]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                out[x, y] = acc / 4.0
        return out

    assert np.allclose(_idct(coef), spec_idct(coef), atol=1e-9)


def test_flat_closed_form_sweep():
    for c in range(0, 256, 7):
        px = np.full((12, 20), c, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        q = int(math.floor(8 * (c - 128) / 16 + 0.5))
        expect = min(255, max(0, 2 * q + 128))
        assert set(out.reshape(-1).tolist()) == {expect}, c


def test_gradient_and_color_fidelity():
    grad = np.tile(np.arange(64, dtype=np.uint8) * 2 + 40, (16, 1))
    out = decode_jpeg(encode_jpeg(grad))
    assert np.abs(out[:, :, 0].astype(int) - grad.astype(int)).max() <= 8
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[:, :, 0] = 180
    rgb[:, :, 1] = 60
    rgb[:, :, 2] = 200
    out = decode_jpeg(encode_jpeg(rgb))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 6


def test_odd_dimensions_partial_mcu():
    rng = np.random.RandomState(5)
    odd = rng.randint(80, 170, (13, 19)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(odd))
    assert out.shape == (13, 19, 3)


def test_progressive_rejected():
    px = np.full((8, 8), 99, dtype=np.uint8)
    buf = bytearray(encode_jpeg(px))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # claim progressive
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(buf))


def _build_420(flat_rgb):
    """Hand-built 16x16 4:2:0 JPEG of one flat color: MCU = 4 luma
    blocks (sampling 2x2) + 1 Cb + 1 Cr — exercises the interleaved
    MCU walk and chroma upsampling the 4:4:4 encoder never emits."""
    r, g, b = (float(v) for v in flat_rgb)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, QTABLE_LUMA)
    out += _dqt_segment(1, QTABLE_CHROMA)
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, HUFF_DC_LUMA)
    out += _dht_segment(1, 0, HUFF_AC_LUMA)
    out += _dht_segment(0, 1, HUFF_DC_CHROMA)
    out += _dht_segment(1, 1, HUFF_AC_CHROMA)
    sos = bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    _, dc_l = _build_codes(*HUFF_DC_LUMA)
    _, ac_l = _build_codes(*HUFF_AC_LUMA)
    _, dc_c = _build_codes(*HUFF_DC_CHROMA)
    _, ac_c = _build_codes(*HUFF_AC_CHROMA)
    w = _BitWriter()
    pred = [0, 0, 0]
    for _ in range(4):  # 4 luma blocks of the single MCU
        pred[0] = _encode_block(
            w, np.full((8, 8), y), QTABLE_LUMA[ZIGZAG], dc_l, ac_l, pred[0]
        )
    pred[1] = _encode_block(
        w, np.full((8, 8), cb), QTABLE_CHROMA[ZIGZAG], dc_c, ac_c, pred[1]
    )
    pred[2] = _encode_block(
        w, np.full((8, 8), cr), QTABLE_CHROMA[ZIGZAG], dc_c, ac_c, pred[2]
    )
    w.flush()
    out += w.out + b"\xff\xd9"
    return bytes(out)


def test_420_subsampled_decode():
    buf = _build_420((120, 180, 60))
    out = decode_jpeg(buf)
    assert out.shape == (16, 16, 3)
    err = np.abs(out.astype(int) - np.array([120, 180, 60])).max()
    assert err <= 6


def test_garbage_surfaces_ok_false(spark):
    from project_cortex_spark.operators.multimodal import decode_image_real

    good = encode_jpeg(np.full((8, 8), 50, dtype=np.uint8))
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(good[: len(good) // 2])),  # truncated stream
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_image_real(df).collect()}
    assert rows[1]["ok"] is True and rows[1]["codec"] == "jpeg"
    assert rows[2]["ok"] is False


def test_restart_markers_roundtrip():
    rng = np.random.RandomState(9)
    px = rng.randint(60, 200, (24, 40)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(px))
    buf = encode_jpeg(px, restart_interval=3)
    assert b"\xff\xdd" in buf and b"\xff\xd0" in buf
    assert np.array_equal(decode_jpeg(buf), plain)
    rgb = rng.randint(0, 255, (17, 23, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb, restart_interval=2)),
        decode_jpeg(encode_jpeg(rgb)),
    )


def test_missing_restart_marker_rejected():
    px = np.full((24, 24), 90, dtype=np.uint8)
    buf = bytearray(encode_jpeg(px, restart_interval=1))
    # strip the RST markers but keep the DRI promise: the decoder must
    # refuse rather than silently resetting DC predictors mid-stream
    i = buf.find(b"\xff\xd0")
    while i != -1:
        del buf[i: i + 2]
        i = buf.find(b"\xff\xd0")
    for m in range(0xD1, 0xD8):
        i = buf.find(bytes([0xFF, m]))
        while i != -1:
            del buf[i: i + 2]
            i = buf.find(bytes([0xFF, m]))
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))
