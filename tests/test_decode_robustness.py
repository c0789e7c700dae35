"""Poison-payload robustness: at 100 TB a malformed byte-blob must
become an ok=false row, never an exception that fails a whole Arrow
batch. Every decoder is fuzzed with truncations and bit-flips of valid
payloads; anything it raises must be in DECODE_ERRORS (the tuple the
operators translate to ok=false), and the Spark operators themselves
must return rows for every input."""
import numpy as np
import pytest

from project_cortex_spark.operators import audio as au
from project_cortex_spark.operators import avi as av
from project_cortex_spark.operators import flac as fl
from project_cortex_spark.operators import gif as gf
from project_cortex_spark.operators import multimodal as mm
from project_cortex_spark.operators import textextract as tx
from project_cortex_spark.operators.jpeg import decode_jpeg, encode_jpeg

RNG = np.random.RandomState(42)


def _valid_payloads() -> dict:
    s = mm._ramp_samples(7).reshape(-1, 1)
    idx = ((np.arange(64, dtype=np.int64) + 3) % 256).astype(
        np.uint8
    ).reshape(8, 8)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    jpg = encode_jpeg(np.full((16, 16), 77, np.uint8))
    return {
        "wav_pcm": mm.encode_wav(s, sample_rate=16000),
        "wav_ulaw": au.encode_wav_g711(s, law="ulaw"),
        "wav_alaw": au.encode_wav_g711(s, law="alaw"),
        "wav_adpcm": au.encode_wav_adpcm(s[:, 0]),
        "flac": fl.flac_encode(s, sample_rate=8000),
        "gif": gf.encode_gif(idx, pal),
        "png": mm.encode_png(np.dstack([idx] * 3)),
        "bmp": mm.encode_bmp(np.dstack([idx] * 3)),
        "jpeg": jpg,
        "avi": av.avi_encode([jpg, jpg, jpg], width=16, height=16),
        "pdf": tx.synthesize_pdf(7, " ".join(f"w{i}" for i in range(40))),
    }


def _decoders() -> dict:
    return {
        "wav_pcm": mm.decode_wav_full,
        "wav_ulaw": mm.decode_wav_full,
        "wav_alaw": mm.decode_wav_full,
        "wav_adpcm": mm.decode_wav_full,
        "flac": fl.flac_decode,
        "gif": gf.decode_gif,
        "png": mm._decode_png,
        "bmp": mm._decode_bmp,
        "jpeg": decode_jpeg,
        "avi": av.avi_decode,
        "pdf": tx.pdf_to_text,
    }


def _mutations(buf: bytes):
    n = len(buf)
    # truncations across the whole payload, denser near the front
    for cut in sorted({1, 3, 7, 11, n // 8, n // 4, n // 2,
                       3 * n // 4, n - 1}):
        if 0 < cut < n:
            yield buf[:cut]
    # single-byte corruptions at deterministic positions
    for pos in RNG.choice(n, size=min(24, n), replace=False):
        b = bytearray(buf)
        b[pos] ^= 0x55
        yield bytes(b)
    yield b""
    yield b"\x00" * 64
    yield bytes(RNG.randint(0, 256, 128, dtype=np.int64).astype(np.uint8))


def test_every_decoder_contains_malformed_input_to_decode_errors():
    payloads = _valid_payloads()
    decoders = _decoders()
    tried = failed_cleanly = 0
    for name, buf in payloads.items():
        dec = decoders[name]
        for mut in _mutations(buf):
            tried += 1
            try:
                dec(mut)
            except mm.DECODE_ERRORS:
                failed_cleanly += 1
            # any OTHER exception type propagates and fails this test
    assert tried > 300
    # a large share of mutations must be rejected; flips landing in
    # raw sample/pixel bytes of checksum-free formats (WAV data, BMP
    # pixels, PDF text strings) legitimately decode to different
    # values, so 100% rejection is not expected — but structural
    # damage (truncation, header corruption) must be caught, and
    # NOTHING may raise outside DECODE_ERRORS (enforced above by
    # letting any other exception type propagate)
    assert failed_cleanly > tried // 3


def test_spark_operators_emit_ok_false_rows_for_poison(spark):
    payloads = _valid_payloads()
    poison = [
        (1, bytearray(b"")),
        (2, bytearray(b"\x00" * 64)),
        (3, bytearray(payloads["flac"][: len(payloads["flac"]) // 2])),
        (4, bytearray(payloads["wav_adpcm"][:9])),
        (5, bytearray(payloads["gif"][:13])),
        (6, bytearray(payloads["avi"][:40])),
    ]
    df = spark.createDataFrame(poison, "media_id long, payload binary")
    audio_rows = mm.decode_audio_real(df).collect()
    assert len(audio_rows) == 6 and all(r["ok"] is False for r in audio_rows)
    img_rows = mm.decode_image_real(df).collect()
    assert len(img_rows) == 6 and all(r["ok"] is False for r in img_rows)
    vid_rows = mm.sample_video_frames(df).collect()
    assert len(vid_rows) == 6 and all(r["ok"] is False for r in vid_rows)
    feat_rows = mm.extract_audio_features(df).collect()
    assert len(feat_rows) == 6 and all(r["ok"] is False for r in feat_rows)
    pdf_rows = tx.extract_pdf_text(
        df.withColumnRenamed("media_id", "doc_id")
          .withColumnRenamed("payload", "pdf")
    ).collect()
    assert len(pdf_rows) == 6 and all(r["ok"] is False for r in pdf_rows)


def test_valid_payloads_still_decode_after_hardening(spark):
    payloads = _valid_payloads()
    media = spark.createDataFrame(
        [(1, bytearray(payloads["wav_adpcm"])),
         (2, bytearray(payloads["flac"])),
         (3, bytearray(payloads["wav_ulaw"]))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in mm.decode_audio_real(media).collect()}
    assert rows[1]["codec"] == "adpcm" and rows[1]["ok"]
    assert rows[2]["codec"] == "flac" and rows[2]["ok"]
    assert rows[3]["codec"] == "ulaw" and rows[3]["ok"]
