"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-parity operators for the 100 TB training-data pipeline (the
reference is code/text-only): media rides in a ``binary`` column with a
typed metadata header; decode / feature-extract / resize / frame-sample
are Arrow-batched ``mapInPandas`` stages so each task streams record
batches of bytes through numpy without materializing the whole partition.

Codec status (r6): ``decode_image_real`` parses three formats for real
with no imaging library — uncompressed BI_RGB 24/32-bpp BMP and binary
P6 PPM in pure numpy (bottom-up row un-flip, BGR swizzle, row padding,
header edge cases), and **PNG** via stdlib zlib (chunk walk with CRC
verification, inflate, all five scanline filters un-applied: None /
Sub / Up / Average / Paeth; 8-bit RGB and RGBA truecolor,
non-interlaced — RGBA's alpha is dropped on decode). Baseline JPEG
decodes for real too (operators/jpeg.py: marker walk, canonical
Huffman, dequant, IDCT, restart markers, up to 2x2 subsampling;
progressive/arithmetic raise -> ok=false), and uncompressed PCM WAV
via decode_audio_real. Only compressed audio/video (MP3/AAC/H.26x)
still needs codec libs this container lacks.
The stub path (``decode_media``) remains for the fake container format
``IMG:{w}x{h};<bytes>`` used by the synthetic gates. The Spark-side
plumbing — schemas, binary handling, batch iteration, output shapes,
partitioning — is identical on both paths.

Scale notes: all stages are narrow maps — no shuffle. Binary columns
make task sizing the knob that matters: keep
``spark.sql.files.maxPartitionBytes`` at 128-256 MB so a task's Arrow
batches fit executor memory, and never collect payloads to the driver.
Feature vectors (``array<float>``) feed the knn/dedup operators
directly, which is where shuffles happen — on the small derived columns,
not the bytes.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEADER_RE = re.compile(rb"^IMG:(\d+)x(\d+);")

DECODED_SCHEMA = (
    "media_id long, kind string, width long, height long, n_bytes long, "
    "mean_byte double"
)
FEATURES_SCHEMA = "media_id long, features array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx long, frame binary"
RESIZED_SCHEMA = (
    "media_id long, width long, height long, payload binary"
)


def synthesize_media(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic fake media over the documents table: a fake
    container header + the utf-8 text as payload bytes. Stands in for
    ``spark.read.format(\"binaryFile\")`` over a media lake."""
    w = (F.col(id_col) % 16 + 1) * 16
    h = (F.col(id_col) % 8 + 1) * 16
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    header = F.concat(F.lit("IMG:"), w, F.lit("x"), h, F.lit(";"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.concat(header, F.col(text_col)), "utf-8").alias("payload"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Parse the container header and compute byte statistics — the
    decode stage's plumbing with a stub codec (real: hand bytes to
    PIL/soundfile here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = bytes(payload)
                m = HEADER_RE.match(buf)
                w, hgt = (int(m.group(1)), int(m.group(2))) if m else (0, 0)
                body = np.frombuffer(buf[m.end():] if m else buf, dtype=np.uint8)
                rows.append(
                    (
                        mid,
                        kind,
                        w,
                        hgt,
                        len(buf),
                        float(body.mean()) if body.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "n_bytes", "mean_byte",
                ],
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, *, dim: int = 32) -> DataFrame:
    """Byte-histogram feature vector (L2-normalized array<float>) — the
    feature-extract stage; output plugs straight into knn/dedup."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(body % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                if norm > 0:
                    hist /= norm
                ids.append(mid)
                feats.append(hist.astype(np.float32))
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_media(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize stub: output payload is truncated/cyclically padded to
    width*height bytes (a real resampler replaces the numpy line only)."""
    n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = np.frombuffer(bytes(payload), dtype=np.uint8)
                if body.size == 0:
                    out = np.zeros(n, dtype=np.uint8)
                else:
                    out = np.resize(body, n)  # deterministic stub resample
                rows.append((mid, width, height, out.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload"]
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, *, frame_size: int = 256,
                 every_n: int = 4) -> DataFrame:
    """Video frame sampling stub: treat the payload as fixed-size frames
    and keep every ``every_n``-th — one output row per kept frame (the
    explode shape a real ffmpeg-backed sampler would produce)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                n_frames = len(buf) // frame_size
                for i in range(0, n_frames, every_n):
                    rows.append((mid, i, buf[i * frame_size:(i + 1) * frame_size]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def _decode_bmp(buf: bytes) -> np.ndarray:
    """Pure-numpy BMP decode: uncompressed BI_RGB 24/32-bpp with a
    BITMAPINFOHEADER — the codec-free corner of the format (no
    library needed). Returns an (h, w, 3) uint8 RGB array in top-down
    row order regardless of the file's bottom-up storage."""
    import struct

    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    (pixel_off,) = struct.unpack_from("<I", buf, 10)
    (hdr_size,) = struct.unpack_from("<I", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", buf, 18)
    (bpp,) = struct.unpack_from("<H", buf, 28)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    h = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    need = pixel_off + stride * h
    if width <= 0 or h == 0 or len(buf) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = rows.reshape(h, stride)[:, : width * bytes_pp]
    px = rows.reshape(h, width, bytes_pp)
    if not top_down:
        px = px[::-1]
    # BGR(A) storage -> RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def _decode_ppm(buf: bytes) -> np.ndarray:
    """Pure-numpy binary PPM (P6, maxval <= 255) decode -> (h, w, 3)
    uint8 RGB. Header tokens may be separated by any whitespace and
    ``#`` comments per the netpbm spec."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(buf[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM: {w}x{h} maxval={maxval}")
    n = w * h * 3
    if len(buf) - pos < n:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos).reshape(h, w, 3)


REAL_DECODED_SCHEMA = (
    "media_id long, codec string, width long, height long, channels long, "
    "mean_r double, mean_g double, mean_b double, top_left_r long, "
    "ok boolean"
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor
    non-interlaced PNG (filter 0 scanlines, one zlib IDAT) — stdlib
    zlib only. The synthesis side of the PNG roundtrip gate."""
    import struct
    import zlib

    h, w, c = px.shape
    if c != 3 or px.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    for row in px:
        raw += b"\x00" + row.tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(buf: bytes) -> np.ndarray:
    """Real PNG decode with stdlib zlib: chunk walk (CRC-verified),
    inflate, and all five scanline filters un-applied. Supports 8-bit
    truecolor (color type 2) and truecolor+alpha (6, alpha dropped),
    non-interlaced — the layout ~every ML-corpus PNG uses. Unsupported
    layouts (palette, 16-bit, interlaced) raise ValueError and surface
    as ok=false rows like any other undecodable payload."""
    import struct
    import zlib

    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, n = 8, len(buf)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", buf[pos: pos + 4])
        ctype = buf[pos + 4: pos + 8]
        data = buf[pos + 8: pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", buf[pos + 8 + length: pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 \
            or interlace != 0:
        raise ValueError("unsupported PNG layout")
    bpp = 3 if color == 2 else 4
    stride = w * bpp
    data = zlib.decompress(bytes(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("bad scanline data size")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(h):
        f = data[pos]
        row = np.frombuffer(
            data, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int64)
        pos += stride + 1
        if f == 0:
            rec = row
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] — a
            # per-channel prefix sum mod 256
            rec = row.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 255
        elif f == 2:  # Up
            rec = (row + prev) & 255
        elif f == 3:  # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + ((left + prev[x]) >> 1)) & 255
        elif f == 4:  # Paeth
            rec = row.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pr) & 255
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    px = out.reshape(h, w, bpp)
    return px[:, :, :3].copy() if bpp == 4 else px


def encode_wav(samples: np.ndarray, *, sample_rate: int = 16000) -> bytes:
    """Encode (n_samples, channels) int16 PCM as a canonical RIFF/WAVE
    file — stdlib struct only. The synthesis side of the WAV gate."""
    import struct

    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError("encode_wav expects (n, channels) int16")
    n, ch = samples.shape
    data = samples.tobytes()  # interleaved little-endian
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav_full(buf: bytes) -> tuple[np.ndarray, int, str]:
    """Real RIFF/WAVE decode — pure struct/numpy, walking chunks so
    extra chunks (LIST, fact, cue) are skipped like real files require.
    Dispatches on the fmt tag: uncompressed PCM (tag 1, 8/16-bit),
    G.711 A-law/mu-law (tags 6/7) and IMA ADPCM (tag 0x11) via the
    codecs in :mod:`.audio`. Returns ((n_samples, channels) int16,
    sample_rate, codec); 8-bit unsigned PCM is centered to int16
    range. Formats needing external codec libs (MP3/AAC/float PCM)
    raise ValueError → ok=false rows."""
    import struct

    from . import audio as _audio

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(buf)
    fmt = None
    fmt_body = b""
    data = None
    n_frames = None
    while pos + 8 <= n:
        cid = buf[pos: pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4: pos + 8])
        body = buf[pos + 8: pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"fact" and size >= 4:
            (n_frames,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _brate, align, bits = fmt
    if ch < 1:
        raise ValueError("bad channel count")
    if tag == 1 and bits in (8, 16):
        if bits == 16:
            arr = np.frombuffer(data, dtype="<i2")
        else:
            arr = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
        codec = "pcm"
    elif tag in (6, 7) and bits == 8:
        codes = np.frombuffer(data, dtype=np.uint8)
        arr = (_audio.alaw_decode if tag == 6 else _audio.ulaw_decode)(codes)
        codec = "alaw" if tag == 6 else "ulaw"
    elif tag == 0x11 and bits == 4:
        if ch != 1:
            raise ValueError("IMA ADPCM decode is mono-only")
        if n_frames is None:
            block_samples = (align - 4) * 2 + 1
            n_blocks = len(data) // align
            n_frames = n_blocks * block_samples
        arr = _audio.adpcm_decode(data, block_align=align, n_samples=n_frames)
        codec = "adpcm"
    else:
        raise ValueError("unsupported WAV encoding")
    usable = (len(arr) // ch) * ch
    return arr[:usable].reshape(-1, ch), rate, codec


def _decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Back-compat shim: PCM-era signature over :func:`decode_wav_full`."""
    samples, rate, _codec = decode_wav_full(buf)
    return samples, rate


def decode_audio_any(raw: bytes) -> tuple[np.ndarray, int, str]:
    """Container-sniffing audio decode: FLAC by magic, else RIFF/WAVE
    (PCM / G.711 / IMA ADPCM by fmt tag). Returns ((n, ch) int16,
    sample_rate, codec); unsupported formats raise ValueError."""
    if raw[:4] == b"fLaC":
        from . import flac as _flac

        samples, rate = _flac.flac_decode(raw)
        return samples, rate, "flac"
    return decode_wav_full(raw)


# Exceptions a malformed payload can legitimately surface from ANY of
# the pure-python decoders (truncated buffers -> IndexError/struct.error,
# corrupt deflate -> zlib.error, bad dict/table lookups -> KeyError).
# The per-payload operators translate ALL of these into ok=false rows:
# at 100 TB a poison payload must never fail a 10k-row Arrow batch.
# Anything OUTSIDE this tuple (TypeError, AttributeError, ...) still
# propagates — those are logic bugs, not data problems.
import struct as _struct
import zlib as _zlib

DECODE_ERRORS = (
    ValueError, IndexError, KeyError, EOFError, OverflowError,
    _struct.error, _zlib.error,
)


AUDIO_DECODED_SCHEMA = (
    "media_id long, codec string, sample_rate long, channels long, "
    "n_samples long, mean_amp double, peak_amp long, first_sample long, "
    "ok boolean"
)


def decode_audio_real(media: DataFrame) -> DataFrame:
    """REAL audio decode for uncompressed PCM WAV — the audio analogue
    of :func:`decode_image_real`. Emits per-clip stream facts plus
    amplitude stats from the ACTUAL samples: mean absolute amplitude
    (loudness proxy), peak, and the position-sensitive first sample
    (catching channel-interleave/offset mistakes the way top_left_r
    catches row-order ones). Compressed audio (MP3/AAC — codec libs
    this container lacks) yields ok=false rows, never a failed batch.
    Scale: narrow Arrow-batched map, no shuffle; same task-sizing note
    as the image path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, rate, codec = decode_audio_any(bytes(payload))
                    flat = samples.astype(np.float64)
                    rows.append(
                        (
                            mid, "wav" if codec == "pcm" else codec,
                            rate, samples.shape[1],
                            samples.shape[0],
                            float(np.abs(flat).mean()),
                            int(np.abs(samples.astype(np.int64)).max()),
                            int(samples[0, 0]),
                            True,
                        )
                    )
                except DECODE_ERRORS:
                    rows.append(
                        (mid, None, None, None, None, None, None, None,
                         False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "codec", "sample_rate", "channels",
                    "n_samples", "mean_amp", "peak_amp", "first_sample",
                    "ok",
                ],
            )

    return media.mapInPandas(run, schema=AUDIO_DECODED_SCHEMA)


def synthesize_wav_media(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-WAV corpus: each doc becomes a short mono
    16-bit PCM clip whose samples are the signed cyclic ramp
    ``((doc_id + k) % 2048) - 1024`` — real RIFF container, stats a SQL
    oracle reproduces in closed form."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = (mid % 16 + 1) * 32
                samples = (
                    ((np.arange(n, dtype=np.int64) + mid) % 2048) - 1024
                ).astype(np.int16).reshape(-1, 1)
                ids.append(mid)
                payloads.append(encode_wav(samples, sample_rate=16000))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def _ramp_samples(mid: int) -> np.ndarray:
    """The shared audio-gate signal: ((doc_id + k) % 2048) - 1024."""
    n = (mid % 16 + 1) * 32
    return (
        ((np.arange(n, dtype=np.int64) + mid) % 2048) - 1024
    ).astype(np.int16)


def synthesize_g711_media(
    docs: DataFrame, *, law: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic G.711 corpus: the same cyclic-ramp clip as the PCM
    WAV gate, companded through the real mu-law/A-law encoder into a
    tag-7/tag-6 RIFF container — so the decode stats differ from PCM by
    exactly the closed-form quantization the SQL oracle states."""
    from . import audio as _audio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                samples = _ramp_samples(mid).reshape(-1, 1)
                ids.append(mid)
                payloads.append(
                    _audio.encode_wav_g711(samples, law=law, sample_rate=8000)
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def synthesize_adpcm_media(
    docs: DataFrame, *, id_col: str = "doc_id", block_samples: int = 505
) -> DataFrame:
    """Deterministic IMA ADPCM corpus over the shared ramp clips; the
    505-sample default gives classic 256-byte blocks and makes the
    longest clips (512 samples) span a block boundary, so header
    carry-over is exercised and replayed by the oracle."""
    from . import audio as _audio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                ids.append(mid)
                payloads.append(
                    _audio.encode_wav_adpcm(
                        _ramp_samples(mid), sample_rate=8000,
                        block_samples=block_samples,
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def synthesize_square_wav_media(
    docs: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic square-wave corpus for the audio-features gate:
    each doc is a mono PCM WAV of amplitude +-500 with integer period
    ``2 * (doc_id % 12 + 2)`` samples (4..26) — periodic, so the
    autocorrelation peak sits exactly at the period, and every feature
    (energy, crossings, correlation sums) is integer arithmetic a SQL
    oracle reproduces term for term."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = (mid % 16 + 1) * 32
                p = 2 * (mid % 12 + 2)
                k = np.arange(n, dtype=np.int64)
                s = np.where((k % p) < p // 2, 500, -500).astype(
                    np.int16
                ).reshape(-1, 1)
                ids.append(mid)
                payloads.append(encode_wav(s, sample_rate=16000))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_samples long, energy long, zcr long, "
    "pitch_lag long, ac_peak long, ok boolean"
)


def extract_audio_features(media: DataFrame, *, max_lag: int = 64) -> DataFrame:
    """REAL audio feature extraction over DECODED samples (any codec
    the container dispatch supports): total energy (sum of squares),
    zero-crossing count, and autocorrelation pitch — the lag in
    ``1..min(max_lag, n-1)`` maximizing ``R(L) = sum s[i]*s[i-L]``
    (ties -> smallest lag), with the peak value. All integer
    arithmetic, so the oracle states every number exactly; mono clips
    use channel 0. Scale: narrow Arrow-batched map, no shuffle; the
    O(n * max_lag) correlation is per-clip numpy dot products —
    clip-parallel at 100 TB like the codecs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, _rate, _codec = decode_audio_any(bytes(payload))
                    s = samples[:, 0].astype(np.int64)
                    n = len(s)
                    energy = int((s * s).sum())
                    neg = s < 0
                    zcr = int((neg[1:] != neg[:-1]).sum())
                    best_lag, best_r = 0, None
                    for lag in range(1, min(max_lag, n - 1) + 1):
                        r = int(np.dot(s[lag:], s[:-lag]))
                        if best_r is None or r > best_r:
                            best_lag, best_r = lag, r
                    rows.append(
                        (mid, n, energy, zcr, best_lag,
                         0 if best_r is None else best_r, True)
                    )
                except DECODE_ERRORS:
                    rows.append((mid, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "energy", "zcr",
                         "pitch_lag", "ac_peak", "ok"],
            )

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def synthesize_flac_media(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic FLAC corpus over the shared ramp clips. FLAC is
    lossless, so the decode-side oracle is the SAME closed form as the
    PCM WAV gate — the whole fixed-predictor/Rice/CRC/MD5 stack must be
    bit-perfect for the stats to match."""
    from . import flac as _flac

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                ids.append(mid)
                payloads.append(
                    _flac.flac_encode(
                        _ramp_samples(mid).reshape(-1, 1), sample_rate=8000
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def synthesize_mjpeg_media(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-VIDEO corpus: each doc becomes an AVI file of
    ``doc_id % 6 + 2`` Motion-JPEG frames, frame ``f`` a FLAT 16x16
    grayscale JPEG of value ``(doc_id + 37*f) % 256`` — so every
    sampled frame's decoded pixel is the same closed-form Annex-K
    quantization the still-JPEG gate states, parameterized by frame
    index."""
    from . import avi as _avi
    from .jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                frames = [
                    encode_jpeg(
                        np.full((16, 16), (mid + 37 * f) % 256, dtype=np.uint8)
                    )
                    for f in range(mid % 6 + 2)
                ]
                ids.append(mid)
                payloads.append(
                    _avi.avi_encode(frames, width=16, height=16, fps=25)
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


VIDEO_FRAMES_SCHEMA = (
    "media_id long, frame_idx long, n_frames long, width long, "
    "height long, mean_gray double, ok boolean"
)


def sample_video_frames(media: DataFrame, *, every: int = 2) -> DataFrame:
    """REAL video frame sampling: demux the AVI container, decode every
    ``every``-th Motion-JPEG frame through the real JPEG decoder, and
    emit per-frame stats (mean over all decoded channels). The demuxer
    skips undecoded frames byte-wise, so cost scales with SAMPLED
    frames — the property that matters when frame-sampling petabytes of
    video for training data. Unsupported codecs/containers yield one
    ok=false row per clip, never a failed batch. Narrow Arrow-batched
    map, no shuffle; clip-level parallelism."""
    from . import avi as _avi
    from .jpeg import decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames, w, h, _fps = _avi.avi_decode(bytes(payload))
                    for f in range(0, len(frames), every):
                        px = decode_jpeg(frames[f])
                        rows.append(
                            (mid, f, len(frames), w, h,
                             float(px.astype(np.float64).mean()), True)
                        )
                except DECODE_ERRORS:
                    rows.append((mid, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "n_frames", "width",
                         "height", "mean_gray", "ok"],
            )

    return media.mapInPandas(run, schema=VIDEO_FRAMES_SCHEMA)


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode (BMP BI_RGB 24/32, PPM P6, PNG 8-bit
    truecolor) in pure numpy + stdlib zlib — no imaging library
    required. Emits per-image dims + per-channel pixel means computed
    from ACTUAL decoded pixels (bottom-up rows un-flipped, BGR
    swizzled, row padding excluded; PNG scanline filters un-applied)
    plus ``top_left_r`` — pixel (0, 0)'s red byte. Means alone are
    permutation-invariant (a decoder that forgot the vertical un-flip
    would still match them); the corner pixel is position-sensitive
    and catches row-order mistakes, which is what the oracle gate
    checks. Payloads in any other format (JPEG/audio need a codec
    lib this container lacks) yield ok=false rows instead of failing
    the batch — at 100 TB a poison payload must not kill the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                try:
                    if buf[:2] == b"BM":
                        codec, px = "bmp", _decode_bmp(buf)
                    elif buf[:2] == b"P6":
                        codec, px = "ppm", _decode_ppm(buf)
                    elif buf[:8] == _PNG_SIG:
                        codec, px = "png", _decode_png(buf)
                    elif buf[:2] == b"\xff\xd8":
                        from .jpeg import decode_jpeg

                        codec, px = "jpeg", decode_jpeg(buf)
                    elif buf[:4] == b"GIF8":
                        from .gif import decode_gif

                        codec, px = "gif", decode_gif(buf)
                    else:
                        raise ValueError("unknown container")
                    means = px.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (mid, codec, px.shape[1], px.shape[0], 3,
                         float(means[0]), float(means[1]), float(means[2]),
                         int(px[0, 0, 0]), True)
                    )
                except DECODE_ERRORS:
                    rows.append(
                        (mid, None, None, None, None, None, None, None,
                         None, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "codec", "width", "height", "channels",
                    "mean_r", "mean_g", "mean_b", "top_left_r", "ok",
                ],
            )

    return media.mapInPandas(run, schema=REAL_DECODED_SCHEMA)


def _decode_any(buf: bytes) -> np.ndarray:
    """Route a payload to the real decoder its magic bytes select."""
    if buf[:2] == b"BM":
        return _decode_bmp(buf)
    if buf[:2] == b"P6":
        return _decode_ppm(buf)
    if buf[:8] == _PNG_SIG:
        return _decode_png(buf)
    if buf[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(buf)
    if buf[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(buf)
    raise ValueError("unknown container")


def resize_image_real(
    media: DataFrame, *, width: int, height: int
) -> DataFrame:
    """REAL resize over decoded pixels (upgrades the byte-shuffling
    ``resize_media`` stub): decode any supported container (BMP / PPM /
    PNG / baseline JPEG), nearest-neighbor sample to (height, width)
    with the floor mapping ``src = (dst * src_extent) // dst_extent``,
    re-encode as BMP. Nearest-neighbor is chosen deliberately: its
    output pixels are EXACT source pixels, so a SQL oracle can state
    the resized image in closed form over a synthetic ramp — the
    interpolating resamplers (bilinear/area) trade that gateability for
    smoothness and slot in behind the same signature. Undecodable
    payloads yield NULL payloads (ok=false analogue) instead of
    failing the batch. Narrow Arrow-batched map, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    px = _decode_any(bytes(payload))
                    ys = (np.arange(height) * px.shape[0]) // height
                    xs = (np.arange(width) * px.shape[1]) // width
                    out = px[ys][:, xs]
                    rows.append((mid, width, height, encode_bmp(out)))
                except DECODE_ERRORS:
                    rows.append((mid, width, height, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload"]
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bpp
    bottom-up BI_RGB BMP (the storage layout real tools write) — the
    synthesis side of the roundtrip gate and a handy test fixture."""
    import struct

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    body = bytearray()
    for row in px[::-1]:  # bottom-up
        body += row[:, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + dib + body)


def synthesize_png_media(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-PNG corpus: same cyclic pixel ramp as
    :func:`synthesize_bmp_media` (so the identical closed-form SQL
    oracle gates the decode), but through the full PNG container —
    zlib IDAT, CRC-bearing chunks, filtered scanlines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w = (mid % 8 + 1) * 4
                h = (mid % 4 + 1) * 4
                n = w * h * 3
                ramp = (np.arange(n, dtype=np.int64) + mid) % 256
                px = ramp.astype(np.uint8).reshape(h, w, 3)
                ids.append(mid)
                payloads.append(encode_png(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def synthesize_jpeg_media(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-JPEG corpus: each doc becomes a FLAT grayscale
    baseline JFIF of value ``doc_id % 256``. Flat 8x8 blocks have zero
    AC energy, so lossy JPEG becomes exactly predictable — the decoded
    pixel is ``clip(2 * floor(8*(c-128)/16 + 0.5) + 128)`` (Annex K
    Q00 = 16), which a SQL oracle states in closed form. This gates the
    FULL container path (markers, Huffman, dequant, IDCT, level shift)
    bit-for-bit; natural-image fidelity is bounded separately by the
    encoder roundtrip tests."""
    from .jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w = (mid % 8 + 1) * 4
                h = (mid % 4 + 1) * 4
                px = np.full((h, w), mid % 256, dtype=np.uint8)
                ids.append(mid)
                payloads.append(encode_jpeg(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def synthesize_gif_media(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-GIF corpus: grayscale 256-entry palette,
    pixel indices the cyclic ramp ``(doc_id + k) % 256`` in scan order
    — the LZW stream is genuinely compressed and the decoded RGB is
    ``r = g = b = ramp``, stats a SQL oracle states in closed form."""
    from .gif import encode_gif

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w = (mid % 8 + 1) * 4
                h = (mid % 4 + 1) * 4
                idx = (
                    (np.arange(h * w, dtype=np.int64) + mid) % 256
                ).astype(np.uint8).reshape(h, w)
                ids.append(mid)
                payloads.append(encode_gif(idx, pal))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def synthesize_multimodal_media(
    docs: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """One TRAINING SAMPLE per doc, three modalities: a real GIF image
    (grayscale ramp), a real FLAC clip (the shared ramp signal), and a
    JSON metadata record with a class label — the classic WebDataset
    sample triple ``<key>.gif + <key>.flac + <key>.json``. Both
    payloads decode to closed-form stats, so an end-to-end
    shard->scan->decode pipeline is exactly gateable."""
    import json

    from .flac import flac_encode
    from .gif import encode_gif

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, images, audios, metas = [], [], [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w = (mid % 8 + 1) * 4
                h = (mid % 4 + 1) * 4
                idx = (
                    (np.arange(h * w, dtype=np.int64) + mid) % 256
                ).astype(np.uint8).reshape(h, w)
                ids.append(mid)
                images.append(encode_gif(idx, pal))
                audios.append(
                    flac_encode(
                        _ramp_samples(mid).reshape(-1, 1), sample_rate=8000
                    )
                )
                metas.append(
                    json.dumps({"id": mid, "cls": mid % 10}, sort_keys=True)
                )
            yield pd.DataFrame(
                {"media_id": ids, "image": images, "audio": audios,
                 "meta": metas}
            )

    return docs.select(id_col).mapInPandas(
        run,
        schema="media_id long, image binary, audio binary, meta string",
    )


def synthesize_bmp_media(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-BMP corpus over the documents table: each doc
    becomes a small 24-bpp BMP whose RGB scan-order pixel bytes are the
    cyclic ramp ``(doc_id + k) % 256`` — real container, real padding,
    real bottom-up row order, and pixel statistics a SQL oracle can
    reproduce in closed form (mean over a known ramp)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w = (mid % 8 + 1) * 4
                h = (mid % 4 + 1) * 4
                n = w * h * 3
                ramp = (np.arange(n, dtype=np.int64) + mid) % 256
                px = ramp.astype(np.uint8).reshape(h, w, 3)
                ids.append(mid)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )
