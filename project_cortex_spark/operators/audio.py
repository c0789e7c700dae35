"""Real compressed-audio codecs in pure numpy/stdlib — no codec libs.

Implements the two classic telephony codecs from ITU-T G.711 (mu-law
and A-law companding, WAV format tags 7 and 6) and IMA/DVI ADPCM
(4-bit adaptive differential PCM with the public 89-entry step table,
WAV format tag 0x11), all inside genuine RIFF/WAVE containers that the
chunk-walking decoder in :mod:`.multimodal` dispatches on.

Byte-level authenticity anchors (used by the unit tests): mu-law
silence encodes to 0xFF and A-law silence to 0xD5 — the canonical
idle-channel codes every G.711 implementation produces — and the
mu-law/A-law maximum decode magnitudes are 32124 and 32256, the
published segment-table endpoints.

Why these codecs matter for a 100 TB training pipeline: compressed
telephony/meeting audio is a major multimodal corpus class, and both
families decode via pure integer arithmetic — so the decode path is an
Arrow-batched narrow map with NO shuffle, and (crucially for the
correctness gate) the decode of a closed-form synthesized signal is
itself closed-form: G.711 companding is a stateless piecewise map a
SQL CASE chain states exactly, and IMA ADPCM is a per-sample integer
recurrence a recursive CTE replays bit-exactly.

Scale notes: every function here operates per-clip inside
``mapInPandas`` batches; nothing collects, nothing shuffles. ADPCM
encode/decode are sequential per clip by nature (the predictor state
is a data dependency), so parallelism comes from clip-level
partitioning — the right axis at 100 TB where a corpus is billions of
short clips, not one long stream.
"""
from __future__ import annotations

import struct

import numpy as np

# ITU-T G.711 segment boundaries on the 16-bit magnitude axis: segment
# s covers [SEG_BOUNDS[s-1], SEG_BOUNDS[s]); searchsorted gives the
# exact integer segment with no float log2 edge cases.
_SEG_BOUNDS = np.array([256, 512, 1024, 2048, 4096, 8192, 16384], dtype=np.int32)

_ULAW_BIAS = 132  # 0x84
_ULAW_CLIP = 32635


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> G.711 mu-law codes (uint8). Silence -> 0xFF."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    m = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    e = np.searchsorted(_SEG_BOUNDS, m, side="right").astype(np.int32)
    mant = (m >> (e + 3)) & 0xF
    return (~(sign | (e << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law codes -> int16 PCM. Max magnitude 32124."""
    u = (~codes.astype(np.int32)) & 0xFF
    sign = u & 0x80
    e = (u >> 4) & 7
    mant = u & 0xF
    mag = (((mant << 3) + _ULAW_BIAS) << e) - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> G.711 A-law codes (uint8). Silence -> 0xD5.

    A-law's sign bit is 1 for non-negative samples and the code is
    XOR-masked with 0x55 (the even-bit inversion that keeps idle
    channels from emitting long runs of zeros on the wire).
    """
    x = samples.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    m = np.minimum(np.abs(x), 32767)
    s = np.searchsorted(_SEG_BOUNDS, m, side="right").astype(np.int32)
    q = np.where(s == 0, m >> 4, (m >> (s + 3)) & 0xF)
    return ((sign | (s << 4) | q) ^ 0x55).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law codes -> int16 PCM. Max magnitude 32256."""
    a = codes.astype(np.int32) ^ 0x55
    sign = a & 0x80
    s = (a >> 4) & 7
    q = a & 0xF
    mag = np.where(s == 0, (q << 4) + 8, ((q << 4) + 264) << np.maximum(s - 1, 0))
    return np.where(sign != 0, mag, -mag).astype(np.int16)


# IMA/DVI ADPCM: the public 89-entry step-size table and index
# adjustments (IMA Digital Audio Focus Group, 1992; identical tables
# appear in every public implementation and in RFC 3551's DVI4 notes).
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)

IMA_INDEX_ADJUST = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_quantize(diff: int, step: int) -> tuple[int, int]:
    """One IMA quantize step: (4-bit code, reconstruction delta)."""
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    delta = step >> 3
    if diff >= step:
        code |= 4
        diff -= step
        delta += step
    half = step >> 1
    if diff >= half:
        code |= 2
        diff -= half
        delta += half
    quarter = step >> 2
    if diff >= quarter:
        code |= 1
        delta += quarter
    return code, delta


def adpcm_encode(samples: np.ndarray, *, block_samples: int = 505) -> bytes:
    """Mono int16 PCM -> IMA ADPCM block stream.

    Each block is a 4-byte header (int16 predictor = the block's first
    sample emitted verbatim, uint8 step index carried across blocks,
    one reserved byte) followed by 4-bit codes for the remaining
    samples, packed low-nibble-first. The default 505 samples/block
    yields the classic 256-byte block. The final block is zero-nibble
    padded to full block length; the WAV ``fact`` chunk carries the
    true sample count.
    """
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("adpcm_encode expects mono int16")
    if block_samples < 2 or block_samples % 2 == 0:
        raise ValueError("block_samples must be odd and >= 3")
    out = bytearray()
    idx = 0
    n = len(samples)
    for start in range(0, n, block_samples):
        block = samples[start: start + block_samples]
        pred = int(block[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in block[1:].astype(np.int64):
            step = int(IMA_STEP_TABLE[idx])
            code, delta = _ima_quantize(int(s) - pred, step)
            pred += -delta if code & 8 else delta
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(IMA_INDEX_ADJUST[code & 7])))
            nibbles.append(code)
        nibbles += [0] * (block_samples - 1 - len(nibbles))  # pad final block
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)


def adpcm_decode(data: bytes, *, block_align: int, n_samples: int) -> np.ndarray:
    """IMA ADPCM block stream -> mono int16 PCM (first n_samples)."""
    block_samples = (block_align - 4) * 2 + 1
    out = np.empty(n_samples, dtype=np.int16)
    pos = 0
    written = 0
    while written < n_samples:
        block = data[pos: pos + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block")
        pred, idx, _res = struct.unpack("<hBB", block[:4])
        if not 0 <= idx <= 88:
            raise ValueError("ADPCM step index out of range")
        out[written] = pred
        written += 1
        codes = np.frombuffer(block[4:], dtype=np.uint8)
        nib = np.empty(codes.size * 2, dtype=np.uint8)
        nib[0::2] = codes & 0xF
        nib[1::2] = codes >> 4
        take = min(block_samples - 1, n_samples - written)
        for code in nib[:take]:
            step = int(IMA_STEP_TABLE[idx])
            delta = step >> 3
            if code & 4:
                delta += step
            if code & 2:
                delta += step >> 1
            if code & 1:
                delta += step >> 2
            pred += -delta if code & 8 else delta
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(IMA_INDEX_ADJUST[code & 7])))
            out[written] = pred
            written += 1
        pos += block_align
    return out


def encode_wav_g711(
    samples: np.ndarray, *, law: str, sample_rate: int = 8000
) -> bytes:
    """Encode (n, channels) int16 PCM as a G.711 RIFF/WAVE file.

    ``law`` is ``"ulaw"`` (format tag 7) or ``"alaw"`` (tag 6); both
    store 8 bits/sample, and a ``fact`` chunk records the frame count
    as the WAV spec requires for non-PCM formats.
    """
    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError("encode_wav_g711 expects (n, channels) int16")
    tag, enc = {"ulaw": (7, ulaw_encode), "alaw": (6, alaw_encode)}[law]
    n, ch = samples.shape
    data = enc(samples.reshape(-1)).tobytes()
    fmt = struct.pack(
        "<HHIIHHH", tag, ch, sample_rate, sample_rate * ch, ch, 8, 0
    )
    fact = struct.pack("<I", n)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_wav_adpcm(
    samples: np.ndarray, *, sample_rate: int = 8000, block_samples: int = 505
) -> bytes:
    """Encode mono int16 PCM as an IMA ADPCM RIFF/WAVE file (tag 0x11).

    The fmt chunk carries the standard cbSize=2 extension with
    wSamplesPerBlock, and the fact chunk the true frame count (the
    final block is nibble-padded).
    """
    if samples.ndim == 2:
        if samples.shape[1] != 1:
            raise ValueError("ADPCM writer is mono-only")
        samples = samples[:, 0]
    n = len(samples)
    block_align = 4 + (block_samples - 1) // 2
    data = adpcm_encode(samples, block_samples=block_samples)
    byte_rate = (sample_rate * block_align + block_samples - 1) // block_samples
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2,
        block_samples,
    )
    fact = struct.pack("<I", n)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
