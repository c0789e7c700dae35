"""Baseline JPEG (JFIF) codec in pure numpy — no codec library.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
arbitrary sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers, 0xFF byte de-stuffing, canonical Huffman tables from DHT,
dequantization, 8x8 inverse DCT, nearest-neighbor chroma upsampling and
BT.601 full-range YCbCr->RGB. Progressive (SOF2), arithmetic coding,
12-bit and hierarchical modes raise ValueError (callers surface
ok=false rows).

Encoder: the synthesis side — grayscale or 4:4:4 color, standard
Annex K quantization and Huffman tables, used by the roundtrip tests
and the flat-block oracle gate. DC quantization uses floor(x + 0.5)
explicitly (NOT numpy's banker's rounding) so the closed-form SQL
oracle can replicate the arithmetic digit for digit.

Verification strategy (tests + oracle gate): (a) hand-built DC-only and
single-AC fixtures whose pixel values follow from the spec in closed
form; (b) encoder->decoder roundtrips on natural arrays bounded by the
quantization error; (c) the gated query decodes flat-color JPEGs whose
exact output pixel a SQL oracle computes (flat 8x8 blocks have AC == 0,
making lossy JPEG exactly predictable).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K tables (luminance / chrominance)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: A @ block @ A.T = coefficients / 4... we
# use the JPEG normalization explicitly below
_C = np.array([
    [math.sqrt(1 / 8)] * 8
] + [
    [math.sqrt(2 / 8) * math.cos((2 * x + 1) * u * math.pi / 16)
     for x in range(8)]
    for u in range(1, 8)
])


def _fdct(block: np.ndarray) -> np.ndarray:
    """JPEG forward DCT of a level-shifted 8x8 block. The orthonormal
    basis matrix already carries the spec's (1/4)C(u)C(v) factors:
    A s Aᵀ IS Annex A's S(u,v) — a flat block of value v yields
    DC = 8v, AC = 0."""
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_fdct`."""
    return _C.T @ coef @ _C


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _build_codes(bits, values):
    """Canonical Huffman: {(length, code): symbol} and its inverse."""
    decode = {}
    encode = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            decode[(length, code)] = sym
            encode[sym] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length, code):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)  # 1-fill padding


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.nbits = 0


def _decode_symbol(reader: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """EXTEND (F.2.2.1): map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int):
    """Inverse of EXTEND: (category t, t-bit code) for signed v."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    if t == 0:
        return 0, 0
    return t, v if v >= 0 else v + (1 << t) - 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG to an (h, w, 3) uint8 RGB array
    (grayscale replicated to 3 channels). Raises ValueError for
    non-baseline modes AND for any malformed/truncated input — a
    poison payload must surface as one bad row, never an unhandled
    IndexError that kills the batch."""
    try:
        return _decode_jpeg(buf)
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode_jpeg(buf: bytes) -> np.ndarray:
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}
    frame = None
    restart_interval = 0
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", buf[pos: pos + 2])
        seg = buf[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    seg[p + 1: p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1: p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17: p + 17 + cnt])
                htables[(tc, th)], _ = _build_codes(bits, vals)
                p += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG mode")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan_sel = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i: 3 + 2 * i]
                scan_sel.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            data_start = pos + seglen
            return _decode_scan(
                buf, data_start, frame, scan_sel, qtables, htables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no scan data")


def _decode_scan(buf, pos, frame, scan_sel, qtables, htables,
                 restart_interval):
    # de-stuff entropy bytes up to EOI, remembering restart boundaries
    data = bytearray()
    restarts = []
    n = len(buf)
    i = pos
    while i < n:
        b = buf[i]
        if b == 0xFF:
            m = buf[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                data.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                restarts.append(len(data))
                i += 2
                continue
            break  # EOI or next marker
        data.append(b)
        i += 1

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 unsupported")
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    sel_by_id = {s["cs"]: s for s in scan_sel}
    planes = []
    for c in comps:
        cw, ch = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(np.zeros((ch, cw), dtype=np.float64))

    reader = _BitReader(bytes(data))
    pred = [0] * len(comps)
    mcu_count = 0
    restart_iter = iter(restarts)
    next_restart = next(restart_iter, None)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                if next_restart is None:
                    # DRI promised a marker here and the stream has
                    # none left: resetting pred without the marker
                    # would silently corrupt every later DC value
                    raise ValueError("missing restart marker")
                # restart offsets are absolute positions in the
                # de-stuffed stream; each jump re-slices from there
                reader = _BitReader(bytes(data[next_restart:]))
                next_restart = next(restart_iter, None)
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                sel = sel_by_id.get(c["id"])
                if sel is None:
                    raise ValueError("scan component not in frame")
                dc_tab = htables.get((0, sel["td"]))
                ac_tab = htables.get((1, sel["ta"]))
                q = qtables.get(c["tq"])
                if dc_tab is None or ac_tab is None or q is None:
                    raise ValueError("missing Huffman/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _decode_symbol(reader, dc_tab)
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(reader, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q
                        block = _idct(coef.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0: y0 + 8, x0: x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution and convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(comps) != 3:
        raise ValueError("unsupported component count")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_block(writer, block, q, dc_enc, ac_enc, pred):
    shifted = block.astype(np.float64) - 128.0
    coef = _fdct(shifted)
    zz = coef.reshape(-1)[ZIGZAG]
    # the DC of integer-valued pixels is EXACTLY sum/8 (a binary
    # fraction); the matrix product lands an ulp off, which can flip
    # the half-up quantization at exact .5 boundaries — snap it so the
    # closed-form flat-block oracle holds digit for digit
    zz = zz.copy()
    zz[0] = shifted.sum() / 8.0
    qz = np.array([_round_half_up(v / qq) for v, qq in zip(zz, q)],
                  dtype=np.int64)
    diff = int(qz[0]) - pred
    t, code = _magnitude(diff)
    length, c = dc_enc[t]
    writer.write(length, c)
    if t:
        writer.write(t, code)
    run = 0
    for k in range(1, 64):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, c = ac_enc[0xF0]
            writer.write(length, c)
            run -= 16
        s, code = _magnitude(v)
        length, c = ac_enc[(run << 4) | s]
        writer.write(length, c)
        writer.write(s, code)
        run = 0
    if run:
        length, c = ac_enc[0x00]
        writer.write(length, c)
    return int(qz[0])


def _dht_segment(tc, th, spec):
    bits, vals = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq, table):
    body = bytes([tq]) + bytes(int(v) for v in table[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(px: np.ndarray, *, restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JFIF
    (grayscale 1-component, or YCbCr 4:4:4) with Annex K tables.
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers
    every N MCUs (byte-aligned, DC predictors reset) — the error-
    resilience layout large scans use, and the decoder path's test
    hook."""
    if px.ndim == 2:
        comps = [px.astype(np.float64)]
    elif px.ndim == 3 and px.shape[2] == 3:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    else:
        raise ValueError("encode_jpeg expects (h,w) or (h,w,3) uint8")
    h, w = comps[0].shape
    gray = len(comps) == 1

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + b"\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += _dqt_segment(0, QTABLE_LUMA)
    if not gray:
        out += _dqt_segment(1, QTABLE_CHROMA)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, HUFF_DC_LUMA)
    out += _dht_segment(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, HUFF_DC_CHROMA)
        out += _dht_segment(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    _, dc_luma = _build_codes(*HUFF_DC_LUMA)
    _, ac_luma = _build_codes(*HUFF_AC_LUMA)
    _, dc_chroma = _build_codes(*HUFF_DC_CHROMA)
    _, ac_chroma = _build_codes(*HUFF_AC_CHROMA)

    writer = _BitWriter()
    pred = [0] * nc
    by_max = -(-h // 8)
    bx_max = -(-w // 8)
    entropy = bytearray()
    mcu_count = 0
    rst = 0
    for by in range(by_max):
        for bx in range(bx_max):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                writer.flush()
                entropy += writer.out
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                pred = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                plane = comps[ci]
                block = np.full((8, 8), plane[-1, -1], dtype=np.float64)
                ys = min(8, h - by * 8)
                xs = min(8, w - bx * 8)
                tile = plane[by * 8: by * 8 + ys, bx * 8: bx * 8 + xs]
                block[:ys, :xs] = tile
                # edge replication beyond the image
                if xs < 8:
                    block[:ys, xs:] = tile[:, -1:][:, :1]
                if ys < 8:
                    block[ys:, :] = block[ys - 1, :]
                q = QTABLE_LUMA if ci == 0 else QTABLE_CHROMA
                dc_e = dc_luma if ci == 0 else dc_chroma
                ac_e = ac_luma if ci == 0 else ac_chroma
                pred[ci] = _encode_block(
                    writer, block, q[ZIGZAG], dc_e, ac_e, pred[ci]
                )
    writer.flush()
    entropy += writer.out
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)
