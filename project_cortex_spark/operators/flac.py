"""Real FLAC codec (fixed-predictor subset) in pure Python/numpy.

Implements the public FLAC bitstream format (the xiph.org spec, now
RFC 9639): ``fLaC`` magic, STREAMINFO metadata block with the MD5
signature of the unencoded PCM, fixed-blocksize frames whose headers
carry the 14-bit sync code, UTF-8-coded frame numbers and a CRC-8,
subframes of type CONSTANT / VERBATIM / FIXED (orders 0-4) with
Rice-coded residuals (4-bit parameters, escape-to-raw supported), and
the frame-trailing CRC-16. The encoder picks the cheapest subframe
per channel by exact bit cost; the decoder verifies both CRCs and the
MD5, so a single flipped bit anywhere in the stream is caught.

Not implemented (raise ValueError, never wrong output): LPC subframes,
stereo decorrelation modes (left/side, mid/side) — the encoder only
emits independent channels, and variable blocksize streams.

Why FLAC here: lossless compressed audio is the archival format of
large speech corpora; because decode(encode(x)) == x BIT-EXACTLY, the
correctness gate for the whole codec is simply the closed-form oracle
of the source signal — the strongest possible contract, with the MD5
check making the decoder self-verifying.

Scale: pure per-clip functions used inside ``mapInPandas`` batches —
narrow map, no shuffle, clip-level parallelism (billions of short
clips at 100 TB, not one long stream).
"""
from __future__ import annotations

import hashlib

import numpy as np


def _crc8(data: bytes) -> int:
    """FLAC header CRC-8: poly 0x07, init 0, MSB-first."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """FLAC frame CRC-16: poly 0x8005, init 0, MSB-first."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a terminating one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            bits -= take
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(w: _BitWriter, v: int) -> None:
    """FLAC's extended-UTF-8 coded number (frame index)."""
    if v < 0x80:
        w.write(v, 8)
        return
    for nbytes, prefix in ((2, 0b110), (3, 0b1110), (4, 0b11110),
                           (5, 0b111110), (6, 0b1111110), (7, 0b11111110)):
        payload = 6 * (nbytes - 1) + (7 - nbytes)
        if v < (1 << payload) or nbytes == 7:
            w.write(prefix, nbytes + 1)
            w.write(v >> (6 * (nbytes - 1)), 7 - nbytes)
            for i in range(nbytes - 2, -1, -1):
                w.write(0b10, 2)
                w.write((v >> (6 * i)) & 0x3F, 6)
            return


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont >> 6 != 0b10:
            raise ValueError("bad UTF-8 continuation byte")
        v = (v << 6) | (cont & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}
_RATE_FROM_CODE = {v: k for k, v in _RATE_CODES.items()}


def _zigzag(r: np.ndarray) -> np.ndarray:
    return ((r << 1) ^ (r >> 63)).astype(np.int64)


def _rice_cost(uval: np.ndarray, k: int) -> int:
    return int((uval >> k).sum()) + len(uval) * (k + 1)


def _best_residual_plan(res: np.ndarray) -> tuple[int, int, int]:
    """(rice_k or 15 for escape, raw_bits, total_bit_cost) for order-0
    partitioning of a residual array (exact costs, brute force)."""
    uval = _zigzag(res)
    best_k, best_cost = 0, None
    for k in range(15):
        c = _rice_cost(uval, k)
        if best_cost is None or c < best_cost:
            best_k, best_cost = k, c
        if c > 4 * best_cost:  # cost is convex in k; stop early
            break
    raw_bits = 1
    if len(res):
        m = int(np.abs(res).max())
        raw_bits = max(1, m.bit_length() + 1)
    raw_cost = 5 + len(res) * raw_bits
    if raw_cost < best_cost:
        return 15, raw_bits, raw_cost
    return best_k, raw_bits, best_cost


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    """Pick CONSTANT / FIXED(0-4) / VERBATIM by exact bit cost."""
    n = len(x)
    if np.all(x == x[0]):
        w.write(0, 1)          # zero pad bit
        w.write(0b000000, 6)   # CONSTANT
        w.write(0, 1)          # no wasted bits
        w.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    xl = x.astype(np.int64)
    plans = []
    for order in range(min(5, n)):
        # order-k fixed-predictor residual == k-th finite difference,
        # which also leaves exactly the `order` warmup samples in front
        res = xl.copy()
        for _ in range(order):
            res = np.diff(res)
        k, raw_bits, cost = _best_residual_plan(res)
        total = order * bps + 2 + 4 + 4 + cost
        plans.append((total, order, k, raw_bits, res))
    plans.sort(key=lambda t: (t[0], t[1]))
    total, order, k, raw_bits, res = plans[0]
    if total >= n * bps:  # VERBATIM wins
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        for v in xl:
            w.write(int(v) & ((1 << bps) - 1), bps)
        return
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED, order
    w.write(0, 1)
    for v in xl[:order]:          # warmup samples
        w.write(int(v) & ((1 << bps) - 1), bps)
    w.write(0b00, 2)              # residual method: 4-bit rice
    w.write(0, 4)                 # partition order 0
    if k == 15:
        w.write(15, 4)
        w.write(raw_bits, 5)
        for v in res:
            w.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
    else:
        w.write(k, 4)
        uval = _zigzag(res)
        for u in uval:
            w.write_unary(int(u) >> k)
            if k:
                w.write(int(u) & ((1 << k) - 1), k)


def flac_encode(
    samples: np.ndarray, *, sample_rate: int = 8000, block_size: int = 256
) -> bytes:
    """Encode (n, channels) int16 PCM as a real FLAC stream."""
    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError("flac_encode expects (n, channels) int16")
    n, ch = samples.shape
    if not 1 <= ch <= 8:
        raise ValueError("1..8 channels")
    if sample_rate not in _RATE_CODES and not sample_rate < (1 << 20):
        raise ValueError("sample rate out of range")
    bps = 16
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    # STREAMINFO
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si_bytes = si.getvalue() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes
    # frames
    rate_code = _RATE_CODES.get(sample_rate, 0)
    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        block = samples[start: start + block_size]
        bs = len(block)
        if bs == 0:
            break
        h = _BitWriter()
        h.write(0b11111111111110, 14)
        h.write(0, 1)   # reserved
        h.write(0, 1)   # fixed blocksize stream
        h.write(7, 4)   # blocksize: 16-bit at end of header
        h.write(rate_code, 4)
        h.write(ch - 1, 4)  # independent channels
        h.write(0b100, 3)   # 16 bps
        h.write(0, 1)
        _utf8_number(h, fi)
        h.write(bs - 1, 16)
        hdr = h.getvalue()
        frame = _BitWriter()
        for b in hdr:
            frame.write(b, 8)
        frame.write(_crc8(hdr), 8)
        for c in range(ch):
            _encode_subframe(frame, block[:, c], bps)
        frame.align()
        body = frame.getvalue()
        out += body + _crc16(body).to_bytes(2, "big")
    return bytes(out)


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("bad subframe padding bit")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        out = np.full(bs, r.read_signed(bps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        if r.read(2) != 0:
            raise ValueError("5-bit rice method unsupported")
        porder = r.read(4)
        nres = bs - order
        res = []
        for p in range(1 << porder):
            cnt = bs >> porder
            if p == 0:
                cnt -= order
            k = r.read(4)
            if k == 15:
                raw = r.read(5)
                res += [r.read_signed(raw) for _ in range(cnt)]
            else:
                for _ in range(cnt):
                    q = r.read_unary()
                    u = (q << k) | (r.read(k) if k else 0)
                    res.append((u >> 1) ^ -(u & 1))
        if len(res) != nres:
            raise ValueError("residual count mismatch")
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            acc = res[i - order]
            for j, cf in enumerate(coefs):
                acc += cf * out[i - 1 - j]
            out[i] = acc
    elif t >= 32:
        raise ValueError("LPC subframes not supported")
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted


def flac_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream -> ((n, channels) int16, sample_rate).

    Verifies every frame CRC-8/CRC-16 and the STREAMINFO MD5."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        hdr = buf[pos: pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated metadata")
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = buf[pos + 4: pos + 4 + blen]
        if btype == 0:
            r = _BitReader(body)
            min_bs = r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            info = (min_bs, rate, ch, bps, total, body[18:34])
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    _min_bs, rate, ch, bps, total, md5_ref = info
    if bps != 16:
        raise ValueError("only 16-bit streams supported")
    chans: list[list[int]] = [[] for _ in range(ch)]
    got = 0
    while got < total:
        r = _BitReader(buf, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        r.read(1)
        if r.read(1) != 0:
            raise ValueError("variable-blocksize streams not supported")
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _fnum = _read_utf8_number(r)
        if bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        elif bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif 8 <= bs_code <= 15:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved blocksize code")
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code != 0 and rate_code not in _RATE_FROM_CODE:
            raise ValueError("bad sample-rate code")
        r.align()
        hdr_end = r.byte
        if _crc8(buf[pos:hdr_end]) != buf[hdr_end]:
            raise ValueError("frame header CRC-8 mismatch")
        r = _BitReader(buf, hdr_end + 1)
        if ch_code >= 8:
            raise ValueError("stereo decorrelation modes not supported")
        if ch_code + 1 != ch:
            raise ValueError("channel count mismatch")
        fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code, bps) \
            if ss_code else bps
        bs = min(bs, total - got)
        for c in range(ch):
            chans[c] += _decode_subframe(r, bs, fbps).tolist()
        r.align()
        if _crc16(buf[pos: r.byte]) != int.from_bytes(
            buf[r.byte: r.byte + 2], "big"
        ):
            raise ValueError("frame CRC-16 mismatch")
        pos = r.byte + 2
        got += bs
    out = np.stack(
        [np.array(c, dtype=np.int64) for c in chans], axis=1
    ).astype(np.int16)
    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_ref:
        raise ValueError("decoded PCM fails the STREAMINFO MD5")
    return out, rate
