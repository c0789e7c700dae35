"""Real GIF codec (87a layout, variable-width LZW) in pure Python.

Implements the public GIF specification: logical screen descriptor,
global color table, image descriptor, and the actual GIF flavor of
LZW — LSB-first bitstream packed into 255-byte sub-blocks, clear/EOI
control codes, dictionary rebuilt on clear, code width growing at
each power of two up to 12 bits, and the KwKwK self-referential case.
The encoder emits a clear code when the dictionary fills (4095) so
streams of any length stay in spec; the decoder skips 89a extension
blocks, honors local color tables, and refuses interlaced images
rather than mis-rowing them.

Decoded output is (h, w, 3) uint8 RGB via the palette — same contract
as the other image decoders in :mod:`.multimodal`, so GIF rides the
same ``decode_image_real`` / ``resize_image_real`` operators.

Scale: per-image pure functions inside Arrow-batched maps — the LZW
dictionary is per-image state, so parallelism is image-level, the
natural axis for a 100 TB image corpus.
"""
from __future__ import annotations

import struct


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """GIF LZW: variable width, LSB-first, clear at dictionary 4095."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return ({bytes([i]): i for i in range(clear)}, eoi + 1, mcs + 1)

    table, next_code, width = fresh()
    emit(clear, width)
    seq = b""
    for b in indices:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        # decoder is one entry behind: it will hold next_code-1 entries
        # when it reads our NEXT code, so bump width on next_code-1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table, next_code, width = fresh()
        seq = bytes([b])
    if seq:
        emit(table[seq], width)
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    pos = 0  # bit cursor
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("LZW stream truncated")
        v = 0
        for i in range(width):
            byte = data[(pos + i) >> 3]
            v |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += width
        return v

    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = mcs + 1
        prev = None

    reset()
    while len(out) < n_expected:
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and code != clear and code != eoi:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError("LZW pixel count mismatch")
    return bytes(out)


def encode_gif(indices, palette) -> bytes:
    """Encode an (h, w) uint8 index array + (n, 3) palette as GIF87a."""
    import numpy as np

    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    n = len(palette)
    size_exp = max(1, (max(n, 2) - 1).bit_length())  # table size 2^(exp)
    table_n = 1 << size_exp
    mcs = max(2, size_exp)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_exp - 1)])  # global table, 2^size_exp entries
    out += b"\x00\x00"  # bg index, aspect
    pal = bytearray()
    for i in range(table_n):
        pal += bytes(palette[i]) if i < n else b"\x00\x00\x00"
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)
    lzw = _lzw_encode(indices.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i: i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(buf: bytes):
    """Decode the first image of a GIF -> (h, w, 3) uint8 RGB.

    Skips 89a extension blocks; interlaced images raise ValueError."""
    import numpy as np

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh = struct.unpack("<HH", buf[6:10])
    packed, _bg, _aspect = buf[10], buf[11], buf[12]
    pos = 13
    gpal = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gpal = np.frombuffer(buf[pos: pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(buf):
        b = buf[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while buf[pos] != 0:
                pos += buf[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, w, h = struct.unpack("<HHHH", buf[pos + 1: pos + 9])
        ipacked = buf[pos + 9]
        pos += 10
        pal = gpal
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            pal = np.frombuffer(buf[pos: pos + 3 * n], np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ipacked & 0x40:
            raise ValueError("interlaced GIFs not supported")
        if pal is None:
            raise ValueError("image has no color table")
        mcs = buf[pos]
        pos += 1
        lzw = bytearray()
        while buf[pos] != 0:
            ln = buf[pos]
            lzw += buf[pos + 1: pos + 1 + ln]
            pos += ln + 1
        idx = np.frombuffer(
            _lzw_decode(bytes(lzw), mcs, w * h), np.uint8
        ).reshape(h, w)
        if int(idx.max()) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    raise ValueError("GIF contains no image data")
