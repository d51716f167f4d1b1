"""Pure-Python PNG codec (stdlib zlib + struct, numpy arrays).

The container ships no imaging libraries, so the engine carries its own
real PNG implementation (spec: RFC 2083 / W3C PNG — public knowledge):
8-bit grayscale / RGB / RGBA, all five scanline filters on decode,
filter 0 on encode. Bit-exact round-trips back the FIXTURES.md
"PNG bit-exact" fidelity requirement; JPEG stays a gated stub
(geowave_spark.raster.codec).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TO_CH = {0: 1, 2: 3, 6: 4}
_CH_TO_COLOR = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Encode HxW (gray) or HxWxC (C∈{3,4}) uint8 array to PNG bytes."""
    if img.dtype != np.uint8:
        raise ValueError("uint8 only")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = _CH_TO_COLOR[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need left-neighbor recurrence
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes to HxW or HxWxC uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    off = 8
    idat = b""
    w = h = depth = color = None
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color not in _COLOR_TO_CH or inter != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    ch = _COLOR_TO_CH[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT length")
    img = _unfilter(raw, h, stride, ch)
    img = img.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img
