"""Minimal from-scratch GeoTIFF codec (the geotools-raster / GDAL
ingest analog — extensions/formats/geotools-raster/.../GeoToolsRasterDataStoreIngestPlugin.java
reads GridCoverages whose overwhelmingly-common carrier is GeoTIFF).

Implements the public TIFF 6.0 + GeoTIFF 1.1 subset a raster ingest
actually needs, with zero native dependencies (numpy + zlib):

- read: II/MM byte orders, strip-organized baseline images, uint8 /
  uint16 / int16 / float32 samples, Compression 1 (none) and 8
  (zlib/Adobe deflate), PlanarConfiguration 1; tiled TIFFs and other
  compressions raise loudly (the container has no codec libs — same
  stance as raster/codec.py's JPEG stub).
- write: single- or multi-band arrays, optional deflate, multi-strip.
- geo-referencing: ModelPixelScale (33550) + ModelTiepoint (33922)
  and a minimal GeoKeyDirectory (34735) carrying the model type and
  the geographic CS code (4326 by default) — the plate-carrée
  transform every engine index path uses (index/crs.py).

The byte layout below follows the published TIFF 6.0 specification,
not any existing implementation.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

# TIFF tag ids (TIFF 6.0 §8; GeoTIFF 1.1 §7.2)
T_WIDTH = 256
T_HEIGHT = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SAMPLES = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279
T_PLANAR = 284
T_SAMPLE_FORMAT = 339
T_TILE_WIDTH = 322
T_MODEL_PIXEL_SCALE = 33550
T_MODEL_TIEPOINT = 33922
T_GEO_KEYS = 34735

# field types: (struct char, byte size)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 11: ("f", 4), 12: ("d", 8)}

_SAMPLE_FORMAT_UINT = 1
_SAMPLE_FORMAT_INT = 2
_SAMPLE_FORMAT_FLOAT = 3

_DTYPES = {
    (8, _SAMPLE_FORMAT_UINT): np.uint8,
    (16, _SAMPLE_FORMAT_UINT): np.uint16,
    (16, _SAMPLE_FORMAT_INT): np.int16,
    (32, _SAMPLE_FORMAT_FLOAT): np.float32,
}

# GeoKey ids (GeoTIFF 1.1)
GK_MODEL_TYPE = 1024  # 2 = geographic lat/lon
GK_RASTER_TYPE = 1025  # 1 = PixelIsArea
GK_GEOGRAPHIC_TYPE = 2048  # 4326 = WGS84


@dataclass
class GeoTiff:
    """Decoded GeoTIFF: pixels (h, w) or (h, w, bands) + geo transform.

    origin is the map coordinate of the top-left pixel corner
    (tiepoint), scale the per-pixel step (sy positive, y decreasing
    southward per GeoTIFF convention)."""

    pixels: np.ndarray
    origin: tuple[float, float]  # (x0, y0)
    scale: tuple[float, float]  # (sx, sy)
    crs_code: int  # geographic CS geokey (e.g. 4326); 0 when absent
    compression: int = 1  # TIFF Compression tag (1 = none, 8 = deflate)

    @property
    def bands(self) -> int:
        return 1 if self.pixels.ndim == 2 else self.pixels.shape[2]


def geotiff_encode(
    img: np.ndarray,
    origin: tuple[float, float] = (0.0, 0.0),
    scale: tuple[float, float] = (1.0, 1.0),
    crs_code: int = 4326,
    compress: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Serialize an array as a little-endian strip-organized GeoTIFF."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, bands = img.shape
    dt = img.dtype
    if dt == np.uint8:
        bits, sfmt = 8, _SAMPLE_FORMAT_UINT
    elif dt == np.uint16:
        bits, sfmt = 16, _SAMPLE_FORMAT_UINT
    elif dt == np.int16:
        bits, sfmt = 16, _SAMPLE_FORMAT_INT
    elif dt == np.float32:
        bits, sfmt = 32, _SAMPLE_FORMAT_FLOAT
    else:
        raise ValueError(f"unsupported dtype for GeoTIFF write: {dt}")

    rps = rows_per_strip or h
    raw = np.ascontiguousarray(img, dtype=dt.newbyteorder("<"))
    strips = []
    for y0 in range(0, h, rps):
        chunk = raw[y0 : y0 + rps].tobytes()
        strips.append(zlib.compress(chunk) if compress else chunk)

    # GeoKeyDirectory: header (version, rev, minor, nkeys) + 3 keys,
    # all TIFFShort, stored inline in the tag's value area
    geokeys = [
        1, 1, 1, 3,
        GK_MODEL_TYPE, 0, 1, 2,
        GK_RASTER_TYPE, 0, 1, 1,
        GK_GEOGRAPHIC_TYPE, 0, 1, int(crs_code),
    ]
    pixel_scale = [float(scale[0]), float(scale[1]), 0.0]
    tiepoint = [0.0, 0.0, 0.0, float(origin[0]), float(origin[1]), 0.0]

    # layout: header(8) | IFD | out-of-line values | strip data
    entries = []  # (tag, type, count, values list)
    entries.append((T_WIDTH, 4, 1, [w]))
    entries.append((T_HEIGHT, 4, 1, [h]))
    entries.append((T_BITS, 3, bands, [bits] * bands))
    entries.append((T_COMPRESSION, 3, 1, [8 if compress else 1]))
    entries.append((T_PHOTOMETRIC, 3, 1, [2 if bands >= 3 else 1]))
    entries.append((T_STRIP_OFFSETS, 4, len(strips), None))  # patched below
    entries.append((T_SAMPLES, 3, 1, [bands]))
    entries.append((T_ROWS_PER_STRIP, 4, 1, [rps]))
    entries.append((T_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]))
    entries.append((T_PLANAR, 3, 1, [1]))
    entries.append((T_SAMPLE_FORMAT, 3, bands, [sfmt] * bands))
    entries.append((T_MODEL_PIXEL_SCALE, 12, 3, pixel_scale))
    entries.append((T_MODEL_TIEPOINT, 12, 6, tiepoint))
    entries.append((T_GEO_KEYS, 3, len(geokeys), geokeys))
    entries.sort(key=lambda t: t[0])

    ifd_off = 8
    ifd_size = 2 + len(entries) * 12 + 4
    overflow_off = ifd_off + ifd_size

    # first pass: compute out-of-line sizes (strip offsets resolved after)
    overflow = bytearray()
    inline: dict[int, bytes | int] = {}
    for tag, ftype, count, values in entries:
        ch, size = _TYPES[ftype]
        if tag == T_STRIP_OFFSETS:
            continue
        packed = struct.pack(f"<{count}{ch}", *values)
        if len(packed) <= 4:
            inline[tag] = packed.ljust(4, b"\0")
        else:
            inline[tag] = overflow_off + len(overflow)
            overflow += packed

    # strip offsets: data begins after overflow (+ the offsets array
    # itself when it doesn't fit inline)
    n = len(strips)
    off_bytes = n * 4
    offsets_pos = overflow_off + len(overflow)
    data_start = offsets_pos + (off_bytes if off_bytes > 4 else 0)
    strip_offs, pos = [], data_start
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    packed_offs = struct.pack(f"<{n}I", *strip_offs)
    if off_bytes <= 4:
        inline[T_STRIP_OFFSETS] = packed_offs.ljust(4, b"\0")
    else:
        inline[T_STRIP_OFFSETS] = offsets_pos
        overflow += packed_offs

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, ftype, count, _values in entries:
        v = inline[tag]
        out += struct.pack("<HHI", tag, ftype, count)
        out += v if isinstance(v, bytes) else struct.pack("<I", v)
    out += struct.pack("<I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s
    return bytes(out)


def _read_values(buf: memoryview, bo: str, ftype: int, count: int, raw: bytes):
    ch, size = _TYPES[ftype]
    total = size * count
    if total <= 4:
        return list(struct.unpack(f"{bo}{count}{ch}", raw[:total]))
    (off,) = struct.unpack(f"{bo}I", raw)
    return list(struct.unpack_from(f"{bo}{count}{ch}", buf, off))


def geotiff_decode(data: bytes) -> GeoTiff:
    """Parse a strip-organized baseline (Geo)TIFF, either byte order."""
    buf = memoryview(bytes(data))
    order = bytes(buf[:2])
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack_from(f"{bo}HI", buf, 2)
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")

    (n_entries,) = struct.unpack_from(f"{bo}H", buf, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + i * 12
        tag, ftype, count = struct.unpack_from(f"{bo}HHI", buf, base)
        if ftype not in _TYPES:
            continue  # unknown field type: skip per TIFF 6.0 readers note
        raw = bytes(buf[base + 8 : base + 12])
        tags[tag] = _read_values(buf, bo, ftype, count, raw)

    if T_TILE_WIDTH in tags:
        raise NotImplementedError(
            "tiled TIFF organization not supported (strip reader; "
            "the engine re-tiles via operators/tiling.py after decode)"
        )
    w, h = tags[T_WIDTH][0], tags[T_HEIGHT][0]
    bands = tags.get(T_SAMPLES, [1])[0]
    bits = tags.get(T_BITS, [8])[0]
    comp = tags.get(T_COMPRESSION, [1])[0]
    sfmt = tags.get(T_SAMPLE_FORMAT, [_SAMPLE_FORMAT_UINT])[0]
    if tags.get(T_PLANAR, [1])[0] != 1:
        raise NotImplementedError("PlanarConfiguration 2 not supported")
    dt = _DTYPES.get((bits, sfmt))
    if dt is None:
        raise NotImplementedError(f"unsupported sample layout: {bits}/{sfmt}")
    if comp not in (1, 8, 32946):  # none, Adobe deflate, deflate
        raise NotImplementedError(f"unsupported TIFF compression {comp}")

    offs = tags[T_STRIP_OFFSETS]
    counts = tags[T_STRIP_COUNTS]
    payload = b"".join(
        zlib.decompress(bytes(buf[o : o + c]))
        if comp in (8, 32946)
        else bytes(buf[o : o + c])
        for o, c in zip(offs, counts)
    )
    arr = np.frombuffer(payload, dtype=np.dtype(dt).newbyteorder(bo))
    arr = arr.astype(dt).reshape(h, w, bands)
    if bands == 1:
        arr = arr[:, :, 0]

    sx, sy = (tags.get(T_MODEL_PIXEL_SCALE) or [1.0, 1.0, 0.0])[:2]
    tp = tags.get(T_MODEL_TIEPOINT)
    if tp and len(tp) >= 6:
        # raster point (i, j) maps to model (x, y): origin of the
        # top-left corner = model point minus pixel offset
        origin = (tp[3] - tp[0] * sx, tp[4] + tp[1] * sy)
    else:
        origin = (0.0, 0.0)
    crs = 0
    gk = tags.get(T_GEO_KEYS)
    if gk and len(gk) >= 4:
        nkeys = gk[3]
        for k in range(nkeys):
            kid, loc, cnt, val = gk[4 + 4 * k : 8 + 4 * k]
            if kid == GK_GEOGRAPHIC_TYPE and loc == 0:
                crs = val
    return GeoTiff(arr, origin, (float(sx), float(sy)), crs, comp)
