"""GeoTIFF codec tests (raster/geotiff.py vs the public TIFF 6.0 /
GeoTIFF 1.1 byte layout) + the Spark reader surface."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geowave_spark.raster.geotiff import (
    GeoTiff,
    geotiff_decode,
    geotiff_encode,
)


@pytest.mark.parametrize(
    "dtype,shape,compress,rps",
    [
        (np.uint8, (13, 17), False, None),
        (np.uint8, (13, 17, 3), True, 4),
        (np.uint16, (8, 9), True, None),
        (np.int16, (8, 9, 2), False, 3),
        (np.float32, (5, 6), True, 2),
    ],
)
def test_roundtrip(dtype, shape, compress, rps):
    rng = np.random.default_rng(7)
    if dtype == np.float32:
        img = rng.random(shape, dtype=np.float32)
    else:
        info = np.iinfo(dtype)
        img = rng.integers(info.min, info.max, shape).astype(dtype)
    b = geotiff_encode(
        img,
        origin=(-120.5, 45.25),
        scale=(0.01, 0.02),
        compress=compress,
        rows_per_strip=rps,
    )
    g = geotiff_decode(b)
    assert g.pixels.dtype == dtype and g.pixels.shape == img.shape
    assert np.array_equal(g.pixels, img)
    assert g.origin == (-120.5, 45.25)
    assert g.scale == (0.01, 0.02)
    assert g.crs_code == 4326
    assert g.compression == (8 if compress else 1)


def test_big_endian_read():
    """Hand-built MM-order TIFF: a 2x3 uint8 image, one strip, values
    big-endian throughout — the decoder must honor the byte-order mark."""
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    entries = [
        (256, 3, 1, [3]),  # width
        (257, 3, 1, [2]),  # height
        (258, 3, 1, [8]),
        (259, 3, 1, [1]),
        (262, 3, 1, [1]),
        (273, 4, 1, None),  # strip offset (patched)
        (277, 3, 1, [1]),
        (278, 4, 1, [2]),
        (279, 4, 1, [6]),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + len(entries) * 12 + 4
    out = struct.pack(">2sHI", b"MM", 42, ifd_off)
    out += struct.pack(">H", len(entries))
    for tag, ftype, count, values in entries:
        vals = [data_off] if values is None else values
        ch = {3: "H", 4: "I"}[ftype]
        packed = struct.pack(f">{count}{ch}", *vals).ljust(4, b"\0")
        out += struct.pack(">HHI", tag, ftype, count) + packed
    out += struct.pack(">I", 0)
    out += img.tobytes()
    g = geotiff_decode(out)
    assert np.array_equal(g.pixels, img)
    assert g.crs_code == 0 and g.origin == (0.0, 0.0)


def test_tiled_and_bad_inputs_raise():
    img = np.zeros((4, 4), np.uint8)
    b = bytearray(geotiff_encode(img))
    with pytest.raises(ValueError, match="byte-order"):
        geotiff_decode(b"XX" + bytes(b[2:]))
    # patch a TileWidth tag id over an existing entry → tiled reject
    tiled = bytes(b).replace(
        struct.pack("<HHI", 284, 3, 1), struct.pack("<HHI", 322, 3, 1)
    )
    with pytest.raises(NotImplementedError, match="tiled"):
        geotiff_decode(tiled)
    # unsupported compression code
    lzw = bytes(b).replace(
        struct.pack("<HHI", 259, 3, 1) + struct.pack("<I", 1),
        struct.pack("<HHI", 259, 3, 1) + struct.pack("<I", 5),
    )
    with pytest.raises(NotImplementedError, match="compression"):
        geotiff_decode(lzw)


def test_deflate_strips_are_really_compressed():
    """The on-disk strip bytes are zlib streams, not raw pixels."""
    img = np.zeros((64, 64), np.uint8)
    b = geotiff_encode(img, compress=True, rows_per_strip=16)
    g = geotiff_decode(b)
    assert np.array_equal(g.pixels, img)
    # 4096 zero pixels compress to a few dozen bytes; raw stays ≥ 4096
    assert len(b) < 1024 < 4096 < len(geotiff_encode(img))


def test_unknown_tag_types_skipped():
    """A tag with an unregistered field type must be ignored, not fatal
    (TIFF 6.0 readers requirement)."""
    img = np.ones((2, 2), np.uint8)
    b = bytearray(geotiff_encode(img))
    # SampleFormat (339, type 3) → fake RATIONAL type 5 (unsupported)
    i = bytes(b).index(struct.pack("<HH", 339, 3))
    b[i + 2 : i + 4] = struct.pack("<H", 5)
    g = geotiff_decode(bytes(b))
    assert np.array_equal(g.pixels, img)  # falls back to uint8 default


def test_spark_reader_geo_and_pixels(spark):
    from geowave_spark.sources import formats as FM

    root = FM.formats_fixture_dir("/root/testdata/sf0.001")
    df = FM.read_geotiff(spark, root + "/geotiff").toPandas()
    assert len(df) > 40
    eid = df["file"].str.extract(r"img(\d+)\.tif")[0].astype(int)
    assert (df["w"] == 16 + eid % 17).all()
    assert (df["crs"] == 4326).all()
    assert (df["compression"] == np.where(eid % 2 == 0, 8, 1)).all()
    # decode one pixels payload back and re-check the analytic ramp
    from geowave_spark.raster.codec import decode_raw_typed

    row = df.iloc[0]
    px = decode_raw_typed(bytes(row["pixels"]))  # single band → (h, w)
    r, c = np.mgrid[0 : row["h"], 0 : row["w"]]
    want = (int(eid.iloc[0]) * 7 + r * 13 + c * 31) % 256
    assert np.array_equal(px, want.astype(np.uint8))
