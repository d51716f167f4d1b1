"""Property pins for the from-scratch file codecs (round-5 wave 13) —
pure Python/numpy, no Spark.

Three container formats each carry a decode(encode(x)) == x contract
over their full supported type lattice; hypothesis drives random
payloads through every parameter combination the fixture generators
don't reach (odd strip splits, empty arrays/maps, extreme zigzag
longs, multi-ring polygons, deleted dBase rows)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

# ----------------------------------------------------------------- GeoTIFF

_DTYPES = [np.uint8, np.uint16, np.int16, np.float32]


@st.composite
def _gt_case(draw):
    h = draw(st.integers(1, 23))
    w = draw(st.integers(1, 19))
    bands = draw(st.integers(1, 4))
    dt = draw(st.sampled_from(_DTYPES))
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        elems = st.integers(int(info.min), int(info.max))
    else:
        elems = st.floats(-1e6, 1e6, allow_nan=False, width=32)
    shape = (h, w) if bands == 1 and draw(st.booleans()) else (h, w, bands)
    img = draw(hnp.arrays(dt, shape, elements=elems))
    rps = draw(st.one_of(st.none(), st.integers(1, h + 3)))
    return img, draw(st.booleans()), rps


@settings(max_examples=60, deadline=None)
@given(_gt_case())
def test_geotiff_roundtrip_property(case):
    from geowave_spark.raster.geotiff import geotiff_decode, geotiff_encode

    img, compress, rps = case
    g = geotiff_decode(
        geotiff_encode(img, origin=(-7.25, 44.5), scale=(0.125, 0.25),
                       compress=compress, rows_per_strip=rps)
    )
    # single-band always decodes to (h, w) — the documented squeeze
    want = img[:, :, 0] if img.ndim == 3 and img.shape[2] == 1 else img
    assert g.pixels.dtype == want.dtype
    assert g.pixels.shape == want.shape
    assert np.array_equal(g.pixels, want)
    assert g.origin == (-7.25, 44.5) and g.scale == (0.125, 0.25)


# -------------------------------------------------------------------- Avro

_AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "f", "type": "double"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "flag", "type": "boolean"},
    ],
}

_rec = st.fixed_dictionaries(
    {
        "i": st.integers(-(2**63), 2**63 - 1),
        "f": st.floats(allow_nan=False),
        "s": st.one_of(st.none(), st.text(max_size=40)),
        "b": st.binary(max_size=30),
        "arr": st.lists(st.integers(-(2**40), 2**40), max_size=8),
        "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8),
                             max_size=5),
        "flag": st.booleans(),
    }
)


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(_rec, max_size=12),
    codec=st.sampled_from(["null", "deflate"]),
    block=st.integers(1, 5),
)
def test_avro_roundtrip_property(recs, codec, block, tmp_path_factory):
    from geowave_spark.sources.avro import avro_read, avro_write

    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    avro_write(p, _AVRO_SCHEMA, recs, codec=codec, block_records=block)
    schema, got = avro_read(open(p, "rb").read())
    assert schema == _AVRO_SCHEMA
    assert got == recs


# --------------------------------------------------------------- Shapefile

_coord = st.floats(-1e6, 1e6, allow_nan=False)


@st.composite
def _shape(draw):
    from geowave_spark.sources.shapefile import (
        SHAPE_MULTIPOINT,
        SHAPE_POINT,
        SHAPE_POLYGON,
        SHAPE_POLYLINE,
    )

    kind = draw(st.sampled_from(
        [SHAPE_POINT, SHAPE_POLYLINE, SHAPE_POLYGON, SHAPE_MULTIPOINT]
    ))
    if kind == SHAPE_POINT:
        pts = draw(hnp.arrays(np.float64, (1, 2), elements=_coord))
        return kind, [pts]
    if kind == SHAPE_MULTIPOINT:
        n = draw(st.integers(1, 6))
        return kind, [draw(hnp.arrays(np.float64, (n, 2), elements=_coord))]
    n_parts = draw(st.integers(1, 3))
    parts = []
    for _ in range(n_parts):
        n = draw(st.integers(4 if kind == SHAPE_POLYGON else 2, 7))
        a = draw(hnp.arrays(np.float64, (n, 2), elements=_coord))
        if kind == SHAPE_POLYGON:
            a = np.vstack([a, a[:1]])  # closed ring
        parts.append(a)
    return kind, parts


@settings(max_examples=40, deadline=None)
@given(shapes=st.lists(_shape(), min_size=1, max_size=6))
def test_shapefile_shp_roundtrip_property(shapes, tmp_path_factory):
    from geowave_spark.sources.shapefile import shp_decode, write_shapefile

    base = str(tmp_path_factory.mktemp("shp") / "t")
    write_shapefile(
        base, shapes, [("ID", "N", 6, 0)], [[i] for i in range(len(shapes))]
    )
    got = shp_decode(open(base + ".shp", "rb").read())
    assert len(got) == len(shapes)
    for (rec_no, stype, parts), (want_type, want_parts) in zip(got, shapes):
        assert stype == want_type
        assert len(parts) == len(want_parts)
        for a, b in zip(parts, want_parts):
            assert np.array_equal(a, b)


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(-999, 9999), st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=6,
        )),
        min_size=1,
        max_size=8,
    )
)
def test_dbf_roundtrip_property(vals, tmp_path_factory):
    """dBase N fields parse back to their integer text; C fields strip
    the fixed-width padding (leading/trailing spaces in the VALUE are
    not preserved — the documented dBase limitation)."""
    import numpy as np

    from geowave_spark.sources.shapefile import (
        SHAPE_POINT,
        dbf_decode,
        write_shapefile,
    )

    base = str(tmp_path_factory.mktemp("dbf") / "t")
    shapes = [(SHAPE_POINT, [np.array([[0.0, 0.0]])])] * len(vals)
    write_shapefile(
        base, shapes, [("N1", "N", 6, 0), ("C1", "C", 8, 0)], [list(v) for v in vals]
    )
    df = dbf_decode(open(base + ".dbf", "rb").read())
    assert len(df) == len(vals)
    for i, (n, c) in enumerate(vals):
        assert df["N1"][i] == str(n)
        assert df["C1"][i] == c[:8].strip()
