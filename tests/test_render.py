"""WMS mosaic render: exact pixel parity with a numpy reference over a
synthetic tile table (GeoWaveRasterReader bbox->mosaic semantics)."""

import numpy as np
import pandas as pd

from geowave_spark import LAT_OFF_U, LON_OFF_U, WORLD_X_U
from geowave_spark.operators.tiling import _tile_bounds, render_mosaic

LEVEL = 4
TS = 32
OUT_W, OUT_H = 96, 64
BBOX = (-60_000_000, -40_000_000, 70_000_000, 55_000_000)


def _tile_pixels(tx: int, ty: int) -> np.ndarray:
    sy, sx = np.meshgrid(np.arange(TS), np.arange(TS), indexing="ij")
    return ((tx * 31 + ty * 17 + sy * 5 + sx) % 256).astype(np.uint8)


def _make_tiles(spark):
    n = 1 << LEVEL
    rows = [
        (LEVEL, tx, ty, _tile_pixels(tx, ty).tobytes())
        for tx in range(n)
        for ty in range(n)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["level", "tx", "ty", "tile"]),
        "level int, tx long, ty long, tile binary",
    )


def _expected() -> np.ndarray:
    x_lo, y_lo, x_hi, y_hi = BBOX
    n = 1 << LEVEL
    px = x_lo + ((np.arange(OUT_W) * 2 + 1) * (x_hi - x_lo)) // (2 * OUT_W)
    py = y_hi - ((np.arange(OUT_H) * 2 + 1) * (y_hi - y_lo)) // (2 * OUT_H)
    canvas = np.zeros((OUT_H, OUT_W), dtype=np.uint8)
    for r in range(OUT_H):
        for c in range(OUT_W):
            tx = min(n - 1, max(0, (px[c] + LON_OFF_U) * n // WORLD_X_U))
            ty = min(n - 1, max(0, (py[r] + LAT_OFF_U) * n // WORLD_X_U))
            bx_lo, by_lo, bx_hi, by_hi = _tile_bounds(LEVEL, tx, ty)
            sx = (px[c] - bx_lo) * TS // (bx_hi - bx_lo)
            sy = (by_hi - py[r]) * TS // max(by_hi - by_lo, 1)
            sx = min(TS - 1, max(0, sx))
            sy = min(TS - 1, max(0, sy))
            canvas[r, c] = _tile_pixels(tx, ty)[sy, sx]
    return canvas


def test_render_matches_numpy_reference(spark):
    tiles = _make_tiles(spark)
    x_lo, y_lo, x_hi, y_hi = BBOX
    out = render_mosaic(
        tiles, x_lo, y_lo, x_hi, y_hi, LEVEL, OUT_W, OUT_H, tile_size=TS
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.w, row.h) == (OUT_W, OUT_H)
    got = np.frombuffer(bytes(row.image), dtype=np.uint8).reshape(OUT_H, OUT_W)
    np.testing.assert_array_equal(got, _expected())


def test_render_partial_coverage_background(spark):
    """Tiles missing from the table leave background pixels."""
    tiles = _make_tiles(spark).where("tx % 2 = 0")
    x_lo, y_lo, x_hi, y_hi = BBOX
    row = render_mosaic(
        tiles, x_lo, y_lo, x_hi, y_hi, LEVEL, OUT_W, OUT_H, tile_size=TS
    ).collect()[0]
    got = np.frombuffer(bytes(row.image), dtype=np.uint8).reshape(OUT_H, OUT_W)
    exp = _expected()
    n = 1 << LEVEL
    px = x_lo + ((np.arange(OUT_W) * 2 + 1) * (x_hi - x_lo)) // (2 * OUT_W)
    tx = np.clip((px + LON_OFF_U) * n // WORLD_X_U, 0, n - 1)
    covered = (tx % 2) == 0
    np.testing.assert_array_equal(got[:, covered], exp[:, covered])
    assert (got[:, ~covered] == 0).all()


def test_render_no_tiles_gives_background_canvas(spark):
    tiles = _make_tiles(spark).where("tx < 0")  # empty
    x_lo, y_lo, x_hi, y_hi = BBOX
    out = render_mosaic(
        tiles, x_lo, y_lo, x_hi, y_hi, LEVEL, OUT_W, OUT_H, tile_size=TS
    ).collect()
    assert len(out) == 1
    got = np.frombuffer(bytes(out[0].image), dtype=np.uint8)
    assert (got == 0).all() and len(got) == OUT_W * OUT_H
