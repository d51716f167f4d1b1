import numpy as np

from geowave_spark import X_SCALE
from geowave_spark.geom.predicates import points_in_polygon
from geowave_spark.geom.wkb import box, polygon, wkb_dumps
from geowave_spark.index.polyfill import cells_for_geom, cells_for_wkb_cached, polyfill
from geowave_spark.index.zorder import cells_of_points


def test_polyfill_superset_of_point_cells():
    """Every point inside the polygon maps to a cell in the cover."""
    tri = polygon([[0, 0], [20, 0], [10, 15]])
    res = 8
    cover = set(polyfill(tri, res))
    rng = np.random.default_rng(11)
    xs = rng.uniform(0, 20, 2000)
    ys = rng.uniform(0, 15, 2000)
    inside = points_in_polygon(xs, ys, tri)
    cells = cells_of_points(
        (xs * X_SCALE).astype(np.int64), (ys * X_SCALE).astype(np.int64), res
    )
    for c in cells[inside]:
        assert int(c) in cover


def test_polyfill_trims_corners():
    """Exact trim drops bbox cells that don't touch the triangle."""
    tri = polygon([[0, 0], [40, 0], [0, 40]])
    res = 6
    trimmed = set(polyfill(tri, res, exact_trim=True))
    bbox_cover = set(polyfill(tri, res, exact_trim=False))
    assert trimmed < bbox_cover  # strictly smaller: corner cells dropped


def test_cells_for_geom_respects_cap():
    big = box(-170, -80, 170, 80)
    small = box(0, 0, 0.01, 0.01)
    res_big, cells_big = cells_for_geom(big, max_cells=64)
    res_small, cells_small = cells_for_geom(small, max_cells=64)
    assert len(cells_big) <= 64
    assert len(cells_small) <= 64
    assert res_small > res_big


def test_cells_for_wkb_cached():
    g = box(1, 1, 2, 2)
    r1 = cells_for_wkb_cached(wkb_dumps(g))
    r2 = cells_for_wkb_cached(wkb_dumps(g))
    assert r1 == r2
    info = cells_for_wkb_cached.cache_info()
    assert info.hits >= 1
