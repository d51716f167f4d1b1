import numpy as np
import pytest

from geowave_spark.geom.predicates import (
    contains,
    crosses,
    disjoint,
    distance,
    dwithin,
    equals,
    intersects,
    overlaps,
    points_in_polygon,
    touches,
    within,
)
from geowave_spark.geom.wkb import (
    box,
    linestring,
    multipolygon,
    point,
    polygon,
    wkb_dumps,
    wkb_loads,
)


def test_wkb_roundtrip_all_types():
    geoms = [
        point(1.5, -2.5),
        linestring([[0, 0], [1, 1], [2, 0]]),
        polygon([[0, 0], [4, 0], [4, 4], [0, 4]]),
        polygon([[0, 0], [10, 0], [10, 10], [0, 10]], holes=[[[4, 4], [6, 4], [6, 6], [4, 6]]]),
        multipolygon([box(0, 0, 1, 1), box(5, 5, 6, 6)]),
    ]
    for g in geoms:
        assert wkb_loads(wkb_dumps(g)) == g


def test_wkb_point_bytes_are_standard():
    # little-endian WKB point: 01 01000000 + two f8
    b = wkb_dumps(point(1.0, 2.0))
    assert b[:5] == b"\x01\x01\x00\x00\x00"
    assert len(b) == 21


def test_point_in_polygon_basic():
    sq = box(0, 0, 10, 10)
    xs = np.array([5.0, -1.0, 0.0, 10.0, 10.1])
    ys = np.array([5.0, 5.0, 0.0, 10.0, 5.0])
    got = points_in_polygon(xs, ys, sq)
    assert got.tolist() == [True, False, True, True, False]


def test_point_in_polygon_hole():
    g = polygon([[0, 0], [10, 0], [10, 10], [0, 10]], holes=[[[4, 4], [6, 4], [6, 6], [4, 6]]])
    xs = np.array([5.0, 3.0, 4.0])
    ys = np.array([5.0, 3.0, 5.0])
    got = points_in_polygon(xs, ys, g)
    # center is inside the hole -> out; hole boundary counts as polygon boundary -> in
    assert got.tolist() == [False, True, True]


def test_point_in_concave_polygon():
    # U-shape
    u = polygon([[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10], [0, 10]])
    assert points_in_polygon([5.0], [1.0], u)[0]  # in the base
    assert not points_in_polygon([5.0], [8.0], u)[0]  # in the notch
    assert points_in_polygon([1.0], [8.0], u)[0]  # left arm


def test_intersects_polygons():
    a = box(0, 0, 10, 10)
    assert intersects(a, box(5, 5, 15, 15))
    assert intersects(a, box(10, 10, 20, 20))  # corner touch
    assert not intersects(a, box(11, 11, 20, 20))
    assert intersects(a, box(2, 2, 3, 3))  # containment, no edge contact
    assert intersects(box(2, 2, 3, 3), a)


def test_contains_within():
    a = box(0, 0, 10, 10)
    b = box(2, 2, 3, 3)
    assert contains(a, b) and within(b, a)
    assert not contains(b, a)
    assert not contains(a, box(5, 5, 15, 15))
    assert contains(a, point(5, 5))


def test_touches_and_disjoint():
    a = box(0, 0, 10, 10)
    assert touches(a, box(10, 0, 20, 10))
    assert not touches(a, box(5, 5, 15, 15))
    assert disjoint(a, box(11, 11, 12, 12))


def test_crosses_line_polygon():
    a = box(0, 0, 10, 10)
    l_cross = linestring([[-5, 5], [15, 5]])
    l_inside = linestring([[2, 2], [8, 8]])
    assert crosses(l_cross, a)
    assert not crosses(l_inside, a)
    assert intersects(l_inside, a)


def test_overlaps():
    a = box(0, 0, 10, 10)
    assert overlaps(a, box(5, 5, 15, 15))
    assert not overlaps(a, box(2, 2, 3, 3))
    assert not overlaps(a, box(10, 0, 20, 10))  # touch only


def test_equals():
    assert equals(box(0, 0, 1, 1), box(0, 0, 1, 1))
    assert not equals(box(0, 0, 1, 1), box(0, 0, 1, 2))


def test_distance():
    assert distance(point(0, 0), point(3, 4)) == pytest.approx(5.0)
    assert distance(box(0, 0, 1, 1), box(4, 0, 5, 1)) == pytest.approx(3.0)
    assert distance(box(0, 0, 2, 2), box(1, 1, 3, 3)) == 0.0
    assert distance(point(5, 5), box(0, 0, 10, 10)) == 0.0
    assert distance(linestring([[0, 0], [10, 0]]), point(5, 2)) == pytest.approx(2.0)


def test_dwithin():
    assert dwithin(point(0, 0), point(3, 4), 5.0)
    assert not dwithin(point(0, 0), point(3, 4), 4.99)


def test_multipoint_distance_measures_points_not_segments():
    """Regression: a MultiPoint's coordinate array was treated as a
    polyline, measuring distance to phantom segments between its
    members — Point(5,3) vs MultiPoint[(0,0),(10,0)] returned 3.0
    (distance to the nonexistent connecting segment) instead of
    sqrt(34), so dwithin(.., 4.0) wrongly matched."""
    import math

    import numpy as np

    from geowave_spark.geom.predicates import (
        distance,
        dwithin,
        points_distance_to_geom,
    )
    from geowave_spark.geom.wkb import Geometry

    pt = Geometry("Point", [np.array([[5.0, 3.0]])], [])
    mp = Geometry("MultiPoint", [np.array([[0.0, 0.0], [10.0, 0.0]])], [])
    want = math.hypot(5, 3)
    assert abs(distance(pt, mp) - want) < 1e-12
    assert abs(distance(mp, pt) - want) < 1e-12
    assert not dwithin(pt, mp, 4.0) and dwithin(pt, mp, 6.0)
    assert abs(points_distance_to_geom([5.0], [3.0], mp)[0] - want) < 1e-12
    # chains unchanged: the same coords AS a linestring do measure the segment
    line = Geometry("LineString", [np.array([[0.0, 0.0], [10.0, 0.0]])], [])
    assert abs(distance(pt, line) - 3.0) < 1e-12
