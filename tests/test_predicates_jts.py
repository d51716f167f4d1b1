"""JTS-semantics boundary cases for the geometry×geometry predicates.

Mirrors the reference's UDF-algebra sanity checks
(test/src/test/java/.../spark/GeoWaveSparkSQLIT.java:100-150 asserts
contains ≡ within flipped) plus the OGC/JTS boundary rules the round-1
heuristics diverged on: a point on a polygon's edge is COVERED but not
CONTAINED, and concave polygons where an edge of b exits and re-enters
a between sampled vertices.
"""

import numpy as np
import pytest

from geowave_spark.geom import predicates as P
from geowave_spark.geom.wkb import box, linestring, point, polygon, Geometry

SQUARE = box(0, 0, 10, 10)
# concave U: outer square with a notch cut from the top middle
U_SHAPE = polygon(
    [[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10], [0, 10], [0, 0]]
)


# ----------------------------------------------------- covers vs contains


def test_point_on_edge_covered_not_contained():
    pt = point(5, 0)  # on the bottom edge
    assert P.covers(SQUARE, pt)
    assert not P.contains(SQUARE, pt)
    assert P.covered_by(pt, SQUARE)
    assert not P.within(pt, SQUARE)
    assert P.touches(SQUARE, pt) and P.touches(pt, SQUARE)
    assert P.intersects(SQUARE, pt)


def test_point_on_vertex_covered_not_contained():
    pt = point(0, 0)
    assert P.covers(SQUARE, pt)
    assert not P.contains(SQUARE, pt)


def test_point_inside_contained():
    pt = point(5, 5)
    assert P.contains(SQUARE, pt)
    assert P.covers(SQUARE, pt)
    assert not P.touches(SQUARE, pt)


def test_line_on_boundary_covered_not_contained():
    edge = linestring([[2, 0], [8, 0]])  # lies wholly on the bottom edge
    assert P.covers(SQUARE, edge)
    assert not P.contains(SQUARE, edge)
    assert P.touches(SQUARE, edge)


def test_line_partly_interior_contained():
    li = linestring([[2, 0], [8, 5]])  # starts on boundary, enters interior
    assert P.covers(SQUARE, li)
    assert P.contains(SQUARE, li)
    assert not P.touches(SQUARE, li)


# ---------------------------------------------------- concave exactness


def test_concave_chord_not_covered():
    """Segment between two covered vertices that bulges across the
    notch: vertex tests alone would wrongly report covered."""
    chord = linestring([[2, 9], [8, 9]])  # both endpoints inside the arms
    assert P.covers(U_SHAPE, point(2, 9))
    assert P.covers(U_SHAPE, point(8, 9))
    assert not P.covers(U_SHAPE, chord)
    assert not P.contains(U_SHAPE, chord)
    assert P.crosses(chord, U_SHAPE)  # interior both in and out


def test_concave_box_across_notch_not_covered():
    b = box(2, 8, 8, 9)  # spans the notch
    assert not P.covers(U_SHAPE, b)
    assert not P.contains(U_SHAPE, b)
    assert P.overlaps(U_SHAPE, b)


def test_concave_box_in_arm_contained():
    b = box(0.5, 4, 2.5, 9)  # fully in the left arm
    assert P.contains(U_SHAPE, b)
    assert P.covers(U_SHAPE, b)
    assert not P.overlaps(U_SHAPE, b)


# ------------------------------------------------- contains ≡ within flip


@pytest.mark.parametrize(
    "a,b",
    [
        (SQUARE, box(2, 2, 8, 8)),
        (SQUARE, box(0, 0, 10, 10)),
        (SQUARE, box(5, 5, 15, 15)),
        (U_SHAPE, box(0.5, 4, 2.5, 9)),
        (U_SHAPE, box(2, 8, 8, 9)),
        (SQUARE, point(5, 0)),
        (SQUARE, linestring([[2, 0], [8, 0]])),
        (SQUARE, linestring([[-5, 5], [15, 5]])),
    ],
)
def test_contains_equals_within_flipped(a, b):
    assert P.contains(a, b) == P.within(b, a)
    assert P.covers(a, b) == P.covered_by(b, a)


# ----------------------------------------------------------- areal×areal


def test_boxes_touching_edge():
    a, b = box(0, 0, 10, 10), box(10, 0, 20, 10)
    assert P.touches(a, b)
    assert P.intersects(a, b)
    assert not P.overlaps(a, b)
    assert not P.contains(a, b)


def test_boxes_touching_corner():
    a, b = box(0, 0, 10, 10), box(10, 10, 20, 20)
    assert P.touches(a, b)
    assert not P.overlaps(a, b)


def test_boxes_overlapping():
    a, b = box(0, 0, 10, 10), box(5, 5, 15, 15)
    assert P.overlaps(a, b)
    assert not P.touches(a, b)
    assert not P.contains(a, b) and not P.contains(b, a)


def test_boxes_nested_and_equal():
    outer, inner = box(0, 0, 10, 10), box(2, 2, 8, 8)
    assert P.contains(outer, inner) and P.covers(outer, inner)
    assert not P.overlaps(outer, inner)
    same = box(0, 0, 10, 10)
    assert P.equals(outer, same)
    assert P.contains(outer, same)  # areal self-containment (interiors meet)
    assert not P.overlaps(outer, same)
    assert not P.touches(outer, same)


def test_nested_box_sharing_edge():
    """Inner box flush against the outer boundary: covered AND
    contained (interiors still intersect)."""
    outer, inner = box(0, 0, 10, 10), box(0, 2, 5, 8)
    assert P.covers(outer, inner)
    assert P.contains(outer, inner)
    assert not P.touches(outer, inner)


def test_polygon_with_hole_boundary_rules():
    holed = polygon(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        holes=[[[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]]],
    )
    assert not P.covers(holed, point(5, 5))  # inside the hole
    assert P.covers(holed, point(4, 5))  # on the hole edge
    assert not P.contains(holed, point(4, 5))
    assert P.contains(holed, point(2, 2))
    assert not P.covers(holed, box(3, 3, 7, 7))  # spans the hole
    assert P.covers(holed, box(1, 1, 3, 3))


# -------------------------------------------------------------- line×line


def test_lines_proper_cross():
    a = linestring([[0, 0], [10, 10]])
    b = linestring([[0, 10], [10, 0]])
    assert P.crosses(a, b)
    assert not P.touches(a, b)
    assert P.intersects(a, b)


def test_lines_endpoint_touch():
    a = linestring([[0, 0], [5, 5]])
    b = linestring([[5, 5], [10, 0]])
    assert P.touches(a, b)
    assert not P.crosses(a, b)


def test_line_endpoint_on_interior_of_other():
    """b ends ON a's interior: contact at b's endpoint but a's interior
    → interiors do NOT intersect (point∩interior(a) is b's boundary) —
    JTS says touches."""
    a = linestring([[0, 0], [10, 0]])
    b = linestring([[5, 0], [5, 10]])
    assert P.touches(a, b)
    assert not P.crosses(a, b)


def test_lines_collinear_overlap():
    a = linestring([[0, 0], [10, 0]])
    b = linestring([[5, 0], [15, 0]])
    assert P.overlaps(a, b)
    assert not P.crosses(a, b)
    assert not P.touches(a, b)
    assert P.intersects(a, b)


def test_line_covers_subsegment():
    a = linestring([[0, 0], [10, 0]])
    b = linestring([[2, 0], [8, 0]])
    assert P.covers(a, b)
    assert P.contains(a, b)
    assert not P.overlaps(a, b)
    assert P.equals(a, linestring([[0, 0], [5, 0], [10, 0]]))  # topological


def test_line_crosses_through_vertex_of_other():
    """Crossing exactly through an interior vertex of the other chain —
    no strictly-proper segment pair, but still a 0-dim interior
    contact."""
    a = linestring([[0, 0], [5, 0], [10, 0]])
    b = linestring([[5, -5], [5, 5]])
    assert P.crosses(a, b)
    assert not P.touches(a, b)


# ------------------------------------------------------------ line×areal


def test_line_through_polygon_crosses():
    li = linestring([[-5, 5], [15, 5]])
    assert P.crosses(li, SQUARE)
    assert P.crosses(SQUARE, li)
    assert not P.touches(li, SQUARE)


def test_line_touching_polygon_edge_from_outside():
    li = linestring([[-5, 0], [15, 0]])  # runs along the bottom edge line
    assert P.touches(li, SQUARE)
    assert not P.crosses(li, SQUARE)
    assert P.intersects(li, SQUARE)


def test_line_inside_polygon_not_crosses():
    li = linestring([[2, 2], [8, 8]])
    assert not P.crosses(li, SQUARE)
    assert P.contains(SQUARE, li)


def test_line_entering_through_notch():
    """Staircase line entering the U through the notch mouth: crosses."""
    li = linestring([[5, 20], [5, 1]])
    assert P.crosses(li, U_SHAPE)


# -------------------------------------------------------------- multipoint


def test_multipoint_crosses_polygon():
    mp = Geometry("MultiPoint", [np.array([[5.0, 5.0], [20.0, 20.0]])])
    assert P.crosses(mp, SQUARE)
    mp_in = Geometry("MultiPoint", [np.array([[5.0, 5.0], [6.0, 6.0]])])
    assert not P.crosses(mp_in, SQUARE)
    assert P.contains(SQUARE, mp_in)
