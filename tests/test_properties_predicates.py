"""Property consistency matrix for the CompareOperation predicates
(geom/predicates.py) on random axis-aligned rectangles — pure python.

For proper (positive-area) rects, every JTS predicate has a closed-form
interval-arithmetic truth, so hypothesis can pin the whole DE-9IM
family against it at once: each engine predicate must equal its
interval formula, and the family must satisfy the structural relations
(intersects = ¬disjoint, within/contains duality, touches ∧ overlaps
exclusion, equals ⇒ covers both ways, polygon×polygon crosses ≡ false).
The example-based tests (test_geom.py / test_predicates_jts.py) pin
hand-picked JTS edge cases; this sweeps the combinatorics of edge and
corner contact that arise from a small integer coordinate pool."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark.geom import predicates as P
from geowave_spark.geom.wkb import box

# small integer pool on purpose: maximizes shared edges/corners
coord = st.integers(0, 8)


def _rect(data):
    x0, x1 = sorted(data.draw(st.tuples(coord, coord), label="xs"))
    y0, y1 = sorted(data.draw(st.tuples(coord, coord), label="ys"))
    if x0 == x1:
        x1 += 1
    if y0 == y1:
        y1 += 1
    return (x0, y0, x1, y1)


def _overlap_closed(a0, a1, b0, b1):
    return a0 <= b1 and b0 <= a1


def _overlap_open(a0, a1, b0, b1):
    return max(a0, b0) < min(a1, b1)


@settings(max_examples=500, deadline=None)
@given(data=st.data())
def test_rect_predicate_matrix(data):
    ra, rb = _rect(data), _rect(data)
    A, B = box(*ra), box(*rb)
    ax0, ay0, ax1, ay1 = ra
    bx0, by0, bx1, by1 = rb

    inter = _overlap_closed(ax0, ax1, bx0, bx1) and _overlap_closed(
        ay0, ay1, by0, by1
    )
    interiors = _overlap_open(ax0, ax1, bx0, bx1) and _overlap_open(
        ay0, ay1, by0, by1
    )
    a_cov_b = ax0 <= bx0 and bx1 <= ax1 and ay0 <= by0 and by1 <= ay1
    b_cov_a = bx0 <= ax0 and ax1 <= bx1 and by0 <= ay0 and ay1 <= by1
    eq = ra == rb

    # each predicate against its interval truth
    assert P.intersects(A, B) == inter
    assert P.disjoint(A, B) == (not inter)
    assert P.equals(A, B) == eq
    assert P.covers(A, B) == a_cov_b
    assert P.covered_by(A, B) == b_cov_a
    # proper rects have area, so contains = covers ∧ interior hit;
    # a covered positive-area rect always meets the interior
    assert P.contains(A, B) == a_cov_b
    assert P.within(A, B) == b_cov_a
    assert P.touches(A, B) == (inter and not interiors)
    assert P.overlaps(A, B) == (
        interiors and not a_cov_b and not b_cov_a
    )
    # same-dimension areal × areal: crosses is false by definition
    assert P.crosses(A, B) is False

    # structural relations (redundant with the above, but they pin the
    # FAMILY, so a future edit to one predicate can't silently break
    # its dual)
    assert P.intersects(A, B) == P.intersects(B, A)
    assert P.touches(A, B) == P.touches(B, A)
    assert P.contains(A, B) == P.within(B, A)
    if eq:
        assert P.covers(A, B) and P.covered_by(A, B)
