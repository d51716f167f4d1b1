"""Vectorized exact geometric predicates (numpy).

This is the engine's "exact refinement" layer — the role JTS
PreparedGeometry plays in the reference's SpatialQueryFilter
(core/geotime/src/main/java/org/locationtech/geowave/core/geotime/store/query/filter/SpatialQueryFilter.java:47-158
defines the 8 CompareOperations: CONTAINS, OVERLAPS, INTERSECTS,
TOUCHES, WITHIN, DISJOINT, CROSSES, EQUALS). Boundary semantics follow
JTS: INTERSECTS is true on boundary contact (= NOT DISJOINT).

The hot path is ``points_in_polygon`` — a fully vectorized
even-odd ray cast with an explicit on-boundary pass, O(P×E) numpy ops
per Arrow batch, no per-row Python.
"""

from __future__ import annotations

import numpy as np

from geowave_spark.geom.wkb import Geometry


# ------------------------------------------------------------- ray cast


def _points_in_ring(xs, ys, ring) -> np.ndarray:
    """Even-odd crossing count, boundary NOT handled here."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px = xs[:, None]
    py = ys[:, None]
    cond = (y1[None, :] > py) != (y2[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[None, :]
    crossings = cond & (px < xint)
    return crossings.sum(axis=1) % 2 == 1


def _points_on_ring(xs, ys, ring, eps=0.0) -> np.ndarray:
    """Point exactly on a ring segment (collinear + within segment bbox)."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px = xs[:, None]
    py = ys[:, None]
    cross = (x2 - x1)[None, :] * (py - y1[None, :]) - (y2 - y1)[None, :] * (
        px - x1[None, :]
    )
    on_line = np.abs(cross) <= eps
    in_box = (
        (px >= np.minimum(x1, x2)[None, :] - eps)
        & (px <= np.maximum(x1, x2)[None, :] + eps)
        & (py >= np.minimum(y1, y2)[None, :] - eps)
        & (py <= np.maximum(y1, y2)[None, :] + eps)
    )
    return (on_line & in_box).any(axis=1)


def points_in_polygon(xs, ys, geom: Geometry, include_boundary=True) -> np.ndarray:
    """Vectorized point-in-areal-geometry test (holes + multipolygon)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    out = np.zeros(len(xs), dtype=bool)
    boundary = np.zeros(len(xs), dtype=bool)
    for rings in geom.polygons():
        inside = _points_in_ring(xs, ys, rings[0])
        for hole in rings[1:]:
            inside &= ~_points_in_ring(xs, ys, hole)
        out |= inside
        for ring in rings:
            boundary |= _points_on_ring(xs, ys, ring)
    if include_boundary:
        out |= boundary
    else:
        out &= ~boundary
    return out


# --------------------------------------------------------- segment tests


def _orient(ax, ay, bx, by, cx, cy):
    return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def segments_intersect_any(a: np.ndarray, b: np.ndarray) -> bool:
    """True if any segment of closed/open chain ``a`` (Na,2) intersects any
    segment of chain ``b`` (Nb,2). Vectorized over the Na×Nb pair grid."""
    a1, a2 = a[:-1], a[1:]
    b1, b2 = b[:-1], b[1:]
    ax1, ay1 = a1[:, 0][:, None], a1[:, 1][:, None]
    ax2, ay2 = a2[:, 0][:, None], a2[:, 1][:, None]
    bx1, by1 = b1[:, 0][None, :], b1[:, 1][None, :]
    bx2, by2 = b2[:, 0][None, :], b2[:, 1][None, :]
    d1 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper.any():
        return True
    # collinear / endpoint touches
    def on_seg(px, py, qx, qy, rx, ry):
        return (
            (np.minimum(px, qx) <= rx)
            & (rx <= np.maximum(px, qx))
            & (np.minimum(py, qy) <= ry)
            & (ry <= np.maximum(py, qy))
        )

    touch = (
        ((d1 == 0) & on_seg(ax1, ay1, ax2, ay2, bx1, by1))
        | ((d2 == 0) & on_seg(ax1, ay1, ax2, ay2, bx2, by2))
        | ((d3 == 0) & on_seg(bx1, by1, bx2, by2, ax1, ay1))
        | ((d4 == 0) & on_seg(bx1, by1, bx2, by2, ax2, ay2))
    )
    return bool(touch.any())


# --------------------------------------------------------- geom x geom


def bounds_disjoint(a: Geometry, b: Geometry) -> bool:
    ax0, ay0, ax1, ay1 = a.bounds
    bx0, by0, bx1, by1 = b.bounds
    return ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0


def _areal(g: Geometry) -> bool:
    return g.gtype in ("Polygon", "MultiPolygon")


def _vertices(g: Geometry) -> np.ndarray:
    return np.vstack(g.parts)


def _chains(g: Geometry):
    """Segment chains of a geometry (rings for areal, lines for lineal)."""
    if g.gtype in ("Point", "MultiPoint"):
        return []
    return list(g.parts)


def intersects(a: Geometry, b: Geometry) -> bool:
    """JTS-equivalent intersects (boundary contact counts)."""
    if bounds_disjoint(a, b):
        return False
    if a.gtype in ("Point", "MultiPoint"):
        return _points_touch_geom(a, b)
    if b.gtype in ("Point", "MultiPoint"):
        return _points_touch_geom(b, a)
    # chain-chain edge intersection
    for ca in _chains(a):
        for cb in _chains(b):
            if segments_intersect_any(ca, cb):
                return True
    # containment without edge contact
    if _areal(a) and points_in_polygon(
        _vertices(b)[:1, 0], _vertices(b)[:1, 1], a
    )[0]:
        return True
    if _areal(b) and points_in_polygon(
        _vertices(a)[:1, 0], _vertices(a)[:1, 1], b
    )[0]:
        return True
    return False


def _points_touch_geom(pts: Geometry, g: Geometry) -> bool:
    xs, ys = pts.parts[0][:, 0], pts.parts[0][:, 1]
    if _areal(g):
        return bool(points_in_polygon(xs, ys, g).any())
    if g.gtype in ("Point", "MultiPoint"):
        other = g.parts[0]
        return bool(
            (np.abs(xs[:, None] - other[None, :, 0]) == 0)
            & (np.abs(ys[:, None] - other[None, :, 1]) == 0)
        ).any()
    # lineal: point on any segment
    for chain in g.parts:
        if _points_on_ring(xs, ys, chain).any():
            return True
    return False


def disjoint(a: Geometry, b: Geometry) -> bool:
    return not intersects(a, b)


def contains(a: Geometry, b: Geometry) -> bool:
    """a contains b (JTS covers-like for our test shapes: all vertices of
    b inside-or-on a, and b's edges never cross a's boundary properly)."""
    if not _areal(a):
        return False
    vb = _vertices(b)
    if not points_in_polygon(vb[:, 0], vb[:, 1], a).all():
        return False
    # b's interior must stay inside: check midpoints of b's edges too
    for cb in _chains(b):
        mid = (cb[:-1] + cb[1:]) / 2.0
        if len(mid) and not points_in_polygon(mid[:, 0], mid[:, 1], a).all():
            return False
    return True


def within(a: Geometry, b: Geometry) -> bool:
    return contains(b, a)


def equals(a: Geometry, b: Geometry) -> bool:
    if _areal(a) and _areal(b):
        return contains(a, b) and contains(b, a)
    va, vb = _vertices(a), _vertices(b)
    if va.shape != vb.shape:
        return False
    return bool(np.array_equal(np.sort(va, axis=0), np.sort(vb, axis=0)))


def touches(a: Geometry, b: Geometry) -> bool:
    """Boundary contact with disjoint interiors (pragmatic version)."""
    if not intersects(a, b):
        return False
    if a.gtype in ("Point", "MultiPoint"):
        if _areal(b):
            xs, ys = a.parts[0][:, 0], a.parts[0][:, 1]
            on_b = np.zeros(len(xs), dtype=bool)
            for rings in b.polygons():
                for ring in rings:
                    on_b |= _points_on_ring(xs, ys, ring)
            inside = points_in_polygon(xs, ys, b, include_boundary=False)
            return bool(on_b.any()) and not bool(inside.any())
        return False
    if b.gtype in ("Point", "MultiPoint"):
        return touches(b, a)
    if _areal(a) and _areal(b):
        va, vb = _vertices(a), _vertices(b)
        a_in_b = points_in_polygon(va[:, 0], va[:, 1], b, include_boundary=False)
        b_in_a = points_in_polygon(vb[:, 0], vb[:, 1], a, include_boundary=False)
        return not bool(a_in_b.any()) and not bool(b_in_a.any())
    return False


def _line_sample_points(line: np.ndarray, g: Geometry) -> np.ndarray:
    """Sample points along a chain: midpoints of the pieces cut by g's
    edges (parametric clipping), so in/out classification is exact even
    when both endpoints are outside."""
    samples = [line]
    for seg_i in range(len(line) - 1):
        p, q = line[seg_i], line[seg_i + 1]
        ts = [0.0, 1.0]
        d = q - p
        for rings in g.polygons():
            for ring in rings:
                e1, e2 = ring[:-1], ring[1:]
                ed = e2 - e1
                denom = d[0] * ed[:, 1] - d[1] * ed[:, 0]
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = ((e1[:, 0] - p[0]) * ed[:, 1] - (e1[:, 1] - p[1]) * ed[:, 0]) / denom
                    u = ((e1[:, 0] - p[0]) * d[1] - (e1[:, 1] - p[1]) * d[0]) / denom
                ok = (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
                ts.extend(t[ok].tolist())
        ts = sorted(set(ts))
        mids = [(ts[i] + ts[i + 1]) / 2 for i in range(len(ts) - 1)]
        if mids:
            samples.append(p[None, :] + np.asarray(mids)[:, None] * d[None, :])
    return np.vstack(samples)


def crosses(a: Geometry, b: Geometry) -> bool:
    """Lineal × areal crossing (interior intersection both in and out)."""
    if a.gtype == "LineString" and _areal(b):
        pts = _line_sample_points(a.parts[0], b)
        inside = points_in_polygon(pts[:, 0], pts[:, 1], b, include_boundary=False)
        on_b = np.zeros(len(pts), dtype=bool)
        for rings in b.polygons():
            for ring in rings:
                on_b |= _points_on_ring(pts[:, 0], pts[:, 1], ring)
        outside = ~inside & ~on_b
        return bool(inside.any()) and bool(outside.any())
    if b.gtype == "LineString" and _areal(a):
        return crosses(b, a)
    if a.gtype == "LineString" and b.gtype == "LineString":
        return segments_intersect_any(a.parts[0], b.parts[0]) and not equals(a, b)
    return False


def overlaps(a: Geometry, b: Geometry) -> bool:
    """Same-dimension partial overlap."""
    if _areal(a) and _areal(b):
        return (
            intersects(a, b)
            and not contains(a, b)
            and not contains(b, a)
            and not touches(a, b)
        )
    return False


# --------------------------------------------------------- distance


def _point_seg_dist2(px, py, x1, y1, x2, y2):
    """Squared distance from points (P,) to segments (S,) — (P,S) grid."""
    dx = x2 - x1
    dy = y2 - y1
    len2 = dx * dx + dy * dy
    len2 = np.where(len2 == 0, 1.0, len2)
    t = ((px[:, None] - x1[None, :]) * dx[None, :] + (py[:, None] - y1[None, :]) * dy[None, :]) / len2[None, :]
    t = np.clip(t, 0.0, 1.0)
    cx = x1[None, :] + t * dx[None, :]
    cy = y1[None, :] + t * dy[None, :]
    return (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2


def distance(a: Geometry, b: Geometry) -> float:
    """Planar euclidean distance (reference GeomDistance semantics:
    analytics/spark/.../udf/GeomDistance.java — JTS planar distance)."""
    if intersects(a, b):
        return 0.0
    best = np.inf
    for pa in a.parts:
        for pb in b.parts:
            if len(pb) > 1:
                d2 = _point_seg_dist2(
                    pa[:, 0], pa[:, 1], pb[:-1, 0], pb[:-1, 1], pb[1:, 0], pb[1:, 1]
                )
                best = min(best, float(d2.min()))
            if len(pa) > 1:
                d2 = _point_seg_dist2(
                    pb[:, 0], pb[:, 1], pa[:-1, 0], pa[:-1, 1], pa[1:, 0], pa[1:, 1]
                )
                best = min(best, float(d2.min()))
            if len(pa) == 1 and len(pb) == 1:
                d2 = (pa[0, 0] - pb[0, 0]) ** 2 + (pa[0, 1] - pb[0, 1]) ** 2
                best = min(best, float(d2))
    return float(np.sqrt(best))


def dwithin(a: Geometry, b: Geometry, r: float) -> bool:
    """GeomWithinDistance semantics (udf/GeomWithinDistance.java:13-45)."""
    return distance(a, b) <= r


PREDICATES = {
    "intersects": intersects,
    "disjoint": disjoint,
    "contains": contains,
    "within": within,
    "touches": touches,
    "crosses": crosses,
    "overlaps": overlaps,
    "equals": equals,
}
