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


def _lineal(g: Geometry) -> bool:
    return g.gtype == "LineString"


def _pointal(g: Geometry) -> bool:
    return g.gtype in ("Point", "MultiPoint")


def _line_sample_points(line: np.ndarray, g: Geometry) -> np.ndarray:
    """Sample points along a chain: the chain's vertices plus midpoints
    of the pieces cut by g's edges (parametric clipping), so in/out/on
    classification against g is exact even when a whole piece lies
    between two consecutive vertices — the machinery behind JTS-exact
    containment for concave polygons (an edge of b that exits and
    re-enters a between vertices always produces an outside piece whose
    midpoint is sampled)."""
    samples = [line]
    chains = _chains(g)
    for seg_i in range(len(line) - 1):
        p, q = line[seg_i], line[seg_i + 1]
        ts = [0.0, 1.0]
        d = q - p
        for ring in chains:
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


def _on_chains(xs, ys, g: Geometry) -> np.ndarray:
    """Points exactly on g's boundary (areal) / on g's lines (lineal)."""
    out = np.zeros(len(xs), dtype=bool)
    for chain in _chains(g):
        out |= _points_on_ring(xs, ys, chain)
    return out


def _sample_points_of(b: Geometry, against: Geometry) -> np.ndarray:
    """All classification sample points of b vs ``against``: vertices
    plus cut-piece midpoints of every chain."""
    if _pointal(b):
        return b.parts[0]
    return np.vstack([_line_sample_points(c, against) for c in _chains(b)])


def covers(a: Geometry, b: Geometry) -> bool:
    """JTS covers: b ⊆ closure(a) — boundary-inclusive containment
    (SpatialQueryFilter CompareOperation semantics; contrast contains,
    which additionally requires an interior∩interior point)."""
    if bounds_disjoint(a, b):
        return False
    if _areal(a):
        pts = _sample_points_of(b, a)
        if not bool(points_in_polygon(pts[:, 0], pts[:, 1], a).all()):
            return False
        if _areal(b):
            # a hole of a (or the gap between multipolygon members)
            # lying wholly inside b's interior leaves b's own boundary
            # samples untouched — but then a's boundary passes strictly
            # through b's interior, which contradicts b ⊆ closure(a)
            return not _interior_sample_hit(b, a)
        return True
    if _lineal(a):
        if _areal(b):
            return False  # 1-dim cannot cover 2-dim
        pts = _sample_points_of(b, a)
        return bool(_on_chains(pts[:, 0], pts[:, 1], a).all())
    # a point/multipoint: every point of b must coincide with a point of a
    if not _pointal(b):
        return False
    pa, pb = a.parts[0], b.parts[0]
    eq = (pb[:, None, 0] == pa[None, :, 0]) & (pb[:, None, 1] == pa[None, :, 1])
    return bool(eq.any(axis=1).all())


def _line_endpoints(g: Geometry) -> np.ndarray:
    """Boundary of a linestring = its two global endpoints (JTS mod-2)."""
    c = g.parts[0]
    return np.vstack([c[0], c[-1]])


def contains(a: Geometry, b: Geometry) -> bool:
    """JTS contains: covers(a, b) AND the interiors intersect — a point
    or line lying wholly on a's boundary is covered but NOT contained
    (the divergence called out in GeoWaveSparkSQLIT.java:100-150, where
    contains must equal within flipped)."""
    if not covers(a, b):
        return False
    if _areal(a):
        if _areal(b):
            # a covered areal b has nonempty interior inside closure(a);
            # an open set cannot fit inside the measure-zero boundary
            return True
        pts = _sample_points_of(b, a)
        return bool(
            points_in_polygon(pts[:, 0], pts[:, 1], a, include_boundary=False).any()
        )
    if _lineal(a):
        if _lineal(b):
            return True  # positive-length b inside a always meets a's interior
        # point b: must avoid a's boundary (the two global endpoints)
        ends = _line_endpoints(a)
        pb = b.parts[0]
        on_end = (pb[:, None, 0] == ends[None, :, 0]) & (
            pb[:, None, 1] == ends[None, :, 1]
        )
        return not bool(on_end.any())
    return True  # point covers point: interiors (the points) intersect


def within(a: Geometry, b: Geometry) -> bool:
    return contains(b, a)


def covered_by(a: Geometry, b: Geometry) -> bool:
    return covers(b, a)


def equals(a: Geometry, b: Geometry) -> bool:
    """Topological equality: mutual covers (JTS equalsTopo)."""
    return covers(a, b) and covers(b, a)


def _proper_crossing_any(a: Geometry, b: Geometry) -> bool:
    """Any strictly-proper segment crossing between chains of a and b
    (d-products strictly negative on both sides ⇒ an interior point of
    both edges, hence interior overlap for areal operands)."""
    for ca in _chains(a):
        for cb in _chains(b):
            a1, a2 = ca[:-1], ca[1:]
            b1, b2 = cb[:-1], cb[1:]
            ax1, ay1 = a1[:, 0][:, None], a1[:, 1][:, None]
            ax2, ay2 = a2[:, 0][:, None], a2[:, 1][:, None]
            bx1, by1 = b1[:, 0][None, :], b1[:, 1][None, :]
            bx2, by2 = b2[:, 0][None, :], b2[:, 1][None, :]
            d1 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
            d2 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
            d3 = _orient(bx1, by1, bx2, by2, ax1, ay1)
            d4 = _orient(bx1, by1, bx2, by2, ax2, ay2)
            if bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any()):
                return True
    return False


def _interior_sample_hit(a: Geometry, b: Geometry) -> bool:
    """Some sample point of b lies strictly inside areal a."""
    pts = _sample_points_of(b, a)
    return bool(
        points_in_polygon(pts[:, 0], pts[:, 1], a, include_boundary=False).any()
    )


def _collinear_overlap_any(ca: np.ndarray, cb: np.ndarray) -> bool:
    """Positive-length collinear overlap between any segment pair of two
    chains (a 1-dimensional line∩line intersection)."""
    for i in range(len(ca) - 1):
        p, q = ca[i], ca[i + 1]
        d = q - p
        for j in range(len(cb) - 1):
            r, s = cb[j], cb[j + 1]
            if _orient(p[0], p[1], q[0], q[1], r[0], r[1]) != 0:
                continue
            if _orient(p[0], p[1], q[0], q[1], s[0], s[1]) != 0:
                continue
            # collinear: project on the dominant axis of d
            ax = 0 if abs(d[0]) >= abs(d[1]) else 1
            lo_a, hi_a = sorted((p[ax], q[ax]))
            lo_b, hi_b = sorted((r[ax], s[ax]))
            if min(hi_a, hi_b) > max(lo_a, lo_b):
                return True
    return False


def touches(a: Geometry, b: Geometry) -> bool:
    """JTS touches: a and b intersect but their interiors do not."""
    if not intersects(a, b):
        return False
    if _pointal(a):
        xs, ys = a.parts[0][:, 0], a.parts[0][:, 1]
        if _areal(b):
            inside = points_in_polygon(xs, ys, b, include_boundary=False)
            return not bool(inside.any())
        if _lineal(b):
            # point interiors are the points; must sit on b's boundary
            # (endpoints) only
            ends = _line_endpoints(b)
            on_end = (xs[:, None] == ends[None, :, 0]) & (ys[:, None] == ends[None, :, 1])
            on_b = _on_chains(xs, ys, b)
            return bool((~on_b | on_end.any(axis=1)).all()) and bool(on_b.any())
        return False  # point/point contact is interior-interior
    if _pointal(b):
        return touches(b, a)
    if _areal(a) and _areal(b):
        # coincident boundaries (b ≡ a, or b covered with all contact on
        # the shared boundary) have intersecting interiors despite no
        # strictly-inside boundary sample — covers screens those out
        return (
            not _proper_crossing_any(a, b)
            and not _interior_sample_hit(a, b)
            and not _interior_sample_hit(b, a)
            and not covers(a, b)
            and not covers(b, a)
        )
    if _areal(a) and _lineal(b):
        return not _interior_sample_hit(a, b)
    if _lineal(a) and _areal(b):
        return not _interior_sample_hit(b, a)
    # line × line: interiors disjoint ⟺ no 1-dim overlap and every
    # contact point is a global endpoint of a or of b
    ca, cb = a.parts[0], b.parts[0]
    if _collinear_overlap_any(ca, cb):
        return False
    if _proper_crossing_any(a, b):
        # proper crossing could still be at a global endpoint only if
        # that endpoint were interior to both edges — impossible for
        # the strictly-proper test unless chains self-pass; treat as
        # interior contact
        return False
    return not _any_nonendpoint_contact(a, b)


def _any_nonendpoint_contact(a: Geometry, b: Geometry) -> bool:
    """Line×line: some contact point interior to BOTH linestrings
    (i.e. not a global endpoint of either)."""
    ca, cb = a.parts[0], b.parts[0]
    ends_a = _line_endpoints(a)
    ends_b = _line_endpoints(b)
    for i in range(len(ca) - 1):
        p, q = ca[i], ca[i + 1]
        for j in range(len(cb) - 1):
            r, s = cb[j], cb[j + 1]
            pt = _seg_contact_point(p, q, r, s)
            if pt is None:
                continue
            is_end = any(
                pt[0] == e[0] and pt[1] == e[1] for e in (*ends_a, *ends_b)
            )
            if not is_end:
                return True
    return False


def _seg_contact_point(p, q, r, s):
    """A representative intersection point of segments pq and rs, or
    None (collinear overlaps return an overlap point)."""
    d = q - p
    e = s - r
    denom = d[0] * e[1] - d[1] * e[0]
    if denom != 0:
        t = ((r[0] - p[0]) * e[1] - (r[1] - p[1]) * e[0]) / denom
        u = ((r[0] - p[0]) * d[1] - (r[1] - p[1]) * d[0]) / denom
        if 0 <= t <= 1 and 0 <= u <= 1:
            return p + t * d
        return None
    # parallel: check collinear with bbox overlap
    if _orient(p[0], p[1], q[0], q[1], r[0], r[1]) != 0:
        return None
    ax = 0 if abs(d[0]) >= abs(d[1]) else 1
    lo_a, hi_a = sorted((p[ax], q[ax]))
    lo_b, hi_b = sorted((r[ax], s[ax]))
    lo, hi = max(lo_a, lo_b), min(hi_a, hi_b)
    if lo > hi:
        return None
    cand = [r, s, p, q]
    for c in cand:
        if lo <= c[ax] <= hi:
            return c
    return None


def crosses(a: Geometry, b: Geometry) -> bool:
    """JTS crosses: interiors intersect and the intersection has lower
    dimension than the higher-dimensional operand (lineal×areal: the
    line passes through the interior AND the exterior; line×line:
    0-dimensional interior contact)."""
    if a.gtype == "LineString" and _areal(b):
        pts = _sample_points_of(a, b)
        inside = points_in_polygon(pts[:, 0], pts[:, 1], b, include_boundary=False)
        on_b = _on_chains(pts[:, 0], pts[:, 1], b)
        outside = ~inside & ~on_b
        return bool(inside.any()) and bool(outside.any())
    if b.gtype == "LineString" and _areal(a):
        return crosses(b, a)
    if a.gtype == "LineString" and b.gtype == "LineString":
        if _collinear_overlap_any(a.parts[0], b.parts[0]):
            return False  # 1-dim intersection ⇒ overlaps/contains, not crosses
        return _any_nonendpoint_contact(a, b)
    if _pointal(a) and not _pointal(b):
        # multipoint × line/area: some point interior, some point outside
        xs, ys = a.parts[0][:, 0], a.parts[0][:, 1]
        if _areal(b):
            inside = points_in_polygon(xs, ys, b, include_boundary=False)
            on_b = _on_chains(xs, ys, b)
            return bool(inside.any()) and bool((~inside & ~on_b).any())
        on_b = _on_chains(xs, ys, b)
        return bool(on_b.any()) and bool((~on_b).any()) and len(xs) > 1
    if _pointal(b) and not _pointal(a):
        return crosses(b, a)
    return False


def overlaps(a: Geometry, b: Geometry) -> bool:
    """JTS overlaps: same-dimension operands whose interiors intersect,
    the intersection has that same dimension, and neither covers the
    other."""
    if _areal(a) and _areal(b):
        if covers(a, b) or covers(b, a) or not intersects(a, b):
            return False
        return (
            _proper_crossing_any(a, b)
            or _interior_sample_hit(a, b)
            or _interior_sample_hit(b, a)
        )
    if _lineal(a) and _lineal(b):
        if covers(a, b) or covers(b, a):
            return False
        return _collinear_overlap_any(a.parts[0], b.parts[0])
    if _pointal(a) and _pointal(b):
        pa, pb = a.parts[0], b.parts[0]
        eq = (pa[:, None, 0] == pb[None, :, 0]) & (pa[:, None, 1] == pb[None, :, 1])
        shared = eq.any(axis=1)
        return (
            bool(shared.any())
            and not bool(shared.all())
            and not bool(eq.any(axis=0).all())
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
    analytics/spark/.../udf/GeomDistance.java — JTS planar distance).

    Chain-ness is decided by GTYPE, not part length: a MultiPoint part
    is an (N, 2) array of N independent points, and treating it as a
    polyline would measure distance to phantom segments between its
    members (JTS measures to the points themselves)."""
    if intersects(a, b):
        return 0.0
    a_chain = a.gtype not in ("Point", "MultiPoint")
    b_chain = b.gtype not in ("Point", "MultiPoint")
    best = np.inf
    for pa in a.parts:
        for pb in b.parts:
            pb_segs = b_chain and len(pb) > 1
            pa_segs = a_chain and len(pa) > 1
            if pb_segs:
                d2 = _point_seg_dist2(
                    pa[:, 0], pa[:, 1], pb[:-1, 0], pb[:-1, 1], pb[1:, 0], pb[1:, 1]
                )
                best = min(best, float(d2.min()))
            if pa_segs:
                d2 = _point_seg_dist2(
                    pb[:, 0], pb[:, 1], pa[:-1, 0], pa[:-1, 1], pa[1:, 0], pa[1:, 1]
                )
                best = min(best, float(d2.min()))
            if not pa_segs and not pb_segs:
                # both sides pointal here: all-pairs point distance
                d2 = (pa[:, None, 0] - pb[None, :, 0]) ** 2 + (
                    pa[:, None, 1] - pb[None, :, 1]
                ) ** 2
                best = min(best, float(d2.min()))
    return float(np.sqrt(best))


def dwithin(a: Geometry, b: Geometry, r: float) -> bool:
    """GeomWithinDistance semantics (udf/GeomWithinDistance.java:13-45)."""
    return distance(a, b) <= r


# ----------------------------------------- vectorized point-batch kernels
# One geometry × many points, evaluated as numpy array ops — the fast
# path the Geom* SQL UDFs take when one join side is points (the common
# shape: an exploded/broadcast geometry against a point table). These
# replace a per-row Python loop with O(#chains) numpy passes per batch.


def points_on_boundary(xs, ys, g: Geometry) -> np.ndarray:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return _on_chains(xs, ys, g)


def points_pred_batch(pred: str, g: Geometry, xs, ys) -> np.ndarray:
    """Evaluate ``pred(g, point_i)`` for a batch of points — vectorized.
    ``pred`` names the first argument's role: e.g. 'contains' means
    "g contains point", 'within' means "point within g"."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if _areal(g):
        if pred in ("intersects", "covers", "covered_by"):
            return points_in_polygon(xs, ys, g, include_boundary=True)
        if pred == "disjoint":
            return ~points_in_polygon(xs, ys, g, include_boundary=True)
        if pred in ("contains", "within"):
            return points_in_polygon(xs, ys, g, include_boundary=False)
        if pred == "touches":
            return points_on_boundary(xs, ys, g)
        if pred in ("crosses", "overlaps", "equals"):
            return np.zeros(len(xs), dtype=bool)
    if _lineal(g):
        on = points_on_boundary(xs, ys, g)
        if pred in ("intersects", "covers", "covered_by"):
            return on
        if pred == "disjoint":
            return ~on
        if pred in ("contains", "within"):
            ends = _line_endpoints(g)
            at_end = ((xs[:, None] == ends[None, :, 0]) & (ys[:, None] == ends[None, :, 1])).any(axis=1)
            return on & ~at_end
        if pred == "touches":
            ends = _line_endpoints(g)
            at_end = ((xs[:, None] == ends[None, :, 0]) & (ys[:, None] == ends[None, :, 1])).any(axis=1)
            return on & at_end
        if pred in ("crosses", "overlaps", "equals"):
            return np.zeros(len(xs), dtype=bool)
    if _pointal(g):
        pa = g.parts[0]
        same = ((xs[:, None] == pa[None, :, 0]) & (ys[:, None] == pa[None, :, 1])).any(axis=1)
        if pred in ("intersects", "covers", "covered_by", "contains", "within", "equals"):
            if pred == "equals" and len(pa) != 1:
                return np.zeros(len(xs), dtype=bool)
            if pred in ("covers", "contains") and len(pa) != 1:
                return same  # any member point matches
            return same
        if pred == "disjoint":
            return ~same
        return np.zeros(len(xs), dtype=bool)
    raise ValueError(pred)


def _clip_axis(p, d, lo, hi, t_lo, t_hi):
    """Liang-Barsky slab clip (closed interval) for one axis."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (lo - p) / d
        t2 = (hi - p) / d
    tmin = np.minimum(t1, t2)
    tmax = np.maximum(t1, t2)
    zero = d == 0
    inside0 = (p >= lo) & (p <= hi)
    t_lo_new = np.where(zero, np.where(inside0, t_lo, 1.0), np.maximum(t_lo, tmin))
    t_hi_new = np.where(zero, np.where(inside0, t_hi, 0.0), np.minimum(t_hi, tmax))
    return t_lo_new, t_hi_new


def line_box_relate(chain: np.ndarray, bounds) -> tuple[bool, bool, bool, bool]:
    """(intersects, interior_hit, outside_part, covered) of a polyline
    vs an axis-aligned box — one vectorized Liang-Barsky pass over all
    segments (the line×rectangle fast path of the join refinement).
    interior_hit uses the clipped-piece midpoint: a piece through the
    open box has a strictly-interior midpoint, a piece lying on the
    boundary does not."""
    x0, y0, x1, y1 = bounds
    p, q = chain[:-1], chain[1:]
    d = q - p
    t_lo = np.zeros(len(p))
    t_hi = np.ones(len(p))
    t_lo, t_hi = _clip_axis(p[:, 0], d[:, 0], x0, x1, t_lo, t_hi)
    t_lo, t_hi = _clip_axis(p[:, 1], d[:, 1], y0, y1, t_lo, t_hi)
    hit = t_lo <= t_hi
    tm = (t_lo + t_hi) / 2
    mx = p[:, 0] + tm * d[:, 0]
    my = p[:, 1] + tm * d[:, 1]
    interior = bool((hit & (mx > x0) & (mx < x1) & (my > y0) & (my < y1)).any())
    outside = bool(
        (
            (chain[:, 0] < x0)
            | (chain[:, 0] > x1)
            | (chain[:, 1] < y0)
            | (chain[:, 1] > y1)
        ).any()
    )
    return bool(hit.any()), interior, outside, not outside


def lines_box_relate_bulk(chains: list, bounds):
    """Vectorized line_box_relate over MANY polylines at once: one
    Liang-Barsky pass over the concatenation of every chain's segments,
    then a bincount reduction per line. Returns four bool arrays
    (intersects, interior_hit, outside_part, covered), one entry per
    chain — the bulk kernel behind box×lines join refinement groups."""
    x0, y0, x1, y1 = bounds
    n = len(chains)
    segs_per = np.array([len(c) - 1 for c in chains])
    p = np.concatenate([c[:-1] for c in chains])
    q = np.concatenate([c[1:] for c in chains])
    seg_line = np.repeat(np.arange(n), segs_per)
    d = q - p
    t_lo = np.zeros(len(p))
    t_hi = np.ones(len(p))
    t_lo, t_hi = _clip_axis(p[:, 0], d[:, 0], x0, x1, t_lo, t_hi)
    t_lo, t_hi = _clip_axis(p[:, 1], d[:, 1], y0, y1, t_lo, t_hi)
    hit = t_lo <= t_hi
    tm = (t_lo + t_hi) / 2
    mx = p[:, 0] + tm * d[:, 0]
    my = p[:, 1] + tm * d[:, 1]
    interior_seg = hit & (mx > x0) & (mx < x1) & (my > y0) & (my < y1)
    verts = np.concatenate(chains)
    vert_line = np.repeat(np.arange(n), [len(c) for c in chains])
    out_vert = (
        (verts[:, 0] < x0) | (verts[:, 0] > x1) | (verts[:, 1] < y0) | (verts[:, 1] > y1)
    )
    inter = np.bincount(seg_line, weights=hit, minlength=n) > 0
    interior = np.bincount(seg_line, weights=interior_seg, minlength=n) > 0
    outside = np.bincount(vert_line, weights=out_vert, minlength=n) > 0
    return inter, interior, outside, ~outside


def line_boxes_relate_bulk(chain: np.ndarray, bounds_arr: np.ndarray):
    """One polyline × MANY boxes: Liang-Barsky over the (segments ×
    boxes) grid. ``bounds_arr`` is (B, 4) [x0, y0, x1, y1]; returns
    per-box (intersects, interior_hit, outside_part, covered)."""
    x0 = bounds_arr[:, 0][None, :]
    y0 = bounds_arr[:, 1][None, :]
    x1 = bounds_arr[:, 2][None, :]
    y1 = bounds_arr[:, 3][None, :]
    p, q = chain[:-1], chain[1:]
    d = q - p
    px, py = p[:, 0][:, None], p[:, 1][:, None]
    dx, dy = d[:, 0][:, None], d[:, 1][:, None]
    t_lo = np.zeros((len(p), bounds_arr.shape[0]))
    t_hi = np.ones_like(t_lo)
    for pv, dv, lo, hi in ((px, dx, x0, x1), (py, dy, y0, y1)):
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - pv) / dv
            t2 = (hi - pv) / dv
        tmin = np.minimum(t1, t2)
        tmax = np.maximum(t1, t2)
        zero = np.broadcast_to(dv == 0, t_lo.shape)
        inside0 = (pv >= lo) & (pv <= hi)
        t_lo = np.where(zero, np.where(inside0, t_lo, 1.0), np.maximum(t_lo, tmin))
        t_hi = np.where(zero, np.where(inside0, t_hi, 0.0), np.minimum(t_hi, tmax))
    hit = t_lo <= t_hi
    tm = (t_lo + t_hi) / 2
    mx = px + tm * dx
    my = py + tm * dy
    interior = hit & (mx > x0) & (mx < x1) & (my > y0) & (my < y1)
    vx, vy = chain[:, 0][:, None], chain[:, 1][:, None]
    out_vert = (vx < x0) | (vx > x1) | (vy < y0) | (vy > y1)
    inter_b = hit.any(axis=0)
    interior_b = interior.any(axis=0)
    outside_b = out_vert.any(axis=0)
    return inter_b, interior_b, outside_b, ~outside_b


def points_distance_to_geom(xs, ys, g: Geometry) -> np.ndarray:
    """Planar distance from a batch of points to one geometry —
    vectorized over the (points × segments) grid; 0 inside areal g."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    best = np.full(len(xs), np.inf)
    g_chain = g.gtype not in ("Point", "MultiPoint")  # see distance()
    for part in g.parts:
        if g_chain and len(part) > 1:
            d2 = _point_seg_dist2(
                xs, ys, part[:-1, 0], part[:-1, 1], part[1:, 0], part[1:, 1]
            )
            best = np.minimum(best, d2.min(axis=1))
        else:
            # pointal part: min distance to its member points
            d2 = (xs[:, None] - part[None, :, 0]) ** 2 + (
                ys[:, None] - part[None, :, 1]
            ) ** 2
            best = np.minimum(best, d2.min(axis=1))
    out = np.sqrt(best)
    if _areal(g):
        out[points_in_polygon(xs, ys, g)] = 0.0
    return out


PREDICATES = {
    "intersects": intersects,
    "disjoint": disjoint,
    "contains": contains,
    "covers": covers,
    "within": within,
    "covered_by": covered_by,
    "touches": touches,
    "crosses": crosses,
    "overlaps": overlaps,
    "equals": equals,
}
