"""Spark SQL geometry function registry.

Parity with the reference's UDF surface
(analytics/spark/.../udf/UDFRegistrySPI.java:14-27 /
GeomFunctionRegistry.java): GeomContains, GeomCovers, GeomCrosses,
GeomDisjoint, GeomEquals, GeomIntersects, GeomOverlaps, GeomTouches,
GeomWithin, GeomWithinDistance, GeomDistance, GeomFromWKT — each an
Arrow-batched pandas UDF over WKB binary columns (the reference's are
row-at-a-time JTS UDF2s).

Execution shape per Arrow batch — NO per-row Python statement in the
common case:

1. each distinct WKB value is parsed ONCE per batch through a
   worker-lifetime cache (repeated geometries — broadcast literals,
   join-duplicated build rows — parse zero times after warmup);
2. rows are grouped by the side with fewer distinct geometries; when
   the varying side of a group is all WKB points (the dominant shape:
   a geometry column probed by a point table), the whole group is
   evaluated as ONE vectorized numpy kernel
   (predicates.points_pred_batch / points_distance_to_geom) —
   coordinates are lifted out of the WKB buffers with a single
   frombuffer, no loop;
3. only genuinely general geometry×geometry pairs fall back to the
   per-pair exact predicates, still with cached parsing.

Keep these out of hot paths when a native expression exists (bbox
refinement, point-in-polygon over coordinate columns) — they are the
general-geometry surface.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, BinaryType

from geowave_spark.geom import predicates as P
from geowave_spark.geom.predicates import (
    points_distance_to_geom,
    points_pred_batch,
)
from geowave_spark.geom.wkb import (
    Geometry,
    linestring,
    point,
    polygon,
    wkb_dumps,
    wkb_loads,
)

# ------------------------------------------------------------ parse cache

_GEOM_CACHE: dict[bytes, Geometry] = {}
_GEOM_CACHE_CAP = 4096


def parse_cached(b: bytes) -> Geometry:
    """Worker-lifetime WKB→Geometry cache — the per-batch analog of the
    reference's 500-entry decomposition LRU (HilbertSFC.java:97-100)."""
    g = _GEOM_CACHE.get(b)
    if g is None:
        if len(_GEOM_CACHE) >= _GEOM_CACHE_CAP:
            _GEOM_CACHE.clear()
        g = wkb_loads(b)
        _GEOM_CACHE[b] = g
    return g


_POINT_HEADER = b"\x01\x01\x00\x00\x00"


def _extract_point_arrays(vals: np.ndarray, idx: np.ndarray):
    """If every WKB at ``idx`` is a 2D point, return (xs, ys) float64
    arrays decoded with one frombuffer over the concatenated buffers;
    else None."""
    bufs = []
    for i in idx:
        b = vals[i]
        if b is None or len(b) != 21 or bytes(b[:5]) != _POINT_HEADER:
            return None
        bufs.append(bytes(b[5:]))
    flat = np.frombuffer(b"".join(bufs), dtype="<f8")
    return flat[0::2].copy(), flat[1::2].copy()


def _as_box_bounds(g: Geometry):
    """(x0, y0, x1, y1) if g is an axis-aligned rectangle, else None."""
    if g.gtype != "Polygon" or len(g.parts) != 1:
        return None
    ring = g.parts[0]
    if len(ring) != 5 or not np.array_equal(ring[0], ring[4]):
        return None
    x, y = ring[:4, 0], ring[:4, 1]
    ok_h = y[0] == y[1] and x[1] == x[2] and y[2] == y[3] and x[3] == x[0]
    ok_v = x[0] == x[1] and y[1] == y[2] and x[2] == x[3] and y[3] == y[0]
    if not (ok_h or ok_v):
        return None
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())


def _extract_box_arrays(vals: np.ndarray, idx: np.ndarray):
    """If every WKB at ``idx`` is an axis-aligned rectangle (the 93-byte
    5-point single-ring polygon layout), return (x0, y0, x1, y1)
    bounds arrays; else None."""
    hdr = b"\x01\x03\x00\x00\x00\x01\x00\x00\x00\x05\x00\x00\x00"
    bufs = []
    for i in idx:
        b = vals[i]
        if b is None or len(b) != 93 or bytes(b[:13]) != hdr:
            return None
        bufs.append(bytes(b[13:]))
    pts = np.frombuffer(b"".join(bufs), dtype="<f8").reshape(-1, 5, 2)
    x, y = pts[:, :4, 0], pts[:, :4, 1]
    ok_h = (y[:, 0] == y[:, 1]) & (x[:, 1] == x[:, 2]) & (y[:, 2] == y[:, 3]) & (x[:, 3] == x[:, 0])
    ok_v = (x[:, 0] == x[:, 1]) & (y[:, 1] == y[:, 2]) & (x[:, 2] == x[:, 3]) & (y[:, 3] == y[:, 0])
    if not bool((ok_h | ok_v).all()):
        return None
    if not bool((pts[:, 0] == pts[:, 4]).all()):
        return None
    return x.min(axis=1), y.min(axis=1), x.max(axis=1), y.max(axis=1)


def _box_group_eval(name, gb, ax0, ay0, ax1, ay1, point_first) -> np.ndarray:
    """pred(box_i, g) / pred(g, box_i) for axis-aligned rectangles —
    pure bounds arithmetic (non-degenerate boxes: areal contains ≡
    covers)."""
    bx0, by0, bx1, by1 = gb
    inter = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
    openov = (ax0 < bx1) & (bx0 < ax1) & (ay0 < by1) & (by0 < ay1)
    a_cov_b = (ax0 <= bx0) & (ax1 >= bx1) & (ay0 <= by0) & (ay1 >= by1)
    b_cov_a = (bx0 <= ax0) & (bx1 >= ax1) & (by0 <= ay0) & (by1 >= ay1)
    if name == "intersects":
        return inter
    if name == "disjoint":
        return ~inter
    if name == "touches":
        return inter & ~openov
    if name == "equals":
        return (ax0 == bx0) & (ax1 == bx1) & (ay0 == by0) & (ay1 == by1)
    if name == "overlaps":
        return openov & ~a_cov_b & ~b_cov_a
    if name == "crosses":
        return np.zeros(len(ax0), dtype=bool)
    first_cov = a_cov_b if point_first else b_cov_a
    second_cov = b_cov_a if point_first else a_cov_b
    if name in ("contains", "covers"):
        return first_cov
    if name in ("within", "covered_by"):
        return second_cov
    raise ValueError(name)


def _line_box_eval(name: str, chain: np.ndarray, gb, line_first: bool) -> bool:
    """pred(line, box) / pred(box, line) via the vectorized
    Liang-Barsky relate — per pair, but one numpy pass over all
    segments instead of the generic sampling machinery."""
    from geowave_spark.geom.predicates import line_box_relate

    inter, interior, outside, covered = line_box_relate(chain, gb)
    if name == "intersects":
        return inter
    if name == "disjoint":
        return not inter
    if name == "crosses":
        return interior and outside
    if name == "touches":
        return inter and not interior
    if name in ("overlaps", "equals"):
        return False  # dimension mismatch
    box_covers_line = covered
    box_contains_line = covered and interior
    if line_first:
        if name == "within":
            return box_contains_line
        if name == "covered_by":
            return box_covers_line
        if name in ("contains", "covers"):
            return False  # 1-dim cannot contain 2-dim
    else:
        if name == "contains":
            return box_contains_line
        if name == "covers":
            return box_covers_line
        if name in ("within", "covered_by"):
            return False
    raise ValueError(name)


def _line_box_eval_arrays(name, inter, interior, outside, covered, line_first):
    """Array form of _line_box_eval over per-line relate vectors."""
    if name == "intersects":
        return inter
    if name == "disjoint":
        return ~inter
    if name == "crosses":
        return interior & outside
    if name == "touches":
        return inter & ~interior
    if name in ("overlaps", "equals"):
        return np.zeros(len(inter), dtype=bool)
    box_covers = covered
    box_contains = covered & interior
    if line_first:
        if name == "within":
            return box_contains
        if name == "covered_by":
            return box_covers
        if name in ("contains", "covers"):
            return np.zeros(len(inter), dtype=bool)
    else:
        if name == "contains":
            return box_contains
        if name == "covers":
            return box_covers
        if name in ("within", "covered_by"):
            return np.zeros(len(inter), dtype=bool)
    raise ValueError(name)


def eval_one_to_many(
    name: str,
    fn,
    g: Geometry,
    geoms: list[Geometry],
    many_first: bool,
    distance_u: float | None = None,
) -> np.ndarray:
    """pred(m_i, g) (many_first) / pred(g, m_i) for a list of parsed
    geometries — bulk kernels when shapes allow (all-lines × box via
    one Liang-Barsky pass, all-boxes × box via bounds arithmetic),
    per-geometry exact predicates otherwise. The join refinement calls
    this once per UNIQUE (geometry, g) pair and gathers."""
    from geowave_spark.geom.predicates import (
        line_boxes_relate_bulk,
        lines_box_relate_bulk,
    )

    if distance_u is not None:
        return np.array([P.distance(m, g) <= distance_u for m in geoms], dtype=bool)
    gb = _as_box_bounds(g)
    if gb is not None and geoms:
        if all(m.gtype == "LineString" for m in geoms):
            rel = lines_box_relate_bulk([m.parts[0] for m in geoms], gb)
            return _line_box_eval_arrays(name, *rel, many_first)
        bb = [_as_box_bounds(m) for m in geoms]
        if all(b is not None for b in bb):
            arr = np.asarray(bb, dtype=np.float64)
            return _box_group_eval(
                name, gb, arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], many_first
            )
    if gb is None and g.gtype == "LineString" and geoms:
        bb = [_as_box_bounds(m) for m in geoms]
        if all(b is not None for b in bb):
            # reversed orientation: one line (the group key) × many
            # boxes — the line is the first predicate argument exactly
            # when the boxes are NOT
            rel = line_boxes_relate_bulk(g.parts[0], np.asarray(bb, dtype=np.float64))
            return _line_box_eval_arrays(name, *rel, not many_first)
    out = np.empty(len(geoms), dtype=bool)
    for i, m in enumerate(geoms):
        out[i] = fn(m, g) if many_first else fn(g, m)
    return out


_SYMMETRIC = {"intersects", "disjoint", "touches", "equals"}


def _point_group_eval(
    name: str, g: Geometry, xs: np.ndarray, ys: np.ndarray, point_first: bool
) -> np.ndarray:
    """pred(point_i, g) if point_first else pred(g, point_i), vectorized."""
    if name in _SYMMETRIC:
        return points_pred_batch(name, g, xs, ys)
    if name in ("crosses", "overlaps"):
        # a single point can neither cross nor overlap anything
        return np.zeros(len(xs), dtype=bool)
    if point_first:
        if name == "within":
            return points_pred_batch("within", g, xs, ys)
        if name == "covered_by":
            return points_pred_batch("covered_by", g, xs, ys)
        if name in ("contains", "covers"):
            if g.gtype == "Point":
                return points_pred_batch("equals", g, xs, ys)
            return np.zeros(len(xs), dtype=bool)
    else:
        if name == "contains":
            return points_pred_batch("contains", g, xs, ys)
        if name == "covers":
            return points_pred_batch("covers", g, xs, ys)
        if name in ("within", "covered_by"):
            if g.gtype == "Point":
                return points_pred_batch("equals", g, xs, ys)
            return np.zeros(len(xs), dtype=bool)
    raise ValueError(name)


def _null_mask(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Rows where either WKB input is NULL — excluded from every group
    (SQL semantics: the result is NULL, applied by the caller). Without
    the mask a grouped-side null silently kept the output initializer
    (GeomDistance(a, NULL) = 0.0!) and a varying-side null crashed the
    task on bytes(None)."""
    return pd.isnull(a.to_numpy()) | pd.isnull(b.to_numpy())


def _apply_null_mask(out: np.ndarray, mask: np.ndarray) -> pd.Series:
    res = pd.Series(out)
    if mask.any():
        res = res.astype(object)
        res[mask] = None
    return res


def _grouped(a: pd.Series, b: pd.Series):
    """Yield (g, idx, varying_vals, point_first) groups, grouping on the
    side with fewer distinct WKB values. Rows with a NULL on either
    side are never yielded (factorize drops grouped-side nulls; the
    varying side is filtered explicitly) — callers overlay _null_mask."""
    av, bv = a.to_numpy(), b.to_numpy()
    codes_a, uniq_a = pd.factorize(a)
    codes_b, uniq_b = pd.factorize(b)
    if len(uniq_b) <= len(uniq_a):
        codes, uniq, varying, point_first = codes_b, uniq_b, av, True
    else:
        codes, uniq, varying, point_first = codes_a, uniq_a, bv, False
    order = np.argsort(codes, kind="stable")
    bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
    for u_i in range(len(uniq)):
        idx = order[bounds[u_i] : bounds[u_i + 1]]
        if len(idx):
            idx = idx[~pd.isnull(varying[idx])]
        if not len(idx):
            continue
        yield parse_cached(bytes(uniq[u_i])), idx, varying, point_first


def pair_pred_batch(name: str, fn) -> "pd.Series":
    """Vectorized pairwise predicate over two WKB Series."""

    def run(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.zeros(len(a), dtype=bool)
        for g, idx, varying, point_first in _grouped(a, b):
            pts = _extract_point_arrays(varying, idx)
            if pts is not None:
                out[idx] = _point_group_eval(name, g, pts[0], pts[1], point_first)
                continue
            gb = _as_box_bounds(g)
            if gb is not None:
                boxes = _extract_box_arrays(varying, idx)
                if boxes is not None:
                    out[idx] = _box_group_eval(name, gb, *boxes, point_first)
                    continue
            for i in idx:
                other = parse_cached(bytes(varying[i]))
                if gb is not None and other.gtype == "LineString":
                    out[i] = _line_box_eval(name, other.parts[0], gb, point_first)
                else:
                    out[i] = fn(other, g) if point_first else fn(g, other)
        return _apply_null_mask(out, _null_mask(a, b))

    return run


def geom_from_wkt(wkt: str) -> bytes:
    """Tiny WKT reader (POINT / LINESTRING / POLYGON, no holes-in-text) —
    GeomFromWKT analog (udf/GeomFromWKT.java)."""
    s = wkt.strip()
    up = s.upper()

    def coords(body: str):
        return [[float(v) for v in pt.split()] for pt in body.split(",")]

    if up.startswith("POINT"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        x, y = (float(v) for v in body.split())
        return wkb_dumps(point(x, y))
    if up.startswith("LINESTRING"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return wkb_dumps(linestring(coords(body)))
    if up.startswith("POLYGON"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        rings = []
        depth = 0
        cur = ""
        for ch in inner:
            if ch == "(":
                depth += 1
                cur = ""
            elif ch == ")":
                depth -= 1
                rings.append(coords(cur))
            elif depth > 0:
                cur += ch
        return wkb_dumps(polygon(rings[0], holes=rings[1:]))
    raise ValueError(f"unsupported WKT: {wkt[:40]}")


def register_geom_functions(spark: SparkSession) -> None:
    """Register the Geom* SQL functions on a session."""
    for name, key, fn in [
        ("GeomIntersects", "intersects", P.intersects),
        ("GeomDisjoint", "disjoint", P.disjoint),
        ("GeomContains", "contains", P.contains),
        ("GeomCovers", "covers", P.covers),  # JTS: boundary-inclusive
        ("GeomWithin", "within", P.within),
        ("GeomTouches", "touches", P.touches),
        ("GeomCrosses", "crosses", P.crosses),
        ("GeomOverlaps", "overlaps", P.overlaps),
        ("GeomEquals", "equals", P.equals),
    ]:
        spark.udf.register(name, F.pandas_udf(pair_pred_batch(key, fn), BooleanType()))

    def dist(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.zeros(len(a), dtype=np.float64)
        for g, idx, varying, _pf in _grouped(a, b):
            pts = _extract_point_arrays(varying, idx)
            if pts is not None:
                out[idx] = points_distance_to_geom(pts[0], pts[1], g)
            else:
                for i in idx:
                    out[i] = P.distance(parse_cached(bytes(varying[i])), g)
        return _apply_null_mask(out, _null_mask(a, b))

    spark.udf.register("GeomDistance", F.pandas_udf(dist, DoubleType()))

    def within_distance(a: pd.Series, b: pd.Series, r: pd.Series) -> pd.Series:
        rv = r.to_numpy(dtype=np.float64)
        out = np.zeros(len(a), dtype=bool)
        for g, idx, varying, _pf in _grouped(a, b):
            pts = _extract_point_arrays(varying, idx)
            if pts is not None:
                out[idx] = points_distance_to_geom(pts[0], pts[1], g) <= rv[idx]
            else:
                for i in idx:
                    out[i] = (
                        P.distance(parse_cached(bytes(varying[i])), g) <= rv[i]
                    )
        return _apply_null_mask(out, _null_mask(a, b))

    spark.udf.register("GeomWithinDistance", F.pandas_udf(within_distance, BooleanType()))

    def from_wkt(w: pd.Series) -> pd.Series:
        return pd.Series([geom_from_wkt(s) for s in w])

    spark.udf.register("GeomFromWKT", F.pandas_udf(from_wkt, BinaryType()))
