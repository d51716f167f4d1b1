"""Property pins for the geodesic ring math (operators/geodesic.py) —
pure float/int functions, no Spark.

The load-bearing invariant behind knn_geodesic / nn_self_join_geodesic
exactness is RING-ESCAPE SOUNDNESS: every point whose cell lies OUTSIDE
the wrap-aware ring neighborhood of the query's cell is at great-circle
distance >= safe_geo_radius_m(lat_q, ring, res). The ladder stops once
k candidates sit inside that radius, so if this bound ever overshot,
the operator could return a wrong neighbor. The example-based tests
(test_geodesic.py) check it at fixed fixtures; here hypothesis sweeps
random (query, point, res, ring) including the antimeridian and the
poles, where the two escape routes (meridional / latitude-corrected
longitudinal) trade off.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark import LON_OFF_U
from geowave_spark.index.zorder import cell_of_point, morton_decode
from geowave_spark.operators.geodesic import (
    EARTH_R_M,
    kring_wrap,
    safe_geo_radius_m,
)

lon_u = st.integers(-LON_OFF_U, LON_OFF_U)
lat_u = st.integers(-90_000_000, 90_000_000)  # valid latitudes only


def _haversine_m(qx: int, qy: int, x: int, y: int) -> float:
    # same closed form as geodesic.haversine_m / haversine_m_sql
    lat1 = math.radians(qy / 1e6)
    lat2 = math.radians(y / 1e6)
    dlat = math.radians((y - qy) / 2e6)
    dlon = math.radians((x - qx) / 2e6)
    a = math.sin(dlat) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin(dlon) ** 2
    return 2.0 * EARTH_R_M * math.asin(min(math.sqrt(a), 1.0))


def _cyc_cheb(cell_a: int, cell_b: int, res: int) -> int:
    gxa, gya = morton_decode(int(cell_a))
    gxb, gyb = morton_decode(int(cell_b))
    n = 1 << res
    dx = abs(int(gxa) - int(gxb))
    dx = min(dx, n - dx)  # longitude is cyclic
    dy = abs(int(gya) - int(gyb))
    return max(dx, dy)


@settings(max_examples=400, deadline=None)
@given(qx=lon_u, qy=lat_u, px=lon_u, py=lat_u,
       res=st.integers(3, 9), ring=st.integers(1, 4))
def test_ring_escape_is_sound(qx, qy, px, py, res, ring):
    """Outside the ring ⇒ provably farther than the safe radius."""
    cq = cell_of_point(qx, qy, res)
    cp = cell_of_point(px, py, res)
    if _cyc_cheb(cq, cp, res) <= ring:
        return  # inside the ring: no claim made
    bound = safe_geo_radius_m(qy / 1e6, ring, res)
    d = _haversine_m(qx, qy, px, py)
    # float slack: both sides are ~1e7 m computed through libm trig
    assert d >= bound - 1e-6 * max(bound, 1.0), (
        f"point outside ring={ring} at res={res} is {d:.3f} m away, "
        f"inside the claimed safe radius {bound:.3f} m"
    )


@settings(max_examples=200, deadline=None)
@given(qx=lon_u, qy=lat_u, px=lon_u, py=lat_u,
       res=st.integers(3, 9), ring=st.integers(1, 4))
def test_kring_wrap_is_complete(qx, qy, px, py, res, ring):
    """Inside the ring (cyclic lon) ⇒ the cell IS in kring_wrap's list —
    candidate completeness, including across the antimeridian."""
    cq = cell_of_point(qx, qy, res)
    cp = cell_of_point(px, py, res)
    if _cyc_cheb(cq, cp, res) > ring:
        return
    assert cp in kring_wrap(cq, res, ring)


@settings(max_examples=200, deadline=None)
@given(lat=st.floats(-90.0, 90.0, allow_nan=False),
       res=st.integers(3, 9), ring=st.integers(1, 4))
def test_safe_radius_bounds(lat, res, ring):
    """Never negative, never exceeds the pure meridional bound (its
    lat-independent cap), and symmetric in latitude sign. NOT asserted:
    monotonicity in ring — min(vertical, horizontal) legitimately
    SHRINKS as rings widen at high latitude (cos(|lat|+d) decays faster
    than sin(d/2) grows); each ring's bound is valid on its own, which
    is what the ladder uses (and what test_ring_escape_is_sound pins)."""
    r1 = safe_geo_radius_m(lat, ring, res)
    assert 0.0 <= r1
    vertical = EARTH_R_M * math.radians(ring * 360.0 / (1 << res))
    assert r1 <= vertical + 1e-9
    assert math.isclose(r1, safe_geo_radius_m(-lat, ring, res), rel_tol=1e-12)
