"""Vectorized Hilbert curve (numpy), the reference's primary SFC.

Semantics match core/index/src/main/java/org/locationtech/geowave/core/index/sfc/hilbert/HilbertSFC.java
(compact Hilbert via uzaygezen, 2-D): a bijection between (gx, gy) grid
coordinates at ``res`` bits/dim and a distance along the curve.
Implementation is the standard rotate/reflect iteration (public
algorithm, Wikipedia "Hilbert curve"), vectorized so one numpy pass per
bit handles a whole Arrow batch.

The engine's default index is Z-order (cheaper: pure JVM expressions,
parent-cell = shift); Hilbert is provided for locality-sensitive range
scans where fewer, longer ranges matter (range count comparison is
exercised in tests). Both share the same grid model, so query semantics
are identical.
"""

from __future__ import annotations

import numpy as np


def hilbert_encode(gx, gy, res: int):
    """(gx, gy) -> hilbert distance; accepts ints or int64 ndarrays."""
    scalar = not isinstance(gx, np.ndarray)
    x = np.atleast_1d(np.asarray(gx, dtype=np.int64)).copy()
    y = np.atleast_1d(np.asarray(gy, dtype=np.int64)).copy()
    d = np.zeros_like(x)
    n1 = (np.int64(1) << res) - 1
    s = np.int64(1) << (res - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant (reflection over the full domain, per xy2d)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, n1 - x, x)
        y_f = np.where(flip, n1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= 1
    return int(d[0]) if scalar else d


def hilbert_decode(d, res: int):
    """hilbert distance -> (gx, gy)."""
    scalar = not isinstance(d, np.ndarray)
    t = np.atleast_1d(np.asarray(d, dtype=np.int64)).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    while s < (np.int64(1) << res):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_r = np.where(swap, y_f, x_f)
        y_r = np.where(swap, x_f, y_f)
        x = x_r + s * rx
        y = y_r + s * ry
        t //= 4
        s <<= 1
    if scalar:
        return int(x[0]), int(y[0])
    return x, y
