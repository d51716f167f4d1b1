import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark.index.hilbert import hilbert_decode, hilbert_encode


def test_known_order_res1():
    # canonical res-1 Hilbert: (0,0)->0 (1,0)->3 (0,1)->1 (1,1)->2
    assert hilbert_encode(0, 0, 1) == 0
    assert hilbert_encode(0, 1, 1) == 1
    assert hilbert_encode(1, 1, 1) == 2
    assert hilbert_encode(1, 0, 1) == 3


def test_adjacency_res4():
    # consecutive curve positions are grid neighbors (the locality property)
    n = 1 << 4
    prev = None
    for d in range(n * n):
        x, y = hilbert_decode(d, 4)
        if prev is not None:
            assert abs(x - prev[0]) + abs(y - prev[1]) == 1
        prev = (x, y)


def test_bijection_res4():
    n = 1 << 4
    seen = set()
    for gx in range(n):
        for gy in range(n):
            seen.add(hilbert_encode(gx, gy, 4))
    assert seen == set(range(n * n))


@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
@settings(max_examples=200)
def test_roundtrip_res16(gx, gy):
    d = hilbert_encode(gx, gy, 16)
    assert hilbert_decode(d, 16) == (gx, gy)


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(3)
    gx = rng.integers(0, 2**12, 500)
    gy = rng.integers(0, 2**12, 500)
    d = hilbert_encode(gx, gy, 12)
    xs, ys = hilbert_decode(d, 12)
    assert np.array_equal(xs, gx)
    assert np.array_equal(ys, gy)
    for i in range(0, 500, 83):
        assert int(d[i]) == hilbert_encode(int(gx[i]), int(gy[i]), 12)
