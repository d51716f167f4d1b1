"""Property pins for the resample kernels (raster/codec.py) — pure
numpy, no Spark.

The retile/pyramid operators lean on three documented kernel
contracts: flat fields are exact under every kernel (the edge-clamped
taps keep each kernel a partition of unity), same-size resampling is
the identity (half-pixel output centers land ON input centers), and
bilinear never leaves the input's value hull (it is a convex
combination; bicubic's Keys kernel has negative lobes and MAY
overshoot, so no hull claim is made for it — the golden tests in
test_tiling.py pin its ramp behavior instead)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from geowave_spark.raster.codec import RESAMPLERS

dims = st.integers(1, 12)


def _img(h, w, dtype):
    if np.issubdtype(np.dtype(dtype), np.integer):
        elems = st.integers(0, 255)
    else:
        elems = st.floats(-1e3, 1e3, allow_nan=False, width=32)
    return hnp.arrays(dtype, (h, w), elements=elems)


@settings(max_examples=120, deadline=None)
@given(h=dims, w=dims, oh=dims, ow=dims,
       val=st.integers(0, 255),
       kernel=st.sampled_from(sorted(RESAMPLERS)))
def test_flat_field_is_exact(h, w, oh, ow, val, kernel):
    img = np.full((h, w), val, dtype=np.uint8)
    out = RESAMPLERS[kernel](img, oh, ow)
    assert out.shape[:2] == (oh, ow)
    assert out.dtype == img.dtype
    assert (out == val).all(), f"{kernel} broke a flat field"


@settings(max_examples=80, deadline=None)
@given(data=st.data(), h=dims, w=dims,
       kernel=st.sampled_from(sorted(RESAMPLERS)))
def test_same_size_is_identity(data, h, w, kernel):
    img = data.draw(_img(h, w, np.uint8))
    out = RESAMPLERS[kernel](img, h, w)
    assert (out == img).all(), f"{kernel} not identity at same dims"


@settings(max_examples=80, deadline=None)
@given(data=st.data(), h=dims, w=dims, oh=dims, ow=dims)
def test_bilinear_stays_in_value_hull(data, h, w, oh, ow):
    img = data.draw(_img(h, w, np.float64))
    out = RESAMPLERS["bilinear"](img, oh, ow)
    eps = 1e-9 * max(1.0, float(np.abs(img).max()))
    assert out.min() >= img.min() - eps
    assert out.max() <= img.max() + eps


@settings(max_examples=80, deadline=None)
@given(data=st.data(), h=dims, w=dims, oh=dims, ow=dims)
def test_nearest_emits_only_input_values(data, h, w, oh, ow):
    img = data.draw(_img(h, w, np.uint8))
    out = RESAMPLERS["nearest"](img, oh, ow)
    assert set(np.unique(out)) <= set(np.unique(img))
