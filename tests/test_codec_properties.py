"""Property-based tests (hypothesis) for the pure-Python image codecs
and the nearest-neighbor resampler — driver-side, no Spark session.

The example-based tests in test_multimodal_codecs.py pin specific byte
layouts; these sweep the shape/value space: any uint8 raster must
round-trip bit-exactly through encode→decode for both container
formats, and the resampler must obey its pixel-center contract for
arbitrary source/target shapes.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from taxi_trips_etl_spark.dataprep.multimodal import (
    _ensure_hwc,
    _nn_resample,
    decode_image_bytes,
    encode_bmp,
    encode_ppm,
)

dims = st.integers(min_value=1, max_value=23)


def _raster(h: int, w: int, c: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@settings(max_examples=150, deadline=None)
@given(dims, dims, st.sampled_from([1, 3]), st.integers(0, 2**31 - 1))
def test_ppm_pgm_round_trip_any_shape(h, w, c, seed):
    px = _raster(h, w, c, seed)
    d = decode_image_bytes(encode_ppm(px))
    assert (d["width"], d["height"], d["channels"]) == (w, h, c)
    assert np.array_equal(d["pixels"], px)


@settings(max_examples=150, deadline=None)
@given(dims, dims, st.integers(0, 2**31 - 1))
def test_bmp_round_trip_any_shape(h, w, seed):
    # width sweep crosses every stride-padding residue (w*3 mod 4)
    px = _raster(h, w, 3, seed)
    d = decode_image_bytes(encode_bmp(px))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert np.array_equal(d["pixels"], px)


@settings(max_examples=150, deadline=None)
@given(dims, dims, dims, dims, st.sampled_from([1, 3]), st.integers(0, 2**31 - 1))
def test_nn_resample_matches_pixel_center_formula(h, w, th, tw, c, seed):
    px = _raster(h, w, c, seed)
    out = _nn_resample(px, tw, th)
    assert out.shape == (th, tw, c)
    for i in range(th):
        si = int((i + 0.5) * h / th)
        for j in range(tw):
            sj = int((j + 0.5) * w / tw)
            assert np.array_equal(out[i, j], px[si, sj])


@settings(max_examples=100, deadline=None)
@given(dims, dims, st.sampled_from([1, 3]), st.integers(0, 2**31 - 1))
def test_nn_resample_identity_when_same_shape(h, w, c, seed):
    px = _raster(h, w, c, seed)
    assert np.array_equal(_nn_resample(px, w, h), px)


@settings(max_examples=100, deadline=None)
@given(dims, dims, st.integers(0, 2**31 - 1))
def test_ensure_hwc_grayscale_equivalence(h, w, seed):
    """2-D input is exactly the 3-D single-channel view: _ensure_hwc,
    encode_ppm, and decode agree between the two spellings."""
    flat = _raster(h, w, 1, seed)[:, :, 0]
    assert np.array_equal(_ensure_hwc(flat), flat[:, :, None])
    assert encode_ppm(flat) == encode_ppm(flat[:, :, None])
