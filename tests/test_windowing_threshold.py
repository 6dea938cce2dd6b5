"""WW/WL LUT and threshold kernels vs. reference-semantics numpy oracles."""

import numpy as np
import pytest

from invesalius3_tpu.ops import threshold, windowing
from tests.oracles import oracle_lut_value, oracle_threshold_slice

rng = np.random.default_rng(42)


def test_get_lut_value_matches_reference_piecewise():
    data = rng.integers(-1024, 3071, size=(4, 64, 64)).astype(np.int16)
    got = np.asarray(windowing.get_lut_value(data, 2000.0, 300.0))
    want = oracle_lut_value(data, 2000, 300)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_get_lut_value_255_range():
    data = rng.integers(-1024, 3071, size=(64, 64)).astype(np.int16)
    got = np.asarray(windowing.get_lut_value_255(data, 400.0, 40.0))
    assert got.min() >= 0.0 and got.max() <= 255.0
    # below/above window saturate
    assert np.asarray(windowing.get_lut_value_255(np.int16(-1000), 400.0, 40.0)) == 0.0
    assert np.asarray(windowing.get_lut_value_255(np.int16(3000), 400.0, 40.0)) == 255.0


def test_apply_ww_wl_rgb_shape_dtype():
    data = rng.integers(-1024, 3071, size=(32, 32)).astype(np.int16)
    img = np.asarray(windowing.apply_ww_wl_rgb(data, 2000.0, 300.0))
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.uint8


def test_get_opacity_ramp():
    vals = np.array([-500.0, 0.0, 250.0, 500.0, 1000.0], np.float32)
    got = np.asarray(windowing.get_opacity(vals, 250.0, 500.0))
    np.testing.assert_allclose(got, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)


def test_threshold_mask_matches_reference_and_preserves_edits():
    image = rng.integers(-1024, 3071, size=(8, 32, 32)).astype(np.int16)
    prev = np.zeros(image.shape, np.uint8)
    # sprinkle editor codes
    for code in (1, 2, 253, 254):
        idx = rng.integers(0, image.size, size=50)
        prev.reshape(-1)[idx] = code
    got = np.asarray(threshold.threshold_mask(image, prev, 226, 3071))
    want = np.stack(
        [oracle_threshold_slice(image[i], prev[i], 226, 3071) for i in range(8)]
    )
    np.testing.assert_array_equal(got, want)


def test_threshold_new_mask_binary():
    image = np.array([[-5, 0, 5], [10, 20, 30]], np.int16)
    got = np.asarray(threshold.threshold_new_mask(image, 0, 20))
    np.testing.assert_array_equal(got, [[0, 255, 255], [255, 255, 0]])


def test_mask_visible_codes():
    m = np.array([0, 1, 2, 127, 253, 254, 255], np.uint8)
    got = np.asarray(threshold.mask_visible(m))
    np.testing.assert_array_equal(got, [False, False, False, True, True, True, True])
