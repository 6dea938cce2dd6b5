"""Slab projection kernels vs. reference-semantics oracles (mips.rs)."""

import numpy as np
import pytest

from invesalius3_tpu.ops import projections
from tests.oracles import (oracle_fast_contour_mip, oracle_fcm_intensity,
                           oracle_lmip, oracle_mida)

rng = np.random.default_rng(7)
VOL = rng.integers(-200, 1200, size=(12, 10, 11)).astype(np.int16)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_simple_projections(axis):
    np.testing.assert_array_equal(np.asarray(projections.maxip(VOL, axis)), VOL.max(axis))
    np.testing.assert_array_equal(np.asarray(projections.minip(VOL, axis)), VOL.min(axis))
    np.testing.assert_array_equal(
        np.asarray(projections.meanip(VOL, axis)), VOL.mean(axis).astype(np.int16)
    )


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_lmip_matches_reference(axis):
    got = np.asarray(projections.lmip(VOL, axis, 100, 900))
    want = oracle_lmip(VOL, axis, 100, 900)
    np.testing.assert_array_equal(got, want)


def test_lmip_degenerate_window():
    # the reference's Slice calls lmip with tmin == tmax == window_level
    got = np.asarray(projections.lmip(VOL, 0, 500, 500))
    want = oracle_lmip(VOL, 0, 500, 500)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_mida_matches_reference(axis):
    got = np.asarray(projections.mida(VOL, axis, 500.0, 1000.0))
    want = oracle_mida(VOL, axis, 500.0, 1000.0)
    # float accumulation order identical; integer cast can differ by 1 ulp
    np.testing.assert_allclose(got.astype(np.int64), want.astype(np.int64), atol=1)


def test_fcm_intensity_matches_reference():
    small = rng.integers(0, 300, size=(6, 7, 8)).astype(np.int16)
    got = np.asarray(projections.fcm_intensity(small, 2.0, 0))
    want = oracle_fcm_intensity(small, 2.0, 0)
    np.testing.assert_allclose(got.astype(np.int64), want.astype(np.int64), atol=1)


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("tmip", [0, 1, 2])
def test_fast_contour_mip_matches_reference(tmip, axis):
    """Bit-level oracle for the full chain (mips.rs:215): FCM volume then
    MIP/LMIP/MIDA.  The per-voxel int16 cast in the FCM stage can differ
    by 1 ulp from the Rust f32->T NumCast (same as the fcm test above);
    the reduction never amplifies that past 2."""
    got = np.asarray(
        projections.fast_contour_mip(VOL, 1.0, axis, 500.0, 1000.0, tmip))
    want = oracle_fast_contour_mip(VOL, 1.0, axis, 500.0, 1000.0, tmip)
    assert got.shape == want.shape
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        got.astype(np.int64), want.astype(np.int64), atol=2)
