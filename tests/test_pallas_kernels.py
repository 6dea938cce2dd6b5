"""Pallas ray-scan kernels vs the XLA scan formulations (interpreter mode
on CPU; identical code path compiles on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from invesalius3_tpu.ops import pallas_kernels, projections

rng = np.random.default_rng(13)


def test_lmip_pallas_matches_scan():
    vol = rng.integers(-200, 1200, (24, 20, 140)).astype(np.int16)
    want = np.asarray(projections.lmip(vol, 0, 100, 900))
    got = np.asarray(pallas_kernels.lmip_axis0(jnp.asarray(vol), 100.0, 900.0))
    np.testing.assert_array_equal(got, want)


def test_lmip_pallas_unaligned_shapes():
    # 13 x 150 output needs padding to (16, 256)
    vol = rng.integers(0, 500, (9, 13, 150)).astype(np.int16)
    want = np.asarray(projections.lmip(vol, 0, 50, 400))
    got = np.asarray(pallas_kernels.lmip_axis0(jnp.asarray(vol), 50.0, 400.0))
    np.testing.assert_array_equal(got, want)


def test_mida_pallas_matches_scan():
    vol = rng.integers(-200, 1200, (24, 16, 128)).astype(np.int16)
    want = np.asarray(projections.mida(vol, 0, 500.0, 1000.0))
    got = np.asarray(pallas_kernels.mida_axis0(jnp.asarray(vol), 500.0, 1000.0))
    np.testing.assert_allclose(got.astype(np.int64), want.astype(np.int64), atol=1)
