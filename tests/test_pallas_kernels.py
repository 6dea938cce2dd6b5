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


def _scan_sweep_pair(ws, rank, lab, f, axis):
    """fwd+bwd _sweep_axis passes with merge (the scan reference)."""
    for reverse in (False, True):
        r1, l1 = ws._sweep_axis(rank, lab, f, axis, reverse)
        take = r1 < rank
        rank = jnp.where(take, r1, rank)
        lab = jnp.where(take, l1, lab)
    return rank, lab


@pytest.mark.parametrize("lab_dtype", [np.int16, np.int32])
def test_watershed_sweep_z_matches_scan(lab_dtype):
    """The Pallas bidirectional Z sweep equals two _sweep_axis passes
    (int16 labels are the production dtype — handled natively)."""
    from invesalius3_tpu.ops import watershed as ws

    r = np.random.default_rng(3)
    f = jnp.asarray(r.integers(0, 1000, (12, 20, 130)).astype(np.int32))
    lab = jnp.zeros((12, 20, 130), lab_dtype)
    lab = lab.at[2, 5, 5].set(1).at[9, 15, 100].set(2)
    rank = jnp.where(lab > 0, jnp.int32(0), jnp.int32(2**31 - 1))

    rank_s, lab_s = _scan_sweep_pair(ws, rank, lab, f, 0)
    nr, nl = pallas_kernels.watershed_sweep_z(rank, lab, f)
    np.testing.assert_array_equal(np.asarray(nr), np.asarray(rank_s))
    np.testing.assert_array_equal(np.asarray(nl), np.asarray(lab_s))


@pytest.mark.parametrize("lab_dtype", [np.int16, np.int32])
def test_watershed_sweep_y_matches_scan(lab_dtype):
    """The Pallas bidirectional Y (axis-1) sweep equals two _sweep_axis
    passes, including odd shapes needing z/y/x padding."""
    from invesalius3_tpu.ops import watershed as ws

    r = np.random.default_rng(4)
    f = jnp.asarray(r.integers(0, 1000, (11, 21, 130)).astype(np.int32))
    lab = jnp.zeros((11, 21, 130), lab_dtype)
    lab = lab.at[2, 5, 5].set(1).at[9, 15, 100].set(2)
    rank = jnp.where(lab > 0, jnp.int32(0), jnp.int32(2**31 - 1))

    rank_s, lab_s = _scan_sweep_pair(ws, rank, lab, f, 1)
    nr, nl = pallas_kernels.watershed_sweep_y(rank, lab, f)
    np.testing.assert_array_equal(np.asarray(nr), np.asarray(rank_s))
    np.testing.assert_array_equal(np.asarray(nl), np.asarray(lab_s))
