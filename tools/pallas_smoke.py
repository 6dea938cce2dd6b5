"""On-TPU Pallas kernel smoke: every Pallas kernel vs its XLA formulation
at small shapes, run inside the bench process on the REAL chip.

Why: interpret-mode tests (tests/test_pallas_kernels.py) validate kernel
semantics but miss Mosaic legalization failures — a kernel edit that only
breaks on hardware passes the whole CPU suite (CLAUDE.md rule 11: i1
vectors in fori carries, per-lane dynamic gathers).  bench.py calls
run_smoke() once per round and records the per-kernel verdicts in the
bench JSON, so a Mosaic-breaking edit fails the round's artifact.

Kernel inventory (ops/pallas_kernels.py): lmip_axis0, mida_axis0,
watershed_sweep_z, watershed_sweep_y (the X sweep reuses the Y kernel on
swapped axes, covered by the y entry + a swapped case).
"""

from __future__ import annotations

import numpy as np


def run_smoke() -> dict:
    import jax.numpy as jnp

    from invesalius3_tpu.ops import pallas_kernels as pk
    from invesalius3_tpu.ops import projections
    from invesalius3_tpu.ops import watershed as ws

    out = {}
    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.integers(-200, 1200, (64, 64, 64)).astype(np.int16))

    def check(name, fn):
        try:
            fn()
            out[name] = "ok"
        except Exception as e:  # record, never kill the bench
            out[name] = f"FAIL {type(e).__name__}: {e}"[:300]

    def _lmip():
        got = np.asarray(pk.lmip_axis0(vol, 100.0, 900.0))
        want = np.asarray(projections.lmip_scan(vol, 100.0, 900.0))
        np.testing.assert_array_equal(got, want)

    def _mida():
        got = np.asarray(pk.mida_axis0(vol, 500.0, 1000.0))
        want = np.asarray(projections.mida_scan(vol, 500.0, 1000.0))
        np.testing.assert_allclose(
            got.astype(np.int64), want.astype(np.int64), atol=1)

    def _sweep_pair(rank, lab, f, axis):
        for reverse in (False, True):
            r1, l1 = ws._sweep_axis(rank, lab, f, axis, reverse)
            take = r1 < rank
            rank = jnp.where(take, r1, rank)
            lab = jnp.where(take, l1, lab)
        return rank, lab

    f = jnp.asarray(rng.integers(0, 1000, (64, 64, 64)).astype(np.int32))
    lab0 = jnp.zeros((64, 64, 64), jnp.int32)
    lab0 = lab0.at[8, 8, 8].set(1).at[50, 50, 50].set(2)
    rank0 = jnp.where(lab0 > 0, jnp.int32(0), jnp.int32(2**31 - 1))

    def _ws_z():
        nr, nl = pk.watershed_sweep_z(rank0, lab0, f)
        rs, ls = _sweep_pair(rank0, lab0, f, 0)
        np.testing.assert_array_equal(np.asarray(nr), np.asarray(rs))
        np.testing.assert_array_equal(np.asarray(nl), np.asarray(ls))

    def _ws_y():
        nr, nl = pk.watershed_sweep_y(rank0, lab0, f)
        rs, ls = _sweep_pair(rank0, lab0, f, 1)
        np.testing.assert_array_equal(np.asarray(nr), np.asarray(rs))
        np.testing.assert_array_equal(np.asarray(nl), np.asarray(ls))

    def _ws_x_via_y():  # the production X sweep: Y kernel on swapped axes
        nr, nl = pk.watershed_sweep_y(
            jnp.swapaxes(rank0, 1, 2), jnp.swapaxes(lab0, 1, 2),
            jnp.swapaxes(f, 1, 2))
        nr, nl = jnp.swapaxes(nr, 1, 2), jnp.swapaxes(nl, 1, 2)
        rs, ls = _sweep_pair(rank0, lab0, f, 2)
        np.testing.assert_array_equal(np.asarray(nr), np.asarray(rs))
        np.testing.assert_array_equal(np.asarray(nl), np.asarray(ls))

    check("lmip_axis0", _lmip)
    check("mida_axis0", _mida)
    check("watershed_sweep_z", _ws_z)
    check("watershed_sweep_y", _ws_y)
    check("watershed_sweep_x_via_y", _ws_x_via_y)
    return out
