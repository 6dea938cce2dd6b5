"""Slab projection kernels: MaxIP / MinIP / MeanIP / LMIP / MIDA and the
contour-enhanced (FCM) variants.

Behavior mirrors the reference's Rust ray kernels (reference
invesalius_rs/src/mips.rs: ``lmip`` at :7, ``mida_internal`` at :102,
``fast_countour_mip_internal`` at :215) and the numpy reductions in
``Slice.get_image_slice`` (reference invesalius/data/slice_.py:881-940).

TPU design: the reference walks each output pixel's ray in a scalar loop
(rayon-parallel over pixels).  Here a ray step is one (H, W) elementwise
VPU op and the walk is a single ``lax.scan`` along the projection axis, so
every pixel's ray advances in lockstep; early-exit ("break") becomes a
per-pixel ``stopped`` flag.  The whole slab projection is one fused XLA
program with no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from invesalius3_tpu.ops.windowing import get_opacity


def _lead(volume: jax.Array, axis: int) -> jax.Array:
    """Move the projection axis to the front so scans run over it."""
    return jnp.moveaxis(volume, axis, 0)


# ---------------------------------------------------------------------------
# Simple reductions (reference slice_.py:881-886)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("axis",))
def maxip(volume: jax.Array, axis: int = 0) -> jax.Array:
    return jnp.max(volume, axis=axis)


@partial(jax.jit, static_argnames=("axis",))
def minip(volume: jax.Array, axis: int = 0) -> jax.Array:
    return jnp.min(volume, axis=axis)


@partial(jax.jit, static_argnames=("axis",))
def meanip(volume: jax.Array, axis: int = 0) -> jax.Array:
    return jnp.mean(volume, axis=axis).astype(volume.dtype)


# ---------------------------------------------------------------------------
# LMIP — local maximum intensity projection (reference mips.rs:7-86)
# ---------------------------------------------------------------------------


def _use_pallas() -> bool:
    import os

    return jax.default_backend() == "tpu" and not os.environ.get("INV3_NO_PALLAS")


@partial(jax.jit, static_argnames=("axis",))
def lmip(volume: jax.Array, axis: int, tmin: float, tmax: float) -> jax.Array:
    """First local maximum after the ray enters [tmin, tmax].

    Per-ray semantics (identical to the reference scalar loop): track the
    running max; once a value inside [tmin, tmax] has been seen ("start"),
    the first strictly-decreasing step ends the ray.

    On TPU the VMEM-resident Pallas kernel handles the walk (one HBM read
    of the volume total); elsewhere the lax.scan formulation runs.
    """
    if _use_pallas():
        from invesalius3_tpu.ops import pallas_kernels

        return pallas_kernels.lmip_axis0(_lead(volume, axis), tmin, tmax)
    return lmip_scan(_lead(volume, axis), tmin, tmax)


@jax.jit
def lmip_scan(lanes: jax.Array, tmin: float, tmax: float) -> jax.Array:
    """The lax.scan LMIP formulation over axis-0 lanes — the non-Pallas
    path, exposed so the on-TPU kernel smoke (bench.py) can compare the
    Pallas kernel against it on the same backend."""
    first = lanes[0]
    init_carry = (
        first,  # max_val
        (first >= tmin) & (first <= tmax),  # start
        jnp.zeros(first.shape, dtype=jnp.bool_),  # stopped
    )

    def step(carry, val):
        max_val, start, stopped = carry
        greater = val > max_val
        less = val < max_val
        new_stopped = stopped | (less & start & ~stopped)
        new_max = jnp.where(~stopped & greater, val, max_val)
        in_range = (val >= tmin) & (val <= tmax)
        # ``start`` only updates if the ray did not break this step
        new_start = jnp.where(~new_stopped, start | in_range, start)
        return (new_max, new_start, new_stopped), None

    (max_val, _, _), _ = jax.lax.scan(step, init_carry, lanes)
    return max_val.astype(lanes.dtype)


# ---------------------------------------------------------------------------
# MIDA — maximum intensity difference accumulation (reference mips.rs:102-168)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("axis",))
def mida(volume: jax.Array, axis: int, wl: float, ww: float) -> jax.Array:
    """MIDA projection with WW/WL-weighted opacity.

    Front-to-back accumulation where each new running-max of the normalized
    intensity (``fpi``) re-weights what's behind it (``bt = 1 - delta``);
    the ray terminates when accumulated alpha reaches 1.  TPU: Pallas
    VMEM-column kernel; elsewhere: lax.scan.
    """
    if _use_pallas():
        from invesalius3_tpu.ops import pallas_kernels

        return pallas_kernels.mida_axis0(_lead(volume, axis), wl, ww)
    return mida_scan(_lead(volume, axis), wl, ww)


@jax.jit
def mida_scan(volume_lanes: jax.Array, wl: float, ww: float) -> jax.Array:
    """The lax.scan MIDA formulation over axis-0 lanes (non-Pallas path;
    see lmip_scan for why it is exposed)."""
    lanes = volume_lanes.astype(jnp.float32)
    img_min = jnp.min(lanes)
    img_max = jnp.max(lanes)
    rng = img_max - img_min

    shape = lanes.shape[1:]
    init_carry = (
        jnp.zeros(shape, jnp.float32),  # fmax
        jnp.zeros(shape, jnp.float32),  # alpha_p
        jnp.zeros(shape, jnp.float32),  # colour_p
        jnp.zeros(shape, jnp.bool_),  # stopped
    )

    def step(carry, vl):
        fmax, alpha_p, colour_p, stopped = carry
        fpi = (vl - img_min) / rng
        dl = jnp.maximum(fpi - fmax, 0.0)
        new_fmax = jnp.maximum(fmax, fpi)
        bt = 1.0 - dl
        alpha = get_opacity(vl, wl, ww)
        colour = bt * colour_p + (1.0 - bt * alpha_p) * fpi * alpha
        new_alpha = bt * alpha_p + (1.0 - bt * alpha_p) * alpha
        # the step that crosses alpha>=1 still commits its colour (the
        # reference breaks *after* assignment), later steps are frozen
        out_fmax = jnp.where(stopped, fmax, new_fmax)
        out_alpha = jnp.where(stopped, alpha_p, new_alpha)
        out_colour = jnp.where(stopped, colour_p, colour)
        new_stopped = stopped | (out_alpha >= 1.0)
        return (out_fmax, out_alpha, out_colour, new_stopped), None

    (_, _, colour_p, _), _ = jax.lax.scan(step, init_carry, lanes)
    result = rng * colour_p + img_min
    return result.astype(volume_lanes.dtype)


# ---------------------------------------------------------------------------
# Contour-enhanced MIP family (reference mips.rs:170-279)
# ---------------------------------------------------------------------------


def _central_gradient(volume: jax.Array) -> jax.Array:
    """Central finite differences with edge clamping, h=1 (reference
    mips.rs:171-195 ``finite_difference``).  Returns (3, Z, Y, X) = gx,gy,gz."""
    v = volume.astype(jnp.float32)

    def diff(axis):
        fwd = jnp.concatenate(
            [jnp.take(v, jnp.arange(1, v.shape[axis]), axis=axis),
             jnp.take(v, jnp.asarray([v.shape[axis] - 1]), axis=axis)],
            axis=axis,
        )
        bwd = jnp.concatenate(
            [jnp.take(v, jnp.asarray([0]), axis=axis),
             jnp.take(v, jnp.arange(0, v.shape[axis] - 1), axis=axis)],
            axis=axis,
        )
        return (fwd - bwd) / 2.0

    gz = diff(0)
    gy = diff(1)
    gx = diff(2)
    return jnp.stack([gx, gy, gz])


@partial(jax.jit, static_argnames=("axis",))
def fcm_intensity(volume: jax.Array, n: float, axis: int) -> jax.Array:
    """Per-voxel contour intensity |g| * (1 - |cos(g, dir)|)^n (reference
    mips.rs:197-213 ``calc_fcm_intensity``), cast back to the input dtype
    exactly as the Rust writes into an Array3<T>."""
    g = _central_gradient(volume)
    gm = jnp.sqrt(jnp.sum(g * g, axis=0))
    # dir picks the gradient component along the view axis:
    # axis 0 (axial) -> gz, axis 1 -> gy, axis 2 -> gx   (mips.rs:229-235)
    comp = {0: 2, 1: 1, 2: 0}[axis]
    d = g[comp]
    sf = jnp.power(1.0 - jnp.abs(d / jnp.where(gm == 0.0, 1.0, gm)), n)
    fcm = jnp.where(gm == 0.0, 0.0, gm * sf)
    return fcm.astype(volume.dtype)


@partial(jax.jit, static_argnames=("axis", "tmip"))
def fast_contour_mip(
    volume: jax.Array,
    n: float,
    axis: int,
    wl: float,
    ww: float,
    tmip: int,
) -> jax.Array:
    """Contour-enhanced projection: FCM intensity volume then MIP (tmip=0),
    LMIP with the reference's fixed 700..3033 window (tmip=1), or MIDA
    (tmip=2) — reference mips.rs:215-279."""
    tmp = fcm_intensity(volume, n, axis)
    if tmip == 0:
        return jnp.max(tmp, axis=axis)
    elif tmip == 1:
        return lmip(tmp, axis, 700.0, 3033.0)
    elif tmip == 2:
        return mida(tmp, axis, wl, ww)
    raise ValueError(f"unknown tmip {tmip}")
