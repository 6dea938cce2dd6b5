"""Oblique volume reslicing under a 4x4 view matrix with NN / trilinear /
tricubic / Lanczos-4 interpolation.

Reference: invesalius_rs/src/transforms.rs ``coord_transform`` (sample at
M @ (z*sz, y*sy, x*sx, 1), homogeneous divide, back to voxel units, cval
outside [0, dim-1)) and interpolation.rs (trilinear :67, Catmull-Rom
tricubic :105, Lanczos a=4 with 7 taps :140, all with wrap-by-one-period
boundary handling), driven from Slice.get_image_slice (reference
slice_.py:864-874) for rotated volumes.

TPU design: one gather-heavy jitted kernel per interpolation order — the
sample grid is computed in-register, taps become a single advanced-index
gather (64 taps tricubic / 343 taps lanczos, batched), weights are
separable outer products on the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu import constants as const


def _wrap(idx: jax.Array, dim: int) -> jax.Array:
    """Reference get_value boundary: out-of-range wraps by one period
    (interpolation.rs:6-35)."""
    return jnp.where(idx < 0, idx + dim, jnp.where(idx >= dim, idx - dim, idx))


def _gather(volume: jax.Array, zi, yi, xi) -> jax.Array:
    """Flat 1-D gather: a three-index-vector gather over a 512^3 operand
    crashed the TPU worker outright (and multi-coordinate gathers lower
    worse than linear ones generally).  int32 linear ids bound the volume
    to < 2^31 voxels (~1290^3)."""
    dz, dy, dx = volume.shape
    zi = _wrap(zi, dz)
    yi = _wrap(yi, dy)
    xi = _wrap(xi, dx)
    lin = (zi * dy + yi) * dx + xi
    return volume.reshape(-1)[lin]


def trilinear(volume: jax.Array, x, y, z) -> jax.Array:
    v = volume.astype(jnp.float32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    xd = (x - x0).astype(jnp.float32)
    yd = (y - y0).astype(jnp.float32)
    zd = (z - z0).astype(jnp.float32)

    def g(dx_, dy_, dz_):
        return _gather(v, z0 + dz_, y0 + dy_, x0 + dx_)

    c00 = g(0, 0, 0) * (1 - xd) + g(1, 0, 0) * xd
    c10 = g(0, 1, 0) * (1 - xd) + g(1, 1, 0) * xd
    c01 = g(0, 0, 1) * (1 - xd) + g(1, 0, 1) * xd
    c11 = g(0, 1, 1) * (1 - xd) + g(1, 1, 1) * xd
    c0 = c00 * (1 - yd) + c10 * yd
    c1 = c01 * (1 - yd) + c11 * yd
    return c0 * (1 - zd) + c1 * zd


def _cr_weights(t: jax.Array) -> jax.Array:
    """Catmull-Rom weights for taps [-1, 0, 1, 2] (interpolation.rs:37-43)."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return jnp.stack([w0, w1, w2, w3], axis=-1)  # (..., 4)


def tricubic(volume: jax.Array, x, y, z) -> jax.Array:
    v = volume.astype(jnp.float32)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    zi = jnp.floor(z).astype(jnp.int32)
    wx = _cr_weights((x - xi).astype(jnp.float32))  # (..., 4)
    wy = _cr_weights((y - yi).astype(jnp.float32))
    wz = _cr_weights((z - zi).astype(jnp.float32))

    offs = jnp.arange(-1, 3, dtype=jnp.int32)
    # taps (..., 4x, 4y, 4z)
    zz = zi[..., None, None, None] + offs[None, None, :]
    yy = yi[..., None, None, None] + offs[None, :, None]
    xx = xi[..., None, None, None] + offs[:, None, None]
    taps = _gather(v, zz, yy, xx)
    w = wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]
    return jnp.sum(taps * w, axis=(-3, -2, -1))


def _lanczos_weights(t: jax.Array, a: int = 4) -> jax.Array:
    """Weights for the reference's 7 taps [-3..3] around floor
    (interpolation.rs:140-188: xi = floor - a + 1 .. floor + a exclusive)."""
    offs = jnp.arange(-a + 1, a, dtype=jnp.float32)  # 7 taps
    d = t[..., None] - offs  # distance from sample to tap
    pi = jnp.float32(np.pi)
    af = jnp.float32(a)
    w = jnp.where(
        d == 0.0,
        1.0,
        (af * jnp.sin(pi * d) * jnp.sin(pi * d / af)) / (pi * pi * d * d),
    )
    return jnp.where(jnp.abs(d) >= af, 0.0, w)


def lanczos(volume: jax.Array, x, y, z, a: int = 4) -> jax.Array:
    v = volume.astype(jnp.float32)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    zi = jnp.floor(z).astype(jnp.int32)
    wx = _lanczos_weights((x - xi).astype(jnp.float32), a)  # (..., 7)
    wy = _lanczos_weights((y - yi).astype(jnp.float32), a)
    wz = _lanczos_weights((z - zi).astype(jnp.float32), a)
    offs = jnp.arange(-a + 1, a, dtype=jnp.int32)
    n = len(offs)
    zz = zi[..., None, None, None] + offs[None, None, :]
    yy = yi[..., None, None, None] + offs[None, :, None]
    xx = xi[..., None, None, None] + offs[:, None, None]
    taps = _gather(v, zz, yy, xx)
    w = wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]
    return jnp.sum(taps * w, axis=(-3, -2, -1))


def sample_volume(volume: jax.Array, x, y, z, method: int, cval: float) -> jax.Array:
    """Interpolate at fractional voxel coords with the reference's bounds
    and clamping rules (transforms.rs:32-54): valid iff coord in
    [0, dim-1); tricubic/lanczos results clamped below by cval."""
    dz, dy, dx = volume.shape
    valid = (
        (z >= 0) & (z < dz - 1) & (y >= 0) & (y < dy - 1) & (x >= 0) & (x < dx - 1)
    )
    xs = jnp.where(valid, x, 0.0)
    ys = jnp.where(valid, y, 0.0)
    zs = jnp.where(valid, z, 0.0)
    if method == const.INTERP_NEAREST:
        out = _gather(volume.astype(jnp.float32),
                      zs.astype(jnp.int32), ys.astype(jnp.int32), xs.astype(jnp.int32))
    elif method == const.INTERP_TRILINEAR:
        out = trilinear(volume, xs, ys, zs)
    elif method == const.INTERP_TRICUBIC:
        out = jnp.maximum(tricubic(volume, xs, ys, zs), cval)
    else:
        out = jnp.maximum(lanczos(volume, xs, ys, zs), cval)
    return jnp.where(valid, out, jnp.float32(cval))


@partial(jax.jit, static_argnames=("spacing", "n", "orientation", "method", "out_shape"))
def apply_view_matrix_transform(
    volume: jax.Array,
    spacing: Tuple[float, float, float],
    m: jax.Array,
    n: int,
    orientation: str,
    method: int,
    cval: float,
    out_shape: Tuple[int, int, int],
) -> jax.Array:
    """Resample an oblique slab through the volume under the 4x4 view
    matrix (reference transforms_py.rs:12-49 semantics, (z, y, x) world
    coordinate order with homogeneous divide)."""
    sx, sy, sz = float(spacing[0]), float(spacing[1]), float(spacing[2])
    oz, oy, ox = out_shape
    cz = jnp.arange(oz, dtype=jnp.float32)[:, None, None]
    cy = jnp.arange(oy, dtype=jnp.float32)[None, :, None]
    cx = jnp.arange(ox, dtype=jnp.float32)[None, None, :]
    z = jnp.broadcast_to(cz, out_shape)
    y = jnp.broadcast_to(cy, out_shape)
    x = jnp.broadcast_to(cx, out_shape)
    if orientation == "AXIAL":
        z = z + n
    elif orientation == "CORONAL":
        y = y + n
    elif orientation in ("SAGITAL", "SAGITTAL"):
        x = x + n

    m = m.astype(jnp.float32)
    wz = z * sz
    wy = y * sy
    wx = x * sx
    tz = m[0, 0] * wz + m[0, 1] * wy + m[0, 2] * wx + m[0, 3]
    ty = m[1, 0] * wz + m[1, 1] * wy + m[1, 2] * wx + m[1, 3]
    tx = m[2, 0] * wz + m[2, 1] * wy + m[2, 2] * wx + m[2, 3]
    tw = m[3, 0] * wz + m[3, 1] * wy + m[3, 2] * wx + m[3, 3]
    nz = (tz / tw) / sz
    ny = (ty / tw) / sy
    nx = (tx / tw) / sx

    out = sample_volume(volume, nx, ny, nz, method, cval)
    if jnp.issubdtype(volume.dtype, jnp.integer):
        out = jnp.round(out)  # truncation would bias interpolated values
    return out.astype(volume.dtype)
