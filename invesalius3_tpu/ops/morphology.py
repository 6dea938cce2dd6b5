"""Binary/grayscale morphology kernels: structuring elements, dilation,
erosion, morphological gradient, and brush stamping.

The reference's morphology lives in scipy.ndimage calls (watershed gradient,
generate_binary_structure used by every floodfill tool) and the Rust brush
stamp (reference invesalius_rs/src/brush_mask.rs).  TPU design: a binary
dilation by a small (2r+1)^3 structuring element is an OR-reduction over the
statically-known nonzero offsets — each offset is a zero-padded slice shift,
all fused by XLA into one VPU pass.  Grayscale dilation/erosion use
``lax.reduce_window`` (max/min pooling), which XLA lowers to efficient
windowed reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Structuring elements (scipy.ndimage.generate_binary_structure semantics)
# ---------------------------------------------------------------------------


def generate_binary_structure(rank: int, connectivity: int) -> np.ndarray:
    """Same contract as scipy.ndimage.generate_binary_structure: a 3^rank
    bool array where an element is True iff its Chebyshev offset has
    L1-norm <= connectivity."""
    grid = np.indices((3,) * rank) - 1
    dist = np.abs(grid).sum(axis=0)
    return (dist <= connectivity).astype(bool)


# Connectivity aliases matching the reference's CON2D/CON3D maps
# (reference styles.py: CON2D = {4: 1, 8: 2}; CON3D = {6: 1, 18: 2, 26: 3}).
def structure_2d(conn: int) -> np.ndarray:
    return generate_binary_structure(2, {4: 1, 8: 2}[conn])


def structure_3d(conn: int) -> np.ndarray:
    return generate_binary_structure(3, {6: 1, 18: 2, 26: 3}[conn])


def _offsets(strct: np.ndarray) -> Tuple[Tuple[int, ...], ...]:
    """Nonzero offsets of a structuring element, centered."""
    strct = np.asarray(strct)
    center = [s // 2 for s in strct.shape]
    return tuple(
        tuple(int(c) - ctr for c, ctr in zip(idx, center))
        for idx in zip(*np.nonzero(strct))
    )


def shift_nd(x: jax.Array, offset: Sequence[int], fill=0) -> jax.Array:
    """Zero(or fill)-padded shift: out[i] = x[i - offset] (so a positive
    offset moves content toward larger indices)."""
    out = x
    for axis, off in enumerate(offset):
        if off == 0:
            continue
        pad = [(0, 0)] * x.ndim
        if off > 0:
            pad[axis] = (off, 0)
            out = jnp.pad(out, pad, constant_values=fill)
            out = jax.lax.slice_in_dim(out, 0, x.shape[axis], axis=axis)
        else:
            pad[axis] = (0, -off)
            out = jnp.pad(out, pad, constant_values=fill)
            out = jax.lax.slice_in_dim(out, -off, -off + x.shape[axis], axis=axis)
    return out


# ---------------------------------------------------------------------------
# Binary morphology
# ---------------------------------------------------------------------------


def binary_dilation(x: jax.Array, strct: np.ndarray) -> jax.Array:
    """OR over the structuring element's offsets (one fused VPU pass)."""
    x = x.astype(jnp.bool_)
    out = jnp.zeros_like(x)
    for off in _offsets(strct):
        out = out | shift_nd(x, off, fill=False)
    return out

def binary_erosion(x: jax.Array, strct: np.ndarray) -> jax.Array:
    x = x.astype(jnp.bool_)
    out = jnp.ones_like(x)
    for off in _offsets(strct):
        out = out & shift_nd(x, off, fill=False)
    return out


def binary_opening(x: jax.Array, strct: np.ndarray) -> jax.Array:
    return binary_dilation(binary_erosion(x, strct), strct)


def binary_closing(x: jax.Array, strct: np.ndarray) -> jax.Array:
    return binary_erosion(binary_dilation(x, strct), strct)


# ---------------------------------------------------------------------------
# Grayscale morphology (reduce_window max/min pooling)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("size",))
def grey_dilation(x: jax.Array, size: Tuple[int, ...]) -> jax.Array:
    init = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x, init, jax.lax.max, window_dimensions=size, window_strides=(1,) * x.ndim,
        padding="SAME",
    )


@partial(jax.jit, static_argnames=("size",))
def grey_erosion(x: jax.Array, size: Tuple[int, ...]) -> jax.Array:
    init = jnp.finfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max
    return jax.lax.reduce_window(
        x, init, jax.lax.min, window_dimensions=size, window_strides=(1,) * x.ndim,
        padding="SAME",
    )


@partial(jax.jit, static_argnames=("size",))
def morphological_gradient(x: jax.Array, size: Tuple[int, ...] = (3, 3, 3)) -> jax.Array:
    """dilation - erosion, the watershed pre-filter (reference
    watershed_process.py:36-52 uses scipy.ndimage.morphological_gradient)."""
    return grey_dilation(x, size) - grey_erosion(x, size)


# ---------------------------------------------------------------------------
# Brushes (reference brush_mask.rs + cursor_actors.py semantics)
# ---------------------------------------------------------------------------


def brush_element(
    radius_mm: float,
    spacing: Tuple[float, float, float],
    shape: str = "circle",
    dims: int = 3,
) -> np.ndarray:
    """Boolean brush footprint in voxel units for a physical radius in mm.

    ``shape`` in {"circle" (sphere in 3D), "square" (cube in 3D)}.
    ``spacing`` is (sx, sy, sz) like Volume.spacing.
    """
    sx, sy, sz = spacing
    if dims == 3:
        rz = max(int(round(radius_mm / sz)), 0)
        ry = max(int(round(radius_mm / sy)), 0)
        rx = max(int(round(radius_mm / sx)), 0)
        zz, yy, xx = np.mgrid[-rz : rz + 1, -ry : ry + 1, -rx : rx + 1]
        if shape == "square":
            return np.ones(zz.shape, bool)
        d = (zz * sz) ** 2 + (yy * sy) ** 2 + (xx * sx) ** 2
        return d <= radius_mm**2
    else:
        ry = max(int(round(radius_mm / sy)), 0)
        rx = max(int(round(radius_mm / sx)), 0)
        yy, xx = np.mgrid[-ry : ry + 1, -rx : rx + 1]
        if shape == "square":
            return np.ones(yy.shape, bool)
        d = (yy * sy) ** 2 + (xx * sx) ** 2
        return d <= radius_mm**2


def paint_brush(
    mask: jax.Array,
    brush: np.ndarray,
    center: Tuple[int, ...],
    value: int,
    erase: bool = False,
) -> jax.Array:
    """Stamp a brush footprint into the mask at ``center`` (z, y, x order;
    clipped at the borders) — reference brush_mask.rs behavior.

    Paint sets ``value`` (254 for manual edit); erase sets 1 (erased code).
    """
    brush_j = jnp.asarray(brush)
    # Build index grids for the brush bounding box, clip to volume.
    starts = [int(c) - s // 2 for c, s in zip(center, brush.shape)]
    slices_mask = []
    slices_brush = []
    for ax, (st, bs) in enumerate(zip(starts, brush.shape)):
        lo = max(st, 0)
        hi = min(st + bs, mask.shape[ax])
        if hi <= lo:
            return mask
        slices_mask.append(slice(lo, hi))
        slices_brush.append(slice(lo - st, hi - st))
    sub = mask[tuple(slices_mask)]
    b = brush_j[tuple(slices_brush)]
    stamped = jnp.where(b, jnp.asarray(value, mask.dtype), sub)
    return mask.at[tuple(slices_mask)].set(stamped)


@partial(jax.jit, static_argnames=("brush_shape", "value"))
def paint_brush_trajectory(
    mask: jax.Array,
    brush: jax.Array,
    centers: jax.Array,
    value: int,
    brush_shape: Tuple[int, int, int],
) -> jax.Array:
    """Stamp the same brush at many centers (a drag stroke) in one jitted
    scan — the TPU replacement for per-mouse-event Rust stamping.

    centers: (N, 3) int32 (z, y, x).  Out-of-range stamps clip via
    dynamic_update_slice's clamping.
    """
    bz, by, bx = brush_shape
    half = jnp.asarray([bz // 2, by // 2, bx // 2], jnp.int32)

    def body(m, c):
        # dynamic_slice treats NEGATIVE starts as from-the-end (wrap), then
        # clamps the upper side — an unguarded c-half teleported border
        # stamps to the far corner (measured).  maximum(…, 0) restores the
        # intended clamp-to-border; this then differs from true clipping
        # only within brush-radius of the border.
        start = jnp.maximum(c - half, 0)
        sub = jax.lax.dynamic_slice(m, start, brush_shape)
        stamped = jnp.where(brush, jnp.asarray(value, m.dtype), sub)
        return jax.lax.dynamic_update_slice(m, stamped, start), None

    out, _ = jax.lax.scan(body, mask, centers)
    return out


@partial(jax.jit, static_argnames=("brush_shape", "op"))
def paint_brush_trajectory_threshold(
    mask: jax.Array,
    image: jax.Array,
    brush: jax.Array,
    centers: jax.Array,
    tmin: jax.Array,
    tmax: jax.Array,
    brush_shape: Tuple[int, int, int],
    op: str = "thresh",
) -> jax.Array:
    """Threshold-gated brush ops (reference slice_.py:722-736 editor
    semantics over const.BRUSH_THRESH* codes, styles.py:1361):

    - ``thresh``: inside the footprint, voxels whose image value lies in
      [tmin, tmax] become 254 (edited-in), all others become 1 (erased).
    - ``thresh_erase``: the inverse gate — out-of-range voxels become 254,
      in-range become 1.
    - ``thresh_add``: only in-range voxels are set (to 254); the rest of
      the footprint is untouched (BRUSH_THRESH_ADD_ONLY).
    - ``thresh_erase_only``: only out-of-range voxels are cleared (to 1)
      (BRUSH_THRESH_ERASE_ONLY).

    Same dynamic-slice scan as paint_brush_trajectory; the image window is
    sliced alongside the mask window so the gate costs one extra gather
    per stamp, not a full-volume compare.
    """
    bz, by, bx = brush_shape
    half = jnp.asarray([bz // 2, by // 2, bx // 2], jnp.int32)
    tmin = jnp.asarray(tmin, image.dtype)
    tmax = jnp.asarray(tmax, image.dtype)

    def body(m, c):
        # maximum(…, 0): negative starts would wrap to the far edge (see
        # paint_brush_trajectory)
        start = jnp.maximum(c - half, 0)
        sub = jax.lax.dynamic_slice(m, start, brush_shape)
        img = jax.lax.dynamic_slice(image, start, brush_shape)
        inside = (img >= tmin) & (img <= tmax)
        v254 = jnp.asarray(254, m.dtype)
        v1 = jnp.asarray(1, m.dtype)
        if op == "thresh":
            stamped = jnp.where(brush, jnp.where(inside, v254, v1), sub)
        elif op == "thresh_erase":
            stamped = jnp.where(brush, jnp.where(inside, v1, v254), sub)
        elif op == "thresh_add":
            stamped = jnp.where(brush & inside, v254, sub)
        elif op == "thresh_erase_only":
            stamped = jnp.where(brush & ~inside, v1, sub)
        else:
            raise ValueError(f"unknown threshold-brush op {op!r}")
        return jax.lax.dynamic_update_slice(m, stamped, start), None

    out, _ = jax.lax.scan(body, mask, centers)
    return out


@partial(jax.jit, static_argnames=("limits",))
def crop_mask(mask: jax.Array, limits: Tuple[int, int, int, int, int, int]) -> jax.Array:
    """Zero everything outside the (zi, zf, yi, yf, xi, xf) box — the crop
    tool (reference data/geometry.py crop Box + CropMaskInteractorStyle,
    styles.py:2596: mask voxels outside the box are cleared)."""
    zi, zf, yi, yf, xi, xf = limits
    Z, Y, X = mask.shape
    zz = jnp.arange(Z)[:, None, None]
    yy = jnp.arange(Y)[None, :, None]
    xx = jnp.arange(X)[None, None, :]
    inside = (
        (zz >= zi) & (zz <= zf) & (yy >= yi) & (yy <= yf) & (xx >= xi) & (xx <= xf)
    )
    return jnp.where(inside, mask, jnp.asarray(0, mask.dtype))
