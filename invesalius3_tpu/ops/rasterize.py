"""Screen-space rasterization kernels for the 3D mask editor: polygon ->
mask, and mask cutting by a screen polygon with depth limit.

Reference: invesalius_rs/src/polygon_mask.rs ``polygon2mask_rs``
(ray-casting point-in-polygon over a pixel grid), mask_cut.rs
``mask_cut_internal`` (project every visible-mask voxel through the
world->NDC matrix; zero it if it lands inside the screen polygon within
``max_depth`` of the camera — include mode also zeroes off-viewport
voxels, reference fix #1084), used by
invesalius/data/mask3d_editor_state.py:14.

TPU design: point-in-polygon is an edge-count reduction — for E polygon
edges, E fused compare/accumulate passes over the whole pixel grid or
voxel cloud; the mask cut projects all voxels at once (one matmul-shaped
transform + gather into the rasterized polygon mask).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def point_in_polygon(px: jax.Array, py: jax.Array, points: jax.Array) -> jax.Array:
    """Vectorized even-odd ray casting.  ``points``: (E, 2) polygon vertices
    in the same (x, y) convention as the query arrays."""
    xi = points[:, 0]
    yi = points[:, 1]
    xj = jnp.roll(xi, 1)
    yj = jnp.roll(yi, 1)

    # broadcast queries against edges: (..., E)
    px_e = px[..., None]
    py_e = py[..., None]
    cond = (yi > py_e) != (yj > py_e)
    denom = jnp.where(yj - yi == 0, 1.0, yj - yi)
    x_int = (xj - xi) * (py_e - yi) / denom + xi
    crossing = cond & (px_e < x_int)
    return jnp.sum(crossing.astype(jnp.int32), axis=-1) % 2 == 1


@partial(jax.jit, static_argnames=("shape",))
def polygon2mask(shape: Tuple[int, int], points: jax.Array) -> jax.Array:
    """(w, h) bool mask of pixels inside the polygon — same axis convention
    as the reference (mask indexed [x, y] = polygon2mask_rs's (w, h))."""
    w, h = shape
    px = jnp.arange(w, dtype=jnp.float32)[:, None]
    py = jnp.arange(h, dtype=jnp.float32)[None, :]
    px = jnp.broadcast_to(px, (w, h))
    py = jnp.broadcast_to(py, (w, h))
    return point_in_polygon(px, py, points.astype(jnp.float32))


@partial(jax.jit, static_argnames=("edit_mode",))
def mask_cut(
    mask_volume: jax.Array,  # (Z, Y, X) uint8 — modified copy returned
    spacing: Tuple[float, float, float],
    max_depth: float,
    screen_polygon_mask: jax.Array,  # (H, W) bool from polygon2mask (transposed)
    m: jax.Array,  # 4x4 world -> NDC (model-view-projection)
    mv: jax.Array,  # 4x4 world -> camera (model-view), for depth
    edit_mode: int = 0,  # 0 = include (cut outside-viewport too), 1 = exclude
) -> jax.Array:
    """Zero visible-mask voxels whose screen projection falls inside the
    polygon within max_depth (reference mask_cut.rs semantics)."""
    sx, sy, sz = spacing
    Z, Y, X = mask_volume.shape
    h, w = screen_polygon_mask.shape

    zz = jnp.arange(Z, dtype=jnp.float32)[:, None, None] * sz
    yy = jnp.arange(Y, dtype=jnp.float32)[None, :, None] * sy
    xx = jnp.arange(X, dtype=jnp.float32)[None, None, :] * sx
    zz, yy, xx = jnp.broadcast_to(zz, (Z, Y, X)), jnp.broadcast_to(yy, (Z, Y, X)), jnp.broadcast_to(xx, (Z, Y, X))

    m = m.astype(jnp.float32)
    mv = mv.astype(jnp.float32)

    def transform(mat, x, y, z):
        tx = mat[0, 0] * x + mat[0, 1] * y + mat[0, 2] * z + mat[0, 3]
        ty = mat[1, 0] * x + mat[1, 1] * y + mat[1, 2] * z + mat[1, 3]
        tz = mat[2, 0] * x + mat[2, 1] * y + mat[2, 2] * z + mat[2, 3]
        tw = mat[3, 0] * x + mat[3, 1] * y + mat[3, 2] * z + mat[3, 3]
        return tx, ty, tz, tw

    qx, qy, qz, qw = transform(m, xx, yy, zz)
    front = qw > 0
    qw_safe = jnp.where(front, qw, 1.0)
    ndc_x = qx / qw_safe
    ndc_y = qy / qw_safe

    cx, cy, cz, cw = transform(mv, xx, yy, zz)
    cw_safe = jnp.where(cw == 0, 1.0, cw)
    cx, cy, cz = cx / cw_safe, cy / cw_safe, cz / cw_safe
    dist = jnp.sqrt(cx * cx + cy * cy + cz * cz)

    px = (ndc_x / 2.0 + 0.5) * (w - 1)
    py = (ndc_y / 2.0 + 0.5) * (h - 1)
    on_screen = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxi = jnp.clip(px.astype(jnp.int32), 0, w - 1)
    pyi = jnp.clip(py.astype(jnp.int32), 0, h - 1)
    in_poly = screen_polygon_mask[pyi, pxi]

    visible = mask_volume > 127
    within = front & (dist <= max_depth)
    cut = within & jnp.where(on_screen, in_poly, edit_mode == 0)
    return jnp.where(visible & cut, jnp.asarray(0, mask_volume.dtype), mask_volume)
