"""Volume resampling / resizing (quality presets, DL preprocessing).

Reference: invesalius/data/imagedata_utils.py:50-131 (resize_image /
image_resize for surface-quality presets and model input conformance).
Trilinear resampling as one gather kernel; nearest for masks.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from invesalius3_tpu.ops.reslice import trilinear


@partial(jax.jit, static_argnames=("out_shape", "order"))
def resize_volume(volume: jax.Array, out_shape: Tuple[int, int, int],
                  order: int = 1) -> jax.Array:
    """Resample to ``out_shape`` (order 0 = nearest, 1 = trilinear),
    endpoint-aligned like scipy.ndimage.zoom."""
    Z, Y, X = volume.shape
    oz, oy, ox = out_shape

    def axis_coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((n_out,), jnp.float32)
        return jnp.linspace(0.0, n_in - 1.0, n_out)

    z = axis_coords(Z, oz)[:, None, None]
    y = axis_coords(Y, oy)[None, :, None]
    x = axis_coords(X, ox)[None, None, :]
    z = jnp.broadcast_to(z, out_shape)
    y = jnp.broadcast_to(y, out_shape)
    x = jnp.broadcast_to(x, out_shape)
    if order == 0:
        zi = jnp.round(z).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        xi = jnp.round(x).astype(jnp.int32)
        # flat gather: multi-index-vector gathers crash the TPU worker at
        # 512^3 operands (see reslice._gather)
        Zi, Yi, Xi = volume.shape
        return volume.reshape(-1)[(zi * Yi + yi) * Xi + xi]
    out = trilinear(volume, x, y, z)
    return out.astype(volume.dtype)


def resize_by_spacing_scale(volume: jax.Array, scale: int) -> jax.Array:
    """Quality-preset downsampling: 'Low' = 3, 'Medium' = 2 (reference
    SURFACE_QUALITY image_spacing_scale; surface.py:1349-1357 resizes the
    image before contouring)."""
    if scale <= 1:
        return volume
    out_shape = tuple(max(2, s // scale) for s in volume.shape)
    return resize_volume(volume, out_shape, order=1)
