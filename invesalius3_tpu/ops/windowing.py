"""Window/level (WW/WL) intensity mapping kernels.

Reproduces the reference's LUT semantics (reference
invesalius/data/imagedata_utils.py:540-567 ``get_LUT_value`` /
``get_LUT_value_255`` / ``get_LUT_value_normalized``) as fused elementwise
XLA ops.  These replace both the numpy piecewise path and the VTK
``vtkImageMapToWindowLevelColors`` path (reference slice_.py:1656-1698):
on TPU a WW/WL remap of a 512x512 slice is a single VPU pass and fuses
into whatever consumes it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lut_piecewise(data: jax.Array, window: float, level: float, out_max: float) -> jax.Array:
    """Shared piecewise ramp: 0 below the window, ``out_max`` above, linear
    ramp within — exactly the numpy.piecewise breakpoints of the reference."""
    d = data.astype(jnp.float32)
    w = jnp.float32(window)
    lo = jnp.float32(level) - 0.5 - (w - 1.0) / 2.0
    hi = jnp.float32(level) - 0.5 + (w - 1.0) / 2.0
    ramp = ((d - (jnp.float32(level) - 0.5)) / (w - 1.0) + 0.5) * jnp.float32(out_max)
    return jnp.where(d <= lo, 0.0, jnp.where(d > hi, jnp.float32(out_max), ramp))


@jax.jit
def get_lut_value(data: jax.Array, window: float, level: float) -> jax.Array:
    """Map intensities into [0, window] (reference get_LUT_value)."""
    return _lut_piecewise(data, window, level, window)


@jax.jit
def get_lut_value_255(data: jax.Array, window: float, level: float) -> jax.Array:
    """Map intensities into [0, 255] (reference get_LUT_value_255)."""
    return _lut_piecewise(data, window, level, 255.0)


@jax.jit
def get_lut_value_normalized(
    data: jax.Array,
    a_min: float,
    a_max: float,
    b_min: float = 0.0,
    b_max: float = 1.0,
    clip: bool = True,
) -> jax.Array:
    """Linear intensity rescale (reference get_LUT_value_normalized)."""
    img = (data.astype(jnp.float32) - a_min) / (a_max - a_min)
    img = img * (b_max - b_min) + b_min
    if clip:
        img = jnp.clip(img, b_min, b_max)
    return img


@jax.jit
def apply_ww_wl_rgb(data: jax.Array, window: float, level: float) -> jax.Array:
    """WW/WL to an (..., 3) uint8 grayscale RGB image — the TPU replacement
    for vtkImageMapToWindowLevelColors (reference slice_.py:1688-1698)."""
    g = jnp.clip(get_lut_value_255(data, window, level), 0.0, 255.0).astype(jnp.uint8)
    return jnp.stack([g, g, g], axis=-1)


@jax.jit
def get_opacity(value: jax.Array, wl: float, ww: float) -> jax.Array:
    """Linear opacity ramp over the WW/WL window (reference mips.rs:89-100
    ``get_opacity``), used by the MIDA projection."""
    v = value.astype(jnp.float32)
    min_v = jnp.float32(wl) - jnp.float32(ww) / 2.0
    max_v = jnp.float32(wl) + jnp.float32(ww) / 2.0
    ramp = (v - min_v) / (max_v - min_v)
    return jnp.clip(ramp, 0.0, 1.0)
