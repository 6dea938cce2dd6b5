"""Image filters producing new "image versions": gaussian, median, mean,
unsharp mask.

Reference: invesalius/data/filters.py:5-29 (scipy.ndimage gaussian_filter,
median_filter, uniform_filter, and unsharp = img + k*(img - gaussian)),
surfaced in the GUI as filtered image versions stored on the Project.

TPU design: separable gaussian/mean as three 1-D convolutions (XLA fuses
them); median via a sort over the window's 27 shifted copies (exact for
3x3x3).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu.ops.morphology import shift_nd


def _gauss_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d kernel (radius = truncate*sigma)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian(volume: jax.Array, sigma: float = 1.0, truncate: float = 4.0) -> jax.Array:
    """Separable gaussian blur, reflect boundary (scipy default)."""
    k = _gauss_kernel1d(sigma, truncate)
    r = (len(k) - 1) // 2
    out = volume.astype(jnp.float32)
    for axis in range(volume.ndim):
        pad = [(0, 0)] * volume.ndim
        pad[axis] = (r, r)
        padded = jnp.pad(out, pad, mode="symmetric")
        acc = jnp.zeros_like(out)
        for i, w in enumerate(k):
            acc = acc + w * jax.lax.slice_in_dim(padded, i, i + out.shape[axis], axis=axis)
        out = acc
    return out.astype(volume.dtype)


@partial(jax.jit, static_argnames=("size",))
def mean(volume: jax.Array, size: int = 3) -> jax.Array:
    """Uniform (box) filter, reflect boundary."""
    out = volume.astype(jnp.float32)
    r = size // 2
    for axis in range(volume.ndim):
        pad = [(0, 0)] * volume.ndim
        pad[axis] = (r, size - 1 - r)
        padded = jnp.pad(out, pad, mode="symmetric")
        acc = jnp.zeros_like(out)
        for i in range(size):
            acc = acc + jax.lax.slice_in_dim(padded, i, i + out.shape[axis], axis=axis)
        out = acc / size
    return out.astype(volume.dtype)


@partial(jax.jit, static_argnames=("size",))
def median(volume: jax.Array, size: int = 3) -> jax.Array:
    """Exact median over a size^3 window via sorting the shifted copies."""
    r = size // 2
    import itertools

    offs = list(itertools.product(range(-r, size - r), repeat=volume.ndim))
    pad = [(r, size - 1 - r)] * volume.ndim
    padded = jnp.pad(volume, pad, mode="symmetric")

    def window(off):
        sl = tuple(
            slice(r + o, r + o + volume.shape[i]) for i, o in enumerate(off)
        )
        return padded[sl]

    stack = jnp.stack([window(o) for o in offs])
    return jnp.median(stack, axis=0).astype(volume.dtype)


@partial(jax.jit, static_argnames=("sigma",))
def unsharp(volume: jax.Array, sigma: float = 1.0, amount: float = 1.0) -> jax.Array:
    """img + amount * (img - gaussian(img)) (reference filters.py unsharp)."""
    v = volume.astype(jnp.float32)
    blurred = gaussian(v, sigma).astype(jnp.float32)
    return (v + amount * (v - blurred)).astype(volume.dtype)


@partial(jax.jit, static_argnames=("amount",))
def sharpen(volume: jax.Array, amount: float = 1.0) -> jax.Array:
    """Unsharp-mask sharpening clipped to the input range (reference
    filters.py sharpening_filter: out = img + value*0.5*(img - gauss(img,1))
    clamped to [img.min, img.max])."""
    v = volume.astype(jnp.float32)
    blurred = gaussian(v, 1.0).astype(jnp.float32)
    out = v + amount * 0.5 * (v - blurred)
    return jnp.clip(out, v.min(), v.max()).astype(volume.dtype)


def despeckle(volume: jax.Array, sigma: float = 1.0) -> jax.Array:
    """Gaussian-based speckle reduction (reference filters.py
    despeckle_filter is a gaussian with sigma=value)."""
    return gaussian(volume, float(sigma))


def _sobel_axis(v: jax.Array, axis: int) -> jax.Array:
    """scipy.ndimage.sobel: derivative [-1,0,1] on `axis`, smoothing
    [1,2,1] on the other axes, reflect boundary — separable 1-D passes."""
    def conv1d(x, k, ax):
        pad = [(0, 0)] * x.ndim
        pad[ax] = (1, 1)
        p = jnp.pad(x, pad, mode="symmetric")
        n = x.shape[ax]
        return (k[0] * jax.lax.slice_in_dim(p, 0, n, axis=ax)
                + k[1] * jax.lax.slice_in_dim(p, 1, n + 1, axis=ax)
                + k[2] * jax.lax.slice_in_dim(p, 2, n + 2, axis=ax))

    out = v
    for ax in range(v.ndim):
        k = jnp.array([-1.0, 0.0, 1.0]) if ax == axis else jnp.array([1.0, 2.0, 1.0])
        out = conv1d(out, k, ax)
    return out


@partial(jax.jit, static_argnames=("sigma", "normalize"))
def border_detection(volume: jax.Array, sigma: float = 1.0,
                     normalize: bool = True) -> jax.Array:
    """Sobel gradient magnitude after gaussian pre-smoothing, rescaled to
    the input range (reference filters.py border_detection_filter)."""
    v = gaussian(volume.astype(jnp.float32), float(sigma)).astype(jnp.float32)
    mag = jnp.sqrt(sum(_sobel_axis(v, ax) ** 2 for ax in range(v.ndim)))
    if normalize:
        vmin = volume.min().astype(jnp.float32)
        vmax = volume.max().astype(jnp.float32)
        mmin, mmax = mag.min(), mag.max()
        rng = mmax - mmin
        mag = jnp.where(rng > 0, (mag - mmin) / jnp.maximum(rng, 1e-30)
                        * (vmax - vmin) + vmin, mag)
    return mag.astype(volume.dtype)


FILTERS = {
    "Gaussian": gaussian,
    "Median": median,
    "Mean": mean,
    "Unsharp": unsharp,
    "Sharpen": sharpen,
    "Despeckle": despeckle,
    "Border": border_detection,
}


@partial(jax.jit, static_argnames=())
def convolve_non_zero(volume: jax.Array, kernel: jax.Array, cval: float = 0.0) -> jax.Array:
    """Correlate (the reference's "convolve" indexes v[p - c + k] * k[k],
    i.e. correlation) only at voxels whose value is non-zero, with constant
    out-of-bounds fill (reference invesalius_rs/src/transforms_py.rs:52-95
    convolve_non_zero) — one fused conv + where on TPU."""
    v = volume.astype(jnp.float32)
    k = kernel.astype(jnp.float32)
    kd, kh, kw = k.shape
    pad = ((kd // 2, kd - 1 - kd // 2), (kh // 2, kh - 1 - kh // 2),
           (kw // 2, kw - 1 - kw // 2))
    padded = jnp.pad(v, pad, constant_values=cval)
    out = jax.lax.conv_general_dilated(
        padded[None, None], k[None, None],
        window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    return jnp.where(volume != 0, out, 0.0)
