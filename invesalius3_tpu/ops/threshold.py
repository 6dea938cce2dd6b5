"""Threshold segmentation kernels.

Reproduces the reference's threshold-mask semantics (reference
invesalius/data/slice_.py:1722-1765 ``do_threshold_to_a_slice`` /
``do_threshold_to_all_slices``): voxels inside [tmin, tmax] become 255,
others 0, while the manual-editor codes 1, 2, 253, 254 are preserved.

On TPU this is one fused VPU pass over the whole volume — the reference
loops slice-by-slice over a memmap; here the 3D case is a single jitted
elementwise kernel that XLA tiles over the (8, 128) vector unit and that
shards trivially over a Z-partitioned mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invesalius3_tpu import constants as const


@jax.jit
def threshold_mask(
    image: jax.Array,
    mask: jax.Array,
    tmin: float,
    tmax: float,
) -> jax.Array:
    """Re-threshold ``image`` into ``mask`` preserving editor codes.

    Args:
      image: (...,) intensity array (any shape; typically (Z, Y, X)).
      mask: uint8 array of the same shape holding the previous mask.
      tmin, tmax: inclusive threshold bounds.

    Returns:
      uint8 array: 255 inside the threshold, 0 outside, except voxels whose
      previous value is one of the editor codes (1, 2, 253, 254), which are
      passed through unchanged — exactly reference slice_.py:1722-1738.
    """
    inside = (image >= tmin) & (image <= tmax)
    m = jnp.where(inside, jnp.uint8(const.MASK_THRESHOLD_IN), jnp.uint8(0))
    keep = (
        (mask == 1) | (mask == 2) | (mask == 253) | (mask == 254)
    )
    return jnp.where(keep, mask.astype(jnp.uint8), m)


@jax.jit
def threshold_new_mask(image: jax.Array, tmin: float, tmax: float) -> jax.Array:
    """Fresh threshold mask with no editor history: 255 in-range else 0."""
    inside = (image >= tmin) & (image <= tmax)
    return jnp.where(inside, jnp.uint8(const.MASK_THRESHOLD_IN), jnp.uint8(0))


@jax.jit
def mask_visible(mask: jax.Array) -> jax.Array:
    """Boolean visibility of mask voxels: value >= 127 (the reference
    composites/extracts surfaces from voxels >= 127; codes 253/254/255 are
    'on', 0/1/2 are 'off')."""
    return mask >= jnp.uint8(const.MASK_VISIBLE_MIN)


@jax.jit
def apply_threshold_probability(
    probability: jax.Array, threshold: float
) -> jax.Array:
    """Binarize a DL probability map into a 0/255 uint8 mask (reference
    segment.py apply_segment_threshold semantics)."""
    return jnp.where(probability >= threshold, jnp.uint8(255), jnp.uint8(0))
