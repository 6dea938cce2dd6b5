"""Connected-component labeling, region counting, largest component, and
automatic hole filling.

Reference behavior: scipy.ndimage.label + Rust ``count_regions``
(invesalius_rs/src/count_regions.rs) and ``fill_holes_automatically``
(floodfill.rs:51-94), used by mask part selection/removal
(reference styles.py:2572-2708), fill-holes (mask.py:519-545), and the
surface pipeline's keep-largest step (surface_process.py:377-391).

TPU design: label propagation.  Every masked voxel starts with a unique
label (its linear index + 1); labels relax to the neighborhood maximum
under the structuring element until fixpoint.  Straight runs are collapsed
in O(log n) by segmented max-scans (``lax.associative_scan``) along each
axis, so the outer ``while_loop`` only needs one iteration per "bend" in
the region geometry rather than one per voxel of diameter.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu.ops.morphology import _offsets, shift_nd, structure_3d


def _segmented_max_scan(values: jax.Array, mask: jax.Array, axis: int, reverse: bool) -> jax.Array:
    """Running max within contiguous True-runs of ``mask`` along ``axis``.

    Statically-unrolled doubling (Hillis-Steele) over (reset, value) pairs
    where ``reset`` marks the start of a new run: log2(len) elementwise
    steps of shifted combines.  (``lax.associative_scan`` lowers to the
    same recurrence but its HLO stalled the TPU backend's compiler for
    tens of minutes — see ops/mesh.py _max_group_size.)
    """
    prev_mask = shift_nd(mask, tuple(1 if a == axis else 0 for a in range(mask.ndim))
                         if not reverse else tuple(-1 if a == axis else 0 for a in range(mask.ndim)),
                         fill=False)
    reset = ~(mask & prev_mask)

    sgn = 1 if not reverse else -1
    n = values.shape[axis]
    v, r = values, reset
    d = 1
    while d < n:
        off = tuple(sgn * d if a == axis else 0 for a in range(values.ndim))
        v_prev = shift_nd(v, off, fill=0)
        r_prev = shift_nd(r, off, fill=True)  # off-edge counts as a reset
        v = jnp.where(r, v, jnp.maximum(v, v_prev))
        r = r | r_prev
        d *= 2
    return jnp.where(mask, v, values)


@partial(jax.jit, static_argnames=("connectivity",))
def label(mask: jax.Array, connectivity: int = 6) -> jax.Array:
    """Connected-component labels (int32, 0 = background).

    Labels are *not* compacted to 1..n (they are representative linear
    indices + 1); use ``relabel_sequential``/``count_regions`` for
    scipy-style consecutive labels.
    """
    mask = mask.astype(jnp.bool_)
    strct = structure_3d(connectivity)
    n = int(np.prod(mask.shape))
    assert n < 2**31 - 1
    lin = jnp.arange(1, n + 1, dtype=jnp.int32).reshape(mask.shape)
    lab0 = jnp.where(mask, lin, 0)

    offs = [o for o in _offsets(strct) if o != (0, 0, 0)]

    def relax(lab):
        # axis run collapse (log-time along straight runs)
        for axis in range(3):
            lab = _segmented_max_scan(lab, mask, axis, reverse=False)
            lab = _segmented_max_scan(lab, mask, axis, reverse=True)
        # neighborhood max for bends/diagonals
        best = lab
        for off in offs:
            best = jnp.maximum(best, shift_nd(lab, off, fill=0))
        return jnp.where(mask, best, 0)

    def body(state):
        lab, _ = state
        new = relax(lab)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda s: s[1], body, (lab0, jnp.bool_(True)))
    return lab


def relabel_sequential(labels: jax.Array) -> Tuple[np.ndarray, int]:
    """Host-side compaction to consecutive labels 1..n (scipy.ndimage.label
    output convention).  Returns (uint32 labels, n)."""
    lab = np.asarray(labels)
    uniq = np.unique(lab)
    uniq = uniq[uniq != 0]
    out = np.zeros(lab.shape, np.uint32)
    for i, u in enumerate(uniq, start=1):
        out[lab == u] = i
    return out, len(uniq)


def count_regions(mask: jax.Array, connectivity: int = 6) -> Tuple[np.ndarray, int]:
    """Label + count connected regions (reference count_regions.rs via
    invesalius_rs/__init__.py:108-111)."""
    return relabel_sequential(label(mask, connectivity))


@jax.jit
def component_sizes(labels: jax.Array) -> jax.Array:
    """Voxel count of each voxel's component (same shape as labels).

    Computed fully on device: scatter-add ones into a flat size table
    indexed by the representative label, then gather back.  The table is
    O(n_voxels) int32 — fine up to ~256^3 volumes; larger interactive ops
    can take the host path (relabel_sequential + bincount).
    """
    flat = labels.reshape(-1)
    n = flat.shape[0]
    sizes = jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)
    per_voxel = sizes[flat]
    return jnp.where(flat > 0, per_voxel, 0).reshape(labels.shape)


@partial(jax.jit, static_argnames=("connectivity",))
def largest_component(mask: jax.Array, connectivity: int = 6) -> jax.Array:
    """Boolean mask of the largest connected component (reference
    imagedata_utils.py:717 / surface keep-largest)."""
    lab = label(mask, connectivity)
    flat = lab.reshape(-1)
    n = flat.shape[0]
    sizes = jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)
    sizes = sizes.at[0].set(0)
    best = jnp.argmax(sizes)
    return (lab == best) & (best > 0)


@partial(jax.jit, static_argnames=("connectivity",))
def fill_holes_automatically(
    mask: jax.Array, max_size: int, connectivity: int = 6
) -> jax.Array:
    """Fill background components of <= max_size voxels with 254.

    Reference semantics (mask.py:519-537 + floodfill.rs:51-94): label the
    *inverted visible* mask (~(mask > 127)), compute component sizes, and
    set mask voxels whose background-component size is in (0, max_size]
    to 254.  Note the reference does NOT exclude border-touching
    components — small pockets at the border are filled too; we match.
    """
    imask = ~(mask > 127)
    lab = label(imask, connectivity)
    flat = lab.reshape(-1)
    n = flat.shape[0]
    sizes = jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)
    per_voxel = sizes[flat].reshape(mask.shape)
    fill = imask & (per_voxel > 0) & (per_voxel <= max_size)
    return jnp.where(fill, jnp.asarray(254, mask.dtype), mask)


def select_part(
    mask: jax.Array, seed_zyx: Tuple[int, int, int], connectivity: int = 6
) -> jax.Array:
    """Connected part of the visible mask containing the seed (reference
    styles.py SelectMaskParts: floodfill with t0=253, t1=255)."""
    from invesalius3_tpu.ops.floodfill import floodfill_threshold, structure_3d as s3

    seeds = jnp.zeros(mask.shape, jnp.bool_).at[seed_zyx].set(True)
    return floodfill_threshold(mask, seeds, 253, 255, s3(connectivity))
