"""Region-growing (floodfill) kernels.

The reference implements these as sequential BFS/DFS over a VecDeque in Rust
(reference invesalius_rs/src/floodfill.rs: ``floodfill_internal`` :5,
``generic_floodfill_threshold`` :96, auto-threshold in floodfill_py.rs:13,
``fill_holes_automatically`` :51) driven from the GUI floodfill tools
(reference styles.py:2434 mask floodfill, :3015 region-grow segmentation,
mask.py:519 fill_holes_auto).

TPU design: BFS reachability == the least fixpoint of
``reached = seeds | (dilate(reached) & allowed)``, so each kernel is a
``lax.while_loop`` whose body performs K masked dilations (one fused VPU
pass each) and whose predicate checks convergence.  The result is exactly
the set a BFS reaches for the same structuring element, independent of
visit order.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu.ops.morphology import binary_dilation, shift_nd, structure_3d
from invesalius3_tpu.ops.windowing import get_lut_value_255

# Dilations per convergence check: amortizes the jnp.any() reduction.
_STEPS_PER_CHECK = 8


def seeds_to_mask(shape: Tuple[int, int, int], seeds_zyx: Sequence[Tuple[int, int, int]]) -> jax.Array:
    """Boolean seed mask from (z, y, x) seed coordinates.

    Note: the reference's public API passes seeds as (x, y, z)
    (invesalius_rs/__init__.py floodfill_threshold); this framework uses
    (z, y, x) everywhere to match array indexing — converters at the API
    boundary handle the flip.
    """
    m = np.zeros(shape, bool)
    for z, y, x in seeds_zyx:
        m[z, y, x] = True
    return jnp.asarray(m)


def _grow_fixpoint(seeds: jax.Array, allowed: jax.Array, strct: np.ndarray) -> jax.Array:
    """Least fixpoint of reached = seeds|(dilate(reached) & allowed)."""
    reached0 = seeds & allowed

    def body(state):
        reached, _ = state
        new = reached
        for _ in range(_STEPS_PER_CHECK):
            new = new | (binary_dilation(new, strct) & allowed)
        return new, jnp.any(new != reached)

    def cond(state):
        return state[1]

    reached, _ = jax.lax.while_loop(cond, body, (reached0, jnp.bool_(True)))
    return reached


def floodfill_threshold(
    data: jax.Array,
    seeds: jax.Array,
    t0: float,
    t1: float,
    strct: np.ndarray | None = None,
) -> jax.Array:
    """Grow seeds through voxels whose intensity lies in [t0, t1] under the
    structuring element (reference floodfill.rs:96-166).  Returns the
    reached boolean mask; callers write their fill value into it."""
    if strct is None:
        strct = structure_3d(6)
    allowed = (data >= t0) & (data <= t1)
    return _grow_fixpoint(seeds.astype(jnp.bool_), allowed, strct)


def floodfill_value(
    data: jax.Array, seeds: jax.Array, value, strct: np.ndarray | None = None
) -> jax.Array:
    """Grow through voxels exactly equal to ``value`` (reference
    floodfill.rs:5-49 ``floodfill_internal``, 6-connected)."""
    if strct is None:
        strct = structure_3d(6)
    allowed = data == value
    return _grow_fixpoint(seeds.astype(jnp.bool_), allowed, strct)


def floodfill_auto_threshold(
    data: jax.Array, seeds: jax.Array, p: float
) -> jax.Array:
    """Dynamic-window region grow: a neighbor n of a reached voxel v joins
    iff data[n] in [ceil(data[v]*(1-p)), floor(data[v]*(1+p))] — the
    per-edge relation of reference floodfill_py.rs:13-80 (6-connected).

    Because the admission window depends on the *source* voxel, this is a
    reachability problem over a voxel graph with per-edge predicates; the
    fixpoint iterates per-direction shifted edge tests.
    """
    d = data.astype(jnp.float32)
    t0 = jnp.ceil(d * (1.0 - p)).astype(data.dtype)
    t1 = jnp.floor(d * (1.0 + p)).astype(data.dtype)

    offsets = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]

    def expand(reached):
        new = reached
        for off in offsets:
            src_reached = shift_nd(reached, off, fill=False)
            src_t0 = shift_nd(t0, off, fill=0)
            src_t1 = shift_nd(t1, off, fill=0)
            ok = src_reached & (data >= src_t0) & (data <= src_t1)
            new = new | ok
        return new

    def body(state):
        reached, _ = state
        new = reached
        for _ in range(_STEPS_PER_CHECK):
            new = expand(new)
        return new, jnp.any(new != reached)

    reached, _ = jax.lax.while_loop(
        lambda s: s[1], body, (seeds.astype(jnp.bool_), jnp.bool_(True))
    )
    return reached


# ---------------------------------------------------------------------------
# GUI-level region-grow flavors (reference styles.py:3015-3250)
# ---------------------------------------------------------------------------


def region_grow_dynamic(
    data: jax.Array,
    seed_zyx: Tuple[int, int, int],
    dev_min: float,
    dev_max: float,
    use_ww_wl: bool = False,
    ww: float = 255.0,
    wl: float = 127.5,
    strct: np.ndarray | None = None,
) -> jax.Array:
    """'Dynamic' method: window [v - dev_min, v + dev_max] around the seed
    value, optionally on the WW/WL-mapped image (reference
    styles.py:3166-3179)."""
    img = get_lut_value_255(data, ww, wl) if use_ww_wl else data
    v = img[seed_zyx]
    seeds = jnp.zeros(data.shape, jnp.bool_).at[seed_zyx].set(True)
    return floodfill_threshold(img, seeds, v - dev_min, v + dev_max, strct)


def region_grow_confidence(
    data: jax.Array,
    seed_zyx: Tuple[int, int, int],
    mult: float = 2.5,
    iters: int = 3,
    use_ww_wl: bool = False,
    ww: float = 255.0,
    wl: float = 127.5,
    strct: np.ndarray | None = None,
) -> jax.Array:
    """'Confidence' method (reference styles.py:3225-3250 do_rg_confidence):
    start from the 3x3x3 neighborhood of the seed; iteratively re-estimate
    [mean - mult*std, mean + mult*std] over the grown region and re-grow."""
    img = (get_lut_value_255(data, ww, wl) if use_ww_wl else data).astype(jnp.float32)
    z, y, x = seed_zyx
    bool_mask = jnp.zeros(data.shape, jnp.bool_)
    zz = slice(max(z - 1, 0), min(z + 2, data.shape[0]))
    yy = slice(max(y - 1, 0), min(y + 2, data.shape[1]))
    xx = slice(max(x - 1, 0), min(x + 2, data.shape[2]))
    bool_mask = bool_mask.at[zz, yy, xx].set(True)
    seeds = jnp.zeros(data.shape, jnp.bool_).at[seed_zyx].set(True)

    out = jnp.zeros(data.shape, jnp.bool_)
    for _ in range(iters):
        cnt = jnp.sum(bool_mask)
        mean = jnp.sum(jnp.where(bool_mask, img, 0.0)) / cnt
        var = jnp.sqrt(jnp.sum(jnp.where(bool_mask, (img - mean) ** 2, 0.0)) / cnt)
        t0 = mean - var * mult
        t1 = mean + var * mult
        out = out | floodfill_threshold(img, seeds, t0, t1, strct)
        bool_mask = bool_mask | out
    return out


def apply_fill(mask: jax.Array, reached: jax.Array, fill_value: int) -> jax.Array:
    """mask[reached] = fill_value (the reference writes fill in place)."""
    return jnp.where(reached, jnp.asarray(fill_value, mask.dtype), mask)
