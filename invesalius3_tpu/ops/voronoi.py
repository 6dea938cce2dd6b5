"""Voronoi labeling over voxel grids: jump flooding (JFA) and
floodfill-Voronoi.

Reference: invesalius_rs/src/floodfill.rs — ``jump_flooding_internal``
:298 (27-neighbor JFA with halving offsets, optional normalization that
recenters sites at their basin centroids and rescales distances to [0,1])
and ``floodfill_voronoi_inplace`` :239; exported via
invesalius_rs/__init__.py jump_flooding / floodfill_voronoi.

JFA is the textbook TPU-friendly algorithm: log2(max_dim) rounds of 27
shifted compare-and-takes — pure VPU, no queues.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu.ops.morphology import shift_nd

_INF = jnp.float32(3.0e38)


@jax.jit
def jump_flooding(
    shape_vol: jax.Array,  # any (Z, Y, X) array for shape reference
    sites: jax.Array,  # (S, 3) int32 (z, y, x); negative/oob rows ignored
) -> Tuple[jax.Array, jax.Array]:
    """Returns (owners int32 (Z, Y, X), distance float32) where owners are
    1-based site indices (reference convention); 0 = unclaimed."""
    Z, Y, X = shape_vol.shape

    zz = jnp.arange(Z, dtype=jnp.float32)[:, None, None]
    yy = jnp.arange(Y, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(X, dtype=jnp.float32)[None, None, :]

    s = sites.astype(jnp.int32)
    valid = (
        (s[:, 0] >= 0) & (s[:, 0] < Z)
        & (s[:, 1] >= 0) & (s[:, 1] < Y)
        & (s[:, 2] >= 0) & (s[:, 2] < X)
    )

    owners = jnp.zeros((Z, Y, X), jnp.int32)
    dist = jnp.full((Z, Y, X), _INF)
    # seed: scatter site ids (1-based)
    sz = jnp.where(valid, s[:, 0], 0)
    sy = jnp.where(valid, s[:, 1], 0)
    sx = jnp.where(valid, s[:, 2], 0)
    ids = jnp.where(valid, jnp.arange(1, s.shape[0] + 1, dtype=jnp.int32), 0)
    owners = owners.at[sz, sy, sx].max(ids)
    dist = dist.at[sz, sy, sx].min(jnp.where(valid, 0.0, _INF))

    site_pos = s.astype(jnp.float32)  # (S, 3)

    def site_dist(owner):
        """Distance from each voxel to its owner's site position."""
        idx = jnp.maximum(owner - 1, 0)
        pz = site_pos[idx, 0]
        py = site_pos[idx, 1]
        px = site_pos[idx, 2]
        d = jnp.sqrt((zz - pz) ** 2 + (yy - py) ** 2 + (xx - px) ** 2)
        return jnp.where(owner > 0, d, _INF)

    max_dim = max(Z, Y, X)
    steps = []
    k = 1
    while k < max_dim:
        k *= 2
    k //= 2
    while k >= 1:
        steps.append(k)
        k //= 2

    for step in steps:
        best_owner = owners
        best_dist = site_dist(owners)
        for dz in (-step, 0, step):
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    if dz == dy == dx == 0:
                        continue
                    cand = shift_nd(owners, (dz, dy, dx), fill=0)
                    cand_dist = site_dist(cand)
                    take = cand_dist < best_dist
                    best_owner = jnp.where(take, cand, best_owner)
                    best_dist = jnp.where(take, cand_dist, best_dist)
        owners = best_owner
        dist = best_dist

    return owners, jnp.where(owners > 0, dist, _INF)


def jump_flooding_normalized(shape_vol, sites):
    """JFA + the reference's ``normalize`` post-pass (floodfill.rs:421-503):
    recompute per-basin centroids, distances to them, scaled to [0, 1] per
    basin."""
    owners, _ = jump_flooding(shape_vol, sites)
    owners_np = np.asarray(owners)
    Z, Y, X = owners_np.shape
    zz, yy, xx = np.mgrid[:Z, :Y, :X]
    n_sites = int(np.asarray(sites).shape[0])
    dist = np.zeros(owners_np.shape, np.float32)
    for i in range(1, n_sites + 1):
        sel = owners_np == i
        if not sel.any():
            continue
        cz, cy, cx = (int(zz[sel].mean()), int(yy[sel].mean()), int(xx[sel].mean()))
        d = np.sqrt((zz[sel] - cz) ** 2 + (yy[sel] - cy) ** 2 + (xx[sel] - cx) ** 2)
        mx = d.max()
        dist[sel] = d / mx if mx > 0 else 0.0
    return owners_np, dist


def floodfill_voronoi(
    data_shape: Tuple[int, int, int],
    seeds_zyx,
    distance_fn: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Voronoi via JFA (the reference's floodfill_voronoi computes the same
    partition with a stack walk; distance_fn 0 = squared euclidean,
    1 = manhattan)."""
    import jax.numpy as jnp

    sites = jnp.asarray(np.asarray(seeds_zyx, np.int32))
    owners, dist = jump_flooding(jnp.zeros(data_shape, jnp.uint8), sites)
    owners_np = np.asarray(owners)
    if distance_fn == 0:
        d = np.asarray(dist) ** 2
    else:
        # manhattan to owner site
        Z, Y, X = data_shape
        zz, yy, xx = np.mgrid[:Z, :Y, :X]
        s = np.asarray(seeds_zyx)
        idx = np.maximum(owners_np - 1, 0)
        d = (np.abs(zz - s[idx, 0]) + np.abs(yy - s[idx, 1]) + np.abs(xx - s[idx, 2])).astype(np.float32)
    return owners_np, d
