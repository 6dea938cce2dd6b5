"""Multi-chip sharded volume operations: Z-sharded kernels with halo
exchange over ICI.

The structural analog of the reference's slab parallelism (reference
surface.py:1360-1430: 20-slice slabs, 1-slice overlap, spawn pool):
volumes shard along Z over the mesh; elementwise kernels (threshold,
WW/WL) need no communication; neighborhood kernels (dilation, active-cell
detection for marching cubes, floodfill fixpoints) exchange a 1-slice halo
with ``jax.lax.ppermute`` — the ICI version of the reference's overlapped
slabs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from invesalius3_tpu.ops.morphology import _offsets


def halo_exchange_z(x: jax.Array, axis_name: str = "z") -> Tuple[jax.Array, jax.Array]:
    """Inside shard_map: return (slice from the previous shard, slice from
    the next shard) — each (1, Y, X); edges receive zeros."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:1]
    bottom = x[-1:]
    # send my bottom slice to the next shard (it becomes their "prev")
    prev_halo = jax.lax.ppermute(bottom, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    next_halo = jax.lax.ppermute(top, axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    prev_halo = jnp.where(idx == 0, jnp.zeros_like(prev_halo), prev_halo)
    next_halo = jnp.where(idx == n - 1, jnp.zeros_like(next_halo), next_halo)
    return prev_halo, next_halo


def sharded_threshold_mask(mesh: Mesh):
    """Z-sharded threshold (pure elementwise; sharding propagates, no
    collectives)."""
    from invesalius3_tpu.ops.threshold import threshold_new_mask

    @partial(jax.jit, static_argnums=())
    def f(image, tmin, tmax):
        return threshold_new_mask(image, tmin, tmax)

    return f


def sharded_binary_dilation(mesh: Mesh, strct: np.ndarray, axis_name: str = "z"):
    """Binary dilation over a Z-sharded volume: each shard dilates locally
    after receiving 1-slice halos from its neighbors (structuring elements
    up to 3 deep in Z)."""
    from jax.experimental.shard_map import shard_map

    offs = _offsets(strct)
    assert all(abs(o[0]) <= 1 for o in offs), "halo depth 1 supports Z-extent-3 elements"

    def local(x):
        prev_halo, next_halo = halo_exchange_z(x.astype(jnp.bool_), axis_name)
        padded = jnp.concatenate([prev_halo.astype(jnp.bool_), x.astype(jnp.bool_),
                                  next_halo.astype(jnp.bool_)], axis=0)
        out = jnp.zeros_like(padded)
        from invesalius3_tpu.ops.morphology import shift_nd

        for off in offs:
            out = out | shift_nd(padded, off, fill=False)
        return out[1:-1]

    spec = P(axis_name, None, None)
    return jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec))


def sharded_floodfill_threshold(mesh: Mesh, strct: np.ndarray, axis_name: str = "z",
                                steps_per_check: int = 8):
    """Z-sharded region grow: the fixpoint loop runs *inside* shard_map so
    each iteration's halo exchange rides ICI; convergence is checked with a
    global psum, mirroring the reference's overlapping-slab stitching."""
    from jax.experimental.shard_map import shard_map
    from invesalius3_tpu.ops.morphology import shift_nd

    offs = _offsets(strct)
    assert all(abs(o[0]) <= 1 for o in offs)

    def local(data, seeds, t0, t1):
        allowed = (data >= t0) & (data <= t1)
        reached0 = seeds & allowed

        def dilate_with_halo(r):
            prev_halo, next_halo = halo_exchange_z(r, axis_name)
            padded = jnp.concatenate([prev_halo, r, next_halo], axis=0)
            out = jnp.zeros_like(padded)
            for off in offs:
                out = out | shift_nd(padded, off, fill=False)
            return out[1:-1] & allowed | r

        def body(state):
            r, _ = state
            new = r
            for _ in range(steps_per_check):
                new = dilate_with_halo(new)
            changed_local = jnp.any(new != r)
            changed = jax.lax.psum(changed_local.astype(jnp.int32), axis_name) > 0
            return new, changed

        reached, _ = jax.lax.while_loop(lambda s: s[1], body, (reached0, jnp.bool_(True)))
        return reached

    spec = P(axis_name, None, None)
    return jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, P(), P()),
            out_specs=spec,
        )
    )


def sharded_active_cell_count(mesh: Mesh, axis_name: str = "z"):
    """Marching-cubes active-cell count over a Z-sharded mask volume with a
    1-slice halo (cells straddle shard boundaries; each shard owns the
    cells that START in it)."""
    from jax.experimental.shard_map import shard_map

    def local(vis):
        prev_halo, next_halo = halo_exchange_z(vis, axis_name)
        del prev_halo
        padded = jnp.concatenate([vis, next_halo], axis=0)  # (z+1, Y, X)
        c = padded
        Z1, Y, X = c.shape
        agg_any = jnp.zeros((Z1 - 1, Y - 1, X - 1), jnp.bool_)
        agg_all = jnp.ones((Z1 - 1, Y - 1, X - 1), jnp.bool_)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    corner = c[dz : dz + Z1 - 1, dy : dy + Y - 1, dx : dx + X - 1]
                    agg_any = agg_any | corner
                    agg_all = agg_all & corner
        n = jax.lax.axis_index(axis_name)
        last = jax.lax.axis_size(axis_name) - 1
        active = agg_any & ~agg_all
        # the final shard's trailing halo row is zeros: cells there are
        # partially fictitious only when the mask touches the global border,
        # which mask_to_surface's padding already prevents.
        count = jnp.sum(active.astype(jnp.int32))
        return jax.lax.psum(count, axis_name)[None]

    spec = P(axis_name, None, None)
    return jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=P(axis_name)))
