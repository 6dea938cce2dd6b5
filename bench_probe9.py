"""Round-4 probe: gather-based staircase flags vs the 18-scatter
_staircase_core_3t at 512^3 — identity + timing.

Hypothesis: the per-vertex min/max of the off-axis measure over INCIDENT
FACES can ride the dedup sort's run structure: gather `of` into
sorted-corner order (22M indices), then one (D, V) positional gather
(start_v + d) + masked min/max over D rows.  Index count 22M + D*V vs
the 18 colliding 1-D scatter-min/max (6 per axis at T=6.2M each).
Rule 20 risk: at D=16 the positional gather's output (3, 16, 3.1M) f32 =
600 MB may make it bandwidth-bound like the 99M adjacency negative
result — hence measure before wiring.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu_cache"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from bench import make_ct
    from invesalius3_tpu.ops import marching as mc
    from invesalius3_tpu.ops import mesh as mesh_ops
    from invesalius3_tpu.ops import watershed

    n = int(os.environ.get("BENCH_SIZE", "512"))
    log(f"probe9: {n}^3 on {jax.devices()[0]}")
    ct_host = make_ct(n)
    markers = np.zeros(ct_host.shape, np.int16)
    c = n // 2
    markers[c, c, int(0.61 * n)] = 1
    markers[c, c, c] = 2
    markers[2, 2, 2] = 3
    ct = jnp.asarray(ct_host)
    labels = watershed.watershed(ct, jnp.asarray(markers),
                                 algorithm="Watershed")
    mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
    dm = mc.mask_to_surface_device(mask, spacing=(0.5, 0.5, 0.5))
    V = dm.verts3v.shape[1]
    normals3f = mesh_ops._face_normals_3t(dm.verts3v, dm.faces3t)
    _ = float(jnp.sum(normals3f))
    mg = int(mesh_ops._max_group_size(dm.group_of_sorted, dm.sorted_valid))
    D = min(max(8, 1 << (mg - 1).bit_length()), ((mg + 3) // 4) * 4)
    log(f"V={V} T={dm.n_tris} max_deg={mg} D={D}")

    t = jnp.float32(0.7)
    axis = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    zeros_v = jnp.zeros((V,), jnp.uint8)

    @partial(jax.jit, static_argnames=("T", "V", "D"))
    def staircase_gather(normals3f, order, gos, sorted_valid, t, axis,
                         T: int, V: int, D: int):
        axes = jnp.stack([
            axis,
            jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
            jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
        ])
        of = 1.0 - jnp.abs(axes @ normals3f)  # (3, F)
        M = order.shape[0]
        arange = jnp.arange(M, dtype=jnp.int32)
        new_group = jnp.concatenate([
            jnp.ones((1,), jnp.bool_), gos[1:] != gos[:-1]])
        last_group = jnp.concatenate([
            gos[1:] != gos[:-1], jnp.ones((1,), jnp.bool_)])
        _, starts = jax.lax.sort_key_val(
            jnp.where(new_group, gos, M + arange), arange)
        _, ends = jax.lax.sort_key_val(
            jnp.where(last_group, gos, M + arange), arange)
        if V > M:
            fill = jnp.full((V - M,), M, jnp.int32)
            starts = jnp.concatenate([starts, fill])
            ends = jnp.concatenate([ends, fill])
        start_v = starts[:V]
        end_v = ends[:V]
        n_groups = gos[-1] + 1
        garange = jnp.arange(V, dtype=jnp.int32)
        valid_at_start = sorted_valid[jnp.minimum(start_v, M - 1)]
        deg = jnp.where((garange < n_groups) & valid_at_start,
                        end_v - start_v + 1, 0)
        # of in sorted-corner order, padded with a sentinel slot
        tri_sorted = order % T
        of_sorted = of[:, tri_sorted]  # (3, M) — 22M-index gather
        of_sorted = jnp.concatenate(
            [of_sorted, jnp.zeros((3, 1), of.dtype)], axis=1)
        d = jnp.arange(D, dtype=jnp.int32)[:, None]  # (D, 1)
        take = d < deg[None, :]
        pos = jnp.where(take, start_v[None, :] + d, M)  # (D, V)
        vals = of_sorted[:, pos]  # (3, D, V) positional gather
        vmax = jnp.max(jnp.where(take[None], vals, -jnp.inf), axis=1)
        vmin = jnp.min(jnp.where(take[None], vals, jnp.inf), axis=1)
        flag = jnp.any(vmax - vmin >= t, axis=0)
        return (deg > 0) & flag

    def sync(x):
        _ = float(jnp.sum(x.astype(jnp.float32)))

    f_ref = mesh_ops._staircase_core_3t(normals3f, dm.faces3t, zeros_v,
                                        t, axis)
    sync(f_ref)
    f_new = staircase_gather(normals3f, dm.order, dm.group_of_sorted,
                             dm.sorted_valid, t, axis,
                             dm.faces3t.shape[1], V, D)
    sync(f_new)
    same = bool(jnp.all(f_ref == f_new))
    log(f"identity: {'OK' if same else 'MISMATCH'} "
        f"(ref {int(jnp.sum(f_ref))} new {int(jnp.sum(f_new))} flagged)")

    for label, fn in [
        ("scatter (current)", lambda: mesh_ops._staircase_core_3t(
            normals3f, dm.faces3t, zeros_v, t, axis)),
        ("gather (probe)", lambda: staircase_gather(
            normals3f, dm.order, dm.group_of_sorted, dm.sorted_valid,
            t, axis, dm.faces3t.shape[1], V, D)),
    ]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        log(f"  {label}: {min(ts):.3f}s (runs {[round(x, 3) for x in ts]})")


if __name__ == "__main__":
    main()
