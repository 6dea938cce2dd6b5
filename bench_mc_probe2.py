"""Re-probe after the materialize gather-flattening + dedup gather-ization:
full marching stage timing at 512^3 (stderr only)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_ct
    from invesalius3_tpu.ops import marching as mc, mesh as mesh_ops, watershed

    n = int(os.environ.get("BENCH_SIZE", "512"))
    log(f"mc probe2: {n}^3 on {jax.devices()[0]}")
    ct_host = make_ct(n)
    markers = np.zeros(ct_host.shape, np.int16)
    c = n // 2
    markers[c, c, int(0.61 * n)] = 1
    markers[c, c, c] = 2
    markers[2, 2, 2] = 3

    def synced(*xs):
        s = jnp.float32(0)
        for x in xs:
            s = s + jnp.sum(x.astype(jnp.float32))
        return float(s)

    ct = jnp.asarray(ct_host)
    _ = synced(ct)
    labels = watershed.watershed(ct, jnp.asarray(markers), algorithm="Watershed")
    mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
    _ = synced(mask)
    log("setup done")

    def mc_full():
        dm = mc.mask_to_surface_device(mask, spacing=(0.5, 0.5, 0.5))
        return synced(dm.verts3v, dm.faces3t), dm

    (s0, dm) = mc_full()  # compile + cold
    t0 = time.perf_counter()
    (s1, dm) = mc_full()
    log(f"  mc device full (V={dm.n_verts} T={dm.n_tris}): "
        f"{time.perf_counter() - t0:.3f}s")

    neigh_dv, deg_j = mesh_ops.adjacency_from_device_mesh(dm)
    _ = synced(neigh_dv, deg_j)
    t0 = time.perf_counter()
    neigh_dv, deg_j = mesh_ops.adjacency_from_device_mesh(dm)
    _ = synced(neigh_dv, deg_j)
    log(f"  adjacency: {time.perf_counter() - t0:.3f}s (D={neigh_dv.shape[0]})")

    V = dm.verts3v.shape[1]
    w = jnp.ones((V,), jnp.float32)

    def taubin():
        return synced(mesh_ops._taubin_core(
            dm.verts3v, neigh_dv, deg_j, w,
            jnp.float32(0.5), jnp.float32(-0.53), 10))

    taubin()
    t0 = time.perf_counter()
    taubin()
    log(f"  taubin 10 iters: {time.perf_counter() - t0:.3f}s")

    # degree histogram (host) to size the bucketing idea
    degs = np.asarray(deg_j)[:dm.n_verts]
    hist = {d: int((degs == d).sum()) for d in range(int(degs.max()) + 1)}
    log(f"  degree histogram: {hist}")
    log("probe2 done")


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_tpu_cache"))
    main()
