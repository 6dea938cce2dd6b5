"""Probe 3: bucketed-taubin timing + shear-warp frame times at 512^3,
one process (cold setup through the relay costs ~20 min)."""

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
    from invesalius3_tpu.ops import marching as mc, mesh as mesh_ops, raycast, watershed

    n = int(os.environ.get("BENCH_SIZE", "512"))
    log(f"probe3: {n}^3 on {jax.devices()[0]}")
    ct = jnp.asarray(make_ct(n))
    _ = float(jnp.sum(ct.astype(jnp.float32)))
    log("h2d done")

    # --- raycast frames first (independent of the mesh pipeline) --------
    for name, preset in [("MIP", raycast.builtin_preset("MIP")),
                         ("composite", raycast.builtin_preset("Bone")),
                         ("shaded", raycast.builtin_preset("Soft + Skin II"))]:
        for ds in (1, 2):
            raycast.shear_warp_render(ct, (0.5, 0.5, 0.5), preset,
                                      azimuth=30, elevation=20,
                                      image_size=512, downsample=ds)
            times = []
            for k in range(3):
                t0 = time.perf_counter()
                raycast.shear_warp_render(ct, (0.5, 0.5, 0.5), preset,
                                          azimuth=31 + k, elevation=20,
                                          image_size=512, downsample=ds)
                times.append(time.perf_counter() - t0)
            log(f"  shear-warp {name} ds={ds}: {min(times) * 1000:.0f} ms/frame")

    # --- taubin bucketed vs plain ---------------------------------------
    markers = np.zeros((n, n, n), np.int16)
    c = n // 2
    markers[c, c, int(0.61 * n)] = 1
    markers[c, c, c] = 2
    markers[2, 2, 2] = 3
    labels = watershed.watershed(ct, jnp.asarray(markers), algorithm="Watershed")
    mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
    _ = float(jnp.sum(mask.astype(jnp.float32)))
    dm = mc.mask_to_surface_device(mask, spacing=(0.5, 0.5, 0.5))
    t0 = time.perf_counter()
    dm = mc.mask_to_surface_device(mask, spacing=(0.5, 0.5, 0.5))
    _ = float(jnp.sum(dm.verts3v))
    log(f"  mc device full: {time.perf_counter() - t0:.3f}s "
        f"(V={dm.n_verts} T={dm.n_tris})")

    neigh, deg = mesh_ops.adjacency_from_device_mesh(dm)
    _ = float(jnp.sum(deg.astype(jnp.float32)))
    w = jnp.ones((dm.verts3v.shape[1],), jnp.float32)

    def run(fn, label):
        out = fn()
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        out = fn()
        _ = float(jnp.sum(out))
        log(f"  {label}: {time.perf_counter() - t0:.3f}s")

    run(lambda: mesh_ops._taubin_core(dm.verts3v, neigh, deg, w,
                                      jnp.float32(0.5), jnp.float32(-0.53),
                                      10), "taubin plain 10it")
    run(lambda: mesh_ops.taubin_smooth_bucketed(
        dm.verts3v, neigh, deg, w, jnp.float32(0.5), jnp.float32(-0.53), 10),
        "taubin bucketed 10it")

    # full fused smoothing stage (what bench.py runs)
    out = mesh_ops.ca_smoothing_device(dm, 0.7, 3.0, 0.5, 10)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    out = mesh_ops.ca_smoothing_device(dm, 0.7, 3.0, 0.5, 10)
    _ = float(jnp.sum(out))
    log(f"  ca_smoothing_device full: {time.perf_counter() - t0:.3f}s")
    log("probe3 done")


if __name__ == "__main__":
    main()
