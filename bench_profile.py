"""Fine-grained stage profiler for the 512^3 headline pipeline (stderr
diagnostics; the warm round's stage times are also written to
``.bench_stages.json`` for ``tools/project8.py``'s v5e-8 projection —
bench.py remains the official metric)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synced(x):
    """Force real device execution (block_until_ready returns optimistically
    under the axon plugin): scalar reduce + host read."""
    import jax.numpy as jnp

    if isinstance(x, (list, tuple)):
        for y in x:
            synced(y)
        return
    if hasattr(x, "dtype"):
        _ = float(jnp.sum(x.astype(jnp.float32)))


class T:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.stages = {}  # key -> seconds (warm round overwrites cold)

    def lap(self, name, key=None):
        t = time.perf_counter()
        log(f"  {name}: {t - self.t0:.3f}s")
        self.stages[key or name.split(" (")[0].replace(" ", "_")] = round(
            t - self.t0, 4)
        self.t0 = t


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_ct
    from invesalius3_tpu.ops import marching, mesh as mesh_ops, watershed

    n = int(os.environ.get("BENCH_SIZE", "512"))
    log(f"profile: {n}^3 on {jax.devices()[0]}")
    ct_host = make_ct(n)

    markers = np.zeros(ct_host.shape, np.int16)
    c = n // 2
    markers[c, c, int(0.61 * n)] = 1
    markers[c, c, c] = 2
    markers[2, 2, 2] = 3

    tm = None
    for rnd in range(2):
        log(f"--- round {rnd} ({'cold' if rnd == 0 else 'warm'}) ---")
        tm = T()
        ct = jnp.asarray(ct_host)
        markers_j = jnp.asarray(markers)
        synced(ct)
        tm.lap("h2d")
        tm.stages["h2d_MBps"] = round(
            2 * ct_host.nbytes / 1e6 / max(tm.stages["h2d"], 1e-9), 1)

        labels = watershed.watershed(ct, markers_j, algorithm="Watershed")
        synced(labels)
        tm.lap("watershed")

        mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
        synced(mask)
        tm.lap("mask")

        # -- fused device pipeline ------------------------------------------
        from invesalius3_tpu.ops import mesh as mesh_ops

        dm = marching.mask_to_surface_device(mask, spacing=(0.5, 0.5, 0.5))
        synced([dm.verts3v, dm.faces3t, dm.order])
        tm.lap(f"mc device (V={dm.n_verts} T={dm.n_tris})", key="mc")
        tm.stages["n_verts"], tm.stages["n_tris"] = dm.n_verts, dm.n_tris

        normals3f = mesh_ops._face_normals_3t(dm.verts3v, dm.faces3t)
        synced(normals3f)
        tm.lap("ca normals", key="ca_normals")
        flagged = mesh_ops._staircase_core_3t(
            normals3f, dm.faces3t,
            jnp.zeros((dm.verts3v.shape[1],), jnp.uint8),
            jnp.float32(0.7), jnp.asarray([0., 0., 1.], jnp.float32))
        synced(flagged)
        tm.lap("ca staircase", key="ca_staircase")
        neigh_dv, deg_j = mesh_ops.adjacency_from_device_mesh(dm)
        synced([neigh_dv, deg_j])
        tm.lap(f"ca adjacency (D={neigh_dv.shape[0]})", key="ca_adjacency")
        sx2, sy2, sz2 = dm.spacing
        ox, oy, oz = dm.origin_shift
        vox3v = jnp.stack([(dm.verts3v[2] - oz) / sz2,
                           (dm.verts3v[1] - oy) / sy2,
                           (dm.verts3v[0] - ox) / sx2])
        grid = mesh_ops._rasterize_seeds(vox3v, flagged, dm.vol_shape)
        synced(grid)
        tm.lap("ca rasterize", key="ca_rasterize")
        grid = mesh_ops._chamfer(grid, (sz2, sy2, sx2), 6)
        synced(grid)
        tm.lap("ca chamfer", key="ca_chamfer")
        weights = mesh_ops._grid_weights(grid, vox3v, jnp.float32(3.0),
                                         jnp.float32(0.5))
        synced(weights)
        tm.lap("ca weights sample", key="ca_weights")
        out3v = mesh_ops.taubin_smooth_bucketed(
            dm.verts3v, neigh_dv, deg_j, weights,
            jnp.float32(0.5), jnp.float32(-0.53), 10)
        synced(out3v)
        tm.lap("ca taubin (bucketed)", key="ca_taubin")
        import dataclasses as _dc
        dm2 = _dc.replace(dm, verts3v=out3v)
        smoothed, faces = marching.mesh_to_host(dm2)
        tm.lap(f"mesh_to_host packed (V={len(smoothed)} F={len(faces)})",
               key="mesh_to_host")

        from invesalius3_tpu.io import mesh_io
        import tempfile
        outp = os.path.join(tempfile.gettempdir(), "bench_out.stl")
        mesh_io.write_stl(outp, smoothed, faces)
        tm.lap(f"stl write ({os.path.getsize(outp)/1e6:.0f}MB)", key="stl")

    out_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".bench_stages.json")
    with open(out_json, "w") as fh:
        json.dump({"size": n, "stages": tm.stages}, fh, indent=1)
    log(f"wrote {out_json}")


if __name__ == "__main__":
    main()
