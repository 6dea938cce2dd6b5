"""Fine-grained stage profiler for the 512^3 headline pipeline (stderr
diagnostics only — bench.py remains the official metric)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np


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

    def lap(self, name):
        t = time.perf_counter()
        log(f"  {name}: {t - self.t0:.3f}s")
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

    for rnd in range(2):
        log(f"--- round {rnd} ({'cold' if rnd == 0 else 'warm'}) ---")
        tm = T()
        ct = jnp.asarray(ct_host)
        markers_j = jnp.asarray(markers)
        synced(ct)
        tm.lap("h2d")

        labels = watershed.watershed(ct, markers_j, algorithm="Watershed")
        synced(labels)
        tm.lap("watershed")

        mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
        synced(mask)
        tm.lap("mask")

        # -- marching internals --------------------------------------------
        vis = jnp.pad((mask >= 127).astype(jnp.uint8), 1)
        n_act, n_tri = (int(x) for x in
                        marching.count_cells_and_triangles(vis, 0.5))
        tm.lap(f"mc count (A={n_act} T={n_tri})")
        max_active = max(1024, marching._next_pow2(n_act))
        max_tris = max(2048, marching._next_pow2(n_tri))
        corner_lin, vals, ins, valid_cell, n_active = marching._extract_cells(
            vis, 0.5, max_active)
        synced([corner_lin, vals])
        tm.lap("mc extract_cells")
        case, tri_slots, n_tris_d = marching._emit_slots(ins, valid_cell, max_tris)
        synced([case, tri_slots])
        tm.lap("mc emit_slots")
        CHUNK = 1 << 21
        vol_shape = tuple(int(s) for s in vis.shape)
        if max_tris <= CHUNK:
            pts, keys = marching._materialize(
                corner_lin, vals, ins, case, tri_slots, 0.5, vol_shape)
        else:
            pp, kk = [], []
            for i in range(0, max_tris, CHUNK):
                p, k = marching._materialize(
                    corner_lin, vals, ins, case,
                    jax.lax.dynamic_slice_in_dim(tri_slots, i, CHUNK),
                    0.5, vol_shape)
                pp.append(p); kk.append(k)
            pts = jnp.concatenate(pp, axis=2); keys = jnp.concatenate(kk, axis=2)
        synced([pts])
        tm.lap("mc materialize")
        Tn = pts.shape[2]
        pts_m = pts.transpose(1, 0, 2).reshape(3, 3 * Tn)
        keys_m = keys.transpose(1, 0, 2).reshape(2, 3 * Tn)
        verts_d, inverse_d, n_groups = marching._dedup_vertices(pts_m, keys_m)
        synced([verts_d])
        tm.lap("mc dedup (device)")
        n_groups = int(n_groups)
        verts = np.asarray(verts_d[:, :n_groups]).T
        tm.lap(f"mc verts d2h ({verts.nbytes/1e6:.0f}MB)")
        inverse = np.asarray(inverse_d).reshape(3, Tn)
        tm.lap(f"mc inverse d2h ({inverse.nbytes/1e6:.0f}MB)")
        n_tris_i = int(n_tris_d)
        faces = inverse[:, :n_tris_i].T.astype(np.int32)
        sx = sy = sz = 0.5
        world = np.stack([verts[:, 2] * sx, verts[:, 1] * sy, verts[:, 0] * sz], 1)
        verts_w = world.astype(np.float32) - np.float32(0.5)
        faces = faces[:, ::-1]
        tm.lap(f"mc host assemble (V={len(verts_w)} F={len(faces)})")

        # -- ca_smoothing internals -----------------------------------------
        verts3v = jnp.asarray(verts_w, jnp.float32).T
        faces_j = jnp.asarray(faces)
        synced([verts3v, faces_j])
        tm.lap("ca h2d")
        normals3f = mesh_ops._face_normals_t(verts3v, faces_j)
        synced(normals3f)
        tm.lap("ca normals")
        flagged = mesh_ops._staircase_core_t(
            normals3f, faces_j, jnp.zeros((verts3v.shape[1],), jnp.uint8),
            jnp.float32(0.7), jnp.asarray([0., 0., 1.], jnp.float32))
        synced(flagged)
        tm.lap("ca staircase")
        neigh, deg_j = mesh_ops.vertex_adjacency_fast(faces, len(verts_w))
        neigh_dv = jnp.asarray(neigh).T
        synced([neigh_dv, deg_j])
        tm.lap(f"ca adjacency (D={neigh_dv.shape[0]})")
        weights = mesh_ops._propagate_core_t(
            verts3v, neigh_dv, deg_j, flagged, jnp.float32(3.0),
            jnp.float32(0.5), 12)
        synced(weights)
        tm.lap("ca propagate")
        out = mesh_ops._taubin_core(verts3v, neigh_dv, deg_j, weights,
                                    jnp.float32(0.5), jnp.float32(-0.53), 10)
        synced(out)
        tm.lap("ca taubin")
        smoothed = np.asarray(out.T)
        tm.lap("ca d2h")

        from invesalius3_tpu.io import mesh_io
        import tempfile
        outp = os.path.join(tempfile.gettempdir(), "bench_out.stl")
        mesh_io.write_stl(outp, smoothed, faces)
        tm.lap(f"stl write ({os.path.getsize(outp)/1e6:.0f}MB)")


if __name__ == "__main__":
    main()
