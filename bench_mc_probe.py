"""One-shot probe of marching/taubin internals at 512^3 on the real TPU:
where do the 7.2 s (marching) and 4.8 s (taubin) warm seconds go, and do
the candidate reformulations (structural edge-rank dedup, corner-scatter
taubin) beat the current sort/gather forms?  stderr diagnostics only."""

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
    log(f"mc probe: {n}^3 on {jax.devices()[0]}")
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

    def timed(name, fn, *args, **kw):
        fn(*args, **kw)  # compile + run (cold)
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        log(f"  {name}: {time.perf_counter() - t0:.3f}s")
        return out

    ct = jnp.asarray(ct_host)
    _ = synced(ct)
    labels = watershed.watershed(ct, jnp.asarray(markers), algorithm="Watershed")
    mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
    _ = synced(mask)
    log("setup done")

    # pad like mask_to_surface_device does
    field = jnp.pad((mask >= 127).astype(jnp.uint8), 1)
    n_act, n_tri = (int(x) for x in mc.count_cells_and_triangles(field, 0.5))
    max_active = max(1024, mc._round_bucket(n_act))
    max_tris = mc._round_bucket(max(2048, mc._round_bucket(int(n_tri))))
    log(f"actives={n_act} tris={n_tri} buckets A={max_active} T={max_tris}")

    def count(f):
        return synced(mc.count_cells_and_triangles(f, 0.5)[1])
    timed("count pass", count, field)

    def extract(f):
        out = mc._extract_cells(f, 0.5, max_active)
        return synced(out[0], out[4])
    timed("extract_cells", extract, field)

    corner_lin, vals, ins, valid_cell, _ = mc._extract_cells(field, 0.5, max_active)

    def emit(ins_, vc):
        out = mc._emit_slots(ins_, vc, max_tris)
        return synced(out[1], out[2])
    timed("emit_slots", emit, ins, valid_cell)

    case, tri_slots, _ = mc._emit_slots(ins, valid_cell, max_tris)
    vol_shape = tuple(int(s) for s in field.shape)

    CHUNK = min(1 << 21, 1 << max(0, (max_tris - 1).bit_length() - 3))

    def materialize():
        outs = []
        for i in range(0, max_tris, CHUNK):
            p, k = mc._materialize(corner_lin, vals, ins, case,
                                   jax.lax.dynamic_slice_in_dim(tri_slots, i, CHUNK),
                                   0.5, vol_shape)
            outs.append((p, k))
        return synced(outs[-1][0], outs[-1][1])
    timed(f"materialize x{max(1, max_tris // CHUNK)}", materialize)

    parts = []
    for i in range(0, max_tris, CHUNK):
        parts.append(mc._materialize(corner_lin, vals, ins, case,
                                     jax.lax.dynamic_slice_in_dim(tri_slots, i, CHUNK),
                                     0.5, vol_shape))
    pts = jnp.concatenate([p for p, _ in parts], axis=2)
    keys = jnp.concatenate([k for _, k in parts], axis=1)
    T = pts.shape[2]
    pts_m = pts.transpose(1, 0, 2).reshape(3, 3 * T)
    keys_m = keys.reshape(3 * T)
    _ = synced(pts_m, keys_m)

    def dedup():
        out = mc._dedup_vertices(pts_m, keys_m)
        return synced(out[0], out[1])
    timed(f"dedup sort+scatter (M={3 * T})", dedup)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def sort_only(k):
        _, order = jax.lax.sort_key_val(k, jnp.arange(k.shape[0], dtype=jnp.int32))
        return order
    def run_sort():
        return synced(sort_only(keys_m))
    timed("  (sort_key_val alone)", run_sort)

    # --- structural dedup candidate: rank cut lattice edges by cumsum ----
    Z, Y, X = vol_shape

    @jax.jit
    def structural_ranks(f):
        inside = f > 0.5
        flat = inside.reshape(-1)
        n_total = jnp.int32(0)
        outs = []
        # 7 edge codes: offset (dz, dy, dx) in {0,1}^3 \ {0}
        for code in range(1, 8):
            dx, dy, dz = code & 1, (code >> 1) & 1, (code >> 2) & 1
            a = inside[:Z - dz or None, :Y - dy or None, :X - dx or None]
            b = inside[dz:, dy:, dx:]
            cut = (a ^ b)
            cnt = jnp.cumsum(cut.reshape(-1).astype(jnp.int32))
            outs.append(cnt[-1])
            n_total = n_total + cnt[-1]
        return n_total
    def run_struct():
        return synced(structural_ranks(field.astype(jnp.float32)))
    timed("structural: 7x cut-mask cumsum", run_struct)

    # --- taubin formulations -------------------------------------------
    dm = mc.marching_cubes_device(mask, 127, spacing=(0.5, 0.5, 0.5),
                                  origin_shift=(-0.5, -0.5, -0.5))
    neigh_dv, deg_j = mesh_ops.adjacency_from_device_mesh(dm)
    _ = synced(neigh_dv, deg_j)
    V = dm.verts3v.shape[1]
    log(f"taubin: V={V} D={neigh_dv.shape[0]}")
    w = jnp.ones((V,), jnp.float32)

    def taubin10(v):
        return synced(mesh_ops._taubin_core(v, neigh_dv, deg_j, w,
                                            jnp.float32(0.5), jnp.float32(-0.53), 10))
    timed("taubin 10 iters (gather D,V)", taubin10, dm.verts3v)

    # corner-scatter variant: per pass gather (3, M) + scatter-add (3, M)
    inverse = dm.inverse
    M = inverse.shape[0]
    Tn = dm.faces3t.shape[1]

    @functools.partial(jax.jit, static_argnames=("steps",))
    def taubin_scatter(v, steps: int):
        # data-dependent ones (a constant scatter would const-fold for
        # minutes through the remote-compile hop)
        cnt = jnp.zeros((V,), jnp.float32).at[inverse].add(
            1.0 + 0.0 * v[0, inverse])

        def one(vv, _):
            for factor in (0.5, -0.53):
                cp = vv[:, inverse]  # (3, M) gather
                cp3 = cp.reshape(3, 3, Tn)
                other = (cp3[:, (0 + 1) % 3] + cp3[:, (0 + 2) % 3],
                         cp3[:, (1 + 1) % 3] + cp3[:, (1 + 2) % 3],
                         cp3[:, (2 + 1) % 3] + cp3[:, (2 + 2) % 3])
                osum = jnp.concatenate([o[:, None] for o in other], 1).reshape(3, M)
                acc = jnp.zeros((3, V), jnp.float32)
                acc = acc.at[:, inverse].add(osum)
                mean = acc / jnp.maximum(cnt, 1.0)[None]
                vv = vv + factor * (vv - mean)
            return vv, None
        out, _ = jax.lax.scan(one, v, None, length=steps)
        return out
    def run_ts():
        return synced(taubin_scatter(dm.verts3v, 10))
    timed("taubin 10 iters (corner scatter)", run_ts)

    log("probe done")


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_tpu_cache"))
    main()
