"""Probe 6: marching_cubes_device sub-stage timings at 512^3 on-device
(mask synthesized on the TPU — no h2d through the degraded relay)."""
import sys, time
import numpy as np

def log(*a): print(*a, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from invesalius3_tpu.ops import marching

    N = 512
    @jax.jit
    def make_mask():
        z = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 0) - N/2
        y = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 1) - N/2
        x = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 2) - N/2
        r = jnp.sqrt(z*z + y*y + x*x)
        return jnp.where((r >= 160) & (r < 208), jnp.uint8(1), jnp.uint8(0))

    def synced(x): return float(jnp.sum(x.astype(jnp.float32)))
    vis = jnp.pad(make_mask(), 1)
    _ = synced(vis)
    log(f"probe6 on {jax.devices()[0]}: vis sum={int(synced(vis))}")

    def timed(name, fn):
        out = fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
        log(f"  {name}: best {min(ts):.3f}s")
        return out

    iso = 0.5
    n_act, n_tri = timed("count_cells_and_triangles", lambda: [
        int(x) for x in marching.count_cells_and_triangles(vis, iso)])
    log(f"  n_act={n_act} n_tri={n_tri}")
    max_active = max(1024, marching._round_bucket(n_act))
    max_tris = max(2048, marching._round_bucket(n_tri))

    ext = timed("_extract_cells", lambda: jax.block_until_ready(
        marching._extract_cells(vis, iso, max_active)))
    corner_lin, vals, ins, valid_cell, n_active = ext
    _ = synced(corner_lin)

    em = timed("_emit_slots", lambda: jax.block_until_ready(
        marching._emit_slots(ins, valid_cell, max_tris)))
    case, tri_slots, n_tris = em
    _ = synced(tri_slots)

    vol_shape = tuple(int(s) for s in vis.shape)
    CHUNK = min(1 << 21, 1 << max(0, (max_tris - 1).bit_length() - 3))
    def mat():
        if max_tris <= CHUNK:
            return jax.block_until_ready(marching._materialize(
                corner_lin, vals, ins, case, tri_slots, iso, vol_shape))
        ps, ks = [], []
        for i in range(0, max_tris, CHUNK):
            p, k = marching._materialize(
                corner_lin, vals, ins, case,
                jax.lax.dynamic_slice_in_dim(tri_slots, i, CHUNK),
                iso, vol_shape)
            ps.append(p); ks.append(k)
        out = jnp.concatenate(ps, axis=2), jnp.concatenate(ks, axis=1)
        jax.block_until_ready(out)
        return out
    pts, keys = timed(f"materialize (max_tris={max_tris}, CHUNK={CHUNK})", mat)
    _ = synced(keys)

    T = pts.shape[2]
    pts_m = pts.transpose(1, 0, 2).reshape(3, 3 * T)
    keys_m = keys.reshape(3 * T)
    dd = timed("_dedup_vertices", lambda: jax.block_until_ready(
        marching._dedup_vertices(pts_m, keys_m)))
    verts_d, inverse_d, n_groups, order, group_of_sorted = dd
    n_groups = int(n_groups)
    V_pad = max(1024, marching._round_bucket(n_groups))
    vd = (verts_d[:, :V_pad] if V_pad <= verts_d.shape[1]
          else jnp.pad(verts_d, ((0, 0), (0, V_pad - verts_d.shape[1]))))
    timed("_finalize_device", lambda: jax.block_until_ready(
        marching._finalize_device(vd, inverse_d, T, (0.5, 0.5, 0.5),
                                  (-0.5, -0.5, -0.5))))
    log(f"probe6 done: V={n_groups} T={n_tris}")

if __name__ == "__main__":
    main()
