"""Probe 5: multi-bucket taubin (d<=5 / 6 / 7 / D) vs the two-bucket
round-3 path, on the REAL degree profile measured at 128^3 (70% deg 6,
14% <=5, 12% deg 7, 4% tail; max 12 at 512^3)."""
import sys, time
import numpy as np

def log(*a): print(*a, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from invesalius3_tpu.ops import mesh as mesh_ops

    V = 3_145_728
    D = 12
    rng = np.random.default_rng(0)
    deg = rng.choice([4, 5, 6, 7, 8, 12], size=V,
                     p=[0.04, 0.10, 0.70, 0.12, 0.03, 0.01]).astype(np.int32)
    base = rng.integers(-6000, 6000, size=(D, V))
    neigh_np = np.clip(np.arange(V)[None, :] + base, 0, V - 1).astype(np.int32)
    verts_np = rng.standard_normal((3, V)).astype(np.float32)
    neigh = jnp.asarray(neigh_np); verts = jnp.asarray(verts_np)
    deg_j = jnp.asarray(deg)
    w = jnp.ones((V,), jnp.float32)

    def synced(x): return float(jnp.sum(x.astype(jnp.float32)))
    _ = synced(verts) + synced(neigh) + synced(deg_j)
    log(f"probe5 on {jax.devices()[0]}: V={V} sum(deg)={deg.sum()}")

    def timed(name, fn):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
        log(f"  {name}: best {min(ts):.3f}s")

    for caps in [(6,), (5, 6, 7), (4, 5, 6, 7, 8)]:
        timed(f"bucketed caps={caps} 10 iters",
              lambda caps=caps: synced(mesh_ops.taubin_smooth_bucketed(
                  verts, neigh, deg_j, w, jnp.float32(0.5),
                  jnp.float32(-0.53), 10, d_caps=caps)))
    log("probe5 done")

if __name__ == "__main__":
    main()
