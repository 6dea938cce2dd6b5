"""Round-4 probe: blocked (hierarchical) vs flat marching extraction on
the real TPU — bit-identity of the DeviceMesh outputs + stage timing at
512^3.  One long-lived process (CLAUDE.md rules 10/16/17)."""

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

    from bench import make_ct
    from invesalius3_tpu.ops import marching as mc
    from invesalius3_tpu.ops import watershed

    n = int(os.environ.get("BENCH_SIZE", "512"))
    log(f"probe8: {n}^3 on {jax.devices()[0]}")
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
    field = jnp.pad((mask >= 127).astype(jnp.uint8), 1).astype(jnp.float32)
    _ = float(jnp.sum(field))
    log("field ready")

    # size the buckets once (counting pass, shared by both variants)
    n_act, n_tri, n_blk = (int(x) for x in mc._count_all(field, 0.5))
    max_active = max(1024, mc._round_bucket(n_act))
    max_tris = max(2048, mc._round_bucket(n_tri))
    max_blocks = max(256, mc._round_bucket(n_blk))
    log(f"counts: act={n_act} tri={n_tri} blk={n_blk} "
        f"buckets: A={max_active} T={max_tris} B={max_blocks}")

    def sync(t):
        for x in t:
            if hasattr(x, "dtype"):
                _ = float(jnp.sum(x.astype(jnp.float32)))

    # warm both
    r_flat = mc._extract_cells(field, 0.5, max_active)
    sync(r_flat)
    r_blk = mc._extract_cells_blocked(field, 0.5, max_blocks, max_active)
    sync(r_blk)

    # identity: corner_lin, vals, ins, valid_cell must match exactly
    names = ["corner_lin", "vals", "ins", "valid_cell", "n_active"]
    ok = True
    for nm, a, b in zip(names, r_flat, r_blk):
        same = bool(jnp.all(a == b))
        log(f"  identity {nm}: {'OK' if same else 'MISMATCH'}")
        ok &= same
    if not ok:
        log("IDENTITY FAILED")
        sys.exit(1)

    # timing: 3 warm reps each
    for label, fn in [
        ("flat", lambda: mc._extract_cells(field, 0.5, max_active)),
        ("blocked", lambda: mc._extract_cells_blocked(
            field, 0.5, max_blocks, max_active)),
        ("count_all", lambda: mc._count_all(field, 0.5)),
    ]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            sync(r if isinstance(r, tuple) else [r])
            ts.append(time.perf_counter() - t0)
        log(f"  {label}: {min(ts):.3f}s (runs {[round(t, 3) for t in ts]})")

    # end-to-end mc stage with the blocked path (as wired)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        dm = mc.mask_to_surface_device(mask, spacing=(0.5, 0.5, 0.5))
        sync([dm.verts3v, dm.faces3t])
        ts.append(time.perf_counter() - t0)
    log(f"  mask_to_surface_device (blocked wired): {min(ts):.3f}s "
        f"(runs {[round(t, 3) for t in ts]}) V={dm.n_verts} T={dm.n_tris}")


if __name__ == "__main__":
    main()
