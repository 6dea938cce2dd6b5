"""Probe 4: can taubin's neighbor gather go faster than ~3.7 ns/element?

The (3, V) lane-axis gather formulation costs 240 ms/pass at V=3.1M,
D=12 (4.8 s for 10 two-pass iterations) — issue-bound, ~2000x off HBM
bandwidth.  Candidates measured here on the real TPU:

  a) current lane gather on (3, V)         — baseline
  b) row gather on (V, 128) f32 rows        — per-index whole-row DMA?
  c) row gather on (V, 8) f32 rows          — same but logically narrow
  d) flat 1-D gather on (3V,)               — no batch dim
  e) sort-based compaction for extract_cells' nonzero

Each variant computes the same masked neighbor-sum so outputs are
comparable; timings force a scalar host read (relay block_until_ready
is optimistic).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    V = 3_145_728
    D = 12
    rng = np.random.default_rng(0)
    # degree profile like marching-tet meshes: mostly 4-8, max 12
    deg = rng.choice([4, 5, 6, 7, 8, 12], size=V,
                     p=[0.18, 0.22, 0.30, 0.15, 0.12, 0.03]).astype(np.int32)
    # neighbors of vertex i concentrated near i (lattice-sorted locality)
    base = rng.integers(-6000, 6000, size=(D, V))
    neigh_np = np.clip(np.arange(V)[None, :] + base, 0, V - 1).astype(np.int32)
    verts_np = rng.standard_normal((3, V)).astype(np.float32)

    neigh = jnp.asarray(neigh_np)
    verts = jnp.asarray(verts_np)
    deg_j = jnp.asarray(deg)
    valid_np = (np.arange(D)[:, None] < deg[None, :])

    def synced(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    _ = synced(verts) + synced(neigh) + synced(deg_j)
    log(f"probe4 on {jax.devices()[0]}: V={V} D={D}")

    def timed(name, fn, *args):
        fn(*args)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(*args)
            ts.append(time.perf_counter() - t0)
        log(f"  {name}: best {min(ts):.3f}s")

    PASSES = 4  # per timed call

    @jax.jit
    def lane_gather(v, nb, dg):
        valid = (jnp.arange(D)[:, None] < dg[None, :]).astype(jnp.float32)
        acc = v
        for _ in range(PASSES):
            nbv = acc[:, nb]  # (3, D, V)
            s = jnp.sum(nbv * valid[None], axis=1)
            acc = acc + 0.01 * s
        return jnp.sum(acc)

    timed("a) lane gather (3,V), 4 passes", lambda: float(
        lane_gather(verts, neigh, deg_j)))

    @jax.jit
    def row_gather_128(v, nb, dg):
        vr = jnp.zeros((V, 128), jnp.float32)
        vr = vr.at[:, :3].set(v.T)
        for _ in range(PASSES):
            acc = jnp.zeros((V, 128), jnp.float32)
            for d in range(D):
                m = (dg > d).astype(jnp.float32)
                acc = acc + vr[nb[d]] * m[:, None]
            vr = vr + 0.01 * acc
        return jnp.sum(vr[:, :3])

    timed("b) row gather (V,128), 4 passes", lambda: float(
        row_gather_128(verts, neigh, deg_j)))

    @jax.jit
    def row_gather_8(v, nb, dg):
        vr = jnp.zeros((V, 8), jnp.float32)
        vr = vr.at[:, :3].set(v.T)
        for _ in range(PASSES):
            acc = jnp.zeros((V, 8), jnp.float32)
            for d in range(D):
                m = (dg > d).astype(jnp.float32)
                acc = acc + vr[nb[d]] * m[:, None]
            vr = vr + 0.01 * acc
        return jnp.sum(vr[:, :3])

    timed("c) row gather (V,8), 4 passes", lambda: float(
        row_gather_8(verts, neigh, deg_j)))

    @jax.jit
    def flat_gather(v, nb, dg):
        valid = (jnp.arange(D)[:, None] < dg[None, :]).astype(jnp.float32)
        acc = v
        for _ in range(PASSES):
            vf = acc.reshape(-1)  # (3V,)
            s = None
            for c in range(3):
                sc = None
                for d in range(D):
                    g = vf[c * V + nb[d]] * valid[d]
                    sc = g if sc is None else sc + g
                s = sc[None] if s is None else jnp.concatenate([s, sc[None]])
            acc = acc + 0.01 * s
        return jnp.sum(acc)

    timed("d) flat 1-D gather, 4 passes", lambda: float(
        flat_gather(verts, neigh, deg_j)))

    # e) extract-cells nonzero: cumsum-scatter (jnp.nonzero) vs sort
    N = 511 ** 3
    act_np = np.zeros(N, np.bool_)
    act_np[rng.choice(N, size=1_000_000, replace=False)] = True
    act = jnp.asarray(act_np)
    _ = synced(act)
    MAXA = 1 << 20

    @jax.jit
    def nz_builtin(a):
        (ids,) = jnp.nonzero(a, size=MAXA, fill_value=-1)
        return jnp.sum(ids)

    timed("e1) jnp.nonzero(size=1M) over 133M", lambda: float(nz_builtin(act)))

    @jax.jit
    def nz_sort(a):
        n = a.shape[0]
        key = jnp.where(a, jnp.arange(n, dtype=jnp.int32), jnp.int32(2**31 - 1))
        ks = jax.lax.sort(key)
        ids = jax.lax.slice_in_dim(ks, 0, MAXA)
        return jnp.sum(jnp.where(ids == 2**31 - 1, -1, ids))

    timed("e2) sort-compaction over 133M", lambda: float(nz_sort(act)))

    log("probe4 done")


if __name__ == "__main__":
    main()
