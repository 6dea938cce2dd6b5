"""Probe 7: 133M-element stream-compaction alternatives (the
_extract_cells nonzero costs ~1.4s at 512^3).

  a) jnp.nonzero(active, size=A)                    — baseline
  b) lax.sort of (active? iota : MAX) keys          — sorts are cheap here
  c) jnp.cumsum over 133M i32                       — what nonzero pays?
  d) Hillis-Steele doubling cumsum (27 static passes)
  e) blocked: per-block sums + tiny cumsum + searchsorted + in-block
     bitrank-free gather? (just block search part, feasibility timing)
"""
import sys, time
import numpy as np

def log(*a): print(*a, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    from functools import partial

    N = 512
    A = 2_097_152  # bucket

    @jax.jit
    def make_active():
        z = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 0) - N/2
        y = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 1) - N/2
        x = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 2) - N/2
        r = jnp.sqrt(z*z + y*y + x*x)
        shell = (r >= 183.8) & (r < 184.8)
        return shell.reshape(-1)

    def synced(x): return float(jnp.sum(x.astype(jnp.float32)))
    active = make_active()
    M = active.shape[0]
    log(f"probe7 on {jax.devices()[0]}: M={M} n_active={int(synced(active))}")

    def timed(name, fn):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
        log(f"  {name}: best {min(ts):.3f}s")

    @jax.jit
    def nz(a):
        (ids,) = jnp.nonzero(a, size=A, fill_value=-1)
        return ids
    timed("a) jnp.nonzero(size=A)", lambda: synced(nz(active)))

    @jax.jit
    def srt(a):
        keys = jnp.where(a, jnp.arange(M, dtype=jnp.int32),
                         jnp.int32(2**31 - 1))
        s = jax.lax.sort(keys)
        return jax.lax.slice(s, (0,), (A,))
    timed("b) sort-compaction", lambda: synced(srt(active)))

    @jax.jit
    def cs(a):
        return jnp.cumsum(a.astype(jnp.int32))[-1]
    timed("c) jnp.cumsum 133M", lambda: float(cs(active)))

    @jax.jit
    def hs(a):
        x = a.astype(jnp.int32)
        d = 1
        while d < M:
            x = x + jnp.pad(x[:-d], (d, 0))
            d *= 2
        return x[-1]
    timed("d) hillis-steele cumsum", lambda: float(hs(active)))

    K = 8192
    B = M // K
    @jax.jit
    def blocked(a):
        blk = a.reshape(B, K).astype(jnp.int32)
        bc = jnp.sum(blk, axis=1)            # (B,)
        boff = jnp.cumsum(bc)                # tiny
        j = jnp.arange(A, dtype=jnp.int32)
        b_of = jnp.searchsorted(boff, j, side="right")  # (A,)
        return jnp.sum(b_of.astype(jnp.float32))
    timed("e) blocked sums + searchsorted(A)", lambda: float(blocked(active)))

    # f) in-block rank via per-block cumsum along lanes (B, K) axis=1
    @jax.jit
    def blk_cumsum(a):
        blk = a.reshape(B, K).astype(jnp.int32)
        return jnp.cumsum(blk, axis=1)[:, -1]
    timed("f) (B,8192) cumsum axis=1", lambda: synced(blk_cumsum(active)))
    log("probe7 done")

if __name__ == "__main__":
    main()
