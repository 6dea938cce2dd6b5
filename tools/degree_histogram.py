"""Degree histogram of the marching-tet surface on the bench CT phantom.

Sizes the static buckets of the sharded taubin interior gather
(`parallel/sharded_ops.py`): the three-level table (LO rows for every
vertex + a deg>LO bucket + a deg>MID bucket) is only cheaper than a flat
MAXD table if the degree tail is thin.  Measured at 128³ (real verts):
65.1% degree 6, 11.9% degree 7, 2.2% degree 8, 0.03% above, max 10 —
so LO=6, MID=8, buckets V/4 and V/64.

Run on CPU: JAX_PLATFORMS=cpu python tools/degree_histogram.py [size].
Reference smoothing topology: /root/reference/invesalius/data/
surface_process.py:270-319 (ca_smoothing neighbor rings).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_test_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main(n: int = 128) -> None:
    import jax.numpy as jnp

    from bench import make_ct
    from invesalius3_tpu.ops import marching, mesh as mo, watershed as ws

    ct = make_ct(n)
    markers = np.zeros(ct.shape, np.int16)
    c = n // 2
    markers[c, c, int(0.61 * n)] = 1
    markers[c, c, c] = 2
    markers[2, 2, 2] = 3
    lab = ws.watershed(jnp.asarray(ct), jnp.asarray(markers),
                       algorithm="Watershed")
    mask = jnp.where(lab == 1, jnp.uint8(255), jnp.uint8(0))
    dm = marching.mask_to_surface_device(np.asarray(mask),
                                         spacing=(0.5, 0.5, 0.5))
    _, deg = mo.adjacency_from_device_mesh(dm)
    deg = np.asarray(deg)
    real = deg[deg > 0]          # bucket padding slots carry degree 0
    hist = np.bincount(deg, minlength=20)
    print(f"size={n} padded_slots={deg.size} real_verts={real.size}")
    for d, cnt in enumerate(hist):
        if cnt:
            print(f"  deg {d:2d}: {cnt:9d}  {cnt / max(real.size, 1) * 100:6.2f}% of real")
    print(f"  mean real deg = {real.mean():.3f}, max = {real.max()}")
    cum = np.cumsum(hist) / deg.size  # padded fractions: what gathers pay
    for lo in (6, 7, 8):
        print(f"  padded frac(deg<={lo}) = {cum[lo]:.4f}")

    def eff(levels):
        return sum((b - a) * f for a, b, f in levels)

    print(f"  flat MAXD=16:                 {eff([(0, 16, 1.0)]):5.2f} rows/slot")
    print(f"  two-level LO=8 + V/8:         "
          f"{eff([(0, 8, 1.0), (8, 16, 1 / 8)]):5.2f}")
    print(f"  three-level LO=6 MID=8 (live):"
          f"{eff([(0, 6, 1.0), (6, 8, 1 / 4), (8, 16, 1 / 64)]):5.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
