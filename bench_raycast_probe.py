"""Shear-warp frame times at 512^3 (BASELINE metric #2): MIP / composite /
shaded at full res and the 2x-pooled interactive path.  stderr only."""

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
    from invesalius3_tpu.ops import raycast

    n = int(os.environ.get("BENCH_SIZE", "512"))
    log(f"raycast probe: {n}^3 on {jax.devices()[0]}")
    ct = jnp.asarray(make_ct(n))
    _ = float(jnp.sum(ct.astype(jnp.float32)))
    log("setup done")

    cases = [
        ("MIP", raycast.builtin_preset("MIP"), {}),
        ("composite (Bone)", raycast.builtin_preset("Bone"), {}),
        ("shaded (Soft + Skin II)", raycast.builtin_preset("Soft + Skin II"),
         {}),
    ]
    for name, preset, kw in cases:
        for ds in (1, 2):
            # warm the permuted-volume cache + compile on this octant
            raycast.shear_warp_render(ct, (0.5, 0.5, 0.5), preset,
                                      azimuth=30, elevation=20,
                                      image_size=512, downsample=ds, **kw)
            times = []
            for k in range(3):
                t0 = time.perf_counter()
                raycast.shear_warp_render(ct, (0.5, 0.5, 0.5), preset,
                                          azimuth=31 + k, elevation=20,
                                          image_size=512, downsample=ds, **kw)
                times.append(time.perf_counter() - t0)
            log(f"  {name} ds={ds}: {min(times) * 1000:.0f} ms/frame "
                f"(3 frames: {[f'{t * 1000:.0f}' for t in times]})")
    log("raycast probe done")


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_tpu_cache"))
    main()
