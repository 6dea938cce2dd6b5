"""Shear-warp frame-time probe at 512^3 on the real TPU (one process;
run with run_in_background, never SIGTERM a TPU process mid-compile)."""

from __future__ import annotations

import os
import sys
import time


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
    log("h2d done")

    # relay round-trip floor: tiny op + host read, repeated
    tiny = jnp.zeros((8,), jnp.float32)
    rts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(tiny))
        rts.append(time.perf_counter() - t0)
    log(f"  relay RT (tiny op + read): best {min(rts) * 1000:.0f} "
        f"median {sorted(rts)[5] * 1000:.0f} ms")

    for name, preset in [("MIP", raycast.builtin_preset("MIP")),
                         ("composite", raycast.builtin_preset("Bone")),
                         ("shaded", raycast.builtin_preset("Soft + Skin II"))]:
        for ds in (1, 2):
            raycast.shear_warp_render(ct, (0.5, 0.5, 0.5), preset,
                                      azimuth=30, elevation=20,
                                      image_size=512, downsample=ds)
            times = []
            for k in range(5):
                t0 = time.perf_counter()
                raycast.shear_warp_render(ct, (0.5, 0.5, 0.5), preset,
                                          azimuth=31 + k, elevation=20,
                                          image_size=512, downsample=ds)
                times.append(time.perf_counter() - t0)
            # overlapped throughput: dispatch 6 frames, fetch only the last
            # (what a streaming viewer pipeline sees)
            t0 = time.perf_counter()
            for k in range(6):
                img = raycast.shear_warp_render(
                    ct, (0.5, 0.5, 0.5), preset, azimuth=40 + k,
                    elevation=20, image_size=512, downsample=ds,
                    fetch=(k == 5))
            thr = (time.perf_counter() - t0) / 6
            log(f"  shear-warp {name} ds={ds}: best {min(times) * 1000:.0f} "
                f"median {sorted(times)[len(times) // 2] * 1000:.0f} "
                f"overlap {thr * 1000:.0f} ms/frame")
    log("probe done")


if __name__ == "__main__":
    main()
