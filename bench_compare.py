"""Comparative micro-benchmarks: TPU kernels vs the CPU implementations the
reference actually calls (scipy.ndimage / numpy — the reference's watershed
runs scipy.watershed_ift / skimage.watershed, its thresholds are numpy
broadcasts, its filters are scipy.ndimage; invesalius_rs covers the rest).

Prints one JSON line per op with {"op", "n", "cpu_s", "tpu_s", "speedup"}.
Run on the TPU host: `python bench_compare.py [size]`.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def synced(compute):
    """The axon PJRT plugin's block_until_ready can return optimistically;
    a scalar reduction + host read forces real execution (one ~ms round
    trip, negligible vs the op)."""
    import jax.numpy as jnp

    def run():
        out = compute()
        return float(jnp.max(out).astype(jnp.float32))

    return run


def main():
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from invesalius3_tpu.ops import filters, morphology, threshold, watershed
    from invesalius3_tpu.ops import projections

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    ct = rng.integers(-1000, 2000, (n, n, n)).astype(np.int16)
    ct_j = jnp.asarray(ct)
    results = []

    def record(op, cpu_s, tpu_s):
        results.append({
            "op": op, "n": n, "cpu_s": round(cpu_s, 4), "tpu_s": round(tpu_s, 4),
            "speedup": round(cpu_s / tpu_s, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    # threshold (reference: numpy broadcast over memmap, slice_.py:1722)
    cpu = timeit(lambda: ((ct >= 226) & (ct <= 3071)) * np.uint8(255))
    tpu = timeit(synced(lambda: threshold.threshold_new_mask(ct_j, 226, 3071)))
    record("threshold", cpu, tpu)

    # gaussian filter (reference: scipy.ndimage, filters.py)
    cpu = timeit(lambda: ndimage.gaussian_filter(ct.astype(np.float32), 2.0), reps=1)
    tpu = timeit(synced(lambda: filters.gaussian(ct_j, 2.0)), reps=1)
    record("gaussian_sigma2", cpu, tpu)

    # morphological gradient (reference: scipy.ndimage, watershed_process.py)
    u16 = (ct - ct.min()).astype(np.uint16)
    u16_j = jnp.asarray(u16)
    cpu = timeit(lambda: ndimage.morphological_gradient(u16, size=(3, 3, 3)), reps=1)
    tpu = timeit(synced(lambda: morphology.morphological_gradient(
        u16_j.astype(jnp.int32), (3, 3, 3))), reps=1)
    record("morph_gradient", cpu, tpu)

    # binary dilation (reference: scipy via floodfill structuring elements)
    mask = ct > 300
    mask_j = jnp.asarray(mask)
    st = morphology.structure_3d(6)
    dil = jax.jit(lambda m: morphology.binary_dilation(m, st))
    cpu = timeit(lambda: ndimage.binary_dilation(mask, st), reps=1)
    tpu = timeit(synced(lambda: dil(mask_j)), reps=1)
    record("binary_dilation", cpu, tpu)

    # MIP slab projection over 64 slices (reference: numpy max, slice_.py:884)
    slab = ct[: min(64, n)]
    slab_j = jnp.asarray(slab)
    cpu = timeit(lambda: slab.max(0))
    tpu = timeit(synced(lambda: projections.maxip(slab_j, 0)))
    record("maxip_slab64", cpu, tpu)

    # watershed (reference: scipy.ndimage.watershed_ift in a subprocess)
    sm = (ndimage.gaussian_filter(ct.astype(np.float32), 3.0)).astype(np.uint16)
    markers = np.zeros(sm.shape, np.int16)
    markers[n // 4, n // 4, n // 4] = 1
    markers[3 * n // 4, 3 * n // 4, 3 * n // 4] = 2
    sm_j = jnp.asarray(sm)
    markers_j = jnp.asarray(markers)
    cpu = timeit(lambda: ndimage.watershed_ift(
        sm, markers, ndimage.generate_binary_structure(3, 1)), reps=1)
    tpu = timeit(synced(lambda: watershed.watershed_ift_multigrid(
        sm_j, markers_j, levels=2)), reps=1)
    record("watershed", cpu, tpu)

    print(json.dumps({"summary": results}), file=sys.stderr)


if __name__ == "__main__":
    main()
