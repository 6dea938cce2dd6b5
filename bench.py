"""Headline benchmark: 512^3 CT -> watershed segmentation -> marching
cubes -> context-aware-smoothed STL (the driver's north-star config,
BASELINE.json: target < 1 s on TPU).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
value = voxels/second through the full pipeline (after jit warmup);
vs_baseline = measured_pipeline_time / 1.0 s target (>1 means slower than
target, <1 means beating it).

Extra diagnostics go to stderr.  Set BENCH_SIZE=256 for a quick run.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

# persistent compile cache: the tunneled remote compiler takes 10-60 s per
# 512^3 program, so cold runs dominate wall clock without it (no-op if the
# backend can't serialize executables)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# this host's hugepage zeroing intermittently degrades fresh-page faults
# to ~MB/s; see invesalius3_tpu._disable_numpy_hugepage_madvise
from invesalius3_tpu import _disable_numpy_hugepage_madvise
_disable_numpy_hugepage_madvise()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_ct(n: int) -> np.ndarray:
    """Synthetic cranium-like CT: skull shell + inner bone island.

    Built slice-by-slice with reused (n, n) work buffers: the obvious
    np.mgrid formulation faults ~6 GB of fresh float64 pages, and this
    host's fresh-page bandwidth intermittently degrades to ~10 MB/s
    (huge-page zeroing pathology) — mgrid then takes 10+ minutes.  Reused
    pages run at full speed, so peak transient memory here is a few MB.
    """
    c = n / 2.0
    yy = (np.arange(n, dtype=np.float32) - c) ** 2
    r2p = yy[:, None] + yy[None, :]  # (n, n) in-plane radius^2
    ct = np.empty((n, n, n), np.int16)
    rng = np.random.default_rng(0)
    sl = np.empty((n, n), np.int16)
    for z in range(n):
        r = np.sqrt((z - c) ** 2 + r2p)
        sl[:] = -1000
        sl[r < 0.42 * n] = 40
        sl[(r >= 0.36 * n) & (r < 0.42 * n)] = 1200
        sl[r < 0.08 * n] = 900
        sl += rng.integers(-20, 20, (n, n), dtype=np.int16)
        ct[z] = sl
    return ct


def main() -> None:
    if "--project8" in sys.argv:
        # v5e-8 projection from measured artifacts (no TPU work here);
        # see tools/project8.py for the measurement modes
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools import project8

        project8.project()
        return

    import jax
    import jax.numpy as jnp

    from invesalius3_tpu.ops import marching, mesh as mesh_ops, watershed

    n = int(os.environ.get("BENCH_SIZE", "512"))
    log(f"bench: {n}^3 CT on {jax.devices()[0].platform} ({jax.devices()[0]})")

    ct_host = make_ct(n)
    t0 = time.perf_counter()
    ct = jnp.asarray(ct_host)
    _ = float(jnp.sum(ct.astype(jnp.float32)))  # force real transfer+exec
    h2d_mbps = round(ct_host.nbytes / 1e6 / (time.perf_counter() - t0), 1)
    log(f"h2d: {h2d_mbps} MB/s (relay weather; rule 15)")

    markers = np.zeros(ct_host.shape, np.int16)
    c = n // 2
    markers[c, c, int(0.61 * n)] = 1  # skull shell
    markers[c, c, c] = 2  # inner island
    markers[2, 2, 2] = 3  # background
    markers_j = jnp.asarray(markers)

    sharded = os.environ.get("INV3_SHARDED") == "1"
    if sharded:
        from jax.sharding import Mesh

        zmesh = Mesh(np.asarray(jax.devices()), ("z",))
        log(f"sharded mode: {zmesh.devices.size}-shard z mesh")

    def pipeline():
        import dataclasses

        # 1. watershed segmentation on the morphological gradient
        if sharded:
            from invesalius3_tpu.parallel import sharded_ops

            ws_run = getattr(pipeline, "_ws_run", None)
            if ws_run is None:
                # stop="label": single-device stopping semantics; measured
                # bitwise-identical labels at 1/10th the fine-level rounds
                # (project8, 256^3: [10,10,10,16] vs [9,15,52,170])
                ws_run = pipeline._ws_run = sharded_ops.sharded_watershed(
                    zmesh, stop="label", quiet_rounds=2)
            labels = ws_run(ct, markers_j, algorithm="Watershed")
        else:
            labels = watershed.watershed(ct, markers_j, algorithm="Watershed")
        # 2. basin -> binary mask (uint8 0/255)
        mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
        jax.block_until_ready(mask)
        from invesalius3_tpu.io import mesh_io

        out = os.path.join(tempfile.gettempdir(), "bench_out.stl")
        if sharded:
            # 3s. Z-sharded extraction + fused sharded ca-smoothing
            from invesalius3_tpu.parallel import sharded_ops

            vsh, fsh, checks, meta = sharded_ops.sharded_mask_to_surface(
                zmesh, mask, spacing=(0.5, 0.5, 0.5),
                smooth={"t": 0.7, "tmax": 3.0, "bmin": 0.5, "n_iters": 10},
                balance=True, return_parts=True)
            # pipelined per-shard export: shard s's D2H overlaps shard
            # s-1's native pack/write (the 8-chip analog of rule 21)
            mesh_io.write_stl_sharded(out, vsh, fsh, checks, meta)
            return int(checks[:, 0].sum()), int(checks[:, 1].sum()), out
        # 3. fused device pipeline: marching -> ca smoothing -> streamed
        # STL (no host mesh at all; transfer/pack/write overlap).  The face
        # table is final at marching time, so its relay transfer starts
        # immediately and runs under the smoothing compute.
        dm = marching.mask_to_surface_device(mask, spacing=(0.5, 0.5, 0.5))
        fs = mesh_io.DeviceFaceStream(dm)
        out3v = mesh_ops.ca_smoothing_device(dm, 0.7, 3.0, 0.5, 10)
        mesh_io.write_stl_from_device(
            out, dataclasses.replace(dm, verts3v=out3v), face_stream=fs)
        return dm.n_verts, dm.n_tris, out

    # warmup: compile everything on the same shapes
    t0 = time.perf_counter()
    n_verts, n_tris, _ = pipeline()
    if not np.isscalar(n_verts):  # sharded path returns host arrays
        n_verts, n_tris = len(n_verts), len(n_tris)
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.2f}s — "
        f"{n_verts} verts, {n_tris} tris")

    # timed run: min of 3 — the relay's transfer throughput varies
    # several-fold between moments (CLAUDE.md rule 15), and the export
    # tail is transfer-bound
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        pipeline()
        times.append(time.perf_counter() - t0)
        log(f"run {i}: {times[-1]:.3f}s")
    t = min(times)

    # device-resident compute-only submetric (VERDICT r4 weak 1): the same
    # watershed -> marching -> ca chain WITHOUT the D2H export tail, so
    # rounds stay comparable across relay weather.  Forced real execution
    # via a scalar reduction + host read (block_until_ready can return
    # optimistically under the axon plugin).
    def compute_only():
        if sharded:
            # same sharded chain, no STL write; the checks host read is a
            # few hundred bytes, so the submetric stays relay-independent
            from invesalius3_tpu.parallel import sharded_ops

            labels = pipeline._ws_run(ct, markers_j, algorithm="Watershed")
            mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
            vsh, _, checks, _ = sharded_ops.sharded_mask_to_surface(
                zmesh, mask, spacing=(0.5, 0.5, 0.5),
                smooth={"t": 0.7, "tmax": 3.0, "bmin": 0.5, "n_iters": 10},
                balance=True, return_parts=True)
            return float(jnp.sum(vsh[0][0])) + int(checks[:, 0].sum())
        labels = watershed.watershed(ct, markers_j, algorithm="Watershed")
        mask = jnp.where(labels == 1, jnp.uint8(255), jnp.uint8(0))
        dm = marching.mask_to_surface_device(mask, spacing=(0.5, 0.5, 0.5))
        out3v = mesh_ops.ca_smoothing_device(dm, 0.7, 3.0, 0.5, 10)
        return float(jnp.sum(out3v[0]))

    compute_times = []
    compute_only()  # warm the (one new) reduction program
    for i in range(2):
        t0 = time.perf_counter()
        compute_only()
        compute_times.append(time.perf_counter() - t0)
        log(f"compute-only run {i}: {compute_times[-1]:.3f}s")

    # per-kernel on-TPU Pallas smoke (VERDICT r4 weak 3): interpret-mode
    # tests miss Mosaic legalization failures; record hardware verdicts
    smoke = {}
    import jax as _jax

    if _jax.default_backend() == "tpu":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools import pallas_smoke

        t0 = time.perf_counter()
        smoke = pallas_smoke.run_smoke()
        log(f"pallas smoke ({time.perf_counter() - t0:.1f}s): {smoke}")

    voxels = n**3
    result = {
        "metric": f"{n}^3 watershed+marching-cubes+ca-smoothed-STL voxels/sec",
        "value": round(voxels / t, 1),
        "unit": "voxels/s",
        "vs_baseline": round(t / 1.0, 4),  # target: 1.0 s
        # relay-weather context (CLAUDE.md rule 15): a slow h2d session can
        # inflate the transfer-bound export tail by seconds — record it so
        # compute regressions are distinguishable from bad relay sessions
        "h2d_MBps": h2d_mbps,
        "runs_s": [round(x, 3) for x in times],
    }
    if compute_times:
        # relay-independent submetric: compare THIS across rounds
        result["compute_s"] = round(min(compute_times), 4)
    if smoke:
        result["pallas_smoke"] = smoke
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
