"""invesalius3_tpu — a TPU-native volumetric medical-imaging framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of InVesalius 3
(reference: /root/reference): CT/MRI ingest (DICOM / NIfTI / Analyze / bitmap
stacks), interactive segmentation (window/level, threshold, region-growing
floodfill, watershed, morphological brush editing), surface reconstruction
(marching cubes + context-aware smoothing + connectivity filtering) with
STL/PLY/OBJ/VTP/3MF export, MIP/MIDA/contour slab projections and raycast
volume rendering, deep-learning segmentation (3D U-Net), and a host-side
project/session/navigation layer.

Design stance (TPU-first, not a port):
- Volumes are HBM-resident ``jax.Array``s, not memmaps; all voxel ops are
  pure functions under ``jax.jit``.
- Irregular/sequential reference kernels (BFS floodfill, priority-queue
  watershed, per-ray scans) are re-expressed as data-parallel fixpoint
  iterations (``lax.while_loop`` over whole-volume VPU ops) or ``lax.scan``
  along an axis.
- Multi-chip scaling is Z-axis sharding over a ``jax.sharding.Mesh`` with
  1-slice halo exchange — the TPU-native analog of the reference's
  20-slice-slab multiprocessing pool (reference surface.py:1360-1430).
"""

__version__ = "0.1.0"


def _disable_numpy_hugepage_madvise() -> None:
    """Turn off numpy's MADV_HUGEPAGE on large allocations.

    On this host (THP "madvise" mode) hugepage zeroing intermittently
    degrades fresh-page faults to ~3-12 MB/s system-wide, so a single
    512^3 float64 temporary can stall for 10+ minutes.  Reused pages run
    at full speed; plain 4K faults are fine.  Works after numpy import
    (the flag is read per-allocation); falls back to a no-op if the
    private hook moves."""
    import os
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    try:
        from numpy._core import multiarray as _ma
        _ma._set_madvise_hugepage(False)
    except Exception:
        pass


_disable_numpy_hugepage_madvise()

from invesalius3_tpu.core.volume import Volume  # noqa: F401
