"""Brain peeling: N inward cortical "peel" surfaces textured with image
intensity, for visualizing cortex under the TMS coil.

Reference: invesalius/data/brainmesh_handler.py ``Brain`` :49.  The
reference builds peel 0 from the mask isosurface through a
downsample (pyacvd cluster 3000) -> smooth (windowed sinc) -> fix
(normals) -> upsample (linear subdivision x2) -> smooth -> fix -> clean
chain (:109-179), then peels inward mesh-space: each ``SliceDown``
(:200-219) re-downsamples, warps 1 mm along the vertex NORMALS
(vtkWarpVector scale -1), upsamples, smooths, fixes, cleans.  Every peel
is textured with the T1 intensity at its vertices
(``MapImageOnCurrentPeel`` :238).

This build runs the same chain with array-native stages (ops/mesh.py):

  downsample -> ``cluster_remesh`` (uniform vertex clustering to ~3000
                cells; the acvd cluster count the reference hardcodes)
  smooth     -> ``taubin_smooth`` (the same low-pass family as
                vtkWindowedSincPolyDataFilter; 20 iters, passband-0.1
                equivalent lambda/mu)
  fix        -> winding is already consistent from marching (and every
                stage here preserves it), so "fix" reduces to recomputing
                ``vertex_normals``
  upsample   -> ``subdivide_linear`` (x2, midpoints deduped)
  warp       -> ``warp_along_normals(-depth)``
  clean      -> cluster/subdivide already merge duplicates and drop
                degenerates

``regularize="volume"`` keeps the previous round's volume-space
alternative (erode + low-passed occupancy isosurface) for comparison;
``"remesh"`` (default) is the reference-parity chain.  The remesh chain
smooths thin-gyri staircase that volume erosion keeps (asserted by
tests/test_editor_ops.py::test_brain_peel_remesh_quality).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from invesalius3_tpu.ops import marching, mesh as mesh_ops
from invesalius3_tpu.ops.filters import gaussian
from invesalius3_tpu.ops.morphology import binary_erosion, brush_element
from invesalius3_tpu.ops.reslice import trilinear
from invesalius3_tpu.ops.resize import resize_volume

_N_CLUSTERS = 3000      # reference downsample() cluster count
_SUBDIVISIONS = 2       # reference upsample() SetNumberOfSubdivisions(2)
_SMOOTH_ITERS = 20      # reference smooth() SetNumberOfIterations(20)


class Brain:
    """Peeled cortex surfaces (reference brainmesh_handler.Brain)."""

    def __init__(self, image: np.ndarray, mask: np.ndarray,
                 spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                 n_peels: int = 5, peel_depth_mm: float = 1.0,
                 smooth_iters: int = _SMOOTH_ITERS,
                 regularize: str | bool = "remesh"):
        self.image = jnp.asarray(image)
        self.spacing = spacing
        self.n_peels = n_peels
        # bool back-compat: True -> volume regularization (round-3 path)
        if regularize is True:
            regularize = "volume"
        elif regularize is False:
            regularize = "none"
        self.regularize = regularize
        self.peels: List[dict] = []
        self._build(jnp.asarray(mask) > 127, peel_depth_mm, smooth_iters)

    # -- round-3 volume-space path (kept as an alternative) ---------------

    @staticmethod
    def _occupancy_surface(vis, spacing):
        """Isosurface of the low-passed occupancy field: mean-pool 2x ->
        gaussian(sigma=1 coarse voxel) -> trilinear upsample -> marching
        at occupancy 0.5."""
        occ = vis.astype(jnp.float32)
        coarse_shape = tuple(max(2, s // 2) for s in occ.shape)
        occ = resize_volume(occ, coarse_shape)
        occ = gaussian(occ, sigma=1.0)
        occ = resize_volume(occ, tuple(vis.shape))
        field = jnp.pad(jnp.clip(occ * 255.0, 0.0, 255.0).astype(jnp.uint8), 1)
        sx, sy, sz = spacing
        dm = marching.marching_cubes_device(
            field, 127.5, spacing, origin_shift=(-sx, -sy, -sz))
        return marching.mesh_to_host(dm, fp16=False)

    # -- reference-parity mesh-space chain --------------------------------

    @staticmethod
    def _smooth(verts, faces, iters):
        if iters <= 0 or len(verts) < 5:
            return verts
        neigh, deg = mesh_ops.vertex_adjacency_fast(faces, len(verts))
        return np.asarray(mesh_ops.taubin_smooth(
            jnp.asarray(verts), jnp.asarray(neigh), jnp.asarray(deg),
            jnp.ones(len(verts), jnp.float32), 0.5, -0.53, iters))

    def _refine(self, verts, faces, smooth_iters):
        """upsample -> smooth -> fix -> clean (the common tail of both the
        initial surface creation and SliceDown)."""
        verts, faces = mesh_ops.subdivide_linear(verts, faces, _SUBDIVISIONS)
        verts = self._smooth(verts, faces, smooth_iters)
        return verts, faces

    def _slice_down(self, verts, faces, depth_mm, smooth_iters):
        """One inward peel step (reference SliceDown :200-219)."""
        verts, faces = mesh_ops.cluster_remesh(verts, faces, _N_CLUSTERS)
        if len(faces) == 0:
            return verts, faces
        verts = mesh_ops.warp_along_normals(verts, faces, -depth_mm)
        return self._refine(verts, faces, smooth_iters)

    def _build(self, vis, depth_mm: float, smooth_iters: int) -> None:
        if self.regularize == "remesh":
            verts, faces = marching.mask_to_surface(
                jnp.where(vis, jnp.uint8(255), jnp.uint8(0)), self.spacing)
            if len(faces) == 0:
                return
            # initial surface creation (:109-179): downsample -> smooth ->
            # fix -> upsample -> smooth -> fix -> clean
            verts, faces = mesh_ops.cluster_remesh(verts, faces, _N_CLUSTERS)
            verts = self._smooth(verts, faces, smooth_iters)
            verts, faces = self._refine(verts, faces, smooth_iters)
            for k in range(self.n_peels):
                if len(faces) == 0:
                    break
                self.peels.append({
                    "verts": np.asarray(verts, np.float32),
                    "faces": np.asarray(faces, np.int32),
                    "intensity": self.sample_intensity(verts),
                    "depth_mm": k * depth_mm,
                })
                verts, faces = self._slice_down(verts, faces, depth_mm,
                                                smooth_iters)
            return

        # volume-space paths ("volume" regularized / "none" raw erosion)
        strct = brush_element(depth_mm, self.spacing, "circle", dims=3)
        current = vis
        for k in range(self.n_peels):
            if not bool(jnp.any(current)):
                break
            if self.regularize == "volume":
                verts, faces = self._occupancy_surface(current, self.spacing)
            else:
                verts, faces = marching.mask_to_surface(
                    jnp.where(current, jnp.uint8(255), jnp.uint8(0)),
                    self.spacing)
            if len(faces) == 0:
                break
            if len(verts) > 4:
                verts = self._smooth(verts, faces, min(4, smooth_iters))
            self.peels.append({
                "verts": np.asarray(verts, np.float32),
                "faces": np.asarray(faces),
                "intensity": self.sample_intensity(verts),
                "depth_mm": k * depth_mm,
            })
            current = binary_erosion(current, strct)

    def sample_intensity(self, verts_world: np.ndarray) -> np.ndarray:
        """Texture: image intensity trilinearly sampled at surface vertices
        (world mm (x, y, z) -> voxel (z, y, x)) — reference
        MapImageOnCurrentPeel (brainmesh_handler.py:238)."""
        sx, sy, sz = self.spacing
        x = jnp.asarray(verts_world[:, 0] / sx)
        y = jnp.asarray(verts_world[:, 1] / sy)
        z = jnp.asarray(verts_world[:, 2] / sz)
        return np.asarray(trilinear(self.image, x, y, z))

    def get_peel(self, level: int) -> dict:
        return self.peels[min(level, len(self.peels) - 1)]
