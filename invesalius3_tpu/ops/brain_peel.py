"""Brain peeling: N inward cortical "peel" surfaces textured with image
intensity, for visualizing cortex under the TMS coil.

Reference: invesalius/data/brainmesh_handler.py ``Brain`` :49 — from a
brain mask (or NIfTI), builds n_peels inward surfaces via a
downsample -> smooth -> fix -> upsample VTK pipeline :109-179, each
textured with the T1 intensity at its vertices.

TPU pipeline: peel k = isosurface of the mask eroded k times by a sphere
of ``peel_depth_mm`` (one fused erosion kernel per peel), smoothed with a
few Taubin iterations, textured by trilinear sampling of the image at the
vertices — all device ops.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from invesalius3_tpu.ops import marching, mesh as mesh_ops
from invesalius3_tpu.ops.morphology import binary_erosion, brush_element
from invesalius3_tpu.ops.reslice import trilinear


class Brain:
    """Peeled cortex surfaces (reference brainmesh_handler.Brain)."""

    def __init__(self, image: np.ndarray, mask: np.ndarray,
                 spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                 n_peels: int = 5, peel_depth_mm: float = 1.0,
                 smooth_iters: int = 4):
        self.image = jnp.asarray(image)
        self.spacing = spacing
        self.n_peels = n_peels
        self.peels: List[dict] = []
        self._build(jnp.asarray(mask) > 127, peel_depth_mm, smooth_iters)

    def _build(self, vis, depth_mm: float, smooth_iters: int) -> None:
        strct = brush_element(depth_mm, self.spacing, "circle", dims=3)
        current = vis
        for k in range(self.n_peels):
            if not bool(jnp.any(current)):
                break
            verts, faces = marching.mask_to_surface(
                jnp.where(current, jnp.uint8(255), jnp.uint8(0)), self.spacing)
            if len(faces) == 0:
                break
            if smooth_iters > 0 and len(verts) > 4:
                neigh, deg = mesh_ops.vertex_adjacency(faces, len(verts))
                verts = np.asarray(mesh_ops.taubin_smooth(
                    jnp.asarray(verts), jnp.asarray(neigh), jnp.asarray(deg),
                    jnp.ones(len(verts), jnp.float32), 0.5, -0.53, smooth_iters))
            intensity = self.sample_intensity(verts)
            self.peels.append({
                "verts": np.asarray(verts, np.float32),
                "faces": np.asarray(faces),
                "intensity": intensity,
                "depth_mm": k * depth_mm,
            })
            current = binary_erosion(current, strct)

    def sample_intensity(self, verts_world: np.ndarray) -> np.ndarray:
        """Texture: image intensity trilinearly sampled at surface vertices
        (world mm (x, y, z) -> voxel (z, y, x))."""
        sx, sy, sz = self.spacing
        x = jnp.asarray(verts_world[:, 0] / sx)
        y = jnp.asarray(verts_world[:, 1] / sy)
        z = jnp.asarray(verts_world[:, 2] / sz)
        return np.asarray(trilinear(self.image, x, y, z))

    def get_peel(self, level: int) -> dict:
        return self.peels[min(level, len(self.peels) - 1)]
