"""The HBM-resident voxel volume model.

The reference keeps the image as an ``np.memmap`` on disk and passes
(filename, shape, dtype) across process boundaries (reference
imagedata_utils.py:290-537, mask.py:422-431).  On TPU the volume is a
``jax.Array`` living in HBM — a 512-cubed int16 CT is 256 MB, comfortably
HBM-resident — and "parallelism" is sharding that array over a device mesh,
not re-memmapping files in worker processes.

``Volume`` is a pytree: ``data`` is a traced leaf; ``spacing`` / ``affine``
are auxiliary host-side metadata (hashable static fields) so jitted
functions can close over them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Volume:
    """A 3D scalar volume.

    Attributes:
      data: (Z, Y, X) array of voxel intensities (typically int16 HU).
      spacing: (sx, sy, sz) voxel size in mm, X-first like the reference's
        ``Slice.spacing`` (slice_.py:176-211).
      affine: optional 4x4 voxel-index -> world (mm, RAS) matrix.
      modality: e.g. "CT", "MR".
      window_width / window_level: current display window.
    """

    data: jax.Array
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    affine: Optional[np.ndarray] = None
    modality: str = "CT"
    window_width: float = 255.0
    window_level: float = 127.5

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        aux = (
            self.spacing,
            None if self.affine is None else _HashableArray(self.affine),
            self.modality,
            self.window_width,
            self.window_level,
        )
        return (self.data,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (data,) = children
        spacing, affine, modality, ww, wl = aux
        return cls(
            data=data,
            spacing=spacing,
            affine=None if affine is None else affine.array,
            modality=modality,
            window_width=ww,
            window_level=wl,
        )

    # -- basics --------------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int, int]:
        return tuple(self.data.shape)  # type: ignore[return-value]

    @property
    def dtype(self):
        return self.data.dtype

    @classmethod
    def from_numpy(
        cls,
        array: np.ndarray,
        spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
        affine: Optional[np.ndarray] = None,
        modality: str = "CT",
        **kw,
    ) -> "Volume":
        data = jnp.asarray(array)
        if affine is None:
            affine = default_affine(array.shape, spacing)
        return cls(data=data, spacing=tuple(spacing), affine=affine, modality=modality, **kw)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    def replace(self, **kw) -> "Volume":
        return dataclasses.replace(self, **kw)

    # -- coordinates ----------------------------------------------------------
    def voxel_to_world(self, zyx: np.ndarray) -> np.ndarray:
        """Map (N, 3) voxel indices (z, y, x) to world mm via the affine."""
        aff = self.affine if self.affine is not None else default_affine(self.shape, self.spacing)
        pts = np.asarray(zyx, dtype=np.float64)
        homo = np.concatenate([pts[..., ::-1], np.ones(pts.shape[:-1] + (1,))], axis=-1)
        return (homo @ aff.T)[..., :3]

    def world_to_voxel(self, xyz: np.ndarray) -> np.ndarray:
        aff = self.affine if self.affine is not None else default_affine(self.shape, self.spacing)
        inv = np.linalg.inv(aff)
        pts = np.asarray(xyz, dtype=np.float64)
        homo = np.concatenate([pts, np.ones(pts.shape[:-1] + (1,))], axis=-1)
        return (homo @ inv.T)[..., :3][..., ::-1]

    def min_max(self) -> Tuple[float, float]:
        return (float(jnp.min(self.data)), float(jnp.max(self.data)))


class _HashableArray:
    """Wrap a numpy array so it can sit in a pytree aux (hashable, eq by
    bytes)."""

    __slots__ = ("array", "_key")

    def __init__(self, array: np.ndarray):
        self.array = array
        self._key = (array.shape, array.dtype.str, array.tobytes())

    def __hash__(self) -> int:
        return hash(self._key)

    def __eq__(self, other) -> bool:
        return isinstance(other, _HashableArray) and self._key == other._key


def default_affine(shape, spacing) -> np.ndarray:
    """Scale-only affine: x_world = x_index * sx etc. (x, y, z order)."""
    sx, sy, sz = spacing
    aff = np.diag([sx, sy, sz, 1.0])
    return aff
