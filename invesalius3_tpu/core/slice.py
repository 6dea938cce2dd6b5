"""Slice: the volume facade — windowing, slab projections, thresholding,
mask management, and surface creation entry points.

Reference: invesalius/data/slice_.py ``Slice`` singleton :99 — holds the
matrix + spacing, per-orientation SliceBuffer cache :63-96, projection
dispatch in get_image_slice :832-1120, threshold ops :1722/:1739, mask
CRUD :1578-1655, CreateSurfaceFromIndex :1338.

TPU design: no per-orientation slice buffers — a slab projection over the
whole volume is one jitted kernel, and XLA's own caching replaces the
SliceBuffer invalidation dance.  State is explicit (no singleton
metaclass); the CLI/app layer owns one instance.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu import constants as const
from invesalius3_tpu import events
from invesalius3_tpu.core.mask import Mask
from invesalius3_tpu.core.volume import Volume
from invesalius3_tpu.ops import projections, threshold as thr_ops
from invesalius3_tpu.ops.windowing import apply_ww_wl_rgb, get_lut_value_255


class Slice:
    def __init__(self, volume: Optional[Volume] = None, bus: Optional[events.Publisher] = None):
        self.volume: Optional[Volume] = volume
        self.masks: Dict[int, Mask] = {}
        self.current_mask: Optional[Mask] = None
        self.window_width: float = 255.0
        self.window_level: float = 127.5
        self.projection_type: int = const.PROJECTION_NORMAL
        self.n_slabs: int = 1
        self.bus = bus or events.bus
        if volume is not None:
            self.set_volume(volume)

    # -- volume ---------------------------------------------------------------
    def set_volume(self, volume: Volume) -> None:
        self.volume = volume
        self.window_width = volume.window_width
        self.window_level = volume.window_level
        self.bus.send_message("slice.volume_set", shape=volume.shape)

    @property
    def matrix(self) -> jax.Array:
        return self.volume.data

    @property
    def spacing(self):
        return self.volume.spacing

    def set_window(self, ww: float, wl: float) -> None:
        self.window_width = ww
        self.window_level = wl
        self.bus.send_message("slice.window_changed", ww=ww, wl=wl)

    # -- slab projections (reference get_image_slice :832) ----------------------
    def get_image_slice(
        self,
        orientation: str,
        slice_number: int,
        number_slices: int = 1,
        inverted: bool = False,
        border_size: float = 1.0,
    ) -> np.ndarray:
        axis = const.ORIENTATION_AXIS[orientation]
        proj = self.projection_type
        if proj == const.PROJECTION_NORMAL:
            number_slices = 1
        lo = slice_number
        hi = min(slice_number + number_slices, self.matrix.shape[axis])
        slab = jax.lax.slice_in_dim(self.matrix, lo, hi, axis=axis)
        if inverted:
            slab = jnp.flip(slab, axis=axis)

        wl, ww = self.window_level, self.window_width
        if proj == const.PROJECTION_NORMAL:
            img = jnp.take(slab, 0, axis=axis)
        elif proj == const.PROJECTION_MaxIP:
            img = projections.maxip(slab, axis)
        elif proj == const.PROJECTION_MinIP:
            img = projections.minip(slab, axis)
        elif proj == const.PROJECTION_MeanIP:
            img = projections.meanip(slab, axis)
        elif proj == const.PROJECTION_LMIP:
            # quirk preserved: reference passes wl for both bounds
            img = projections.lmip(slab, axis, wl, wl)
        elif proj == const.PROJECTION_MIDA:
            img = projections.mida(slab, axis, wl, wl)
        elif proj in (const.PROJECTION_CONTOUR_MIP, const.PROJECTION_CONTOUR_LMIP,
                      const.PROJECTION_CONTOUR_MIDA):
            tmip = {
                const.PROJECTION_CONTOUR_MIP: 0,
                const.PROJECTION_CONTOUR_LMIP: 1,
                const.PROJECTION_CONTOUR_MIDA: 2,
            }[proj]
            img = projections.fast_contour_mip(slab, border_size, axis, wl, wl, tmip)
        else:
            img = jnp.take(slab, 0, axis=axis)
        return np.asarray(img)

    def get_rendered_slice(self, orientation: str, slice_number: int, **kw) -> np.ndarray:
        """WW/WL-mapped RGB of a slice + mask overlay — the 2D viewer's
        per-frame path (reference do_ww_wl + do_blend)."""
        img = self.get_image_slice(orientation, slice_number, self.n_slabs, **kw)
        rgb = np.asarray(apply_ww_wl_rgb(jnp.asarray(img), self.window_width, self.window_level))
        if self.current_mask is not None and self.current_mask.is_shown:
            m = self.get_mask_slice(orientation, slice_number)
            colour = np.array(self.current_mask.colour) * 255
            vis = m >= const.MASK_VISIBLE_MIN
            op = self.current_mask.opacity
            rgb = rgb.astype(np.float32)
            rgb[vis] = rgb[vis] * (1 - op) + colour * op
            rgb = rgb.astype(np.uint8)
        return rgb

    def get_mask_slice(self, orientation: str, slice_number: int) -> np.ndarray:
        ax = const.ORIENTATION_AXIS[orientation]
        return np.asarray(jnp.take(self.current_mask.data, slice_number, axis=ax))

    # -- masks ------------------------------------------------------------------
    def create_new_mask(
        self,
        name: str = "",
        threshold_range: Optional[Tuple[float, float]] = None,
        apply_threshold: bool = True,
        show: bool = True,
    ) -> Mask:
        """Reference Slice.create_new_mask :1578."""
        m = Mask(shape=self.matrix.shape, name=name)
        m.spacing = self.spacing
        if threshold_range is not None:
            m.threshold_range = threshold_range
        if apply_threshold:
            tmin, tmax = m.threshold_range
            m.data = thr_ops.threshold_new_mask(self.matrix, tmin, tmax)
        self.masks[m.index] = m
        if show or self.current_mask is None:
            self.current_mask = m
        self.bus.send_message("slice.mask_added", index=m.index, name=m.name)
        return m

    def select_mask(self, index: int) -> None:
        self.current_mask = self.masks[index]
        self.bus.send_message("slice.mask_selected", index=index)

    def remove_mask(self, index: int) -> None:
        self.masks.pop(index, None)
        if self.current_mask is not None and self.current_mask.index == index:
            self.current_mask = next(iter(self.masks.values()), None)
        self.bus.send_message("slice.mask_removed", index=index)

    def set_mask_threshold(self, tmin: float, tmax: float, mask: Optional[Mask] = None) -> None:
        """Reference SetMaskThreshold :1225 + do_threshold_to_all_slices."""
        mask = mask or self.current_mask
        mask.threshold_range = (tmin, tmax)
        mask.apply(thr_ops.threshold_mask(self.matrix, mask.data, tmin, tmax))
        self.bus.send_message("slice.mask_thresholded", index=mask.index,
                              threshold=(tmin, tmax))

    # -- surface creation (reference CreateSurfaceFromIndex :1338) ---------------
    def create_surface_from_mask(self, mask: Optional[Mask] = None, **options):
        from invesalius3_tpu.core.surface import create_surface_from_mask

        mask = mask or self.current_mask
        return create_surface_from_mask(mask, self.spacing, **options)
