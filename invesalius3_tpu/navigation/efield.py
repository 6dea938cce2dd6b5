"""E-field visualization pipeline: per-coil-pose field estimates over a
cortical ROI.

Reference: invesalius/data/e_field.py ``Visualize_E_field_Thread`` :44 —
on each new coil pose, queries ``NeuronavigationApi.update_efield_vectorROIMax``
(an external solver process) for e-field norms over ROI vertex ids and
queues them for rendering; ``--debug-efield`` substitutes fake e-norms
(reference app.py:443-447).

This build keeps the same architecture and adds an on-device debug solver:
a dipole-like falloff kernel over the ROI vertices (one jitted
matmul-shaped op) so the whole loop runs hardware-free at navigation rate.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu import events


@jax.jit
def debug_efield_norms(roi_vertices: jax.Array, coil_pos: jax.Array,
                       coil_dir: jax.Array) -> jax.Array:
    """Fake-but-plausible e-norm: distance falloff modulated by coil axis
    alignment (replaces --debug-efield random norms with something
    spatially coherent)."""
    d = roi_vertices - coil_pos[None, :]
    r = jnp.linalg.norm(d, axis=1)
    axis_align = jnp.abs(d @ coil_dir) / jnp.maximum(r, 1e-6)
    return 100.0 * jnp.exp(-r / 30.0) * (0.5 + 0.5 * axis_align)


class VisualizeEFieldThread(threading.Thread):
    """Consumes coil poses, produces e-norms (reference e_field.py:44-117)."""

    def __init__(self, pose_queue: queue.Queue, api=None,
                 roi_vertices: Optional[np.ndarray] = None,
                 roi_ids: Optional[np.ndarray] = None,
                 debug: bool = False, bus=None):
        super().__init__(daemon=True)
        self.pose_queue = pose_queue
        self.api = api
        self.debug = debug or api is None
        self.roi_vertices = jnp.asarray(roi_vertices) if roi_vertices is not None else None
        self.roi_ids = roi_ids
        self.bus = bus or events.bus
        self._stop_event = threading.Event()

    def compute_once(self, item: dict) -> Optional[np.ndarray]:
        coils = item.get("coils_img", {})
        if not coils:
            m = item.get("m_probe_img")
        else:
            m = next(iter(coils.values()))
        if m is None:
            return None
        pos = jnp.asarray(m[:3, 3], jnp.float32)
        direction = jnp.asarray(m[:3, 2], jnp.float32)
        if self.debug:
            if self.roi_vertices is None:
                return None
            norms = np.asarray(debug_efield_norms(self.roi_vertices, pos, direction))
        else:
            norms = self.api.update_efield_vector_roi_max(
                position=np.asarray(pos).tolist(),
                orientation=np.asarray(direction).tolist(),
                t_rot=np.asarray(m[:3, :3]).tolist(),
                id_list=self.roi_ids,
            )
        return None if norms is None else np.asarray(norms)

    def run(self):
        while not self._stop_event.is_set():
            try:
                item = self.pose_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            norms = self.compute_once(item)
            if norms is not None:
                self.bus.send_message(
                    "navigation.efield", enorms=norms,
                    max_id=int(np.argmax(norms)),
                    roi_ids=(None if self.roi_ids is None
                             else np.asarray(self.roi_ids)))

    def stop(self):
        self._stop_event.set()
