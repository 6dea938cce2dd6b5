"""Tractography: real-time streamline computation around the coil target.

Reference: invesalius/data/tractography.py — Trekker (FOD-based
probabilistic tracking) driven by ``ComputeTractsThread`` :230 /
``ComputeTractsACTThread`` :380: seeds in a box around the coil position
(grid_offset :661), run in chunks of ``n_tracts_block`` until
``n_tracts_total``, built into renderable tube bundles.

TPU design: Trekker is an external native lib the environment doesn't
have, so the tracking core is implemented directly as deterministic
streamline integration over a principal-diffusion-direction field
(eigenvector of a diffusion tensor volume): all seeds advance in lockstep
with ``lax.scan`` — one (N_seeds, 3) gather + FMA per step, the idiomatic
TPU formulation of a tract bundle.  ACT-style stopping uses a mask volume.
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu import events
from invesalius3_tpu.ops.reslice import trilinear


def seed_grid(center: np.ndarray, n_seeds: int = 32, radius: float = 1.5,
              seed: int = 0) -> np.ndarray:
    """Random seed cloud around the coil-projected position (reference
    tractography.py grid_offset/seed box)."""
    rng = np.random.default_rng(seed)
    return center[None, :] + rng.uniform(-radius, radius, (n_seeds, 3))


@partial(jax.jit, static_argnames=("n_steps",))
def track_streamlines(
    direction_field: jax.Array,  # (Z, Y, X, 3) unit principal directions
    stop_mask: jax.Array,  # (Z, Y, X) bool: True = keep tracking (e.g. WM)
    seeds: jax.Array,  # (N, 3) voxel coords (z, y, x)
    step_size: float = 0.5,
    n_steps: int = 200,
) -> Tuple[jax.Array, jax.Array]:
    """Advance all seeds in lockstep; returns (paths (n_steps+1, N, 3),
    valid (n_steps+1, N))."""
    fz = direction_field[..., 0]
    fy = direction_field[..., 1]
    fx = direction_field[..., 2]
    maskf = stop_mask.astype(jnp.float32)

    def sample_dir(pos, prev_dir):
        z, y, x = pos[:, 0], pos[:, 1], pos[:, 2]
        dz = trilinear(fz, x, y, z)
        dy = trilinear(fy, x, y, z)
        dx = trilinear(fx, x, y, z)
        d = jnp.stack([dz, dy, dx], axis=1)
        # orient consistently with previous direction (eigenvectors are
        # sign-ambiguous)
        sign = jnp.sign(jnp.sum(d * prev_dir, axis=1, keepdims=True))
        sign = jnp.where(sign == 0, 1.0, sign)
        d = d * sign
        n = jnp.linalg.norm(d, axis=1, keepdims=True)
        return d / jnp.maximum(n, 1e-6)

    def in_mask(pos):
        z, y, x = pos[:, 0], pos[:, 1], pos[:, 2]
        return trilinear(maskf, x, y, z) > 0.5

    def body(carry, _):
        pos, direction, alive = carry
        d = sample_dir(pos, direction)
        new_pos = pos + step_size * d
        alive = alive & in_mask(new_pos)
        pos = jnp.where(alive[:, None], new_pos, pos)
        return (pos, d, alive), (pos, alive)

    d0 = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (seeds.shape[0], 1))
    alive0 = in_mask(seeds)
    (_, _, _), (path, valid) = jax.lax.scan(
        body, (seeds.astype(jnp.float32), d0, alive0), None, length=n_steps)
    paths = jnp.concatenate([seeds[None].astype(jnp.float32), path], axis=0)
    valids = jnp.concatenate([alive0[None], valid], axis=0)
    return paths, valids


class ComputeTractsThread(threading.Thread):
    """Per-coil-pose tract recomputation (reference tractography.py:230)."""

    def __init__(self, pose_queue: queue.Queue, direction_field: np.ndarray,
                 stop_mask: np.ndarray, n_tracts_total: int = 64,
                 step_size: float = 0.5, n_steps: int = 120, bus=None):
        super().__init__(daemon=True)
        self.pose_queue = pose_queue
        self.direction_field = jnp.asarray(direction_field, jnp.float32)
        self.stop_mask = jnp.asarray(stop_mask)
        self.n_tracts = n_tracts_total
        self.step_size = step_size
        self.n_steps = n_steps
        self.bus = bus or events.bus
        self._stop_event = threading.Event()

    def compute_once(self, coil_pos_vox: np.ndarray):
        seeds = jnp.asarray(seed_grid(np.asarray(coil_pos_vox), self.n_tracts),
                            jnp.float32)
        paths, valid = track_streamlines(
            self.direction_field, self.stop_mask, seeds,
            self.step_size, self.n_steps)
        return np.asarray(paths), np.asarray(valid)

    def run(self):
        while not self._stop_event.is_set():
            try:
                item = self.pose_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            pos = item["probe_pose_img"][:3]
            paths, valid = self.compute_once(np.asarray(pos))
            self.bus.send_message("navigation.tracts", paths=paths, valid=valid)

    def stop(self):
        self._stop_event.set()
