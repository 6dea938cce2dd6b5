"""Tractography: real-time streamline computation around the coil target.

Reference: invesalius/data/tractography.py — Trekker (FOD-based
probabilistic tracking) driven by ``ComputeTractsThread`` :230 /
``ComputeTractsACTThread`` :380: seeds in a box around the coil position
(grid_offset :661), run in chunks of ``n_tracts_block`` until
``n_tracts_total``, built into renderable tube bundles.

TPU design: Trekker is an external native lib the environment doesn't
have, so the tracking core is implemented directly, in two modes:

* ``track_streamlines`` — deterministic integration over a principal-
  diffusion-direction field (eigenvector of a diffusion tensor volume).
* ``track_streamlines_probabilistic`` — FOD-based probabilistic tracking
  (the science Trekker implements): the fiber-orientation distribution is
  a real even-order spherical-harmonic volume (MRtrix convention); each
  step samples K candidate directions in a cone around the current
  heading, evaluates the FOD amplitude along each, and draws the next
  direction categorically with probability proportional to amplitude
  (Gumbel trick), killing streamlines whose best candidate falls below
  ``min_fod_amp`` (Trekker's minFODamp) or that leave the mask.

All seeds advance in lockstep with ``lax.scan`` — per step one
(N_seeds*K, C) gather + a tiny matmul against the SH basis, the idiomatic
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


# ---------------------------------------------------------------------------
# FOD-based probabilistic tracking (Trekker semantics)
# ---------------------------------------------------------------------------


def n_sh_coefficients(lmax: int) -> int:
    """Coefficient count of a real even-order SH series (MRtrix layout)."""
    return (lmax + 1) * (lmax + 2) // 2


def sh_basis(dirs: jax.Array, lmax: int) -> jax.Array:
    """Real symmetric spherical-harmonic basis at unit directions.

    ``dirs`` is (..., 3) in (z, y, x) component order; returns
    (..., n_sh_coefficients(lmax)) in MRtrix ordering: even l ascending,
    m = -l..l, with Y_{l,-m} = sqrt(2) Im(Y_l^m), Y_{l,0} = Y_l^0,
    Y_{l,+m} = sqrt(2) Re(Y_l^m).  Built from the associated-Legendre
    recurrences — all static Python loops over (l, m), so it jits to a
    fixed stack of elementwise ops.
    """
    import math

    z = dirs[..., 0]
    y = dirs[..., 1]
    x = dirs[..., 2]
    ct = jnp.clip(z, -1.0, 1.0)  # cos(theta)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = jnp.arctan2(y, x)

    # associated Legendre P_l^m(ct) for even l <= lmax, 0 <= m <= l
    P = {}
    P[(0, 0)] = jnp.ones_like(ct)
    for m in range(1, lmax + 1):
        # P_m^m = (2m-1)!! * (-1)^m * st^m ; we fold the Condon-Shortley
        # phase into the basis below (MRtrix omits it), so use +st^m here
        P[(m, m)] = P[(m - 1, m - 1)] * (2 * m - 1) * st
    for m in range(0, lmax):
        P[(m + 1, m)] = (2 * m + 1) * ct * P[(m, m)]
    for m in range(0, lmax + 1):
        for l in range(m + 2, lmax + 1):
            P[(l, m)] = ((2 * l - 1) * ct * P[(l - 1, m)]
                         - (l + m - 1) * P[(l - 2, m)]) / (l - m)

    cols = []
    for l in range(0, lmax + 1, 2):
        for m in range(-l, l + 1):
            am = abs(m)
            norm = math.sqrt((2 * l + 1) / (4 * math.pi)
                             * math.factorial(l - am) / math.factorial(l + am))
            base = norm * P[(l, am)]
            if m < 0:
                cols.append(math.sqrt(2.0) * base * jnp.sin(am * phi))
            elif m == 0:
                cols.append(base)
            else:
                cols.append(math.sqrt(2.0) * base * jnp.cos(am * phi))
    return jnp.stack(cols, axis=-1)


def _cone_samples(key, prev_dir: jax.Array, max_angle: float, k: int):
    """K unit directions per streamline, uniform in the solid-angle cone of
    half-angle ``max_angle`` around ``prev_dir`` ((N, 3), (z, y, x))."""
    N = prev_dir.shape[0]
    k1, k2 = jax.random.split(key)
    cos_max = jnp.cos(max_angle)
    u = jax.random.uniform(k1, (N, k))
    ctheta = 1.0 - u * (1.0 - cos_max)  # uniform in cos within the cone
    stheta = jnp.sqrt(jnp.maximum(1.0 - ctheta**2, 0.0))
    phi = jax.random.uniform(k2, (N, k), minval=0.0, maxval=2.0 * jnp.pi)
    # orthonormal frame (e1, e2, prev) per streamline
    ref = jnp.where(jnp.abs(prev_dir[:, 0:1]) < 0.9,
                    jnp.asarray([[1.0, 0.0, 0.0]]),
                    jnp.asarray([[0.0, 1.0, 0.0]]))
    e1 = jnp.cross(prev_dir, ref)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=1, keepdims=True), 1e-6)
    e2 = jnp.cross(prev_dir, e1)
    d = (prev_dir[:, None, :] * ctheta[..., None]
         + e1[:, None, :] * (stheta * jnp.cos(phi))[..., None]
         + e2[:, None, :] * (stheta * jnp.sin(phi))[..., None])
    return d  # (N, K, 3)


@partial(jax.jit, static_argnames=("n_steps", "k_candidates", "lmax"))
def track_streamlines_probabilistic(
    fod_sh: jax.Array,  # (Z, Y, X, C) real-SH FOD coefficients
    stop_mask: jax.Array,  # (Z, Y, X) bool: True = keep tracking
    seeds: jax.Array,  # (N, 3) voxel coords (z, y, x)
    key: jax.Array,
    step_size: float = 0.5,
    n_steps: int = 200,
    max_angle: float = 0.4,  # radians; Trekker's curvature constraint
    min_fod_amp: float = 0.01,  # Trekker minFODamp
    data_support_exponent: float = 1.0,  # Trekker dataSupportExponent
    k_candidates: int = 16,
    lmax: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """FOD-amplitude-weighted probabilistic streamline propagation
    (reference tractography.py:630-641 Trekker parameter block; the
    per-branch minFODamp sweep of :455-464 maps to calling this with
    varying ``min_fod_amp``).  Returns (paths (n_steps+1, N, 3),
    valid (n_steps+1, N))."""
    C = n_sh_coefficients(lmax)
    fod_flat = fod_sh.reshape(-1, fod_sh.shape[-1])[:, :C]
    Z, Y, X = stop_mask.shape
    maskf = stop_mask.astype(jnp.float32)
    N = seeds.shape[0]

    def sample_fod(pos_nk, dirs_nk):
        """FOD amplitude at (N, K) positions along (N, K, 3) directions —
        nearest-voxel coefficient fetch + SH dot product."""
        zi = jnp.clip(jnp.round(pos_nk[..., 0]).astype(jnp.int32), 0, Z - 1)
        yi = jnp.clip(jnp.round(pos_nk[..., 1]).astype(jnp.int32), 0, Y - 1)
        xi = jnp.clip(jnp.round(pos_nk[..., 2]).astype(jnp.int32), 0, X - 1)
        coef = fod_flat[(zi * Y + yi) * X + xi]  # (N, K, C)
        basis = sh_basis(dirs_nk, lmax)  # (N, K, C)
        return jnp.sum(coef * basis, axis=-1)  # (N, K)

    def in_mask(pos):
        z, y, x = pos[:, 0], pos[:, 1], pos[:, 2]
        return trilinear(maskf, x, y, z) > 0.5

    def body(carry, step_key):
        pos, direction, alive = carry
        kc, ks = jax.random.split(step_key)
        cand = _cone_samples(kc, direction, max_angle, k_candidates)  # (N,K,3)
        cand_pos = pos[:, None, :] + step_size * cand
        amp = jnp.maximum(sample_fod(cand_pos, cand), 0.0)  # (N, K)
        ok = amp >= min_fod_amp
        any_ok = jnp.any(ok, axis=1)
        w = jnp.where(ok, amp, 0.0) ** data_support_exponent
        logits = jnp.where(ok, jnp.log(jnp.maximum(w, 1e-30)), -jnp.inf)
        gumbel = jax.random.gumbel(ks, logits.shape)
        choice = jnp.argmax(jnp.where(jnp.isfinite(logits),
                                      logits + gumbel, -jnp.inf), axis=1)
        d = jnp.take_along_axis(cand, choice[:, None, None], axis=1)[:, 0, :]
        new_pos = pos + step_size * d
        alive = alive & any_ok & in_mask(new_pos)
        pos = jnp.where(alive[:, None], new_pos, pos)
        direction = jnp.where(alive[:, None], d, direction)
        return (pos, direction, alive), (pos, alive)

    # initialization: draw the first heading from the FOD at the seed over
    # a uniform sphere (Trekker samples candidate init directions until it
    # finds data support)
    kinit, key = jax.random.split(key)
    n0 = 64
    i0 = np.arange(n0)
    phi0 = np.pi * (3.0 - np.sqrt(5.0)) * i0
    z0 = 1.0 - 2.0 * (i0 + 0.5) / n0
    r0 = np.sqrt(1.0 - z0 * z0)
    sphere = jnp.asarray(np.stack(
        [z0, r0 * np.sin(phi0), r0 * np.cos(phi0)], axis=-1), jnp.float32)
    init_dirs = jnp.broadcast_to(sphere[None], (N, n0, 3))
    init_pos = jnp.broadcast_to(seeds[:, None, :], (N, n0, 3))
    amp0 = jnp.maximum(sample_fod(init_pos, init_dirs), 0.0)
    w0 = jnp.where(amp0 >= min_fod_amp, amp0, 0.0) ** data_support_exponent
    logits0 = jnp.where(w0 > 0, jnp.log(jnp.maximum(w0, 1e-30)), -jnp.inf)
    pick0 = jnp.argmax(jnp.where(jnp.isfinite(logits0),
                                 logits0 + jax.random.gumbel(kinit, logits0.shape),
                                 -jnp.inf), axis=1)
    d0 = jnp.take_along_axis(init_dirs, pick0[:, None, None], axis=1)[:, 0, :]
    alive0 = in_mask(seeds) & jnp.any(w0 > 0, axis=1)
    step_keys = jax.random.split(key, n_steps)
    (_, _, _), (path, valid) = jax.lax.scan(
        body, (seeds.astype(jnp.float32), d0, alive0), step_keys)
    paths = jnp.concatenate([seeds[None].astype(jnp.float32), path], axis=0)
    valids = jnp.concatenate([alive0[None], valid], axis=0)
    return paths, valids


class ComputeTractsThread(threading.Thread):
    """Per-coil-pose tract recomputation (reference tractography.py:230)."""

    def __init__(self, pose_queue: queue.Queue, direction_field: np.ndarray = None,
                 stop_mask: np.ndarray = None, n_tracts_total: int = 64,
                 step_size: float = 0.5, n_steps: int = 120, bus=None,
                 fod_sh: np.ndarray = None, min_fod_amp: float = 0.01,
                 max_angle: float = 0.4, seed: int = 0,
                 world_to_vox=None):
        super().__init__(daemon=True)
        # optional world-mm (x,y,z) -> voxel (z,y,x) converter applied to
        # incoming probe poses (Volume.world_to_voxel when fields are in
        # image voxel space; reference tractography.py:661 grid_offset)
        self.world_to_vox = world_to_vox
        if direction_field is None and fod_sh is None:
            raise ValueError("need direction_field (deterministic) or "
                             "fod_sh (probabilistic)")
        if stop_mask is None:
            raise ValueError("stop_mask is required (ACT-style stopping)")
        self.pose_queue = pose_queue
        self.direction_field = (None if direction_field is None
                                else jnp.asarray(direction_field, jnp.float32))
        self.fod_sh = None if fod_sh is None else jnp.asarray(fod_sh, jnp.float32)
        self.stop_mask = jnp.asarray(stop_mask)
        self.n_tracts = n_tracts_total
        self.step_size = step_size
        self.n_steps = n_steps
        self.min_fod_amp = min_fod_amp
        self.max_angle = max_angle
        self._key = jax.random.PRNGKey(seed)
        self.bus = bus or events.bus
        self._stop_event = threading.Event()

    def compute_once(self, coil_pos_vox: np.ndarray):
        seeds = jnp.asarray(seed_grid(np.asarray(coil_pos_vox), self.n_tracts),
                            jnp.float32)
        if self.fod_sh is not None:
            self._key, sub = jax.random.split(self._key)
            C = self.fod_sh.shape[-1]
            lmax = {1: 0, 6: 2, 15: 4, 28: 6, 45: 8}.get(C, 4)
            paths, valid = track_streamlines_probabilistic(
                self.fod_sh, self.stop_mask, seeds, sub,
                self.step_size, self.n_steps, self.max_angle,
                self.min_fod_amp, lmax=lmax)
        else:
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
            pos = np.asarray(item["probe_pose_img"][:3], float)
            if self.world_to_vox is not None:
                pos = np.asarray(self.world_to_vox(pos), float)
            paths, valid = self.compute_once(pos)
            self.bus.send_message("navigation.tracts", paths=paths, valid=valid)

    def stop(self):
        self._stop_event.set()
