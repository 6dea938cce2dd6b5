"""Raycast volume rendering: composite / MIP orthographic raycaster with
16-bit CLUT presets, shading, and crop plane.

Reference: invesalius/data/volume.py ``Volume`` :110 — builds VTK
color/opacity transfer functions from raycasting preset plists
(presets/raycasting/*.plist: ``16bitClutCurves``/``16bitClutColors`` node
lists, ``useShading``, ``projection``, WW/WL) and renders with
vtkOpenGLGPUVolumeRayCastMapper / vtkFixedPointVolumeRayCastMapper
(:636-646), MIP mode at :520-536, crop plane ``CutPlane`` :745.

TPU design: rays are the pixel grid of an orthographic camera; a
``lax.scan`` along ray steps samples the volume trilinearly (gather),
looks intensity up in a precomputed RGBA LUT (one more gather), and
accumulates front-to-back with per-pixel early-out masks.  The LUT, not
piecewise curve evaluation, runs in the inner loop — curves are baked
host-side exactly like VTK bakes transfer functions.
"""

from __future__ import annotations

import plistlib
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu.ops.reslice import trilinear


# ---------------------------------------------------------------------------
# CLUT presets
# ---------------------------------------------------------------------------


@dataclass
class RaycastPreset:
    """A raycasting preset: baked value->RGBA lookup table + params."""

    name: str = "Custom"
    lut_min: float = -1024.0
    lut_max: float = 3071.0
    rgba: np.ndarray = field(default_factory=lambda: np.zeros((256, 4), np.float32))
    use_shading: bool = False
    projection_mode: str = "composite"  # or "mip"
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    wl: float = 0.0
    ww: float = 2000.0

    @classmethod
    def from_plist(cls, path_or_bytes, lut_size: int = 2048) -> "RaycastPreset":
        """Parse a reference raycasting preset plist (advanced 16-bit CLUT
        curves or basic color/alpha node lists) and bake the LUT."""
        if isinstance(path_or_bytes, (bytes, bytearray)):
            d = plistlib.loads(bytes(path_or_bytes))
        else:
            with open(path_or_bytes, "rb") as f:
                d = plistlib.load(f)

        name = d.get("name", "Custom")
        use_shading = bool(d.get("useShading", False))
        proj = "mip" if d.get("projection", 0) in (2, "MIP") else "composite"
        bg = (
            float(d.get("backgroundColorRedComponent", 0.0)),
            float(d.get("backgroundColorGreenComponent", 0.0)),
            float(d.get("backgroundColorBlueComponent", 0.0)),
        )

        if d.get("advancedCLUT"):
            curves = d["16bitClutCurves"]
            colors = d["16bitClutColors"]
            xs = [p["x"] for curve in curves for p in curve]
            lut_min, lut_max = min(xs), max(xs)
            values = np.linspace(lut_min, lut_max, lut_size)
            rgba = np.zeros((lut_size, 4), np.float32)
            for curve, cols in zip(curves, colors):
                cx = np.array([p["x"] for p in curve])
                cy = np.array([p["y"] for p in curve])
                cr = np.array([c["red"] for c in cols])
                cg = np.array([c["green"] for c in cols])
                cb = np.array([c["blue"] for c in cols])
                inside = (values >= cx[0]) & (values <= cx[-1])
                a = np.interp(values, cx, cy)
                r = np.interp(values, cx, cr)
                g = np.interp(values, cx, cg)
                b = np.interp(values, cx, cb)
                # curves are disjoint intensity windows; outside a curve its
                # contribution is zero
                sel = inside & (a > rgba[:, 3])
                rgba[sel] = np.stack([r, g, b, a], axis=1)[sel]
        else:
            # basic preset: 'red'/'green'/'blue' + 'alpha' node dicts
            cx = [p["x"] for p in d.get("alpha", [{"x": 0, "y": 0}, {"x": 1000, "y": 1}])]
            lut_min, lut_max = min(cx), max(cx)
            values = np.linspace(lut_min, lut_max, lut_size)
            a = np.interp(values, cx, [p["y"] for p in d["alpha"]]) if "alpha" in d else np.ones(lut_size)
            rgba = np.zeros((lut_size, 4), np.float32)
            rgba[:, 3] = a
            for i, ch in enumerate(("red", "green", "blue")):
                if ch in d:
                    nx = [p["x"] for p in d[ch]]
                    ny = [p["y"] for p in d[ch]]
                    rgba[:, i] = np.interp(values, nx, ny)
                else:
                    rgba[:, i] = 1.0

        return cls(
            name=name, lut_min=lut_min, lut_max=lut_max, rgba=rgba,
            use_shading=use_shading, projection_mode=proj, background=bg,
            wl=float(d.get("wl", 0.0)), ww=float(d.get("ww", 2000.0)),
        )


def builtin_preset(name: str = "Bone") -> RaycastPreset:
    """A few built-in presets (authored, not copied): Bone, Soft Tissue,
    MIP — covering the reference's preset *capability*."""
    lut_size = 2048
    if name == "Bone":
        lo, hi = -200.0, 2000.0
        values = np.linspace(lo, hi, lut_size)
        a = np.clip((values - 200.0) / 500.0, 0, 1) * 0.9
        r = np.clip((values - 100.0) / 900.0, 0, 1) * 0.4 + 0.6
        g = np.clip((values - 200.0) / 1200.0, 0, 1) * 0.45 + 0.55
        b = np.clip((values - 300.0) / 1700.0, 0, 1) * 0.5 + 0.45
        rgba = np.stack([r, g, b, a], axis=1).astype(np.float32)
        return RaycastPreset("Bone", lo, hi, rgba, use_shading=True)
    if name == "Soft Tissue":
        lo, hi = -800.0, 400.0
        values = np.linspace(lo, hi, lut_size)
        a = np.clip((values + 300.0) / 400.0, 0, 1) * 0.4
        r = np.full(lut_size, 0.85)
        g = np.full(lut_size, 0.55)
        b = np.full(lut_size, 0.45)
        rgba = np.stack([r, g, b, a], axis=1).astype(np.float32)
        return RaycastPreset("Soft Tissue", lo, hi, rgba, use_shading=True)
    if name == "MIP":
        lo, hi = -1024.0, 3071.0
        rgba = np.tile(np.linspace(0, 1, lut_size, dtype=np.float32)[:, None], (1, 4))
        return RaycastPreset("MIP", lo, hi, rgba, projection_mode="mip")
    if name == "Dark Bone":
        lo, hi = 100.0, 2500.0
        values = np.linspace(lo, hi, lut_size)
        a = np.clip((values - 300.0) / 700.0, 0, 1) * 0.95
        g = np.clip((values - 300.0) / 2200.0, 0, 1)
        rgba = np.stack([g * 0.9, g * 0.85, g * 0.8, a], axis=1).astype(np.float32)
        return RaycastPreset("Dark Bone", lo, hi, rgba, use_shading=True)
    if name == "Bone + Skin":
        lo, hi = -800.0, 2000.0
        values = np.linspace(lo, hi, lut_size)
        skin = np.clip(1.0 - np.abs(values + 400.0) / 250.0, 0, 1)
        bone = np.clip((values - 200.0) / 500.0, 0, 1)
        a = np.maximum(skin * 0.25, bone * 0.9)
        r = np.where(bone > skin, 0.95, 0.85)
        g = np.where(bone > skin, 0.92, 0.55)
        b = np.where(bone > skin, 0.85, 0.45)
        rgba = np.stack([r, g, b, a], axis=1).astype(np.float32)
        return RaycastPreset("Bone + Skin", lo, hi, rgba, use_shading=True)
    if name == "Airways":
        # air cavities: invert — low HU visible
        lo, hi = -1024.0, -300.0
        values = np.linspace(lo, hi, lut_size)
        a = np.clip((-values - 500.0) / 400.0, 0, 1) * 0.6
        rgba = np.stack([np.full(lut_size, 0.4), np.full(lut_size, 0.7),
                         np.full(lut_size, 1.0), a], axis=1).astype(np.float32)
        return RaycastPreset("Airways", lo, hi, rgba, use_shading=True)
    if name == "High Contrast":
        lo, hi = -200.0, 1200.0
        values = np.linspace(lo, hi, lut_size)
        t = np.clip((values - lo) / (hi - lo), 0, 1)
        a = t**3 * 0.95
        rgba = np.stack([t, t * 0.6 + 0.2, 0.2 + 0.1 * t, a], axis=1).astype(np.float32)
        return RaycastPreset("High Contrast", lo, hi, rgba, use_shading=True)
    if name == "Black & White":
        lo, hi = -1024.0, 3071.0
        t = np.linspace(0, 1, lut_size, dtype=np.float32)
        a = np.clip((t - 0.3) / 0.3, 0, 1) * 0.9
        rgba = np.stack([t, t, t, a], axis=1).astype(np.float32)
        return RaycastPreset("Black & White", lo, hi, rgba, use_shading=False)
    raise KeyError(name)


BUILTIN_PRESETS = ("Bone", "Soft Tissue", "MIP", "Dark Bone", "Bone + Skin",
                   "Airways", "High Contrast", "Black & White")


# ---------------------------------------------------------------------------
# Camera
# ---------------------------------------------------------------------------


def camera_rays(
    shape: Tuple[int, int, int],
    spacing: Tuple[float, float, float],
    azimuth: float,
    elevation: float,
    image_size: int = 512,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Orthographic camera looking at the volume center from (azimuth,
    elevation) degrees.  Returns (origins (H, W, 3), direction (3,),
    up-scale, ray length) in voxel coordinates (z, y, x order)."""
    dz, dy, dx = shape
    sx, sy, sz = spacing
    center = np.array([dz * sz, dy * sy, dx * sx]) / 2.0  # world (z, y, x)
    diag = float(np.linalg.norm(center) * 2.0)

    az = np.radians(azimuth)
    el = np.radians(elevation)
    # view direction in world (z, y, x): az rotates in the (x, y) plane,
    # el tilts toward +z
    d = np.array([np.sin(el), np.cos(el) * np.cos(az), np.cos(el) * np.sin(az)])
    d = d / np.linalg.norm(d)
    # build orthonormal basis
    upw = np.array([1.0, 0.0, 0.0]) if abs(d[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    right = np.cross(d, upw)
    right /= np.linalg.norm(right)
    up = np.cross(right, d)

    half = diag / 2.0
    js = np.linspace(-half, half, image_size)
    is_ = np.linspace(-half, half, image_size)
    grid_u, grid_v = np.meshgrid(is_, js, indexing="ij")
    eye = center - d * diag / 2.0
    origins = (
        eye[None, None, :]
        + grid_u[..., None] * up[None, None, :]
        + grid_v[..., None] * right[None, None, :]
    )
    # to voxel units
    scale = np.array([sz, sy, sx])
    return (origins / scale).astype(np.float32), (d / scale).astype(np.float32), diag, float(
        np.linalg.norm(d / scale)
    )


# ---------------------------------------------------------------------------
# Renderer
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_steps", "mode", "use_shading"))
def raycast(
    volume: jax.Array,
    origins: jax.Array,  # (H, W, 3) voxel coords (z, y, x)
    direction: jax.Array,  # (3,) voxel-space step vector per unit t
    t_max: float,
    lut_rgba: jax.Array,  # (N, 4)
    lut_min: float,
    lut_max: float,
    n_steps: int = 256,
    mode: str = "composite",
    use_shading: bool = False,
    crop_plane: Optional[jax.Array] = None,  # (4,) plane eq in voxel coords
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> jax.Array:
    """Returns (H, W, 3) float32 image in [0, 1]."""
    H, W = origins.shape[:2]
    dt = t_max / n_steps
    step = direction * dt
    n_lut = lut_rgba.shape[0]
    vol_f = volume.astype(jnp.float32)

    def lut_lookup(v):
        idx = (v - lut_min) / (lut_max - lut_min) * (n_lut - 1)
        idx = jnp.clip(idx, 0, n_lut - 1).astype(jnp.int32)
        return lut_rgba[idx]

    def sample(pos):
        z, y, x = pos[..., 0], pos[..., 1], pos[..., 2]
        dzv, dyv, dxv = vol_f.shape
        valid = (
            (z >= 0) & (z < dzv - 1) & (y >= 0) & (y < dyv - 1)
            & (x >= 0) & (x < dxv - 1)
        )
        if crop_plane is not None:
            keep = (
                crop_plane[0] * z + crop_plane[1] * y + crop_plane[2] * x + crop_plane[3]
            ) >= 0
            valid = valid & keep
        v = trilinear(vol_f, jnp.where(valid, x, 0.0), jnp.where(valid, y, 0.0),
                      jnp.where(valid, z, 0.0))
        return jnp.where(valid, v, jnp.float32(lut_min)), valid

    if mode == "mip":
        def body(carry, i):
            best = carry
            pos = origins + step * i.astype(jnp.float32)
            v, valid = sample(pos)
            best = jnp.maximum(best, jnp.where(valid, v, best))
            return best, None

        init = jnp.full((H, W), jnp.float32(lut_min))
        best, _ = jax.lax.scan(body, init, jnp.arange(n_steps))
        rgba = lut_lookup(best)
        return rgba[..., :3]

    # composite front-to-back
    grad_shift = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)

    def body(carry, i):
        colour, alpha, done = carry
        pos = origins + step * i.astype(jnp.float32)
        v, valid = sample(pos)
        rgba = lut_lookup(v)
        a = jnp.where(valid & ~done, rgba[..., 3], 0.0)
        rgb = rgba[..., :3]
        if use_shading:
            # central-difference gradient diffuse shading (headlight)
            eps = 1.0
            gz, _ = sample(pos + jnp.array([eps, 0, 0], jnp.float32))
            gz2, _ = sample(pos - jnp.array([eps, 0, 0], jnp.float32))
            gy, _ = sample(pos + jnp.array([0, eps, 0], jnp.float32))
            gy2, _ = sample(pos - jnp.array([0, eps, 0], jnp.float32))
            gx, _ = sample(pos + jnp.array([0, 0, eps], jnp.float32))
            gx2, _ = sample(pos - jnp.array([0, 0, eps], jnp.float32))
            g = jnp.stack([gz - gz2, gy - gy2, gx - gx2], axis=-1)
            gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
            g = g / jnp.where(gn == 0, 1.0, gn)
            diffuse = jnp.abs(jnp.sum(g * (-direction / jnp.linalg.norm(direction)), axis=-1))
            rgb = rgb * (0.3 + 0.7 * diffuse[..., None])
        w = (1.0 - alpha) * a
        colour = colour + rgb * w[..., None]
        alpha = alpha + w
        done = done | (alpha >= 0.99)
        return (colour, alpha, done), None

    init = (
        jnp.zeros((H, W, 3), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.bool_),
    )
    (colour, alpha, _), _ = jax.lax.scan(body, init, jnp.arange(n_steps))
    bg = jnp.asarray(background, jnp.float32)
    return colour + (1.0 - alpha[..., None]) * bg


def render(
    volume,
    spacing=(1.0, 1.0, 1.0),
    preset: Optional[RaycastPreset] = None,
    azimuth: float = 0.0,
    elevation: float = 0.0,
    image_size: int = 512,
    n_steps: int = 256,
    crop_plane=None,
) -> np.ndarray:
    """Convenience wrapper: render a volume to (H, W, 3) uint8."""
    preset = preset or builtin_preset("Bone")
    origins, direction, diag, dirlen = camera_rays(
        volume.shape, spacing, azimuth, elevation, image_size)
    img = raycast(
        jnp.asarray(volume), jnp.asarray(origins), jnp.asarray(direction),
        float(diag), jnp.asarray(preset.rgba), preset.lut_min, preset.lut_max,
        n_steps=n_steps, mode=preset.projection_mode,
        use_shading=preset.use_shading,
        crop_plane=None if crop_plane is None else jnp.asarray(crop_plane, jnp.float32),
        background=preset.background,
    )
    return np.asarray(jnp.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


def render_mask_preview(
    mask,
    spacing=(1.0, 1.0, 1.0),
    colour=(0.33, 1.0, 0.33),
    azimuth: float = 0.0,
    elevation: float = 0.0,
    image_size: int = 256,
    n_steps: int = 128,
) -> np.ndarray:
    """3D preview of a mask during editing (reference
    invesalius/data/volume_mask.py: GPU raycast of the mask with its
    colour): a raycast with a two-node LUT over the 0/255 mask values."""
    lut = np.zeros((256, 4), np.float32)
    lut[127:, 0] = colour[0]
    lut[127:, 1] = colour[1]
    lut[127:, 2] = colour[2]
    lut[127:, 3] = 0.9
    preset = RaycastPreset(
        name="MaskPreview", lut_min=0.0, lut_max=255.0, rgba=lut,
        use_shading=True)
    return render(mask, spacing, preset, azimuth=azimuth, elevation=elevation,
                  image_size=image_size, n_steps=n_steps)
