"""MEP (motor evoked potential) motor mapping as data.

Reference: invesalius/data/visualization/mep_visualizer.py — markers carry
MEP amplitudes (µV); a gaussian point-interpolation kernel
(vtkGaussianKernel inside vtkPointInterpolator, :155 InterpolateData)
spreads them over the (decimated) brain surface, and a 4-anchor color
transfer function over ``colormap_range_uv`` colors the vertices
(:192 _CustomColormap).  Config defaults mirror
constants.py:1076 DEFAULT_MEP_CONFIG_PARAMS.

TPU design: the GUI actor plumbing is dropped; the data products — the
per-vertex interpolated amplitude field and its RGB mapping — are one
batched kernel each (a (V, N) distance product on the MXU; N markers is
small).  Any frontend (the HTTP viewer, an exporter) can consume them.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CORTEX_COLOR = (190 / 255.0, 190 / 255.0, 190 / 255.0)

DEFAULT_MEP_CONFIG = {
    "mep_enabled": False,
    "threshold_down": 0,
    "range_up": 1,
    "mep_colormap": "Viridis",
    "gaussian_sharpness": 1.0,
    "gaussian_radius": 3.0,
    "dimensions_size": 80,
    "colormap_range_uv": {"min": 50, "low": 200, "mid": 600, "max": 1000},
}

MEP_COLORMAPS: Dict[str, Dict[str, Tuple[float, float, float]]] = {
    "BlueCyanYellowRed": {
        "min": (0.0, 0.0, 1.0), "low": (0.0, 1.0, 1.0),
        "mid": (1.0, 1.0, 0.0), "max": (1.0, 0.0, 0.0)},
    "GreenYellowOrangeRed": {
        "min": (0.0, 1.0, 0.0), "low": (1.0, 1.0, 0.0),
        "mid": (1.0, 0.647, 0.0), "max": (1.0, 0.0, 0.0)},
    "PurpleBlueGreenYellow": {
        "min": (0.5, 0.0, 0.5), "low": (0.0, 0.0, 1.0),
        "mid": (0.0, 1.0, 0.0), "max": (1.0, 1.0, 0.0)},
    "BlackGrayWhiteRed": {
        "min": (0.0, 0.0, 0.0), "low": (0.5, 0.5, 0.5),
        "mid": (1.0, 1.0, 1.0), "max": (1.0, 0.0, 0.0)},
    "Viridis": {
        "min": (0.267, 0.005, 0.329), "low": (0.229, 0.322, 0.545),
        "mid": (0.369, 0.788, 0.382), "max": (0.993, 0.906, 0.144)},
}


@jax.jit
def _gaussian_interpolate(verts3v: jnp.ndarray, points3n: jnp.ndarray,
                          values: jnp.ndarray, sharpness, radius):
    """vtkGaussianKernel semantics: w_i = exp(-(sharpness * r / radius)^2)
    within `radius`, value = sum(w v) / sum(w); vertices with no in-range
    point get 0.  verts3v (3, V), points3n (3, N)."""
    d2 = sum((verts3v[c][:, None] - points3n[c][None, :]) ** 2
             for c in range(3))  # (V, N)
    w = jnp.exp(-(sharpness * sharpness) * d2 / (radius * radius))
    w = jnp.where(d2 <= radius * radius, w, 0.0)
    wsum = jnp.sum(w, axis=1)
    vals = jnp.sum(w * values[None, :], axis=1) / jnp.maximum(wsum, 1e-12)
    return jnp.where(wsum > 0, vals, 0.0)


def interpolate_mep_surface(verts: np.ndarray, marker_positions: np.ndarray,
                            mep_values: np.ndarray,
                            config: Optional[dict] = None) -> np.ndarray:
    """Per-vertex MEP amplitude field (µV) over a surface."""
    cfg = dict(DEFAULT_MEP_CONFIG, **(config or {}))
    v3 = jnp.asarray(np.asarray(verts, np.float32).T)
    p3 = jnp.asarray(np.asarray(marker_positions, np.float32).T)
    vals = jnp.asarray(np.asarray(mep_values, np.float32))
    out = _gaussian_interpolate(
        v3, p3, vals, jnp.float32(cfg["gaussian_sharpness"]),
        jnp.float32(cfg["gaussian_radius"]))
    return np.asarray(out)


def mep_colors(values: np.ndarray, config: Optional[dict] = None) -> np.ndarray:
    """(V, 3) RGB: piecewise-linear through the 4 colormap anchors at the
    configured µV breakpoints; 0/no-data renders the cortex color
    (reference _CustomColormap adds RGBPoint(0, CORTEX_COLOR))."""
    cfg = dict(DEFAULT_MEP_CONFIG, **(config or {}))
    cmap = MEP_COLORMAPS[cfg["mep_colormap"]]
    rng = cfg["colormap_range_uv"]
    xs = [0.0] + [float(rng[k]) for k in ("min", "low", "mid", "max")]
    anchors = [CORTEX_COLOR] + [cmap[k] for k in ("min", "low", "mid", "max")]
    v = np.asarray(values, np.float32)
    out = np.empty(v.shape + (3,), np.float32)
    for c in range(3):
        out[..., c] = np.interp(v, xs, [a[c] for a in anchors])
    return out


@dataclasses.dataclass
class MEPMapper:
    """Session-configured motor mapping (reference MEPVisualizer state:
    config persisted under 'mep_configuration')."""

    config: dict = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_MEP_CONFIG))

    @classmethod
    def from_session(cls, session) -> "MEPMapper":
        cfg = session.get_config("mep_configuration") or {}
        return cls(config=dict(DEFAULT_MEP_CONFIG, **cfg))

    def save_to_session(self, session) -> None:
        session.set_config("mep_configuration", self.config)

    def map_markers(self, surface_verts: np.ndarray, markers) -> dict:
        """markers: iterable with .position and .mep_value (µV; markers
        without a value are skipped).  Returns {values, colors}."""
        pos, vals = [], []
        for m in markers:
            v = getattr(m, "mep_value", None)
            if v is not None:
                pos.append(np.asarray(m.position, float))
                vals.append(float(v))
        if not pos:
            values = np.zeros(len(surface_verts), np.float32)
        else:
            values = interpolate_mep_surface(
                surface_verts, np.asarray(pos), np.asarray(vals), self.config)
        return {"values": values, "colors": mep_colors(values, self.config)}
