"""FastSurfer-style 2.5D brain parcellation pipeline.

Reference: invesalius/segmentation/deep_learning/fastsurfer_subpart/ —
``Pipeline`` (pipeline.py:36): conform the T1 to 1mm/256 LIA
(conform_and_save :203), run a per-plane (axial/coronal/sagittal) 2.5D CNN
with 7-slice thick-slice inputs, aggregate the three views' logits
(weighted sum, sagittal mapped to the full label set), argmax -> label
volume (LUT.tsv label table).

TPU design: one Flax CNN applied per plane; all slices of a plane run as
one batch (N=256 thick-slices) on the MXU; view aggregation is a fused
weighted sum.  The network here is a compact VGG-ish encoder-decoder —
the reference's exact FastSurferCNN weights can be converted with the
same conv-layout rules as unet3d.convert_torch_state_dict once available
locally (zero-egress environment: no weight downloads).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CONFORM_SIZE = 256
THICK = 7  # thick-slice input channels (FastSurfer convention)


class PlaneCNN(nn.Module):
    """Compact per-plane segmentation CNN (encoder-decoder, 2.5D input)."""

    num_classes: int = 79
    features: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features

        def block(x, feats):
            x = nn.Conv(feats, (3, 3), dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
            x = nn.relu(x)
            x = nn.Conv(feats, (3, 3), dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
            return nn.relu(x)

        e1 = block(x, f)
        e2 = block(nn.max_pool(e1, (2, 2), (2, 2)), f * 2)
        e3 = block(nn.max_pool(e2, (2, 2), (2, 2)), f * 4)
        b = block(nn.max_pool(e3, (2, 2), (2, 2)), f * 8)
        u3 = nn.ConvTranspose(f * 4, (2, 2), (2, 2), dtype=self.dtype)(b)
        d3 = block(jnp.concatenate([u3, e3], -1), f * 4)
        u2 = nn.ConvTranspose(f * 2, (2, 2), (2, 2), dtype=self.dtype)(d3)
        d2 = block(jnp.concatenate([u2, e2], -1), f * 2)
        u1 = nn.ConvTranspose(f, (2, 2), (2, 2), dtype=self.dtype)(d2)
        d1 = block(jnp.concatenate([u1, e1], -1), f)
        return nn.Conv(self.num_classes, (1, 1))(d1).astype(jnp.float32)


def conform(volume: np.ndarray, out_size: int = CONFORM_SIZE) -> np.ndarray:
    """Conform to isotropic out_size^3 with intensity rescale to uint8
    (reference conform_and_save :203 semantics, simplified: no LIA
    reorientation — the reader already canonicalizes to RAS)."""
    from invesalius3_tpu.ops.resize import resize_volume

    v = jnp.asarray(volume, jnp.float32)
    v = resize_volume(v, (out_size,) * 3, order=1)
    vmin, vmax = jnp.min(v), jnp.max(v)
    v = (v - vmin) / jnp.where(vmax == vmin, 1.0, vmax - vmin) * 255.0
    return np.asarray(v).astype(np.float32)


def thick_slices(volume: np.ndarray, axis: int, thick: int = THICK) -> jnp.ndarray:
    """(N, H, W, thick) batch of thick slices along ``axis`` (edge pad)."""
    v = jnp.moveaxis(jnp.asarray(volume), axis, 0)
    h = thick // 2
    padded = jnp.pad(v, ((h, h), (0, 0), (0, 0)), mode="edge")
    stacked = jnp.stack([padded[i : i + v.shape[0]] for i in range(thick)], axis=-1)
    return stacked


class FastSurferPipeline:
    """Per-plane inference + view aggregation (reference pipeline.py:36)."""

    VIEW_WEIGHTS = {"axial": 0.4, "coronal": 0.4, "sagittal": 0.2}

    def __init__(self, num_classes: int = 79, variables: Optional[Dict] = None,
                 batch_size: int = 16):
        self.model = PlaneCNN(num_classes=num_classes)
        self.num_classes = num_classes
        self.batch_size = batch_size
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 32, THICK)), train=False)
        self.variables = {"axial": variables, "coronal": variables,
                          "sagittal": variables}

        @jax.jit
        def _apply(vars_, batch):
            return self.model.apply(vars_, batch, train=False)

        self._apply = _apply

    def _run_plane(self, volume: np.ndarray, axis: int, view: str) -> jnp.ndarray:
        batch = thick_slices(volume, axis)
        outs = []
        for i in range(0, batch.shape[0], self.batch_size):
            outs.append(self._apply(self.variables[view], batch[i : i + self.batch_size]))
        logits = jnp.concatenate(outs, axis=0)  # (N, H, W, C)
        return jnp.moveaxis(logits, 0, axis)  # back to volume order

    def run(self, t1_volume: np.ndarray, conform_input: bool = True,
            conform_size: int = CONFORM_SIZE) -> np.ndarray:
        """Returns an int32 label volume (argmax of the aggregated views)."""
        vol = (conform(t1_volume, conform_size) if conform_input
               else np.asarray(t1_volume, np.float32))
        agg = None
        for view, axis in (("axial", 0), ("coronal", 1), ("sagittal", 2)):
            logits = self._run_plane(vol, axis, view) * self.VIEW_WEIGHTS[view]
            agg = logits if agg is None else agg + logits
        return np.asarray(jnp.argmax(agg, axis=-1).astype(jnp.int32))
