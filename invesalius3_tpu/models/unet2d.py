"""2D U-Net for slice-wise segmentation (cranioplasty implant generation).

The reference ships its implant model as an opaque TorchScript archive
(reference invesalius/segmentation/deep_learning/segment.py:227-264
``segment_torch_jit`` with ``cranioplasty_jit_ct_binary`` weights, loaded
via ``torch.jit.load``) — the architecture is not in the source tree.
This module defines the TPU-side 2D U-Net with *named* layers and a
checkpoint converter mirroring unet3d's, so any torch state_dict (eager or
TorchScript-extracted, see models/torch_convert.py) whose module names
match converts directly; tests/test_torch_convert.py asserts numerical
equivalence against a torch mirror.

TPU notes: NHWC activations, bfloat16 compute / float32 params by default,
whole patch batches per jitted call.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PATCH = 480  # reference implant patch size (segment.py:30)


class Unet2D(nn.Module):
    """3-level encoder/decoder: (conv3x3 + BN + relu) per level, maxpool 2,
    ConvTranspose k2 s2 upsampling, skip concats, 1x1 sigmoid head."""

    features: int = 16
    out_channels: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features

        def block(x, feats, name):
            x = nn.Conv(feats, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"{name}_norm")(x)
            return nn.relu(x)

        e1 = block(x, f, "enc1")
        e2 = block(nn.max_pool(e1, (2, 2), (2, 2)), f * 2, "enc2")
        e3 = block(nn.max_pool(e2, (2, 2), (2, 2)), f * 4, "enc3")
        u2 = nn.ConvTranspose(f * 2, (2, 2), (2, 2), transpose_kernel=True,
                              dtype=self.dtype, name="upconv2")(e3)
        d2 = block(jnp.concatenate([u2, e2], -1), f * 2, "dec2")
        u1 = nn.ConvTranspose(f, (2, 2), (2, 2), transpose_kernel=True,
                              dtype=self.dtype, name="upconv1")(d2)
        d1 = block(jnp.concatenate([u1, e1], -1), f, "dec1")
        out = nn.Conv(self.out_channels, (1, 1), name="conv")(d1)
        return jax.nn.sigmoid(out.astype(jnp.float32))


_BLOCKS = ("enc1", "enc2", "enc3", "dec2", "dec1")


def convert_torch_state_dict(state: Dict[str, "np.ndarray"]) -> Dict:
    """torch state_dict (module names ``enc1_conv``/``enc1_norm``/
    ``upconv1``/``conv`` — the names ``Unet2D`` declares) -> flax variables.

    torch Conv2d weight (out, in, kh, kw) -> flax (kh, kw, in, out);
    torch ConvTranspose2d weight (in, out, kh, kw) -> flax
    transpose_kernel=True layout (kh, kw, out, in).
    """
    from invesalius3_tpu.models.torch_convert import strip_wrapper_prefixes

    state = {k: np.asarray(v) for k, v in strip_wrapper_prefixes(state).items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for b in _BLOCKS:
        params[f"{b}_conv"] = {
            "kernel": np.transpose(state[f"{b}_conv.weight"], (2, 3, 1, 0)),
            "bias": state[f"{b}_conv.bias"],
        }
        params[f"{b}_norm"] = {
            "scale": state[f"{b}_norm.weight"],
            "bias": state[f"{b}_norm.bias"],
        }
        stats[f"{b}_norm"] = {
            "mean": state[f"{b}_norm.running_mean"],
            "var": state[f"{b}_norm.running_var"],
        }
    for name in ("upconv2", "upconv1"):
        params[name] = {
            "kernel": np.transpose(state[f"{name}.weight"], (2, 3, 1, 0)),
            "bias": state[f"{name}.bias"],
        }
    params["conv"] = {
        "kernel": np.transpose(state["conv.weight"], (2, 3, 1, 0)),
        "bias": state["conv.bias"],
    }
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path) -> Dict:
    """Load a torch ``.pt``/TorchScript checkpoint and convert."""
    from invesalius3_tpu.models.torch_convert import torch_state_dict

    return convert_torch_state_dict(torch_state_dict(path))
