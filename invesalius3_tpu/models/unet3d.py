"""3D U-Net for volumetric segmentation, in Flax.

Architecture mirrors the reference torch model (reference
invesalius/segmentation/deep_learning/model.py:9-114 ``Unet3D``: 4-level
encoder/decoder, 5x5x5 convs pad 2, BatchNorm+ReLU x2 per block,
maxpool 2, ConvTranspose k4 s2 p1, skip concats, sigmoid head,
init_features=8) so the published ``brain_mri_t1`` / trachea weights
convert directly.

TPU notes: activations are NDHWC (channels-last — the TPU conv layout),
compute in bfloat16 with float32 params/stats by default, and the whole
patch batch runs as one jitted call; multi-chip inference shards the patch
batch over the mesh (see invesalius3_tpu.models.segment).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SIZE = 48  # reference patch size (model.py:6)


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in (1, 2):
            x = nn.Conv(
                self.features, kernel_size=(5, 5, 5), padding=2, use_bias=True,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=f"norm{i}",
            )(x)
            x = nn.relu(x)
        return x


class Unet3D(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    init_features: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, D, H, W, C) -> sigmoid probabilities, same spatial shape."""
        f = self.init_features
        enc1 = ConvBlock(f, self.dtype, name="encoder1")(x, train)
        enc2 = ConvBlock(f * 2, self.dtype, name="encoder2")(_maxpool(enc1), train)
        enc3 = ConvBlock(f * 4, self.dtype, name="encoder3")(_maxpool(enc2), train)
        enc4 = ConvBlock(f * 8, self.dtype, name="encoder4")(_maxpool(enc3), train)

        bott = ConvBlock(f * 16, self.dtype, name="bottleneck")(_maxpool(enc4), train)

        up4 = _upconv(bott, f * 8, self.dtype, "upconv4")
        dec4 = ConvBlock(f * 8, self.dtype, name="decoder4")(
            jnp.concatenate([up4, enc4], axis=-1), train)
        up3 = _upconv(dec4, f * 4, self.dtype, "upconv3")
        dec3 = ConvBlock(f * 4, self.dtype, name="decoder3")(
            jnp.concatenate([up3, enc3], axis=-1), train)
        up2 = _upconv(dec3, f * 2, self.dtype, "upconv2")
        dec2 = ConvBlock(f * 2, self.dtype, name="decoder2")(
            jnp.concatenate([up2, enc2], axis=-1), train)
        up1 = _upconv(dec2, f, self.dtype, "upconv1")
        dec1 = ConvBlock(f, self.dtype, name="decoder1")(
            jnp.concatenate([up1, enc1], axis=-1), train)

        out = nn.Conv(self.out_channels, kernel_size=(1, 1, 1), name="conv")(dec1)
        return jax.nn.sigmoid(out.astype(jnp.float32))


def _maxpool(x):
    return nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))


def _upconv(x, features, dtype, name):
    """torch ConvTranspose3d(k=4, s=2, p=1) == 2x upsampling.  flax 'SAME'
    for k=4/s=2 distributes the (k-s)=2 crop as 1+1 — exactly torch's p=1
    (numerical equivalence asserted in tests/test_unet.py)."""
    return nn.ConvTranspose(
        features, kernel_size=(4, 4, 4), strides=(2, 2, 2),
        padding="SAME", transpose_kernel=True,
        dtype=dtype, name=name,
    )(x)


def init_params(rng: jax.Array, size: int = SIZE, **kw) -> Dict:
    """Initialize variables (params + batch_stats)."""
    model = Unet3D(**kw)
    x = jnp.zeros((1, size, size, size, model.in_channels), jnp.float32)
    return model.init(rng, x, train=False)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (weights from github.com/invesalius/weights)
# ---------------------------------------------------------------------------

_BLOCKS = {
    "encoder1": "encoder1", "encoder2": "encoder2", "encoder3": "encoder3",
    "encoder4": "encoder4", "bottleneck": "bottleneck",
    "decoder1": "decoder1", "decoder2": "decoder2", "decoder3": "decoder3",
    "decoder4": "decoder4",
}


def convert_torch_state_dict(state: Dict[str, "np.ndarray"]) -> Dict:
    """Convert the reference torch ``Unet3D.state_dict()`` to flax
    variables {params, batch_stats}.

    torch Conv3d weight: (out, in, kd, kh, kw) -> flax (kd, kh, kw, in, out)
    torch ConvTranspose3d weight: (in, out, kd, kh, kw) -> flax with
    transpose_kernel=True expects (kd, kh, kw, out, in)... we map it to the
    mathematically-identical gradient-of-conv layout.
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_w(w):
        return np.transpose(w, (2, 3, 4, 1, 0))

    def convT_w(w):
        # torch: (in, out, kd, kh, kw); flax transpose_kernel=True wants the
        # conv-gradient kernel (kd, kh, kw, out, in)
        return np.transpose(w, (2, 3, 4, 1, 0))

    # blocks: torch keys like "encoder1.enc1_conv1.weight",
    # "encoder1.enc1_norm1.running_mean" ... names embed the block alias
    for tname, fname in _BLOCKS.items():
        block_p: Dict[str, Any] = {}
        block_s: Dict[str, Any] = {}
        prefix = f"{tname}."
        keys = [k for k in state if k.startswith(prefix)]
        for k in keys:
            sub = k[len(prefix):]
            # sub like "enc1_conv1.weight" / "bottleneck_norm2.running_var"
            layer, param = sub.split(".", 1)
            idx = layer[-1]  # '1' or '2'
            if "_conv" in layer:
                tgt = block_p.setdefault(f"conv{idx}", {})
                if param == "weight":
                    tgt["kernel"] = conv_w(state[k])
                else:
                    tgt["bias"] = state[k]
            elif "_norm" in layer:
                if param in ("weight", "bias"):
                    tgt = block_p.setdefault(f"norm{idx}", {})
                    tgt["scale" if param == "weight" else "bias"] = state[k]
                elif param == "running_mean":
                    block_s.setdefault(f"norm{idx}", {})["mean"] = state[k]
                elif param == "running_var":
                    block_s.setdefault(f"norm{idx}", {})["var"] = state[k]
        params[fname] = block_p
        stats[fname] = block_s

    for i in (1, 2, 3, 4):
        params[f"upconv{i}"] = {
            "kernel": convT_w(state[f"upconv{i}.weight"]),
            "bias": state[f"upconv{i}.bias"],
        }
    params["conv"] = {
        "kernel": conv_w(state["conv.weight"]),
        "bias": state["conv.bias"],
    }
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path) -> Dict:
    """Load a reference torch checkpoint — eager ``.pt`` state_dict
    (brain/trachea) or TorchScript archive (mandible, reference
    segment.py:260 torch.jit.load) — and convert."""
    from invesalius3_tpu.models.torch_convert import torch_state_dict

    return convert_torch_state_dict(torch_state_dict(path))
