"""TorchScript checkpoint interop: the reference ships mandible/implant
models as TorchScript archives (reference deep_learning/segment.py:260
torch.jit.load, often wrapped in WrapModel, model.py:116-123).  These
tests script a torch twin of the TPU-side Unet2D, save it as a TorchScript
archive, convert it through models/torch_convert + models/unet2d, and
assert numerically-identical outputs (torch-cpu is the oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from invesalius3_tpu.models import torch_convert, unet2d


def _torch_unet2d(f=8):
    import torch.nn as nn
    import torch.nn.functional as F

    class TorchUnet2D(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc1_conv = nn.Conv2d(1, f, 3, padding=1)
            self.enc1_norm = nn.BatchNorm2d(f)
            self.enc2_conv = nn.Conv2d(f, f * 2, 3, padding=1)
            self.enc2_norm = nn.BatchNorm2d(f * 2)
            self.enc3_conv = nn.Conv2d(f * 2, f * 4, 3, padding=1)
            self.enc3_norm = nn.BatchNorm2d(f * 4)
            self.upconv2 = nn.ConvTranspose2d(f * 4, f * 2, 2, 2)
            self.dec2_conv = nn.Conv2d(f * 4, f * 2, 3, padding=1)
            self.dec2_norm = nn.BatchNorm2d(f * 2)
            self.upconv1 = nn.ConvTranspose2d(f * 2, f, 2, 2)
            self.dec1_conv = nn.Conv2d(f * 2, f, 3, padding=1)
            self.dec1_norm = nn.BatchNorm2d(f)
            self.conv = nn.Conv2d(f, 1, 1)

        def forward(self, x):
            e1 = F.relu(self.enc1_norm(self.enc1_conv(x)))
            e2 = F.relu(self.enc2_norm(self.enc2_conv(F.max_pool2d(e1, 2))))
            e3 = F.relu(self.enc3_norm(self.enc3_conv(F.max_pool2d(e2, 2))))
            u2 = self.upconv2(e3)
            d2 = F.relu(self.dec2_norm(self.dec2_conv(torch.cat([u2, e2], 1))))
            u1 = self.upconv1(d2)
            d1 = F.relu(self.dec1_norm(self.dec1_conv(torch.cat([u1, e1], 1))))
            return torch.sigmoid(self.conv(d1))

    m = TorchUnet2D()
    # non-trivial running stats so the batch_stats mapping is exercised
    g = torch.Generator().manual_seed(7)
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.3)
            mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) + 0.5)
    m.eval()
    return m


def _assert_flax_matches(tmodel, variables, f):
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    model = unet2d.Unet2D(features=f, dtype=jnp.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_unet2d_torchscript_equivalence(tmp_path):
    """TorchScript archive -> torch_state_dict -> flax == torch eager."""
    f = 8
    tmodel = _torch_unet2d(f)
    path = tmp_path / "implant.pt"
    scripted = torch.jit.trace(tmodel, torch.zeros(1, 1, 32, 32))
    torch.jit.save(scripted, str(path))
    variables = unet2d.load_torch_checkpoint(str(path))
    _assert_flax_matches(tmodel, variables, f)


def test_unet2d_wrapped_torchscript(tmp_path):
    """The reference's WrapModel nests the net under 'model.' — the
    extractor strips uniform wrapper prefixes."""
    import torch.nn as nn

    f = 8
    inner = _torch_unet2d(f)

    class WrapModel(nn.Module):  # reference model.py:116-123 shape
        def __init__(self, model):
            super().__init__()
            self.model = model

        def forward(self, x):
            return self.model(x)

    wrapped = WrapModel(inner)
    wrapped.eval()
    path = tmp_path / "wrapped.pt"
    torch.jit.save(torch.jit.trace(wrapped, torch.zeros(1, 1, 32, 32)), str(path))
    state = torch_convert.torch_state_dict(str(path))
    assert "enc1_conv.weight" in state  # prefix gone
    variables = unet2d.convert_torch_state_dict(state)
    _assert_flax_matches(inner, variables, f)


def test_eager_checkpoint_dict_forms(tmp_path):
    """torch_state_dict accepts {'model_state_dict': ...} checkpoints
    (the reference's training-script save format, segment.py:171-175)."""
    tmodel = _torch_unet2d(8)
    path = tmp_path / "ckpt.pt"
    torch.save({"model_state_dict": tmodel.state_dict(), "epoch": 3}, str(path))
    state = torch_convert.torch_state_dict(str(path))
    assert "conv.weight" in state
    assert not any(k.endswith("num_batches_tracked") for k in state)
    variables = unet2d.convert_torch_state_dict(state)
    _assert_flax_matches(tmodel, variables, 8)


def test_implant_segmenter_uses_converted_weights(tmp_path, monkeypatch):
    """ImplantSegmenter routes weight files through the 2D converter."""
    from invesalius3_tpu.models import segment

    f = 16  # ImplantSegmenter's default Unet2D width
    tmodel = _torch_unet2d(f)
    path = tmp_path / "cranioplasty_jit_ct_binary.pt"
    torch.jit.save(torch.jit.trace(tmodel, torch.zeros(1, 1, 32, 32)), str(path))
    monkeypatch.setattr(
        "invesalius3_tpu.net.download.get_weight_file", lambda name: str(path))
    seg = segment.ImplantSegmenter(patch_size=64)
    got = np.asarray(seg._apply(
        seg.variables, jnp.zeros((1, 64, 64, 1), jnp.float32)))
    with torch.no_grad():
        want = tmodel(torch.zeros(1, 1, 64, 64)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)  # bf16 apply
