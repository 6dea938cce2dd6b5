"""Flax Unet3D vs the reference torch architecture: converted weights must
produce numerically-identical outputs (torch-cpu is the oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from invesalius3_tpu.models import segment, unet3d


def _torch_reference_unet():
    """The reference Unet3D rebuilt in torch (architecture of reference
    deep_learning/model.py:9-114) so converted checkpoints can be verified
    without downloading weights."""
    from collections import OrderedDict

    import torch.nn as nn

    class Unet3D(nn.Module):
        def __init__(self, in_channels=1, out_channels=1, init_features=8):
            super().__init__()
            f = init_features
            self.encoder1 = self._block(in_channels, f, "enc1")
            self.pool1 = nn.MaxPool3d(2, 2)
            self.encoder2 = self._block(f, f * 2, "enc2")
            self.pool2 = nn.MaxPool3d(2, 2)
            self.encoder3 = self._block(f * 2, f * 4, "enc3")
            self.pool3 = nn.MaxPool3d(2, 2)
            self.encoder4 = self._block(f * 4, f * 8, "enc4")
            self.pool4 = nn.MaxPool3d(2, 2)
            self.bottleneck = self._block(f * 8, f * 16, "bottleneck")
            self.upconv4 = nn.ConvTranspose3d(f * 16, f * 8, 4, 2, 1)
            self.decoder4 = self._block(f * 16, f * 8, "dec4")
            self.upconv3 = nn.ConvTranspose3d(f * 8, f * 4, 4, 2, 1)
            self.decoder3 = self._block(f * 8, f * 4, "dec4")
            self.upconv2 = nn.ConvTranspose3d(f * 4, f * 2, 4, 2, 1)
            self.decoder2 = self._block(f * 4, f * 2, "dec4")
            self.upconv1 = nn.ConvTranspose3d(f * 2, f, 4, 2, 1)
            self.decoder1 = self._block(f * 2, f, "dec4")
            self.conv = nn.Conv3d(f, out_channels, 1)

        @staticmethod
        def _block(in_ch, feats, name):
            return nn.Sequential(OrderedDict((
                (f"{name}_conv1", nn.Conv3d(in_ch, feats, 5, padding=2, bias=True)),
                (f"{name}_norm1", nn.BatchNorm3d(feats)),
                (f"{name}_relu1", nn.ReLU(inplace=True)),
                (f"{name}_conv2", nn.Conv3d(feats, feats, 5, padding=2, bias=True)),
                (f"{name}_norm2", nn.BatchNorm3d(feats)),
                (f"{name}_relu2", nn.ReLU(inplace=True)),
            )))

        def forward(self, img):
            e1 = self.encoder1(img)
            e2 = self.encoder2(self.pool1(e1))
            e3 = self.encoder3(self.pool2(e2))
            e4 = self.encoder4(self.pool3(e3))
            b = self.bottleneck(self.pool4(e4))
            d4 = self.decoder4(torch.cat((self.upconv4(b), e4), 1))
            d3 = self.decoder3(torch.cat((self.upconv3(d4), e3), 1))
            d2 = self.decoder2(torch.cat((self.upconv2(d3), e2), 1))
            d1 = self.decoder1(torch.cat((self.upconv1(d2), e1), 1))
            return torch.sigmoid(self.conv(d1))

    return Unet3D()


def test_unet_matches_torch_reference():
    torch.manual_seed(0)
    tmodel = _torch_reference_unet().eval()
    # randomize running stats so batchnorm conversion is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = unet3d.convert_torch_state_dict(state)

    rng = np.random.default_rng(0)
    size = 32
    x = rng.normal(size=(1, 1, size, size, size)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()[0, 0]

    model = unet3d.Unet3D()  # float32 for exact comparison
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NCDHW -> NDHWC
    got = np.asarray(model.apply(variables, xj, train=False))[0, ..., 0]

    # conv algorithm selection (MKL-DNN vs XLA:CPU) introduces ~1e-4 noise
    # through 18 conv layers; the layout conversion itself is exact to 1e-7
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-2)


def test_patch_grid_matches_reference():
    """patch_grid reproduces gen_patches origins (reference segment.py:74-96)."""
    import itertools

    def reference_gen(shape, patch_size, overlap_pct):
        overlap = int(patch_size * overlap_pct / 100)
        sz, sy, sx = shape

        def ax(s):
            ss = [i for i in range(0, s, patch_size - overlap) if i + patch_size <= s]
            if not ss:
                ss.append(0)
            elif ss[-1] + patch_size < s:
                ss.append(s - patch_size)
            return ss

        return list(itertools.product(ax(sz), ax(sy), ax(sx)))

    for shape in [(100, 100, 100), (48, 48, 48), (130, 70, 55)]:
        got = segment.patch_grid(shape, 48, 0.5)
        want = reference_gen(shape, 48, 50)
        assert got == want, shape


def test_brain_segmenter_runs():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1000, (50, 60, 52)).astype(np.int16)
    seg = segment.BrainSegmenter(allow_random_init=True)
    prob, mask = seg.segment(img, probability_threshold=0.5, batch_size=4)
    assert prob.shape == img.shape
    assert mask.shape == img.shape
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)).issubset({0, 255})


def test_image_normalize():
    x = np.array([10.0, 20.0, 30.0])
    got = np.asarray(segment.image_normalize(x))
    np.testing.assert_allclose(got, [0.0, 0.5, 1.0], atol=1e-6)


def test_segmenter_family():
    from invesalius3_tpu.models.segment import (
        SEGMENTERS, ImplantSegmenter, TracheaSegmenter)

    img = np.random.default_rng(0).integers(-1000, 2000, (3, 64, 64)).astype(np.int16)
    seg = ImplantSegmenter(patch_size=64, allow_random_init=True)
    prob, mask = seg.segment(img)
    assert prob.shape == img.shape and set(np.unique(mask)) <= {0, 255}
    assert set(SEGMENTERS) == {"brain_mri_t1", "trachea_ct", "mandible_jit_ct",
                               "cranioplasty_implant", "fastsurfer_subpart"}
    t = TracheaSegmenter(patch_size=48, allow_random_init=True)
    assert t.use_ww_wl and t.wl == -500.0


def test_segmenter_refuses_random_weights(tmp_path, monkeypatch):
    """Without trained weights, building a segmenter must fail loudly —
    never silently produce untrained-network output (advisor finding;
    reference downloads real checkpoints or fails, segment.py:404-440)."""
    import warnings

    from invesalius3_tpu.models.segment import WeightsUnavailableError
    from invesalius3_tpu.net import download

    monkeypatch.setattr(download, "models_dir", lambda: tmp_path / "ai")
    with pytest.raises(WeightsUnavailableError):
        segment.BrainSegmenter()
    with pytest.raises(WeightsUnavailableError):
        segment.ImplantSegmenter()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        segment.BrainSegmenter(allow_random_init=True)
    assert any("RANDOM weights" in str(x.message) for x in w)
