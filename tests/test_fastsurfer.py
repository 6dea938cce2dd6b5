"""FastSurferCNN architecture equivalence (torch mirror vs Flax, mirroring
tests/test_unet.py's contract), sagittal label mapping, and pipeline
shape/semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from invesalius3_tpu.models import fastsurfer as fs

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# torch mirror of models/fastsurfer.py FastSurferCNN (the naming contract
# convert_torch_state_dict documents)
# ---------------------------------------------------------------------------
class TorchCDB(tnn.Module):
    def __init__(self, in_ch, f, k=3, in_block=False):
        super().__init__()
        self.in_block = in_block
        p = k // 2
        if in_block:
            self.bn0 = tnn.BatchNorm2d(in_ch)
        else:
            self.prelu1 = tnn.PReLU(init=0.25)
        self.conv1 = tnn.Conv2d(in_ch, f, k, padding=p, bias=False)
        self.bn1 = tnn.BatchNorm2d(f)
        self.prelu2 = tnn.PReLU(init=0.25)
        self.conv2 = tnn.Conv2d(f, f, k, padding=p, bias=False)
        self.bn2 = tnn.BatchNorm2d(f)
        self.prelu3 = tnn.PReLU(init=0.25)
        self.conv3 = tnn.Conv2d(f, f, k, padding=p, bias=False)
        self.bn3 = tnn.BatchNorm2d(f)

    def forward(self, x):
        if self.in_block:
            y = self.bn0(x)
            r1 = self.bn1(self.conv1(y))
            m1 = r1
        else:
            r1 = self.bn1(self.conv1(self.prelu1(x)))
            m1 = torch.maximum(r1, x)
        r2 = self.bn2(self.conv2(self.prelu2(m1)))
        m2 = torch.maximum(r2, m1)
        return self.bn3(self.conv3(self.prelu3(m2)))


class TorchFastSurferCNN(tnn.Module):
    def __init__(self, num_classes, f=16, k=3, thick=7):
        super().__init__()
        self.enc1 = TorchCDB(thick, f, k, in_block=True)
        self.enc2 = TorchCDB(f, f, k)
        self.enc3 = TorchCDB(f, f, k)
        self.enc4 = TorchCDB(f, f, k)
        self.bottleneck = TorchCDB(f, f, k)
        self.dec4 = TorchCDB(f, f, k)
        self.dec3 = TorchCDB(f, f, k)
        self.dec2 = TorchCDB(f, f, k)
        self.dec1 = TorchCDB(f, f, k)
        self.classifier = tnn.Conv2d(f, num_classes, 1)

    def forward(self, x):
        skips, idxs = [], []
        y = x
        for enc in (self.enc1, self.enc2, self.enc3, self.enc4):
            y = enc(y)
            skips.append(y)
            y, i = F.max_pool2d(y, 2, 2, return_indices=True)
            idxs.append(i)
        y = self.bottleneck(y)
        for dec, skip, i in zip((self.dec4, self.dec3, self.dec2, self.dec1),
                                skips[::-1], idxs[::-1]):
            y = torch.maximum(F.max_unpool2d(y, i, 2, 2), skip)
            y = dec(y)
        return self.classifier(y)


def test_fastsurfer_torch_flax_equivalence():
    torch.manual_seed(7)
    num_classes, f = 11, 16
    tm = TorchFastSurferCNN(num_classes, f=f).eval()
    # non-trivial running stats so BN conversion is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    variables = fs.convert_torch_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    fm = fs.FastSurferCNN(num_classes=num_classes, filters=f,
                          dtype=jnp.float32)

    x = np.random.default_rng(1).normal(size=(2, 32, 32, 7)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


def test_max_unpool_roundtrip():
    # positive values so re-pooling the sparse unpooled map recovers the max
    x = jnp.asarray(
        np.abs(np.random.default_rng(2).normal(size=(1, 8, 8, 3))) + 0.1,
        jnp.float32)
    pooled, idx = fs.max_pool_with_indices(x)
    up = fs.max_unpool(pooled, idx)
    # unpooled has the max at the argmax position, zeros elsewhere
    assert up.shape == x.shape
    p2, _ = fs.max_pool_with_indices(up)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pooled))
    assert float(jnp.sum(up != 0)) == pooled.size


def test_sagittal_mapping_semantics():
    ids, ids_sag = fs.get_labels_from_lut()
    assert len(ids) == 79
    # sagittal set drops Left-* aseg and ctx-rh-*
    assert 2 not in ids_sag and 2024 not in ids_sag
    assert 41 in ids_sag and 1024 in ids_sag
    m = fs.infer_sagittal_mapping()
    full = list(ids)
    sag = list(ids_sag)
    # Left-Thalamus (10) -> Right-Thalamus (49)
    assert sag[m[full.index(10)]] == 49
    # ctx-rh-precentral (2024) -> ctx-lh-precentral (1024)
    assert sag[m[full.index(2024)]] == 1024
    # identity for non-lateralized labels
    assert sag[m[full.index(16)]] == 16
    # logits expansion gathers the right columns
    logits = jnp.arange(len(sag), dtype=jnp.float32)[None, None, None, :]
    out = fs.apply_sagittal_mapping(logits)
    assert out.shape[-1] == 79
    assert float(out[0, 0, 0, full.index(2024)]) == sag.index(1024)


def test_lut_tsv_write(tmp_path):
    p = tmp_path / "LUT.tsv"
    fs.write_lut_tsv(p)
    lines = p.read_text().strip().split("\n")
    assert lines[0].split("\t")[:3] == ["ID", "LabelName", "Category"]
    assert len(lines) == 80  # header + 79 classes


def test_pipeline_merged_sagittal_runs():
    pipe = fs.FastSurferPipeline(batch_size=8, filters=8)
    assert pipe.models["sagittal"].num_classes == len(fs.get_labels_from_lut()[1])
    vol = np.random.default_rng(0).normal(size=(16, 18, 20)).astype(np.float32)
    labels = pipe.run(vol, conform_size=16)
    assert labels.shape == (16, 16, 16)
    assert labels.max() < 79
    ids = pipe.run(vol, conform_size=16, return_freesurfer_ids=True)
    assert set(np.unique(ids)).issubset(set(fs.class_ids().tolist()))


def test_onnx_checkpoint_ingestion(tmp_path):
    """Round-trip: torch state_dict -> synthetic ONNX file (hand-rolled
    protobuf writer) -> onnx reader -> name-based converter -> identical
    outputs.  Mirrors the reference's ONNX weight distribution for
    parcellation (reference segment.py:197-209, tinygrad_extra/onnx.py)."""
    from invesalius3_tpu.models import onnx_convert as oc

    torch.manual_seed(3)
    num_classes, f = 5, 8
    tm = TorchFastSurferCNN(num_classes, f=f).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    p = tmp_path / "sagittal.onnx"
    oc.write_onnx(p, state)

    # raw initializer extraction preserves names, shapes, values
    back = oc.onnx_state_dict(p)
    keys = {k for k in state if not k.endswith("num_batches_tracked")}
    assert set(back) == keys
    for k in keys:
        np.testing.assert_array_equal(back[k], state[k])

    variables = fs.load_onnx_checkpoint(p)
    fm = fs.FastSurferCNN(num_classes=num_classes, filters=f,
                          dtype=jnp.float32)
    x = np.random.default_rng(5).normal(size=(1, 16, 16, 7)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


def test_onnx_reader_data_variants(tmp_path):
    """Reader handles packed float_data/int64 fields and fp16, not just
    raw_data (exporters differ in which they emit)."""
    from invesalius3_tpu.models import onnx_convert as oc

    # hand-encode a model whose tensors use float_data / int64_data paths
    def field(num, wire, payload):
        return oc._varint((num << 3) | wire) + (
            oc._varint(len(payload)) + payload if wire == 2 else payload)

    import struct as st
    f32 = np.array([1.5, -2.25, 3.0], np.float32)
    t1 = (field(1, 0, oc._varint(3)) + field(2, 0, oc._varint(1))
          + field(8, 2, b"w.float_data")
          + field(4, 2, st.pack("<3f", *f32)))
    i64 = [7, -3]
    enc = b"".join(oc._varint(v & ((1 << 64) - 1)) for v in i64)
    t2 = (field(1, 0, oc._varint(2)) + field(2, 0, oc._varint(7))
          + field(8, 2, b"w.int64") + field(7, 2, enc))
    h16 = np.array([0.5, 2.0], np.float16)
    t3 = (field(1, 0, oc._varint(2)) + field(2, 0, oc._varint(10))
          + field(8, 2, b"w.fp16") + field(9, 2, h16.tobytes()))
    graph = field(5, 2, t1) + field(5, 2, t2) + field(5, 2, t3)
    model = field(1, 0, oc._varint(8)) + field(7, 2, graph)
    p = tmp_path / "variants.onnx"
    p.write_bytes(model)

    out = oc.onnx_state_dict(p)
    np.testing.assert_array_equal(out["w.float_data"], f32)
    np.testing.assert_array_equal(out["w.int64"], np.array(i64, np.int64))
    np.testing.assert_array_equal(out["w.fp16"], h16.astype(np.float32))


def test_quick_qc_report():
    """Reference fastsurfer_subpart/quick_qc.py:137 run_quick_qc — volume
    threshold + ventricle/background leakage estimate."""
    from invesalius3_tpu.models.fastsurfer import run_quick_qc

    seg = np.zeros((40, 40, 40), np.int32)
    seg[5:35, 5:35, 5:35] = 2          # bulk white matter
    seg[15:25, 15:25, 15:25] = 4       # left ventricle inside the bulk
    # voxvol chosen so the 27k-voxel brain ~ 1.7 L > 0.70 L threshold
    rep = run_quick_qc(seg, voxel_volume=64.0)
    assert rep["volume_check_passed"] and rep["overall_passed"]
    assert rep["total_volume_liters"] > 0.7
    # ventricle fully enclosed by tissue: no background contact
    assert rep["ventricle_bg_intersection_volume_mm3"] == 0.0

    # ventricle poking into background -> nonzero leak, tiny brain fails
    seg2 = np.zeros((40, 40, 40), np.int32)
    seg2[10:14, 10:14, 10:14] = 43
    rep2 = run_quick_qc(seg2, voxel_volume=1.0)
    assert not rep2["volume_check_passed"]
    assert rep2["ventricle_bg_intersection_volume_mm3"] > 0


def test_subpart_segmenter_and_structure_masks():
    """SubpartSegmenter lands a whole-brain mask + labelmap on the image
    grid (reference SubpartSegmentProcess segment.py:544 + resample back);
    structure_masks splits the labelmap by LUT category
    (apply_segment_threshold :884)."""
    from invesalius3_tpu.models import segment as seg

    img = np.random.default_rng(0).normal(size=(20, 24, 28)).astype(np.float32)
    s = seg.SubpartSegmenter(allow_random_init=True, filters=4,
                             conform_size=16)
    progress = []
    labels, mask = s.segment(img, batch_size=4,
                             progress_cb=progress.append)
    assert labels.shape == img.shape == mask.shape
    assert labels.dtype == np.int32 and mask.dtype == np.uint8
    assert progress and abs(progress[-1] - 1.0) < 1e-6
    np.testing.assert_array_equal(mask > 0, labels > 0)

    # structure splitting on a synthetic labelmap
    lm = np.zeros((8, 8, 8), np.int32)
    lm[1:3] = 4      # Left-Lateral-Ventricle (Ventricles)
    lm[4:6] = 8      # Left-Cerebellum-Cortex (Cerebellum)
    lm[6:7] = 1002   # ctx-lh-caudalanteriorcingulate (cortical)
    vent = seg.structure_masks(lm, ["ventricles"])
    assert [v[2] for v in vent] == [4]
    assert vent[0][1].sum() == (lm == 4).sum() * 255
    cortical = seg.structure_masks(lm, ["cortical"])
    assert [v[2] for v in cortical] == [1002]
    assert cortical[0][0].startswith("ctx_")
    both = seg.structure_masks(lm, ["ventricles", "cerebellum"])
    assert {v[2] for v in both} == {4, 8}
    assert seg.structure_masks(lm, ["brain_stem"]) == []  # empty skipped
    # "subcortical" = the LUT's Subcortical gray-matter rows only (none
    # present here); "non_cortical" = the reference pick_regions broad set
    assert seg.structure_masks(lm, ["subcortical"]) == []
    assert {v[2] for v in seg.structure_masks(lm, ["non_cortical"])} \
        == {4, 8}
