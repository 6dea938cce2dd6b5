"""FastSurfer brain parcellation: competitive-dense-block CNN + 2.5D
three-view pipeline.

Reference: invesalius/segmentation/deep_learning/fastsurfer_subpart/ —
``Pipeline`` (pipeline.py:36) conforms the T1 to 1mm/256 LIA, runs a
per-plane (axial/coronal/sagittal) FastSurfer network on 7-slice
thick-slice inputs (ONNX checkpoints; misc.py ModelConfig: 79 classes,
7 channels, 256x256), remaps the sagittal logits to the full label space
(data_process.py:320 apply_sagittal_mapping + :301
infer_mapping_from_lut), and aggregates the views with weights
0.4/0.4/0.2 (inference.py:214 ``self.alpha``); LUT.tsv lists the
79-class aparc.DKTatlas+aseg label set.

Architecture: the published FastSurferCNN design (Henschel et al.,
NeuroImage 2020) — an encoder/decoder of *competitive dense blocks*
(dense connections replaced by maxout competition), 2x2 max-pooling with
index-preserving unpooling, and a 1x1 classifier.  Implemented here
from the paper's description in NHWC Flax; ``convert_torch_state_dict``
maps an equivalently-named torch module (see tests/test_fastsurfer.py)
onto it, mirroring models/unet3d.py's conversion contract.

TPU design: every slice of a plane runs as one MXU batch; maxout
competition and index unpooling are fused elementwise ops; view
aggregation is one weighted add in logit space.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CONFORM_SIZE = 256
THICK = 7  # thick-slice input channels (FastSurfer convention)

# ---------------------------------------------------------------------------
# Label table: the published FastSurfer 79-class aparc.DKTatlas+aseg set
# (IDs and names are the FreeSurfer standard; reference LUT.tsv carries the
# same table).  (ID, name, category).
# ---------------------------------------------------------------------------
LUT_ROWS: List[Tuple[int, str, str]] = [
    (0, "Background", "Background"),
    (2, "Left-Cerebral-White-Matter", "White_Matter"),
    (4, "Left-Lateral-Ventricle", "Ventricles"),
    (5, "Left-Inf-Lat-Vent", "Ventricles"),
    (7, "Left-Cerebellum-White-Matter", "White_Matter"),
    (8, "Left-Cerebellum-Cortex", "Cerebellum"),
    (10, "Left-Thalamus", "Subcortical"),
    (11, "Left-Caudate", "Subcortical"),
    (12, "Left-Putamen", "Subcortical"),
    (13, "Left-Pallidum", "Subcortical"),
    (14, "3rd-Ventricle", "Ventricles"),
    (15, "4th-Ventricle", "Ventricles"),
    (16, "Brain-Stem", "Brain_Stem"),
    (17, "Left-Hippocampus", "Subcortical"),
    (18, "Left-Amygdala", "Subcortical"),
    (24, "CSF", "CSF"),
    (26, "Left-Accumbens-area", "Subcortical"),
    (28, "Left-VentralDC", "Subcortical"),
    (31, "Left-choroid-plexus", "Choroid_Plexus"),
    (41, "Right-Cerebral-White-Matter", "White_Matter"),
    (43, "Right-Lateral-Ventricle", "Ventricles"),
    (44, "Right-Inf-Lat-Vent", "Ventricles"),
    (46, "Right-Cerebellum-White-Matter", "White_Matter"),
    (47, "Right-Cerebellum-Cortex", "Cerebellum"),
    (49, "Right-Thalamus", "Subcortical"),
    (50, "Right-Caudate", "Subcortical"),
    (51, "Right-Putamen", "Subcortical"),
    (52, "Right-Pallidum", "Subcortical"),
    (53, "Right-Hippocampus", "Subcortical"),
    (54, "Right-Amygdala", "Subcortical"),
    (58, "Right-Accumbens-area", "Subcortical"),
    (60, "Right-VentralDC", "Subcortical"),
    (63, "Right-choroid-plexus", "Choroid_Plexus"),
    (77, "WM-hypointensities", "White_Matter"),
    (1002, "ctx-lh-caudalanteriorcingulate", "Cortical"),
    (1003, "ctx-lh-caudalmiddlefrontal", "Cortical"),
    (1005, "ctx-lh-cuneus", "Cortical"),
    (1006, "ctx-lh-entorhinal", "Cortical"),
    (1007, "ctx-lh-fusiform", "Cortical"),
    (1008, "ctx-lh-inferiorparietal", "Cortical"),
    (1009, "ctx-lh-inferiortemporal", "Cortical"),
    (1010, "ctx-lh-isthmuscingulate", "Cortical"),
    (1011, "ctx-lh-lateraloccipital", "Cortical"),
    (1012, "ctx-lh-lateralorbitofrontal", "Cortical"),
    (1013, "ctx-lh-lingual", "Cortical"),
    (1014, "ctx-lh-medialorbitofrontal", "Cortical"),
    (1015, "ctx-lh-middletemporal", "Cortical"),
    (1016, "ctx-lh-parahippocampal", "Cortical"),
    (1017, "ctx-lh-paracentral", "Cortical"),
    (1018, "ctx-lh-parsopercularis", "Cortical"),
    (1019, "ctx-lh-parsorbitalis", "Cortical"),
    (1020, "ctx-lh-parstriangularis", "Cortical"),
    (1021, "ctx-lh-pericalcarine", "Cortical"),
    (1022, "ctx-lh-postcentral", "Cortical"),
    (1023, "ctx-lh-posteriorcingulate", "Cortical"),
    (1024, "ctx-lh-precentral", "Cortical"),
    (1025, "ctx-lh-precuneus", "Cortical"),
    (1026, "ctx-lh-rostralanteriorcingulate", "Cortical"),
    (1027, "ctx-lh-rostralmiddlefrontal", "Cortical"),
    (1028, "ctx-lh-superiorfrontal", "Cortical"),
    (1029, "ctx-lh-superiorparietal", "Cortical"),
    (1030, "ctx-lh-superiortemporal", "Cortical"),
    (1031, "ctx-lh-supramarginal", "Cortical"),
    (1034, "ctx-lh-transversetemporal", "Cortical"),
    (1035, "ctx-lh-insula", "Cortical"),
    (2002, "ctx-rh-caudalanteriorcingulate", "Cortical"),
    (2005, "ctx-rh-cuneus", "Cortical"),
    (2010, "ctx-rh-isthmuscingulate", "Cortical"),
    (2012, "ctx-rh-lateralorbitofrontal", "Cortical"),
    (2013, "ctx-rh-lingual", "Cortical"),
    (2014, "ctx-rh-medialorbitofrontal", "Cortical"),
    (2016, "ctx-rh-parahippocampal", "Cortical"),
    (2017, "ctx-rh-paracentral", "Cortical"),
    (2021, "ctx-rh-pericalcarine", "Cortical"),
    (2022, "ctx-rh-postcentral", "Cortical"),
    (2023, "ctx-rh-posteriorcingulate", "Cortical"),
    (2024, "ctx-rh-precentral", "Cortical"),
    (2025, "ctx-rh-precuneus", "Cortical"),
    (2028, "ctx-rh-superiorfrontal", "Cortical"),
]
NUM_CLASSES = len(LUT_ROWS)  # 79

# left aseg label -> right counterpart (FreeSurfer standard; reference
# data_process.py:463 sagittal_coronal_remap_lookup)
_LEFT_TO_RIGHT = {2: 41, 3: 42, 4: 43, 5: 44, 7: 46, 8: 47, 10: 49, 11: 50,
                  12: 51, 13: 52, 17: 53, 18: 54, 26: 58, 28: 60, 31: 63}


def class_ids(rows: Sequence[Tuple[int, str, str]] = LUT_ROWS) -> np.ndarray:
    return np.asarray([r[0] for r in rows], np.int32)


def get_labels_from_lut(rows: Sequence[Tuple[int, str, str]] = LUT_ROWS,
                        label_extract=("Left-", "ctx-rh")):
    """(full ids, sagittal ids) — the sagittal network merges lateralized
    labels, dropping Left-* aseg and ctx-rh-* (reference
    data_process.py:289)."""
    ids = class_ids(rows)
    keep = np.asarray([not r[1].startswith(label_extract) for r in rows])
    return ids, ids[keep]


def infer_sagittal_mapping(rows: Sequence[Tuple[int, str, str]] = LUT_ROWS) -> np.ndarray:
    """full-class index -> sagittal-class index (reference
    data_process.py:301 infer_mapping_from_lut): match by ID, then by
    ID-1000 (ctx-rh -> ctx-lh), then by the left->right aseg table."""
    ids, ids_sag = get_labels_from_lut(rows)
    idx = np.empty(len(ids), np.int16)
    for i, label in enumerate(ids):
        hit = np.where(ids_sag == label)[0]
        if hit.size == 0:
            hit = np.where(ids_sag == label - 1000)[0]
        if hit.size == 0:
            hit = np.where(ids_sag == _LEFT_TO_RIGHT[int(label)])[0]
        idx[i] = hit[0]
    return idx


def apply_sagittal_mapping(logits: jnp.ndarray,
                           rows: Sequence[Tuple[int, str, str]] = LUT_ROWS) -> jnp.ndarray:
    """Expand sagittal logits (..., n_sag) to the full class space
    (..., n_full) by index gather (reference data_process.py:320)."""
    return logits[..., jnp.asarray(infer_sagittal_mapping(rows))]


def write_lut_tsv(path) -> None:
    """Write the label table as a FreeSurfer-style LUT.tsv (colors are
    deterministic distinct placeholders; IDs/names are the standard)."""
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        f.write("ID\tLabelName\tCategory\tR\tG\tB\tA\n")
        for lid, name, cat in LUT_ROWS:
            r, g, b = rng.integers(0, 256, 3)
            f.write(f"{lid}\t{name}\t{cat}\t{r}\t{g}\t{b}\t0\n")


# ---------------------------------------------------------------------------
# FastSurferCNN: competitive dense blocks, index unpooling
# ---------------------------------------------------------------------------

def max_pool_with_indices(x: jnp.ndarray):
    """2x2/stride-2 max pool returning (pooled, argmax index in the 2x2
    window).  Non-overlapping windows = a reshape, so indices come free."""
    n, h, w, c = x.shape
    t = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(n, h // 2, w // 2, 4, c)
    idx = jnp.argmax(t, axis=3).astype(jnp.int8)
    return jnp.max(t, axis=3), idx


def max_unpool(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Inverse of max_pool_with_indices: route each value back to its
    argmax position, zeros elsewhere (torch MaxUnpool2d semantics)."""
    n, h, w, c = x.shape
    onehot = jax.nn.one_hot(idx.astype(jnp.int32), 4, dtype=x.dtype, axis=3)
    t = x[:, :, :, None, :] * onehot  # (n, h, w, 4, c)
    t = t.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(n, h * 2, w * 2, c)


class CompetitiveDenseBlock(nn.Module):
    """Three (PReLU -> Conv -> BN) sequences with maxout competition after
    the first two (paper Sec. 2.2: dense connections replaced by maxout).
    ``in_block`` swaps the first PReLU for a BN to normalize raw inputs and
    skips the first competition (the raw input has a different width)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    in_block: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(i, y):
            return nn.Conv(self.features, self.kernel, padding="SAME",
                           use_bias=False, dtype=self.dtype, name=f"conv{i}")(y)

        def bn(i, y):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32,
                                name=f"bn{i}")(y)

        if self.in_block:
            y = bn(0, x)
            r1 = bn(1, conv(1, y))
            m1 = r1  # raw input width != features: no competition yet
        else:
            r1 = bn(1, conv(1, nn.PReLU(negative_slope_init=0.25,
                                        name="prelu1")(x)))
            m1 = jnp.maximum(r1, x)
        r2 = bn(2, conv(2, nn.PReLU(negative_slope_init=0.25,
                                    name="prelu2")(m1)))
        m2 = jnp.maximum(r2, m1)
        r3 = bn(3, conv(3, nn.PReLU(negative_slope_init=0.25,
                                    name="prelu3")(m2)))
        return r3


class FastSurferCNN(nn.Module):
    """Encoder (4 CDB + pool) -> bottleneck CDB -> decoder (4 x unpool +
    maxout-skip + CDB) -> 1x1 classifier.  Input: (N, H, W, 7) thick
    slices; output: (N, H, W, num_classes) float32 logits."""

    num_classes: int = NUM_CLASSES
    filters: int = 64
    kernel: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, k = self.filters, self.kernel
        skips, indices = [], []
        y = x.astype(self.dtype)
        for i in range(4):
            y = CompetitiveDenseBlock(
                f, k, in_block=(i == 0), dtype=self.dtype,
                name=f"enc{i + 1}")(y, train)
            skips.append(y)
            y, idx = max_pool_with_indices(y)
            indices.append(idx)
        y = CompetitiveDenseBlock(f, k, dtype=self.dtype,
                                  name="bottleneck")(y, train)
        for i in range(3, -1, -1):
            y = jnp.maximum(max_unpool(y, indices[i]), skips[i])  # competition
            y = CompetitiveDenseBlock(f, k, dtype=self.dtype,
                                      name=f"dec{i + 1}")(y, train)
        logits = nn.Conv(self.num_classes, (1, 1), name="classifier")(y)
        return logits.astype(jnp.float32)


def init_params(rng: jax.Array, num_classes: int = NUM_CLASSES,
                size: int = 32, **kw) -> Dict:
    model = FastSurferCNN(num_classes=num_classes, **kw)
    x = jnp.zeros((1, size, size, THICK), jnp.float32)
    return model.init(rng, x, train=False)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (mirrors models/unet3d.py's contract; the
# equivalently-named torch module lives in tests/test_fastsurfer.py)
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state: Dict[str, "np.ndarray"]) -> Dict:
    """torch keys: '<block>.conv{i}.weight', '<block>.bn{i}.{weight,bias,
    running_mean,running_var}', '<block>.prelu{i}.weight' for block in
    enc1..enc4, bottleneck, dec1..dec4 (enc1 has bn0 and no prelu1), plus
    'classifier.{weight,bias}'.  Conv2d (out,in,kh,kw) -> (kh,kw,in,out)."""
    state = {k: np.asarray(v) for k, v in state.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    blocks = [f"enc{i}" for i in range(1, 5)] + ["bottleneck"] + [
        f"dec{i}" for i in range(1, 5)]
    for b in blocks:
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for k in [k for k in state if k.startswith(b + ".")]:
            layer, param = k[len(b) + 1:].split(".", 1)
            if layer.startswith("conv"):
                bp.setdefault(layer, {})["kernel"] = np.transpose(
                    state[k], (2, 3, 1, 0))
            elif layer.startswith("bn"):
                if param in ("weight", "bias"):
                    bp.setdefault(layer, {})[
                        "scale" if param == "weight" else "bias"] = state[k]
                elif param == "running_mean":
                    bs.setdefault(layer, {})["mean"] = state[k]
                elif param == "running_var":
                    bs.setdefault(layer, {})["var"] = state[k]
            elif layer.startswith("prelu"):
                bp.setdefault(layer, {})["negative_slope"] = state[k].reshape(())
        params[b] = bp
        stats[b] = bs
    params["classifier"] = {
        "kernel": np.transpose(state["classifier.weight"], (2, 3, 1, 0)),
        "bias": state["classifier.bias"],
    }
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats)}


def load_torch_checkpoint(path) -> Dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return convert_torch_state_dict({k: v.numpy() for k, v in obj.items()})


def load_onnx_checkpoint(path) -> Dict:
    """Load published FastSurfer ONNX weights (the format the reference
    ships for parcellation, reference fastsurfer_subpart/inference.py:159
    TinyGradInference + tinygrad_extra/onnx.py) via initializer extraction —
    no ONNX runtime involved."""
    from .onnx_convert import onnx_state_dict

    return convert_torch_state_dict(onnx_state_dict(path))


# ---------------------------------------------------------------------------
# 2.5D pipeline: conform -> thick slices -> 3 views -> aggregate
# ---------------------------------------------------------------------------

def conform(volume: np.ndarray, out_size: int = CONFORM_SIZE) -> np.ndarray:
    """Conform to isotropic out_size^3 with intensity rescale to [0, 255]
    (reference pipeline.py conform_and_save :203 semantics, simplified: no
    LIA reorientation — the reader already canonicalizes to RAS, and view
    axes are taken directly from the canonical volume)."""
    from invesalius3_tpu.ops.resize import resize_volume

    v = jnp.asarray(volume, jnp.float32)
    v = resize_volume(v, (out_size,) * 3, order=1)
    vmin, vmax = jnp.min(v), jnp.max(v)
    v = (v - vmin) / jnp.where(vmax == vmin, 1.0, vmax - vmin) * 255.0
    return np.asarray(v).astype(np.float32)


def thick_slices(volume: np.ndarray, axis: int, thick: int = THICK) -> jnp.ndarray:
    """(N, H, W, thick) batch of thick slices along ``axis`` (edge pad),
    matching reference data_process.py ProcessDataThickSlices."""
    v = jnp.moveaxis(jnp.asarray(volume), axis, 0)
    h = thick // 2
    padded = jnp.pad(v, ((h, h), (0, 0), (0, 0)), mode="edge")
    stacked = jnp.stack([padded[i: i + v.shape[0]] for i in range(thick)], axis=-1)
    return stacked


class FastSurferPipeline:
    """Per-plane inference + view aggregation (reference pipeline.py:36,
    inference.py eval: sagittal remap + alpha weights)."""

    VIEW_WEIGHTS = {"axial": 0.4, "coronal": 0.4, "sagittal": 0.2}

    def __init__(self, num_classes: int = NUM_CLASSES,
                 variables: Optional[Dict] = None, batch_size: int = 8,
                 filters: int = 64, sagittal_merged: bool = True):
        """`variables` maps view -> flax variables (or one shared set).
        With ``sagittal_merged`` the sagittal net predicts the merged
        (non-lateralized) class set and its logits are expanded via
        apply_sagittal_mapping, as the reference does."""
        self.num_classes = num_classes
        self.batch_size = batch_size
        self.sagittal_merged = sagittal_merged and num_classes == NUM_CLASSES
        n_sag = (len(get_labels_from_lut()[1]) if self.sagittal_merged
                 else num_classes)
        self.models = {
            "axial": FastSurferCNN(num_classes=num_classes, filters=filters),
            "coronal": FastSurferCNN(num_classes=num_classes, filters=filters),
            "sagittal": FastSurferCNN(num_classes=n_sag, filters=filters),
        }
        if variables is None:
            variables = {}
        if isinstance(variables, dict) and "axial" not in variables:
            # single shared variable set (tests) or empty -> random init
            shared = variables or None
            variables = {}
            for view, m in self.models.items():
                if shared is not None and view != "sagittal":
                    variables[view] = shared
                else:
                    variables[view] = m.init(
                        jax.random.PRNGKey(hash(view) % (2**31)),
                        jnp.zeros((1, 32, 32, THICK)), train=False)
        self.variables = variables

        self._apply = {
            view: jax.jit(lambda v, b, m=m: m.apply(v, b, train=False))
            for view, m in self.models.items()
        }

    def _run_plane(self, volume: np.ndarray, axis: int, view: str,
                   progress=None, base: float = 0.0,
                   span: float = 1.0) -> jnp.ndarray:
        batch = thick_slices(volume, axis)
        outs = []
        n = batch.shape[0]
        for i in range(0, n, self.batch_size):
            outs.append(self._apply[view](self.variables[view],
                                          batch[i: i + self.batch_size]))
            if progress is not None:
                progress(base + span * min(1.0, (i + self.batch_size) / n))
        logits = jnp.concatenate(outs, axis=0)  # (N, H, W, C_view)
        if view == "sagittal" and self.sagittal_merged:
            logits = apply_sagittal_mapping(logits)
        return jnp.moveaxis(logits, 0, axis)  # back to volume order

    def run(self, t1_volume: np.ndarray, conform_input: bool = True,
            conform_size: int = CONFORM_SIZE,
            return_freesurfer_ids: bool = False, progress=None) -> np.ndarray:
        """int32 label volume: argmax of the weighted three-view logits;
        optionally mapped from class index to FreeSurfer label id.
        ``progress`` (0..1 callback) mirrors reference pipeline.py's
        progress_callback seam (segment.py:663)."""
        vol = (conform(t1_volume, conform_size) if conform_input
               else np.asarray(t1_volume, np.float32))
        agg = None
        for vi, (view, axis) in enumerate(
                (("axial", 0), ("coronal", 1), ("sagittal", 2))):
            logits = self._run_plane(
                vol, axis, view, progress=progress,
                base=vi / 3.0, span=1.0 / 3.0) * self.VIEW_WEIGHTS[view]
            agg = logits if agg is None else agg + logits
        labels = jnp.argmax(agg, axis=-1).astype(jnp.int32)
        if return_freesurfer_ids:
            labels = jnp.asarray(class_ids())[labels]
        return np.asarray(labels)


# ---------------------------------------------------------------------------
# Quick QC (reference fastsurfer_subpart/quick_qc.py:35-196)
# ---------------------------------------------------------------------------

VENT_LABELS = {
    "Left-Lateral-Ventricle": 4,
    "Right-Lateral-Ventricle": 43,
    "Left-choroid-plexus": 31,
    "Right-choroid-plexus": 63,
}


@jax.jit
def _qc_device(seg: jax.Array, vent_ids: jax.Array) -> tuple:
    """Device half of quick QC: total foreground count + the count of
    background voxels touching a 1-voxel dilation of the ventricle system
    (reference quick_qc.py:63-134 get_region_bg_intersection_mask — there
    with skimage binary_dilation on host; here one fused XLA program)."""
    from invesalius3_tpu.ops import morphology

    fg = jnp.sum(seg > 0)
    vent = jnp.isin(seg, vent_ids)
    vent_dil = morphology.binary_dilation(
        vent, morphology.generate_binary_structure(3, 3))
    leak = jnp.sum(vent_dil & (seg == 0))
    return fg, leak


def run_quick_qc(seg: np.ndarray, voxel_volume: float,
                 volume_threshold: float = 0.70) -> dict:
    """Sanity checks on a FreeSurfer-id label volume (reference
    quick_qc.py:137-196 run_quick_qc): total segmented volume must exceed
    ``volume_threshold`` liters, and the ventricle/background contact
    volume estimates CSF leakage.  Same keys as the reference's report."""
    seg_j = jnp.asarray(np.ascontiguousarray(seg), jnp.int32)
    vent_ids = jnp.asarray(sorted(VENT_LABELS.values()), jnp.int32)
    fg, leak = _qc_device(seg_j, vent_ids)
    total_volume_liters = float(fg) * voxel_volume / 1e6
    volume_check_passed = total_volume_liters >= volume_threshold
    return {
        "volume_check_passed": bool(volume_check_passed),
        "total_volume_liters": total_volume_liters,
        "ventricle_bg_intersection_volume_mm3": float(leak) * voxel_volume,
        "overall_passed": bool(volume_check_passed),
    }
