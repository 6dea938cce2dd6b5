"""Deep-learning segmentation pipeline: sliding-window patch inference.

Reference behavior (invesalius/segmentation/deep_learning/segment.py):
``gen_patches`` :74 yields 48^3 patches with 50% overlap (grid positions
clamped so a final patch ends exactly at the border), one
``SegmentProcess`` subprocess runs the model patch-by-patch and writes
into a probability memmap, overwriting on overlap; models normalize input
with ``image_normalize`` to [0, 1].

TPU design: the patch grid is computed statically; all patches are
gathered into one (N, 48, 48, 48, 1) batch with ``dynamic_slice`` under
jit, the whole batch runs through the jitted U-Net (bf16 matmuls on the
MXU), and results scatter back in grid order so later patches overwrite
earlier ones exactly like the reference's sequential loop.  Multi-chip:
the batch dimension shards over the mesh ("data" axis) — patches are
independent, so no collectives beyond the final gather.
"""

from __future__ import annotations

import threading
import warnings
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from invesalius3_tpu.models.unet3d import SIZE, Unet3D


class WeightsUnavailableError(RuntimeError):
    """Raised when a segmenter is built without trained weights.

    The reference downloads real checkpoints before inference or fails
    (segment.py:404-440); silently running an untrained network would
    produce wrong clinical output.
    """


def _resolve_weights(weight_name: str, allow_random_init: bool, loader=None):
    """Try to load + convert the reference checkpoint for ``weight_name``.

    ``loader`` is the per-architecture checkpoint converter (defaults to
    unet3d's; ImplantSegmenter passes unet2d's).  Returns converted flax
    variables, or None when ``allow_random_init`` (with a loud warning).
    Raises WeightsUnavailableError otherwise.
    """
    try:
        from invesalius3_tpu.net.download import get_weight_file

        if loader is None:
            from invesalius3_tpu.models.unet3d import load_torch_checkpoint
            loader = load_torch_checkpoint
        path = get_weight_file(weight_name)
        return loader(path)
    except Exception as e:
        if allow_random_init:
            warnings.warn(
                f"segmenter {weight_name!r} running with RANDOM weights "
                f"({e}); output is noise, not a segmentation",
                RuntimeWarning, stacklevel=3,
            )
            return None
        raise WeightsUnavailableError(
            f"no trained weights for {weight_name!r}: {e}. Place the "
            f"reference checkpoint under the ai/ models dir, pass "
            f"variables= explicitly, or (tests only) allow_random_init=True"
        ) from e


def image_normalize(image, min_: float = 0.0, max_: float = 1.0) -> jnp.ndarray:
    """Reference segment.py image_normalize: linear rescale to [min_, max_]."""
    img = jnp.asarray(image, jnp.float32)
    imin, imax = jnp.min(img), jnp.max(img)
    return (img - imin) * ((max_ - min_) / jnp.where(imax == imin, 1.0, imax - imin)) + min_


def patch_grid(shape: Tuple[int, int, int], patch_size: int = SIZE,
               overlap: float = 0.5) -> List[Tuple[int, int, int]]:
    """Static patch origin list matching reference gen_patches:74-96."""
    frac = overlap / 100.0 if overlap > 1 else overlap  # accept percent or fraction
    ov = int(patch_size * frac)
    step = patch_size - ov

    def axis_starts(s):
        starts = [i for i in range(0, s, step) if i + patch_size <= s]
        if not starts:
            starts = [0]
        elif starts[-1] + patch_size < s:
            starts.append(s - patch_size)
        return starts

    sz, sy, sx = shape
    return [
        (iz, iy, ix)
        for iz in axis_starts(sz)
        for iy in axis_starts(sy)
        for ix in axis_starts(sx)
    ]


@partial(jax.jit, static_argnames=("patch_size",))
def _gather_patches(image: jax.Array, origins: jax.Array, patch_size: int) -> jax.Array:
    """(N, p, p, p) patch batch via vmapped dynamic_slice (zero-padded image
    must be passed if patches can exceed borders; grid origins already
    guarantee in-bounds)."""

    def one(origin):
        return jax.lax.dynamic_slice(image, origin, (patch_size,) * 3)

    return jax.vmap(one)(origins)


@partial(jax.jit, static_argnames=("patch_size", "out_shape"))
def _scatter_patches(probs: jax.Array, origins: jax.Array, patch_size: int,
                     out_shape: Tuple[int, int, int]) -> jax.Array:
    """Write patches back in order (later overwrites earlier — reference
    overwrite semantics)."""
    out = jnp.zeros(out_shape, jnp.float32)

    def body(out, xs):
        prob, origin = xs
        return jax.lax.dynamic_update_slice(out, prob, origin), None

    out, _ = jax.lax.scan(body, out, (probs, origins))
    return out


class BrainSegmenter:
    """Patch-grid U-Net segmentation (reference BrainSegmentProcess
    semantics: normalize image to [0,1], 48^3 patches, 50% overlap,
    probability threshold -> mask)."""

    WEIGHT_NAME = "brain_mri_t1"

    def __init__(self, variables=None, model: Optional[Unet3D] = None,
                 patch_size: int = SIZE, overlap: float = 0.5,
                 use_ww_wl: bool = False, ww: float = 255.0, wl: float = 127.5,
                 allow_random_init: bool = False):
        self.model = model or Unet3D(dtype=jnp.bfloat16)
        self.patch_size = patch_size
        self.overlap = overlap
        self.use_ww_wl = use_ww_wl
        self.ww, self.wl = ww, wl
        if variables is None:
            variables = _resolve_weights(self.WEIGHT_NAME, allow_random_init)
        if variables is None:  # explicit random init (tests / smoke only)
            variables = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, patch_size, patch_size, patch_size, 1)), train=False)
        self.variables = variables

        @jax.jit
        def _apply(variables, batch):
            return self.model.apply(variables, batch, train=False)

        self._apply = _apply

    def segment(self, image, probability_threshold: float = 0.5,
                batch_size: int = 8, progress_cb=None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (probability (Z, Y, X) float32, mask uint8 0/255)."""
        from invesalius3_tpu.ops.windowing import get_lut_value_255

        img = jnp.asarray(image)
        if self.use_ww_wl:
            img = get_lut_value_255(img, self.ww, self.wl)
        norm = image_normalize(img)

        shape = tuple(int(s) for s in norm.shape)
        pad = [max(0, self.patch_size - s) for s in shape]
        if any(pad):
            norm = jnp.pad(norm, [(0, p) for p in pad])
        padded_shape = tuple(int(s) for s in norm.shape)

        origins_list = patch_grid(padded_shape, self.patch_size, self.overlap)
        origins = jnp.asarray(origins_list, jnp.int32)

        probs_all = []
        n = len(origins_list)
        for i in range(0, n, batch_size):
            chunk = origins[i : i + batch_size]
            patches = _gather_patches(norm, chunk, self.patch_size)
            batch = patches[..., None]
            out = self._apply(self.variables, batch)
            probs_all.append(out[..., 0])
            if progress_cb is not None:
                progress_cb(min(1.0, (i + len(chunk)) / n))
        probs = jnp.concatenate(probs_all, axis=0)
        prob_vol = _scatter_patches(probs, origins, self.patch_size, padded_shape)
        prob_vol = prob_vol[: shape[0], : shape[1], : shape[2]]

        mask = np.where(np.asarray(prob_vol) >= probability_threshold, 255, 0).astype(np.uint8)
        return np.asarray(prob_vol), mask


# ---------------------------------------------------------------------------
# Job orchestration (reference SegmentProcess, segment.py:297-420)
# ---------------------------------------------------------------------------


class SegmentJob(threading.Thread):
    """Background segmentation job with progress + cancellation.

    The reference runs one multiprocessing.Process per job with memmap IPC
    and an exception Pipe (segment.py:313-380); here JAX dispatch is
    already async, so a thread + callbacks carry the same contract:
    ``progress`` in [0, 1], ``exception`` captured, ``stop()`` cancels
    between patch batches.
    """

    def __init__(self, segmenter: "BrainSegmenter", image,
                 probability_threshold: float = 0.5, batch_size: int = 8):
        super().__init__(daemon=True)
        self.segmenter = segmenter
        self.image = image
        self.threshold = probability_threshold
        self.batch_size = batch_size
        self.progress = 0.0
        self.exception: Optional[BaseException] = None
        self.probability: Optional[np.ndarray] = None
        self.mask: Optional[np.ndarray] = None
        self._stop_event = threading.Event()

    def _on_progress(self, value: float) -> None:
        self.progress = value
        if self._stop_event.is_set():
            raise _Cancelled()

    def run(self) -> None:
        try:
            self.probability, self.mask = self.segmenter.segment(
                self.image, self.threshold, self.batch_size, self._on_progress)
            self.progress = 1.0
        except _Cancelled:
            pass
        except BaseException as e:  # mirrored to the caller like the ref Pipe
            self.exception = e

    def stop(self) -> None:
        self._stop_event.set()


class _Cancelled(Exception):
    pass


# ---------------------------------------------------------------------------
# Model family (reference segment.py:505-1165 process subclasses)
# ---------------------------------------------------------------------------


class TracheaSegmenter(BrainSegmenter):
    """Trachea CT segmentation (reference TracheaSegmentProcess :919):
    same 48^3 patch U-Net, image pre-windowed with WW/WL before
    normalization."""

    WEIGHT_NAME = "trachea_ct"

    def __init__(self, variables=None, **kw):
        kw.setdefault("use_ww_wl", True)
        kw.setdefault("ww", 2000.0)
        kw.setdefault("wl", -500.0)
        super().__init__(variables=variables, **kw)


class MandibleSegmenter(BrainSegmenter):
    """Mandible CT segmentation (reference MandibleCTSegmentProcess :956,
    TorchScript backend in the reference; here the same Flax U-Net with
    converted weights)."""

    WEIGHT_NAME = "mandible_jit_ct"

    def __init__(self, variables=None, patch_size: int = 96, **kw):
        super().__init__(variables=variables, patch_size=patch_size, **kw)


class ImplantSegmenter:
    """Cranioplasty implant generation (reference ImplantCTSegmentProcess
    :1050 + run_cranioplasty_implant :30): slice-wise 2D patches of
    480x480 with overlap, binary or gray input method, U-Net-2D."""

    PATCH = 480
    WEIGHT_NAME = "cranioplasty_jit_ct_binary"

    def __init__(self, variables=None, model=None, method: str = "binary",
                 overlap: float = 0.5, patch_size: int = 480,
                 allow_random_init: bool = False):
        from invesalius3_tpu.models.unet2d import Unet2D, load_torch_checkpoint

        self.model = model or Unet2D()
        self.method = method
        self.overlap = overlap
        self.patch_size = patch_size
        if variables is None:
            variables = _resolve_weights(self.WEIGHT_NAME, allow_random_init,
                                         loader=load_torch_checkpoint)
        if variables is None:  # explicit random init (tests / smoke only)
            variables = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, patch_size, patch_size, 1)), train=False)
        self.variables = variables

        @jax.jit
        def _apply(v, batch):
            return self.model.apply(v, batch, train=False)

        self._apply = _apply

    def segment(self, image, probability_threshold: float = 0.5,
                batch_size: int = 2, progress_cb=None):
        """Per-slice 2D patch inference.  'binary' method feeds the bone
        mask (image >= 300 HU) as input; 'gray' feeds WW/WL-normalized
        intensity (reference implant methods)."""
        img = jnp.asarray(image)
        if self.method == "binary":
            data = (img >= 300).astype(jnp.float32)
        else:
            from invesalius3_tpu.ops.windowing import get_lut_value_255

            data = get_lut_value_255(img, 2000.0, 300.0) / 255.0

        Z, Y, X = data.shape
        p = self.patch_size
        pads = [(0, max(0, p - Y)), (0, max(0, p - X))]
        data = jnp.pad(data, [(0, 0)] + pads)
        Yp, Xp = data.shape[1:]
        # 2D grid per slice (reference: 480^2 patches, overlap 0.5)
        grid2d = patch_grid((1, Yp, Xp), p, self.overlap)
        origins = [(gy, gx) for (_, gy, gx) in grid2d]

        prob = jnp.zeros((Z, Yp, Xp), jnp.float32)
        n_total = Z * len(origins)
        done = 0
        for z in range(Z):
            for (gy, gx) in origins:
                patch = jax.lax.dynamic_slice(data[z], (gy, gx), (p, p))
                out = self._apply(self.variables, patch[None, ..., None])[0, ..., 0]
                prob = jax.lax.dynamic_update_slice(prob, out[None], (z, gy, gx))
                done += 1
                if progress_cb:
                    progress_cb(done / n_total)
        prob = prob[:, :Y, :X]
        mask = np.where(np.asarray(prob) >= probability_threshold, 255, 0).astype(np.uint8)
        return np.asarray(prob), mask


class SubpartSegmenter:
    """FastSurfer brain parcellation as a DL job backend (reference
    SubpartSegmentProcess segment.py:544 + apply_segment_threshold :734):
    conform -> 3-view CNN -> FreeSurfer-id labelmap resampled back to the
    image grid (nearest, like the reference's resample_from_to order=0).

    ``segment`` returns (labelmap int32-as-float, whole-brain mask);
    ``labelmap`` rides in the probability slot so callers can split
    per-structure masks with :func:`structure_masks`."""

    WEIGHT_NAMES = ("fastsurfer_axial", "fastsurfer_coronal",
                    "fastsurfer_sagittal")

    def __init__(self, variables=None, allow_random_init: bool = False,
                 filters: int = 64, conform_size: Optional[int] = None):
        from invesalius3_tpu.models import fastsurfer as fs

        self._fs = fs
        self.filters = filters
        self.conform_size = conform_size or fs.CONFORM_SIZE
        if variables is None:
            variables = self._resolve(allow_random_init)
        self.variables = variables  # {} -> random init (tests/smoke)

    def _resolve(self, allow_random_init: bool):
        """Per-view checkpoints (torch .pt or ONNX, reference model_info
        segment.py:576-613); all three or nothing."""
        try:
            from invesalius3_tpu.net.download import get_weight_file

            out = {}
            for name, view in zip(self.WEIGHT_NAMES,
                                  ("axial", "coronal", "sagittal")):
                path = str(get_weight_file(name))
                loader = (self._fs.load_onnx_checkpoint
                          if path.endswith(".onnx")
                          else self._fs.load_torch_checkpoint)
                out[view] = loader(path)
            return out
        except Exception as e:
            if allow_random_init:
                warnings.warn(
                    f"FastSurfer subpart running with RANDOM weights ({e}); "
                    f"output is noise, not a parcellation",
                    RuntimeWarning, stacklevel=3)
                return {}
            raise WeightsUnavailableError(
                f"no FastSurfer checkpoints ({self.WEIGHT_NAMES}): {e}"
            ) from e

    def segment(self, image, probability_threshold: float = 0.5,
                batch_size: int = 8, progress_cb=None
                ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from invesalius3_tpu.ops.resize import resize_volume

        img = np.asarray(image)
        pipe = self._fs.FastSurferPipeline(
            variables=self.variables or {}, batch_size=batch_size,
            filters=self.filters)
        labels = pipe.run(img, conform_size=self.conform_size,
                          return_freesurfer_ids=True, progress=progress_cb)
        if labels.shape != img.shape:  # back to the image grid
            labels = np.asarray(resize_volume(
                jnp.asarray(labels), img.shape, order=0)).astype(np.int32)
        mask = ((labels > 0) * 255).astype(np.uint8)  # whole-brain fallback
        return labels.astype(np.int32), mask


def structure_masks(labelmap: np.ndarray, categories) -> list:
    """Per-structure binary masks for the selected LUT categories
    (reference apply_segment_threshold :744-917 pick_regions).  Returns
    [(name, mask uint8, label_id)]; empty structures are skipped like the
    reference.

    "subcortical" selects the LUT's Subcortical gray-matter structures
    (thalamus, caudate, hippocampus, ...); the reference pick_regions'
    broader "everything that's not cortical and not background" set
    (which also sweeps in ventricles/CSF/WM/cerebellum) is available as
    "non_cortical"."""
    from invesalius3_tpu.models.fastsurfer import LUT_ROWS

    out = []
    for cat in categories:
        c = str(cat).lower().replace("-", "_").replace(" ", "_")
        for lid, name, category in LUT_ROWS:
            if lid == 0:
                continue
            if c == "non_cortical":
                match = not name.startswith("ctx-")
            elif c == "cortical":
                match = name.startswith("ctx-")
            else:
                match = category.lower() == c
            if not match:
                continue
            m = (labelmap == lid).astype(np.uint8) * 255
            if m.any():
                out.append((name.replace("-", "_"), m, lid))
    return out


SEGMENTERS = {
    "brain_mri_t1": BrainSegmenter,
    "trachea_ct": TracheaSegmenter,
    "mandible_jit_ct": MandibleSegmenter,
    "cranioplasty_implant": ImplantSegmenter,
    "fastsurfer_subpart": SubpartSegmenter,
}
