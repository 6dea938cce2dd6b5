"""Mask boolean ops, crop box, NIfTI mask import, image versions, and
volume reorientation — the Slice editing flows added for reference parity
(slice_.py:1878 do_boolean_op, geometry.py Box, control.py:264
OnImportMaskNifti, slice_.py:2330 __apply_image_filter /
:2541 __switch_active_image, :2103 OnFlipVolume, :2152 OnSwapVolumeAxes)."""

import numpy as np
import pytest

from invesalius3_tpu import constants as const
from invesalius3_tpu.core.geometry import Box
from invesalius3_tpu.core.slice import Slice
from invesalius3_tpu.core.volume import Volume

rng = np.random.default_rng(11)


def _volume(shape=(12, 14, 16)):
    ct = rng.integers(-1000, 2000, shape).astype(np.int16)
    return Volume.from_numpy(ct, spacing=(0.5, 0.6, 0.7))


# ---------------------------------------------------------------------------
# boolean ops
# ---------------------------------------------------------------------------
def test_boolean_ops_oracle():
    vol = _volume()
    slc = Slice(vol)
    m1 = slc.create_new_mask(threshold_range=(0, 2000))
    m2 = slc.create_new_mask(threshold_range=(500, 1000))
    a = np.asarray(m1.data) >= const.MASK_VISIBLE_MIN
    b = np.asarray(m2.data) >= const.MASK_VISIBLE_MIN
    want = {
        const.BOOLEAN_UNION: a | b,
        const.BOOLEAN_DIFF: a & ~b,
        const.BOOLEAN_AND: a & b,
        const.BOOLEAN_XOR: a ^ b,
    }
    for op, expect in want.items():
        out = slc.do_boolean_op(op, m1.index, m2.index)
        np.testing.assert_array_equal(
            np.asarray(out.data), expect.astype(np.uint8) * 255)
        assert out.was_edited
        assert const.BOOLEAN_OP_NAMES[op] in out.name
    # result registered + selected
    assert slc.current_mask is out
    with pytest.raises(ValueError):
        slc.do_boolean_op(99, m1.index, m2.index)


# ---------------------------------------------------------------------------
# crop box
# ---------------------------------------------------------------------------
def test_crop_box_geometry():
    box = Box((10, 20, 30), spacing=(0.5, 1.0, 2.0))
    assert box.limits == (0, 9, 0, 19, 0, 29)
    box.set_limits(2, 7, 3, 15, 4, 25)
    assert box.limits == (2, 7, 3, 15, 4, 25)
    # world extents use X-first spacing
    xi, xf, yi, yf, zi, zf = box.world_limits
    assert (xi, xf) == (4 * 0.5, 25 * 0.5)
    assert (yi, yf) == (3 * 1.0, 15 * 1.0)
    assert (zi, zf) == (2 * 2.0, 7 * 2.0)
    mat = box.make_matrix()
    assert set(mat) == {"AXIAL", "CORONAL", "SAGITTAL"}
    for segs in mat.values():
        assert len(segs) == 4 and all(len(s) == 2 and len(s[0]) == 3 for s in segs)
    # setters keep i <= f; clamp respects shape
    box.set_x(28, 3)
    assert (box.xi, box.xf) == (3, 28)
    box.set_z(-5, 99)
    box.clamp()
    assert (box.zi, box.zf) == (0, 9)


def test_apply_crop_undoable():
    vol = _volume()
    slc = Slice(vol)
    m = slc.create_new_mask(threshold_range=(0, 2000))
    before = np.asarray(m.data).copy()
    box = slc.create_crop_box()
    box.set_limits(2, 8, 3, 10, 4, 12)
    slc.apply_crop()
    out = np.asarray(m.data)
    want = np.zeros_like(before)
    want[2:9, 3:11, 4:13] = before[2:9, 3:11, 4:13]
    np.testing.assert_array_equal(out, want)
    assert m.undo()
    np.testing.assert_array_equal(np.asarray(m.data), before)


# ---------------------------------------------------------------------------
# NIfTI mask import
# ---------------------------------------------------------------------------
def test_import_mask_from_nifti(tmp_path):
    from invesalius3_tpu.io.nifti import write_nifti

    vol = _volume()
    slc = Slice(vol)
    labels = (rng.random(vol.shape) > 0.7).astype(np.uint8)  # 0/1 label map
    p = tmp_path / "mask.nii.gz"
    write_nifti(p, labels, spacing=vol.spacing)
    m = slc.import_mask_from_nifti(p)
    np.testing.assert_array_equal(np.asarray(m.data), labels * 255)
    assert m.threshold_range == (0, 255)
    assert slc.current_mask is m

    bad = np.zeros((3, 3, 3), np.uint8)
    p2 = tmp_path / "bad.nii.gz"
    write_nifti(p2, bad)
    with pytest.raises(ValueError):
        slc.import_mask_from_nifti(p2)


# ---------------------------------------------------------------------------
# image versions
# ---------------------------------------------------------------------------
def test_image_versions_filter_and_switch():
    vol = _volume((10, 12, 14))
    slc = Slice(vol)
    m = slc.create_new_mask(threshold_range=(0, 2000))
    orig = np.asarray(slc.matrix).copy()
    label = slc.apply_image_filter(const.FILTER_GAUSSIAN, 1.5)
    assert label == "Filtered 1" and slc.current_image_label == label
    assert len(slc.image_versions) == 2
    filtered = np.asarray(slc.matrix)
    assert not np.array_equal(filtered, orig)
    # unedited mask re-thresholded against the filtered image
    want = ((filtered >= 0) & (filtered <= 2000)).astype(np.uint8) * 255
    np.testing.assert_array_equal(np.asarray(m.data), want)
    # switch back restores the original
    slc.select_image_version("original")
    np.testing.assert_array_equal(np.asarray(slc.matrix), orig)
    # chaining numbers versions sequentially
    assert slc.apply_image_filter(const.FILTER_MEAN, 1.0) == "Filtered 2"
    with pytest.raises(KeyError):
        slc.select_image_version("nope")


def test_image_filter_2d_matches_per_slice():
    from invesalius3_tpu.ops import filters as F
    import jax.numpy as jnp

    vol = _volume((6, 10, 12))
    slc = Slice(vol)
    slc.apply_image_filter(const.FILTER_GAUSSIAN, 1.0, dimension="2D",
                           orientation="AXIAL")
    got = np.asarray(slc.matrix)
    want = np.stack([
        np.asarray(F.gaussian(jnp.asarray(np.asarray(vol.data)[i]), 1.0))
        for i in range(vol.shape[0])
    ])
    np.testing.assert_array_equal(got, want)


def test_new_filters_match_scipy():
    from scipy import ndimage
    import jax.numpy as jnp
    from invesalius3_tpu.ops import filters as F

    x = rng.integers(-500, 500, (8, 9, 10)).astype(np.int16)
    # sharpen: reference filters.py sharpening_filter
    got = np.asarray(F.sharpen(jnp.asarray(x), 2.0))
    f = x.astype(float)
    blurred = ndimage.gaussian_filter(f, sigma=1.0)
    want = np.clip(f + 2.0 * 0.5 * (f - blurred), x.min(), x.max()).astype(np.int16)
    assert np.mean(np.abs(got.astype(float) - want.astype(float)) <= 1) > 0.99
    # border detection: sobel magnitude rescaled to input range
    got = np.asarray(F.border_detection(jnp.asarray(x), 1.0)).astype(float)
    sm = ndimage.gaussian_filter(f, sigma=1.0)
    mag = np.sqrt(sum(ndimage.sobel(sm, axis=a) ** 2 for a in range(3)))
    want = ((mag - mag.min()) / (mag.max() - mag.min())
            * (f.max() - f.min()) + f.min())
    assert np.mean(np.abs(got - want) <= 2) > 0.98


def test_image_versions_inv3_roundtrip(tmp_path):
    from invesalius3_tpu.core.project import Project

    vol = _volume((8, 8, 8))
    slc = Slice(vol)
    slc.apply_image_filter(const.FILTER_MEAN, 1.0)
    proj = Project()
    proj.volume = vol
    proj.name = "v"
    proj.image_versions = slc.image_versions
    p = tmp_path / "v.inv3"
    proj.save(p)
    loaded = Project.open(p)
    labels = [lbl for lbl, _ in loaded.image_versions]
    assert labels == ["original", "Filtered 1"]
    np.testing.assert_array_equal(
        np.asarray(loaded.image_versions[1][1]),
        np.asarray(slc.image_versions[1][1]))


# ---------------------------------------------------------------------------
# reorientation
# ---------------------------------------------------------------------------
def test_flip_and_swap_volume():
    vol = _volume((6, 8, 10))
    slc = Slice(vol)
    m = slc.create_new_mask(threshold_range=(0, 2000))
    orig = np.asarray(vol.data).copy()
    slc.flip_volume(0)
    np.testing.assert_array_equal(np.asarray(slc.matrix), orig[::-1])
    # masks re-evaluated against the flipped image
    want = ((orig[::-1] >= 0) & (orig[::-1] <= 2000)).astype(np.uint8) * 255
    np.testing.assert_array_equal(np.asarray(m.data), want)

    slc.swap_volume_axes(2, 1)  # x <-> y
    assert slc.matrix.shape == (6, 10, 8)
    assert slc.spacing == (0.6, 0.5, 0.7)
    np.testing.assert_array_equal(
        np.asarray(slc.matrix), orig[::-1].swapaxes(2, 1))
    assert np.asarray(m.data).shape == (6, 10, 8)


# ---------------------------------------------------------------------------
# mask statistics (reference slice_.py:2283-2321)
# ---------------------------------------------------------------------------
def test_calc_mask_area_analytic_box():
    """An isolated axis-aligned box of voxels has the analytic surface area
    2*(XY + XZ + YZ) of its physical dimensions."""
    ct = np.full((16, 16, 16), -1000, np.int16)
    ct[4:8, 5:11, 2:10] = 1000  # 4 z-voxels x 6 y x 8 x
    vol = Volume.from_numpy(ct, spacing=(0.5, 0.5, 1.0))
    slc = Slice(vol)
    slc.create_new_mask(threshold_range=(500, 2000))
    X, Y, Z = 8 * 0.5, 6 * 0.5, 4 * 1.0
    want = 2 * (X * Y + X * Z + Y * Z)
    assert abs(slc.calc_mask_area() - want) < 1e-3


def test_calc_mask_area_border_voxels_count_as_inside():
    """convolve_non_zero is called with cval=1, so faces on the volume
    border are NOT exposed (reference convolve_non_zero cval=1 call)."""
    ct = np.full((8, 8, 8), 1000, np.int16)  # mask fills the whole volume
    vol = Volume.from_numpy(ct, spacing=(1.0, 1.0, 1.0))
    slc = Slice(vol)
    slc.create_new_mask(threshold_range=(500, 2000))
    assert abs(slc.calc_mask_area()) < 1e-3  # fully enclosed: zero area


def test_calc_image_density():
    ct = np.full((8, 8, 8), -1000, np.int16)
    ct[2:4, 2:4, 2:4] = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    vol = Volume.from_numpy(ct, spacing=(1.0, 1.0, 1.0))
    slc = Slice(vol)
    slc.create_new_mask(threshold_range=(0, 100))
    mn, mx, mean, std = slc.calc_image_density()
    vals = np.arange(8, dtype=np.float64)  # all inside threshold_range
    assert mn == 0 and mx == 7
    assert abs(mean - vals.mean()) < 1e-5
    assert abs(std - vals.std()) < 1e-5


# ---------------------------------------------------------------------------
# reorientation (reference slice_.py:1969 apply_reorientation)
# ---------------------------------------------------------------------------
def test_apply_reorientation_identity():
    vol = _volume((10, 12, 14))
    slc = Slice(vol)
    before = np.asarray(slc.matrix).copy()
    slc.apply_reorientation(angles=(0.0, 0.0, 0.0))
    after = np.asarray(slc.matrix)
    # identity transform: interior voxels unchanged (border ring may take
    # cval per the reference's [0, dim-1) validity rule)
    np.testing.assert_array_equal(after[1:-1, 1:-1, 1:-1],
                                  before[1:-1, 1:-1, 1:-1])


def test_apply_reorientation_scipy_oracle():
    """The resample equals scipy.ndimage.affine_transform under the same
    M = T1 R^T T0 matrix (trilinear, (z, y, x) coords, spacing 1)."""
    from scipy import ndimage

    from invesalius3_tpu.ops import transforms

    ct = rng.integers(-1000, 2000, (16, 16, 16)).astype(np.int16)
    vol = Volume.from_numpy(ct, spacing=(1.0, 1.0, 1.0))
    slc = Slice(vol)
    m1 = slc.create_new_mask(threshold_range=(500, 2000))
    angles = (0.2, -0.1, np.pi / 2)
    slc.apply_reorientation(angles=angles, interp_method=const.INTERP_TRILINEAR)
    got = np.asarray(slc.matrix)

    ax, ay, az = angles
    R = transforms.euler_matrix(az, ay, ax, axes="sxyz")
    c = 8.0
    T0 = transforms.translation_matrix((-c, -c, -c))
    T1 = transforms.translation_matrix((c, c, c))
    M = T1 @ R.T @ T0
    want = ndimage.affine_transform(
        ct.astype(np.float64), M[:3, :3], offset=M[:3, 3], order=1,
        mode="constant", cval=float(ct.min()))
    # compare where every sample was interior under our validity rule
    zz, yy, xx = np.mgrid[:16, :16, :16].astype(np.float64)
    p = np.stack([zz, yy, xx, np.ones_like(zz)])
    q = np.einsum("ij,jzyx->izyx", M, p)
    interior = ((q[0] >= 0) & (q[0] < 15) & (q[1] >= 0) & (q[1] < 15)
                & (q[2] >= 0) & (q[2] < 15))
    diff = np.abs(got.astype(np.float64) - want)[interior]
    assert (diff <= 1.0).mean() > 0.999, diff.max()
    # masks follow the image (non-edited: re-thresholded from the rotation)
    mask_want = (got >= 500) & (got <= 2000)
    mask_got = np.asarray(m1.data) == 255
    assert (mask_got == mask_want).all()


def test_apply_reorientation_carries_edited_mask():
    ct = np.full((12, 12, 12), -1000, np.int16)
    vol = Volume.from_numpy(ct, spacing=(1.0, 1.0, 1.0))
    slc = Slice(vol)
    m = slc.create_new_mask(threshold_range=(500, 2000))
    import jax.numpy as jnp
    d = np.zeros((12, 12, 12), np.uint8)
    d[5:7, 5:7, 5:7] = 254  # manual edit blob at the center
    m.apply(jnp.asarray(d))
    assert m.was_edited
    slc.apply_reorientation(angles=(0.0, 0.0, np.pi / 2))
    out = np.asarray(m.data)
    assert (out == 254).sum() >= 4  # center blob survives the rotation


def test_color_overlay_composites_fmri_style():
    """fMRI color overlay (reference task_fmrisupport.py:177-230): zero of
    the ORIGINAL volume transparent, nonzero activation colormapped over
    the slice."""
    from invesalius3_tpu.core.slice import Slice
    from invesalius3_tpu.core.volume import Volume

    ct = np.zeros((8, 32, 32), np.int16)
    slc = Slice(Volume.from_numpy(ct, spacing=(1, 1, 1)))
    act = np.zeros((8, 32, 32), np.float32)
    act[4, 10:20, 10:20] = 5.0   # activation blob
    act[4, 2, 2] = -1.0          # so zero is interior to the range
    base = slc.get_rendered_slice("AXIAL", 4)
    slc.set_color_overlay(act, colormap="autumn")
    over = slc.get_rendered_slice("AXIAL", 4)
    assert not np.array_equal(base, over)
    # activation pixels colored, zero-activation pixels untouched
    assert not np.array_equal(base[15, 15], over[15, 15])
    np.testing.assert_array_equal(base[25, 25], over[25, 25])
    # other slices untouched
    np.testing.assert_array_equal(slc.get_rendered_slice("AXIAL", 2), 
                                  slc.get_rendered_slice("AXIAL", 2))
    slc.clear_color_overlay()
    np.testing.assert_array_equal(base, slc.get_rendered_slice("AXIAL", 4))

    with pytest.raises(ValueError):
        slc.set_color_overlay(np.zeros((4, 4, 4)))
