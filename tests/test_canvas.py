"""Slice-overlay compositing (core/canvas.py) — the canvas-renderer
equivalent (reference gui/widgets/canvas_renderer.py:77, measures'
draw_to_canvas measures.py:877/1533/1320/1818)."""

import numpy as np
import pytest

from invesalius3_tpu.core import canvas
from invesalius3_tpu.core.measures import MeasurementManager, Measurement


def blank(h=64, w=64):
    return np.zeros((h, w, 3), np.uint8)


def test_draw_line_endpoints_and_clip():
    img = blank()
    canvas.draw_line(img, (5, 10), (40, 10), (255, 0, 0))
    assert tuple(img[10, 5]) == (255, 0, 0)
    assert tuple(img[10, 40]) == (255, 0, 0)
    assert tuple(img[10, 41]) == (0, 0, 0)
    # off-image coordinates must clip, not wrap/raise
    canvas.draw_line(img, (-20, -5), (100, 90), (0, 255, 0))


def test_draw_rect_and_dashed():
    img = blank()
    canvas.draw_rect(img, (8, 8), (30, 20), (255, 255, 0))
    assert tuple(img[8, 15]) == (255, 255, 0)
    assert tuple(img[20, 30]) == (255, 255, 0)
    img2 = blank()
    canvas.draw_rect(img2, (8, 8), (30, 20), (255, 255, 0), dashed=True)
    edge = img2[8, 8:31]
    assert edge.any() and not edge.all(axis=1).all()  # gaps exist


def test_text_mask_and_draw_text():
    m = canvas.text_mask("12.3 MM")
    assert m.shape[0] == 7 and m.any()
    img = blank()
    canvas.draw_text(img, (4, 4), "12", (255, 255, 255), background=None)
    assert (img[4:11, 4:15] == 255).any()


def test_linear_measure_draws_on_its_slice_only():
    img = blank()
    m = Measurement(type="linear", location="AXIAL", slice_number=5,
                    points=[[10.0, 12.0, 5.0], [30.0, 12.0, 5.0]],
                    value=20.0, colour=(1.0, 0.0, 0.0))
    drawn = canvas.draw_measure(img, m, "AXIAL", 5, (1.0, 1.0, 1.0))
    assert drawn
    assert tuple(img[12, 20]) == (255, 0, 0)  # line midpoint
    img2 = blank()
    assert not canvas.draw_measure(img2, m, "AXIAL", 9, (1.0, 1.0, 1.0))
    assert not img2.any()
    img3 = blank()
    assert not canvas.draw_measure(img3, m, "CORONAL", 5, (1.0, 1.0, 1.0))


def test_spacing_scales_world_to_pixel():
    # world x=20mm with sx=2.0 -> col 10
    assert canvas.world_to_pixel((20.0, 6.0, 0.0), "AXIAL", (2.0, 3.0, 1.0)) \
        == (10.0, 2.0)
    assert canvas.measure_slice_index((20.0, 6.0, 8.0), "AXIAL",
                                      (2.0, 3.0, 2.0)) == 4


def test_angular_and_annotation_render():
    img = blank()
    m = Measurement(type="angular", location="AXIAL", slice_number=0,
                    points=[[10, 30, 0], [10, 10, 0], [30, 10, 0]],
                    value=90.0, colour=(0.0, 1.0, 0.0))
    assert canvas.draw_measure(img, m, "AXIAL", 0, (1, 1, 1))
    assert tuple(img[20, 10]) == (0, 255, 0)  # first ray
    assert tuple(img[10, 20]) == (0, 255, 0)  # second ray

    img = blank()
    a = Measurement(type="annotation", location="AXIAL", slice_number=0,
                    points=[[12, 40, 0], [30, 22, 0]], value="LESION",
                    colour=(1.0, 1.0, 0.0))
    assert canvas.draw_measure(img, a, "AXIAL", 0, (1, 1, 1))
    assert img.any()


def test_density_ellipse_outline():
    img = blank()
    m = Measurement(type="density_ellipse", location="AXIAL", slice_number=0,
                    points=[[32, 32, 0]], value=120.0, colour=(0.0, 0.0, 1.0),
                    extra={"rx": 10.0, "ry": 6.0, "mean": 120.0})
    assert canvas.draw_measure(img, m, "AXIAL", 0, (1, 1, 1))
    assert tuple(img[32, 42]) == (0, 0, 255)  # +rx extreme
    assert tuple(img[38, 32]) == (0, 0, 255)  # +ry extreme


def test_crop_box_draws_only_inside_range():
    class Box:
        limits = (2, 8, 5, 20, 6, 30)

    img = blank()
    assert canvas.draw_crop_box(img, Box(), "AXIAL", 4)
    assert img[5, 6:31].any()  # top edge (dashed — some pixels set)
    img2 = blank()
    assert not canvas.draw_crop_box(img2, Box(), "AXIAL", 12)
    img3 = blank()
    assert canvas.draw_crop_box(img3, Box(), "CORONAL", 10)


def test_manager_annotation_reference_code_roundtrip():
    mgr = MeasurementManager()
    a = mgr.add_annotation((5.0, 6.0, 7.0), "CHECK HERE", slice_number=7)
    assert a.type == "annotation" and a.value == "CHECK HERE"
    # reference int code 10 (constants.py:113) maps back to annotation
    m = Measurement.from_dict({"index": 0, "type": 10, "location": 1,
                               "points": [(1, 2, 3)], "value": "note"})
    assert m.type == "annotation" and m.location == "AXIAL"


def test_rendered_slice_with_overlays():
    from invesalius3_tpu.core.slice import Slice
    from invesalius3_tpu.core.volume import Volume

    ct = np.zeros((8, 64, 64), np.int16)
    slc = Slice(Volume.from_numpy(ct, spacing=(1.0, 1.0, 1.0)))
    mgr = MeasurementManager(bus=slc.bus)
    mgr.add_linear((10.0, 31.0, 3.0), (50.0, 31.0, 3.0), slice_number=3)
    base = slc.get_rendered_slice("AXIAL", 3)
    with_m = slc.get_rendered_slice("AXIAL", 3, measures=mgr)
    assert not np.array_equal(base, with_m)
    assert np.array_equal(base, slc.get_rendered_slice("AXIAL", 2,
                                                       measures=mgr))

    class Box:
        limits = (0, 7, 10, 50, 10, 50)

    with_crop = slc.get_rendered_slice("AXIAL", 3, crop_box=Box())
    assert not np.array_equal(base, with_crop)
    with_cross = slc.get_rendered_slice("AXIAL", 3, cross=(32, 32))
    assert not np.array_equal(base, with_cross)


def test_ruler_and_orientation_labels():
    img = blank(128, 128)
    canvas.draw_ruler(img, px_per_mm=2.0)  # 20mm bar = 40px fits h/3
    col = img[:, 10]
    assert col.any()  # vertical bar drawn at x=10
    assert (img[:, 15:40] == 255).any()  # "20 MM" label text

    img2 = blank(64, 64)
    canvas.draw_orientation_labels(img2, "AXIAL")
    assert img2[:10].any() and img2[-10:].any()   # A / P
    assert img2[:, :10].any() and img2[:, -10:].any()  # R / L


def test_rendered_slice_ruler_labels_flags():
    from invesalius3_tpu.core.slice import Slice
    from invesalius3_tpu.core.volume import Volume

    ct = np.zeros((4, 64, 64), np.int16)
    slc = Slice(Volume.from_numpy(ct, spacing=(0.5, 0.5, 1.0)))
    base = slc.get_rendered_slice("AXIAL", 2)
    with_r = slc.get_rendered_slice("AXIAL", 2, ruler=True)
    with_l = slc.get_rendered_slice("AXIAL", 2, orientation_labels=True)
    assert not np.array_equal(base, with_r)
    assert not np.array_equal(base, with_l)


def test_render_surfaces_zbuffer():
    """Surface splat renderer: nearer mesh wins the z-test, background
    stays background (ops/render_mesh.py; reference viewer_volume
    surface actors)."""
    from invesalius3_tpu.ops import render_mesh

    v1, f1 = render_mesh._icosphere((0.0, 0.0, 0.0), radius=10.0)
    v2, f2 = render_mesh._icosphere((30.0, 0.0, 0.0), radius=5.0)  # right
    v3, f3 = render_mesh._icosphere((0.0, -30.0, 0.0), radius=5.0)  # behind
    img = render_mesh.render_surfaces(
        [(v1, f1, (1.0, 0.0, 0.0)), (v2, f2, (0.0, 0.0, 1.0)),
         (v3, f3, (0.0, 1.0, 0.0))],
        azimuth=0.0, elevation=0.0, size=96)
    assert img.shape == (96, 96, 3)
    assert (img[2, 2] == np.array([17, 19, 24])).all()  # background
    red = (img[:, :, 0].astype(int) - img[:, :, 2]) > 30
    blue = (img[:, :, 2].astype(int) - img[:, :, 0]) > 30
    green = (img[:, :, 1].astype(int) - img[:, :, 0]) > 30
    assert red.sum() > blue.sum() > 0  # both visible, red sphere larger
    # red (r=10) projects left of blue (at x=+30)
    assert np.nonzero(red)[1].mean() < np.nonzero(blue)[1].mean()
    # the z-test hides the sphere directly behind the big one (a few
    # pinhole pixels at the occluder's silhouette are splat-sampling noise)
    assert green.sum() <= red.sum() * 0.01

    empty = render_mesh.render_surfaces([], size=32)
    assert (empty == np.array([17, 19, 24])).all()


def test_render_surfaces_ssao_no_edge_wrap():
    """SSAO samples depth edge-clamped, not wrapped: with a NEAR sphere
    at the left image border and a FAR sphere at the right border, a
    wrapped roll would let the near sphere cast phantom occlusion onto
    the far sphere's border pixels (right mean ratio drops well below
    the left); clamp sampling keeps the two silhouettes symmetric.
    Reference viewer_volume.py vtkSSAOPass."""
    from invesalius3_tpu.ops import render_mesh

    vA, fA = render_mesh._icosphere((-25.0, 20.0, 0.0), radius=8.0)
    vB, fB = render_mesh._icosphere((25.0, -20.0, 0.0), radius=8.0)
    meshes = [(vA, fA, (0.8, 0.8, 0.8)), (vB, fB, (0.8, 0.8, 0.8))]
    plain = render_mesh.render_surfaces(meshes, 0.0, 0.0, size=96)
    ao = render_mesh.render_surfaces(meshes, 0.0, 0.0, size=96, ssao=True)
    assert (plain != ao).any()  # the pass does something
    bg = np.array([17, 19, 24])
    hit = ~np.all(plain == bg, axis=-1)
    ratio = np.where(hit, ao[:, :, 0].astype(float)
                     / np.maximum(plain[:, :, 0], 1), np.nan)
    cols = np.nonzero(hit.any(0))[0]
    left = np.nanmean(ratio[:, cols.min():cols.min() + 6])
    right = np.nanmean(ratio[:, cols.max() - 5:cols.max() + 1])
    # measured with clamp: 0.455 vs 0.451; a wrapped roll pushes the
    # right border far darker (phantom depth excess clipped at 80/sample)
    assert abs(left - right) < 0.05, (left, right)


def test_render_scene_glyphs():
    from invesalius3_tpu.ops import render_mesh

    class S:
        pass

    s = S()
    s.vertices, s.faces = render_mesh._icosphere((0, 0, 0), 8.0)
    s.colour = (0.9, 0.8, 0.7)
    s.is_shown = True

    class M:
        position = (20.0, 0.0, 0.0)
        colour = (1.0, 0.0, 0.0)

    img = render_mesh.render_scene(
        [s], markers=[M()], probe_pose=(0, 0, 30, 0, 0, 0), size=96)
    assert img.shape == (96, 96, 3)
    assert (img != np.array([17, 19, 24])).any(axis=-1).sum() > 200


def test_render_scene_streamlines():
    from invesalius3_tpu.ops import render_mesh

    t = np.linspace(0, 4 * np.pi, 60)
    tract = np.stack([10 * np.cos(t), 10 * np.sin(t), t * 2], axis=1)
    img = render_mesh.render_scene([], streamlines=[(tract, (1.0, 0.9, 0.1))],
                                   size=96)
    lit = (img != np.array([17, 19, 24])).any(axis=-1)
    assert lit.sum() > 100  # the helix ribbon is visible


def test_render_scene_coil_glyph():
    """Figure-8 coil actor (reference coil_visualizer.py) renders and
    follows the pose rotation."""
    from invesalius3_tpu.ops import render_mesh

    img = render_mesh.render_scene(
        [], coil_poses=[(0, 0, 0, 0, 0, 0)], size=96)
    lit = (img != np.array([17, 19, 24])).any(axis=-1)
    assert lit.sum() > 300  # two discs + handle cover real area

    # rotated 90 deg about x: the flat coil is seen edge-on -> far fewer
    # lit pixels from the default camera
    img2 = render_mesh.render_scene(
        [], coil_poses=[(0, 0, 0, 90, 0, 0)], size=96,
        azimuth=0.0, elevation=90.0)
    lit2 = (img2 != np.array([17, 19, 24])).any(axis=-1)
    assert lit2.sum() < lit.sum()


def test_render_scene_vertex_colours():
    """Per-vertex colours (the MEP heat-map path) render per-face means."""
    from invesalius3_tpu.ops import render_mesh

    class S:
        pass

    s = S()
    s.vertices, s.faces = render_mesh._icosphere((0, 0, 0), 10.0)
    vc = np.zeros((len(s.vertices), 3), np.float32)
    vc[:, 0] = 1.0  # all-red vertex colours
    s.colour = vc
    s.is_shown = True
    img = render_mesh.render_scene([s], size=96)
    lit = (img != np.array([17, 19, 24])).any(axis=-1)
    assert lit.sum() > 100
    # lit pixels are red-dominant
    reds = img[..., 0][lit].astype(int)
    greens = img[..., 1][lit].astype(int)
    assert (reds > greens).mean() > 0.9


def test_robot_force_bar():
    """Force bar overlay (reference robot_force_visualizer.py): green
    below the safe threshold, red beyond the limit."""
    from invesalius3_tpu.ops import render_mesh

    base = np.full((96, 96, 3), (17, 19, 24), np.uint8)
    low = render_mesh.draw_force_bar(base, 1.0)
    hot = render_mesh.draw_force_bar(base, 6.0)
    assert (low[:, 4:11] == (60, 200, 90)).all(axis=-1).any()
    assert (hot[:, 4:11] == (230, 70, 60)).all(axis=-1).any()
    # higher force fills more of the bar
    assert ((hot == (230, 70, 60)).all(axis=-1).sum()
            > (low == (60, 200, 90)).all(axis=-1).sum())


def test_render_surfaces_screen_door_transparency():
    """A translucent front surface lets the occluded mesh show through on
    the dithered pixels (reference surface transparency slider; here the
    VTK-era ordered-dither screen door)."""
    from invesalius3_tpu.ops import render_mesh

    big, fb = render_mesh._icosphere((0.0, 0.0, 0.0), radius=12.0)
    # forward at az=el=0 is -y (see test_render_surfaces_zbuffer)
    small, fs = render_mesh._icosphere((0.0, -14.0, 0.0), radius=5.0)

    def green_pixels(alpha):
        img = render_mesh.render_surfaces(
            [(big, fb, (1.0, 0.0, 0.0), alpha),
             (small, fs, (0.0, 1.0, 0.0))],
            azimuth=0.0, elevation=0.0, size=96)
        return int(((img[:, :, 1].astype(int) - img[:, :, 0]) > 30).sum())

    opaque = green_pixels(1.0)
    half = green_pixels(0.5)
    faint = green_pixels(0.15)
    assert opaque <= 5  # fully occluded behind the opaque sphere
    assert half > 40  # screen door opens ~half the pixels
    assert faint > half  # more transparent -> more show-through


def test_remove_non_visible_faces():
    """Visibility culling drops fully-enclosed geometry and keeps a closed
    surface intact (reference polydata_utils.py:363 RemoveNonVisibleFaces,
    task_navigator scalp simplification)."""
    from invesalius3_tpu.ops import render_mesh

    outer, fo = render_mesh._icosphere((0.0, 0.0, 0.0), radius=20.0)
    inner, fi = render_mesh._icosphere((0.0, 0.0, 0.0), radius=5.0)
    verts = np.concatenate([outer, inner])
    faces = np.concatenate([fo, fi + len(outer)])

    v2, f2, ratio = render_mesh.remove_non_visible_faces(verts, faces)
    # the enclosed inner sphere disappears; the outer shell survives whole
    assert len(f2) == len(fo)
    assert abs(ratio - len(fo) / len(faces)) < 1e-6
    r = np.linalg.norm(v2, axis=1)
    assert (r > 15).all()  # only outer-sphere vertices remain

    # a single closed surface keeps every face
    v3, f3, ratio3 = render_mesh.remove_non_visible_faces(outer, fo)
    assert len(f3) == len(fo) and ratio3 == 1.0

    # remove_visible inverts the keep set: only the hidden sphere remains
    v4, f4, _ = render_mesh.remove_non_visible_faces(
        verts, faces, remove_visible=True)
    assert len(f4) == len(fi)
    assert (np.linalg.norm(v4, axis=1) < 6).all()
