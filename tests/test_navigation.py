"""Navigation runtime: tracker (debug backends), coregistration math,
markers, robot, measures, remote-control mirroring — all hardware-free,
using the reference's own debug-tracker test seam."""

import time

import numpy as np
import pytest

from invesalius3_tpu import events
from invesalius3_tpu.core import measures
from invesalius3_tpu.navigation import coregistration as coreg
from invesalius3_tpu.navigation.markers import Marker, MarkerType, MarkersControl
from invesalius3_tpu.navigation.navigation import Navigation, NavigationHub
from invesalius3_tpu.navigation.robot import Robot, RobotObjective
from invesalius3_tpu.navigation.tracker import (
    TRACKER_DEBUG_APPROACH,
    TRACKER_DEBUG_RANDOM,
    Tracker,
)
from invesalius3_tpu.ops import transforms as tr


def test_debug_tracker_poll_loop():
    t = Tracker()
    assert t.connect(TRACKER_DEBUG_RANDOM, poll_hz=500)
    time.sleep(0.05)
    coords, flags = t.get_coordinates()
    assert coords.shape == (3, 6)
    assert flags.all()
    assert coords.any()  # receiver thread delivered something
    t.set_tracker_fiducial(0)
    t.set_tracker_fiducial(1)
    t.set_tracker_fiducial(2)
    assert t.are_fiducials_set()
    t.disconnect()
    assert not t.connected


def test_pose_matrix_roundtrip():
    pose = np.array([10.0, -5.0, 30.0, 20.0, -40.0, 65.0])
    m = coreg.pose_to_matrix(pose)
    back = coreg.matrix_to_pose(m)
    np.testing.assert_allclose(back, pose, atol=1e-9)


def test_corregistrate_probe_static_and_dynamic():
    m_change = tr.euler_matrix(0.1, 0.2, 0.3)
    m_change[:3, 3] = [5, 6, 7]
    probe = np.array([1.0, 2.0, 3.0, 10.0, 20.0, 30.0])
    m_img = coreg.corregistrate_probe(m_change, probe, ref_pose=None)
    want = m_change @ coreg.pose_to_matrix(probe)
    np.testing.assert_allclose(m_img, want, atol=1e-12)
    # dynamic: identical probe and reference -> pose relative to ref is I
    m_img2 = coreg.corregistrate_probe(m_change, probe, ref_pose=probe)
    np.testing.assert_allclose(m_img2, m_change, atol=1e-9)


def test_image_to_tracker_inverts_corregistrate():
    m_change = tr.euler_matrix(0.3, -0.1, 0.2)
    m_change[:3, 3] = [4, -2, 9]
    target_img = np.array([12.0, 34.0, 56.0, 5.0, 10.0, 15.0])
    m_trk = coreg.image_to_tracker(m_change, target_img)
    # going back through the probe path recovers the image pose
    pose_trk = coreg.matrix_to_pose(m_trk)
    m_img = coreg.corregistrate_probe(m_change, pose_trk)
    np.testing.assert_allclose(m_img, coreg.pose_to_matrix(target_img), atol=1e-6)


def test_full_navigation_session():
    """End-to-end: fake tracker -> fiducial registration -> start ->
    scene updates arrive on the bus -> stop (reference StartNavigation
    pipeline with the debug tracker seam)."""
    bus = events.Publisher()
    nav = Navigation(bus=bus)
    assert nav.tracker.connect(TRACKER_DEBUG_APPROACH, poll_hz=500)
    time.sleep(0.05)

    # image fiducials: a known rigid transform of the tracker ones
    m_true = tr.euler_matrix(0.1, -0.2, 0.15)
    m_true[:3, 3] = [3.0, -7.0, 11.0]
    for i in range(3):
        nav.tracker.set_tracker_fiducial(i)
        time.sleep(0.02)
    trk = nav.tracker.tracker_fiducials[:, :3]
    img = (np.c_[trk, np.ones(3)] @ m_true.T)[:, :3]
    for i in range(3):
        nav.image.set(i, img[i])

    fre = nav.estimate_tracker_to_image_transform()
    assert fre < 1e-6  # exact rigid correspondence
    np.testing.assert_allclose(nav.m_change, m_true, atol=1e-6)

    got = []
    bus.subscribe(lambda **kw: got.append(kw), "navigation.update_scene")
    nav.start_navigation(poll_hz=200)
    time.sleep(0.3)
    nav.stop_navigation()
    assert len(got) >= 3
    assert "probe_pose_img" in got[0]
    nav.tracker.disconnect()


def test_navigation_spawns_tract_and_efield_workers():
    """start_navigation fans the coreg pose out to optional tract/e-field
    side workers (reference navigation.py:589 StartNavigation spawns
    coreg -> [serial, tracts, e-field] -> UpdateNavigationScene)."""
    bus = events.Publisher()
    nav = Navigation(bus=bus)
    assert nav.tracker.connect(TRACKER_DEBUG_APPROACH, poll_hz=500)
    time.sleep(0.05)
    for i in range(3):
        nav.tracker.set_tracker_fiducial(i)
        time.sleep(0.02)
    for i in range(3):
        nav.image.set(i, nav.tracker.tracker_fiducials[i, :3])
    nav.estimate_tracker_to_image_transform()

    shape = (8, 8, 8)
    field = np.zeros(shape + (3,), np.float32)
    field[..., 0] = 1.0  # straight +z streamlines
    nav.tract_params = {
        "direction_field": field,
        "stop_mask": np.ones(shape, bool),
        "n_tracts_total": 4, "n_steps": 5,
        # clamp the probe pose into the tiny grid
        "world_to_vox": lambda p: np.clip(np.asarray(p)[::-1], 1, 6),
    }
    nav.efield_params = {
        "roi_vertices": np.random.default_rng(0).uniform(0, 8, (16, 3)),
        "roi_ids": np.arange(16),
        "debug": True,
    }
    tracts, efields = [], []
    bus.subscribe(lambda **kw: tracts.append(kw), "navigation.tracts")
    bus.subscribe(lambda **kw: efields.append(kw), "navigation.efield")
    nav.start_navigation(poll_hz=200)
    deadline = time.monotonic() + 20.0  # first call compiles the trackers
    while time.monotonic() < deadline and not (tracts and efields):
        time.sleep(0.05)
    nav.stop_navigation()
    nav.tracker.disconnect()
    assert tracts and efields
    paths = np.asarray(tracts[0]["paths"])
    assert paths.shape[1] == 4 and paths.shape[2] == 3
    assert np.asarray(efields[0]["enorms"]).shape == (16,)
    np.testing.assert_array_equal(np.asarray(efields[0]["roi_ids"]),
                                  np.arange(16))


def test_markers_control_roundtrip(tmp_path):
    mc = MarkersControl(bus=events.Publisher())
    m1 = mc.add(Marker(marker_type=MarkerType.FIDUCIAL, position=(1, 2, 3), label="LE"))
    m2 = mc.add(Marker(marker_type=MarkerType.COIL_TARGET, position=(4, 5, 6), label="T1"))
    mc.set_target(m2.marker_id)
    assert mc.target.label == "T1"
    mc.set_target(m1.marker_id)
    assert mc.target.label == "LE" and not m2.is_target

    mc.save_json(tmp_path / "m.json")
    mc2 = MarkersControl(bus=events.Publisher())
    mc2.load_json(tmp_path / "m.json")
    assert len(mc2.markers) == 2
    assert mc2.markers[1].position == (4.0, 5.0, 6.0)

    mc.save_csv(tmp_path / "m.csv")
    mc3 = MarkersControl(bus=events.Publisher())
    mc3.load_csv(tmp_path / "m.csv")
    assert len(mc3.markers) == 2
    assert mc3.markers[0].label == "LE"

    mc.delete(m1.marker_id)
    assert len(mc.markers) == 1


def test_robot_target_flow():
    bus = events.Publisher()
    nav = Navigation(bus=bus)
    nav.tracker.connect(TRACKER_DEBUG_RANDOM, poll_hz=500)
    time.sleep(0.05)
    nav.m_change = np.eye(4)
    nav.use_dynamic_reference = False

    calls = []

    class FakeConnection:
        def update_robot_target(self, robot_id, target):
            calls.append((robot_id, target))

    from invesalius3_tpu.net.neuronavigation_api import NeuronavigationApi

    api = NeuronavigationApi(connection=FakeConnection(), bus=bus)
    robot = Robot("r0", api=api, bus=bus)
    robot.set_objective(RobotObjective.TRACK_TARGET)
    target = np.array([10.0, 20.0, 30.0, 0.0, 0.0, 0.0])
    m_trk = robot.send_target(nav, target)
    assert calls and calls[0][0] == "r0"
    np.testing.assert_allclose(m_trk[:3, 3], [10, 20, 30], atol=1e-9)
    nav.tracker.disconnect()


def test_navigation_hub_composes():
    hub = NavigationHub(bus=events.Publisher())
    assert hub.tracker is hub.navigation.tracker
    assert hub.markers is not None


# ---------------------------------------------------------------------------
# measures
# ---------------------------------------------------------------------------


def test_linear_angular_measures():
    mm = measures.MeasurementManager(bus=events.Publisher())
    m = mm.add_linear((0, 0, 0), (3, 4, 0))
    assert m.value == 5.0
    a = mm.add_angular((1, 0, 0), (0, 0, 0), (0, 1, 0))
    assert abs(a.value - 90.0) < 1e-9
    d = mm.to_dict()
    mm2 = measures.MeasurementManager(bus=events.Publisher())
    mm2.load_dict(d)
    assert len(mm2.measures) == 2


def test_density_measures():
    img = np.zeros((20, 20), np.int16)
    img[5:15, 5:15] = 100
    st = measures.density_ellipse(img, (10, 10), 3, 3)
    assert st["mean"] == 100.0
    st2 = measures.density_polygon(img, [(5, 5), (5, 14), (14, 14), (14, 5)])
    assert st2["mean"] == 100.0
    assert st2["area_px"] > 50


def test_polygon2mask_square():
    mask = measures.polygon2mask((10, 10), [(2, 2), (2, 7), (7, 7), (7, 2)])
    assert mask[4, 4] and not mask[0, 0] and not mask[9, 9]


def test_geodesic_on_strip():
    # two triangles forming a unit square: path corner-to-corner along edges
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    d = measures.geodesic_distance(verts, faces, 0, 2)
    assert abs(d - np.sqrt(2)) < 1e-6  # direct diagonal edge exists


def test_geodesic_disconnected_components_rejected():
    """Picks on different connected components have no surface path —
    add_geodesic must raise (an inf value would serialize as invalid
    JSON, 'Infinity', and poison /api/measures)."""
    import pytest

    # two disjoint triangles
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [5, 5, 0], [6, 5, 0], [5, 6, 0]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    mgr = measures.MeasurementManager()
    with pytest.raises(ValueError, match="different connected components"):
        mgr.add_geodesic(verts, faces, 0, 4)


def test_ray_pick_moller_trumbore():
    # the geodesic tool's camera-ray pick (reference vtkCellPicker role)
    verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0],      # near tri, z=0
                      [0, 0, 5], [2, 0, 5], [0, 2, 5]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    hit = measures.ray_pick(verts, faces, [0.5, 0.5, -3], [0, 0, 1])
    assert hit is not None
    t, fi, vi, point = hit
    assert fi == 0                       # nearest of the two parallel tris
    assert abs(t - 3.0) < 1e-9
    np.testing.assert_allclose(point, [0.5, 0.5, 0.0], atol=1e-9)
    assert vi == 0                       # corner nearest the hit point
    # grazing miss
    assert measures.ray_pick(verts, faces, [5, 5, -3], [0, 0, 1]) is None
    # from the other side the far triangle is hit first
    t2, fi2, _, _ = measures.ray_pick(verts, faces, [0.5, 0.5, 9], [0, 0, -1])
    assert fi2 == 1 and abs(t2 - 4.0) < 1e-9


def test_remote_control_mirror():
    """Internal events mirror out; inbound lines re-publish internally
    (reference remote_control semantics over JSON-lines TCP)."""
    import json
    import socket as sk
    import threading

    from invesalius3_tpu.net.remote_control import RemoteControl

    received = []
    srv = sk.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def server():
        conn, _ = srv.accept()
        buf = b""
        # read one outbound message
        while b"\n" not in buf:
            buf += conn.recv(4096)
        received.append(json.loads(buf.split(b"\n")[0]))
        # send one inbound message
        conn.sendall(json.dumps({"topic": "remote.ping", "data": {"x": 1}}).encode() + b"\n")
        time.sleep(0.2)
        conn.close()

    th = threading.Thread(target=server, daemon=True)
    th.start()

    bus = events.Publisher()
    rc = RemoteControl("127.0.0.1", port, bus=bus)
    inbound = []
    bus.subscribe(lambda **kw: inbound.append(kw), "remote.ping")
    rc.connect()
    bus.send_message("test.topic", value=42)
    th.join(timeout=2)
    time.sleep(0.2)
    rc.disconnect()
    srv.close()
    assert received and received[0]["topic"] == "test.topic"
    assert received[0]["data"]["value"] == 42
    assert inbound == [{"x": 1}]


def test_tracker_state_persistence(tmp_path):
    """Tracker save/load through Session state (reference tracker.py:62-111)."""
    from invesalius3_tpu.core.session import Session

    s = Session(user_dir=tmp_path / "cfg")
    t = Tracker()
    t.connect(TRACKER_DEBUG_RANDOM, poll_hz=500)
    time.sleep(0.05)
    for i in range(3):
        t.set_tracker_fiducial(i)
    t.save_state(s)
    t.disconnect()

    t2 = Tracker()
    assert t2.load_state(s)
    assert t2.connected and t2.tracker_id == TRACKER_DEBUG_RANDOM
    assert t2.are_fiducials_set()
    np.testing.assert_allclose(t2.tracker_fiducials, t.tracker_fiducials)
    t2.disconnect()


def test_icp_state_persistence(tmp_path):
    from invesalius3_tpu.core.session import Session
    from invesalius3_tpu.navigation.navigation import IterativeClosestPoint

    s = Session(user_dir=tmp_path / "cfg")
    icp = IterativeClosestPoint()
    icp.m_icp = np.eye(4) * 2.0
    icp.use_icp = True
    icp.save_state(s)
    icp2 = IterativeClosestPoint()
    icp2.load_state(s)
    assert icp2.use_icp
    np.testing.assert_allclose(icp2.m_icp, icp.m_icp)


def _sphere_mesh(radius=80.0, n=48):
    """Lat-long sphere mesh centred at origin."""
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    verts = radius * np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    ).reshape(-1, 3)
    normals = verts / radius
    return verts, normals


def test_grid_generator_rectangular_on_scalp():
    """Grid targets land on the scalp, oriented tangentially, centred on
    the reference (reference grid_generator.py semantics)."""
    from invesalius3_tpu.navigation.grid import GridGenerator, ScalpGeometry
    from invesalius3_tpu.ops import transforms as tr

    verts, normals = _sphere_mesh()
    scalp = ScalpGeometry(verts, normals=normals)
    ref = Marker(marker_type=MarkerType.COIL_TARGET,
                 position=(0.0, 0.0, 80.0), label="T", z_rotation=10.0,
                 z_offset=0.0)
    gg = GridGenerator(scalp)
    grid = gg.generate_rectangular_grid(ref, rows=3, cols=3, spacing=10.0)
    assert len(grid) == 8  # centre skipped
    assert {m.label for m in grid} == {f"T {r}_{c}" for r in (1, 2, 3)
                                       for c in (1, 2, 3)} - {"T 2_2"}
    for m in grid:
        p = np.array(m.position) * [1, -1, 1]  # view space
        assert abs(np.linalg.norm(p) - 80.0) < 2.0  # on the sphere
        # orientation maps +z onto the local (radial) surface normal,
        # before the 90+z_rotation in-plane twist (which keeps +z fixed)
        mrot = tr.euler_matrix(*np.radians(m.orientation), axes="sxyz")
        zhat = mrot[:3, :3] @ [0, 0, 1]
        np.testing.assert_allclose(zhat, p / np.linalg.norm(p), atol=0.1)
        assert m.marker_type == MarkerType.COIL_TARGET and not m.is_target
        assert m.z_rotation == 10.0


def test_grid_generator_circular_counts_and_offset():
    from invesalius3_tpu.navigation.grid import GridGenerator, ScalpGeometry

    verts, normals = _sphere_mesh()
    scalp = ScalpGeometry(verts, normals=normals)
    ref = Marker(marker_type=MarkerType.COIL_TARGET,
                 position=(0.0, 0.0, 80.0), label="C", z_offset=5.0)
    gg = GridGenerator(scalp)
    grid = gg.generate_circular_grid(ref, rings=2, points_per_ring=6,
                                     spacing=8.0)
    assert len(grid) == 12
    for m in grid:
        p = np.array(m.position) * [1, -1, 1]
        # z_offset lifts targets ~5mm off the sphere along the local normal
        assert 82.0 < np.linalg.norm(p) < 88.0
    with pytest.raises(ValueError):
        gg.generate_rectangular_grid(ref, rows=101, cols=2, spacing=1.0)


def test_grid_generator_degenerate_and_csv_fields(tmp_path):
    """1x1 grid is just the skipped centre -> empty, no crash; CSV IO
    round-trips the coil z_rotation/z_offset fields."""
    from invesalius3_tpu.navigation.grid import GridGenerator, ScalpGeometry

    verts, normals = _sphere_mesh()
    gg = GridGenerator(ScalpGeometry(verts, normals=normals))
    ref = Marker(marker_type=MarkerType.COIL_TARGET, position=(0, 0, 80.0),
                 label="M", z_rotation=15.0, z_offset=2.0)
    assert gg.generate_rectangular_grid(ref, 1, 1, 5.0) == []
    assert gg.generate_circular_grid(ref, 0, 6, 4.0) == []

    mc = MarkersControl(bus=events.Publisher())
    mc.add(ref)
    mc.save_csv(tmp_path / "m.csv")
    mc2 = MarkersControl(bus=events.Publisher())
    mc2.load_csv(tmp_path / "m.csv")
    assert mc2.markers[0].z_rotation == 15.0
    assert mc2.markers[0].z_offset == 2.0


# ---------------------------------------------------------------------------
# vendor pose converters (reference coordinates.py:139-511)
# ---------------------------------------------------------------------------
def test_quaternion_pose_roundtrip():
    from invesalius3_tpu.navigation import vendor_coords as vc
    from invesalius3_tpu.ops import transforms as tr

    # build a quaternion from known rzyx eulers; converter must recover them
    a, b, g = np.radians([30.0, -40.0, 75.0])
    m = tr.euler_matrix(a, b, g, axes="rzyx")
    q = tr.quaternion_from_matrix(m)
    pose = vc.quaternion_pose(q, [10.0, -5.0, 2.5])
    np.testing.assert_allclose(pose[:3], [10.0, -5.0, 2.5])
    np.testing.assert_allclose(pose[3:], [30.0, -40.0, 75.0], atol=1e-6)


def test_parse_polaris_p4():
    from invesalius3_tpu.navigation import vendor_coords as vc

    assert vc.parse_polaris_p4("01MISSING_WHATEVER") is None
    # identity quaternion (1, 0, 0, 0) and translation (12.34, -5.00, 0.07)
    rec = "01" + "+10000" + "+00000" + "+00000" + "+00000" + \
          "+001234" + "-000500" + "+000007"
    pose = vc.parse_polaris_p4(rec)
    np.testing.assert_allclose(pose[:3], [12.34, -5.0, 0.07])
    np.testing.assert_allclose(pose[3:], [0, 0, 0], atol=1e-9)


def test_optitrack_pose_permutation():
    from invesalius3_tpu.navigation import vendor_coords as vc

    pose = vc.optitrack_pose(1, 0, 0, 0, 0.1, 0.2, 0.3)
    np.testing.assert_allclose(pose[:3], [300.0, 100.0, 200.0])  # m->mm, zxy
    np.testing.assert_allclose(pose[3:], [0, 0, 0], atol=1e-9)


def test_polhemus_conversions():
    from invesalius3_tpu.navigation import vendor_coords as vc

    p = vc.polhemus_usb_pose([1.0, 2.0, 3.0, 10.0, 20.0, 30.0], True)
    np.testing.assert_allclose(p, [10.0, 20.0, -30.0, 10.0, 20.0, 30.0])
    p = vc.polhemus_usb_pose([1.0, 0, 0, 0, 0, 0], False)
    np.testing.assert_allclose(p[0], 25.4)  # inches
    line = b"1 1.5-2.5 3.0 10.0 0.0 0.0"
    p = vc.parse_polhemus_serial(line)
    np.testing.assert_allclose(p, [15.0, -25.0, 30.0, 10.0, 0.0, 0.0])


def test_polhemus_dynamic_pose_identity_reference():
    from invesalius3_tpu.navigation import vendor_coords as vc

    probe = np.array([10.0, 5.0, 2.0, 1.0, 2.0, 3.0])
    ref = np.zeros(6)
    out = vc.polhemus_dynamic_pose(probe, ref)
    np.testing.assert_allclose(out, [10.0, 5.0, -2.0, 1.0, 2.0, 3.0])


# ---------------------------------------------------------------------------
# MEP motor mapping as data (reference mep_visualizer.py)
# ---------------------------------------------------------------------------
def test_mep_interpolation_and_colormap():
    from invesalius3_tpu.navigation import mep

    verts = np.array([[0, 0, 0], [1, 0, 0], [10, 0, 0]], np.float32)
    pts = np.array([[0, 0, 0]], np.float32)
    vals = np.array([800.0], np.float32)
    field = mep.interpolate_mep_surface(verts, pts, vals,
                                        {"gaussian_radius": 3.0})
    assert abs(field[0] - 800.0) < 1e-3       # on the point
    assert abs(field[1] - 800.0) < 1e-3       # single source in range
    assert field[2] == 0.0                    # out of radius
    colors = mep.mep_colors(field)
    assert colors.shape == (3, 3)
    # out-of-range vertex renders cortex gray
    np.testing.assert_allclose(colors[2], mep.CORTEX_COLOR, atol=1e-6)
    # 800 uV sits between mid (600) and max (1000) anchors
    cmap = mep.MEP_COLORMAPS["Viridis"]
    lo = np.minimum(cmap["mid"], cmap["max"])
    hi = np.maximum(cmap["mid"], cmap["max"])
    assert ((colors[0] >= lo - 1e-6) & (colors[0] <= hi + 1e-6)).all()


def test_mep_mapper_with_markers_and_session(tmp_path):
    from invesalius3_tpu.core.session import Session
    from invesalius3_tpu.navigation import mep
    from invesalius3_tpu.navigation.markers import Marker

    s = Session(user_dir=tmp_path / "cfg")
    mapper = mep.MEPMapper.from_session(s)
    mapper.config["mep_colormap"] = "GreenYellowOrangeRed"
    mapper.save_to_session(s)
    mapper2 = mep.MEPMapper.from_session(Session(user_dir=tmp_path / "cfg"))
    assert mapper2.config["mep_colormap"] == "GreenYellowOrangeRed"

    verts = np.zeros((5, 3), np.float32)
    markers = [Marker(position=(0, 0, 0), mep_value=500.0),
               Marker(position=(1, 1, 1))]  # no MEP value -> skipped
    out = mapper2.map_markers(verts, markers)
    assert out["values"].shape == (5,) and out["colors"].shape == (5, 3)
    assert out["values"].max() > 0


# ---------------------------------------------------------------------------
# Polhemus serial protocol driver + replay transport (reference
# coordinates.py:467 PolhemusSerialCoord, tracker_connection.py:264)
# ---------------------------------------------------------------------------


def test_polhemus_serial_replay_protocol():
    from invesalius3_tpu.navigation import serial_drivers as sd

    poses = [
        ((2.54, -3.10, 10.0, 15.0, -20.0, 30.0),
         (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
        ((3.54, -2.10, 11.0, 16.0, -21.0, 31.0),
         (1.0, -1.0, 0.5, 5.0, 0.0, 0.0)),
    ]
    transcript = sd.make_isotrak_transcript(poses)
    tp = sd.ReplayTransport(transcript, loop=False)
    conn = sd.PolhemusSerialConnection(tp, model="isotrak", ref_mode=True)
    assert conn.connect()  # init bytes u/F/Y verified against transcript
    coords, flags = conn.get_coordinates()
    assert flags[0] and flags[1] and not flags[2]
    # identity reference: probe passes through with cm->mm and z negation
    np.testing.assert_allclose(coords[0, :3], [25.4, -31.0, -100.0])
    np.testing.assert_allclose(coords[0, 3:], [15.0, -20.0, 30.0])
    coords2, _ = conn.get_coordinates()
    assert coords2[1, 0] == 10.0  # reference pose in mm
    assert not np.allclose(coords2[0], coords[0])


def test_polhemus_protocol_mismatch_detected():
    from invesalius3_tpu.navigation import serial_drivers as sd

    transcript = sd.make_isotrak_transcript([((1, 2, 3, 0, 0, 0),
                                              (0, 0, 0, 0, 0, 0))],
                                            model="fastrak")
    conn = sd.PolhemusSerialConnection(sd.ReplayTransport(transcript),
                                       model="isotrak")
    with pytest.raises(AssertionError):  # isotrak sends Y, fastrak capture
        conn.connect()


def test_polhemus_negative_field_abutting():
    from invesalius3_tpu.navigation import vendor_coords

    line = b"1 2.54-3.10 10.00 15.00-20.00 30.00\r\n"
    pose = vendor_coords.parse_polhemus_serial(line)
    np.testing.assert_allclose(pose, [25.4, -31.0, 100.0, 15.0, -20.0, 30.0])


def test_navigation_pipeline_on_replayed_capture():
    """The full navigation stack (poll thread -> shared coords ->
    fiducials) running on a replayed byte capture (VERDICT r2 item 9)."""
    from invesalius3_tpu.navigation import serial_drivers as sd
    from invesalius3_tpu.navigation.tracker import TRACKER_POLHEMUS_SERIAL

    poses = [((float(i), float(-i), 10.0 + i, 0.0, 0.0, 0.0),
              (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)) for i in range(1, 9)]
    transcript = sd.make_isotrak_transcript(poses)

    t = Tracker()
    assert t.connect(TRACKER_POLHEMUS_SERIAL, poll_hz=500,
                     transcript=transcript)
    time.sleep(0.1)
    coords, flags = t.get_coordinates()
    assert flags[0]
    # replayed poses (cm->mm, z negated by dynamic reference vs identity)
    assert coords[0, 0] in [p[0][0] * 10.0 for p in poses]
    assert coords[0, 2] < 0
    t.disconnect()


# ---------------------------------------------------------------------------
# NDI Polaris Combined-API driver (reference tracker_connection.py:386,
# coordinates.py:139 PolarisP4Coord — there via the closed pypolaris SWIG
# wrapper; here at wire-protocol level with CRC16 framing)
# ---------------------------------------------------------------------------


def _polaris_frames():
    ident = (1.0, 0.0, 0.0, 0.0)
    yaw90 = (0.7071, 0.0, 0.0, 0.7071)  # 90 deg about z
    return [
        [(ident, (10.0, -20.0, 30.0)),
         (ident, (0.0, 0.0, 0.0)),
         (yaw90, (5.0, 5.0, 5.0))],
        [(ident, (11.0, -21.0, 31.0)),
         None,  # reference occluded this frame
         (yaw90, (6.0, 6.0, 6.0))],
    ]


def test_polaris_ndi_replay_protocol():
    from invesalius3_tpu.navigation import serial_drivers as sd

    transcript = sd.make_polaris_transcript(_polaris_frames())
    tp = sd.ReplayTransport(transcript, loop=False)
    conn = sd.NDIPolarisConnection(tp)
    assert conn.connect()  # INIT/PHSR/PINIT/PENA/TSTART verified byte-exact
    assert conn.handles == ["0A", "0B", "0C"]
    coords, flags = conn.get_coordinates()
    assert flags.tolist() == [True, True, True]
    np.testing.assert_allclose(coords[0], [10.0, -20.0, 30.0, 0, 0, 0],
                               atol=1e-6)
    # yaw-90 tool: rzyx euler -> (90, 0, 0) degrees
    np.testing.assert_allclose(coords[2, :3], [5.0, 5.0, 5.0])
    np.testing.assert_allclose(coords[2, 3], 90.0, atol=0.1)
    coords2, flags2 = conn.get_coordinates()
    assert flags2.tolist() == [True, False, True]  # MISSING handled
    np.testing.assert_allclose(coords2[1], np.zeros(6))
    np.testing.assert_allclose(coords2[0, :3], [11.0, -21.0, 31.0])


def test_polaris_rom_tool_definition_upload():
    """Wireless-tool .rom upload (reference ships vendor ROMs under
    navigation/ndi_files): PHRQ handle request + chunked PVWR pages,
    byte-exact on the replay transport, then normal tracking."""
    from invesalius3_tpu.navigation import serial_drivers as sd

    roms = [bytes(range(256)) * 3, b"\x55" * 100, b"\xAA" * 64]
    transcript = sd.make_polaris_transcript(_polaris_frames(),
                                            rom_files=roms)
    tp = sd.ReplayTransport(transcript, loop=False)
    conn = sd.NDIPolarisConnection(tp, rom_files=roms)
    assert conn.connect()  # INIT/PHRQ/PVWR*/PINIT/PENA/TSTART byte-exact
    assert conn.handles == ["0A", "0B", "0C"]
    coords, flags = conn.get_coordinates()
    assert flags.tolist() == [True, True, True]
    np.testing.assert_allclose(coords[0, :3], [10.0, -20.0, 30.0])


def test_polaris_reply_crc_verified():
    from invesalius3_tpu.navigation import serial_drivers as sd

    transcript = sd.make_polaris_transcript(_polaris_frames())
    # corrupt one byte of the INIT reply body: CRC check must trip
    okay = bytes.fromhex(transcript[0]["lines"][0])
    transcript[0]["lines"][0] = (b"OKAX" + okay[4:]).hex()
    conn = sd.NDIPolarisConnection(sd.ReplayTransport(transcript))
    with pytest.raises(AssertionError):
        conn.connect()


def test_polaris_device_error_raised():
    from invesalius3_tpu.navigation import serial_drivers as sd

    transcript = sd.make_polaris_transcript(_polaris_frames())
    body = b"ERROR01"
    transcript[0]["lines"][0] = (
        body + f"{sd.crc16_ndi(body):04X}".encode() + b"\r").hex()
    conn = sd.NDIPolarisConnection(sd.ReplayTransport(transcript))
    with pytest.raises(sd.NDIProtocolError):
        conn.connect()


def test_polaris_via_tracker_factory():
    from invesalius3_tpu.navigation import serial_drivers as sd
    from invesalius3_tpu.navigation.tracker import TRACKER_POLARIS_NDI

    transcript = sd.make_polaris_transcript(_polaris_frames())
    t = Tracker()
    assert t.connect(TRACKER_POLARIS_NDI, poll_hz=500, transcript=transcript)
    time.sleep(0.05)
    coords, flags = t.get_coordinates()
    assert flags[0]
    assert coords[0, 0] in (10.0, 11.0)
    t.disconnect()


# ---------------------------------------------------------------------------
# mTMS offset -> stimulation-parameter mapping (reference mtms.py:11-127)
# ---------------------------------------------------------------------------


def _write_pp_file(path, offsets):
    lines = [f"# header {i}" for i in range(18)]
    for off in offsets:
        key = "_".join(str(int(x)) for x in off)
        lines.append(f"{key}\tcap1\tcap2")
    path.write_text("\n".join(lines) + "\n")


def test_mtms_offset_quantization():
    from invesalius3_tpu.navigation.mtms import offset_from_distance

    # GetOffset: [-round(dy), round(dx), round(rz/15)*15]
    assert offset_from_distance([2.4, -1.6, 0, 0, 0, 22.4]) == (2, 2, 15)
    assert offset_from_distance([0.0, 0.0, 0, 0, 0, -8.0]) == (0, 0, -15)
    assert offset_from_distance([-3.0, 1.2, 0, 0, 0, 0.0]) == (-1, -3, 0)


def test_mtms_parameter_lookup_and_pulse(tmp_path):
    from invesalius3_tpu.navigation.mtms import MTMS

    pp = tmp_path / "pp_grid.txt"
    grid = [(x, y, r) for x in (-2, -1, 0, 1, 2)
            for y in (-2, -1, 0, 1, 2) for r in (-15, 0, 15)]
    _write_pp_file(pp, grid)

    fired = []
    m = MTMS(bus=events.Publisher(), parameter_file=pp,
             device=lambda row, inten: fired.append((row, inten)))
    assert m.available
    assert len(m.keys) == len(grid)

    coil = [10.0, 20.0, 30.0, 0.0, 0.0, 0.0]
    target = [11.0, 22.0, 30.0, 0.0, 0.0, 0.0]  # dx=1 dy=2 (pre-flip)
    off = m.get_offset(coil, target)
    key, row = m.find_parameters(off)
    assert row is not None and m.keys[row] == key

    assert m.update_target(coil, target)
    assert fired and fired[0][0] == row + 1  # 1-based device row
    assert m.sequence_log[0]["mTMS_target"] == key

    # off-grid target refused
    far = [60.0, 20.0, 30.0, 0.0, 0.0, 0.0]
    assert not m.update_target(coil, far)
    assert not m.check_targets(coil, [target, far])
    assert m.check_targets(coil, [target])


def test_mtms_sequence_and_log(tmp_path):
    import random

    from invesalius3_tpu.navigation.mtms import MTMS

    pp = tmp_path / "pp.txt"
    _write_pp_file(pp, [(x, y, 0) for x in range(-3, 4) for y in range(-3, 4)])
    fired = []
    m = MTMS(bus=events.Publisher(), parameter_file=pp,
             device=lambda row, inten: fired.append(row))
    coil = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    targets = [[1.0, 0.0, 0.0, 0, 0, 0], [0.0, 2.0, 0.0, 0, 0, 0]]
    sleeps = []
    ok = m.update_target_sequence(coil, targets, number_of_stim=3,
                                  rng=random.Random(0),
                                  sleep=sleeps.append)
    assert ok and len(fired) == 6 and len(sleeps) == 6
    assert all(3.0 <= s < 5.0 for s in sleeps)  # jittered IPI
    out = m.save_sequence(tmp_path)
    rows = out.read_text().strip().split("\n")
    assert len(rows) == 7 and rows[0].startswith("mTMS_target")


def test_camera_tracker_seam():
    """Reference coordinates.py:288 CameraCoord: duck-typed external
    camera object with Run() -> (coords, probe_vis, ref_vis, coil_vis)."""
    from invesalius3_tpu.navigation.tracker import TRACKER_CAMERA

    class FakeCamera:
        def Run(self):
            return ([[1, 2, 3, 0, 0, 0], [4, 5, 6, 0, 0, 0]],
                    True, True, False)

    t = Tracker()
    assert t.connect(TRACKER_CAMERA, poll_hz=500, camera=FakeCamera())
    time.sleep(0.05)
    coords, flags = t.get_coordinates()
    assert coords[0, 0] == 1 and coords[1, 2] == 6
    assert flags.tolist() == [True, True, False]
    t.disconnect()


def test_remote_event_server_roundtrip():
    """The dev event server (reference scripts/invesalius_server.py
    equivalent): records mirrored events and injects events back into the
    app's bus through a live RemoteControl connection."""
    from invesalius3_tpu.net.remote_control import RemoteControl
    from invesalius3_tpu.net.remote_server import RemoteEventServer

    srv = RemoteEventServer().start()
    bus = events.Publisher()
    rc = RemoteControl("127.0.0.1", srv.port, bus=bus)
    assert rc.connect(timeout=5.0)
    try:
        got = []
        bus.subscribe(lambda **kw: got.append(kw), "remote.cmd")

        bus.send_message("markers.added", index=3, value=1.5)
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline and not srv.received:
            time.sleep(0.02)
        assert srv.received and srv.received[0]["topic"] == "markers.added"
        assert srv.received[0]["data"]["index"] == 3

        assert srv.send("remote.cmd", action="go") == 1
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline and not got:
            time.sleep(0.02)
        assert got and got[0]["action"] == "go"
    finally:
        rc.disconnect()
        srv.stop()


def test_optitrack_natnet_replay():
    """NatNet FrameOfMocapData wire round trip -> InVesalius frame
    (reference coordinates.py:183 OptitrackCoord conversions)."""
    import numpy as np

    from invesalius3_tpu.navigation import tracker as trk
    from invesalius3_tpu.navigation.serial_drivers import (
        make_natnet_frame, parse_natnet_frame)
    from invesalius3_tpu.navigation.vendor_coords import optitrack_pose

    bodies = [
        {"id": 1, "pos": (0.10, 0.02, -0.05),
         "quat": (0.0, 0.0, 0.0, 1.0), "tracked": True},
        {"id": 2, "pos": (0.00, 0.00, 0.00),
         "quat": (0.0, 0.7071068, 0.0, 0.7071068), "tracked": True},
        {"id": 3, "pos": (0.01, 0.01, 0.01),
         "quat": (0.0, 0.0, 0.0, 1.0), "tracked": False},
    ]
    frame = make_natnet_frame(bodies)
    parsed = parse_natnet_frame(frame)
    assert [b["id"] for b in parsed] == [1, 2, 3]
    assert parsed[0]["tracked"] and not parsed[2]["tracked"]

    conn = trk.create_tracker_connection("optitrack", frames=[frame])
    assert conn.connect()
    coords, flags = conn.get_coordinates()
    assert list(flags) == [True, True, False]
    want0 = optitrack_pose(1.0, 0.0, 0.0, 0.0, 0.10, 0.02, -0.05)
    np.testing.assert_allclose(coords[0], want0, atol=1e-5)
    # probe position: Motive (x,y,z) m -> (z,x,y) mm
    np.testing.assert_allclose(coords[0][:3], [-50.0, 100.0, 20.0],
                               atol=1e-3)
    conn.disconnect()


def test_claron_replay_sdk_surface():
    """MicronTracker driver speaks the pyclaron attribute API exactly
    (reference coordinates.py:283 ClaronCoord); replay stand-in supplies
    recorded poses."""
    import numpy as np

    from invesalius3_tpu.navigation import tracker as trk

    poses = [[[10.0, 20.0, 30.0, 5.0, -3.0, 1.0],
              [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
              [1.0, 2.0, 3.0, 0.5, 0.5, 0.5]]]
    conn = trk.create_tracker_connection("claron_mtc", poses=poses)
    assert conn.connect()
    coords, flags = conn.get_coordinates()
    assert flags.all()
    np.testing.assert_allclose(coords[0], [10.0, 20.0, 30.0, 5.0, -3.0, 1.0])
    np.testing.assert_allclose(coords[2], [1.0, 2.0, 3.0, 0.5, 0.5, 0.5])
    conn.disconnect()
