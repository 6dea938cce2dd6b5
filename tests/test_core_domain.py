"""Slice facade, Mask history, Project .inv3 round-trip, Session
persistence, and the CLI end-to-end flow."""

import numpy as np
import pytest

from invesalius3_tpu import constants as const
from invesalius3_tpu.core.mask import Mask, _next_copy_name
from invesalius3_tpu.core.project import Project
from invesalius3_tpu.core.session import Session
from invesalius3_tpu.core.slice import Slice
from invesalius3_tpu.core.volume import Volume

rng = np.random.default_rng(5)


def _volume(shape=(16, 20, 24)):
    ct = rng.integers(-1000, 2000, shape).astype(np.int16)
    return Volume.from_numpy(ct, spacing=(0.5, 0.6, 0.7))


def test_slice_create_mask_and_threshold():
    vol = _volume()
    slc = Slice(vol)
    m = slc.create_new_mask(threshold_range=(226, 3071))
    arr = np.asarray(m.data)
    want = ((np.asarray(vol.data) >= 226) & (np.asarray(vol.data) <= 3071)) * 255
    np.testing.assert_array_equal(arr, want.astype(np.uint8))

    # re-threshold preserves editor codes
    m.data = m.data.at[0, 0, 0].set(254)
    slc.set_mask_threshold(500, 1000)
    assert int(np.asarray(m.data)[0, 0, 0]) == 254


def test_mask_undo_redo():
    vol = _volume((8, 8, 8))
    slc = Slice(vol)
    m = slc.create_new_mask(threshold_range=(0, 1000))
    before = np.asarray(m.data).copy()
    slc.set_mask_threshold(500, 600)
    after = np.asarray(m.data).copy()
    assert m.undo()
    np.testing.assert_array_equal(np.asarray(m.data), before)
    assert m.redo()
    np.testing.assert_array_equal(np.asarray(m.data), after)
    # history bounded at 50
    for _ in range(60):
        m.apply(m.data)
    assert len(m.history._undo) == 50


def test_slice_rendered_slice():
    vol = _volume()
    slc = Slice(vol)
    slc.create_new_mask(threshold_range=(226, 3071))
    img = slc.get_rendered_slice("AXIAL", 4)
    assert img.shape == (20, 24, 3) and img.dtype == np.uint8
    for proj in (const.PROJECTION_MaxIP, const.PROJECTION_MIDA, const.PROJECTION_LMIP):
        slc.projection_type = proj
        slc.n_slabs = 4
        out = slc.get_image_slice("AXIAL", 2, 4)
        assert out.shape == (20, 24)


def test_project_inv3_roundtrip(tmp_path):
    vol = _volume()
    slc = Slice(vol)
    m = slc.create_new_mask(threshold_range=(226, 3071))
    surf = slc.create_surface_from_mask()
    proj = Project()
    proj.volume = vol
    proj.name = "TestPatient"
    proj.add_mask(m)
    proj.add_surface(surf)

    p = tmp_path / "test.inv3"
    proj.save(p)
    loaded = Project.open(p)
    assert loaded.name == "TestPatient"
    np.testing.assert_array_equal(np.asarray(loaded.volume.data), np.asarray(vol.data))
    np.testing.assert_allclose(loaded.spacing, vol.spacing)
    lm = list(loaded.mask_dict.values())[0]
    np.testing.assert_array_equal(np.asarray(lm.data), np.asarray(m.data))
    assert lm.threshold_range == tuple(m.threshold_range)
    ls = list(loaded.surface_dict.values())[0]
    assert len(ls.faces) == len(surf.faces)


def test_project_inv3_compressed_roundtrip(tmp_path):
    vol = _volume((8, 8, 8))
    proj = Project()
    proj.volume = vol
    proj.name = "Z"
    p = tmp_path / "z.inv3"
    proj.save(p, compress=True)
    loaded = Project.open(p)
    np.testing.assert_array_equal(np.asarray(loaded.volume.data), np.asarray(vol.data))


def test_project_exports(tmp_path):
    import h5py

    vol = _volume((8, 8, 8))
    slc = Slice(vol)
    m = slc.create_new_mask(threshold_range=(0, 2000))
    proj = Project()
    proj.volume = vol
    proj.add_mask(m)
    proj.export_to_hdf5(tmp_path / "p.h5")
    with h5py.File(tmp_path / "p.h5") as f:
        np.testing.assert_array_equal(f["image"][:], np.asarray(vol.data))
        assert str(m.index) in f["masks"]
    proj.export_to_nifti(tmp_path / "p.nii")
    from invesalius3_tpu.io.nifti import read_nifti

    img = read_nifti(tmp_path / "p.nii")
    np.testing.assert_array_equal(img.data, np.asarray(vol.data))


def test_session_crash_detection_and_backup(tmp_path):
    s = Session(user_dir=tmp_path / "cfg")
    assert s.exited_successfully_last_time()
    s.mark_running()
    # simulate crash: new session sees non-clean exit
    s2 = Session(user_dir=tmp_path / "cfg")
    assert not s2.exited_successfully_last_time()
    s2.exit()
    s3 = Session(user_dir=tmp_path / "cfg")
    assert s3.exited_successfully_last_time()


def test_session_config_and_recents(tmp_path):
    s = Session(user_dir=tmp_path / "cfg")
    s.set_config("language", "pt")
    s.add_recent_project("/tmp/a.inv3", "A")
    s.add_recent_project("/tmp/b.inv3", "B")
    s.add_recent_project("/tmp/a.inv3", "A")  # dedup to front
    s2 = Session(user_dir=tmp_path / "cfg")
    assert s2.get_config("language") == "pt"
    assert s2.recent_projects[0][0] == "/tmp/a.inv3"
    assert len(s2.recent_projects) == 2


def test_session_auto_backup(tmp_path):
    s = Session(user_dir=tmp_path / "cfg")
    vol = _volume((4, 4, 4))
    proj = Project()
    proj.volume = vol
    proj.name = "bk"
    s.mark_running()
    s.create_auto_backup(proj, interval_s=0.2)
    import time

    time.sleep(0.8)
    s.stop_auto_backup()
    # crash now: recovery should find the backup
    s2 = Session(user_dir=tmp_path / "cfg")
    path = s2.recover_auto_backup()
    assert path is not None and path.exists()
    rec = Project.open(path)
    np.testing.assert_array_equal(np.asarray(rec.volume.data), np.asarray(vol.data))


def test_next_copy_name():
    assert _next_copy_name("Mask 1") == "Mask 1 copy"
    assert _next_copy_name("Mask 1 copy", ["Mask 1 copy"]) == "Mask 1 copy#1"
    assert _next_copy_name("Mask 1 copy#2", ["Mask 1 copy#2"]) == "Mask 1 copy#3"


def test_cli_end_to_end(tmp_path):
    """The reference's canonical headless flow: -i DIR -t Bone -e out.stl
    -s proj.inv3 (reference app.py use_cmd_optargs)."""
    from invesalius3_tpu import app
    from invesalius3_tpu.io import dicom

    # build a small synthetic DICOM series with a bone cube
    ddir = tmp_path / "dicom"
    ddir.mkdir()
    for i in range(12):
        px = np.full((32, 32), -1000, np.int16)
        if 3 <= i < 9:
            px[10:22, 10:22] = 1500
        dicom.write_dicom(
            ddir / f"s{i:02d}.dcm", px,
            {
                "PatientID": "P", "Modality": "CT",
                "SeriesInstanceUID": "1.2.3", "StudyInstanceUID": "1.2",
                "InstanceNumber": i + 1,
                "ImagePositionPatient": [0, 0, float(i)],
                "ImageOrientationPatient": [1, 0, 0, 0, 1, 0],
                "PixelSpacing": [1.0, 1.0],
                "RescaleSlope": 1.0, "RescaleIntercept": 0.0,
            },
        )
    out_stl = tmp_path / "out.stl"
    out_proj = tmp_path / "p.inv3"
    import os

    os.environ["XDG_CONFIG_HOME"] = str(tmp_path / "xdg")
    rc = app.main(["-i", str(ddir), "-t", "226,3071", "-e", str(out_stl),
                   "-s", str(out_proj)])
    assert rc == 0
    assert out_stl.exists() and out_proj.exists()

    from invesalius3_tpu.io import mesh_io
    from invesalius3_tpu.ops import mesh as mesh_ops

    verts, faces = mesh_io.read_stl(out_stl)
    vol, _ = mesh_ops.mass_properties(verts.astype(np.float32), faces)
    assert abs(float(vol) - 12 * 12 * 6) / (12 * 12 * 6) < 0.15  # bone cube mm^3

    loaded = Project.open(out_proj)
    assert loaded.volume.shape == (12, 32, 32)
    assert len(loaded.mask_dict) == 1


def test_cli_import_all_exports_every_series(tmp_path):
    """--import-all exports one surface per DICOM series, suffixed by the
    series (reference app.py:490-497 loop over all groups)."""
    from invesalius3_tpu import app
    from invesalius3_tpu.io import dicom

    ddir = tmp_path / "dicom"
    ddir.mkdir()
    for suid in ("1.2.3", "1.2.4"):
        for i in range(8):
            px = np.full((24, 24), -1000, np.int16)
            if 2 <= i < 6:
                px[8:16, 8:16] = 1500
            dicom.write_dicom(
                ddir / f"{suid}_{i:02d}.dcm", px,
                {
                    "PatientID": "P", "Modality": "CT",
                    "SeriesInstanceUID": suid, "StudyInstanceUID": "1.2",
                    "InstanceNumber": i + 1,
                    "ImagePositionPatient": [0, 0, float(i)],
                    "ImageOrientationPatient": [1, 0, 0, 0, 1, 0],
                    "PixelSpacing": [1.0, 1.0],
                    "RescaleSlope": 1.0, "RescaleIntercept": 0.0,
                },
            )
    import os

    os.environ["XDG_CONFIG_HOME"] = str(tmp_path / "xdg")
    out = tmp_path / "all.stl"
    rc = app.main(["-i", str(ddir), "--import-all", "-t", "226,3071",
                   "-e", str(out)])
    assert rc == 0
    stls = sorted(tmp_path.glob("all_*.stl"))
    assert len(stls) == 2  # one per series
    for p in stls:
        assert p.stat().st_size > 84  # non-empty binary STL


def test_project_from_matrix(tmp_path):
    """Plugin/scripting entry point (reference control.py:1033): project
    from a numpy array with range-derived window, .inv3 round trip."""
    import numpy as np
    from invesalius3_tpu.core.project import Project

    m = np.zeros((8, 8, 8), np.int16)
    m[2:6, 2:6, 2:6] = 1000
    proj = Project.from_matrix("frommat", m, spacing=(0.5, 0.5, 2.0))
    assert proj.window == 1000.0 and proj.level == 500.0
    assert proj.volume.spacing == (0.5, 0.5, 2.0)
    slc = proj.make_slice()
    assert slc.matrix.shape == (8, 8, 8)
    p = tmp_path / "m.inv3"
    proj.save(p)
    loaded = Project.open(p)
    np.testing.assert_array_equal(np.asarray(loaded.volume.data), m)
    assert loaded.name == "frommat"


def test_cli_shell_exposes_app_context(tmp_path, monkeypatch, capsys):
    """--shell drops into a REPL with the live app objects (the headless
    analog of the reference's embedded console, gui/interactive_shell.py).
    Drive it with scripted stdin: create a mask through ``slc`` and print
    its voxel count."""
    import io as _io
    import os
    import sys

    from invesalius3_tpu import app
    from invesalius3_tpu.io import nifti

    ct = np.full((16, 16, 16), -1000, np.int16)
    ct[4:12, 4:12, 4:12] = 1500
    src = tmp_path / "cube.nii.gz"
    nifti.write_nifti(src, ct, spacing=(1.0, 1.0, 1.0))
    os.environ["XDG_CONFIG_HOME"] = str(tmp_path / "xdg")
    script = (
        "m = slc.create_new_mask(threshold_range=(226, 3071))\n"
        "print('SHELL_COUNT', int(np.asarray(m.visible_array()).sum()))\n"
    )
    monkeypatch.setattr(sys, "stdin", _io.StringIO(script))
    rc = app.main(["--import-file", str(src), "--shell"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "SHELL_COUNT 512" in out  # 8^3 bone cube
