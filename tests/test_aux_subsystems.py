"""Aux subsystems: logging/spans, error taxonomy + crash reports, plugins,
pedal, e-field, tractography, DL segmenter glue."""

import logging
import queue

import numpy as np
import pytest

from invesalius3_tpu import events
from invesalius3_tpu.utils import errors, logging as ilog, paths, plugins


def test_logging_ring_and_span(tmp_path):
    logger = ilog.setup_logging(level=logging.DEBUG, log_dir=tmp_path, console=False)
    logger.info("hello")
    with ilog.span("stage1"):
        pass
    lines = ilog.recent_log_lines()
    assert any("hello" in ln for ln in lines)
    assert any("[PERF] stage1" in ln for ln in lines)
    rep = ilog.perf_report()
    assert rep and rep[-1]["name"] == "stage1"
    assert (tmp_path / "invesalius3_tpu.log").exists()


def test_timing_decorator():
    @ilog.timing
    def f(x):
        return x + 1

    assert f(1) == 2
    assert any(s["name"].endswith("f") for s in ilog.perf_report())


def test_error_taxonomy_and_crash_report(tmp_path):
    @errors.handle_errors(errors.ErrorCategory.SEGMENTATION, reraise=False, default=-1)
    def boom():
        raise errors.SegmentationError("bad seed", {"seed": (1, 2, 3)})

    assert boom() == -1
    try:
        raise errors.DicomReadError("broken file")
    except errors.InVesaliusError:
        import sys

        path = errors.generate_crash_report(*sys.exc_info(), out_dir=tmp_path)
    assert path.exists()
    import json

    rep = json.loads(path.read_text())
    assert rep["category"] == "dicom"
    assert "broken file" in rep["exception"]


def test_plugin_manager(tmp_path):
    pdir = tmp_path / "plugins" / "myplugin"
    pdir.mkdir(parents=True)
    (pdir / "plugin.json").write_text('{"name": "myplugin", "enable": true}')
    (pdir / "__init__.py").write_text(
        "loaded = []\n\ndef load():\n    loaded.append(1)\n")
    pm = plugins.PluginManager(extra_dirs=[tmp_path / "plugins"], bus=events.Publisher())
    found = pm.find_plugins()
    assert "myplugin" in found
    mod = pm.load_plugin("myplugin")
    assert mod.loaded == [1]


def test_pedal_programmatic():
    from invesalius3_tpu.net.pedal_connection import PedalConnector

    pc = PedalConnector()
    presses = []
    pc.add_callback("capture", lambda state: presses.append(state),
                    remove_when_released=True)
    pc.programmatic.press()
    pc.programmatic.release()
    pc.programmatic.press()  # callback auto-removed after release
    assert presses == [True, False]


def test_efield_debug_solver():
    from invesalius3_tpu.navigation.efield import VisualizeEFieldThread

    roi = np.random.default_rng(0).uniform(0, 100, (50, 3)).astype(np.float32)
    th = VisualizeEFieldThread(queue.Queue(), roi_vertices=roi, debug=True,
                               bus=events.Publisher())
    m = np.eye(4)
    m[:3, 3] = roi[7]
    norms = th.compute_once({"coils_img": {0: m}})
    assert norms.shape == (50,)
    # the nearest vertex is not necessarily argmax (axis term), but nearby
    # vertices dominate distant ones
    assert norms[7] > norms[np.argmax(np.linalg.norm(roi - roi[7], axis=1))]


def test_tractography_streamlines():
    from invesalius3_tpu.navigation.tractography import seed_grid, track_streamlines
    import jax.numpy as jnp

    # uniform +x direction field, full mask: streamlines go straight in x
    field = np.zeros((16, 16, 32, 3), np.float32)
    field[..., 2] = 1.0
    mask = np.ones((16, 16, 32), bool)
    seeds = np.tile(np.array([[8.0, 8.0, 4.0]]), (5, 1))
    paths, valid = track_streamlines(jnp.asarray(field), jnp.asarray(mask),
                                     jnp.asarray(seeds, jnp.float32),
                                     step_size=1.0, n_steps=10)
    paths = np.asarray(paths)
    assert paths.shape == (11, 5, 3)
    np.testing.assert_allclose(paths[-1, 0], [8.0, 8.0, 14.0], atol=1e-4)
    # stops at the mask edge
    mask2 = mask.copy()
    mask2[:, :, 8:] = False
    paths2, valid2 = track_streamlines(jnp.asarray(field), jnp.asarray(mask2),
                                       jnp.asarray(seeds, jnp.float32),
                                       step_size=1.0, n_steps=10)
    assert np.asarray(paths2)[-1, 0, 2] <= 8.0


def test_dicom_net_cecho_refused():
    """No PACS here: C-ECHO to a dead port returns False, not an exception."""
    from invesalius3_tpu.net.dicom_net import DicomNet

    net = DicomNet("127.0.0.1", 1)  # nothing listens on port 1
    assert net.RunCEcho(timeout=0.5) is False
