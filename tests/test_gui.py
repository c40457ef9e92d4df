"""Headless viewer tests: modes, channels, focus-of-context, smoothing,
screenshots, FPS bookkeeping."""

import json
import os

import numpy as np
import pytest

from isosurfacesuperresolution_tpu.apps.main_gui import Viewer
from isosurfacesuperresolution_tpu.volume import analytic


@pytest.fixture(scope="module")
def viewer():
    # blobs: asymmetric, so camera motion visibly changes the image
    grid = analytic.blobs_volume(32, num_blobs=5)
    v = Viewer(grid, models={}, res_x=24, res_y=24, isovalue=0.5)
    v.camera.zoom(-4)   # move closer so the object fills the frame
    v.set_mode("bilinear")
    return v


def test_frame_modes(viewer):
    for mode in ["bilinear", "nearest", "gt"]:
        viewer.set_mode(mode)
        rgb = viewer.render_frame()
        assert rgb.shape == (96, 96, 3)
        assert np.isfinite(rgb).all()
        assert 0 <= rgb.min() and rgb.max() <= 1
    assert viewer.fps > 0


def test_channels(viewer):
    viewer.set_mode("bilinear")
    for c in Viewer.CHANNELS:
        viewer.channel = c
        rgb = viewer.render_frame()
        assert rgb.shape == (96, 96, 3), c
    viewer.channel = "color"


def test_camera_interaction(viewer):
    viewer.set_mode("bilinear")
    a = viewer.render_frame()
    viewer.camera.start_move()
    viewer.camera.move(150, 40)
    b = viewer.render_frame()
    assert np.abs(a - b).max() > 0.01
    viewer.camera.zoom(2)
    c = viewer.render_frame()
    assert np.abs(b - c).max() > 0.01


def test_isovalue_change(viewer):
    viewer.set_mode("bilinear")
    a = viewer.render_frame()
    viewer.set_isovalue(0.25)
    b = viewer.render_frame()
    assert (a[..., 0] > 0).sum() != (b[..., 0] > 0).sum() or \
        np.abs(a - b).max() > 0.01
    viewer.set_isovalue(0.5)


def test_focus_of_context(viewer):
    viewer.set_mode("bilinear")
    viewer.foc_enabled = True
    viewer.foc_center = (48, 48)
    viewer.foc_window_size = 24
    rgb = viewer.render_frame()
    assert rgb.shape == (96, 96, 3)
    viewer.foc_enabled = False


def test_temporal_smoothing(viewer):
    viewer.set_mode("bilinear")
    viewer.temporal_smoothing = 0.5
    viewer.render_frame()
    rgb = viewer.render_frame()   # second frame uses the warped previous
    assert np.isfinite(rgb).all()
    viewer.temporal_smoothing = 0.0


def test_screenshot(viewer, tmp_path):
    viewer.set_mode("bilinear")
    path = viewer.save_screenshot(str(tmp_path))
    assert os.path.exists(path)
    with open(path + ".json") as f:
        info = json.load(f)
    assert info["model"] == "bilinear"
    assert info["channel"] == "color"
    assert "shading" in info and "ao" in info


def test_preset_mode_switch_keeps_temporal_state():
    """Side-by-side preset videos flip the active mode per column; this
    must not clear the per-pipeline temporal state, or recurrent models
    render as perpetual frame 0 (regression: run_preset called set_mode,
    which resets every pipeline)."""
    grid = analytic.blobs_volume(32, num_blobs=5)
    v = Viewer(grid, models={}, res_x=24, res_y=24, isovalue=0.5)
    v.set_mode("bilinear")
    v.render_frame()
    pipe = v._pipeline("bilinear")
    assert pipe._last_cam is not None
    # the preset loop's per-column switch: plain attribute assignment
    v.mode = "nearest"
    v.render_frame()
    assert pipe._last_cam is not None       # bilinear state survives
    # scripted isovalue sweep keeps recurrence when asked
    v.set_isovalue(0.45, reset_temporal=False)
    assert pipe._last_cam is not None
    # GUI slider semantics (reference mainGUI.py:647): reset by default
    v.set_isovalue(0.5)
    assert pipe._last_cam is None
