"""Pallas sweep march vs the XLA scan (interpret mode on CPU)."""

import dataclasses

import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.volume import analytic


@pytest.mark.parametrize("eye", [(0.2, 0.7, -1.6), (1.7, 0.3, 0.2)])
def test_pallas_march_matches_scan(eye):
    grid = analytic.sphere_volume(32)
    cam = CameraParams.create(eye)
    base = RenderConfig(width=32, height=24, isovalue=0.5, ao_samples=0,
                        sweep_dtype="bfloat16")
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, base))
    cfgp = dataclasses.replace(base, renderer="sweep_pallas")
    got = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfgp))
    assert got.shape == ref.shape
    assert np.isfinite(got).all()
    # same resample dtype on both sides -> only fp-order noise
    assert np.mean(ref[..., 3] != got[..., 3]) < 0.01
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    assert both.any()
    for ch, tol in ((7, 3e-3), (4, 3e-2), (5, 3e-2), (6, 3e-2)):
        d = np.abs(ref[..., ch] - got[..., ch])[both]
        assert d.max() < tol, (ch, d.max())
