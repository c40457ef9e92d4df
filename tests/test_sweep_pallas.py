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


def test_pallas_march_baked_ao_matches_scan():
    """The Pallas fast path renders baked AO (no fallback to the scan):
    AO captured at the hit plane must match the XLA scan's AO."""
    from isosurfacesuperresolution_tpu.render.ao_sweep import attach_baked_ao
    grid = attach_baked_ao(analytic.blobs_volume(48, num_blobs=6), 0.5, 0.1)
    cam = CameraParams.create((0.15, 0.5, -1.1))
    base = RenderConfig(width=32, height=24, isovalue=0.5, ao_samples=64,
                        ao_mode="volume", sweep_dtype="float32")
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, base))
    cfgp = dataclasses.replace(base, renderer="sweep_pallas")
    got = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfgp))
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    assert both.sum() > 30
    assert ref[..., 10][both].min() < 1.0         # AO active in the scan
    d_ao = np.abs(ref[..., 10] - got[..., 10])[both]
    assert np.quantile(d_ao, 0.95) < 0.02, float(d_ao.max())


def test_pallas_march_ao_bf16_close():
    """bf16 SH streaming stays within AO quantization tolerance."""
    from isosurfacesuperresolution_tpu.render.ao_sweep import attach_baked_ao
    grid = attach_baked_ao(analytic.blobs_volume(48, num_blobs=6), 0.5, 0.1)
    cam = CameraParams.create((0.15, 0.5, -1.1))
    base = RenderConfig(width=32, height=24, isovalue=0.5, ao_samples=64,
                        ao_mode="volume", sweep_dtype="float32")
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, base))
    cfgp = dataclasses.replace(base, renderer="sweep_pallas",
                               sweep_dtype="bfloat16")
    got = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfgp))
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    assert both.sum() > 30
    d_ao = np.abs(ref[..., 10] - got[..., 10])[both]
    assert np.quantile(d_ao, 0.95) < 0.05, float(d_ao.max())
