"""Occupancy-gated tiled Pallas march vs the XLA scan (interpret mode)."""

import dataclasses

import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.volume import analytic


@pytest.mark.parametrize("eye", [(0.2, 0.7, -1.6), (1.7, 0.3, 0.2)])
def test_tiled_march_matches_scan(eye):
    grid = analytic.blobs_volume(48, num_blobs=5)
    cam = CameraParams.create(eye)
    base = RenderConfig(width=32, height=24, isovalue=0.5, ao_samples=0,
                        sweep_dtype="float32")
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, base))
    # force the tiled kernel with 16-px tiles (3x3 tile grid at 48^3)
    cfgt = dataclasses.replace(base, renderer="sweep_pallas",
                               sweep_tile=16)
    got = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfgt))
    assert got.shape == ref.shape
    assert np.isfinite(got).all()
    assert np.mean(ref[..., 3] != got[..., 3]) < 0.01
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    assert both.sum() >= 20
    for ch, tol in ((7, 3e-3), (4, 3e-2), (5, 3e-2), (6, 3e-2)):
        d = np.abs(ref[..., ch] - got[..., ch])[both]
        assert d.max() < tol, (ch, float(d.max()))


def test_tiled_march_matches_flat_kernel():
    """Tiled and flat Pallas kernels agree on a sparse scene where most
    tiles are culled."""
    grid = analytic.ejecta_volume(48, num_particles=60)
    cam = CameraParams.create((0.2, 0.6, -1.2))
    base = RenderConfig(width=32, height=32, isovalue=0.4, ao_samples=0,
                        sweep_dtype="float32", renderer="sweep_pallas",
                        sweep_tile=-1)
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, base))
    cfgt = dataclasses.replace(base, sweep_tile=16)
    got = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfgt))
    assert np.mean(ref[..., 3] != got[..., 3]) < 0.01
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    if both.sum():
        d = np.abs(ref[..., 7] - got[..., 7])[both]
        assert d.max() < 3e-3, float(d.max())


def test_tiled_uint8_storage():
    grid = analytic.blobs_volume(48, num_blobs=5)
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.volume.grid import BrickGrid
    dense = np.asarray(grid.dequant(grid.values))
    gq = BrickGrid.from_dense(dense, store_dtype="uint8")
    cam = CameraParams.create((0.2, 0.7, -1.6))
    cfg = RenderConfig(width=32, height=24, isovalue=0.5, ao_samples=0,
                       renderer="sweep_pallas", sweep_tile=16)
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam,
                                          dataclasses.replace(
                                              cfg, renderer="sweep")))
    got = np.asarray(render_gbuffer_sweep(gq, cam, cam, cfg))
    ma, mb = ref[..., 3] > 0.5, got[..., 3] > 0.5
    inter, union = (ma & mb).sum(), (ma | mb).sum()
    assert union > 30 and inter / union > 0.95


def test_tiled_ao_matches_flat_kernel():
    """Pass-2 tiled AO capture vs the flat kernel's in-march AO slabs.

    The flat kernel streams whole (2, 4, X, Y) AO slabs (exceeds VMEM at
    1024^3); the tiled path re-derives the crossing set from m_hit and
    windows the field per occupied tile - same math, different tiling of
    the f32 accumulation."""
    from isosurfacesuperresolution_tpu.render.ao_sweep import (
        attach_baked_ao)
    grid = analytic.blobs_volume(48, num_blobs=5)
    grid = attach_baked_ao(grid, 0.5, 0.1)
    cam = CameraParams.create((0.2, 0.7, -1.6))
    base = RenderConfig(width=32, height=24, isovalue=0.5, ao_samples=16,
                        ao_mode="volume", sweep_dtype="float32",
                        renderer="sweep_pallas", sweep_tile=-1)  # flat
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, base))
    got = np.asarray(render_gbuffer_sweep(
        grid, cam, cam, dataclasses.replace(base, sweep_tile=16)))
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    assert both.sum() >= 20
    # AO must actually vary (a flat field would hide a broken capture)
    assert ref[..., 10][both].std() > 1e-3
    d = np.abs(ref[..., 10] - got[..., 10])[both]
    assert d.max() < 1e-3, float(d.max())


def test_tiled_ao_uint8_quantized_field():
    """uint8-quantized AO field (grid.ao_scale/ao_offset) through the
    tiled pass-2 capture matches the bf16/f32 field to quantization
    precision - the storage mode that makes 1024^3+AO fit in HBM (the
    bf16 field + its per-axis transpose copy OOM'd the render compile,
    artifacts/logs/r4_perf_ao1024b.log)."""
    import numpy as _np

    from isosurfacesuperresolution_tpu.render.ao_sweep import (
        attach_baked_ao)
    grid0 = analytic.blobs_volume(48, num_blobs=5)
    gf = attach_baked_ao(grid0, 0.5, 0.1)
    gq = attach_baked_ao(grid0, 0.5, 0.1, out_dtype=_np.uint8)
    assert str(gq.ao_sh.dtype) == 'uint8'
    # dequantized field matches to half a (per-channel) quantization step
    deq = (np.asarray(gq.ao_sh, np.float32)
           * np.asarray(gq.ao_scale, np.float32)
           + np.asarray(gq.ao_offset, np.float32))
    d = np.abs(deq - np.asarray(gf.ao_sh, np.float32))
    for c in range(4):
        assert d[..., c].max() <= gq.ao_scale[c] * 0.5 + 1e-6, c

    cam = CameraParams.create((0.2, 0.7, -1.6))
    cfg = RenderConfig(width=32, height=24, isovalue=0.5, ao_samples=16,
                       ao_mode="volume", sweep_dtype="float32",
                       renderer="sweep_pallas", sweep_tile=16)
    ref = np.asarray(render_gbuffer_sweep(gf, cam, cam, cfg))
    got = np.asarray(render_gbuffer_sweep(gq, cam, cam, cfg))
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    assert both.sum() >= 20
    assert ref[..., 10][both].std() > 1e-3
    d = np.abs(ref[..., 10] - got[..., 10])[both]
    # a few quantization steps through the SH->AO evaluation
    assert d.max() < 6 * max(gq.ao_scale), float(d.max())

    # scan renderer consumes the same quantized field (resample_ao_slice
    # affine path)
    cfg_scan = dataclasses.replace(cfg, renderer="sweep", sweep_tile=0)
    ref_s = np.asarray(render_gbuffer_sweep(gf, cam, cam, cfg_scan))
    got_s = np.asarray(render_gbuffer_sweep(gq, cam, cam, cfg_scan))
    both = (ref_s[..., 3] > 0.5) & (got_s[..., 3] > 0.5)
    d = np.abs(ref_s[..., 10] - got_s[..., 10])[both]
    assert d.max() < 6 * max(gq.ao_scale), float(d.max())
