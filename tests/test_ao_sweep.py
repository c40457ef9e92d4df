"""Baked SH-occlusion AO: bake invariants + accuracy vs hemisphere-ray AO."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.ao_sweep import (
    ao_from_sh, attach_baked_ao, bake_occlusion_sh, fibonacci_sphere,
    _shift_volume)
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import render_gbuffer
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.volume import analytic


def test_fibonacci_sphere_uniformity():
    d = fibonacci_sphere(64)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # mean direction ~ 0 (symmetric coverage)
    assert np.abs(d.mean(axis=0)).max() < 0.05


def test_shift_volume_matches_numpy():
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(12, 10, 8).astype(np.float32))
    out = np.asarray(_shift_volume(v, jnp.asarray([2.0, 0.0, 0.0])))
    np.testing.assert_allclose(out[:10], np.asarray(v)[2:], atol=1e-6)
    np.testing.assert_allclose(out[10:], 0.0)
    # fractional shift interpolates
    out = np.asarray(_shift_volume(v, jnp.asarray([0.5, 0.0, 0.0])))
    expect = 0.5 * (np.asarray(v)[0:11] + np.asarray(v)[1:12])
    np.testing.assert_allclose(out[:11], expect, atol=1e-5)


def test_flat_halfspace_ao_is_one():
    """SH-L1 is exact for a flat surface: AO at the surface ~ 1."""
    v = np.zeros((32, 32, 32), np.float32)
    v[:, :16, :] = 1.0                   # half-space below y=16
    sh = bake_occlusion_sh(jnp.asarray(v), 0.5, 4.0, num_dirs=64)
    # surface voxel, outward normal +y
    s = np.asarray(sh[16, 17, 16])
    ao = float(ao_from_sh(jnp.asarray(s), jnp.asarray([0.0, 1.0, 0.0])))
    assert ao > 0.85, (ao, s)
    # normal pointing INTO the material: fully occluded
    ao_in = float(ao_from_sh(jnp.asarray(s), jnp.asarray([0.0, -1.0, 0.0])))
    assert ao_in < 0.3, ao_in


def test_sweep_volume_ao_close_to_ray_ao():
    grid = analytic.torus_volume(64)
    # view into the torus bore: strong concave occlusion
    cfg_ray = RenderConfig(width=40, height=40, isovalue=0.5,
                           step_voxels=0.5, ao_samples=32, ao_radius=0.2,
                           ao_ray_steps=256, ao_mode="ray", renderer="march")
    cam = CameraParams.create((0, 1.2, -0.25))
    ref = np.asarray(render_gbuffer(grid, cam, cam, cfg_ray))

    grid_b = attach_baked_ao(grid, 0.5, 0.2, num_dirs=48)
    cfg_vol = cfg_ray.replace(ao_mode="volume", renderer="sweep")
    got = np.asarray(render_gbuffer_sweep(grid_b, cam, cam, cfg_vol))

    from scipy import ndimage
    both = ndimage.binary_erosion(
        (ref[..., 3] > 0.5) & (got[..., 3] > 0.5), iterations=2)
    assert both.sum() > 100
    d = np.abs(ref[..., 10] - got[..., 10])[both]
    # SH-L1 vs 32-ray Monte Carlo (calibrated: err mean ~0.005-0.013,
    # occlusion correlation ~0.81-0.84 across views)
    assert d.mean() < 0.03, d.mean()
    assert got[..., 10][both].min() < 0.92
    a = 1 - ref[..., 10][both]
    b = 1 - got[..., 10][both]
    assert np.corrcoef(a, b)[0, 1] > 0.6


def test_volume_ao_requires_bake():
    grid = analytic.sphere_volume(32)
    cfg = RenderConfig(width=16, height=16, isovalue=0.5, ao_samples=8,
                       ao_mode="volume")
    cam = CameraParams.create((0, 1, -1.7))
    with pytest.raises(ValueError):
        render_gbuffer_sweep(grid, cam, cam, cfg)


def test_generation_bakes_ao_for_sweep():
    from isosurfacesuperresolution_tpu.data.generation import (
        SequenceConfig, generate_sequences)
    grid = analytic.sphere_volume(32)
    seq_cfg = SequenceConfig(num_frames=2, high_res=64, ao_samples=16,
                             ao_radius=0.15, distance_range=(1.4, 1.8))
    base = RenderConfig(isovalue=0.5, renderer="sweep")
    seqs = generate_sequences([(grid, (0.5, 0.5))], 1, seq_cfg,
                              base_render_cfg=base, seed=0)
    ao = seqs[0]["high"][..., 5]
    mask = seqs[0]["high"][..., 0] > 0
    assert ao[~mask].min() == 1.0
    assert ao[mask].min() < 1.0          # some occlusion on the sphere edge


def test_coarse_bake_upsample_matches_full_bake():
    """attach_baked_ao(downsample=2) bakes at half res and upsamples;
    AO is low-frequency so the field must stay close to the full-res
    bake, and the attached field must render through the sweep."""
    grid = analytic.blobs_volume(64, num_blobs=6, seed=3)
    full = attach_baked_ao(grid, 0.5, 0.15)
    coarse = attach_baked_ao(grid, 0.5, 0.15, downsample=2,
                             out_dtype=jnp.bfloat16)
    assert coarse.ao_sh.shape == full.ao_sh.shape
    assert coarse.ao_sh.dtype == jnp.bfloat16
    a = np.asarray(full.ao_sh[..., 0], np.float32).ravel()
    b = np.asarray(coarse.ao_sh[..., 0], np.float32).ravel()
    # mean-occlusion channel: close in L1 and strongly correlated
    assert np.abs(a - b).mean() < 0.05
    keep = a.std() > 0 and b.std() > 0
    assert keep and np.corrcoef(a, b)[0, 1] > 0.95

    cfg = RenderConfig(width=32, height=32, isovalue=0.5, ao_samples=32,
                       ao_mode="volume", renderer="sweep",
                       step_voxels=0.5)
    cam = CameraParams.create((0.0, 0.9, -1.7))
    fr_full = np.asarray(render_gbuffer_sweep(full, cam, cam, cfg))
    fr_coarse = np.asarray(render_gbuffer_sweep(coarse, cam, cam, cfg))
    m = fr_full[..., 3] > 0.5
    assert m.any()
    assert np.isfinite(fr_coarse).all()
    # rendered AO channel within a few percent where the surface is hit
    d = np.abs(fr_full[..., 10] - fr_coarse[..., 10])[m]
    assert d.mean() < 0.05, d.mean()


def test_upsample1d_linear_boundary_clamped():
    """Lower-edge regression (round-3 advisor): upsampling [0,1,2,3] by 2
    must start at 0.0 (constant extrapolation below the first coarse
    center), not 0.75 of the second cell, and both edges are monotone."""
    from isosurfacesuperresolution_tpu.render.ao_sweep import (
        _upsample1d_linear)
    a = np.arange(4, dtype=np.float32)
    up = _upsample1d_linear(a, 0, 8, 2)
    assert up[0] == 0.0
    assert up[-1] == 3.0
    assert np.all(np.diff(up) >= 0)     # monotone, no boundary kink
    # interior samples still hit the exact linear interpolant
    np.testing.assert_allclose(up[1:-1],
                               np.interp((np.arange(1, 7) + 0.5) / 2 - 0.5,
                                         np.arange(4), a), atol=1e-6)


def test_attach_baked_ao_downsample_pools_on_host():
    """The downsample>1 path must not build the tile-padded
    (X//f, f, Y//f, f, Z//f, f) device temp that OOM'd the 1024^3 bake
    (256 GiB in r3_perf_ao.log); host pooling + affine dequant must match
    the direct mean for quantized grids."""
    import dataclasses as _dc
    grid = analytic.blobs_volume(32, num_blobs=4, seed=5)
    # quantize to uint8 to exercise the affine-after-pool path
    v = np.asarray(grid.values, np.float32)
    q = np.round((v - v.min()) / (np.ptp(v) / 255.0)).astype(np.uint8)
    scale = float(np.ptp(v) / 255.0)
    off = float(v.min())
    qgrid = _dc.replace(grid, values=jnp.asarray(q),
                        value_scale=scale, value_offset=off)
    out = attach_baked_ao(qgrid, 0.5, 0.15, downsample=2)
    ref = attach_baked_ao(grid, 0.5, 0.15, downsample=2)
    d = np.abs(np.asarray(out.ao_sh, np.float32)
               - np.asarray(ref.ao_sh, np.float32))
    # uint8 quantization can flip inside/outside for voxels within one
    # quantization step of the isovalue, so bound the mean tightly and
    # the max loosely
    assert d.mean() < 1e-3, d.mean()
    assert d.max() < 0.05, d.max()


def test_upsample1d_factor2_fast_path():
    """The slice-arithmetic factor-2 fast path equals the general
    clamped-linear formula (which took ~40 min of np.take gathers at
    1024^3)."""
    from isosurfacesuperresolution_tpu.render.ao_sweep import (
        _upsample1d_linear)
    rng = np.random.RandomState(0)
    a = rng.rand(5, 7, 4).astype(np.float32)
    for axis in range(3):
        n = a.shape[axis]
        got = _upsample1d_linear(a, axis, 2 * n, 2)
        # reference: clamped cell-center linear interpolation per line
        pos = np.clip((np.arange(2 * n) + 0.5) / 2 - 0.5, 0, n - 1)
        ref = np.apply_along_axis(
            lambda line: np.interp(pos, np.arange(n), line), axis, a)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_quantize_u8_per_channel_scales():
    """uint8 AO fields quantize per channel (round-4 advisor): the
    directional SH coefficients have a much smaller dynamic range than
    the mean channel, so a single global scale wastes most of their
    uint8 steps.  The attached affine must be 4-tuples and the
    per-channel dequant error must stay within half a step per channel."""
    grid = analytic.blobs_volume(32, num_blobs=4, seed=7)
    ref = attach_baked_ao(grid, 0.5, 0.15)                # f32 field
    q = attach_baked_ao(grid, 0.5, 0.15, out_dtype=np.uint8)
    assert isinstance(q.ao_scale, tuple) and len(q.ao_scale) == 4
    assert isinstance(q.ao_offset, tuple) and len(q.ao_offset) == 4
    deq = (np.asarray(q.ao_sh, np.float32)
           * np.asarray(q.ao_scale, np.float32)
           + np.asarray(q.ao_offset, np.float32))
    err = np.abs(deq - np.asarray(ref.ao_sh, np.float32))
    for c in range(4):
        assert err[..., c].max() <= 0.5001 * q.ao_scale[c] + 1e-7, c
    # the g channels' step must be finer than one global step would be
    g_step = (np.asarray(ref.ao_sh).max()
              - np.asarray(ref.ao_sh).min()) / 255.0
    assert max(q.ao_scale[1:]) < g_step


def test_keep_coarse_field_renders_like_upsampled():
    """keep_coarse=True attaches the half-res field itself
    (ao_downsample=2); the tiled capture samples it natively and every
    other path upsamples on device.  Both must match the host-upsampled
    field's render - this is the half-res pass-2 capture that lifts
    1024^3+AO (PERF.md round-5 item)."""
    grid = analytic.blobs_volume(64, num_blobs=6, seed=3)
    up = attach_baked_ao(grid, 0.5, 0.15, downsample=2,
                         out_dtype=np.uint8)
    co = attach_baked_ao(grid, 0.5, 0.15, downsample=2, keep_coarse=True,
                         out_dtype=np.uint8)
    assert co.ao_downsample == 2
    assert co.ao_sh.shape[:3] == tuple(s // 2 for s in up.ao_sh.shape[:3])

    cam = CameraParams.create((0.0, 0.9, -1.7))
    # tiled Pallas path (sweep_tile>0 forces it below the 512 auto
    # threshold): the kernel samples the coarse field directly
    cfg_t = RenderConfig(width=32, height=32, isovalue=0.5,
                         ao_samples=32, ao_mode="volume",
                         renderer="sweep_pallas", sweep_tile=32,
                         step_voxels=0.5)
    fr_up = np.asarray(render_gbuffer_sweep(up, cam, cam, cfg_t))
    fr_co = np.asarray(render_gbuffer_sweep(co, cam, cam, cfg_t))
    m = fr_up[..., 3] > 0.5
    assert m.any()
    assert np.isfinite(fr_co).all()
    # same coarse information, one lerp stage apart (pre-upsampled
    # bilinear-of-linear vs direct coarse bilinear)
    d = np.abs(fr_up[..., 10] - fr_co[..., 10])[m]
    assert d.mean() < 0.03, d.mean()
    assert d.max() < 0.2, d.max()

    # scan path (renderer="sweep"): exercises the on-device upsample
    # fallback for coarse fields
    cfg_s = cfg_t.replace(renderer="sweep", sweep_tile=0)
    fr_up_s = np.asarray(render_gbuffer_sweep(up, cam, cam, cfg_s))
    fr_co_s = np.asarray(render_gbuffer_sweep(co, cam, cam, cfg_s))
    m2 = fr_up_s[..., 3] > 0.5
    d2 = np.abs(fr_up_s[..., 10] - fr_co_s[..., 10])[m2]
    assert d2.mean() < 0.03, d2.mean()
