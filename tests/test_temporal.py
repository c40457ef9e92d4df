"""Cross-frame temporal consistency: the load-bearing warp tests.

TPU-native replacement for the reference's `FlowTest.py` validation: render
two frames of a moving camera, warp frame 0 to frame 1 using frame 1's
rendered low-res flow (inpainted), and require the warped result to match
frame 1's render far better than the unwarped one.  This pins down the
*entire* sign-convention chain (renderer flow packing -> inpaint ->
warp_upscale -> grid_sample).

The comparison runs on view-INdependent channels (mask + diffuse RGB under a
fixed world-space light): view-space normals and NDC depth legitimately
change between cameras, so they cannot measure warp alignment.
"""

import math

import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import (
    render_gbuffer, gbuffer_to_high_target, gbuffer_flow)
from isosurfacesuperresolution_tpu.models.videotools import warp_upscale
from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
from isosurfacesuperresolution_tpu.volume import analytic


def _rotated_eye(eye, ang, y_scale=1.0):
    return (eye[0] * math.cos(ang) - eye[2] * math.sin(ang),
            eye[1] * y_scale,
            eye[0] * math.sin(ang) + eye[2] * math.cos(ang))


def test_warp_previous_frame_onto_current():
    grid = analytic.torus_volume(96)
    upscale = 4
    low = RenderConfig(width=40, height=40, isovalue=0.5, step_voxels=0.25,
                       ao_samples=0, camera_light=False,
                       light_direction=(0.3, -1.0, 0.2),
                       specular_color=(0.0, 0.0, 0.0))
    high = low.replace(width=160, height=160)

    eye0 = (0.0, 0.9, -1.5)
    eye1 = _rotated_eye(eye0, 0.3, y_scale=0.92)   # ~4 px of image motion
    cam0 = CameraParams.create(eye0)
    cam1 = CameraParams.create(eye1)

    f0_high = render_gbuffer(grid, cam0, cam0, high)
    f1_low = render_gbuffer(grid, cam1, cam0, low)
    f1_high = render_gbuffer(grid, cam1, cam0, high)

    # view-independent stack: [mask in [-1,1], diffuse RGB]
    prev = jnp.concatenate([f0_high[..., 3:4] * 2 - 1,
                            f0_high[..., :3]], -1)[None]
    cur = jnp.concatenate([f1_high[..., 3:4] * 2 - 1,
                           f1_high[..., :3]], -1)[None]
    flow = inpaint_flow(gbuffer_flow(f1_low)[None],
                        f1_low[None, ..., 3:4], iterations=6)

    warped = warp_upscale(prev, flow, upscale, special_mask=True)
    warped_neg = warp_upscale(prev, -flow, upscale, special_mask=True)

    from scipy import ndimage
    m0 = np.asarray(f0_high[..., 3]) > 0
    m1 = np.asarray(f1_high[..., 3]) > 0
    both = ndimage.binary_erosion(m0 & m1, iterations=3)
    assert both.sum() > 1000

    cur_np = np.asarray(cur[0])
    err_warped = np.abs(np.asarray(warped[0]) - cur_np)[both].mean()
    err_neg = np.abs(np.asarray(warped_neg[0]) - cur_np)[both].mean()
    err_unwarped = np.abs(np.asarray(prev[0]) - cur_np)[both].mean()

    # correct-sign warp recovers most of the misalignment...
    assert err_warped < 0.25 * err_unwarped, (err_warped, err_unwarped)
    # ...and the sign is unambiguous
    assert err_warped < 0.25 * err_neg, (err_warped, err_neg)
    assert err_warped < 0.01, err_warped


def test_static_camera_flow_warp_is_identity_like():
    grid = analytic.sphere_volume(64)
    low = RenderConfig(width=32, height=32, isovalue=0.5, step_voxels=0.25,
                       ao_samples=0)
    high = low.replace(width=128, height=128)
    cam = CameraParams.create((0, 1, -1.7))
    f_high = render_gbuffer(grid, cam, cam, high)
    f_low = render_gbuffer(grid, cam, cam, low)
    prev = gbuffer_to_high_target(f_high)[None]
    flow = gbuffer_flow(f_low)[None]
    warped = warp_upscale(prev, flow, 4, special_mask=True)
    # interior matches closely (borders suffer the reference's grid quirk)
    a = np.asarray(warped[0])[16:-16, 16:-16]
    b = np.asarray(prev[0])[16:-16, 16:-16]
    assert np.abs(a - b).mean() < 0.02
