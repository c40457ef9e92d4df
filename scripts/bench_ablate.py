"""In-context ablation of the planar fused frame: chained-frame timing with
individual stages disabled, on the real chip.  The difference between the
full frame and each ablation is that stage's TRUE in-context cost."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import (
    Config, ModelConfig, RenderConfig)
from isosurfacesuperresolution_tpu.infer.planar import (
    clamp_output_planar, initial_image_planar, planar_apply,
    planar_rgb_to_planes, screen_space_shading_planar, warp_planar)
from isosurfacesuperresolution_tpu.models.generators import (
    create_network, network_input_channels)
from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import gbuffer_to_low_input
from isosurfacesuperresolution_tpu.volume import analytic


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = Config(model=ModelConfig(compute_dtype="bfloat16"))
    render_cfg = RenderConfig(width=480, height=270, isovalue=0.5,
                              ao_samples=0, renderer="sweep_pallas",
                              sweep_oversample=1.25)
    m = cfg.model
    model = create_network(m)
    cin = network_input_channels(m)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, cin), jnp.float32))
    grid = analytic.blobs_volume(256, num_blobs=8)
    h, w = 270, 480
    bf = jnp.bfloat16

    def cam_at(ang):
        eye = jnp.stack([1.7 * jnp.sin(ang), jnp.float32(0.9),
                         -1.7 * jnp.cos(ang)])
        return CameraParams(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]),
                            45.0)

    def frame(state, ang, *, render=True, inpaint=True, warp=True, net=True,
              shade=True, planes=True):
        cam, cam_prev = cam_at(ang), cam_at(ang - 0.03)
        if render:
            fr = render_frame_gbuffer(grid, cam, cam_prev, render_cfg)
        else:
            fr = jnp.zeros((h, w, 12), jnp.float32) + ang * 1e-6
        low = gbuffer_to_low_input(fr)[None]
        flow = fr[None, ..., 8:10]
        mask = fr[None, ..., 3:4]
        if inpaint:
            flow = inpaint_flow(flow, mask, iterations=8)
        init_prev = initial_image_planar(low, 6, "unshaded", False)
        prev = jnp.where(True, state, init_prev)
        if warp:
            warped = warp_planar(prev, flow, special_mask=True, max_disp=8,
                                 compute_dtype=bf)
        else:
            warped = prev
        if net:
            net_in = jnp.concatenate([low, warped], axis=-1)
            pred = planar_apply(params, m, net_in)
        else:
            pred = jnp.concatenate([warped[..., :80] + low[..., :1],
                                    warped[..., 80:]], axis=-1)
        outp = clamp_output_planar(pred)
        if shade:
            rgbp = screen_space_shading_planar(outp, cfg.shading)
        else:
            rgbp = outp[..., :48]
        if planes:
            rgb = planar_rgb_to_planes(rgbp)[0]
        else:
            rgb = rgbp[0]
        return outp, rgb

    N = 20

    def run_variant(name, **kw):
        @partial(jax.jit, static_argnums=(2,))
        def run(state0, ang0, n):
            def body(carry, _):
                ang, state = carry
                state, rgb = frame(state, ang, **kw)
                return (ang + 0.03, state), jnp.sum(rgb[..., ::64, ::64])
            (_, s), sums = jax.lax.scan(body, (ang0, state0), None,
                                        length=n)
            return jnp.sum(sums)
        state0 = jnp.zeros((1, h, w, 96), jnp.float32)
        float(run(state0, jnp.float32(0.0), N))
        times = []
        for i in range(3):
            t0 = time.time()
            float(run(state0, jnp.float32(0.1 + i), N))
            times.append((time.time() - t0) / N)
        dt = min(times)
        print(f"{name:28s} {1000 * dt:8.2f} ms", flush=True)
        return dt

    full = run_variant("FULL")
    for stage in ("render", "inpaint", "warp", "net", "shade", "planes"):
        dt = run_variant(f"no {stage}", **{stage: False})
        print(f"   -> {stage} in-context cost {1000 * (full - dt):8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
