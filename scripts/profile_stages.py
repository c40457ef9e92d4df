"""Stage-wise timing of the fused 1080p frame on the real chip.

Breaks bench.py's fused frame into its stages and times each with the same
in-graph chained methodology (`utils/profiling.timed_chain`) so we know
where the milliseconds go before optimizing.
"""

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
from isosurfacesuperresolution_tpu.infer.pipeline import (
    initial_state, make_fused_frame)
from isosurfacesuperresolution_tpu.models.generators import (
    create_network, network_input_channels)
from isosurfacesuperresolution_tpu.models.videotools import (
    flatten_high, initial_image)
from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
from isosurfacesuperresolution_tpu.ops.warp_fast import warp_upscale_fast
from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import gbuffer_to_low_input
from isosurfacesuperresolution_tpu.render.shading import screen_space_shading
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain
from isosurfacesuperresolution_tpu.volume import analytic


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = Config(model=ModelConfig(compute_dtype="bfloat16"))
    render_cfg = RenderConfig(width=480, height=270, isovalue=0.5,
                              ao_samples=0, renderer="sweep",
                              sweep_oversample=1.25)
    model = create_network(cfg.model)
    cin = network_input_channels(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, cin), jnp.float32))
    grid = analytic.blobs_volume(256, num_blobs=8)
    h, w, u = 270, 480, 4

    def cam_at(ang):
        eye = jnp.stack([1.7 * jnp.sin(ang), jnp.float32(0.9),
                         -1.7 * jnp.cos(ang)])
        return CameraParams(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]),
                            45.0)

    N = 20

    def t(name, step, carry0):
        dt = timed_chain(step, carry0, n=N)
        print(f"{name:32s} {1000 * dt:8.2f} ms")

    # 1. render
    def render_step(c):
        ang, _ = c
        fr = render_frame_gbuffer(grid, cam_at(ang), cam_at(ang - 0.03),
                                  render_cfg)
        return (ang + 0.03, fr)
    fr0 = jnp.zeros((h, w, 12), jnp.float32)
    t("render sweep 480x270", render_step, (jnp.float32(0.0), fr0))

    # prerequisites computed once
    fr = render_frame_gbuffer(grid, cam_at(0.0), cam_at(-0.03), render_cfg)
    low0 = gbuffer_to_low_input(fr)[None]
    flow0 = fr[None, ..., 8:10]
    mask0 = fr[None, ..., 3:4]

    # 2. inpaint
    def inpaint_step(c):
        fl = inpaint_flow(c, mask0, iterations=8)
        return fl
    t("inpaint flow x8", inpaint_step, flow0)

    # 3. warp
    prev0 = jnp.zeros((1, h * u, w * u, 6), jnp.float32)
    def warp_step(c):
        wv = warp_upscale_fast(c, flow0, u, special_mask=True, max_disp=8)
        return wv
    t("warp_fast 1080p", warp_step, prev0)

    # 4. flatten + network
    warped0 = warp_upscale_fast(prev0, flow0, u, special_mask=True,
                                max_disp=8)
    def net_step(c):
        net_in = jnp.concatenate([low0, flatten_high(c, u)], axis=-1)
        pred, _ = model.apply(params, net_in)
        return jnp.concatenate([pred[..., :6]], axis=-1)
    t("flatten + EnhanceNet bf16", net_step, warped0)

    # 5. shading
    def shade_step(c):
        rgb = screen_space_shading(c, cfg.shading)[0]
        return jnp.concatenate([rgb, rgb], axis=-1)[..., :6][None]
    t("shading 1080p", shade_step, prev0)

    # 6. fused (reference)
    fused = make_fused_frame(model, cfg, render_cfg, donate=False)
    state0 = initial_state(cfg, render_cfg)
    def fused_step(c):
        ang, state = c
        rgb, fr, state = fused(params, grid, cam_at(ang), cam_at(ang - .03),
                               state)
        return (ang + 0.03, state)
    t("FUSED total", fused_step, (jnp.float32(0.0), state0))


if __name__ == "__main__":
    main()
