"""Headline benchmark: fused 1080p interactive frame rate on one TPU chip.

Measures the BASELINE.json north-star operating point: raycast a 480x270
5-channel G-buffer from a volume, run the 4x EnhanceNet with the recurrent
temporal path, shade in screen space -> 1920x1080 RGB, all as ONE XLA
program per frame (the reference's `mainComparisonImages.py` harness:
5 warmup + 10 timed frames, `:219-230`).

Prints exactly one JSON line:
  {"metric": "fused 1080p 4x SR FPS", "value": N, "unit": "fps",
   "vs_baseline": N / 30.0}
(vs_baseline is against the 30 FPS real-time bar from BASELINE.md; the
reference publishes no in-repo numbers.)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.config import (
        Config, ModelConfig, RenderConfig)
    from isosurfacesuperresolution_tpu.infer.pipeline import (
        initial_state, make_fused_frame)
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network, network_input_channels)
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.volume import analytic

    print(f"devices: {jax.devices()}", file=sys.stderr)

    # flagship config: bf16 conv stack, full-size EnhanceNet
    cfg = Config(model=ModelConfig(compute_dtype="bfloat16"))
    render_cfg = RenderConfig(width=480, height=270, isovalue=0.5,
                              step_voxels=0.5, ao_samples=0)

    model = create_network(cfg.model)
    cin = network_input_channels(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, cin), jnp.float32))

    grid = analytic.blobs_volume(256, num_blobs=8)
    state = initial_state(cfg, render_cfg)
    fused = make_fused_frame(model, cfg, render_cfg, donate=True)

    def cam_at(t: float) -> CameraParams:
        ang = 0.03 * t
        eye = (1.7 * np.sin(ang), 0.9, -1.7 * np.cos(ang))
        return CameraParams.create(eye)

    warmup, timed = 5, 10
    last_cam = cam_at(0.0)
    t0 = time.time()
    for i in range(warmup):
        cam = cam_at(float(i))
        rgb, fr, state = fused(params, grid, cam, last_cam, state)
        last_cam = cam
    jax.block_until_ready(rgb)
    print(f"warmup+compile: {time.time() - t0:.1f}s", file=sys.stderr)

    start = time.time()
    for i in range(timed):
        cam = cam_at(float(warmup + i))
        rgb, fr, state = fused(params, grid, cam, last_cam, state)
        last_cam = cam
    jax.block_until_ready(rgb)
    elapsed = time.time() - start

    fps = timed / elapsed
    print(f"fused frame: {1000 * elapsed / timed:.2f} ms -> {fps:.2f} FPS "
          f"(output {rgb.shape})", file=sys.stderr)

    print(json.dumps({
        "metric": "fused 1080p 4x SR FPS (raycast 480x270 + EnhanceNet + shade)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
