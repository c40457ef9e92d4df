"""Timing + comparison-image harness.

Parity target: `mainComparisonImages.py` - per model: render frames at full
HD (network input = output/4), 5 warmup + 10 timed frames, write
``timings.csv`` with mean rendering and network seconds plus per-model
output images.

Usage:
  python -m isosurfacesuperresolution_tpu.apps.main_comparison \
      --volume analytic:blobs --models bilinear runs/run00001 \
      --output comparison_out --width 1920 --height 1080
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--volume", type=str, default="analytic:blobs")
    p.add_argument("--models", nargs="+", default=["bilinear"])
    p.add_argument("--output", type=str, default="comparison_out")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--upscaling", type=int, default=4)
    p.add_argument("--isovalue", type=float, default=0.5)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--timed", type=int, default=10)
    p.add_argument("--saveImages", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.config import (
        Config, ModelConfig, RenderConfig)
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.infer.pipeline import (
        InferencePipeline, initial_state)
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network, network_input_channels)
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer

    os.makedirs(args.output, exist_ok=True)
    grid, vol_name = load_volume(args.volume)

    low_w = args.width // args.upscaling
    low_h = args.height // args.upscaling
    render_cfg = RenderConfig(width=low_w, height=low_h,
                              isovalue=args.isovalue, step_voxels=0.5,
                              ao_samples=0)

    def cam_at(i):
        ang = 0.05 * i
        return CameraParams.create((1.7 * np.sin(ang), 0.9,
                                    -1.7 * np.cos(ang)))

    # isolated raycast timing (the "Rendering-Time (sec)" column)
    fr = render_frame_gbuffer(grid, cam_at(0), cam_at(0), render_cfg)
    jax.block_until_ready(fr)
    t0 = time.time()
    for i in range(args.timed):
        fr = render_frame_gbuffer(grid, cam_at(i), cam_at(i), render_cfg)
    jax.block_until_ready(fr)
    render_time = (time.time() - t0) / args.timed

    rows = []
    for model_spec in args.models:
        if model_spec in ("nearest", "bilinear", "bicubic"):
            cfg = Config()
            model = create_network(cfg.model)
            cin = network_input_channels(cfg.model)
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 8, 8, cin)))
            pipe = InferencePipeline(model=model, params=params, cfg=cfg,
                                     render_cfg=render_cfg,
                                     upscale_mode=model_spec)
            name = model_spec
        else:
            loaded = LoadedModel.from_run_dir(model_spec)
            pipe = InferencePipeline(model=loaded.model,
                                     params=loaded.params, cfg=loaded.cfg,
                                     render_cfg=render_cfg)
            name = os.path.basename(model_spec.rstrip("/"))

        for i in range(args.warmup):
            rgb = pipe.frame(grid, cam_at(i))
        jax.block_until_ready(rgb)
        t0 = time.time()
        for i in range(args.timed):
            rgb = pipe.frame(grid, cam_at(args.warmup + i))
        jax.block_until_ready(rgb)
        total_time = (time.time() - t0) / args.timed
        network_time = max(total_time - render_time, 0.0)
        rows.append((name, render_time, network_time, total_time))
        print(f"{name}: total {1000 * total_time:.2f} ms "
              f"({1.0 / total_time:.1f} FPS)")
        if args.saveImages:
            import imageio
            imageio.imwrite(
                os.path.join(args.output, f"{vol_name}_{name}.png"),
                (np.asarray(rgb) * 255).astype(np.uint8))

    csv_path = os.path.join(args.output, "timings.csv")
    with open(csv_path, "w") as f:
        # column parity: mainComparisonImages.py:174-175
        f.write("Model,Rendering-Time (sec),Network-Time (sec),"
                "Total-Time (sec),FPS\n")
        for name, rt, nt, tt in rows:
            f.write(f"{name},{rt:.6f},{nt:.6f},{tt:.6f},{1.0 / tt:.2f}\n")
    print("wrote", csv_path)


if __name__ == "__main__":
    main()
