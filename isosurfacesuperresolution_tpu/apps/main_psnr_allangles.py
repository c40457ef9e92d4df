"""All-angle robustness harness: PSNR/SSIM over random sphere cameras.

Parity target: `mainPSNR2_AllAngles.py` - 50 random sphere cameras x 6 rolls,
live-rendered ground truth vs model output, masked PSNR + SSIM with
min/max/mean+-variance summaries via the Welford accumulator, NaN scanning.

Usage:
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
      --volume analytic:torus --models bilinear --cameras 10 --rolls 2
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--volume", type=str, default="analytic:torus")
    p.add_argument("--models", nargs="+", default=["bilinear"])
    p.add_argument("--cameras", type=int, default=50)
    p.add_argument("--rolls", type=int, default=6)
    p.add_argument("--lowRes", type=int, default=64,
                   help="low-res input size (GT = 4x)")
    p.add_argument("--isovalue", type=float, default=0.5)
    p.add_argument("--output", type=str, default="allangles_out")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.ops.metrics import (
        MeanVariance, psnr, ssim)
    from isosurfacesuperresolution_tpu.ops.resize import resize
    from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.render.raycast import (
        gbuffer_to_high_target, gbuffer_to_low_input)
    from isosurfacesuperresolution_tpu.train.trainer import clamp_output

    grid, vol_name = load_volume(args.volume)
    low_cfg = RenderConfig(width=args.lowRes, height=args.lowRes,
                           isovalue=args.isovalue, ao_samples=0)
    high_cfg = low_cfg.replace(width=args.lowRes * 4,
                               height=args.lowRes * 4)

    rng = np.random.RandomState(args.seed)
    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(args.output, f"allangles_{vol_name}.tsv")

    with open(out_path, "w") as f:
        f.write("Model\tPSNR-min\tPSNR-max\tPSNR-mean\tPSNR-var\t"
                "SSIM-min\tSSIM-max\tSSIM-mean\tSSIM-var\tNaN-frames\n")
        for model_spec in args.models:
            loaded = (None if model_spec in ("nearest", "bilinear",
                                             "bicubic")
                      else LoadedModel.from_run_dir(model_spec))
            mv_psnr, mv_ssim = MeanVariance(), MeanVariance()
            p_min, p_max = np.inf, -np.inf
            s_min, s_max = np.inf, -np.inf
            nan_frames = 0
            rng_local = np.random.RandomState(args.seed)
            for ci in range(args.cameras):
                v = rng_local.normal(size=3)
                v /= np.linalg.norm(v)
                eye = v * rng_local.uniform(1.2, 2.0)
                for ri in range(args.rolls):
                    ang = 2 * math.pi * ri / args.rolls
                    base_up = np.array([0.0, 1.0, 0.0])
                    if abs(np.dot(v, base_up)) > 0.95:
                        base_up = np.array([1.0, 0.0, 0.0])
                    right = np.cross(v, base_up)
                    right /= np.linalg.norm(right)
                    up2 = np.cos(ang) * base_up + np.sin(ang) * right
                    cam = CameraParams.create(eye, (0, 0, 0), up2)
                    fr_lo = render_frame_gbuffer(grid, cam, cam, low_cfg)
                    fr_hi = render_frame_gbuffer(grid, cam, cam, high_cfg)
                    low = gbuffer_to_low_input(fr_lo)[None]
                    gt = gbuffer_to_high_target(fr_hi)[None]
                    if loaded is None:
                        up = resize(low, scale=4.0, method=model_spec)
                        pred = jnp.concatenate(
                            [up, jnp.ones_like(up[..., :1])], -1)
                    else:
                        flow = jnp.zeros(low.shape[:3] + (2,))
                        pred = clamp_output(
                            loaded.inference(low, None, flow))
                    pred_np = np.asarray(pred)
                    if not np.isfinite(pred_np).all():
                        nan_frames += 1        # parity: NaN scan
                        continue
                    mask = gt[..., 0:1] * 0.5 + 0.5
                    p = float(psnr(pred[..., 1:4], gt[..., 1:4],
                                   mask=mask)[0])
                    s = float(ssim(pred[..., 1:4], gt[..., 1:4],
                                   val_range=2.0))
                    mv_psnr.append(p)
                    mv_ssim.append(s)
                    p_min, p_max = min(p_min, p), max(p_max, p)
                    s_min, s_max = min(s_min, s), max(s_max, s)
            name = (model_spec if loaded is None
                    else os.path.basename(model_spec.rstrip("/")))
            f.write(f"{name}\t{p_min:.4f}\t{p_max:.4f}\t"
                    f"{mv_psnr.mean():.4f}\t{mv_psnr.var():.6f}\t"
                    f"{s_min:.4f}\t{s_max:.4f}\t{mv_ssim.mean():.4f}\t"
                    f"{mv_ssim.var():.6f}\t{nan_frames}\n")
            print(f"{name}: PSNR {mv_psnr.mean():.2f} "
                  f"[{p_min:.2f}, {p_max:.2f}] dB over "
                  f"{mv_psnr.count()} views")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
