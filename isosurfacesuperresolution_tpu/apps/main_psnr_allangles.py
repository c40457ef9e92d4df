"""All-angle robustness harness: PSNR/SSIM over random sphere cameras.

Parity target: `mainPSNR2_AllAngles.py` - 50 random sphere cameras x 6 rolls,
live-rendered ground truth vs model output, per-view UNMASKED PSNR on the
normal and shaded-color channels (`mainPSNR2_AllAngles.py:344-350` - the
reference computes plain PSNR; its masking is done by compositing the model
image over the background with its own mask, :330-339), SSIM, and
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
    p.add_argument("--aoSamples", type=int, default=0)
    p.add_argument("--aoStrength", type=float, default=None,
                   help="AO shading strength; default 0 when --aoSamples=0 "
                        "(the reference pairs AO_SAMPLES=0 with "
                        "AO_STRENGTH=0.0, mainPSNR2_AllAngles.py:140-142), "
                        "else 0.8 (its commented operating point)")
    p.add_argument("--output", type=str, default="allangles_out")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.bench.stats import STATS_SHADING
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.ops.metrics import (
        MeanVariance, psnr, ssim)
    from isosurfacesuperresolution_tpu.ops.resize import resize
    from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.render.raycast import (
        gbuffer_to_high_target, gbuffer_to_low_input)
    from isosurfacesuperresolution_tpu.render.shading import (
        screen_space_shading)
    from isosurfacesuperresolution_tpu.train.trainer import clamp_output

    grid, vol_name = load_volume(args.volume)
    ao_radius = 0.2      # the training generator's radius (SequenceConfig)
    if args.aoSamples > 0:
        # bake the SH occlusion field once so AO renders ride the sweep's
        # fast field path; the per-pixel hemisphere-ray oracle at 4x-res
        # GT views exhausts the chip (data/generation.py does the same)
        from isosurfacesuperresolution_tpu.render.ao_sweep import (
            attach_baked_ao)
        grid = attach_baked_ao(grid, args.isovalue, ao_radius)
    low_cfg = RenderConfig(width=args.lowRes, height=args.lowRes,
                           isovalue=args.isovalue,
                           ao_samples=args.aoSamples,
                           ao_radius=ao_radius)
    high_cfg = low_cfg.replace(width=args.lowRes * 4,
                               height=args.lowRes * 4)
    # Reference parity: AO_SAMPLES=0 goes with AO_STRENGTH=0.0
    # (`mainPSNR2_AllAngles.py:140-142`) - shading must not consume the
    # AO channel when the protocol renders none, otherwise the net's
    # *learned* AO is scored against an AO-free ground truth.
    ao_strength = args.aoStrength
    if ao_strength is None:
        ao_strength = 0.0 if args.aoSamples == 0 else 0.8
    shading_cfg = STATS_SHADING.replace(ao_strength=ao_strength)

    rng = np.random.RandomState(args.seed)
    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(args.output, f"allangles_{vol_name}.tsv")

    with open(out_path, "w") as f:
        f.write("Model\tPSNRnormal-min\tPSNRnormal-max\tPSNRnormal-mean\t"
                "PSNRnormal-var\tPSNRcolor-min\tPSNRcolor-max\t"
                "PSNRcolor-mean\tPSNRcolor-var\tSSIMnormal-mean\t"
                "SSIMcolor-mean\tNaN-frames\n")
        for model_spec in args.models:
            loaded = (None if model_spec in ("nearest", "bilinear",
                                             "bicubic")
                      else LoadedModel.from_run_dir(model_spec))
            mv_pn, mv_pc = MeanVariance(), MeanVariance()
            mv_sn, mv_sc = MeanVariance(), MeanVariance()
            pn_min, pn_max = np.inf, -np.inf
            pc_min, pc_max = np.inf, -np.inf
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
                    # Reference protocol (`mainPSNR2_AllAngles.py`):
                    # baselines upsample the LOW-RES SHADED image
                    # (:300-312 - shading happens before cv.resize);
                    # networks are shaded at high res and then the color
                    # AND normal channels are composited over the (black)
                    # background with the bilinearly-UPSAMPLED INPUT mask
                    # (`base_mask`, :330-339), not the predicted mask.
                    # PSNR is then plain/unmasked on normal + shaded
                    # color (:344-350).
                    if loaded is None:
                        up = resize(low, scale=4.0, method=model_spec)
                        pred_n = up[..., 1:4]
                        pred_c = jnp.clip(resize(
                            jnp.clip(screen_space_shading(
                                low, shading_cfg), 0, 1),
                            scale=4.0, method=model_spec), 0, 1)
                        pred_np = np.asarray(pred_c)
                    else:
                        flow = jnp.zeros(low.shape[:3] + (2,))
                        pred = clamp_output(
                            loaded.inference(low, None, flow))
                        pred_np = np.asarray(pred)
                        base_mask = jnp.clip(resize(
                            low[..., 0:1], scale=4.0,
                            method="bilinear") * 0.5 + 0.5, 0.0, 1.0)
                        pred_n = base_mask * pred[..., 1:4]
                        pred_c = base_mask * jnp.clip(
                            screen_space_shading(pred, shading_cfg),
                            0, 1)
                    if not np.isfinite(pred_np).all():
                        nan_frames += 1        # parity: NaN scan
                        continue
                    gt_n = gt[..., 1:4]
                    gt_c = jnp.clip(
                        screen_space_shading(gt, shading_cfg), 0, 1)
                    pn = float(psnr(pred_n, gt_n)[0])
                    pc = float(psnr(pred_c, gt_c)[0])
                    sn = float(ssim(pred_n, gt_n, val_range=2.0))
                    sc = float(ssim(pred_c, gt_c, val_range=1.0))
                    mv_pn.append(pn)
                    mv_pc.append(pc)
                    mv_sn.append(sn)
                    mv_sc.append(sc)
                    pn_min, pn_max = min(pn_min, pn), max(pn_max, pn)
                    pc_min, pc_max = min(pc_min, pc), max(pc_max, pc)
            name = (model_spec if loaded is None
                    else os.path.basename(model_spec.rstrip("/")))
            f.write(f"{name}\t{pn_min:.4f}\t{pn_max:.4f}\t"
                    f"{mv_pn.mean():.4f}\t{mv_pn.var():.6f}\t"
                    f"{pc_min:.4f}\t{pc_max:.4f}\t"
                    f"{mv_pc.mean():.4f}\t{mv_pc.var():.6f}\t"
                    f"{mv_sn.mean():.4f}\t{mv_sc.mean():.4f}\t"
                    f"{nan_frames}\n")
            print(f"{name}: PSNR normal {mv_pn.mean():.2f} "
                  f"[{pn_min:.2f}, {pn_max:.2f}] dB, "
                  f"color {mv_pc.mean():.2f} "
                  f"[{pc_min:.2f}, {pc_max:.2f}] dB over "
                  f"{mv_pn.count()} views")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
