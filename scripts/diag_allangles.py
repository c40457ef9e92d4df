"""Decompose the all-angles shaded-color PSNR gap by image region.

`apps.main_psnr_allangles` (mainPSNR2 protocol) showed the trained net
trailing bilinear on full-view shaded color while beating it on normals
and on every crop metric.  Random sphere views are ~80% background, so
this script splits the squared error of that exact protocol into three
regions defined by the bilinearly-upsampled input mask b in [0,1]
(the protocol's own compositing mask):

  background  b == 0        (should be exactly 0 error for both)
  ring        0 < b < 1     (the silhouette band the compositing blurs)
  interior    b == 1

and reports each region's CONTRIBUTION to total MSE (sum sq err over
all pixels), for bilinear vs a trained run.  Usage:

  python scripts/cpurun.py scripts/diag_allangles.py \
      --run artifacts/run00001 --cameras 3 --lowRes 48
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="artifacts/run00001")
    p.add_argument("--volume", default="analytic:blobs")
    p.add_argument("--isovalue", type=float, default=0.36)
    p.add_argument("--cameras", type=int, default=3)
    p.add_argument("--lowRes", type=int, default=48)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.bench.stats import STATS_SHADING as _SS
    # match the fixed harness protocol: no AO rendered -> no AO shading
    STATS_SHADING = _SS.replace(ao_strength=0.0)
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.ops.resize import resize
    from isosurfacesuperresolution_tpu.render.api import (
        adaptive_sweep_cfg, render_frame_gbuffer)
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.render.raycast import (
        gbuffer_to_high_target, gbuffer_to_low_input)
    from isosurfacesuperresolution_tpu.render.shading import (
        screen_space_shading)
    from isosurfacesuperresolution_tpu.train.trainer import clamp_output

    grid, _ = load_volume(args.volume)
    w, h = args.lowRes, args.lowRes
    low_cfg = RenderConfig(width=w, height=h, isovalue=args.isovalue,
                           ao_samples=0)
    high_cfg = RenderConfig(width=w * 4, height=h * 4,
                            isovalue=args.isovalue, ao_samples=0)
    loaded = LoadedModel.from_run_dir(args.run)

    rng = np.random.RandomState(args.seed)
    rows = {"bilinear": [], "net": []}
    for ci in range(args.cameras):
        v = rng.randn(3)
        v /= np.linalg.norm(v)
        origin = tuple((v * 1.7).tolist())
        cam = CameraParams.create(origin)
        lo_cfg = adaptive_sweep_cfg(cam, low_cfg)
        hi_cfg = adaptive_sweep_cfg(cam, high_cfg)
        fr_lo = render_frame_gbuffer(grid, cam, cam, lo_cfg)
        fr_hi = render_frame_gbuffer(grid, cam, cam, hi_cfg)
        low = gbuffer_to_low_input(fr_lo)[None]
        gt = gbuffer_to_high_target(fr_hi)[None]
        gt_c = np.asarray(jnp.clip(
            screen_space_shading(gt, STATS_SHADING), 0, 1))

        base_mask = np.asarray(jnp.clip(resize(
            low[..., 0:1], scale=4.0, method="bilinear") * 0.5 + 0.5,
            0.0, 1.0))

        # bilinear baseline: upsample the low-res SHADED image
        up_c = np.asarray(jnp.clip(resize(
            jnp.clip(screen_space_shading(low, STATS_SHADING), 0, 1),
            scale=4.0, method="bilinear"), 0, 1))
        # net: shade at high res, composite with base mask
        flow = jnp.zeros(low.shape[:3] + (2,))
        pred = clamp_output(loaded.inference(low, None, flow))
        net_c = np.asarray(base_mask) * np.asarray(jnp.clip(
            screen_space_shading(pred, STATS_SHADING), 0, 1))

        bg = base_mask[..., 0] == 0.0
        interior = base_mask[..., 0] >= 1.0
        ring = ~bg & ~interior
        n_pix = gt_c[0, ..., 0].size

        for name, img in (("bilinear", up_c), ("net", net_c)):
            se = ((img - gt_c) ** 2).sum(-1)[0] / 3.0   # mean over RGB
            tot = se.sum() / n_pix
            parts = {r: se[m].sum() / n_pix
                     for r, m in (("bg", bg[0]), ("ring", ring[0]),
                                  ("int", interior[0]))}
            rows[name].append((tot, parts,
                               {r: m.mean() for r, m in
                                (("bg", bg[0]), ("ring", ring[0]),
                                 ("int", interior[0]))}))
            psnr = 10 * np.log10(1.0 / max(tot, 1e-12))
            print(f"cam{ci} {name:9s} PSNR {psnr:6.2f}  "
                  f"mse {tot:.3e}  bg {parts['bg']:.3e}  "
                  f"ring {parts['ring']:.3e}  int {parts['int']:.3e}")

    for name, rs in rows.items():
        tot = np.mean([r[0] for r in rs])
        bgc = np.mean([r[1]["bg"] for r in rs])
        ringc = np.mean([r[1]["ring"] for r in rs])
        intc = np.mean([r[1]["int"] for r in rs])
        frac = rs[0][2]
        print(f"MEAN {name:9s} PSNR {10*np.log10(1/max(tot,1e-12)):6.2f} "
              f"| mse share: bg {100*bgc/tot:.1f}% "
              f"ring {100*ringc/tot:.1f}% int {100*intc/tot:.1f}% "
              f"| area: bg {100*frac['bg']:.0f}% ring "
              f"{100*frac['ring']:.0f}% int {100*frac['int']:.0f}%")


if __name__ == "__main__":
    main()
