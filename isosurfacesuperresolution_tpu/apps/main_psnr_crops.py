"""PSNR of models vs ground truth on held-out test crops.

Parity target: `mainPSNR1.py:133-187` - evaluate trained checkpoints and
interpolation baselines on the dataset's test crops (the same crops the
trainer's test split uses), reporting per-channel masked PSNR.

Usage:
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
      --dataset /path/to/clips --models bilinear runs/run00001
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True,
                   help="npy clip dir (e.g. a --cacheDataset directory)")
    p.add_argument("--models", nargs="+", default=["bilinear"])
    p.add_argument("--cropSize", type=int, default=32)
    p.add_argument("--samples", type=int, default=500)
    p.add_argument("--testFraction", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.data.dataset import (
        DatasetFromSamples, VideoDataset, load_reference_npy_dir)
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.ops.metrics import psnr
    from isosurfacesuperresolution_tpu.ops.resize import resize
    from isosurfacesuperresolution_tpu.train.trainer import clamp_output

    sequences = load_reference_npy_dir(args.dataset)
    ds = VideoDataset(sequences)
    rng = np.random.RandomState(args.seed)
    samples = ds.collect_samples(args.samples, args.cropSize, 0.5, rng)
    test = DatasetFromSamples(ds, samples, args.cropSize, test=True,
                              test_fraction=args.testFraction)
    print(f"test crops: {len(test)}")

    from isosurfacesuperresolution_tpu.config import ShadingConfig
    from isosurfacesuperresolution_tpu.render.shading import (
        screen_space_shading)
    shading_cfg = ShadingConfig()
    B = 16    # border crop for raw channels: the training loss zeroes a
              # 16-px border (lossnet_unshaded.py:170-185), so raw borders
              # are unconstrained; the reference's own stats harness crops
              # 15 px (mainPSNR3_AllStats.py BORDER)

    print(f"{'model':24s} {'color':>7s} {'col-i':>7s} {'mask':>7s} "
          f"{'normal':>7s} {'depth':>7s} {'ao':>7s}")
    for spec in args.models:
        loaded = (None if spec in ("nearest", "bilinear", "bicubic")
                  else LoadedModel.from_run_dir(spec))
        acc = np.zeros(6)
        count = 0
        for i in range(len(test)):
            low, flow, high = test[i]
            prev = None
            for t in range(low.shape[0]):
                lo = jnp.asarray(low[t:t + 1])
                gt = jnp.asarray(high[t:t + 1])
                if loaded is None:
                    up = resize(lo, scale=4.0, method=spec)
                    pred = jnp.concatenate(
                        [up, jnp.ones_like(up[..., :1])], -1)
                else:
                    fl = jnp.asarray(flow[t:t + 1])
                    pred = clamp_output(loaded.inference(lo, prev, fl))
                    prev = pred
                # reference protocol (mainPSNR1.py:166-173): PSNR of the
                # screen-space-shaded prediction vs shaded ground truth
                sp = screen_space_shading(pred, shading_cfg)
                sg = screen_space_shading(gt, shading_cfg)
                acc[0] += float(psnr(sp, sg)[0])
                acc[1] += float(psnr(sp[:, B:-B, B:-B],
                                     sg[:, B:-B, B:-B])[0])
                p_c = pred[:, B:-B, B:-B]
                g_c = gt[:, B:-B, B:-B]
                mask = g_c[..., 0:1] * 0.5 + 0.5
                acc[2] += float(psnr(p_c[..., 0:1], g_c[..., 0:1])[0])
                acc[3] += float(psnr(p_c[..., 1:4], g_c[..., 1:4],
                                     mask=mask)[0])
                acc[4] += float(psnr(p_c[..., 4:5], g_c[..., 4:5],
                                     mask=mask)[0])
                acc[5] += float(psnr(p_c[..., 5:6], g_c[..., 5:6],
                                     mask=mask)[0])
                count += 1
        acc /= max(count, 1)
        name = (spec if loaded is None
                else os.path.basename(spec.rstrip("/")))
        print(f"{name:24s} {acc[0]:7.2f} {acc[1]:7.2f} {acc[2]:7.2f} "
              f"{acc[3]:7.2f} {acc[4]:7.2f} {acc[5]:7.2f}", flush=True)


if __name__ == "__main__":
    main()
