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
    def metrics_frame(pred, gt):
        """(B, H, W, 6) -> (B, 6) metric vector; stays on device."""
        sp = screen_space_shading(pred, shading_cfg)
        sg = screen_space_shading(gt, shading_cfg)
        p_c = pred[:, B:-B, B:-B]
        g_c = gt[:, B:-B, B:-B]
        mask = g_c[..., 0:1] * 0.5 + 0.5
        return jnp.stack([
            psnr(sp, sg),
            psnr(sp[:, B:-B, B:-B], sg[:, B:-B, B:-B]),
            psnr(p_c[..., 0:1], g_c[..., 0:1]),
            psnr(p_c[..., 1:4], g_c[..., 1:4], mask=mask),
            psnr(p_c[..., 4:5], g_c[..., 4:5], mask=mask),
            psnr(p_c[..., 5:6], g_c[..., 5:6], mask=mask),
        ], axis=-1)

    # batch all test crops: one device fetch per model instead of 4 fetches
    # per crop-frame (the tunneled transport makes round trips expensive)
    lows, flows, highs = zip(*[test[i] for i in range(len(test))])
    low_all = jnp.asarray(np.stack(lows))        # (N, T, h, w, 5)
    flow_all = jnp.asarray(np.stack(flows))
    high_all = jnp.asarray(np.stack(highs))
    N, T = low_all.shape[0], low_all.shape[1]

    for spec in args.models:
        loaded = (None if spec in ("nearest", "bilinear", "bicubic")
                  else LoadedModel.from_run_dir(spec))
        acc = jnp.zeros(6)
        prev = None
        for t in range(T):
            lo = low_all[:, t]
            gt = high_all[:, t]
            if loaded is None:
                up = resize(lo, scale=4.0, method=spec)
                pred = jnp.concatenate([up, jnp.ones_like(up[..., :1])], -1)
            else:
                pred = clamp_output(
                    loaded.inference(lo, prev, flow_all[:, t]))
                prev = pred
            acc = acc + jnp.sum(metrics_frame(pred, gt), axis=0)
        acc = np.asarray(acc) / (N * T)
        name = (spec if loaded is None
                else os.path.basename(spec.rstrip("/")))
        print(f"{name:24s} {acc[0]:7.2f} {acc[1]:7.2f} {acc[2]:7.2f} "
              f"{acc[3]:7.2f} {acc[4]:7.2f} {acc[5]:7.2f}", flush=True)


if __name__ == "__main__":
    main()
