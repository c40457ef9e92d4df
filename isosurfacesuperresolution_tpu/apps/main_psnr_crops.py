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

    print(f"{'model':24s} {'mask':>7s} {'normal':>7s} {'depth':>7s} "
          f"{'ao':>7s}")
    for spec in args.models:
        loaded = (None if spec in ("nearest", "bilinear", "bicubic")
                  else LoadedModel.from_run_dir(spec))
        acc = np.zeros(4)
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
                mask = gt[..., 0:1] * 0.5 + 0.5
                acc[0] += float(psnr(pred[..., 0:1], gt[..., 0:1])[0])
                acc[1] += float(psnr(pred[..., 1:4], gt[..., 1:4],
                                     mask=mask)[0])
                acc[2] += float(psnr(pred[..., 4:5], gt[..., 4:5],
                                     mask=mask)[0])
                acc[3] += float(psnr(pred[..., 5:6], gt[..., 5:6],
                                     mask=mask)[0])
                count += 1
        acc /= max(count, 1)
        name = (spec if loaded is None
                else os.path.basename(spec.rstrip("/")))
        print(f"{name:24s} {acc[0]:7.2f} {acc[1]:7.2f} {acc[2]:7.2f} "
              f"{acc[3]:7.2f}")


if __name__ == "__main__":
    main()
