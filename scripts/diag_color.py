"""Diagnose the shaded-color regression: which G-buffer channel is to blame?

For the trained net and the bilinear baseline, computes interior shaded-color
PSNR with each predicted channel group replaced by ground truth one at a time.
If substituting GT mask (say) recovers most of the dB gap, mask error at the
silhouettes is the driver.

Usage: python scripts/diag_color.py --dataset /tmp/isosr_clips --run runs/run00002
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="/tmp/isosr_clips")
    p.add_argument("--run", default="runs/run00002")
    p.add_argument("--samples", type=int, default=500)
    p.add_argument("--cropSize", type=int, default=32)
    args = p.parse_args()

    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.config import ShadingConfig
    from isosurfacesuperresolution_tpu.data.dataset import (
        DatasetFromSamples, VideoDataset, load_reference_npy_dir)
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.ops.metrics import psnr
    from isosurfacesuperresolution_tpu.ops.resize import resize
    from isosurfacesuperresolution_tpu.render.shading import (
        screen_space_shading)
    from isosurfacesuperresolution_tpu.train.trainer import clamp_output

    sequences = load_reference_npy_dir(args.dataset)
    ds = VideoDataset(sequences)
    rng = np.random.RandomState(42)
    samples = ds.collect_samples(args.samples, args.cropSize, 0.5, rng)
    test = DatasetFromSamples(ds, samples, args.cropSize, test=True,
                              test_fraction=0.2)
    shading_cfg = ShadingConfig()
    B = 16

    lows, flows, highs = zip(*[test[i] for i in range(len(test))])
    low_all = jnp.asarray(np.stack(lows))
    flow_all = jnp.asarray(np.stack(flows))
    high_all = jnp.asarray(np.stack(highs))
    N, T = low_all.shape[:2]

    # channel groups in the 6-ch target: mask 0, normal 1:4, depth 4, ao 5
    groups = {"none": [], "mask": [0], "normal": [1, 2, 3], "depth": [4],
              "ao": [5], "mask+normal": [0, 1, 2, 3]}

    def color_interior_psnr(pred, gt):
        sp = screen_space_shading(pred, shading_cfg)
        sg = screen_space_shading(gt, shading_cfg)
        return psnr(sp[:, B:-B, B:-B], sg[:, B:-B, B:-B])

    for spec in ["bilinear", args.run]:
        loaded = None if spec == "bilinear" else LoadedModel.from_run_dir(spec)
        acc = {g: 0.0 for g in groups}
        prev = None
        for t in range(T):
            lo = low_all[:, t]
            gt = high_all[:, t]
            if loaded is None:
                up = resize(lo, scale=4.0, method="bilinear")
                pred = jnp.concatenate([up, jnp.ones_like(up[..., :1])], -1)
            else:
                pred = clamp_output(loaded.inference(lo, prev,
                                                     flow_all[:, t]))
                prev = pred
            for g, idxs in groups.items():
                q = pred
                for i in idxs:
                    q = q.at[..., i].set(gt[..., i])
                acc[g] += float(jnp.sum(color_interior_psnr(q, gt)))
        name = os.path.basename(spec.rstrip("/"))
        line = "  ".join(f"{g}={acc[g] / (N * T):.2f}" for g in groups)
        print(f"{name:16s} color-interior PSNR with GT substituted: {line}",
              flush=True)


if __name__ == "__main__":
    main()
