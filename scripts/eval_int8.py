"""Quality A/B of the int8-PTQ planar path on trained weights.

Single-frame protocol (prev state = initial image): for each test crop of
a cached clip dataset, run `infer.planar.planar_apply` with and without
`ModelConfig.planar_int8` on the SAME trained parameters and report
per-channel masked PSNR vs ground truth plus the f32-vs-int8 delta.  The
delta is the quantization cost; the absolute numbers differ from
`apps.main_psnr_crops` (which runs the recurrent multi-frame protocol).

    python scripts/eval_int8.py --dataset /tmp/isosr_clips_mix2 \
        --run runs/run00009 [--samples 400]
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--run", required=True)
    p.add_argument("--samples", type=int, default=400)
    p.add_argument("--cropSize", type=int, default=32)
    p.add_argument("--testFraction", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cpu", action="store_true",
                   help="hard-pin JAX to CPU before first import")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.data.dataset import (
        DatasetFromSamples, VideoDataset, load_reference_npy_dir)
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.infer.planar import (
        planar_apply, state_from_flat, state_to_flat)
    from isosurfacesuperresolution_tpu.models.videotools import initial_image
    from isosurfacesuperresolution_tpu.ops.metrics import psnr
    from isosurfacesuperresolution_tpu.ops.resize import pixel_shuffle
    from isosurfacesuperresolution_tpu.train.trainer import clamp_output

    loaded = LoadedModel.from_run_dir(args.run)
    # bf16 on XLA-CPU is emulated (very slow); the TPU A/B uses the real
    # fast-path dtype
    base_cfg = dataclasses.replace(
        loaded.cfg.model,
        compute_dtype="float32" if args.cpu else "bfloat16")

    sequences = load_reference_npy_dir(args.dataset)
    ds = VideoDataset(sequences)
    rng = np.random.RandomState(args.seed)
    samples = ds.collect_samples(args.samples, args.cropSize, 0.5, rng)
    test = DatasetFromSamples(ds, samples, args.cropSize, test=True,
                              test_fraction=args.testFraction)
    print(f"test crops: {len(test)}")

    lows, _, highs = zip(*[test[i] for i in range(len(test))])
    low = jnp.asarray(np.stack(lows))[:, 0]          # (N, h, w, 5) frame 0
    high = jnp.asarray(np.stack(highs))[:, 0]        # (N, 4h, 4w, 6)

    import functools

    import jax as _jax

    @functools.partial(_jax.jit, static_argnums=(2,))
    def run(params, low, q):
        cfg = dataclasses.replace(base_cfg, planar_int8=q)
        prev = initial_image(low, 6, "input")        # (N, 4h, 4w, 6)
        from isosurfacesuperresolution_tpu.ops.resize import pixel_unshuffle
        prev_planar = state_from_flat(pixel_unshuffle(prev, 4))
        net_in = jnp.concatenate([low, prev_planar], axis=-1)
        out = planar_apply(params, cfg, net_in)
        return clamp_output(pixel_shuffle(state_to_flat(out), 4))

    B = 16
    names = ["mask", "normal", "depth", "ao"]
    slices = [(0, 1), (1, 4), (4, 5), (5, 6)]

    res = {}
    for tag, q in (("f32/bf16", False), ("int8", True)):
        pred = np.asarray(run(loaded.params, low, q))
        pc = jnp.asarray(pred[:, B:-B, B:-B])
        gc = high[:, B:-B, B:-B]
        mask = gc[..., 0:1] * 0.5 + 0.5
        vals = []
        for (a, b) in slices:
            m = None if a == 0 else mask
            vals.append(float(jnp.mean(psnr(pc[..., a:b], gc[..., a:b],
                                            mask=m))))
        res[tag] = vals
        print(f"{tag:9s} " + " ".join(f"{n}={v:6.2f}"
                                      for n, v in zip(names, vals)))
    d = [b - a for a, b in zip(res["f32/bf16"], res["int8"])]
    print("delta     " + " ".join(f"{n}={v:+6.2f}"
                                  for n, v in zip(names, d)))


if __name__ == "__main__":
    main()
