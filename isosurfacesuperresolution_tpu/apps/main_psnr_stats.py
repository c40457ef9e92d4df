"""Paper-statistics harness: masked PSNR / MS-SSIM / consistency per model.

Parity target: `mainPSNR3_AllStats.py` - for each dataset (volume) and each
model (trained run dirs plus nearest/bilinear/bicubic baselines), run the
frame-recurrent inference over rendered sequences and accumulate the
Statistics table (border 15 px, fill >= 5%), writing one TSV per dataset and
npz histograms.

Usage:
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes analytic:torus analytic:blobs --models bilinear runs/run00001 \
      --output stats_out
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--volumes", nargs="+", default=["analytic:torus"],
                   help="analytic:<name>, .dat files, or .cvol.npz files")
    p.add_argument("--models", nargs="+", default=["bilinear"],
                   help="run dirs and/or nearest|bilinear|bicubic")
    p.add_argument("--variants", nargs="+", default=[],
                   help="named model variants 'name=spec[:notemporal]"
                        "[:masked]' (mainPSNR4_ColoredNets.py parity): "
                        "notemporal disables the frame recurrence, masked "
                        "replaces the predicted silhouette with the "
                        "upscaled input mask (and gates AO on it)")
    p.add_argument("--output", type=str, default="stats_out")
    p.add_argument("--numSequences", type=int, default=4)
    p.add_argument("--numFrames", type=int, default=10)
    p.add_argument("--highRes", type=int, default=256)
    p.add_argument("--aoSamples", type=int, default=64)
    p.add_argument("--isovalue", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    return p


def load_volume(spec: str):
    from isosurfacesuperresolution_tpu.volume import analytic
    from isosurfacesuperresolution_tpu.volume.importers import (
        import_raw, load_cvol)
    if spec.startswith("analytic:"):
        parts = spec.split(":")        # analytic:<name>[:<resolution>]
        name = parts[1]
        res = int(parts[2]) if len(parts) > 2 else 128
        return getattr(analytic, f"{name}_volume")(res), name
    if spec.endswith(".dat"):
        return import_raw(spec), os.path.basename(spec)[:-4]
    if spec.endswith(".npz"):
        return load_cvol(spec), os.path.basename(spec).split(".")[0]
    if spec.endswith(".npy"):
        from isosurfacesuperresolution_tpu.volume.importers import import_npy
        return import_npy(spec), os.path.basename(spec)[:-4]
    if spec.endswith(".vdb"):
        from isosurfacesuperresolution_tpu.volume.vdb import load_vdb
        grid, _ = load_vdb(spec)
        return grid, os.path.basename(spec)[:-4]
    raise SystemExit(f"unknown volume spec {spec}")


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.bench.stats import Statistics
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.data.generation import (
        SequenceConfig, generate_sequences)
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.ops.resize import resize
    from isosurfacesuperresolution_tpu.train.trainer import clamp_output

    os.makedirs(args.output, exist_ok=True)

    for vol_spec in args.volumes:
        grid, vol_name = load_volume(vol_spec)
        seq_cfg = SequenceConfig(num_frames=args.numFrames,
                                 high_res=args.highRes,
                                 ao_samples=args.aoSamples,
                                 iso_range=(args.isovalue, args.isovalue))
        base = RenderConfig(isovalue=args.isovalue, step_voxels=0.5)
        sequences = generate_sequences([(grid, (args.isovalue,
                                                args.isovalue))],
                                       args.numSequences, seq_cfg,
                                       base_render_cfg=base, seed=args.seed)

        # plain --models plus mainPSNR4-style named --variants
        entries = []
        for model_spec in args.models:
            default_name = (model_spec
                            if model_spec in ("nearest", "bilinear",
                                              "bicubic")
                            else os.path.basename(model_spec.rstrip("/")))
            entries.append((default_name, model_spec, True, False))
        for v in args.variants:
            name, rest = v.split("=", 1)
            parts = rest.split(":")
            spec = parts[0]
            flags = set(parts[1:])
            unknown = flags - {"notemporal", "masked"}
            if unknown:
                raise SystemExit(f"unknown variant flags {unknown}")
            entries.append((name, spec, "notemporal" not in flags,
                            "masked" in flags))

        out_path = os.path.join(args.output, f"stats_{vol_name}.tsv")
        err_rows = []       # (model, seq_spread dict) for the _err table
        with open(out_path, "w") as f:
            f.write("Model\t" + Statistics.header())
            for name, model_spec, temporal, masked in entries:
                loaded: Optional[LoadedModel] = None
                if model_spec not in ("nearest", "bilinear", "bicubic"):
                    loaded = LoadedModel.from_run_dir(model_spec)
                stats = Statistics()
                for seq in sequences:
                    prev_high = None
                    T = seq["low"].shape[0]
                    for t in range(T):
                        low = jnp.asarray(seq["low"][t:t + 1])
                        gt = jnp.asarray(seq["high"][t:t + 1])
                        flow = jnp.asarray(seq["flow"][t:t + 1])
                        if loaded is None:
                            up = resize(low, scale=4.0, method=model_spec)
                            pred = jnp.concatenate(
                                [up, jnp.ones_like(up[..., :1])], -1)
                        else:
                            pred = clamp_output(
                                loaded.inference(low, prev_high, flow))
                            if temporal:
                                prev_high = pred
                        if masked:
                            # silhouette from the upscaled input; AO gated
                            # toward 1 outside it (mainComparisonVideo3.py
                            # :544-548, used by mainPSNR4's variants)
                            base = resize(low[..., 0:1], scale=4.0,
                                          method="bilinear") * 0.5 + 0.5
                            pred = jnp.concatenate([
                                base * 2.0 - 1.0,
                                pred[..., 1:5],
                                1.0 + base * (pred[..., 5:6] - 1.0),
                            ], axis=-1)
                        stats.add_timestep_sample(pred, gt, low)
                    stats.mark_sequence()
                f.write(name + "\t")
                stats.write_sample(f)
                err_rows.append((name, stats.seq_spread()))
                np.savez(os.path.join(
                    args.output, f"hist_{vol_name}_{name}.npz"),
                    # per-sequence per-field means ride along so model
                    # comparisons can be PAIRED (same sequences for
                    # every model; the marginal stds in _err.tsv are
                    # conservative for A-vs-B questions)
                    **{f"seq_{k}": np.array([m[k] for m in
                                             stats.seq_means])
                       for k in (stats.seq_means[0] if stats.seq_means
                                 else {})},
                    **stats.histograms)
                m = stats.means()
                print(f"[{vol_name}] {name}: "
                      f"PSNR color+AO {m['psnr_color_withAO']:.2f} dB, "
                      f"normal {m['psnr_normal']:.2f} dB "
                      f"({stats.n} frames)")
        print("wrote", out_path)

        # per-sequence uncertainty table (mean +- std over sequences per
        # mean-type field); _max fields are global and carry no spread
        err_path = os.path.join(args.output, f"stats_{vol_name}_err.tsv")
        with open(err_path, "w") as f:
            f.write("Model\tField\tMean\tStd\tMin\tMax\tNseq\n")
            for name, spread in err_rows:
                for field, s in spread.items():
                    f.write(f"{name}\t{field}\t{s['mean']:.6f}\t"
                            f"{s['std']:.6f}\t{s['min']:.6f}\t"
                            f"{s['max']:.6f}\t{s['nseq']}\n")
        print("wrote", err_path)


if __name__ == "__main__":
    main()
