"""Dataset-scale AO fidelity: baked SH-L1 field vs hemisphere-ray AO.

VERDICT r4 weak #8: the SH-L1 bake's error against the reference's
hemisphere-ray AO (`render_kernel.cu:109-146`; our oracle
`render/raycast.compute_ao`) was bounded only on small analytic shapes
(`tests/test_ao_sweep.py`).  This script measures the same bound on a
dataset-scale volume - the 512^3 ejecta RAW/.dat that the 512 training
runs use - and writes the numbers to
`artifacts/quality/ao_fidelity/ao_fidelity.tsv`.

CPU-safe (use scripts/cpurun.py); the march oracle is gather-bound so
the image is kept small - error statistics need surface coverage, not
resolution.

Usage:
  python scripts/cpurun.py scripts/ao_fidelity.py \
      [--volume /tmp/isosr_vol512/ejecta512.dat] [--res 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", default="/tmp/isosr_vol512/ejecta512.dat",
                    help=".dat RAW volume or analytic:<name>:<res>")
    ap.add_argument("--res", type=int, default=40)
    ap.add_argument("--isovalue", type=float, default=0.4)
    ap.add_argument("--aoRadius", type=float, default=0.2)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--downsample", type=int, default=2,
                    help="bake resolution divisor (2 = the training-"
                         "data config; 1 = full-res diagnostic)")
    ap.add_argument("--numDirs", type=int, default=48)
    ap.add_argument("--numSteps", type=int, default=12)
    ap.add_argument("--tag", default="ao_fidelity",
                    help="output file stem (diagnostic variants)")
    ap.add_argument("--output",
                    default="artifacts/quality/ao_fidelity")
    args = ap.parse_args()

    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.render.ao_sweep import (
        attach_baked_ao)
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.render.raycast import render_gbuffer
    from isosurfacesuperresolution_tpu.render.sweep import (
        render_gbuffer_sweep)

    if args.volume.startswith("analytic:"):
        from isosurfacesuperresolution_tpu.volume import analytic
        parts = args.volume.split(":")
        res = int(parts[2]) if len(parts) > 2 else 128
        grid = getattr(analytic, f"{parts[1]}_volume")(res)
    else:
        from isosurfacesuperresolution_tpu.volume.importers import (
            import_raw)
        grid = import_raw(args.volume)
    print(f"volume {args.volume}: {grid.values.shape} "
          f"{grid.values.dtype}", flush=True)

    t0 = time.time()
    grid_b = attach_baked_ao(grid, args.isovalue, args.aoRadius,
                             num_dirs=args.numDirs,
                             num_steps=args.numSteps,
                             downsample=args.downsample)
    print(f"bake (downsample={args.downsample}, dirs={args.numDirs}, "
          f"steps={args.numSteps}): {time.time() - t0:.0f}s", flush=True)

    cfg_ray = RenderConfig(width=args.res, height=args.res,
                           isovalue=args.isovalue, step_voxels=0.5,
                           ao_samples=32, ao_radius=args.aoRadius,
                           ao_ray_steps=128, ao_mode="ray",
                           renderer="march")
    cfg_vol = cfg_ray.replace(ao_mode="volume", renderer="sweep")

    rows = []
    eyes = [(0.0, 0.9, -1.7), (1.2, 0.6, -1.2), (-0.9, 1.1, 1.0)]
    for vi in range(min(args.views, len(eyes))):
        cam = CameraParams.create(eyes[vi])
        t0 = time.time()
        ref = np.asarray(render_gbuffer(grid, cam, cam, cfg_ray))
        t_ray = time.time() - t0
        t0 = time.time()
        got = np.asarray(render_gbuffer_sweep(grid_b, cam, cam, cfg_vol))
        t_sweep = time.time() - t0
        both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
        n = int(both.sum())
        if n < 50:
            print(f"view {vi}: only {n} common surface px, skipped",
                  flush=True)
            continue
        a = ref[..., 10][both]
        b = got[..., 10][both]
        d = np.abs(a - b)
        corr = float(np.corrcoef(1 - a, 1 - b)[0, 1]) \
            if a.std() > 1e-6 and b.std() > 1e-6 else float("nan")
        rows.append((vi, n, float(d.mean()), float(d.max()),
                     float(np.percentile(d, 95)), corr))
        print(f"view {vi}: n={n} mean|d|={d.mean():.4f} "
              f"p95={np.percentile(d, 95):.4f} max={d.max():.4f} "
              f"corr={corr:.3f} (ray {t_ray:.0f}s, sweep {t_sweep:.0f}s)",
              flush=True)

    os.makedirs(args.output, exist_ok=True)
    out = os.path.join(args.output, f"{args.tag}.tsv")
    with open(out, "w") as f:
        f.write("# baked SH-L1 (downsample=%d, dirs=%d, steps=%d) vs "
                "32-sample hemisphere-ray AO on %s, iso %.2f, "
                "radius %.2f\n"
                % (args.downsample, args.numDirs, args.numSteps,
                   os.path.basename(args.volume), args.isovalue,
                   args.aoRadius))
        f.write("view\tn_px\tmeanAbsErr\tmaxAbsErr\tp95AbsErr\t"
                "occlusionCorr\n")
        for r in rows:
            f.write("%d\t%d\t%.5f\t%.5f\t%.5f\t%.4f\n" % r)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
