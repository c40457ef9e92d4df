"""Large-volume render benchmark: the G-buffer raycast at 256/512/1024^3.

VERDICT round-1 item 4: prove the sweep scales to GVDB-class volumes
(the reference renders Ejecta/RM at 256-1024^3 through GVDB's sparse
atlas, `gvdb_volume_gvdb.h`; our answer is uint8 brick storage + the
occupancy-gated tiled Pallas march, `render/sweep_pallas_tiled.py`).

Measures the headline operating point (480x270 G-buffer, the 4x-SR
input resolution) per volume resolution with the chained-in-graph
methodology of `bench.py` (the tunneled transport does not block on
`block_until_ready`).  Prints a markdown table for PERF.md plus the
device HBM in use per configuration.

Usage:  python scripts/bench_volumes.py [--res 256,512,1024] [--frames 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_hbm_mb() -> float:
    import jax
    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("bytes_in_use", 0) / 1e6


def bench_res(res: int, family: str, N: int, sparse: bool = False,
              ao: bool = False):
    """Generate + bench one volume resolution; returns a result row."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.volume import analytic
    from isosurfacesuperresolution_tpu.volume.grid import BrickGrid

    # uint8 storage above 256^3: GVDB-class volumes must not eat HBM
    # (1024^3 f32 = 4.3 GB; uint8 = 1.07 GB + the brick pyramid)
    store = "float32" if res <= 256 else "uint8"
    t0 = time.time()
    cache = f"/tmp/{family}{res}_u8.npz"
    if store == "uint8" and os.path.exists(cache):
        z = np.load(cache)
        grid = BrickGrid(values=jnp.asarray(z["values"]),
                         brick_min=jnp.asarray(z["brick_min"]),
                         brick_max=jnp.asarray(z["brick_max"]),
                         bbox_min=jnp.asarray(z["bbox_min"]),
                         bbox_max=jnp.asarray(z["bbox_max"]),
                         brick_size=int(z["brick_size"]),
                         value_scale=float(z["value_scale"]),
                         value_offset=float(z["value_offset"]))
        print(f"[{res}^3] loaded cached {cache}", file=sys.stderr)
    else:
        grid = getattr(analytic, f"{family}_volume")(res)
        if store != "float32":
            dense = np.asarray(grid.dequant(grid.values))
            grid = BrickGrid.from_dense(dense, brick_size=grid.brick_size,
                                        store_dtype=store)
            del dense
            # persist for the next invocation (~45 min of 1-core numpy
            # at 1024^3; round 3's f5 stage burned its whole timeout
            # regenerating this - scripts/gen_volume_cache.py writes the
            # same file offline)
            np.savez(cache, values=np.asarray(grid.values),
                     brick_min=np.asarray(grid.brick_min),
                     brick_max=np.asarray(grid.brick_max),
                     bbox_min=np.asarray(grid.bbox_min),
                     bbox_max=np.asarray(grid.bbox_max),
                     brick_size=grid.brick_size,
                     value_scale=grid.value_scale,
                     value_offset=grid.value_offset)
            print(f"[{res}^3] cached {cache}", file=sys.stderr)
    if ao:
        # bake the SH occlusion field (one-time per volume+iso); above
        # 512^3 the full-res bake's dense f32 copies exceed HBM, so bake
        # at half resolution and upsample (AO is low-frequency); bf16
        # field halves the AO HBM (the kernels stream it at bf16 anyway)
        from isosurfacesuperresolution_tpu.render.ao_sweep import (
            attach_baked_ao)
        tb = time.time()
        # >512^3: half-res bake KEPT at half resolution (the hemisphere
        # integral is band-limited - the former host upsample added no
        # information, and the full-res copy's pass-2 capture cost is
        # what held 1024^3+AO at 15.4 FPS, r4_perf_ao1024c.log) +
        # uint8-quantized per channel; the tiled capture samples the
        # coarse field natively at 1/4 the DMA+matmul work
        import numpy as _np
        grid = attach_baked_ao(grid, 0.36, 0.2,
                               downsample=(2 if res > 512 else 1),
                               keep_coarse=res > 512,
                               out_dtype=(_np.uint8 if res > 512
                                          else jnp.bfloat16))
        print(f"[{res}^3] AO bake {time.time() - tb:.0f}s "
              f"({'half-res coarse' if res > 512 else 'full-res'}, "
              f"{grid.ao_sh.dtype} field "
              f"{grid.ao_sh.nbytes / 1e6:.0f} MB)",
              file=sys.stderr)
        store += "+ao"
    if sparse:
        from isosurfacesuperresolution_tpu.volume.packed import (
            SparseBrickGrid)
        # reference threshold-to-sparse tolerance (ExternalImporter.cpp:181)
        grid = SparseBrickGrid.from_brick_grid(grid, tolerance=1e-3)
        store += "/packed"
        frac = grid.storage_bytes() / grid.dense_bytes()
        print(f"[{res}^3] packed storage: {frac:.2f}x dense "
              f"({grid.storage_bytes() / 1e6:.0f} MB, 3 axes"
              f"{', incl. AO atlas' if ao else ''})",
              file=sys.stderr)
    gen_s = time.time() - t0
    occ = float((grid.brick_max >= 0.36).mean())
    print(f"[{res}^3 {store}] generated in {gen_s:.0f}s, "
          f"occupied bricks (iso .36): {100 * occ:.0f}%", file=sys.stderr)

    # ao_samples > 0 + ao_mode="volume" actually enables the baked-AO
    # capture: an earlier revision left ao_samples=0 here, so the table's
    # "+ao" rows carried the field without rendering it (the "+AO faster
    # than no-AO" giveaway) - those rows were re-measured
    cfg = RenderConfig(width=480, height=270, isovalue=0.36,
                       ao_samples=(64 if ao else 0),
                       ao_mode=("volume" if ao else "auto"),
                       renderer="sweep_pallas",
                       sweep_oversample=1.25, sweep_dtype="bfloat16")

    def cam_at(ang):
        eye = jnp.stack([1.7 * jnp.sin(ang), jnp.float32(0.9),
                         -1.7 * jnp.cos(ang)])
        return CameraParams(eye, jnp.zeros(3),
                            jnp.asarray([0.0, 1.0, 0.0]), 45.0)

    @partial(jax.jit, static_argnums=(2,))
    def run_frames(grid, ang0, n):
        def body(ang, _):
            cam = cam_at(ang)
            gb = render_frame_gbuffer(grid, cam, cam_at(ang - 0.03), cfg)
            # carried dependency: camera advances by a gb-derived
            # epsilon so frames can't be hoisted or reordered
            eps = 1e-9 * jnp.tanh(jnp.sum(gb[::32, ::32, 0]))
            return ang + 0.05 + eps, ()
        ang, _ = jax.lax.scan(body, ang0, None, length=n)
        return ang

    t0 = time.time()
    float(run_frames(grid, jnp.float32(0.0), N))
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        float(run_frames(grid, jnp.float32(0.1 + i), N))
        times.append((time.time() - t0) / N)
    ms = 1000 * min(times)
    hbm = device_hbm_mb()
    print(f"[{res}^3] compile {compile_s:.0f}s, render "
          f"{ms:.2f} ms/frame ({1000 / ms:.1f} FPS), HBM {hbm:.0f} MB",
          file=sys.stderr)
    return (res, store, ms, 1000 / ms, hbm, occ)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--res", default="256,512,1024")
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--family", default="blobs",
                   help="analytic family (blobs|gyroid|turbulence|ejecta)")
    p.add_argument("--sparse", action="store_true",
                   help="pack into SparseBrickGrid (atlas-indirect tiled "
                        "march; storage scales with occupancy)")
    p.add_argument("--ao", action="store_true",
                   help="bake the SH occlusion field and bench with the "
                        "AO-enabled G-buffer (tiled pass-2 capture); "
                        ">512^3 bakes half-res + upsamples")
    p.add_argument("--cpu", action="store_true",
                   help="hard-pin the CPU backend (sitecustomize re-pins "
                        "to the tunneled TPU otherwise)")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rows = []
    for res in [int(r) for r in args.res.split(",")]:
        # one bad resolution must not lose the others' rows
        try:
            rows.append(bench_res(res, args.family, args.frames,
                                  sparse=args.sparse, ao=args.ao))
        except Exception:
            print(f"[{res}^3] FAILED:", file=sys.stderr)
            traceback.print_exc()

    print("\n| volume | storage | render ms/frame | FPS | HBM MB | "
          "occupied bricks |")
    print("|---|---|---|---|---|---|")
    for res, store, ms, fps, hbm, occ in rows:
        print(f"| {args.family} {res}^3 | {store} | {ms:.2f} | {fps:.1f} "
              f"| {hbm:.0f} | {100 * occ:.0f}% |")


if __name__ == "__main__":
    main()
