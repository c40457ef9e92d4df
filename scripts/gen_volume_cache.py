"""Pre-generate uint8 BrickGrid caches for the large-volume benchmarks.

1024^3 analytic generation takes ~20 min of host CPU; doing it inside
`scripts/bench_volumes.py` leaves the TPU idle and (measured in round 2)
starves a concurrent trainer's host pipeline.  Run this on an otherwise
idle CPU ahead of time; `bench_volumes.py` picks the cache up from
``/tmp/<family><res>_u8.npz`` automatically.

Usage:  python scripts/gen_volume_cache.py [--res 512,1024] [--family blobs]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--res", default="512,1024")
    p.add_argument("--family", default="blobs")
    p.add_argument("--out", default="/tmp")
    args = p.parse_args()

    # hard-pin CPU BEFORE jax initializes: sitecustomize re-pins to the
    # tunneled TPU otherwise, and this job must never touch the chip
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from isosurfacesuperresolution_tpu.volume import analytic
    from isosurfacesuperresolution_tpu.volume.grid import BrickGrid

    os.makedirs(args.out, exist_ok=True)
    for res in [int(r) for r in args.res.split(",")]:
        path = os.path.join(args.out, f"{args.family}{res}_u8.npz")
        if os.path.exists(path):
            print(f"{path}: exists, skipping")
            continue
        t0 = time.time()
        g = getattr(analytic, f"{args.family}_volume")(res)
        dense = np.asarray(g.dequant(g.values))
        q = BrickGrid.from_dense(dense, brick_size=g.brick_size,
                                 store_dtype="uint8")
        del dense
        np.savez(path,
                 values=np.asarray(q.values),
                 brick_min=np.asarray(q.brick_min),
                 brick_max=np.asarray(q.brick_max),
                 bbox_min=np.asarray(q.bbox_min),
                 bbox_max=np.asarray(q.bbox_max),
                 brick_size=q.brick_size,
                 value_scale=q.value_scale,
                 value_offset=q.value_offset)
        print(f"{path}: {res}^3 uint8 in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
