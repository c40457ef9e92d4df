"""bench_volumes uint8 cache round-trip: generate-save-load parity.

Round 3's f5 stage burned its whole timeout regenerating the 1024^3
volume because the bench knew how to LOAD /tmp/<family><res>_u8.npz but
never wrote it.  This pins the save/load path at a tiny resolution.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_uint8_cache_roundtrip(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.volume import analytic
    from isosurfacesuperresolution_tpu.volume.grid import BrickGrid

    g = analytic.blobs_volume(32, num_blobs=3, seed=7)
    dense = np.asarray(g.dequant(g.values))
    q = BrickGrid.from_dense(dense, brick_size=g.brick_size,
                             store_dtype="uint8")
    path = tmp_path / "blobs32_u8.npz"
    # the exact keys bench_volumes.bench_res and gen_volume_cache write
    np.savez(path, values=np.asarray(q.values),
             brick_min=np.asarray(q.brick_min),
             brick_max=np.asarray(q.brick_max),
             bbox_min=np.asarray(q.bbox_min),
             bbox_max=np.asarray(q.bbox_max),
             brick_size=q.brick_size,
             value_scale=q.value_scale, value_offset=q.value_offset)
    z = np.load(path)
    r = BrickGrid(values=jnp.asarray(z["values"]),
                  brick_min=jnp.asarray(z["brick_min"]),
                  brick_max=jnp.asarray(z["brick_max"]),
                  bbox_min=jnp.asarray(z["bbox_min"]),
                  bbox_max=jnp.asarray(z["bbox_max"]),
                  brick_size=int(z["brick_size"]),
                  value_scale=float(z["value_scale"]),
                  value_offset=float(z["value_offset"]))
    np.testing.assert_array_equal(np.asarray(r.values),
                                  np.asarray(q.values))
    np.testing.assert_allclose(np.asarray(r.dequant(r.values)),
                               np.asarray(q.dequant(q.values)))
    # quantized volume reconstructs the dense field to uint8 precision
    err = np.abs(np.asarray(r.dequant(r.values)) - dense).max()
    assert err <= float(z["value_scale"]) * 0.5 + 1e-6
