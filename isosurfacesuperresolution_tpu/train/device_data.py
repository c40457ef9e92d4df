"""Device-resident clip dataset: on-device crop slicing.

The reference streams batches host->GPU every iteration
(`mainVideoUnshaded.py:405`, `batch[i].to(device)`).  Through this
environment's tunneled TPU transport that upload (~66 MB per batch-16 clip
batch) dominates the epoch time, so the whole clip set is uploaded ONCE
(e.g. 24 full sequences ~ 1.6 GB in HBM) and batches are assembled on device
with `dynamic_slice` - the host only ships (index, y, x) triples per batch.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.data.dataset import Sample


class DeviceVideoDataset:
    """Sequences stacked on device + jit'd crop gather.

    All sequences must share (T, h, w); crops are (crop, crop) low-res,
    4x high-res, matching `data.dataset.VideoDataset.get_clip` (without
    augmentation - device batches are used for the throughput path;
    augmented training falls back to host batching).
    """

    def __init__(self, sequences, upscale_factor: int = 4,
                 store_dtype=jnp.float32):
        """``store_dtype=jnp.bfloat16`` halves the HBM footprint of the
        resident dataset (crops are cast back to f32 at slice time);
        quantizes G-buffer values by ~3e-3 relative - below the renderer's
        half-voxel refinement error, but off by default so loss targets
        stay bit-exact."""
        self.low = jnp.asarray(np.stack([s["low"] for s in sequences]),
                               store_dtype)
        self.high = jnp.asarray(np.stack([s["high"] for s in sequences]),
                                store_dtype)
        self.flow = jnp.asarray(np.stack([s["flow"] for s in sequences]),
                                store_dtype)
        self.upscale = upscale_factor
        self.num_sequences = self.low.shape[0]

    def nbytes(self) -> int:
        return (self.low.nbytes + self.high.nbytes + self.flow.nbytes)

    def gather_batch(self, idx: jnp.ndarray, ys: jnp.ndarray,
                     xs: jnp.ndarray, crop: int):
        """(B,) indices/origins -> (low, flow, high) device batches."""
        return _gather_crops(self.low, self.high, self.flow, idx, ys, xs,
                             crop, self.upscale)

    def batches(self, samples: Sequence[Sample], batch_size: int,
                crop: int, shuffle: bool = True,
                rng: Optional[np.random.RandomState] = None,
                drop_last: bool = True):
        """Yield device batches for a host-side sample list."""
        order = np.arange(len(samples))
        if shuffle:
            (rng or np.random.RandomState(0)).shuffle(order)
        end = (len(order) // batch_size * batch_size if drop_last
               else len(order))
        for i in range(0, end, batch_size):
            sel = [samples[j] for j in order[i:i + batch_size]]
            idx = jnp.asarray([s.index for s in sel], jnp.int32)
            ys = jnp.asarray([s.y for s in sel], jnp.int32)
            xs = jnp.asarray([s.x for s in sel], jnp.int32)
            yield self.gather_batch(idx, ys, xs, crop)


@partial(jax.jit, static_argnames=("crop", "upscale"))
def _gather_crops(low, high, flow, idx, ys, xs, crop, upscale):
    T = low.shape[1]

    def one(i, y, x):
        lo = jax.lax.dynamic_slice(
            low, (i, 0, y, x, 0), (1, T, crop, crop, low.shape[-1]))[0]
        fl = jax.lax.dynamic_slice(
            flow, (i, 0, y, x, 0), (1, T, crop, crop, 2))[0]
        hi = jax.lax.dynamic_slice(
            high, (i, 0, y * upscale, x * upscale, 0),
            (1, T, crop * upscale, crop * upscale, high.shape[-1]))[0]
        return (lo.astype(jnp.float32), fl.astype(jnp.float32),
                hi.astype(jnp.float32))

    return jax.vmap(one)(idx, ys, xs)
