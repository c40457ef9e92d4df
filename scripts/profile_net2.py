"""Compare full EnhanceNet apply: unfused vs fused upsample vs pixelShuffle."""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import Config, ModelConfig
from isosurfacesuperresolution_tpu.models.generators import (
    create_network, network_input_channels)
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    h, w = 270, 480
    base = ModelConfig(compute_dtype="bfloat16")
    variants = {
        "bilinear unfused": base,
        "bilinear FUSED": dataclasses.replace(base, fused_upsample=True),
        "nearest FUSED": dataclasses.replace(base, upsample="nearest",
                                             fused_upsample=True),
        "pixelShuffle": dataclasses.replace(base, upsample="pixelShuffle"),
    }
    rng = np.random.RandomState(0)
    for name, cfg in variants.items():
        model = create_network(cfg)
        cin = network_input_channels(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 8, cin), jnp.float32))
        x0 = jnp.asarray(rng.rand(1, h, w, cin).astype(np.float32))

        def step(c):
            pred, _ = model.apply(params, c[..., :cin])
            lo = pred[:, ::4, ::4, :]           # (1,h,w,6)
            return jnp.concatenate([lo, c[..., 6:]], axis=-1)

        dt = timed_chain(step, x0, n=20)
        print(f"{name:24s} {1000 * dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
