"""Does the existing Pallas conv beat XLA on the planar tail shapes?"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.ops.pallas_conv import conv3x3_pallas_p128
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain


def t(name, step, carry0, n=20, flops=None):
    dt = timed_chain(step, carry0, n=n)
    extra = f"   {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:52s} {1000 * dt:8.2f} ms{extra}", flush=True)
    return dt


def conv_xla(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    # post3 dense shape: (540,960,256)x(3,3,256,256)
    x = jnp.asarray((rng.rand(1, 540, 960, 256) - 0.5).astype(np.float32)
                    ).astype(bf)
    k = jnp.asarray((rng.rand(3, 3, 256, 256) - 0.5).astype(np.float32)
                    ).astype(bf) * 0.05
    b = jnp.zeros((256,), jnp.float32)
    gf = 2 * 9 * 256 * 256 * 540 * 960

    t("XLA dense (3,3,256,256)@540p", lambda c: conv_xla(c, k), x, flops=gf)

    for th in (8, 16, 32):
        try:
            t(f"Pallas p128 th={th}",
              lambda c, th=th: conv3x3_pallas_p128(c, k, b, th=th), x,
              flops=gf)
        except Exception as e:
            print(f"Pallas th={th} failed: {type(e).__name__}: {e}",
                  flush=True)

    # trunk shape padded: (270,480,128)x(3,3,128,128)
    x2 = jnp.asarray((rng.rand(1, 270, 480, 128) - 0.5).astype(np.float32)
                     ).astype(bf)
    k2 = jnp.asarray((rng.rand(3, 3, 128, 128) - 0.5).astype(np.float32)
                     ).astype(bf) * 0.05
    b2 = jnp.zeros((128,), jnp.float32)
    gf2 = 2 * 9 * 128 * 128 * 270 * 480
    t("XLA (3,3,128,128)@270p", lambda c: conv_xla(c, k2), x2, flops=gf2)
    for th in (16, 32):
        try:
            t(f"Pallas p128 trunk th={th}",
              lambda c, th=th: conv3x3_pallas_p128(c, k2, b2, th=th), x2,
              flops=gf2)
        except Exception as e:
            print(f"Pallas trunk th={th} failed: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()


def phase():
    import jax, jax.numpy as jnp, numpy as np
    from isosurfacesuperresolution_tpu.ops.phase_conv import (
        phase_conv3x3_amajor)
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(1, 540, 960, 256) - 0.5).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k3 = jnp.asarray((rng.rand(3, 3, 64, 64) - 0.5).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.rand(64).astype(np.float32))
    gf_useful = 2 * 9 * 64 * 64 * 1080 * 1920   # the logical conv's FLOPs
    for th in (8, 16, 32):
        try:
            t(f"phase_conv th={th}",
              lambda c, th=th: phase_conv3x3_amajor(c, k3, b, relu=True,
                                                    th=th), x,
              flops=gf_useful)
        except Exception as e:
            print(f"phase th={th} failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
