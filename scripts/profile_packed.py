"""Packed trunk conv vs XLA on the real chip."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from isosurfacesuperresolution_tpu.ops.packed_conv import (
    pack_pairs, packed_conv3x3, unpack_pairs)
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain

def t(name, step, carry0, n=10, flops=None):
    dt = timed_chain(step, carry0, n=n)
    extra = f"   {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:44s} {1000 * dt:8.2f} ms{extra}", flush=True)

def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    h, w = 270, 480
    x = jnp.asarray((rng.rand(1, h, w, 64) - 0.5).astype(np.float32)).astype(bf)
    ks = [jnp.asarray((rng.rand(3, 3, 64, 64) - 0.5).astype(np.float32)) * 0.1
          for _ in range(20)]
    b = jnp.zeros(64, jnp.float32)
    gf20 = 20 * 2 * 9 * 64 * 64 * h * w

    def xla_step(c):
        y = c
        for k in ks:
            y = jax.lax.conv_general_dilated(
                y, k.astype(bf), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y, 0)
        return y
    t("XLA 20x conv64 @270x480", xla_step, x, flops=gf20)

    xp = pack_pairs(x)
    for th in (8, 16, 32):
        def pk_step(c, th=th):
            y = c
            for k in ks:
                y = packed_conv3x3(y, k, b, relu=True, th=th)
            return y
        try:
            t(f"Pallas packed 20x th={th}", pk_step, xp, flops=gf20)
        except Exception as e:
            print(f"th={th} failed: {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

if __name__ == "__main__":
    main()
