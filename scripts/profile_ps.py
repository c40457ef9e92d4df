"""Micro-profile of interleave/data-movement primitives for the SR tail.

Answers: what does pixel_shuffle / pixel_unshuffle cost at frame sizes, and
which upsample formulation (resize, conv+PS, planar) is fastest end-to-end.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.ops.resize import (
    pixel_shuffle, pixel_unshuffle, resize)
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain


def t(name, step, carry0, n=20, flops=None):
    dt = timed_chain(step, carry0, n=n)
    extra = f"   {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:46s} {1000 * dt:8.2f} ms{extra}", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    bf = jnp.bfloat16
    rng = np.random.RandomState(0)
    F = 64

    def arr(*s):
        return jnp.asarray(rng.rand(*s).astype(np.float32)).astype(bf)

    # 1. pixel_shuffle x2 at 540p (the post2 fusion case)
    x540_256 = arr(1, 540, 960, 256)
    t("PS x2 (540,960,256)->(1080,1920,64)",
      lambda c: pixel_shuffle(c, 2)[:, :540, :960, :], x540_256)

    # 2. pixel_shuffle x2 at 270p
    x270_256 = arr(1, 270, 480, 256)
    t("PS x2 (270,480,256)->(540,960,64)",
      lambda c: pixel_shuffle(c, 2)[:, :270, :480, :], x270_256)

    # 3. pixel_unshuffle x4 at 1080p 6ch (flatten_high)
    x1080_6 = arr(1, 1080, 1920, 6).astype(jnp.float32)
    def unsh_step(c):
        y = pixel_unshuffle(c, 4)             # (1,270,480,96)
        return jnp.tile(y, (1, 4, 4, 1))[..., :6]
    t("unshuffle x4 1080p 6ch (+tile back)", unsh_step, x1080_6)

    # 4. conv 64->256 @540p, planar output (no shuffle)
    k = jnp.asarray((rng.rand(3, 3, F, 4 * F) - 0.5).astype(np.float32)
                    ).astype(bf) * 0.05
    x540_64 = arr(1, 540, 960, F)
    gf = 2 * 9 * F * 4 * F * 540 * 960
    def conv_step(c):
        y = jax.lax.conv_general_dilated(
            c, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[..., :F]
    t("conv 64->256 @540p (no PS)", conv_step, x540_64, flops=gf)

    # 5. conv + PS together
    def convps_step(c):
        y = jax.lax.conv_general_dilated(
            c, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pixel_shuffle(y, 2)[:, :540, :960, :F]
    t("conv 64->256 @540p + PS", convps_step, x540_64, flops=gf)

    # 6. W-only interleave: (H,W,2C) -> (H,2W,C) via reshape (no transpose)
    x540_128 = arr(1, 540, 960, 2 * F)
    def wint_step(c):
        *lead, h, w, cc = c.shape
        y = c.reshape(*lead, h, w * 2, cc // 2)
        return y[:, :, :960, :]
    t("W-interleave reshape (540,960,128)->(540,1920,64)", wint_step,
      x540_128)

    # 7. H-interleave via reshape on (H, 2, W, C) ordering
    def hint_step(c):
        *lead, h, w, cc = c.shape
        y = c.reshape(*lead, h, w, 2, cc // 2)       # (.. 540,960,2,64)
        y = jnp.moveaxis(y, -2, -3)                  # (.. 540,2,960,64)
        y = y.reshape(*lead, h * 2, w, cc // 2)
        return y[:, :540, :, :]
    t("H-interleave moveaxis (540,960,128)->(1080,960,64)", hint_step,
      x540_128)

    # 8. full PS x2 as two reshapes: channels (2,2,C): H then W
    def ps2_step(c):
        *lead, h, w, cc = c.shape                    # cc = 4C, order (a,b,C)
        C = cc // 4
        y = c.reshape(*lead, h, w, 2, 2 * C)
        y = jnp.moveaxis(y, -2, -3)                  # (h, 2, w, 2C)
        y = y.reshape(*lead, h * 2, w, 2 * C)
        y = y.reshape(*lead, h * 2, w * 2, C)
        return y[:, :h, :w, :]
    t("PS x2 via 2 reshapes (540,960,256)", ps2_step, x540_256)

    # 9. jax.image.resize x2 bilinear 540->1080 (reference point)
    x540b = arr(1, 540, 960, F)
    t("resize x2 bilinear 540->1080",
      lambda c: resize(c, scale=2.0, method="bilinear")[:, :540, :960, :],
      x540b)

    # 10. conv_transpose 64->64 stride2 k4 @540->1080
    kt = jnp.asarray((rng.rand(4, 4, F, F) - 0.5).astype(np.float32)
                     ).astype(bf) * 0.05
    def ct_step(c):
        y = jax.lax.conv_transpose(
            c, kt, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, :540, :960, :]
    t("conv_transpose 64->64 s2 k4 540->1080", ct_step, x540b,
      flops=2 * 16 * F * F * 1080 * 1920 // 4)


if __name__ == "__main__":
    main()
