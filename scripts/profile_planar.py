"""Measure planar-tail candidate primitives on the real chip.

The SR tail currently interleaves (pixel_shuffle) between every stage; each
interleave at 1080p costs ms and drops the feature dim to 64 (half the
128-lane tile).  Candidates:

  A. current: PS(540p,256) -> conv3x3@1080p(64->64)
  B. dilated: lax.conv(lhs_dilation=2) on planar (540p,256) -> 1080p,64
  C. planar:  conv2x2 (256->256, half-zeros) planar->planar @540p
  D. PS via conv_transpose selection kernel
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.ops.resize import pixel_shuffle
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain


def t(name, step, carry0, n=20, flops=None):
    dt = timed_chain(step, carry0, n=n)
    extra = f"   {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:52s} {1000 * dt:8.2f} ms{extra}", flush=True)
    return dt


def conv(x, k, dil=None, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, lhs_dilation=dil or (1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    bf = jnp.bfloat16
    rng = np.random.RandomState(0)
    F = 64

    def arr(*s):
        return jnp.asarray((rng.rand(*s) - 0.5).astype(np.float32)).astype(bf)

    zp = arr(1, 540, 960, 256)        # planar F2 output (= 1080p x 64)
    k3 = arr(3, 3, F, F) * 0.1

    # A. PS then conv3x3 @1080p  (carry planar; PS+conv+unPS per step)
    from isosurfacesuperresolution_tpu.ops.resize import pixel_unshuffle
    def a_step(c):
        hi = pixel_shuffle(c, 2)                    # (1080,1920,64)
        y = conv(hi, k3)
        return pixel_unshuffle(y, 2)
    gf = 2 * 9 * F * F * 1080 * 1920
    t("A: PS + conv3x3@1080p + unPS", a_step, zp, flops=gf)

    # A2: PS alone (PS + unPS pair)
    def a2_step(c):
        return pixel_unshuffle(pixel_shuffle(c, 2) * 1.0001, 2)
    t("A2: PS + unPS pair (x1.0001 between)", a2_step, zp)

    # B. dilated conv: planar in -> 1080p interleaved out
    # kernel (4,4,256,64): phase-structured; here random (same cost)
    k4 = arr(4, 4, 256, F) * 0.05
    def b_step(c):
        y = conv(c, k4, dil=(2, 2), pad=((2, 2), (2, 2)))
        y = y[:, :1080, :1920, :]  # (1080,1920,64)
        return pixel_unshuffle(y, 2)
    t("B: lhs_dilated conv (4,4,256,64) -> 1080p (+unPS)", b_step, zp,
      flops=2 * 4 * 256 * F * 1080 * 1920)

    # C. planar->planar conv 2x2 (256->256)
    k2 = arr(2, 2, 256, 256) * 0.05
    def c_step(c):
        return conv(c, k2, pad=((1, 0), (1, 0)))
    t("C: planar conv2x2 256->256 @540p", c_step, zp,
      flops=2 * 4 * 256 * 256 * 540 * 960)

    # C2. planar->planar conv 3x3 (256->256) - dense upper bound
    k33 = arr(3, 3, 256, 256) * 0.05
    t("C2: planar conv3x3 256->256 @540p",
      lambda c: conv(c, k33), zp, flops=2 * 9 * 256 * 256 * 540 * 960)

    # D. PS via conv_transpose selection kernel (2,2,256,64)
    sel = np.zeros((2, 2, 256, F), np.float32)
    for a in range(2):
        for b in range(2):
            for c0 in range(F):
                sel[a, b, c0 * 4 + a * 2 + b, c0] = 1.0
    ksel = jnp.asarray(sel).astype(bf)
    def d_step(c):
        y = jax.lax.conv_transpose(c, ksel, (2, 2), "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pixel_unshuffle(y, 2)
    t("D: conv_transpose selection PS (+unPS)", d_step, zp,
      flops=2 * 256 * F * 1080 * 1920)

    # E. conv 64->256 @540p planar out (the F2 stage itself, for reference)
    x540 = arr(1, 540, 960, F)
    kf2 = arr(3, 3, F, 256) * 0.05
    def e_step(c):
        y = conv(c, kf2)
        return y[..., :F]
    t("E: conv3x3 64->256 @540p (planar out)", e_step, x540,
      flops=2 * 9 * F * 256 * 540 * 960)

    # F. fully planar @270p: conv2x2 1024->1024 (the 1080p/16 granularity)
    zpp = arr(1, 270, 480, 1024)
    k2b = arr(2, 2, 1024, 1024) * 0.02
    def f_step(c):
        return conv(c, k2b, pad=((1, 0), (1, 0)))
    t("F: planar conv2x2 1024->1024 @270p", f_step, zpp,
      flops=2 * 4 * 1024 * 1024 * 270 * 480)

    # G. final small interleave: (540,960,12) -> (1080,1920,3) f32
    zrgb = jnp.asarray(rng.rand(1, 540, 960, 12).astype(np.float32))
    def g_step(c):
        y = pixel_shuffle(c, 2)
        return pixel_unshuffle(y, 2)
    t("G: PS+unPS (540,960,12) f32", g_step, zrgb)


if __name__ == "__main__":
    main()
