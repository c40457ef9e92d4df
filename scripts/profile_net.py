"""Micro-profile of EnhanceNet components on the real chip.

Isolates where the fused frame's network milliseconds go: low-res residual
trunk vs full-res post-block vs upsampling vs reconstruction, plus raw conv
throughput ceilings at both resolutions.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import Config, ModelConfig
from isosurfacesuperresolution_tpu.models.generators import (
    create_network, network_input_channels)
from isosurfacesuperresolution_tpu.ops.resize import pixel_shuffle, resize
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain


def t(name, step, carry0, n=20, flops=None):
    dt = timed_chain(step, carry0, n=n)
    extra = ""
    if flops:
        extra = f"   {flops / dt / 1e12:6.1f} TFLOP/s"
    print(f"{name:44s} {1000 * dt:8.2f} ms{extra}", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    h, w, F = 270, 480, 64
    bf = jnp.bfloat16

    cfg = Config(model=ModelConfig(compute_dtype="bfloat16"))
    model = create_network(cfg.model)
    cin = network_input_channels(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, cin), jnp.float32))
    rng = np.random.RandomState(0)

    # full model
    x0 = jnp.asarray(rng.rand(1, h, w, cin).astype(np.float32))
    def full_step(c):
        pred, _ = model.apply(params, c[..., :cin])
        return jnp.concatenate(
            [pred, jnp.zeros((1, h * 4, w * 4, cin - pred.shape[-1]),
                             pred.dtype)], axis=-1)[:, :h, :w, :]
    gf_full = 565e9
    t("full EnhanceNet apply", full_step,
      jnp.asarray(rng.rand(1, h, w, cin).astype(np.float32)), flops=gf_full)

    # conv throughput ceilings
    def mkconv(k_shape, seed=0):
        r = np.random.RandomState(seed)
        return jnp.asarray((r.rand(*k_shape) - 0.5).astype(np.float32) * 0.05,
                           ).astype(bf)

    k_lo = mkconv((3, 3, F, F))
    xlo = jnp.asarray(rng.rand(1, h, w, F).astype(np.float32)).astype(bf)
    def conv_n(c, k, n):
        for _ in range(n):
            c = jax.lax.conv_general_dilated(
                c, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            c = jnp.maximum(c, 0)
        return c
    gf1 = 2 * 9 * F * F * h * w
    t("20x conv64 @270x480 bf16", lambda c: conv_n(c, k_lo, 20), xlo,
      flops=20 * gf1)

    xhi = jnp.asarray(rng.rand(1, h * 4, w * 4, F).astype(np.float32)
                      ).astype(bf)
    gf2 = 2 * 9 * F * F * (h * 4) * (w * 4)
    t("3x conv64 @1080x1920 bf16", lambda c: conv_n(c, k_lo, 3), xhi,
      flops=3 * gf2)

    # single conv at 1080p, f32 accum output
    t("1x conv64 @1080p", lambda c: conv_n(c, k_lo, 1), xhi, flops=gf2)

    # resize 2x bilinear at each stage
    xmid = jnp.asarray(rng.rand(1, h * 2, w * 2, F).astype(np.float32)
                       ).astype(bf)
    def up_step(c):
        y = resize(c, scale=2.0, method="bilinear")
        return y[:, :c.shape[1], :c.shape[2], :]
    t("resize 2x bilinear 540->1080 (64ch)", up_step, xmid)
    def up_step2(c):
        y = resize(c, scale=2.0, method="bilinear")
        return y[:, :c.shape[1], :c.shape[2], :]
    t("resize 2x bilinear 270->540 (64ch)", up_step2, xlo)

    # pixelshuffle alternative: conv 64->256 @540p + shuffle
    k_ps = mkconv((3, 3, F, 4 * F))
    def ps_step(c):
        y = jax.lax.conv_general_dilated(
            c, k_ps, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = pixel_shuffle(y, 2)
        return y[:, :c.shape[1], :c.shape[2], :]
    t("conv64->256 @540p + pixelshuffle", ps_step, xmid,
      flops=2 * 9 * F * 4 * F * h * 2 * w * 2)

    # nearest 2x (reference default is nearest for enhancenet? check)
    def near_step(c):
        y = resize(c, scale=2.0, method="nearest")
        return y[:, :c.shape[1], :c.shape[2], :]
    t("resize 2x nearest 540->1080 (64ch)", near_step, xmid)

    # recon path: bilinear x4 of 5ch input to 1080p
    x5 = jnp.asarray(rng.rand(1, h, w, 5).astype(np.float32))
    def recon_step(c):
        y = resize(c, scale=4.0, method="bilinear")
        return y[:, :h, :w, :]
    t("resize 4x bilinear 270->1080 (5ch f32)", recon_step, x5)

    # f32 conv at 1080p for comparison
    k32 = mkconv((3, 3, F, F)).astype(jnp.float32)
    x32 = xhi.astype(jnp.float32)
    t("1x conv64 @1080p f32", lambda c: conv_n(c, k32, 1), x32, flops=gf2)


if __name__ == "__main__":
    main()
