"""Fine-grained stage timing of the planar v2 fused frame on the chip."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import (
    Config, ModelConfig, RenderConfig, ShadingConfig)
from isosurfacesuperresolution_tpu.infer.planar import (
    _amajor_cols, _conv, _edge_conv, clamp_output_planar,
    nested_from_flat_perm, planar_apply, planar_rgb_to_planes,
    planar_tail_conv, screen_space_shading_planar, upsample_stencil_kernel,
    warp_planar)
from isosurfacesuperresolution_tpu.models.generators import (
    create_network, network_input_channels)
from isosurfacesuperresolution_tpu.ops.fused_upsample import (
    compose_up2x_conv3x3, up2x_conv_bias)
from isosurfacesuperresolution_tpu.ops.resize import (
    pixel_shuffle, pixel_unshuffle)
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain


def t(name, step, carry0, n=20):
    dt = timed_chain(step, carry0, n=n)
    print(f"{name:44s} {1000 * dt:8.2f} ms", flush=True)
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
    p = params["params"]
    rng = np.random.RandomState(0)

    x0 = jnp.asarray(rng.rand(1, h, w, cin).astype(np.float32))
    t("planar_apply TOTAL",
      lambda c: jnp.concatenate(
          [planar_apply(params, cfg.model, c[..., :cin])[..., :96],
           c[..., 96:cin]], axis=-1), x0)

    # pieces
    feat0 = jnp.asarray(rng.rand(1, h, w, F).astype(np.float32)).astype(bf)
    k1 = compose_up2x_conv3x3(p["post1"]["kernel"], "bilinear")
    b1 = up2x_conv_bias(p["post1"]["bias"])
    def f1_step(c):
        z = jax.nn.relu(_edge_conv(c, k1, b1, dtype=bf))
        return z[..., :F]
    t("F1 composed conv @270p", f1_step, feat0)

    z1 = jnp.asarray(rng.rand(1, h, w, 4 * F).astype(np.float32)).astype(bf)
    def ps1_step(c):
        y = pixel_shuffle(c, 2)               # (540, 960, 64)
        return pixel_unshuffle(y * 1.0001, 2)
    t("PS1 + unPS pair (270p,256)", ps1_step, z1)

    z540 = jnp.asarray(rng.rand(1, 2 * h, 2 * w, F).astype(np.float32)
                       ).astype(bf)
    k2 = compose_up2x_conv3x3(p["post2"]["kernel"], "bilinear")
    k2 = k2[:, :, :, _amajor_cols(F)]
    b2 = jnp.tile(p["post2"]["bias"], 4)
    def f2_step(c):
        z = jax.nn.relu(_edge_conv(c, k2, b2, dtype=bf))
        return z[..., :F]
    t("F2 composed conv @540p", f2_step, z540)

    zp = jnp.asarray(rng.rand(1, 2 * h, 2 * w, 4 * F).astype(np.float32)
                     ).astype(bf)
    def p3_step(c):
        return jax.nn.relu(planar_tail_conv(
            c, p["post3"]["kernel"], p["post3"]["bias"], bf))
    t("post3 planar phase convs @540p", p3_step, zp)

    def out_step(c):
        y = planar_tail_conv(c, p["out"]["kernel"], p["out"]["bias"], bf)
        return jnp.concatenate([y] * 11, axis=-1)[..., :4 * F]
    t("out planar phase convs @540p", out_step, zp)

    z24 = jnp.asarray(rng.rand(1, 2 * h, 2 * w, 24).astype(np.float32))
    inv = np.empty(24, np.int64)
    inv[_amajor_cols(6)] = np.arange(24)
    def unsh_step(c):
        y = pixel_unshuffle(c[..., inv], 2)    # (270,480,96)
        return jnp.tile(y, (1, 2, 2, 1))[..., :24]
    t("A->c perm + unshuffle (540p,24)", unsh_step, z24)

    low0 = jnp.asarray(rng.rand(1, h, w, 5).astype(np.float32))
    kr = upsample_stencil_kernel(5, "bilinear", 4)
    kr = kr[:, :, :, nested_from_flat_perm(5)]
    def recon_step(c):
        y = _edge_conv(c, kr, dtype=jnp.float32)
        return y[..., :5]
    t("recon stencil conv @270p", recon_step, low0)

    prev0 = jnp.asarray(rng.rand(1, h, w, 96).astype(np.float32))
    flow0 = jnp.asarray(((rng.rand(1, h, w, 2) - 0.5) * 2).astype(np.float32))
    t("warp_planar v2 (R=8)",
      lambda c: warp_planar(c, flow0, special_mask=True), prev0)

    t("clamp planar", clamp_output_planar, prev0)
    def shade_step(c):
        rgb = screen_space_shading_planar(c, cfg.shading)
        return jnp.concatenate([rgb, rgb], axis=-1)
    t("shading planar", shade_step, prev0)

    rgbp = jnp.asarray(rng.rand(1, h, w, 48).astype(np.float32))
    def planes_step(c):
        pl = planar_rgb_to_planes(c)           # (1,3,1080,1920)
        lo = pl[:, :, ::4, ::4]                # (1,3,270,480)
        return jnp.moveaxis(lo, 1, -1).repeat(16, axis=-1)
    t("RGB planes transpose", planes_step, rgbp)


if __name__ == "__main__":
    main()
