"""Main loss module for unshaded G-buffer networks.

Parity target: `losses/lossnet_unshaded.py` - the criterion of the primary
trainer `mainVideoUnshaded.py`.  Channels: input 5 (mask, normal, depth),
output 6 (+ AO).  Color losses are computed on the *shaded* output of the
unshaded network via the built-in screen-space shading (`:116-126`), per-
channel losses are gated by the clamped ground-truth mask, and up to three
discriminators operate on colorized 8-channel stacks (spatial-temporal 26ch,
temporal 16ch, spatial 13ch).

Functional design: the class captures only *static* structure (which losses
are active, discriminator modules, the VGG); every invocation is a pure
function of explicit parameter pytrees, so generator loss and discriminator
loss each compile into the jit'd train steps of `train/trainer.py`.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import (
    LossConfig, ShadingConfig, parse_layer_weights)
from isosurfacesuperresolution_tpu.losses import builder
from isosurfacesuperresolution_tpu.losses.discriminators import (
    build_discriminator)
from isosurfacesuperresolution_tpu.losses.vgg import (
    VGG19Features, load_vgg19_params, max_conv_needed)
from isosurfacesuperresolution_tpu.render.shading import (
    safe_normalize, screen_space_shading)


class LossNetUnshaded:
    """Loss stack for 5-in/6-out unshaded networks."""

    def __init__(self, cfg: LossConfig, high_res: int,
                 input_channels: int = 5, output_channels: int = 6,
                 upscale_factor: int = 4,
                 use_spectral_norm: bool = False):
        assert input_channels == 5, "mask, normalXYZ, depth"
        assert output_channels == 6, "mask, normalXYZ, depth, AO"
        self.cfg = cfg
        self.upscale_factor = upscale_factor
        self.padding = cfg.padding
        self.weights = cfg.weight_dict()
        self.high_res = high_res

        # shading used for color losses (parity: lossnet_unshaded.py:116-126)
        self.shading_cfg = ShadingConfig(
            ambient_color=(cfg.loss_ambient,) * 3,
            diffuse_color=(cfg.loss_diffuse,) * 3,
            specular_color=(cfg.loss_specular,) * 3,
            specular_exponent=16,
            enable_specular=False,
            light_direction=(0.0, 0.0, 1.0),
            material_color=(1.0, 1.0, 1.0),
            ao_strength=cfg.loss_ao,
        )

        names = {k for k, _ in self.weights}
        self.has_temporal_l2 = "temp-l2" in names
        self.has_adv = ("adv", "all") in self.weights
        self.has_tgan = ("tgan", "all") in self.weights
        self.has_sgan = ("sgan", "all") in self.weights
        self.has_discriminator = self.has_adv or self.has_tgan or self.has_sgan
        self.has_perceptual = any(k == "perceptual" for k, _ in self.weights)
        self.has_texture = any(k == "texture" for k, _ in self.weights)

        self.discriminators: Dict[str, nn.Module] = {}
        if self.has_adv:      # input(5) + prev_input(5) + pred(8) + prev(8)
            self.discriminators["adv"] = build_discriminator(
                cfg.discriminator, high_res, 26, use_spectral_norm)
        if self.has_tgan:     # pred(8) + prev(8)
            self.discriminators["tgan"] = build_discriminator(
                cfg.discriminator, high_res, 16, use_spectral_norm)
        if self.has_sgan:     # input(5) + pred(8)
            self.discriminators["sgan"] = build_discriminator(
                cfg.discriminator, high_res, 13, use_spectral_norm)

        self.content_layers = (parse_layer_weights(cfg.perceptual_loss_layers)
                               if self.has_perceptual else [])
        self.style_layers = (parse_layer_weights(cfg.texture_loss_layers)
                             if self.has_texture else [])
        self.vgg: Optional[VGG19Features] = None
        if self.has_perceptual or self.has_texture:
            self.vgg = VGG19Features(max_conv=max_conv_needed(
                self.content_layers + self.style_layers))

    # -- parameter management ------------------------------------------------
    def init(self, rng: jax.Array) -> Dict:
        """Initialize discriminator + VGG parameter pytrees."""
        params: Dict = {"discr": {}, "vgg": None}
        for name, module in self.discriminators.items():
            rng, sub = jax.random.split(rng)
            x = jnp.zeros((1, self.high_res, self.high_res,
                           {"adv": 26, "tgan": 16, "sgan": 13}[name]))
            params["discr"][name] = module.init(sub, x)
        if self.vgg is not None:
            rng, sub = jax.random.split(rng)
            params["vgg"], self.vgg_pretrained = load_vgg19_params(
                self.vgg.max_conv, sub)
        return params

    # -- helpers -------------------------------------------------------------
    def _pad(self, img: jnp.ndarray) -> jnp.ndarray:
        return builder.pad_border_zero(img, self.padding)

    def _shade(self, buf: jnp.ndarray) -> jnp.ndarray:
        return screen_space_shading(buf, self.shading_cfg)

    def _colorize(self, t: jnp.ndarray) -> jnp.ndarray:
        """6ch unshaded -> 8ch (mask, normal, color, ao), normalized normal.

        Parity: generator-side stack `lossnet_unshaded.py:313-331` and the
        discriminator-side `colorize_and_pad` (`:429-437`), which produce the
        same channels in different order; the generator-side order
        (mask, normal, color, ao) is used consistently here.
        """
        mask = t[..., 0:1]
        normal = safe_normalize(t[..., 1:4])
        color = self._shade(jnp.concatenate([mask, normal, t[..., 4:6]],
                                            axis=-1))
        return jnp.concatenate([mask, normal, color, t[..., 5:6]], axis=-1)

    # -- generator loss ------------------------------------------------------
    def __call__(self, params: Dict,
                 gt: jnp.ndarray, pred: jnp.ndarray,
                 input_high: jnp.ndarray,
                 prev_input_warped: Optional[jnp.ndarray],
                 prev_pred_warped: Optional[jnp.ndarray],
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Generator-side loss (parity: `lossnet_unshaded.py:188-390`).

        gt / pred : (B, H, W, 6) high-res target and prediction.
        input_high : (B, H, W, 5) upsampled low-res input.
        prev_input_warped : (B, H, W, 5) warped upsampled previous input
            (discriminator only).
        prev_pred_warped : (B, H, W, 6) warped previous prediction
            (temporal losses); on the first frame the trainer passes the GT
            (`mainVideoUnshaded.py:426`).
        """
        w = self.weights
        gt = self._pad(gt)
        pred = self._pad(pred)
        if prev_pred_warped is not None:
            prev_pred_warped = self._pad(prev_pred_warped)

        gt_mask = gt[..., 0:1]
        gt_mask_clamp = jnp.clip(gt_mask * 0.5 + 0.5, 0.0, 1.0)
        gt_normal = safe_normalize(gt[..., 1:4])
        gt_depth = gt[..., 4:5]
        gt_ao = gt[..., 5:6]
        pred_mask = pred[..., 0:1]
        pred_normal = safe_normalize(pred[..., 1:4])
        pred_depth = pred[..., 4:5]
        pred_ao = pred[..., 5:6]
        in_mask = input_high[..., 0:1]
        in_mask_clamp = jnp.clip(in_mask * 0.5 + 0.5, 0.0, 1.0)
        in_normal = safe_normalize(input_high[..., 1:4])
        in_depth = input_high[..., 4:5]

        gt_color = self._shade(gt)
        pred_color = self._shade(pred)
        input_color = self._shade(input_high)

        total = jnp.zeros(())
        values: Dict[str, jnp.ndarray] = {}

        # always track mse:color for PSNR logging (reference weight 0.0)
        mse_color = builder.mse(gt_color, pred_color)
        values["mse:color"] = mse_color

        pairs = {
            "mask": (gt_mask, pred_mask),
            "normal": (gt_normal * gt_mask_clamp, pred_normal * gt_mask_clamp),
            "ao": (gt_ao * gt_mask_clamp, pred_ao * gt_mask_clamp),
            "depth": (gt_depth * gt_mask_clamp, pred_depth * gt_mask_clamp),
            "color": (gt_color, pred_color),
        }
        for name, fn in (("mse", builder.mse), ("l1", builder.l1),
                         ("gdl", builder.gradient_difference)):
            for target, (a, b) in pairs.items():
                if (name, target) in w and w[(name, target)] != 0.0:
                    loss = fn(a, b)
                    values[f"{name}:{target}"] = loss
                    total = total + w[(name, target)] * loss

        # downsample-consistency losses compare against the input
        ds_pairs = {
            "mask": (in_mask, pred_mask),
            "normal": (in_normal * in_mask_clamp, pred_normal * in_mask_clamp),
            "depth": (in_depth * in_mask_clamp, pred_depth * in_mask_clamp),
            "color": (input_color, pred_color),
        }
        for name, lkind in (("l2-ds", "l2"), ("l1-ds", "l1")):
            for target, (a, b) in ds_pairs.items():
                if (name, target) in w:
                    loss = builder.downsample_loss(
                        a, b, loss=lkind, factor=self.upscale_factor)
                    values[f"{name}:{target}"] = loss
                    total = total + w[(name, target)] * loss

        # perceptual + texture per target (3-channel encodings,
        # lossnet_unshaded.py:307-311)
        if self.vgg is not None:
            vgg_apply = lambda x: self.vgg.apply(params["vgg"], x)
            encodings = {
                "mask": (jnp.repeat(gt_mask, 3, -1) * 0.5 + 0.5,
                         jnp.repeat(pred_mask, 3, -1) * 0.5 + 0.5),
                "normal": ((gt_normal * gt_mask_clamp) * 0.5 + 0.5,
                           (pred_normal * gt_mask_clamp) * 0.5 + 0.5),
                "color": (gt_color, pred_color),
                "ao": (jnp.repeat(gt_ao, 3, -1), jnp.repeat(pred_ao, 3, -1)),
                "depth": (jnp.repeat(gt_depth, 3, -1),
                          jnp.repeat(pred_depth, 3, -1)),
            }
            for target, (a, b) in encodings.items():
                cw = w.get(("perceptual", target), 0.0)
                sw = w.get(("texture", target), 0.0)
                if cw == 0.0 and sw == 0.0:
                    continue
                content, style = builder.style_and_content_scores(
                    vgg_apply, a, b, self.content_layers, self.style_layers)
                if cw:
                    values[f"perceptual:{target}"] = content
                if sw:
                    values[f"texture:{target}"] = style
                total = total + cw * content + sw * style

        # discriminators (generator side)
        if self.has_discriminator:
            pred_with_color = self._pad(jnp.concatenate(
                [pred_mask, pred_normal, pred_color, pred_ao], axis=-1))
            prev_col = self._colorize(prev_pred_warped)
            prev_pred_pad = self._pad(prev_col)
            input_pad = self._pad(input_high)
            prev_input_pad = self._pad(prev_input_warped)

            if self.has_adv:
                x = jnp.concatenate([input_pad, prev_input_pad,
                                     pred_with_color, prev_pred_pad], axis=-1)
                logits = self.discriminators["adv"].apply(
                    params["discr"]["adv"], x)
                g = self._gen_adv_loss(logits)
                values["discr_pred"] = g
                total = total + w[("adv", "all")] * g
            if self.has_tgan:
                x = jnp.concatenate([pred_with_color, prev_pred_pad], axis=-1)
                logits = self.discriminators["tgan"].apply(
                    params["discr"]["tgan"], x)
                g = self._gen_adv_loss(logits)
                values["temp_discr_pred"] = g
                total = total + w[("tgan", "all")] * g
            if self.has_sgan:
                x = jnp.concatenate([input_pad, pred_with_color], axis=-1)
                logits = self.discriminators["sgan"].apply(
                    params["discr"]["sgan"], x)
                g = self._gen_adv_loss(logits)
                values["spatial_discr_pred"] = g
                total = total + w[("sgan", "all")] * g

        # temporal L2 against the warped previous prediction
        if self.has_temporal_l2 and prev_pred_warped is not None:
            prev_mask = prev_pred_warped[..., 0:1]
            prev_normal = safe_normalize(prev_pred_warped[..., 1:4])
            tpairs = {
                "mask": (pred_mask, prev_mask),
                "normal": (pred_normal * gt_mask_clamp,
                           prev_normal * gt_mask_clamp),
                "ao": (pred_ao * gt_mask_clamp,
                       prev_pred_warped[..., 5:6] * gt_mask_clamp),
                "depth": (pred_depth * gt_mask_clamp,
                          prev_pred_warped[..., 4:5] * gt_mask_clamp),
                "color": (pred_color, self._shade(prev_pred_warped)),
            }
            for target, (a, b) in tpairs.items():
                if ("temp-l2", target) in w:
                    loss = builder.mse(a, b)
                    values[f"temp-l2:{target}"] = loss
                    total = total + w[("temp-l2", target)] * loss

        return total, values

    def _gen_adv_loss(self, logits: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.gan_type == "bce":
            return builder.gan_generator_loss(logits)
        return builder.wgan_generator_loss(logits)

    # -- discriminator loss --------------------------------------------------
    def train_discriminator(self, params: Dict,
                            input_high: jnp.ndarray,
                            gt_high: jnp.ndarray,
                            prev_input_warped: jnp.ndarray,
                            gt_prev_warped: jnp.ndarray,
                            pred_high: jnp.ndarray,
                            pred_prev_warped: jnp.ndarray,
                            rng: Optional[jax.Array] = None,
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Discriminator-side loss (parity: `lossnet_unshaded.py:414-495`)."""
        assert self.has_discriminator
        w = self.weights

        def colorize_and_pad(t):
            return self._pad(self._colorize(t))

        input_p = self._pad(input_high)
        gt_p = colorize_and_pad(gt_high)
        pred_p = colorize_and_pad(pred_high)
        prev_input_p = self._pad(prev_input_warped)
        gt_prev_p = colorize_and_pad(gt_prev_warped)
        pred_prev_p = colorize_and_pad(pred_prev_warped)

        total = jnp.zeros(())
        gt_score = jnp.zeros(())
        pred_score = jnp.zeros(())

        def run(name, gt_in, pred_in):
            apply = lambda x: self.discriminators[name].apply(
                params["discr"][name], x)
            if self.cfg.gan_type == "bce":
                return builder.gan_discriminator_loss(apply(gt_in),
                                                      apply(pred_in))
            return builder.wgan_discriminator_loss(
                apply, gt_in, pred_in,
                gradient_penalty=(self.cfg.gan_type == "wgan-gp"),
                lambda_=self.cfg.wgan_lambda, rng=rng)

        if self.has_adv:
            gt_in = jnp.concatenate([input_p, prev_input_p, gt_p, gt_prev_p],
                                    axis=-1)
            pred_in = jnp.concatenate([input_p, prev_input_p, pred_p,
                                       pred_prev_p], axis=-1)
            l, gs, ps = run("adv", gt_in, pred_in)
            ww = w[("adv", "all")]
            total, gt_score, pred_score = (total + ww * l,
                                           gt_score + ww * gs,
                                           pred_score + ww * ps)
        if self.has_tgan:
            gt_in = jnp.concatenate([gt_p, gt_prev_p], axis=-1)
            pred_in = jnp.concatenate([pred_p, pred_prev_p], axis=-1)
            l, gs, ps = run("tgan", gt_in, pred_in)
            ww = w[("tgan", "all")]
            total, gt_score, pred_score = (total + ww * l,
                                           gt_score + ww * gs,
                                           pred_score + ww * ps)
        if self.has_sgan:
            gt_in = jnp.concatenate([input_p, gt_p], axis=-1)
            pred_in = jnp.concatenate([input_p, pred_p], axis=-1)
            l, gs, ps = run("sgan", gt_in, pred_in)
            ww = w[("sgan", "all")]
            total, gt_score, pred_score = (total + ww * l,
                                           gt_score + ww * gs,
                                           pred_score + ww * ps)
        return total, gt_score, pred_score
