"""Loss module for *shaded* (RGB-output) networks.

Parity target: `losses/lossnet.py` - the criterion of `mainVideo.py`.  The
loss DSL here is ``<loss>:<weight>`` per entry (no per-channel targets):
mse / inverse_mse / fft_mse / l1 / temp-l2 / perceptual / texture / adv /
wgan / wgan-gp / tgan / twgan / twgan-gp.

Differences from LossNetUnshaded: losses act directly on the RGB(+aux)
output; the temporal L2 gates on the *mask channel* (index 3) of
pred-with-mask stacks (`lossbuilder.py:85-97`); there is a single
discriminator whose input is the upsampled low-res input concatenated with
the prediction + interpolated mask (and optionally the warped previous
output).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import LossConfig, parse_layer_weights
from isosurfacesuperresolution_tpu.losses import builder
from isosurfacesuperresolution_tpu.losses.discriminators import (
    build_discriminator)
from isosurfacesuperresolution_tpu.losses.vgg import (
    VGG19Features, load_vgg19_params, max_conv_needed)
from isosurfacesuperresolution_tpu.ops.resize import resize


def parse_shaded_loss_list(spec: str) -> Dict[str, float]:
    """``"l1:1,adv:0.5"`` -> {name: weight} (parity: `lossnet.py:22-30`)."""
    out: Dict[str, float] = {}
    for token in spec.split(","):
        token = token.strip()
        if not token:
            continue
        parts = token.split(":")
        name = parts[0]
        weight = float(parts[1]) if len(parts) > 1 else 1.0
        out[name] = weight
    return out


class LossNet:
    """Loss stack for shaded networks (RGB or deferred-shading outputs)."""

    GAN_NAMES = ("adv", "gan", "wgan", "wgan-gp", "tadv", "tgan", "twgan",
                 "twgan-gp")

    def __init__(self, cfg: LossConfig, high_res: int,
                 input_channels: int, output_channels: int,
                 losses: Optional[str] = None, upsample: str = "bilinear"):
        self.cfg = cfg
        self.padding = cfg.padding
        self.upsample = upsample
        self.input_channels = input_channels
        self.output_channels = output_channels
        self.high_res = high_res

        raw = parse_shaded_loss_list(losses if losses is not None
                                     else cfg.losses)
        self.weights: Dict[str, float] = {}
        self.gan_kind: Optional[str] = None
        self.use_previous_image = False
        for name, w in raw.items():
            if name in ("l2", "l2_loss", "mse"):
                self.weights["mse"] = w
            elif name in ("l1", "l1_loss"):
                self.weights["l1"] = w
            elif name in ("tl2", "temp-l2"):
                self.weights["temp-l2"] = w
            elif name in ("inverse_mse", "fft_mse", "perceptual", "texture",
                          "gdl"):
                self.weights[name] = w
            elif name in self.GAN_NAMES:
                self.weights["adv"] = w
                self.gan_kind = {"adv": "bce", "gan": "bce", "tadv": "bce",
                                 "tgan": "bce", "wgan": "wgan",
                                 "twgan": "wgan", "wgan-gp": "wgan-gp",
                                 "twgan-gp": "wgan-gp"}[name]
                self.use_previous_image = name.startswith("t")
            else:
                raise ValueError(f"unknown loss {name}")
        self.weights.setdefault("mse", 0.0)

        self.discriminator = None
        if self.gan_kind is not None:
            extra = ((output_channels + 1) * 2 if self.use_previous_image
                     else output_channels + 1)
            self.discr_channels = input_channels + extra
            self.discriminator = build_discriminator(
                cfg.discriminator, high_res, self.discr_channels)

        self.content_layers = (parse_layer_weights(cfg.perceptual_loss_layers)
                               if "perceptual" in self.weights else [])
        self.style_layers = (parse_layer_weights(cfg.texture_loss_layers)
                             if "texture" in self.weights else [])
        self.vgg = None
        if self.content_layers or self.style_layers:
            self.vgg = VGG19Features(max_conv=max_conv_needed(
                self.content_layers + self.style_layers))

    def init(self, rng: jax.Array) -> Dict:
        params: Dict = {"discr": {}, "vgg": None}
        if self.discriminator is not None:
            rng, sub = jax.random.split(rng)
            x = jnp.zeros((1, self.high_res, self.high_res,
                           self.discr_channels))
            params["discr"]["adv"] = self.discriminator.init(sub, x)
        if self.vgg is not None:
            rng, sub = jax.random.split(rng)
            params["vgg"], _ = load_vgg19_params(self.vgg.max_conv, sub)
        return params

    def _pad(self, img):
        return builder.pad_border_zero(img, self.padding)

    def __call__(self, params: Dict, gt: jnp.ndarray, pred: jnp.ndarray,
                 input_low: Optional[jnp.ndarray],
                 prev_pred_warped: Optional[jnp.ndarray],
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Generator loss (parity: `lossnet.py:157-241`).

        gt / pred : (B, H, W, Cout) high-res shaded frames.
        input_low : (B, h, w, Cin) low-res input (mask at channel 3).
        prev_pred_warped : (B, H, W, Cout+1) warped previous output + mask.
        """
        w = self.weights
        gt = self._pad(gt)
        pred = self._pad(pred)
        if prev_pred_warped is not None:
            prev_pred_warped = self._pad(prev_pred_warped)

        total = jnp.zeros(())
        values: Dict[str, jnp.ndarray] = {}

        simple = {"mse": builder.mse, "l1": builder.l1,
                  "fft_mse": builder.fft_mse,
                  "gdl": builder.gradient_difference}
        for name, fn in simple.items():
            if name in w:
                loss = fn(gt, pred)
                values[name] = loss
                total = total + w[name] * loss

        if self.vgg is not None:
            vgg_apply = lambda x: self.vgg.apply(params["vgg"], x)
            content, style = builder.style_and_content_scores(
                vgg_apply, gt[..., :3], pred[..., :3],
                self.content_layers, self.style_layers)
            if "perceptual" in w:
                values["perceptual"] = content
                total = total + w["perceptual"] * content
            if "texture" in w:
                values["texture"] = style
                total = total + w["texture"] * style

        if self.discriminator is not None and "adv" in w:
            input_high = resize(input_low, size=(gt.shape[1], gt.shape[2]),
                                method=self.upsample)
            pred_with_mask = jnp.concatenate(
                [pred, input_high[..., 3:4]], axis=-1)
            if self.use_previous_image:
                x = jnp.concatenate([input_high, pred_with_mask,
                                     prev_pred_warped], axis=-1)
            else:
                x = jnp.concatenate([input_high, pred_with_mask], axis=-1)
            x = self._pad(x)
            logits = self.discriminator.apply(params["discr"]["adv"], x)
            if self.gan_kind == "bce":
                g = builder.gan_generator_loss(logits)
            else:
                g = builder.wgan_generator_loss(logits)
            values["discr_pred"] = g
            total = total + w["adv"] * g

        if "temp-l2" in w and prev_pred_warped is not None:
            input_mask_high = resize(input_low[..., 3:4],
                                     size=(gt.shape[1], gt.shape[2]),
                                     method=self.upsample)
            pred_with_mask = jnp.concatenate([pred, input_mask_high], axis=-1)
            loss = builder.temporal_l2_masked(pred_with_mask,
                                              prev_pred_warped)
            values["temp-l2"] = loss
            total = total + w["temp-l2"] * loss

        return total, values

    def train_discriminator(self, params: Dict, input_low: jnp.ndarray,
                            gt_high: jnp.ndarray, gt_prev_warped: jnp.ndarray,
                            pred_high: jnp.ndarray,
                            pred_prev_warped: jnp.ndarray,
                            rng: Optional[jax.Array] = None,
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Parity: `lossnet.py:243-284`; all high-res stacks carry Cout+1
        channels (output + interpolated mask)."""
        assert self.discriminator is not None
        hh, wh = gt_high.shape[1], gt_high.shape[2]
        input_high = resize(input_low, size=(hh, wh), method=self.upsample)
        if self.use_previous_image:
            gt_in = jnp.concatenate([input_high, gt_high, gt_prev_warped],
                                    axis=-1)
            pred_in = jnp.concatenate([input_high, pred_high,
                                       pred_prev_warped], axis=-1)
        else:
            gt_in = jnp.concatenate([input_high, gt_high], axis=-1)
            pred_in = jnp.concatenate([input_high, pred_high], axis=-1)
        gt_in = self._pad(gt_in)
        pred_in = self._pad(pred_in)

        apply = lambda x: self.discriminator.apply(params["discr"]["adv"], x)
        if self.gan_kind == "bce":
            return builder.gan_discriminator_loss(apply(gt_in), apply(pred_in))
        return builder.wgan_discriminator_loss(
            apply, gt_in, pred_in,
            gradient_penalty=(self.gan_kind == "wgan-gp"),
            lambda_=self.cfg.wgan_lambda, rng=rng)
