"""Frame-recurrent training for *shaded* (RGB-output) networks.

Parity target: `mainVideo.py:361-778` - the shaded/deferred counterpart of
`mainVideoUnshaded`: the network consumes shaded low-res renderings
(RGB + mask + normal + depth = 8 channels) plus the flattened warped previous
RGB prediction, outputs RGB, and trains with `losses/lossnet.py` (l1/mse/
perceptual/texture/adv/temp-l2 on the RGB output).

Shaded clip tensors are derived on-the-fly from the unshaded G-buffer clips
(`data/generation.py`) by screen-space shading the low and high buffers -
the reference generated shaded EXR datasets with a second renderer pass;
one dataset serves both trainers here.

Note: `mainVideo.py` is stale in the reference (it passes an argument
`DatasetFromSamples` no longer accepts, `mainVideo.py:174` - SURVEY.md
known-bugs); this implementation follows its documented intent.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import Config, ShadingConfig
from isosurfacesuperresolution_tpu.losses.lossnet import LossNet
from isosurfacesuperresolution_tpu.models.videotools import (
    flatten_high, initial_image, warp_upscale)
from isosurfacesuperresolution_tpu.ops.resize import resize
from isosurfacesuperresolution_tpu.render.shading import (
    screen_space_shading)
from isosurfacesuperresolution_tpu.train.trainer import TrainState

import optax


SHADED_INPUT_CHANNELS = 8   # rgb, mask(0..1), normal, depth
SHADED_OUTPUT_CHANNELS = 3


def shade_clip(low: jnp.ndarray, high: jnp.ndarray,
               shading_cfg: ShadingConfig
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unshaded clips -> shaded training tensors.

    low (B, T, h, w, 5) [mask(-1,1), n, d] -> (B, T, h, w, 8)
    [rgb, mask(0,1), n, d]; high (B, T, H, W, 6) -> (B, T, H, W, 3) rgb.
    """
    b, t = low.shape[0], low.shape[1]
    lo = low.reshape((b * t,) + low.shape[2:])
    hi = high.reshape((b * t,) + high.shape[2:])
    lo_rgb = screen_space_shading(lo, shading_cfg)
    hi_rgb = screen_space_shading(hi, shading_cfg)
    mask01 = lo[..., 0:1] * 0.5 + 0.5
    lo_shaded = jnp.concatenate([lo_rgb, mask01, lo[..., 1:5]], axis=-1)
    return (lo_shaded.reshape(low.shape[:2] + lo_shaded.shape[1:]),
            hi_rgb.reshape(high.shape[:2] + hi_rgb.shape[1:]))


def make_shaded_train_step(cfg: Config, model, criterion: LossNet,
                           optimizer) -> Callable:
    """jit'd train step over shaded clips (trainNormal of mainVideo)."""
    t = cfg.train
    m = cfg.model
    u = m.upscale_factor

    def clip_loss(params, aux_params, low, flow, high_rgb):
        hh, ww = high_rgb.shape[2], high_rgb.shape[3]

        def run_frame(prev_output, low_t, flow_t, high_t, first):
            if first:
                previous = initial_image(low_t, SHADED_OUTPUT_CHANNELS,
                                         t.initial_image_mode, False, u)
                prev_warped_loss = jnp.concatenate(
                    [high_t, resize(low_t[..., 3:4], size=(hh, ww),
                                    method=m.upsample)], axis=-1)
            else:
                previous = warp_upscale(prev_output, flow_t, u)
                mask_high = resize(low_t[..., 3:4], size=(hh, ww),
                                   method=m.upsample)
                prev_warped_loss = jnp.concatenate(
                    [previous, mask_high], axis=-1)
            net_in = jnp.concatenate(
                [low_t, flatten_high(previous, u)], axis=-1)
            pred, _ = model.apply(params, net_in)
            loss, values = criterion(aux_params, high_t, pred, low_t,
                                     prev_warped_loss)
            return loss, values, jnp.clip(pred, 0.0, 1.0)

        loss0, values0, prev = run_frame(None, low[:, 0], flow[:, 0],
                                         high_rgb[:, 0], True)
        T = low.shape[1]
        if T == 1 or t.disable_temporal:
            return loss0, values0

        def body(carry, xs):
            total, prev = carry
            low_t, flow_t, high_t = xs
            l, v, out = run_frame(prev, low_t, flow_t, high_t, False)
            return (total + l, out), None

        xs = (jnp.moveaxis(low[:, 1:], 1, 0),
              jnp.moveaxis(flow[:, 1:], 1, 0),
              jnp.moveaxis(high_rgb[:, 1:], 1, 0))
        (total, _), _ = jax.lax.scan(body, (loss0, prev), xs)
        return total, values0

    @jax.jit
    def train_step(state: TrainState, low, flow, high_rgb):
        (loss, _), grads = jax.value_and_grad(clip_loss, has_aux=True)(
            state.params, state.aux_params, low, flow, high_rgb)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state,
                              step=state.step + 1), loss

    return train_step


def create_shaded_train_state(cfg: Config, model, criterion: LossNet,
                              optimizer, rng) -> TrainState:
    t = cfg.train
    cin = (SHADED_INPUT_CHANNELS
           + SHADED_OUTPUT_CHANNELS * cfg.model.upscale_factor ** 2)
    x = jnp.zeros((1, t.crop_size, t.crop_size, cin), jnp.float32)
    params = model.init(rng, x)
    opt_state = optimizer.init(params)
    aux = criterion.init(jax.random.PRNGKey(0))
    aux.setdefault("discr", {})
    return TrainState(params=params, opt_state=opt_state,
                      discr_params=aux["discr"], discr_opt_state=None,
                      aux_params=aux, step=jnp.zeros((), jnp.int32))
