"""Frame-recurrent training: the TPU-native `mainVideoUnshaded` core.

Parity target: `mainVideoUnshaded.py:397-636` - `trainNormal` (BPTT over a
10-frame clip whose recurrent state is the previous prediction warped by the
rendered flow) and `trainAdv_v2` (alternating discriminator/generator phases
over the same recurrence).

TPU design (SURVEY.md sections 3.1, 5): the whole per-batch computation - frame
loop included - is ONE jit program; the frame loop is a `lax.scan` whose
carry is the clamped/normalized previous output, and BPTT falls out of
differentiating through the scan.  Optional `jax.checkpoint` on the frame
body trades FLOPs for memory on long clips (the reference has no such knob).

Flow convention: the warp at frame j uses flow[:, j] (frame j's flow w.r.t.
frame j-1's camera) - the exact-warp convention of `render/raycast.py`.  The
reference uses flow[:, j-1] with its next-camera animation flows
(`mainVideoUnshaded.py:429-433`); the information content is identical, the
indexing is just shifted to the convention this framework uses everywhere.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from isosurfacesuperresolution_tpu.config import Config
from isosurfacesuperresolution_tpu.losses.lossnet_unshaded import (
    LossNetUnshaded)
from isosurfacesuperresolution_tpu.models.videotools import (
    flatten_high, initial_image, warp_upscale)
from isosurfacesuperresolution_tpu.ops.resize import resize
from isosurfacesuperresolution_tpu.render.shading import safe_normalize


class TrainState(NamedTuple):
    """Generator + (optional) discriminator training state."""

    params: Any
    opt_state: Any
    discr_params: Any            # {} when not adversarial
    discr_opt_state: Any
    aux_params: Any              # VGG etc. (non-trained)
    step: jnp.ndarray


def clamp_output(prediction: jnp.ndarray) -> jnp.ndarray:
    """Clamp/normalize the recurrent state exactly like the reference
    (`mainVideoUnshaded.py:460-465`): mask to [-1,1], normal normalized,
    depth and AO to [0,1]."""
    return jnp.concatenate([
        jnp.clip(prediction[..., 0:1], -1.0, 1.0),
        safe_normalize(prediction[..., 1:4]),
        jnp.clip(prediction[..., 4:5], 0.0, 1.0),
        jnp.clip(prediction[..., 5:6], 0.0, 1.0),
    ], axis=-1)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    name = getattr(t, "optimizer", "adam").lower()
    # reference --optim choices: Adam (default), RMSprop, Rprop
    # (mainVideoUnshaded.py:151-153, createOptimizer)
    if name == "adam":
        adam = optax.inject_hyperparams(optax.adam)(
            learning_rate=t.learning_rate, b1=t.beta1, b2=t.beta2)
    elif name == "rmsprop":
        adam = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=t.learning_rate)
    elif name == "rprop":
        adam = optax.inject_hyperparams(optax.rprop)(
            learning_rate=t.learning_rate)
    else:
        raise ValueError(f"unknown optimizer {t.optimizer!r} "
                         "(adam | rmsprop | rprop)")
    if getattr(t, "grad_clip", 0.0) and t.grad_clip > 0:
        # outlier batches (silhouette-heavy crops under the 10x-weighted
        # masked normal loss) occasionally produce gradient spikes that
        # undo many epochs; global-norm clipping bounds them.  The
        # reference has no equivalent guard - its long runs ride the
        # spikes out over 1000 epochs.
        return optax.chain(optax.clip_by_global_norm(t.grad_clip), adam)
    return adam


def set_learning_rate(opt_state, lr) -> None:
    """In-place lr update that works for the plain injected optimizer and
    the clip+adam chain (whose state is a tuple)."""
    states = opt_state if isinstance(opt_state, tuple) else (opt_state,)
    for s in states:
        if hasattr(s, "hyperparams"):
            s.hyperparams["learning_rate"] = jnp.asarray(lr)
            return
    raise ValueError("no hyperparams found in optimizer state")


def epoch_learning_rate(cfg: Config, epoch: int) -> float:
    t = cfg.train
    return t.learning_rate * (t.lr_gamma ** (epoch // max(t.lr_step, 1)))


def _frame_inputs(low_t, flow_t, prev_output, prev_low, high0, low0, cfg,
                  is_first: bool):
    """Assemble (net_input, previous_warped, previous_warped_loss,
    previous_input) for one frame (parity: `mainVideoUnshaded.py:419-445`)."""
    t = cfg.train
    m = cfg.model
    u = m.upscale_factor
    hh = low_t.shape[1] * u
    ww = low_t.shape[2] * u

    if is_first:
        previous_warped = initial_image(low_t, m.output_channels,
                                        t.initial_image_mode,
                                        t.ao_inverted, u)
        previous_warped_loss = high0
        previous_input = resize(low0, size=(hh, ww), method=m.upsample)
    else:
        previous_warped = warp_upscale(prev_output, flow_t, u,
                                       special_mask=True)
        previous_warped_loss = previous_warped
        prev_in_high = resize(prev_low, size=(hh, ww), method=m.upsample)
        previous_input = warp_upscale(prev_in_high, flow_t, u,
                                      special_mask=True)
    flat = flatten_high(previous_warped, u)
    net_in = jnp.concatenate([low_t, flat], axis=-1)
    return net_in, previous_warped, previous_warped_loss, previous_input


def make_train_step(cfg: Config, model, criterion: LossNetUnshaded,
                    optimizer: optax.GradientTransformation
                    ) -> Callable:
    """Build the jit'd non-adversarial train step (trainNormal parity)."""
    t = cfg.train
    m = cfg.model
    u = m.upscale_factor

    def clip_loss(params, aux_params, low, flow, high):
        """Total loss over a clip.  low (B,T,h,w,5), flow (B,T,h,w,2),
        high (B,T,H,W,6)."""
        hh, ww = high.shape[2], high.shape[3]

        def run_frame(prev_output, prev_low, low_t, flow_t, high_t,
                      is_first):
            net_in, _, prev_warped_loss, prev_input = _frame_inputs(
                low_t, flow_t, prev_output, prev_low, high[:, 0], low[:, 0],
                cfg, is_first)
            prediction, _ = model.apply(params, net_in)
            input_high = resize(low_t, size=(hh, ww), method=m.upsample)
            loss, values = criterion(aux_params, high_t, prediction,
                                     input_high, prev_input,
                                     prev_warped_loss)
            return loss, values, clamp_output(prediction)

        # frame 0 (or all frames when temporal is disabled)
        loss0, values0, prev_out = run_frame(
            None, None, low[:, 0], flow[:, 0], high[:, 0], True)

        if t.num_frames == 1 or t.disable_temporal:
            def body(carry, xs):
                total, _ = carry
                low_t, flow_t, high_t = xs
                loss_t, values_t, _ = run_frame(None, None, low_t, flow_t,
                                                high_t, True)
                return (total + loss_t, values_t), None
            if t.num_frames > 1:
                xs = (jnp.moveaxis(low[:, 1:], 1, 0),
                      jnp.moveaxis(flow[:, 1:], 1, 0),
                      jnp.moveaxis(high[:, 1:], 1, 0))
                (total, values_last), _ = jax.lax.scan(
                    body, (loss0, values0), xs)
            else:
                total, values_last = loss0, values0
            return total, (values_last, values0)

        def body(carry, xs):
            total, prev_out, prev_low = carry
            low_t, flow_t, high_t = xs
            loss_t, values_t, out_t = run_frame(prev_out, prev_low, low_t,
                                                flow_t, high_t, False)
            return (total + loss_t, out_t, low_t), values_t

        body_fn = jax.checkpoint(body) if t.remat else body
        xs = (jnp.moveaxis(low[:, 1:], 1, 0),
              jnp.moveaxis(flow[:, 1:], 1, 0),
              jnp.moveaxis(high[:, 1:], 1, 0))
        (total, _, _), frame_values = jax.lax.scan(
            body_fn, (loss0, prev_out, low[:, 0]), xs)
        return total, (frame_values, values0)

    @jax.jit
    def train_step(state: TrainState, low, flow, high):
        (loss, aux), grads = jax.value_and_grad(clip_loss, has_aux=True)(
            state.params, state.aux_params, low, flow, high)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state._replace(params=params, opt_state=opt_state,
                                   step=state.step + 1)
        return new_state, loss

    return train_step


def make_predict_clip(cfg: Config, model) -> Callable:
    """jit'd recurrent rollout over one clip -> (B, T, H*u, W*u, Cout)
    clamped predictions (no losses).  Backs the per-epoch tensorboard
    image panels (parity: `mainVideoUnshaded.py:728-797`)."""
    m = cfg.model

    @jax.jit
    def predict(params, low, flow):
        def run_frame(prev_output, prev_low, low_t, flow_t, first):
            net_in, _, _, _ = _frame_inputs(
                low_t, flow_t, prev_output, prev_low, None, low[:, 0],
                cfg, first)
            prediction, _ = model.apply(params, net_in)
            return clamp_output(prediction)

        out0 = run_frame(None, None, low[:, 0], flow[:, 0], True)

        def body(carry, xs):
            prev, prev_low = carry
            low_t, flow_t = xs
            out = run_frame(prev, prev_low, low_t, flow_t, False)
            return (out, low_t), out

        T = low.shape[1]
        if T > 1:
            xs = (jnp.moveaxis(low[:, 1:], 1, 0),
                  jnp.moveaxis(flow[:, 1:], 1, 0))
            _, outs = jax.lax.scan(body, (out0, low[:, 0]), xs)
            return jnp.concatenate(
                [out0[:, None], jnp.moveaxis(outs, 0, 1)], axis=1)
        return out0[:, None]
    return predict


def make_eval_step(cfg: Config, model, criterion: LossNetUnshaded
                   ) -> Callable:
    """jit'd evaluation over a clip: returns summed loss + last-frame PSNR
    inputs (parity: `mainVideoUnshaded.py:639-726` which derives PSNR from
    the mse:color entry)."""
    t = cfg.train
    m = cfg.model

    @jax.jit
    def eval_step(params, aux_params, low, flow, high):
        hh, ww = high.shape[2], high.shape[3]
        T = low.shape[1]

        def run_frame(prev_output, prev_low, low_t, flow_t, high_t, first):
            net_in, _, prev_warped_loss, prev_input = _frame_inputs(
                low_t, flow_t, prev_output, prev_low, high[:, 0], low[:, 0],
                cfg, first)
            prediction, _ = model.apply(params, net_in)
            input_high = resize(low_t, size=(hh, ww), method=m.upsample)
            loss, values = criterion(aux_params, high_t, prediction,
                                     input_high, prev_input,
                                     prev_warped_loss)
            return loss, values, clamp_output(prediction)

        loss0, values0, prev = run_frame(None, None, low[:, 0], flow[:, 0],
                                         high[:, 0], True)

        def body(carry, xs):
            total, prev, prev_low, mse_acc = carry
            low_t, flow_t, high_t = xs
            l, v, out = run_frame(prev, prev_low, low_t, flow_t, high_t,
                                  False)
            return (total + l, out, low_t, mse_acc + v["mse:color"]), None

        if T > 1:
            xs = (jnp.moveaxis(low[:, 1:], 1, 0),
                  jnp.moveaxis(flow[:, 1:], 1, 0),
                  jnp.moveaxis(high[:, 1:], 1, 0))
            (total, _, _, mse_acc), _ = jax.lax.scan(
                body, (loss0, prev, low[:, 0], values0["mse:color"]), xs)
        else:
            total, mse_acc = loss0, values0["mse:color"]
        mean_mse = mse_acc / T
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mean_mse, 1e-10))
        return total / T, psnr

    return eval_step


def make_adv_train_steps(cfg: Config, model, criterion: LossNetUnshaded,
                         gen_opt: optax.GradientTransformation,
                         discr_opt: optax.GradientTransformation
                         ) -> Tuple[Callable, Callable]:
    """Build jit'd (discriminator_step, generator_step) for trainAdv_v2
    parity.  Both replay the same frame recurrence; the discriminator phase
    stops gradients through the generator (`torch.no_grad()`,
    `mainVideoUnshaded.py:540-541`)."""
    t = cfg.train
    m = cfg.model
    u = m.upscale_factor

    def rollout(params, low, flow, high):
        """Run the generator over the clip; returns per-frame tensors needed
        by the discriminator (time-major)."""
        hh, ww = high.shape[2], high.shape[3]

        def run_frame(prev_output, prev_low, low_t, flow_t, first):
            net_in, prev_warped, prev_warped_loss, prev_input = _frame_inputs(
                low_t, flow_t, prev_output, prev_low, high[:, 0], low[:, 0],
                cfg, first)
            prediction, _ = model.apply(params, net_in)
            input_high = resize(low_t, size=(hh, ww), method=m.upsample)
            return prediction, input_high, prev_input, prev_warped_loss

        pred0, in_high0, prev_in0, pwl0 = run_frame(
            None, None, low[:, 0], flow[:, 0], True)

        def body(carry, xs):
            prev_out, prev_low = carry
            low_t, flow_t, high_prev_t = xs
            pred, in_high, prev_in, pwl = run_frame(prev_out, prev_low,
                                                    low_t, flow_t, False)
            gt_prev_warped = warp_upscale(high_prev_t, flow_t, u,
                                          special_mask=True)
            return (clamp_output(pred), low_t), (pred, in_high, prev_in,
                                                 pwl, gt_prev_warped)

        T = low.shape[1]
        if T > 1:
            xs = (jnp.moveaxis(low[:, 1:], 1, 0),
                  jnp.moveaxis(flow[:, 1:], 1, 0),
                  jnp.moveaxis(high[:, :-1], 1, 0))
            _, (preds, in_highs, prev_ins, pwls, gt_prevs) = jax.lax.scan(
                body, (clamp_output(pred0), low[:, 0]), xs)
            preds = jnp.concatenate([pred0[None], preds], 0)
            in_highs = jnp.concatenate([in_high0[None], in_highs], 0)
            prev_ins = jnp.concatenate([prev_in0[None], prev_ins], 0)
            pwls = jnp.concatenate([pwl0[None], pwls], 0)
            # frame 0 "gt prev warped" = gt itself (no-bias convention)
            gt_prevs = jnp.concatenate([high[:, 0][None], gt_prevs], 0)
        else:
            preds = pred0[None]
            in_highs = in_high0[None]
            prev_ins = prev_in0[None]
            pwls = pwl0[None]
            gt_prevs = high[:, 0][None]
        return preds, in_highs, prev_ins, pwls, gt_prevs

    @jax.jit
    def discr_step(state: TrainState, low, flow, high, rng):
        preds, in_highs, prev_ins, pwls, gt_prevs = rollout(
            jax.lax.stop_gradient(state.params), low, flow, high)
        preds = jax.lax.stop_gradient(preds)
        high_tm = jnp.moveaxis(high, 1, 0)

        def d_loss(discr_params):
            aux = dict(state.aux_params)
            aux["discr"] = discr_params

            def body(carry, xs):
                total, gts, prs = carry
                pred, in_high, prev_in, pwl, gt_prev, high_t, r = xs
                l, gs, ps = criterion.train_discriminator(
                    aux, in_high, high_t, prev_in, gt_prev, pred, pwl, rng=r)
                return (total + l, gts + gs, prs + ps), None

            rngs = jax.random.split(rng, preds.shape[0])
            (total, gts, prs), _ = jax.lax.scan(
                body, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
                (preds, in_highs, prev_ins, pwls, gt_prevs, high_tm, rngs))
            return total, (gts, prs)

        (loss, (gt_score, pred_score)), grads = jax.value_and_grad(
            d_loss, has_aux=True)(state.discr_params)
        updates, d_opt_state = discr_opt.update(grads, state.discr_opt_state,
                                                state.discr_params)
        discr_params = optax.apply_updates(state.discr_params, updates)
        return state._replace(discr_params=discr_params,
                              discr_opt_state=d_opt_state), loss, \
            gt_score, pred_score

    gen_step_fn = make_train_step(cfg, model, criterion, gen_opt)

    @jax.jit
    def gen_step(state: TrainState, low, flow, high):
        # generator phase sees the current discriminator params via aux
        aux = dict(state.aux_params)
        aux["discr"] = jax.lax.stop_gradient(state.discr_params)
        state2 = state._replace(aux_params=aux)
        new_state, loss = gen_step_fn(state2, low, flow, high)
        return new_state._replace(aux_params=state.aux_params), loss

    return discr_step, gen_step


def create_train_state(cfg: Config, model, criterion: LossNetUnshaded,
                       optimizer, rng: jax.Array,
                       discr_optimizer=None) -> TrainState:
    from isosurfacesuperresolution_tpu.models.generators import (
        network_input_channels)
    t = cfg.train
    cin = network_input_channels(cfg.model)
    rng, m_rng, c_rng = jax.random.split(rng, 3)
    x = jnp.zeros((1, t.crop_size, t.crop_size, cin), jnp.float32)
    params = model.init(m_rng, x)
    opt_state = optimizer.init(params)
    aux = criterion.init(c_rng)
    discr_params = aux.pop("discr", {})
    aux["discr"] = discr_params  # generator loss reads them from aux
    if discr_optimizer is not None and criterion.has_discriminator:
        d_opt_state = discr_optimizer.init(discr_params)
    else:
        d_opt_state = None
    return TrainState(params=params, opt_state=opt_state,
                      discr_params=discr_params,
                      discr_opt_state=d_opt_state,
                      aux_params=aux, step=jnp.zeros((), jnp.int32))
