"""Loss primitives: the functional counterpart of `losses/lossbuilder.py`.

Every entry is a pure function over NHWC arrays, composable inside one jit'd
training step (the reference spreads these across nn.Modules with hooks; XLA
prefers flat function composition).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.ops.resize import resize


# ---------------------------------------------------------------------------
# Simple pixel losses
# ---------------------------------------------------------------------------

def mse(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((gt - pred) ** 2)


def l1(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(gt - pred))


def gradient_difference(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Gradient-difference loss (GDL): L1 between the absolute finite-
    difference image gradients of gt and pred, over both axes.

    Zero for any constant offset, and - unlike plain L1 - it charges
    *hallucinated* high-frequency detail on regions where the target is
    smooth, which is exactly the failure mode of SR normals on large
    near-planar surfaces (the RM-analogue `interface` family; README
    "Training status").  Not in the reference's loss zoo
    (`losses/lossbuilder.py`) - a TPU-rebuild addition; both input orders
    are NHWC.
    """
    def dx(t):
        return t[:, :, 1:, :] - t[:, :, :-1, :]

    def dy(t):
        return t[:, 1:, :, :] - t[:, :-1, :, :]

    return (jnp.mean(jnp.abs(jnp.abs(dx(gt)) - jnp.abs(dx(pred))))
            + jnp.mean(jnp.abs(jnp.abs(dy(gt)) - jnp.abs(dy(pred)))))


def temporal_l2_masked(pred_with_mask: jnp.ndarray,
                       prev_warped_with_mask: jnp.ndarray,
                       threshold: float = 0.5) -> jnp.ndarray:
    """Temporal L2 on RGB gated by both masks >= threshold.

    Parity: `lossbuilder.py:85-97` (channel 3 is the mask, channels 0:3 RGB).
    """
    m = ((pred_with_mask[..., 3:4] >= threshold)
         & (prev_warped_with_mask[..., 3:4] >= threshold)).astype(
             pred_with_mask.dtype)
    m = jax.lax.stop_gradient(m)
    return mse(pred_with_mask[..., 0:3] * m,
               prev_warped_with_mask[..., 0:3] * m)


def downsample_loss(gt: jnp.ndarray, pred: jnp.ndarray, *, loss: str = "l2",
                    factor: int = 4, mode: str = "bilinear",
                    gt_low_res: bool = False) -> jnp.ndarray:
    """Downsample-consistency loss (parity: `lossbuilder.py:343-377`)."""
    fn = mse if loss == "l2" else l1
    pred_lo = resize(pred, scale=1.0 / factor, method=mode)
    if gt_low_res:
        return fn(gt, pred_lo)
    return fn(resize(gt, scale=1.0 / factor, method=mode), pred_lo)


def fft_mse(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """MSE in the Fourier domain (parity: `lossbuilder.py:60-71`)."""
    g = gt * 2.0 - 1.0
    p = pred * 2.0 - 1.0
    gf = jnp.fft.rfftn(g, axes=(-3, -2, -1))
    pf = jnp.fft.rfftn(p, axes=(-3, -2, -1))
    d = gf - pf
    return jnp.mean(d.real ** 2 + d.imag ** 2)


# ---------------------------------------------------------------------------
# Perceptual / texture (gram) losses over VGG features
# ---------------------------------------------------------------------------

def gram_matrix(features: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, C) normalized gram matrix.

    Parity: `lossbuilder.py:100-108` (normalization by C*H*W).
    """
    b, h, w, c = features.shape
    f = features.reshape(b, h * w, c)
    gram = jnp.einsum("bnc,bnd->bcd", f, f)
    return gram / (c * h * w)


def texture_loss(feat_gt: jnp.ndarray, feat_pred: jnp.ndarray,
                 patch_size: int = 16) -> jnp.ndarray:
    """Gram-matrix MSE over ``patch_size`` tiles (parity:
    `lossbuilder.py:121-149`: features are split into 16x16 patches, each
    patch contributes its own gram matrix)."""
    def to_patches(f):
        b, h, w, c = f.shape
        ph = -h % patch_size
        pw = -w % patch_size
        f = jnp.pad(f, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = f.shape[1], f.shape[2]
        f = f.reshape(b, hp // patch_size, patch_size,
                      wp // patch_size, patch_size, c)
        f = f.transpose(0, 1, 3, 2, 4, 5)
        return f.reshape(-1, patch_size, patch_size, c)

    g_gt = gram_matrix(to_patches(feat_gt))
    g_pred = gram_matrix(to_patches(feat_pred))
    return jnp.mean((g_gt - g_pred) ** 2)


def perceptual_loss(feat_gt: jnp.ndarray, feat_pred: jnp.ndarray
                    ) -> jnp.ndarray:
    """Feature-space MSE (parity: `lossbuilder.py:159-167`)."""
    return jnp.mean((feat_gt - feat_pred) ** 2)


def style_and_content_scores(
        vgg_apply: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]],
        gt_img: jnp.ndarray, pred_img: jnp.ndarray,
        content_layers: Sequence[Tuple[str, float]],
        style_layers: Sequence[Tuple[str, float]],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One VGG pass over concat([gt, pred]) -> (content_score, style_score).

    Parity: `lossnet_unshaded.py:284-305` / `lossbuilder.py:169-230` (each
    layer's score carries its per-layer weight).
    """
    feats = vgg_apply(jnp.concatenate([gt_img, pred_img], axis=0))
    b = gt_img.shape[0]
    content = jnp.zeros((), gt_img.dtype)
    style = jnp.zeros((), gt_img.dtype)
    for name, w in content_layers:
        f = feats[name]
        content = content + w * perceptual_loss(f[:b], f[b:])
    for name, w in style_layers:
        f = feats[name]
        style = style + w * texture_loss(f[:b], f[b:])
    return content, style


# ---------------------------------------------------------------------------
# Adversarial losses (BCE GAN + WGAN(-GP))
# ---------------------------------------------------------------------------

def bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    t = jnp.full_like(logits, target)
    return jnp.mean(jnp.maximum(logits, 0) - logits * t
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def gan_generator_loss(pred_logits: jnp.ndarray) -> jnp.ndarray:
    """Generator side of the BCE GAN (parity: `lossbuilder.py:237-242`)."""
    return bce_with_logits(pred_logits, 1.0)


def gan_discriminator_loss(gt_logits: jnp.ndarray, pred_logits: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Discriminator BCE: real vs fake (parity: `lossbuilder.py:244-258`).

    Returns (loss, mean sigmoid of real logits, mean sigmoid of fake logits).
    """
    loss = (bce_with_logits(gt_logits, 1.0)
            + bce_with_logits(pred_logits, 0.0))
    return (loss, jnp.mean(jax.nn.sigmoid(gt_logits)),
            jnp.mean(jax.nn.sigmoid(pred_logits)))


def wgan_generator_loss(pred_logits: jnp.ndarray) -> jnp.ndarray:
    """Parity: `lossbuilder.py:271-275` (no sigmoid)."""
    return -jnp.mean(pred_logits)


def wgan_discriminator_loss(
        discr_apply: Callable[[jnp.ndarray], jnp.ndarray],
        gt_input: jnp.ndarray, pred_input: jnp.ndarray,
        gradient_penalty: bool = False, lambda_: float = 10.0,
        rng: jax.Array | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """WGAN critic loss with optional gradient penalty.

    The reference's WGAN-GP path is broken (undefined `disc_fake/disc_real/b`,
    `lossbuilder.py:284-296`, noted in SURVEY.md) - this is the corrected
    standard formulation: E[D(fake)] - E[D(real)] + lambda * E[(|grad| - 1)^2]
    on straight-line interpolates.
    """
    disc_gt = discr_apply(gt_input)
    disc_pred = discr_apply(pred_input)
    loss = jnp.mean(disc_pred) - jnp.mean(disc_gt)
    if gradient_penalty:
        if rng is None:
            raise ValueError("wgan-gp needs an rng for the interpolates")
        b = gt_input.shape[0]
        alpha = jax.random.uniform(rng, (b, 1, 1, 1), gt_input.dtype)
        inter = gt_input + alpha * (pred_input - gt_input)

        def critic_sum(x):
            return jnp.sum(discr_apply(x))

        grads = jax.grad(critic_sum)(inter)
        slopes = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2, 3)) + 1e-12)
        loss = loss + lambda_ * jnp.mean((slopes - 1.0) ** 2)
    return loss, jnp.mean(disc_gt), jnp.mean(disc_pred)


def pad_border_zero(img: jnp.ndarray, border: int) -> jnp.ndarray:
    """Overwrite a ``border``-pixel frame with zeros, keeping the size.

    Parity: `lossnet_unshaded.py:170-185`.
    """
    if border == 0:
        return img
    h, w = img.shape[-3], img.shape[-2]
    mask = jnp.zeros((h, w, 1), img.dtype)
    mask = mask.at[border:h - border, border:w - border].set(1.0)
    return img * mask
