"""Quality metrics: masked PSNR, SSIM, MS-SSIM, running mean/variance.

Parity targets in the reference: `utils/psnr.py` (masked PSNR with the
fill-factor weighting), `utils/ssim.py` (the jorge-pessoa pytorch-msssim
implementation), `utils/mv.py` (Welford's online mean/variance - the only
real unit test in the reference repo).

All image tensors are NHWC.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1: jnp.ndarray, img2: jnp.ndarray,
         mask: Optional[jnp.ndarray] = None,
         epsilon: float = 1e-7) -> jnp.ndarray:
    """PSNR over (B, H, W, C) batches -> (B,).

    With a mask (B, H, W, 1) in [0, 1], zero-mask pixels are ignored and the
    result is weighted by the inverse fill factor - exact parity with the
    reference's quirky masked formula (`utils/psnr.py:10-22`), which the
    paper's statistics were computed with.
    """
    if mask is None:
        mse = jnp.mean((img1 - img2) ** 2, axis=(1, 2, 3))
        return 10.0 * jnp.log10(1.0 / (epsilon + mse))
    img1 = img1 * mask
    img2 = img2 * mask
    h, w = mask.shape[1], mask.shape[2]
    factor = (h * w) / jnp.sum(mask, axis=(1, 2, 3))
    mse = jnp.mean((img1 - img2) ** 2, axis=(1, 2, 3))
    return 10.0 * factor * jnp.log10(1.0 / (epsilon + mse))


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    g = jnp.exp(-((jnp.arange(window_size) - window_size // 2) ** 2)
                / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _depthwise_window_filter(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode separable gaussian filter per channel, NHWC."""
    k = window.shape[0]
    c = x.shape[-1]
    # two 1D convs (separable) via depthwise conv
    wh = window.reshape(1, k, 1, 1)         # HWIO with I=1 (depthwise)
    ww = window.reshape(k, 1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, jnp.tile(ww, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c)
    y = jax.lax.conv_general_dilated(
        y, jnp.tile(wh, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c)
    return y


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         val_range: Optional[float] = None, size_average: bool = True,
         full: bool = False):
    """SSIM on NHWC batches (parity: `utils/ssim.py:22-88`).

    ``val_range=None`` infers the dynamic range L from the data like the
    reference (255 vs 1, offset for [-1, 1] inputs).
    """
    if val_range is None:
        max_val = jnp.where(jnp.max(img1) > 128, 255.0, 1.0)
        min_val = jnp.where(jnp.min(img1) < -0.5, -1.0, 0.0)
        L = max_val - min_val
    else:
        L = val_range

    h, w = img1.shape[1], img1.shape[2]
    real_size = min(window_size, h, w)
    window = _gaussian_window(real_size, 1.5)

    mu1 = _depthwise_window_filter(img1, window)
    mu2 = _depthwise_window_filter(img2, window)
    mu1_sq = mu1 ** 2
    mu2_sq = mu2 ** 2
    mu1_mu2 = mu1 * mu2
    # filter(x^2) - mu^2 can go slightly NEGATIVE in float32 on
    # near-constant windows (catastrophic cancellation); that made
    # v2 < v1 possible and pushed SSIM above 1.0 on depth images in the
    # round-2 stats tables.  True variances are >= 0, so clamp; sigma12
    # is a covariance and is additionally bounded by Cauchy-Schwarz.
    sigma1_sq = jnp.maximum(
        _depthwise_window_filter(img1 * img1, window) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(
        _depthwise_window_filter(img2 * img2, window) - mu2_sq, 0.0)
    sigma12 = _depthwise_window_filter(img1 * img2, window) - mu1_mu2
    sigma12 = jnp.clip(sigma12, -jnp.sqrt(sigma1_sq * sigma2_sq),
                       jnp.sqrt(sigma1_sq * sigma2_sq))

    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)

    ret = jnp.mean(ssim_map) if size_average else jnp.mean(ssim_map,
                                                           axis=(1, 2, 3))
    if full:
        return ret, cs
    return ret


def msssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
           val_range: Optional[float] = None,
           normalize: bool = False) -> jnp.ndarray:
    """Multi-scale SSIM (parity: `utils/ssim.py:74-110`)."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    levels = weights.shape[0]
    min_side = min(img1.shape[1], img1.shape[2])
    if min_side < 2 ** (levels - 1):
        raise ValueError(
            f"MS-SSIM needs images of at least {2 ** (levels - 1)} px per "
            f"side (got {min_side}); 5 halving levels run out of pixels")
    mssim = []
    mcs = []
    for i in range(levels):
        sim, cs = ssim(img1, img2, window_size=window_size,
                       val_range=val_range, full=True)
        mssim.append(sim)
        mcs.append(cs)
        # 2x average pool
        img1 = jax.lax.reduce_window(
            img1, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        img2 = jax.lax.reduce_window(
            img2, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if normalize:
        mssim = (mssim + 1) / 2
        mcs = (mcs + 1) / 2
    # Deliberate deviation from the reference (`utils/ssim.py:96-99`):
    # a negative per-scale mean (anticorrelated windows) raised to a
    # fractional weight is NaN there; clamp at 0 so degenerate scales
    # contribute 0 instead of poisoning the whole statistic.
    mssim = jnp.maximum(mssim, 0.0)
    mcs = jnp.maximum(mcs, 0.0)
    pow1 = mcs ** weights
    pow2 = mssim ** weights
    return jnp.prod(pow1[:-1]) * pow2[-1]


class MeanVariance:
    """Welford's online mean/variance (parity: `utils/mv.py:1-31`)."""

    def __init__(self):
        self.n_ = 0
        self.mean_ = 0.0
        self.sn_ = 0.0

    def append(self, x: float):
        self.n_ += 1
        last = self.mean_
        self.mean_ += (x - last) / self.n_
        if self.n_ == 1:
            self.sn_ = 0.0
        else:
            self.sn_ += (x - last) * (x - self.mean_)

    def mean(self) -> float:
        return self.mean_

    def var(self) -> float:
        return self.sn_ / self.n_

    def count(self) -> int:
        return self.n_
