"""Ops tests: resize/pixel-shuffle/grid-sample/metrics/inpaint.

grid_sample and pixel-(un)shuffle are verified against torch (CPU build is
available in the image) since the reference's temporal warp semantics come
from torch exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.ops.resize import (
    resize, pixel_shuffle, pixel_unshuffle)
from isosurfacesuperresolution_tpu.ops.sampling import grid_sample
from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
from isosurfacesuperresolution_tpu.ops.metrics import (
    psnr, ssim, msssim, MeanVariance)


def test_pixel_shuffle_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 12, 6).astype(np.float32))
    y = pixel_unshuffle(x, 4)
    assert y.shape == (2, 2, 3, 96)
    z = pixel_shuffle(y, 4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))


def test_pixel_unshuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.rand(2, 3, 8, 8).astype(np.float32)  # NCHW for torch
    ref = torch.nn.functional.pixel_unshuffle(torch.from_numpy(x), 2).numpy()
    ours = np.asarray(pixel_unshuffle(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    x = rng.rand(2, 12, 4, 4).astype(np.float32)
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    ours = np.asarray(pixel_shuffle(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    img = rng.rand(2, 3, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.4 - 1.2)
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros",
        align_corners=False).numpy()
    ours = np.asarray(grid_sample(
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(grid))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_resize_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(4)
    img = rng.rand(1, 3, 8, 8).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(img), scale_factor=4, mode="bilinear").numpy()
    ours = np.asarray(resize(jnp.asarray(img.transpose(0, 2, 3, 1)),
                             scale=4.0, method="bilinear")
                      ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_psnr_masked_formula_parity():
    rng = np.random.RandomState(5)
    a = rng.rand(2, 16, 16, 3).astype(np.float32)
    b = rng.rand(2, 16, 16, 3).astype(np.float32)
    m = (rng.rand(2, 16, 16, 1) > 0.4).astype(np.float32)
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m)))
    # re-derive with the reference formula (utils/psnr.py:10-22)
    am = a * m
    bm = b * m
    factor = (16 * 16) / m.sum(axis=(1, 2, 3))
    mse = ((am - bm) ** 2).mean(axis=(1, 2, 3))
    ref = 10 * factor * np.log10(1.0 / (1e-7 + mse))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_psnr_identical_images_is_high():
    a = jnp.zeros((1, 8, 8, 3)) + 0.5
    assert float(psnr(a, a)[0]) > 60


def test_ssim_identity_and_ordering():
    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    noise_small = a + 0.01 * jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    noise_big = a + 0.2 * jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    s_id = float(ssim(a, a, val_range=1.0))
    s_small = float(ssim(a, noise_small, val_range=1.0))
    s_big = float(ssim(a, noise_big, val_range=1.0))
    assert s_id > 0.999
    assert s_small > s_big


def test_ssim_matches_reference_torch_impl():
    """Cross-check against the exact math of utils/ssim.py via torch."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    def torch_ssim(img1, img2, L=1.0, window_size=11):
        from math import exp
        g = torch.tensor([exp(-(x - window_size // 2) ** 2 / (2 * 1.5 ** 2))
                          for x in range(window_size)])
        g = (g / g.sum()).unsqueeze(1)
        w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
        c = img1.size(1)
        w = w2.expand(c, 1, window_size, window_size).contiguous()
        mu1 = F.conv2d(img1, w, padding=0, groups=c)
        mu2 = F.conv2d(img2, w, padding=0, groups=c)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, w, padding=0, groups=c) - mu1_sq
        s2 = F.conv2d(img2 * img2, w, padding=0, groups=c) - mu2_sq
        s12 = F.conv2d(img1 * img2, w, padding=0, groups=c) - mu1_mu2
        C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
        v1, v2 = 2 * s12 + C2, s1 + s2 + C2
        smap = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
        return smap.mean().item()

    rng = np.random.RandomState(7)
    a = rng.rand(1, 3, 24, 24).astype(np.float32)
    b = (a + 0.05 * rng.randn(1, 3, 24, 24)).astype(np.float32)
    ref = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    got = float(ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                     jnp.asarray(b.transpose(0, 2, 3, 1)), val_range=1.0))
    # separable 1D filtering vs torch's 2D conv: identical math, different
    # f32 accumulation order
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_msssim_range():
    rng = np.random.RandomState(8)
    a = jnp.asarray(rng.rand(1, 180, 180, 3).astype(np.float32))
    b = a + 0.03 * jnp.asarray(rng.randn(1, 180, 180, 3).astype(np.float32))
    v = float(msssim(a, b, val_range=1.0))
    assert 0.5 < v <= 1.0
    assert float(msssim(a, a, val_range=1.0)) > 0.999


def test_msssim_finite_on_anticorrelated():
    # The reference's msssim (utils/ssim.py:96-99) NaNs when a scale's
    # mean contrast term goes negative (fractional power of a negative);
    # ours clamps at 0 so the statistic stays finite. Anticorrelated
    # high-frequency structure drives cs negative at the fine scales.
    rng = np.random.RandomState(3)
    base = rng.rand(1, 64, 64, 1).astype(np.float32)
    a = jnp.asarray(0.5 + 0.4 * (base - 0.5))
    b = jnp.asarray(0.5 - 0.4 * (base - 0.5))   # inverted structure
    v = float(msssim(a, b, val_range=1.0))
    assert np.isfinite(v)
    assert 0.0 <= v <= 1.0


def test_mean_variance_against_numpy():
    # parity with the reference's only unit test (utils/mv.py:32-52)
    rng = np.random.RandomState(9)
    for length in [1, 2, 5, 20, 1000]:
        xs = rng.random_sample(length)
        mv = MeanVariance()
        for x in xs:
            mv.append(x)
        assert mv.count() == length
        np.testing.assert_allclose(mv.mean(), xs.mean(), atol=1e-10)
        np.testing.assert_allclose(mv.var(), xs.var(), atol=1e-10)


def test_inpaint_flow_fills_band():
    flow = np.zeros((1, 16, 16, 2), np.float32)
    mask = np.zeros((1, 16, 16, 1), np.float32)
    # valid square in the middle with constant flow (0.3, -0.2)
    mask[:, 6:10, 6:10] = 1.0
    flow[:, 6:10, 6:10, 0] = 0.3
    flow[:, 6:10, 6:10, 1] = -0.2
    out = np.asarray(inpaint_flow(jnp.asarray(flow), jnp.asarray(mask),
                                  iterations=4))
    # values inside the mask unchanged
    np.testing.assert_allclose(out[:, 6:10, 6:10, 0], 0.3, atol=1e-6)
    # a ring 2 px outside is filled with the same constant
    np.testing.assert_allclose(out[0, 4, 8, 0], 0.3, atol=1e-5)
    np.testing.assert_allclose(out[0, 4, 8, 1], -0.2, atol=1e-5)
    # far corner (outside the diffusion band) stays zero
    np.testing.assert_allclose(out[0, 0, 0], 0.0)


def test_ssim_bounded_on_near_constant_images():
    """Round-2 stats tables reported SSIM-depth up to 1.006: on
    near-constant depth images, filter(x^2) - mu^2 goes slightly
    negative in f32 (variance cancellation), which let the SSIM
    numerator exceed the denominator.  With sigma^2 clamped >= 0 and
    sigma12 Cauchy-Schwarz-bounded, SSIM <= 1 everywhere."""
    # near-constant pair with tiny independent jitter (the depth-image
    # regime of the paper-stats harness)
    rng = np.random.RandomState(11)
    base = np.full((1, 64, 64, 1), 0.73, np.float32)
    a = jnp.asarray(base + 1e-6 * rng.randn(1, 64, 64, 1).astype(np.float32))
    b = jnp.asarray(base + 1e-6 * rng.randn(1, 64, 64, 1).astype(np.float32))
    s = float(ssim(a, b, val_range=1.0))
    assert 0.0 <= s <= 1.0
    m = float(msssim(a, b, val_range=1.0))
    assert 0.0 <= m <= 1.0
    # exactly-constant pair: SSIM must be exactly 1, not >1
    c = jnp.full((1, 64, 64, 1), 0.5)
    assert abs(float(ssim(c, c, val_range=1.0)) - 1.0) < 1e-6
