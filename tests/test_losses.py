"""Loss-stack tests: DSL parsing, primitives, LossNetUnshaded/LossNet,
discriminators, adversarial training signals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import LossConfig, parse_loss_dsl
from isosurfacesuperresolution_tpu.losses import builder
from isosurfacesuperresolution_tpu.losses.discriminators import (
    build_discriminator)
from isosurfacesuperresolution_tpu.losses.lossnet import (
    LossNet, parse_shaded_loss_list)
from isosurfacesuperresolution_tpu.losses.lossnet_unshaded import (
    LossNetUnshaded)


# ---------------------------------------------------------------------------
# DSL
# ---------------------------------------------------------------------------

def test_loss_dsl_reference_default():
    w = parse_loss_dsl("l1:mask:1,l1:ao:1,l1:normal:10,l1:depth:10,"
                       "temp-l2:color:0.1")
    assert w[("l1", "mask")] == 1.0
    assert w[("l1", "normal")] == 10.0
    assert w[("temp-l2", "color")] == 0.1


def test_loss_dsl_canonicalization_and_errors():
    w = parse_loss_dsl("l2:mask:2,tl2:color,gan:all:0.5")
    assert w[("mse", "mask")] == 2.0
    assert w[("temp-l2", "color")] == 1.0
    assert w[("adv", "all")] == 0.5
    with pytest.raises(ValueError):
        parse_loss_dsl("l1")
    with pytest.raises(ValueError):
        parse_loss_dsl("l1:bogus:1")
    with pytest.raises(ValueError):
        parse_loss_dsl("adv:mask:1")
    with pytest.raises(ValueError):
        parse_loss_dsl("nosuch:mask:1")


def test_shaded_loss_list():
    w = parse_shaded_loss_list("l1:1,adv:0.5,temp-l2:0.1")
    assert w == {"l1": 1.0, "adv": 0.5, "temp-l2": 0.1}


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def test_bce_with_logits_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 1).astype(np.float32) * 3
    for target in (0.0, 1.0):
        ref = F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits),
            torch.full((16, 1), target)).item()
        got = float(builder.bce_with_logits(jnp.asarray(logits), target))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_gram_matrix_matches_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    f = rng.rand(2, 8, 6, 5).astype(np.float32)  # B H W C
    # reference gram on NCHW (lossbuilder.py:100-108)
    ft = torch.from_numpy(f.transpose(0, 3, 1, 2))
    dims = ft.shape
    fv = ft.reshape(-1, dims[-3], dims[-2] * dims[-1])
    ref = (fv @ fv.transpose(1, 2) / (dims[-3] * dims[-2] * dims[-1])).numpy()
    got = np.asarray(builder.gram_matrix(jnp.asarray(f)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_temporal_l2_masked_gates_on_mask():
    a = np.zeros((1, 4, 4, 4), np.float32)
    b = np.zeros((1, 4, 4, 4), np.float32)
    a[..., :3] = 1.0
    b[..., :3] = 0.0
    # both masks zero -> no loss
    assert float(builder.temporal_l2_masked(jnp.asarray(a),
                                            jnp.asarray(b))) == 0.0
    a[..., 3] = 1.0
    b[..., 3] = 1.0
    assert float(builder.temporal_l2_masked(jnp.asarray(a),
                                            jnp.asarray(b))) > 0.5


def test_pad_border_zero():
    x = jnp.ones((2, 8, 8, 3))
    y = np.asarray(builder.pad_border_zero(x, 2))
    assert y.shape == (2, 8, 8, 3)
    assert y[:, :2].max() == 0.0 and y[:, -2:].max() == 0.0
    assert y[:, 2:-2, 2:-2].min() == 1.0


def test_downsample_loss_zero_for_consistent_pair():
    rng = np.random.RandomState(2)
    hi = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    loss = builder.downsample_loss(hi, hi, loss="l2", factor=4)
    assert float(loss) < 1e-10


def test_gradient_difference_loss():
    rng = np.random.RandomState(3)
    flat = jnp.zeros((1, 16, 16, 1))
    # invariant to constant offsets (unlike l1)
    assert float(builder.gradient_difference(flat, flat + 0.7)) < 1e-7
    # charges hallucinated detail on a smooth target
    noisy = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    assert float(builder.gradient_difference(flat, noisy)) > 0.1
    # symmetric in magnitude: missing detail costs the same as adding it
    a = float(builder.gradient_difference(flat, noisy))
    b = float(builder.gradient_difference(noisy, flat))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # matching gradients of opposite sign are NOT charged (|grad| compare)
    ramp = jnp.cumsum(jnp.ones((1, 16, 16, 1)), axis=2)
    assert float(builder.gradient_difference(ramp, -ramp)) < 1e-6


def test_gdl_in_unshaded_dsl():
    from isosurfacesuperresolution_tpu.config import parse_loss_dsl
    w = parse_loss_dsl("l1:mask:1,gdl:normal:3")
    assert w[("gdl", "normal")] == 3.0
    cfg = LossConfig(losses="l1:mask:1,gdl:normal:3,gdl:ao:1", padding=0)
    net = LossNetUnshaded(cfg, high_res=32)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(6)
    gt, pred, inp, prev_in, prev_pred = _fake_batch(rng, res=32)
    loss, values = net(params, gt, pred, inp, prev_in, prev_pred)
    assert "gdl:normal" in values and "gdl:ao" in values
    assert np.isfinite(float(loss))
    # gradient flows through the gdl terms
    g = jax.grad(lambda p: net(params, gt, p, inp, prev_in, prev_pred)[0])(
        pred)
    assert float(jnp.abs(np.asarray(g)[..., 5]).max()) > 0   # ao channel


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,channels", [("enhanceNetSmall", 26),
                                           ("enhanceNetLarge", 16),
                                           ("tecoGAN", 13)])
def test_discriminator_output_logit(name, channels):
    d = build_discriminator(name, 64, channels)
    x = jnp.zeros((2, 64, 64, channels))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.shape == (2, 1)


def test_discriminator_rejects_non_power_of_two():
    d = build_discriminator("enhanceNetLarge", 48, 8)
    with pytest.raises(AssertionError):
        d.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 8)))


def test_spectral_norm_bounds_singular_value():
    from isosurfacesuperresolution_tpu.utils.spectral_norm import (
        spectral_normalize)
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) * 5)
    wn = np.asarray(spectral_normalize(w, iterations=30))
    s = np.linalg.svd(wn, compute_uv=False)
    np.testing.assert_allclose(s[0], 1.0, atol=1e-3)


# ---------------------------------------------------------------------------
# LossNetUnshaded
# ---------------------------------------------------------------------------

def _fake_batch(rng, b=2, res=64):
    gt = rng.rand(b, res, res, 6).astype(np.float32)
    gt[..., 0] = gt[..., 0] * 2 - 1
    pred = gt + 0.1 * rng.randn(b, res, res, 6).astype(np.float32)
    inp = rng.rand(b, res, res, 5).astype(np.float32)
    inp[..., 0] = inp[..., 0] * 2 - 1
    prev_in = inp.copy()
    prev_pred = gt + 0.05 * rng.randn(b, res, res, 6).astype(np.float32)
    return (jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(inp),
            jnp.asarray(prev_in), jnp.asarray(prev_pred))


def test_lossnet_unshaded_l1_default():
    cfg = LossConfig(padding=4)
    net = LossNetUnshaded(cfg, high_res=64)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    gt, pred, inp, prev_in, prev_pred = _fake_batch(rng)
    loss, values = net(params, gt, pred, inp, prev_in, prev_pred)
    assert float(loss) > 0
    assert "l1:mask" in values and "temp-l2:color" in values
    # identical prediction drives the non-temporal losses to ~0
    loss0, v0 = net(params, gt, gt, inp, prev_in, gt)
    assert float(v0["l1:mask"]) < 1e-6
    assert float(v0["l1:normal"]) < 1e-6
    assert float(loss0) < float(loss)


def test_lossnet_unshaded_loss_is_differentiable():
    cfg = LossConfig(padding=0)
    net = LossNetUnshaded(cfg, high_res=32)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    gt, pred, inp, prev_in, prev_pred = _fake_batch(rng, res=32)

    def f(p):
        loss, _ = net(params, gt, p, inp, prev_in, prev_pred)
        return loss

    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_lossnet_unshaded_gan_paths():
    cfg = LossConfig(losses="l1:mask:1,adv:all:0.1,tgan:all:0.1,sgan:all:0.1",
                     padding=0, discriminator="enhanceNetSmall")
    net = LossNetUnshaded(cfg, high_res=64)
    assert net.has_adv and net.has_tgan and net.has_sgan
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(6)
    gt, pred, inp, prev_in, prev_pred = _fake_batch(rng)
    loss, values = net(params, gt, pred, inp, prev_in, prev_pred)
    assert "discr_pred" in values
    assert "temp_discr_pred" in values
    assert "spatial_discr_pred" in values
    d_loss, gt_s, pred_s = net.train_discriminator(
        params, inp, gt, prev_in, gt, pred, prev_pred)
    assert np.isfinite(float(d_loss))
    # discriminator gradient flows
    def f(p):
        l, _, _ = net.train_discriminator(p, inp, gt, prev_in, gt, pred,
                                          prev_pred)
        return l
    g = jax.grad(f)(params)
    leaves = jax.tree_util.tree_leaves(g["discr"])
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_lossnet_unshaded_perceptual_random_vgg():
    cfg = LossConfig(losses="perceptual:color:1,texture:color:0.5", padding=0)
    with pytest.warns(UserWarning):
        net = LossNetUnshaded(cfg, high_res=64)
        params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    gt, pred, inp, prev_in, prev_pred = _fake_batch(rng)
    loss, values = net(params, gt, pred, inp, prev_in, prev_pred)
    assert "perceptual:color" in values and "texture:color" in values
    assert float(loss) > 0
    loss0, _ = net(params, gt, gt, inp, prev_in, prev_pred)
    assert float(loss0) < 1e-8


# ---------------------------------------------------------------------------
# LossNet (shaded)
# ---------------------------------------------------------------------------

def test_lossnet_shaded_basic_and_gan():
    cfg = LossConfig(padding=0, discriminator="enhanceNetSmall")
    net = LossNet(cfg, high_res=64, input_channels=5, output_channels=3,
                  losses="l1:1,temp-l2:0.1,adv:0.2")
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(8)
    gt = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    pred = gt + 0.1
    inp = jnp.asarray(rng.rand(2, 16, 16, 5).astype(np.float32))
    prev = jnp.asarray(rng.rand(2, 64, 64, 4).astype(np.float32))
    loss, values = net(params, gt, pred, inp, prev)
    assert float(values["l1"]) > 0.05
    assert "discr_pred" in values and "temp-l2" in values
    d_loss, gs, ps = net.train_discriminator(
        params, inp, jnp.concatenate([gt, prev[..., 3:4]], -1),
        prev, jnp.concatenate([pred, prev[..., 3:4]], -1), prev)
    assert np.isfinite(float(d_loss))


def test_lossnet_shaded_wgan_gp():
    cfg = LossConfig(padding=0, discriminator="enhanceNetSmall")
    net = LossNet(cfg, high_res=32, input_channels=5, output_channels=3,
                  losses="l1:1,wgan-gp:0.2")
    assert net.gan_kind == "wgan-gp"
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(9)
    gt = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    pred = gt + 0.2
    inp = jnp.asarray(rng.rand(2, 8, 8, 5).astype(np.float32))
    prev = jnp.asarray(rng.rand(2, 32, 32, 4).astype(np.float32))
    gt4 = jnp.concatenate([gt, prev[..., 3:4]], -1)
    pred4 = jnp.concatenate([pred, prev[..., 3:4]], -1)
    d_loss, _, _ = net.train_discriminator(
        params, inp, gt4, prev, pred4, prev, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(d_loss))
