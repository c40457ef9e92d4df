"""Learned texture-feature encoder: shapes, roundtrip, and that the
trained-objective machinery separates sharp from blurred content."""

import numpy as np
import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.losses.builder import texture_loss
from isosurfacesuperresolution_tpu.losses.learned_features import (
    TexDecoder, TexEncoder, degrade, load_texenc_params,
    save_texenc_params)


def test_encoder_shapes_and_strides():
    enc = TexEncoder()
    x = jnp.zeros((2, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    feats = enc.apply({"params": params}, x)
    assert set(feats) == {"conv_1", "conv_2", "conv_3", "conv_4"}
    assert feats["conv_1"].shape == (2, 32, 32, 32)
    assert feats["conv_2"].shape == (2, 16, 16, 64)
    assert feats["conv_4"].shape == (2, 8, 8, 128)


def test_decoder_restores_input_resolution():
    enc, dec = TexEncoder(), TexDecoder()
    x = jnp.zeros((1, 32, 32, 3))
    pe = enc.init(jax.random.PRNGKey(0), x)["params"]
    z = enc.apply({"params": pe}, x)["conv_4"]
    pd = dec.init(jax.random.PRNGKey(1), z)["params"]
    out = dec.apply({"params": pd}, z)
    assert out.shape == (1, 32, 32, 3)


def test_degrade_removes_high_frequency():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    y = degrade(x, jax.random.PRNGKey(0))
    assert y.shape == x.shape
    # 4x down->up keeps means but kills pixel-scale variance
    assert abs(float(y.mean()) - float(x.mean())) < 0.02
    dx = lambda a: jnp.abs(a[:, :, 1:] - a[:, :, :-1]).mean()
    assert float(dx(y)) < 0.5 * float(dx(x))


def test_save_load_roundtrip(tmp_path):
    enc = TexEncoder()
    x = jnp.zeros((1, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(3), x)["params"]
    path = str(tmp_path / "texenc.npz")
    save_texenc_params(params, path)
    loaded = load_texenc_params(path)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v))


def test_load_missing_returns_none(tmp_path):
    assert load_texenc_params(str(tmp_path / "nope.npz")) is None


def test_gram_separates_blur_even_untrained():
    """The evidence harness requirement in miniature: gram distance of
    (clean, blurred) must exceed (clean, clean-prime) noise floor."""
    rng = np.random.RandomState(1)
    enc = TexEncoder()
    clean = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), clean)["params"]
    blur = jax.image.resize(jax.image.resize(
        clean, (4, 8, 8, 3), "linear"), clean.shape, "linear")
    fc = enc.apply({"params": params}, clean)
    fb = enc.apply({"params": params}, blur)
    d_blur = float(texture_loss(fc["conv_3"], fb["conv_3"]))
    d_self = float(texture_loss(fc["conv_3"], fc["conv_3"]))
    assert d_self == 0.0
    # scale depends on init variance; only the separation matters
    assert d_blur > 1e-10
