"""Numeric parity of the VGG-19 feature extractor against torch semantics.

The reference builds torchvision's ``vgg19().features`` and hooks
activations after each conv (pre-ReLU) with ImageNet normalization in front
(`losses/lossbuilder.py:169-230`).  This environment has neither torchvision
nor the pretrained weights, so parity is checked the other way around: a
from-scratch torch replica of the ``vgg19().features`` sequential (same
layer layout, same state-dict key naming ``features.N.{weight,bias}``) is
given random weights, saved as a ``.pth`` state-dict, loaded through
`losses/vgg.load_vgg19_params`' converter, and the JAX features must match
the torch features layer by layer.  This validates everything except the
pretrained values themselves: conv arithmetic/padding, pool placement,
conv_i indexing, normalization, and the OIHW->HWIO converter - so a real
``vgg19.pth`` dropped into ``~/.cache/isosr/`` is numerically faithful.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.losses.vgg import (
    IMAGENET_MEAN, IMAGENET_STD, VGG19_CFG, VGG19Features,
    load_vgg19_params)


def _torch_vgg19_features():
    """Replicates torchvision ``vgg19().features`` layer-for-layer
    (Conv2d(3x3, pad 1) + ReLU per entry, MaxPool2d(2) per "M")."""
    import torch.nn as nn
    layers = []
    in_ch = 3
    for v in VGG19_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers)


@pytest.mark.parametrize(
    "max_conv",
    [4, pytest.param(16, marks=pytest.mark.slow)])
def test_vgg_features_match_torch(tmp_path, max_conv):
    torch.manual_seed(0)
    model = _torch_vgg19_features()
    # scale weights down so 16 layers of random He-magnitude convs don't
    # blow up the activation range
    with torch.no_grad():
        for m in model:
            if isinstance(m, torch.nn.Conv2d):
                m.weight *= 0.3
    path = tmp_path / "vgg19.pth"
    torch.save({f"features.{i}.{k}": v for i, m in enumerate(model)
                for k, v in m.state_dict().items()}, str(path))

    params, pretrained = load_vgg19_params(max_conv=max_conv,
                                           paths=[str(path)])
    assert pretrained

    rng = np.random.RandomState(1)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)

    feats = VGG19Features(max_conv=max_conv).apply(
        params, jnp.asarray(x), mutable=False)

    # torch forward with pre-ReLU hooks
    mean = torch.tensor(IMAGENET_MEAN).view(1, -1, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, -1, 1, 1)
    t = (torch.from_numpy(x).permute(0, 3, 1, 2) - mean) / std
    conv_i = 0
    with torch.no_grad():
        for m in model:
            t = m(t)
            if isinstance(m, torch.nn.Conv2d):
                conv_i += 1
                name = f"conv_{conv_i}"
                assert name in feats, f"missing {name}"
                ours = np.moveaxis(np.asarray(feats[name]), -1, 1)
                np.testing.assert_allclose(ours, t.numpy(), rtol=1e-4,
                                           atol=1e-4)
                if conv_i == max_conv:
                    break
    assert conv_i == max_conv
    assert len(feats) == max_conv


@pytest.mark.slow
def test_lossnet_perceptual_with_pretrained_file(tmp_path, monkeypatch):
    """LossNetUnshaded picks up $ISOSR_VGG19_WEIGHTS and runs the
    perceptual/texture stage WITHOUT the random-feature fallback (and
    without its warning)."""
    import warnings

    from isosurfacesuperresolution_tpu.config import LossConfig
    from isosurfacesuperresolution_tpu.losses.lossnet_unshaded import (
        LossNetUnshaded)

    torch.manual_seed(3)
    model = _torch_vgg19_features()
    with torch.no_grad():
        for m in model:
            if isinstance(m, torch.nn.Conv2d):
                m.weight *= 0.3
    path = tmp_path / "vgg19.pth"
    torch.save({f"features.{i}.{k}": v for i, m in enumerate(model)
                for k, v in m.state_dict().items()}, str(path))
    monkeypatch.setenv("ISOSR_VGG19_WEIGHTS", str(path))

    cfg = LossConfig(losses="perceptual:color:1,texture:color:0.5",
                     padding=0,
                     perceptual_loss_layers="conv_1:0.03,conv_4:0.005",
                     texture_loss_layers="conv_1:1,conv_3:1")
    with warnings.catch_warnings():
        warnings.simplefilter("error")      # fallback would warn -> fail
        net = LossNetUnshaded(cfg, high_res=64)
        params = net.init(jax.random.PRNGKey(0))
    assert net.vgg_pretrained

    rng = np.random.RandomState(7)
    gt = jnp.asarray(rng.rand(2, 64, 64, 6).astype(np.float32))
    pred = gt + 0.1 * jnp.asarray(rng.rand(2, 64, 64, 6).astype(np.float32))
    inp = jnp.asarray(rng.rand(2, 64, 64, 5).astype(np.float32))
    prev_in = jnp.asarray(rng.rand(2, 64, 64, 5).astype(np.float32))
    loss, values = net(params, gt, pred, inp, prev_in, gt)
    assert float(loss) > 0
    assert "perceptual:color" in values
    loss0, _ = net(params, gt, gt, inp, prev_in, prev_in)
    assert float(loss0) < 1e-8


def test_npz_roundtrip(tmp_path):
    """The documented npz layout loads identically to the pth path."""
    torch.manual_seed(2)
    model = _torch_vgg19_features()
    pth = tmp_path / "w.pth"
    torch.save({f"features.{i}.{k}": v for i, m in enumerate(model)
                for k, v in m.state_dict().items()}, str(pth))
    params_pth, _ = load_vgg19_params(max_conv=3, paths=[str(pth)])

    npz = {}
    conv_i = 0
    for i, m in enumerate(model):
        if isinstance(m, torch.nn.Conv2d):
            conv_i += 1
            npz[f"conv_{conv_i}_kernel"] = (
                m.weight.detach().numpy().transpose(2, 3, 1, 0))
            npz[f"conv_{conv_i}_bias"] = m.bias.detach().numpy()
    npz_path = tmp_path / "w.npz"
    np.savez(str(npz_path), **npz)
    params_npz, _ = load_vgg19_params(max_conv=3, paths=[str(npz_path)])

    flat_a = jax.tree_util.tree_leaves(params_pth)
    flat_b = jax.tree_util.tree_leaves(params_npz)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
