"""Reference .pth checkpoint import: layout + numerical forward parity.

Builds reference-layout torch generators (the exact Sequential/ModuleList
naming of `models/enhancenet.py:92-125`, `models/tecogan.py:41-62`,
`models/subpixelnet.py:7-27`), saves them in the reference's checkpoint
format (`mainVideoUnshaded.py:799-811`: a dict pickling the WHOLE module),
imports them through `infer/torch_import.py` - the classes below are NOT
importable by the stub unpickler (it stubs every non-torch module), which
is exactly the situation with the reference's released checkpoints - and
checks our Flax generators reproduce the torch forward pass.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from isosurfacesuperresolution_tpu.infer.torch_import import (  # noqa: E402
    config_from_reference, load_reference_pth, reference_state_dict)


def _recon(x, out, cm):
    """Reference residual reconstruction (enhancenet.py:51-90)."""
    resized = tF.interpolate(x[:, :cm], size=out.shape[2:], mode="bilinear")
    if cm < out.shape[1]:
        return torch.cat([resized + out[:, :cm], out[:, cm:]], dim=1)
    return resized + out


class RefEnhanceNet(tnn.Module):
    """Reference-layout EnhanceNet (enhancenet.py:92-125 structure)."""

    def __init__(self, cin, cout, n_blocks=3, use_bn=False, cm=None):
        super().__init__()
        self.cm = min(cin, cout) if cm is None else cm
        self.preblock = tnn.Sequential(tnn.Conv2d(cin, 64, 3, padding=1),
                                       tnn.ReLU())
        blocks = []
        for _ in range(n_blocks):
            if use_bn:
                blocks.append(tnn.Sequential(
                    tnn.Conv2d(64, 64, 3, padding=1), tnn.BatchNorm2d(64),
                    tnn.ReLU(),
                    tnn.Conv2d(64, 64, 3, padding=1), tnn.BatchNorm2d(64)))
            else:
                blocks.append(tnn.Sequential(
                    tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),
                    tnn.Conv2d(64, 64, 3, padding=1)))
        self.blocks = tnn.ModuleList(blocks)
        up = lambda: tnn.Upsample(scale_factor=2, mode="bilinear")
        self.postblock = tnn.Sequential(
            up(), tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),
            up(), tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(64, cout, 3, padding=1))

    def forward(self, x):
        f = self.preblock(x)
        for b in self.blocks:
            f = f + b(f)
        return _recon(x, self.postblock(f), self.cm)


class RefTecoGAN(tnn.Module):
    """Reference-layout TecoGAN (tecogan.py:41-62 structure)."""

    def __init__(self, cin, cout, n_blocks=2, cm=None):
        super().__init__()
        self.cm = min(cin, cout) if cm is None else cm
        self.preblock = tnn.Sequential(tnn.Conv2d(cin, 64, 3, padding=1),
                                       tnn.LeakyReLU())
        self.blocks = tnn.ModuleList([
            tnn.Sequential(tnn.Conv2d(64, 64, 3, padding=1),
                           tnn.LeakyReLU(),
                           tnn.Conv2d(64, 64, 3, padding=1))
            for _ in range(n_blocks)])
        self.postblock = tnn.Sequential(
            tnn.ConvTranspose2d(64, 64, 3, stride=2, padding=1,
                                output_padding=1), tnn.LeakyReLU(),
            tnn.ConvTranspose2d(64, 64, 3, stride=2, padding=1,
                                output_padding=1), tnn.LeakyReLU(),
            tnn.Conv2d(64, cout, 3, padding=1), tnn.LeakyReLU())

    def forward(self, x):
        f = self.preblock(x)
        for b in self.blocks:
            f = f + b(f)
        return _recon(x, self.postblock(f), self.cm)


class RefSubpixelNet(tnn.Module):
    """Reference-layout SubpixelNet (subpixelnet.py:7-27 structure)."""

    def __init__(self, cin, cout, r=4):
        super().__init__()
        self.r = r
        self.conv1 = tnn.Conv2d(cin, 64, 5, padding=2)
        self.conv2 = tnn.Conv2d(64, 64, 5, padding=2)
        self.conv3 = tnn.Conv2d(64, 64, 3, padding=1)
        self.conv4 = tnn.Conv2d(64, 32, 3, padding=1)
        self.conv5 = tnn.Conv2d(32, cout * r * r, 3, padding=1)

    def forward(self, x):
        x = tF.relu(self.conv1(x))
        x = tF.relu(self.conv2(x))
        x = tF.relu(self.conv3(x))
        x = tF.relu(self.conv4(x))
        return tF.pixel_shuffle(self.conv5(x), self.r)


def _save_checkpoint(tmp_path, module, parameters=None):
    """Save in the reference's checkpoint format with the module claiming
    to live in the reference package ``models.*`` (registered only for the
    duration of the save, so it is NOT importable at load time) - exactly
    the situation with a released reference checkpoint, so the importer's
    stub-unpickler path is what every test exercises."""
    import sys
    import types
    cls = type(module)
    modname = "models." + cls.__name__.lower().replace("ref", "")
    orig = cls.__module__
    cls.__module__ = modname
    fake_pkg = types.ModuleType("models")
    fake = types.ModuleType(modname)
    setattr(fake, cls.__qualname__, cls)
    sys.modules["models"] = fake_pkg
    sys.modules[modname] = fake
    try:
        path = str(tmp_path / "model_epoch_7.pth")
        torch.save({"epoch": 7, "model": module,
                    "parameters": parameters or {}}, path)
    finally:
        cls.__module__ = orig
        del sys.modules["models"]
        del sys.modules[modname]
    return path


def _run_both(module, path, cin, atol=3e-4, interior=0):
    """Torch forward vs imported-Flax forward on the same input."""
    loaded = load_reference_pth(path)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 12, 12, cin).astype(np.float32)
    with torch.no_grad():
        module.eval()
        ref = module(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = loaded.model.apply(loaded.params, jnp.asarray(x))
    got = np.asarray(out[0] if isinstance(out, tuple) else out)
    assert got.shape == ref.shape
    if interior:
        b = interior
        got = got[:, b:-b, b:-b]
        ref = ref[:, b:-b, b:-b]
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)
    return loaded


def test_enhancenet_checkpoint_roundtrip(tmp_path):
    m = RefEnhanceNet(5, 6, n_blocks=3)
    path = _save_checkpoint(tmp_path, m)
    sd, meta = reference_state_dict(path)
    cfg = config_from_reference(sd, meta)
    assert cfg.model == "EnhanceNet"
    assert cfg.input_channels == 5 and cfg.output_channels == 6
    assert cfg.num_residual_blocks == 3 and not cfg.use_bn
    assert cfg.channel_mask == (0, 1, 2, 3, 4)
    _run_both(m, path, 5)


def test_enhancenet_temporal_channels(tmp_path):
    """101-channel unshaded temporal net: Cin sniffing like the
    reference (`loadedmodel.py:36-55`)."""
    m = RefEnhanceNet(101, 6, n_blocks=2, cm=5)
    path = _save_checkpoint(tmp_path, m, {"initialImage": "unshaded"})
    loaded = load_reference_pth(path)
    assert loaded.cfg.model.input_channels == 5
    assert loaded.unshaded
    assert loaded.initial_image_mode == "unshaded"
    _run_both(m, path, 101)


def test_enhancenet_bn_variant(tmp_path):
    m = RefEnhanceNet(5, 6, n_blocks=2, use_bn=True)
    # non-trivial running stats: a few training-mode forwards
    m.train()
    with torch.no_grad():
        for b in m.blocks:
            b(torch.randn(2, 64, 8, 8))
    path = _save_checkpoint(tmp_path, m)
    sd, meta = reference_state_dict(path)
    cfg = config_from_reference(sd, meta)
    assert cfg.use_bn
    _run_both(m, path, 5)


def test_state_dict_only_pth(tmp_path):
    """--pretrained-style bare state dicts load too
    (`mainVideoUnshaded.py:317-319`)."""
    m = RefEnhanceNet(5, 6, n_blocks=2)
    path = str(tmp_path / "gen_l1normal.pth")
    torch.save(m.state_dict(), path)
    _run_both(m, path, 5)


def test_subpixelnet_import(tmp_path):
    m = RefSubpixelNet(5, 6)
    path = _save_checkpoint(tmp_path, m)
    sd, meta = reference_state_dict(path)
    cfg = config_from_reference(sd, meta)
    assert cfg.model == "SubpixelNet"
    assert cfg.output_channels == 6
    _run_both(m, path, 5)


def test_tecogan_import(tmp_path):
    m = RefTecoGAN(5, 6)
    path = _save_checkpoint(tmp_path, m)
    sd, meta = reference_state_dict(path)
    cfg = config_from_reference(sd, meta)
    assert cfg.model == "TecoGAN"
    _run_both(m, path, 5)


def test_rcan_rejected_with_explanation(tmp_path):
    sd = {"net.pre.weight": np.zeros((64, 5, 3, 3), np.float32),
          "net.pre.bias": np.zeros((64,), np.float32)}
    path = str(tmp_path / "rcan.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    with pytest.raises(ValueError, match="RCAN"):
        load_reference_pth(path)


def test_loadedmodel_dispatches_pth(tmp_path):
    """Every eval harness resolves models via LoadedModel.from_run_dir;
    .pth files must route to the importer."""
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    m = RefEnhanceNet(101, 6, n_blocks=2, cm=5)
    path = _save_checkpoint(tmp_path, m)
    loaded = LoadedModel.from_run_dir(path)
    assert loaded.cfg.model.model == "EnhanceNet"
    # inference() consumes the imported net end-to-end (temporal step)
    low = jnp.zeros((1, 8, 8, 5), jnp.float32)
    flow = jnp.zeros((1, 8, 8, 2), jnp.float32)
    out = loaded.inference(low, None, flow)
    assert out.shape == (1, 32, 32, 6)
    assert np.isfinite(np.asarray(out)).all()
