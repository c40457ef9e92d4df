"""Reference .pth checkpoint EXPORT: our Flax params -> the reference's
state-dict naming, verified by loading them into reference-layout torch
nets (the classes in test_torch_import.py) and matching the forward
pass, plus a full export->import roundtrip through `torch_import`.

Parity target: the reference's ``--pretrained`` consumes bare state
dicts via ``load_state_dict`` (`mainVideoUnshaded.py:317-319`), so a
strict-mode ``load_state_dict`` of our export proves a net trained here
runs in the reference unchanged.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from isosurfacesuperresolution_tpu.config import Config, ModelConfig  # noqa: E402
from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel  # noqa: E402
from isosurfacesuperresolution_tpu.infer.torch_export import (  # noqa: E402
    export_reference_pth, reference_state_dict_from_params)
from isosurfacesuperresolution_tpu.infer.torch_import import (  # noqa: E402
    load_reference_pth)
from isosurfacesuperresolution_tpu.models.generators import (  # noqa: E402
    create_network)

from test_torch_import import (  # noqa: E402
    RefEnhanceNet, RefSubpixelNet, RefTecoGAN)


def _init(mcfg, cin, seed=3):
    model = create_network(mcfg)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 8, 8, cin), jnp.float32))
    return model, variables


def _check_forward(model, variables, ref_module, cin, atol=3e-4):
    rng = np.random.RandomState(1)
    x = rng.rand(2, 12, 12, cin).astype(np.float32)
    out = model.apply(variables, jnp.asarray(x))
    ours = np.asarray(out[0] if isinstance(out, tuple) else out)
    with torch.no_grad():
        ref_module.eval()
        ref = ref_module(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-3)


def test_export_enhancenet_loads_strict_and_matches():
    mcfg = ModelConfig(model="EnhanceNet", input_channels=5,
                       output_channels=6, num_residual_blocks=3,
                       channel_mask=(0, 1, 2, 3, 4))
    model, variables = _init(mcfg, 5)
    sd = reference_state_dict_from_params(variables, mcfg)
    ref = RefEnhanceNet(5, 6, n_blocks=3)
    ref.load_state_dict(sd, strict=True)
    _check_forward(model, variables, ref, 5)


def test_export_enhancenet_bn_loads_strict_and_matches():
    mcfg = ModelConfig(model="EnhanceNet", input_channels=5,
                       output_channels=6, num_residual_blocks=2,
                       use_bn=True, channel_mask=(0, 1, 2, 3, 4))
    model, variables = _init(mcfg, 5)
    # non-trivial batch stats so running_mean/var actually matter
    leaves, tdef = jax.tree_util.tree_flatten(variables)
    rng = np.random.RandomState(7)
    variables = jax.tree_util.tree_unflatten(tdef, [
        jnp.asarray(rng.uniform(0.1, 1.0, l.shape).astype(np.float32))
        if l.ndim == 1 else l for l in leaves])
    sd = reference_state_dict_from_params(variables, mcfg)
    ref = RefEnhanceNet(5, 6, n_blocks=2, use_bn=True)
    ref.load_state_dict(sd, strict=True)
    _check_forward(model, variables, ref, 5)


def test_export_tecogan_loads_strict_and_matches():
    mcfg = ModelConfig(model="TecoGAN", input_channels=5,
                       output_channels=6, num_residual_blocks=2,
                       channel_mask=(0, 1, 2, 3, 4))
    model, variables = _init(mcfg, 5)
    sd = reference_state_dict_from_params(variables, mcfg)
    ref = RefTecoGAN(5, 6, n_blocks=2)
    ref.load_state_dict(sd, strict=True)
    _check_forward(model, variables, ref, 5)


def test_export_subpixelnet_loads_strict_and_matches():
    mcfg = ModelConfig(model="SubpixelNet", input_channels=5,
                       output_channels=6, channel_mask=(0, 1, 2, 3, 4))
    model, variables = _init(mcfg, 5)
    sd = reference_state_dict_from_params(variables, mcfg)
    ref = RefSubpixelNet(5, 6)
    ref.load_state_dict(sd, strict=True)
    _check_forward(model, variables, ref, 5, atol=5e-4)


def test_export_import_roundtrip(tmp_path):
    """export_reference_pth -> load_reference_pth reproduces the exact
    parameter tree and config."""
    mcfg = ModelConfig(model="EnhanceNet", input_channels=5,
                       output_channels=6, num_residual_blocks=3,
                       channel_mask=(0, 1, 2, 3, 4))
    model, variables = _init(mcfg, 5)
    cfg = Config(model=mcfg)
    lm = LoadedModel(model, variables, cfg)
    path = str(tmp_path / "export.pth")
    export_reference_pth(lm, path)

    back = load_reference_pth(path)
    assert back.cfg.model.model == "EnhanceNet"
    assert back.cfg.model.num_residual_blocks == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=0),
        variables, back.params)


def test_export_rcan_rejected():
    mcfg = ModelConfig(model="RCAN", input_channels=5, output_channels=6,
                       channel_mask=(0, 1, 2, 3, 4))
    model, variables = _init(mcfg, 5)
    with pytest.raises(ValueError, match="RCAN"):
        reference_state_dict_from_params(variables, mcfg)
