"""Import the reference's PyTorch ``.pth`` checkpoints into Flax params.

Parity targets: the reference distributes its pretrained networks as
PyTorch checkpoints and supports two on-disk shapes -

* a training checkpoint dict ``{'epoch', 'model': <whole nn.Module>,
  'parameters': <arg dict>, ...}`` (`mainVideoUnshaded.py:799-811`), which
  `inference/loadedmodel.py:16-68` unpickles wholesale, and
* a bare/nested ``state_dict`` as consumed by ``--pretrained``
  (`mainVideoUnshaded.py:317-319`).

Both load here WITHOUT the reference code on ``sys.path``: whole-module
pickles are read with a stub unpickler that substitutes attribute-bag
classes for the reference's own model/criterion classes (tensors, torch
containers and optimizers unpickle through the real torch machinery) and
the flat state dict is then recovered by walking ``_parameters`` /
``_buffers`` / ``_modules``.

Weight layout conversion (NCHW torch -> NHWC Flax):

* ``Conv2d.weight (Co, Ci, kh, kw)`` -> Flax ``kernel (kh, kw, Ci, Co)``
* ``ConvTranspose2d.weight (Ci, Co, kh, kw)`` -> Flax ``ConvTranspose``
  ``kernel (kh, kw, Ci, Co)`` with the spatial taps FLIPPED:
  ``lax.conv_transpose(transpose_kernel=False)`` correlates with the
  given kernel while torch's transposed conv is the conv adjoint.
* ``Linear.weight (Co, Ci)`` -> Flax ``Dense`` ``kernel (Ci, Co)``.

Supported generators: EnhanceNet (incl. the BatchNorm variant), TecoGAN,
SubpixelNet.  The reference's RCAN is NOT importable by design: it feeds
``nn.PixelShuffle(4)`` directly with 64 features so its output conv sees
64/16 = 4 channels (`rcan.py:100-110`) - a channel-count quirk this
framework deliberately fixes with a pre-shuffle expansion conv
(SURVEY.md section 7), so the parameter layouts are incompatible.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

# modules whose classes are allowed to unpickle for real; everything else
# (the reference's models/losses/argparse dumps) becomes an attribute bag
_REAL_MODULE_PREFIXES = ("torch", "collections", "builtins", "numpy",
                         "numpy.core")


class _Stub:
    """Attribute bag standing in for an unimportable pickled class."""

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<stub {type(self).__module__}.{type(self).__name__}>"


_STUB_CACHE: Dict[Tuple[str, str], type] = {}


def _stub_class(module: str, name: str) -> type:
    key = (module, name)
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(name, (_Stub,), {"__module__": module})
    return _STUB_CACHE[key]


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        # resolve for real when importable (torch internals, stdlib
        # containers, '__builtin__.set' from protocol-2 pickles, ...);
        # stub anything that is not on this interpreter's path - i.e.
        # the reference's own model/criterion/opt classes
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _stub_class(module, name)


def _stub_pickle_module():
    """A pickle-compatible module object whose Unpickler stubs unknown
    classes (torch.load duck-types ``pickle_module``)."""
    import types
    mod = types.ModuleType("isosr_stub_pickle")
    mod.Unpickler = _StubUnpickler
    mod.load = lambda f, **kw: _StubUnpickler(f, **kw).load()
    mod.loads = lambda b, **kw: _StubUnpickler(io.BytesIO(b), **kw).load()
    return mod


def _torch_load_stubbed(path: str):
    import torch
    kw = dict(map_location="cpu", pickle_module=_stub_pickle_module())
    try:
        return torch.load(path, weights_only=False, **kw)
    except TypeError:  # torch < 1.13: no weights_only kwarg
        return torch.load(path, **kw)


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _flatten_module(obj: Any, prefix: str, out: Dict[str, np.ndarray]):
    """Recover a flat state dict from a (possibly stubbed) module tree."""
    d = getattr(obj, "__dict__", None)
    if d is None:
        return
    for k, v in (d.get("_parameters") or {}).items():
        if v is not None:
            out[prefix + k] = _to_np(v)
    for k, v in (d.get("_buffers") or {}).items():
        if v is not None:
            out[prefix + k] = _to_np(v)
    for k, v in (d.get("_modules") or {}).items():
        if v is not None:
            _flatten_module(v, prefix + k + ".", out)


def reference_state_dict(path: str
                         ) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Load a reference ``.pth`` -> (flat numpy state dict, parameters)."""
    obj = _torch_load_stubbed(path)
    meta: Dict[str, Any] = {}
    model = obj
    if isinstance(obj, dict) and not _looks_like_state_dict(obj):
        raw_meta = obj.get("parameters", {})
        if not isinstance(raw_meta, dict):
            raw_meta = dict(getattr(raw_meta, "__dict__", {}) or {})
        meta = raw_meta
        model = obj.get("model", obj)
    if isinstance(model, dict):          # already a state dict
        sd = {k: _to_np(v) for k, v in model.items()}
    else:                                # whole (stubbed) module object
        sd = {}
        _flatten_module(model, "", sd)
    if not sd:
        raise ValueError(f"{path}: no parameters found (unsupported layout)")
    return sd, meta


def _looks_like_state_dict(d: dict) -> bool:
    return d and all(hasattr(v, "shape") or hasattr(v, "detach")
                     for v in d.values())


# ---------------------------------------------------------------------------
# layout conversion
# ---------------------------------------------------------------------------

def _conv(sd, key):
    return {"kernel": sd[key + ".weight"].transpose(2, 3, 1, 0),
            "bias": sd[key + ".bias"]}


def _conv_transpose(sd, key):
    w = sd[key + ".weight"].transpose(2, 3, 0, 1)   # (kh, kw, Ci, Co)
    return {"kernel": w[::-1, ::-1].copy(), "bias": sd[key + ".bias"]}


def _dense(sd, key):
    return {"kernel": sd[key + ".weight"].T.copy(),
            "bias": sd[key + ".bias"]}


def sniff_model_kind(sd: Dict[str, np.ndarray]) -> str:
    if "net.pre.weight" in sd:
        raise ValueError(
            "reference RCAN checkpoints are not importable: the reference "
            "feeds PixelShuffle(4) with 64 features so its post conv sees "
            "4 channels (rcan.py:100-110); this framework fixes that with "
            "a pre-shuffle expansion conv, so the layouts are incompatible."
            "  Retrain with --model RCAN instead.")
    if "conv5.weight" in sd:
        return "SubpixelNet"
    if "postblock.8.weight" in sd:
        return "EnhanceNet"
    if "postblock.0.weight" in sd and "postblock.4.weight" in sd:
        return "TecoGAN"
    raise ValueError(f"unrecognized generator state dict "
                     f"(keys: {sorted(sd)[:8]}...)")


def _count_blocks(sd) -> int:
    n = 0
    while f"blocks.{n}.0.weight" in sd:
        n += 1
    return n


def config_from_reference(sd: Dict[str, np.ndarray],
                          meta: Dict[str, Any]):
    """Infer a ModelConfig the way the reference sniffs its checkpoints
    (`inference/loadedmodel.py:36-55`: in_channels == 5 + 6*16 means the
    unshaded temporal net) plus the saved arg dict when present."""
    from isosurfacesuperresolution_tpu.config import ModelConfig

    kind = sniff_model_kind(sd)
    upscale = int(meta.get("upscaleFactor", 4))
    if kind == "SubpixelNet":
        cin_total = sd["conv1.weight"].shape[1]
        cout = sd["conv5.weight"].shape[0] // upscale ** 2
        nblocks = 0
        use_bn = False
    else:
        cin_total = sd["preblock.0.weight"].shape[1]
        out_key = "postblock.8" if kind == "EnhanceNet" else "postblock.4"
        cout = sd[out_key + ".weight"].shape[0]
        nblocks = _count_blocks(sd)
        use_bn = "blocks.0.1.running_mean" in sd
    # temporal nets concatenate the flattened warped previous frame:
    # Cin = input_channels + output_channels * r^2
    warped = cout * upscale ** 2
    input_channels = cin_total - warped if cin_total > warped else cin_total
    channel_mask = tuple(range(min(input_channels, cout)))
    return ModelConfig(
        model=kind,
        upscale_factor=upscale,
        input_channels=input_channels,
        output_channels=cout,
        channel_mask=channel_mask,
        upsample=str(meta.get("upsample", "bilinear")),
        recon_type=str(meta.get("reconType", "residual")),
        use_bn=use_bn,
        num_residual_blocks=nblocks if nblocks else 10,
        num_features=(sd["preblock.0.weight"].shape[0]
                      if kind != "SubpixelNet" else 64),
    )


def params_from_reference(sd: Dict[str, np.ndarray], cfg
                          ) -> Dict[str, Any]:
    """Flat torch state dict -> the Flax variables tree of our generator
    (`models/generators.py`), matching ``model.init``'s structure."""
    kind = cfg.model
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    if kind == "SubpixelNet":
        for i in range(1, 6):
            p[f"conv{i}"] = _conv(sd, f"conv{i}")
        return {"params": p}

    p["pre"] = _conv(sd, "preblock.0")
    # residual blocks: Sequential indices shift when BN layers are present
    i_conv2 = 3 if cfg.use_bn else 2
    for i in range(cfg.num_residual_blocks):
        p[f"block{i}_conv1"] = _conv(sd, f"blocks.{i}.0")
        p[f"block{i}_conv2"] = _conv(sd, f"blocks.{i}.{i_conv2}")
        if cfg.use_bn:
            for j, which in ((1, "bn1"), (4, "bn2")):
                p[f"block{i}_{which}"] = {
                    "scale": sd[f"blocks.{i}.{j}.weight"],
                    "bias": sd[f"blocks.{i}.{j}.bias"]}
                bs[f"block{i}_{which}"] = {
                    "mean": sd[f"blocks.{i}.{j}.running_mean"],
                    "var": sd[f"blocks.{i}.{j}.running_var"]}

    if kind == "EnhanceNet":
        p["post1"] = _conv(sd, "postblock.1")
        p["post2"] = _conv(sd, "postblock.4")
        p["post3"] = _conv(sd, "postblock.6")
        p["out"] = _conv(sd, "postblock.8")
    elif kind == "TecoGAN":
        p["up1"] = _conv_transpose(sd, "postblock.0")
        p["up2"] = _conv_transpose(sd, "postblock.2")
        p["out"] = _conv(sd, "postblock.4")
    else:  # pragma: no cover - sniff_model_kind gates this
        raise ValueError(kind)

    out = {"params": p}
    if bs:
        out["batch_stats"] = bs
    return out


def load_reference_pth(path: str, fast: bool = False):
    """Reference ``.pth`` -> ready-to-run :class:`LoadedModel`."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.config import (
        Config, TrainConfig)
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network, network_input_channels)

    sd, meta = reference_state_dict(path)
    mcfg = config_from_reference(sd, meta)
    if fast:
        mcfg = dataclasses.replace(mcfg, fused_upsample=True)
    unshaded = mcfg.output_channels == 6
    # temporal nets were trained with the flattened warped previous frame
    # concatenated (Cin = input + out*r^2); single-frame nets were not
    first = ("conv1.weight" if mcfg.model == "SubpixelNet"
             else "preblock.0.weight")
    temporal = (sd[first].shape[1] >
                mcfg.output_channels * mcfg.upscale_factor ** 2)
    # reference default initial-image modes (`loadedmodel.py:57-64`)
    initial = str(meta.get("initialImage",
                           "input" if unshaded else "zero"))
    cfg = Config(model=mcfg,
                 train=TrainConfig(
                     initial_image_mode=initial,
                     disable_temporal=not temporal,
                     ao_inverted=bool(meta.get("aoInverted", False))))

    model = create_network(mcfg)
    cin = network_input_channels(mcfg, temporal=temporal)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, 8, cin), jnp.float32))
    params = params_from_reference(sd, mcfg)
    # validate against the init tree: same structure, same leaf shapes
    flat_t = jax.tree_util.tree_leaves_with_path(template)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, params)))
    for keypath, leaf in flat_t:
        if keypath not in flat_p:
            raise ValueError(f"imported params miss {keypath}")
        if flat_p[keypath].shape != leaf.shape:
            raise ValueError(f"shape mismatch at {keypath}: "
                             f"{flat_p[keypath].shape} vs {leaf.shape}")
    if len(flat_p) != len(flat_t):
        extra = set(flat_p) - {k for k, _ in flat_t}
        raise ValueError(f"imported params have extra leaves: {extra}")
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template),
        [flat_p[k] for k, _ in flat_t])
    return LoadedModel(model, params, cfg, bare_input=not temporal)
