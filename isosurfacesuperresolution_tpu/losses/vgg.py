"""VGG-19 feature extractor for perceptual / texture losses.

Parity target: `losses/lossbuilder.py:169-230` - the reference builds a
trimmed torchvision VGG-19 and hooks activations *after* named conv layers
(pre-ReLU), with ImageNet normalization in front.  Layer names follow the
reference: ``conv_1`` .. ``conv_16`` count every conv in order.

Weight sourcing: this environment has no torchvision and no network egress,
so pretrained weights are loaded from a local file when available
(``$ISOSR_VGG19_WEIGHTS`` or ``~/.cache/isosr/vgg19.npz``); either an ``.npz``
of HWIO kernels or a torch ``.pth`` state-dict (OIHW, converted on load) is
accepted.  Without weights the extractor falls back to a *fixed-seed He
initialization*: random VGG features still yield a usable perceptual metric
(random-weight perceptual losses are a known-good baseline), but quality
parity with the paper requires the pretrained file - the fallback is logged
loudly.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# torchvision vgg19.features layout: conv counts per block
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG19Features(nn.Module):
    """Runs VGG-19 up to ``max_conv`` and returns {conv_i: pre-ReLU activation}.

    Only the prefix needed for the deepest requested layer is evaluated
    (the reference trims the model the same way, `lossbuilder.py:223-228`).
    """

    max_conv: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std

        feats: Dict[str, jnp.ndarray] = {}
        conv_idx = 0
        for v in VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            conv_idx += 1
            if conv_idx > self.max_conv:
                break
            x = nn.Conv(v, (3, 3), padding=1, name=f"conv_{conv_idx}")(x)
            feats[f"conv_{conv_idx}"] = x
            x = nn.relu(x)
        return feats


def default_weight_paths() -> List[str]:
    paths = []
    env = os.environ.get("ISOSR_VGG19_WEIGHTS")
    if env:
        paths.append(env)
    paths.append(os.path.expanduser("~/.cache/isosr/vgg19.npz"))
    paths.append(os.path.expanduser("~/.cache/isosr/vgg19.pth"))
    return paths


def _torch_state_dict_to_params(state: dict, max_conv: int) -> dict:
    """Convert torchvision ``vgg19().features`` state-dict to flax params."""
    # features.N.weight for conv layers in order; collect conv layers
    conv_keys = sorted(
        {int(k.split(".")[1]) for k in state
         if k.startswith("features.") and k.endswith(".weight")})
    params = {}
    for i, layer_idx in enumerate(conv_keys[:max_conv], start=1):
        w = np.asarray(state[f"features.{layer_idx}.weight"])  # OIHW
        b = np.asarray(state[f"features.{layer_idx}.bias"])
        params[f"conv_{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # -> HWIO
            "bias": jnp.asarray(b),
        }
    return {"params": params}


def load_vgg19_params(max_conv: int = 16,
                      rng: jax.Array | None = None,
                      paths: Sequence[str] | None = None
                      ) -> Tuple[dict, bool]:
    """Load (or He-init) VGG-19 parameters.

    Returns (params, pretrained) where ``pretrained`` says whether real
    weights were found.
    """
    for path in (paths if paths is not None else default_weight_paths()):
        if not os.path.exists(path):
            continue
        if path.endswith(".npz"):
            data = np.load(path)
            params = {}
            for i in range(1, max_conv + 1):
                params[f"conv_{i}"] = {
                    "kernel": jnp.asarray(data[f"conv_{i}_kernel"]),
                    "bias": jnp.asarray(data[f"conv_{i}_bias"]),
                }
            return {"params": params}, True
        if path.endswith((".pth", ".pt")):
            import torch
            state = torch.load(path, map_location="cpu", weights_only=True)
            if hasattr(state, "state_dict"):
                state = state.state_dict()
            return _torch_state_dict_to_params(
                {k: v.numpy() for k, v in state.items()}, max_conv), True

    warnings.warn(
        "No pretrained VGG-19 weights found (checked ISOSR_VGG19_WEIGHTS and "
        "~/.cache/isosr/). Falling back to fixed-seed random features: "
        "perceptual/texture losses remain usable but do not match the "
        "paper's pretrained-VGG numbers.", stacklevel=2)
    module = VGG19Features(max_conv=max_conv)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = module.init(rng, jnp.zeros((1, 32, 32, 3), jnp.float32))
    return params, False


def max_conv_needed(layer_weights: Sequence[Tuple[str, float]]) -> int:
    """Deepest conv index needed for the given (name, weight) layer list."""
    mx = 0
    for name, _ in layer_weights:
        if name.startswith("conv_"):
            mx = max(mx, int(name.split("_")[1]))
        else:
            raise ValueError(f"unsupported VGG layer name {name!r}; "
                             "expected conv_<i>")
    return mx
