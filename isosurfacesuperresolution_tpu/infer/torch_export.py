"""Export our Flax checkpoints as reference-format PyTorch ``.pth`` files.

The inverse of `infer/torch_import.py`: writes a flat ``state_dict``
under the reference's own module names (``preblock.0.weight``,
``blocks.N.{0,2}.*``, ``postblock.N.*`` — the Sequential/ModuleList
layout of `models/enhancenet.py:92-125`, `models/tecogan.py:41-62`,
`models/subpixelnet.py:7-27`), so a net trained in this framework loads
straight into the reference via its ``--pretrained`` path
(`mainVideoUnshaded.py:317-319`, which calls ``load_state_dict``).
Together with the importer this makes migration two-way: reference
checkpoints run here, and checkpoints trained here run in the reference.

Weight layout conversion (NHWC Flax -> NCHW torch), inverse of the
importer's:

* Flax ``Conv.kernel (kh, kw, Ci, Co)`` -> ``Conv2d.weight (Co, Ci, kh, kw)``
* Flax ``ConvTranspose.kernel (kh, kw, Ci, Co)`` -> ``ConvTranspose2d.weight
  (Ci, Co, kh, kw)`` with the spatial taps FLIPPED back (torch's
  transposed conv is the conv adjoint; flax correlates).
* BatchNorm ``scale/bias`` + ``batch_stats mean/var`` ->
  ``weight/bias/running_mean/running_var`` (+ ``num_batches_tracked``).

RCAN is not exportable for the same reason it is not importable: the
reference's RCAN feeds ``nn.PixelShuffle(4)`` 64 features directly
(`rcan.py:100-110`) while this framework inserts a pre-shuffle expansion
conv, so the parameter layouts are incompatible by design.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(kernel, bias):
    import torch
    w = np.asarray(kernel, np.float32).transpose(3, 2, 0, 1)
    return torch.from_numpy(w.copy()), torch.from_numpy(
        np.asarray(bias, np.float32).copy())


def _t_transpose(kernel, bias):
    import torch
    k = np.asarray(kernel, np.float32)[::-1, ::-1]   # unflip spatial taps
    w = k.transpose(2, 3, 0, 1)                       # (Ci, Co, kh, kw)
    return torch.from_numpy(w.copy()), torch.from_numpy(
        np.asarray(bias, np.float32).copy())


def reference_state_dict_from_params(variables: Dict[str, Any], cfg
                                     ) -> "Dict[str, Any]":
    """Flax variables tree -> reference-named torch ``state_dict``.

    ``cfg`` is our ModelConfig (`config.py`); naming mirrors
    `torch_import.params_from_reference` exactly, inverted.
    """
    import collections

    import torch

    p = variables["params"]
    bs = variables.get("batch_stats", {})
    kind = cfg.model
    sd: "collections.OrderedDict[str, torch.Tensor]" = (
        collections.OrderedDict())

    def put(key, leaf, transpose=False):
        conv = _t_transpose if transpose else _t
        sd[key + ".weight"], sd[key + ".bias"] = conv(
            leaf["kernel"], leaf["bias"])

    if kind == "SubpixelNet":
        for i in range(1, 6):
            put(f"conv{i}", p[f"conv{i}"])
        return sd
    if kind not in ("EnhanceNet", "TecoGAN"):
        raise ValueError(
            f"{kind} checkpoints have no reference-compatible layout "
            "(RCAN differs by design: rcan.py:100-110 vs our pre-shuffle "
            "expansion conv)")

    put("preblock.0", p["pre"])
    use_bn = any(k.endswith("_bn1") for k in p)
    i_conv2 = 3 if use_bn else 2
    n = 0
    while f"block{n}_conv1" in p:
        put(f"blocks.{n}.0", p[f"block{n}_conv1"])
        put(f"blocks.{n}.{i_conv2}", p[f"block{n}_conv2"])
        if use_bn:
            for j, which in ((1, "bn1"), (4, "bn2")):
                g = p[f"block{n}_{which}"]
                s = bs[f"block{n}_{which}"]
                base = f"blocks.{n}.{j}"
                sd[base + ".weight"] = torch.from_numpy(
                    np.asarray(g["scale"], np.float32).copy())
                sd[base + ".bias"] = torch.from_numpy(
                    np.asarray(g["bias"], np.float32).copy())
                sd[base + ".running_mean"] = torch.from_numpy(
                    np.asarray(s["mean"], np.float32).copy())
                sd[base + ".running_var"] = torch.from_numpy(
                    np.asarray(s["var"], np.float32).copy())
                sd[base + ".num_batches_tracked"] = torch.tensor(
                    0, dtype=torch.long)
        n += 1

    if kind == "EnhanceNet":
        put("postblock.1", p["post1"])
        put("postblock.4", p["post2"])
        put("postblock.6", p["post3"])
        put("postblock.8", p["out"])
    else:  # TecoGAN
        put("postblock.0", p["up1"], transpose=True)
        put("postblock.2", p["up2"], transpose=True)
        put("postblock.4", p["out"])
    return sd


def export_reference_pth(run_dir_or_model, out_path: str) -> str:
    """Run dir (or LoadedModel) -> reference-loadable ``.pth``.

    Saves a training-checkpoint-shaped dict whose ``model`` entry is the
    bare state dict (consumable by the reference's ``--pretrained``; the
    reference's whole-module pickle cannot be produced without the
    reference classes on sys.path, by definition) plus the saved
    ``parameters`` the reference's loadedmodel sniffs
    (`loadedmodel.py:16-68`).
    """
    import torch

    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel

    lm = (run_dir_or_model
          if isinstance(run_dir_or_model, LoadedModel)
          else LoadedModel.from_run_dir(run_dir_or_model))
    sd = reference_state_dict_from_params(lm.params, lm.cfg.model)
    meta = {
        "model": lm.cfg.model.model,
        "upscaleFactor": lm.cfg.model.upscale_factor,
        "upsample": lm.cfg.model.upsample,
        "reconType": lm.cfg.model.recon_type,
        "numResidualBlocks": lm.cfg.model.num_residual_blocks,
        "initialImage": lm.cfg.train.initial_image_mode,
        "aoInverted": lm.cfg.train.ao_inverted,
    }
    torch.save({"epoch": 0, "model": sd, "parameters": meta}, out_path)
    return out_path


def main(argv=None) -> None:
    import argparse
    ap = argparse.ArgumentParser(
        description="Export a run dir as a reference-format .pth")
    ap.add_argument("run_dir")
    ap.add_argument("output", help="output .pth path")
    args = ap.parse_args(argv)
    export_reference_pth(args.run_dir, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
