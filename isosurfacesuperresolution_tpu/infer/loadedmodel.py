"""Checkpoint -> ready-to-run model bundle.

Parity target: `inference/loadedmodel.py` - the reference re-derives the
network configuration from a `.pth` checkpoint's saved parameter dict and the
first conv's ``in_channels`` (`loadedmodel.py:16-68`).  Here run directories
carry an explicit ``config.json`` (written by `train/checkpoint.write_info`),
so reconstruction is lossless; the in-channels sniffing trick is kept as a
fallback for bare params files.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import (
    Config, LossConfig, ModelConfig, RenderConfig, TrainConfig)


def config_from_json(path: str) -> Config:
    """Rebuild a Config from the flattened ``config.json`` of a run dir."""
    with open(path) as f:
        flat = json.load(f)

    def section(prefix, cls):
        kw = {}
        import dataclasses
        names = {f.name: f for f in dataclasses.fields(cls)}
        for k, v in flat.items():
            if k.startswith(prefix + "."):
                name = k[len(prefix) + 1:]
                if name in names:
                    if isinstance(v, list):
                        v = tuple(v)
                    kw[name] = v
        return cls(**kw)

    return Config(model=section("model", ModelConfig),
                  loss=section("loss", LossConfig),
                  train=section("train", TrainConfig))


class LoadedModel:
    """A generator + params restored from a run directory."""

    def __init__(self, model, params, cfg: Config,
                 bare_input: bool = False):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.unshaded = cfg.model.output_channels == 6
        self.upscale_factor = cfg.model.upscale_factor
        self.initial_image_mode = cfg.train.initial_image_mode
        self.inverse_ao = cfg.train.ao_inverted
        # True only for nets whose first conv consumes the low-res
        # channels alone (reference-imported single-frame checkpoints,
        # `loadedmodel.py:36-55`).  Framework-trained --disableTemporal
        # runs are NOT bare: the trainer concatenates the flattened
        # initial image every frame (train/trainer.py _frame_inputs), so
        # their checkpoints expect the full temporal channel count.
        self.bare_input = bare_input

    @classmethod
    def from_run_dir(cls, run_dir: str, epoch: Optional[int] = None,
                     fast: bool = False) -> "LoadedModel":
        """``fast=True`` re-instantiates the generator with
        ``fused_upsample`` (ops/fused_upsample.py): the parameter tree is
        identical, so any checkpoint loads either way.

        A ``.pth`` file path routes to the reference-checkpoint importer
        (`infer/torch_import.py`), so every harness that resolves model
        specs through here accepts the reference's released PyTorch
        checkpoints directly."""
        if run_dir.endswith(".pth") and os.path.isfile(run_dir):
            from isosurfacesuperresolution_tpu.infer.torch_import import (
                load_reference_pth)
            return load_reference_pth(run_dir, fast=fast)
        import dataclasses

        from isosurfacesuperresolution_tpu.models.generators import (
            create_network, network_input_channels)
        from isosurfacesuperresolution_tpu.train.checkpoint import (
            CheckpointManager)

        cfg = config_from_json(os.path.join(run_dir, "config.json"))
        if fast:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model,
                                               fused_upsample=True))
        model = create_network(cfg.model)
        # generator-params-only restore: inference never needs the
        # optimizer/discriminator trees, whose structure varies between
        # stage-1 and adversarial stage-2 checkpoints (a full
        # StandardRestore on a stage-2 run dir fails on that mismatch)
        cin = network_input_channels(cfg.model)
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 8, cin)))
        npz = os.path.join(run_dir, "params.npz")
        has_orbax = any(n.isdigit() for n in
                        os.listdir(os.path.join(run_dir, "checkpoints"))
                        ) if os.path.isdir(
                            os.path.join(run_dir, "checkpoints")) else False
        if not has_orbax and os.path.exists(npz):
            # git-committed artifact run dirs carry only config.json +
            # params.npz (orbax trees are too heavy to commit and the VM
            # hosting runs/ can be recycled between sessions)
            from isosurfacesuperresolution_tpu.train.checkpoint import (
                load_params_npz)
            params = load_params_npz(npz, template)
        else:
            mgr = CheckpointManager(run_dir)
            params, _ = mgr.restore_params(template, epoch)
        return cls(model, params, cfg)

    @classmethod
    def from_params_npz(cls, path: str, cfg: Config) -> "LoadedModel":
        """Bare-params restore: infer temporal input channels from the first
        conv like the reference (`loadedmodel.py:36-55`)."""
        from isosurfacesuperresolution_tpu.models.generators import (
            create_network, network_input_channels)
        from isosurfacesuperresolution_tpu.train.checkpoint import (
            load_params_npz)
        model = create_network(cfg.model)
        cin = network_input_channels(cfg.model)
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 8, cin)))
        params = load_params_npz(path, template)
        return cls(model, params, cfg)

    def inference(self, current_low: jnp.ndarray,
                  prev_high: Optional[jnp.ndarray],
                  flow: jnp.ndarray) -> jnp.ndarray:
        """One super-resolution step (parity: `loadedmodel.py:70-120`).

        current_low : (B, h, w, 5) network input channels.
        prev_high   : (B, 4h, 4w, 6) previous prediction or None (frame 0).
        flow        : (B, h, w, 2) inpainted flow w.r.t. the previous camera.
        """
        from isosurfacesuperresolution_tpu.models.videotools import (
            flatten_high, initial_image, warp_upscale)
        u = self.upscale_factor
        if self.bare_input:
            prediction, _ = self.model.apply(self.params, current_low)
            return prediction
        if self.cfg.train.disable_temporal:
            # trainer parity: disableTemporal checkpoints were trained
            # with the flattened INITIAL image concatenated every frame
            prev_high = None
        if prev_high is None:
            previous_warped = initial_image(
                current_low, self.cfg.model.output_channels,
                self.initial_image_mode, self.inverse_ao, u)
        else:
            previous_warped = warp_upscale(prev_high, flow, u,
                                           special_mask=True)
        net_in = jnp.concatenate(
            [current_low, flatten_high(previous_warped, u)], axis=-1)
        prediction, _ = self.model.apply(self.params, net_in)
        return prediction
