"""Discriminator probe: print logits for input / ground truth / prediction.

Parity target: `mainDiscrTest.py:37-105` - loads an adversarially trained
run, builds the discriminator stack, and prints the per-sample logits for
upsampled input, ground truth, and the generator's prediction - a sanity
probe that the discriminator orders them correctly.

Usage:
  python -m isosurfacesuperresolution_tpu.apps.discr_test runs/run00001 \
      --volume analytic:blobs
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--volume", type=str, default="analytic:blobs")
    p.add_argument("--crops", type=int, default=4)
    p.add_argument("--isovalue", type=float, default=0.5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.data.dataset import VideoDataset
    from isosurfacesuperresolution_tpu.data.generation import (
        SequenceConfig, generate_sequences)
    from isosurfacesuperresolution_tpu.infer.loadedmodel import (
        LoadedModel, config_from_json)
    from isosurfacesuperresolution_tpu.losses.lossnet_unshaded import (
        LossNetUnshaded)
    from isosurfacesuperresolution_tpu.ops.resize import resize
    from isosurfacesuperresolution_tpu.train.checkpoint import (
        CheckpointManager)
    from isosurfacesuperresolution_tpu.train.trainer import (
        clamp_output, create_train_state, make_optimizer)
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network)
    import os

    cfg = config_from_json(os.path.join(args.run_dir, "config.json"))
    criterion = LossNetUnshaded(
        cfg.loss, high_res=cfg.train.crop_size * cfg.model.upscale_factor)
    if not criterion.has_discriminator:
        raise SystemExit("run was not trained adversarially "
                         "(no adv/tgan/sgan in its loss DSL)")
    model = create_network(cfg.model)
    optimizer = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, optimizer,
                               jax.random.PRNGKey(0),
                               discr_optimizer=optimizer)
    state, epoch = CheckpointManager(args.run_dir).restore(state)
    lm = LoadedModel(model, state.params, cfg)
    aux = dict(state.aux_params)
    aux["discr"] = state.discr_params
    print(f"restored epoch {epoch}")

    grid, _ = load_volume(args.volume)
    seq_cfg = SequenceConfig(
        num_frames=2, ao_samples=16,
        high_res=cfg.train.crop_size * cfg.model.upscale_factor * 2)
    base = RenderConfig(isovalue=args.isovalue)
    seqs = generate_sequences([(grid, (args.isovalue, args.isovalue))], 1,
                              seq_cfg, base_render_cfg=base, seed=0)
    ds = VideoDataset(seqs)
    samples = ds.collect_samples(args.crops, cfg.train.crop_size, 0.2,
                                 np.random.RandomState(0))

    for si, s in enumerate(samples):
        low, flow, high = ds.get_clip(s, cfg.train.crop_size)
        low_t = jnp.asarray(low[1:2])
        gt = jnp.asarray(high[1:2])
        pred = clamp_output(lm.inference(low_t, jnp.asarray(high[0:1]),
                                         jnp.asarray(flow[1:2])))
        input_high = resize(low_t, scale=4.0, method=cfg.model.upsample)
        prev_in = input_high
        for name, tensor in [("gt", gt), ("pred", pred)]:
            x = jnp.concatenate(
                [criterion._pad(input_high), criterion._pad(prev_in),
                 criterion._pad(criterion._colorize(tensor)),
                 criterion._pad(criterion._colorize(tensor))], axis=-1)
            if criterion.has_adv:
                logit = criterion.discriminators["adv"].apply(
                    {"params": aux["discr"]["adv"]["params"]}, x)
                print(f"crop {si} {name}: adv logit ="
                      f" {float(logit[0, 0]):+.4f}")


if __name__ == "__main__":
    main()
