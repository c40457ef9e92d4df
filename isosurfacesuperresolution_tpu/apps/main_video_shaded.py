"""CLI trainer for shaded (RGB-output) video super-resolution networks.

Parity target: `mainVideo.py` - the shaded trainer: network input is the
shaded low-res rendering (RGB + mask + normal + depth), output RGB, losses
from `losses/lossnet.py` (per-name DSL: ``l1:1,perceptual:0.1,adv:0.5``,
`lossnet.py:37-111`).

Usage:
  python -m isosurfacesuperresolution_tpu.apps.main_video_shaded \
      --dataset analytic:blobs --epochs 5 --losses l1:1,temp-l2:0.1
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from isosurfacesuperresolution_tpu.apps.main_video_unshaded import (
        build_parser as base_parser)
    p = base_parser()
    p.description = "Video super-resolution trainer (shaded nets)"
    p.set_defaults(losses="l1:1,temp-l2:0.1")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from isosurfacesuperresolution_tpu.apps.main_video_unshaded import (
        load_sequences, make_config)
    cfg = make_config(args)
    # shaded channel layout
    import dataclasses
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, input_channels=8, output_channels=3,
        channel_mask=(0, 1, 2)))

    import jax
    import jax.numpy as jnp
    from tensorboardX import SummaryWriter

    from isosurfacesuperresolution_tpu.data.dataset import (
        DatasetFromSamples, VideoDataset)
    from isosurfacesuperresolution_tpu.losses.lossnet import LossNet
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network)
    from isosurfacesuperresolution_tpu.train.checkpoint import (
        CheckpointManager, next_run_dir, write_info)
    from isosurfacesuperresolution_tpu.train.trainer import (
        epoch_learning_rate, make_optimizer)
    from isosurfacesuperresolution_tpu.train.trainer_shaded import (
        create_shaded_train_state, make_shaded_train_step, shade_clip)
    from isosurfacesuperresolution_tpu.config import ShadingConfig

    t = cfg.train
    rng = np.random.RandomState(t.seed)
    sequences = load_sequences(args, cfg)
    dataset = VideoDataset(sequences, upscale_factor=cfg.model.upscale_factor)
    samples = dataset.collect_samples(t.samples, t.crop_size,
                                      t.min_fill_rate, rng,
                                      augment=t.augment)
    train_set = DatasetFromSamples(dataset, samples, t.crop_size,
                                   test=False, test_fraction=t.test_fraction)
    print(f"#sequences: {len(sequences)}, train crops: {len(train_set)}")

    shading_cfg = ShadingConfig(
        ambient_color=(0.1,) * 3, diffuse_color=(1.0,) * 3,
        specular_color=(0.0,) * 3, enable_specular=False,
        material_color=(1.0, 1.0, 1.0))

    model = create_network(cfg.model)
    criterion = LossNet(cfg.loss,
                        high_res=t.crop_size * cfg.model.upscale_factor,
                        input_channels=8, output_channels=3,
                        losses=cfg.loss.losses)
    optimizer = make_optimizer(cfg)
    state = create_shaded_train_state(cfg, model, criterion, optimizer,
                                      jax.random.PRNGKey(t.seed))
    train_step = make_shaded_train_step(cfg, model, criterion, optimizer)
    shade_jit = jax.jit(lambda lo, hi: shade_clip(lo, hi, shading_cfg))

    run_dir = next_run_dir(t.run_dir_base)
    write_info(run_dir, cfg)
    ckpt = CheckpointManager(run_dir)
    writer = SummaryWriter(os.path.join(run_dir, "tensorboard"))
    print("run dir:", run_dir)

    for epoch in range(1, t.epochs + 1):
        lr = epoch_learning_rate(cfg, epoch - 1)
        from isosurfacesuperresolution_tpu.train.trainer import (
            set_learning_rate)
        set_learning_rate(state.opt_state, lr)
        t0 = time.time()
        epoch_loss, n = 0.0, 0
        for low, flow, high in train_set.batches(t.batch_size, rng=rng):
            lo_shaded, hi_rgb = shade_jit(jnp.asarray(low),
                                          jnp.asarray(high))
            state, loss = train_step(state, lo_shaded, jnp.asarray(flow),
                                     hi_rgb)
            epoch_loss += float(loss)
            n += 1
        epoch_loss /= max(n, 1) * t.num_frames
        writer.add_scalar("train/total_loss", epoch_loss, epoch)
        print(f"===> Epoch {epoch}: loss {epoch_loss:.4f} "
              f"({time.time() - t0:.1f}s)")
        if epoch % t.checkpoint_every == 0:
            ckpt.save(epoch, state)
    writer.close()
    print("done; checkpoints in", run_dir)


if __name__ == "__main__":
    main()
