"""End-to-end acceptance: renderer-in-the-loop data -> training -> quality.

This is SURVEY.md section 7's "minimum slice" gate: analytic volume -> jnp
raycaster -> EnhanceNet -> shading -> masked losses, all inside jit train
steps, with a PSNR-vs-its-own-start sanity check (the full PSNR-vs-bilinear
acceptance runs in the benchmark suite on real hardware, where training is
long enough to win)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import (
    Config, LossConfig, ModelConfig, RenderConfig, TrainConfig)
from isosurfacesuperresolution_tpu.data.dataset import (
    DatasetFromSamples, VideoDataset)
from isosurfacesuperresolution_tpu.data.generation import (
    SequenceConfig, generate_sequences)
from isosurfacesuperresolution_tpu.losses.lossnet_unshaded import (
    LossNetUnshaded)
from isosurfacesuperresolution_tpu.models.generators import create_network
from isosurfacesuperresolution_tpu.train.trainer import (
    create_train_state, make_eval_step, make_optimizer, make_train_step)
from isosurfacesuperresolution_tpu.volume import analytic


@pytest.mark.slow
def test_minimum_slice_renderer_to_training():
    cfg = Config(
        model=ModelConfig(num_residual_blocks=2, num_features=16),
        loss=LossConfig(padding=4),
        train=TrainConfig(batch_size=4, crop_size=12, num_frames=3,
                          learning_rate=5e-4, min_fill_rate=0.25),
    )
    grid = analytic.blobs_volume(64, num_blobs=6)
    seq_cfg = SequenceConfig(num_frames=3, high_res=96, ao_samples=8,
                             ao_radius=0.15, distance_range=(0.7, 0.9))
    base = RenderConfig(isovalue=0.5, step_voxels=0.5)
    sequences = generate_sequences([(grid, (0.5, 0.5))], 3, seq_cfg,
                                   base_render_cfg=base, seed=0)

    ds = VideoDataset(sequences)
    rng = np.random.RandomState(0)
    samples = ds.collect_samples(12, cfg.train.crop_size,
                                 cfg.train.min_fill_rate, rng)
    train_set = DatasetFromSamples(ds, samples, cfg.train.crop_size,
                                   test=False, test_fraction=0.25)
    test_set = DatasetFromSamples(ds, samples, cfg.train.crop_size,
                                  test=True, test_fraction=0.25)
    assert len(train_set) >= 8 and len(test_set) >= 2

    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    optimizer = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, optimizer,
                               jax.random.PRNGKey(0))
    train_step = make_train_step(cfg, model, criterion, optimizer)
    eval_step = make_eval_step(cfg, model, criterion)

    def test_psnr(state):
        total, n = 0.0, 0
        for low, flow, high in test_set.batches(2, shuffle=False,
                                                drop_last=False):
            _, p = eval_step(state.params, state.aux_params, low, flow, high)
            total += float(p)
            n += 1
        return total / n

    psnr_start = test_psnr(state)
    epoch_losses = []
    for epoch in range(6):
        acc, n = 0.0, 0
        for low, flow, high in train_set.batches(cfg.train.batch_size,
                                                 rng=rng):
            state, loss = train_step(state, low, flow, high)
            acc += float(loss)
            n += 1
        epoch_losses.append(acc / n)
    psnr_end = test_psnr(state)

    assert np.isfinite(epoch_losses).all()
    assert epoch_losses[-1] < epoch_losses[0] * 1.02, epoch_losses
    # O(1)-init output conv (reference parity): the net STARTS noisy (the
    # residual reconstruction centers it at bilinear + conv noise) and a
    # short training run must pull it into the bilinear quality class -
    # the healthy-gradient counterpart of the zero/small-variance init
    # traps documented in models/generators.py
    assert psnr_end > 20.0, psnr_end
    assert psnr_end > psnr_start + 1.0, (psnr_start, psnr_end)
