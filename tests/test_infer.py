"""Fused-inference tests: pipeline shapes, temporal state, comparison modes,
multi-chip sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import (
    Config, ModelConfig, RenderConfig)
from isosurfacesuperresolution_tpu.infer.pipeline import (
    FrameState, InferencePipeline, initial_state, make_fused_frame)
from isosurfacesuperresolution_tpu.models.generators import (
    create_network, network_input_channels)
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.volume import analytic


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model=ModelConfig(num_residual_blocks=1, num_features=8))
    render_cfg = RenderConfig(width=16, height=16, isovalue=0.5,
                              step_voxels=0.5, ao_samples=0)
    model = create_network(cfg.model)
    cin = network_input_channels(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cin)))
    grid = analytic.sphere_volume(32)
    return cfg, render_cfg, model, params, grid


def test_fused_frame_shapes(setup):
    cfg, render_cfg, model, params, grid = setup
    fused = make_fused_frame(model, cfg, render_cfg, donate=False)
    cam = CameraParams.create((0, 1, -1.7))
    state = initial_state(cfg, render_cfg)
    rgb, fr, new_state = fused(params, grid, cam, cam, state)
    # planar engine emits channel-first planes (see infer/planar.py)
    assert rgb.shape in ((64, 64, 3), (3, 64, 64))
    assert fr.shape == (16, 16, 12)
    # planar state: (1, h, w, 96); standard: (1, 4h, 4w, 6)
    assert new_state.prev_high.shape in ((1, 64, 64, 6), (1, 16, 16, 96))
    assert bool(new_state.has_prev)
    assert np.isfinite(np.asarray(rgb)).all()
    assert 0 <= float(rgb.min()) and float(rgb.max()) <= 1


def test_pipeline_temporal_state(setup):
    cfg, render_cfg, model, params, grid = setup
    pipe = InferencePipeline(model=model, params=params, cfg=cfg,
                             render_cfg=render_cfg)
    cam0 = CameraParams.create((0, 1, -1.7))
    cam1 = CameraParams.create((0.1, 1, -1.7))
    r0 = np.asarray(pipe.frame(grid, cam0))
    r1 = np.asarray(pipe.frame(grid, cam1))
    assert r0.shape == r1.shape == (64, 64, 3)
    assert pipe._last_cam is cam1
    pipe.reset()
    assert pipe._last_cam is None


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
def test_comparison_modes(setup, mode):
    cfg, render_cfg, model, params, grid = setup
    pipe = InferencePipeline(model=model, params=params, cfg=cfg,
                             render_cfg=render_cfg, upscale_mode=mode)
    cam = CameraParams.create((0, 1, -1.7))
    rgb = np.asarray(pipe.frame(grid, cam))
    assert rgb.shape == (64, 64, 3)
    assert np.isfinite(rgb).all()


def test_multichip_dryrun_entrypoints():
    """The driver contract: entry() compiles, dryrun_multichip(8) runs."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = fn(*args)
    assert out.shape in ((256, 256, 3), (3, 256, 256))
    __graft_entry__.dryrun_multichip(len(jax.devices()))


def test_sharded_camera_rendering():
    from isosurfacesuperresolution_tpu.parallel.mesh import (
        make_mesh, render_cameras_sharded)
    grid = analytic.sphere_volume(32)
    mesh = make_mesh()
    n = len(jax.devices())
    rng = np.random.RandomState(0)
    eyes = np.stack([[0, 1, -1.7]] * n).astype(np.float32)
    eyes += 0.05 * rng.randn(n, 3).astype(np.float32)
    look = np.zeros((n, 3), np.float32)
    ups = np.stack([[0, 1, 0]] * n).astype(np.float32)
    cfg = RenderConfig(width=16, height=16, isovalue=0.5, step_voxels=0.5,
                       ao_samples=0)
    frames = render_cameras_sharded(grid, jnp.asarray(eyes),
                                    jnp.asarray(look), jnp.asarray(ups),
                                    cfg, mesh)
    assert frames.shape == (n, 16, 16, 12)
    assert np.asarray(frames[..., 3]).max() == 1.0


def test_pipeline_set_render_params_no_recompile(setup):
    """InferencePipeline.set_render_params changes isovalue per frame with
    ONE compilation of the fused frame (GUI slider / pipe setParameter)."""
    cfg, render_cfg, model, params, grid = setup
    from isosurfacesuperresolution_tpu.infer.pipeline import (
        InferencePipeline)
    pipe = InferencePipeline(model=model, params=params, cfg=cfg,
                             render_cfg=render_cfg)
    cam = CameraParams.create((0.0, 0.9, -1.7))
    a = np.asarray(pipe.frame(grid, cam))
    n0 = pipe._frame._cache_size()
    pipe.set_render_params(isovalue=0.3)
    b = np.asarray(pipe.frame(grid, cam))
    pipe.set_render_params(isovalue=0.7)
    c = np.asarray(pipe.frame(grid, cam))
    assert pipe._frame._cache_size() == n0, "fused frame recompiled"
    assert np.abs(a - b).max() > 1e-3 or np.abs(b - c).max() > 1e-3


def test_loadedmodel_disable_temporal_framework_checkpoint():
    """Framework-trained --disableTemporal checkpoints still expect the
    flattened initial image concatenated (the trainer builds net_in that
    way for every frame); LoadedModel.inference must feed the same
    channel count instead of the bare low-res input.

    Regression: an early-return applied the model to current_low alone,
    crashing on every framework-trained disableTemporal run."""
    import dataclasses

    from isosurfacesuperresolution_tpu.config import Config
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network, network_input_channels)

    cfg = Config(model=ModelConfig(num_residual_blocks=2, num_features=8))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, disable_temporal=True))
    model = create_network(cfg.model)
    cin = network_input_channels(cfg.model)     # temporal channel count
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cin)))
    lm = LoadedModel(model, params, cfg)

    low = jnp.zeros((1, 8, 8, 5))
    flow = jnp.zeros((1, 8, 8, 2))
    out = lm.inference(low, None, flow)
    assert out.shape == (1, 32, 32, 6)
    # a stale prev_high must be ignored (trainer treats every frame as
    # frame 0 when temporal is disabled), not crash or change shape
    prev = jnp.ones((1, 32, 32, 6))
    out2 = lm.inference(low, prev, flow)
    assert out2.shape == (1, 32, 32, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))

    # reference-imported single-frame nets consume the bare input
    cin_bare = network_input_channels(cfg.model, temporal=False)
    params_b = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, 8, cin_bare)))
    lm_b = LoadedModel(model, params_b, cfg, bare_input=True)
    out_b = lm_b.inference(low, None, flow)
    assert out_b.shape == (1, 32, 32, 6)
