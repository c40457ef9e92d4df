"""Planar inference engine (infer/planar.py) vs the standard path.

The planar engine must reproduce the interleaved pipeline's maths exactly
in the interior (borders use resize-clamp instead of conv zero-pad and are
excluded; benchmarks crop 15 px anyway, `mainPSNR3_AllStats.py:121`)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import (
    Config, ModelConfig, ShadingConfig)
from isosurfacesuperresolution_tpu.infer.planar import (
    clamp_output_planar, initial_image_planar, planar_apply,
    planar_rgb_to_planes, screen_space_shading_planar, state_from_flat,
    state_to_flat, supports_planar, warp_planar)
from isosurfacesuperresolution_tpu.models.generators import (
    create_network, network_input_channels)
from isosurfacesuperresolution_tpu.models.videotools import (
    flatten_high, initial_image)
from isosurfacesuperresolution_tpu.ops.resize import (
    pixel_shuffle, pixel_unshuffle)
from isosurfacesuperresolution_tpu.render.shading import screen_space_shading
from isosurfacesuperresolution_tpu.train.trainer import clamp_output


CFG = ModelConfig(num_residual_blocks=2)


def _params_and_input(cfg, hw=(12, 16), seed=0):
    model = create_network(cfg)
    cin = network_input_channels(cfg)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(2, *hw, cin).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    # planar_apply reads the temporal part [5:] in NESTED channel order
    x_planar = jnp.concatenate([x[..., :5], state_from_flat(x[..., 5:])],
                               axis=-1)
    return model, params, x, x_planar


@pytest.mark.parametrize("method", ["bilinear", "nearest"])
def test_planar_apply_matches_model(method):
    cfg = dataclasses.replace(CFG, upsample=method)
    assert supports_planar(cfg)
    model, params, x, x_planar = _params_and_input(cfg)
    y_std, _ = model.apply(params, x)                 # (2, 48, 64, 6)
    y_pl = planar_apply(params, cfg, x_planar)        # (2, 12, 16, 96)
    y_pl_hi = pixel_shuffle(state_to_flat(y_pl), 4)
    d = np.abs(np.asarray(y_std) - np.asarray(y_pl_hi))
    assert d[:, 8:-8, 8:-8].max() < 2e-4, d[:, 8:-8, 8:-8].max()


def test_planar_apply_bf16_close():
    cfg = dataclasses.replace(CFG, compute_dtype="bfloat16")
    model, params, x, x_planar = _params_and_input(cfg)
    y_std, _ = model.apply(params, x)
    y_pl_hi = pixel_shuffle(
        state_to_flat(planar_apply(params, cfg, x_planar)), 4)
    d = np.abs(np.asarray(y_std) - np.asarray(y_pl_hi))
    assert d[:, 8:-8, 8:-8].max() < 0.1               # bf16 noise only


def test_clamp_output_planar_matches():
    rng = np.random.RandomState(1)
    hi = jnp.asarray((rng.rand(2, 16, 16, 6) * 3 - 1.5).astype(np.float32))
    ref = clamp_output(hi)
    got = pixel_shuffle(state_to_flat(clamp_output_planar(
        state_from_flat(pixel_unshuffle(hi, 4)))), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("specular", [False, True])
def test_shading_planar_matches(specular):
    rng = np.random.RandomState(2)
    hi = jnp.asarray((rng.rand(2, 16, 16, 6) * 2 - 1).astype(np.float32))
    cfg = ShadingConfig(enable_specular=specular, ao_strength=0.7)
    ref = screen_space_shading(hi, cfg)
    got = pixel_shuffle(state_to_flat(screen_space_shading_planar(
        state_from_flat(pixel_unshuffle(hi, 4)), cfg), channels=3), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("mode", ["zero", "unshaded", "input"])
def test_initial_image_planar_matches(mode):
    rng = np.random.RandomState(3)
    low = jnp.asarray(rng.rand(2, 8, 8, 5).astype(np.float32))
    ref = flatten_high(initial_image(low, 6, mode), 4)
    got = state_to_flat(initial_image_planar(low, 6, mode))
    atol = 1e-5 if mode != "input" else 5e-2   # border stencil vs resize
    if mode == "input":
        d = np.abs(np.asarray(ref) - np.asarray(got))
        assert d[:, 1:-1, 1:-1].max() < 1e-4
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=atol)


@pytest.mark.parametrize("special_mask", [False, True])
def test_warp_planar_matches_warp_fast(special_mask):
    from isosurfacesuperresolution_tpu.ops.warp_fast import warp_upscale_fast
    rng = np.random.RandomState(4)
    h, w = 10, 12
    prev_hi = jnp.asarray((rng.rand(2, h * 4, w * 4, 6) * 2 - 1)
                          .astype(np.float32))
    flow = jnp.asarray(((rng.rand(2, h, w, 2) - 0.5) * 2)
                       .astype(np.float32))
    ref = flatten_high(
        warp_upscale_fast(prev_hi, flow, 4, special_mask=special_mask,
                          max_disp=8), 4)
    got = state_to_flat(warp_planar(
        state_from_flat(pixel_unshuffle(prev_hi, 4)), flow,
        special_mask=special_mask, max_disp=8))
    d = np.abs(np.asarray(ref) - np.asarray(got))
    # interior: identical algorithm; flow-upsample borders differ slightly
    assert d[:, 2:-2, 2:-2].max() < 1e-4, d[:, 2:-2, 2:-2].max()


def test_warp_planar_zero_flow_identity_interior():
    rng = np.random.RandomState(5)
    prev = jnp.asarray(rng.rand(1, 8, 8, 96).astype(np.float32))
    flow = jnp.zeros((1, 8, 8, 2), jnp.float32)
    out = warp_planar(prev, flow)
    # align_corners=False grid introduces a sub-pixel global shift; just
    # check finite + same scale
    assert np.isfinite(np.asarray(out)).all()
    assert abs(float(jnp.mean(out)) - float(jnp.mean(prev))) < 0.1


def test_fused_frame_planar_matches_standard():
    """Three fused frames: the planar engine reproduces the standard
    pipeline's RGB output in the interior while carrying a planar state."""
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.infer.pipeline import (
        initial_state, make_fused_frame)
    from isosurfacesuperresolution_tpu.render.camera import CameraParams
    from isosurfacesuperresolution_tpu.volume import analytic

    cfg = Config(model=ModelConfig(num_residual_blocks=2))
    render_cfg = RenderConfig(width=32, height=32, isovalue=0.5,
                              ao_samples=0, renderer="sweep")
    model = create_network(cfg.model)
    cin = network_input_channels(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, cin), jnp.float32))
    grid = analytic.sphere_volume(32)

    frames = {}
    for mode in ("off", "on"):
        f = make_fused_frame(model, cfg, render_cfg, donate=False,
                             planar=mode)
        state = initial_state(cfg, render_cfg, planar=mode)
        outs = []
        for i in range(3):
            ang = 0.1 * i
            cam = CameraParams.create((1.7 * np.sin(ang), 0.6,
                                       -1.7 * np.cos(ang)))
            cam_prev = CameraParams.create((1.7 * np.sin(ang - 0.1), 0.6,
                                            -1.7 * np.cos(ang - 0.1)))
            rgb, _, state = f(params, grid, cam, cam_prev, state)
            rgb = np.asarray(rgb)
            if rgb.shape[0] == 3:                  # planar planes -> HWC
                rgb = np.moveaxis(rgb, 0, -1)
            outs.append(rgb)
        frames[mode] = outs

    for i in range(3):
        d = np.abs(frames["off"][i] - frames["on"][i])
        inner = d[16:-16, 16:-16]
        assert inner.max() < 5e-3, (i, inner.max())


def test_planar_rgb_to_planes_matches_pixel_shuffle():
    from isosurfacesuperresolution_tpu.infer.planar import (
        planar_rgb_to_planes)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 5, 7, 48).astype(np.float32))
    hwc = pixel_shuffle(state_to_flat(x, channels=3), 4)   # (2,20,28,3)
    planes = planar_rgb_to_planes(x)                       # (2,3,20,28)
    np.testing.assert_allclose(np.asarray(planes),
                               np.asarray(hwc).transpose(0, 3, 1, 2))


def test_planar_split_tail_matches_dense():
    """post3 as two row-phase convs (planar_tail_conv_split) must equal
    the dense planar conv bit-for-fp-bit; the channel reorder is folded
    into the out conv's kernel rows."""
    import dataclasses

    from isosurfacesuperresolution_tpu.config import ModelConfig
    from isosurfacesuperresolution_tpu.infer.planar import planar_apply
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network, network_input_channels)

    cfg = ModelConfig(num_residual_blocks=2, compute_dtype="float32")
    model = create_network(cfg)
    cin = network_input_channels(cfg)
    rng = np.random.RandomState(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cin)))
    x = jnp.asarray(rng.rand(1, 12, 12, cin).astype(np.float32))
    a = np.asarray(planar_apply(params, cfg, x))
    b = np.asarray(planar_apply(
        params, dataclasses.replace(cfg, planar_split_tail=True), x))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_planar_int8_close():
    """int8-PTQ planar path (ModelConfig.planar_int8) stays close to the
    f32 reference: per-output-channel weight scales + dynamic per-tensor
    activation scales bound the middle-of-net error; pre/out convs and the
    residual reconstruction stay full precision (infer/planar._conv_int8)."""
    model, params, x, x_planar = _params_and_input(CFG)
    y_std, _ = model.apply(params, x)
    cfg_q = dataclasses.replace(CFG, planar_int8=True)
    y_q = pixel_shuffle(
        state_to_flat(planar_apply(params, cfg_q, x_planar)), 4)
    d = np.abs(np.asarray(y_std) - np.asarray(y_q))[:, 8:-8, 8:-8]
    assert d.max() < 0.08, d.max()
    assert d.mean() < 0.01, d.mean()
    # and it must actually quantize: the jaxpr contains s8 convs
    import jax as _jax
    jaxpr = str(_jax.make_jaxpr(
        lambda p_, x_: planar_apply(p_, cfg_q, x_))(params, x_planar))
    assert "i8[" in jaxpr
    # combined with the split row-phase tail (bench.py --int8 --split)
    cfg_qs = dataclasses.replace(cfg_q, planar_split_tail=True)
    y_qs = pixel_shuffle(
        state_to_flat(planar_apply(params, cfg_qs, x_planar)), 4)
    d = np.abs(np.asarray(y_std) - np.asarray(y_qs))[:, 8:-8, 8:-8]
    assert d.max() < 0.08, d.max()


def test_planar_phase_tail_matches_dense():
    """post3 via the blocked Pallas phase kernel (interpret mode on CPU)
    must match the dense planar conv to bf16 precision; the A-major
    input perm folds into F2's kernel and the B-major output perm into
    the out conv's kernel rows."""
    import dataclasses

    from isosurfacesuperresolution_tpu.infer.planar import planar_apply

    cfg = ModelConfig(num_residual_blocks=2, compute_dtype="float32")
    assert cfg.num_features == 64
    model = create_network(cfg)
    cin = network_input_channels(cfg)
    rng = np.random.RandomState(3)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cin)))
    x = jnp.asarray(rng.rand(1, 12, 12, cin).astype(np.float32))
    a = np.asarray(planar_apply(params, cfg, x))
    b = np.asarray(planar_apply(
        params, dataclasses.replace(cfg, planar_phase_tail=True), x))
    # the phase kernel computes post3 in bf16 (its MXU dtype)
    d = np.abs(a - b)
    assert d.max() < 0.05, d.max()
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999


def test_planar_phase_tail_refuses_int8():
    """planar_phase_tail + planar_int8 must be refused loudly (the phase
    kernel has no int8 path; a silent mixed configuration would mislabel
    benchmark A/Bs - round-4 advisor finding), while phase tail alone
    must keep working (regression: the first guard tested a bool with
    `is not None` and refused the int8=False path too)."""
    from isosurfacesuperresolution_tpu.infer.planar import planar_apply

    cfg = ModelConfig(num_residual_blocks=2, compute_dtype="float32",
                      planar_phase_tail=True, planar_int8=True)
    model = create_network(cfg)
    cin = network_input_channels(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cin)))
    x = jnp.zeros((1, 12, 12, cin), jnp.float32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        planar_apply(params, cfg, x)
