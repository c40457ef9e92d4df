"""Training-loop tests: recurrence correctness, loss descent, checkpoints,
adversarial steps.  All with tiny models/clips so the CPU suite stays fast."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import (
    Config, LossConfig, ModelConfig, TrainConfig)
from isosurfacesuperresolution_tpu.losses.lossnet_unshaded import (
    LossNetUnshaded)
from isosurfacesuperresolution_tpu.models.generators import create_network
from isosurfacesuperresolution_tpu.train.trainer import (
    TrainState, clamp_output, create_train_state, make_adv_train_steps,
    make_eval_step, make_optimizer, make_train_step, epoch_learning_rate)
from isosurfacesuperresolution_tpu.train.checkpoint import (
    CheckpointManager, next_run_dir, write_info, save_params_npz,
    load_params_npz)


def _tiny_config(**loss_kw):
    return Config(
        model=ModelConfig(num_residual_blocks=1, num_features=8),
        loss=LossConfig(padding=2, **loss_kw),
        train=TrainConfig(batch_size=2, crop_size=8, num_frames=3,
                          learning_rate=2e-3),
    )


def _fake_clip(rng, b=2, t=3, h=8, u=4):
    """Synthetic clip with a *learnable* structure: high = upsampled low."""
    low = rng.rand(b, t, h, h, 5).astype(np.float32)
    low[..., 0] = np.sign(low[..., 0] - 0.3)
    flow = np.zeros((b, t, h, h, 2), np.float32)
    high = np.zeros((b, t, h * u, h * u, 6), np.float32)
    for c in range(5):
        high[..., c] = np.repeat(np.repeat(low[..., c], u, axis=2), u, axis=3)
    high[..., 5] = 1.0
    return jnp.asarray(low), jnp.asarray(flow), jnp.asarray(high)


def test_clamp_output():
    x = jnp.asarray(np.array([[[[-3.0, 5.0, 0.0, 0.0, 7.0, -2.0]]]]))
    out = np.asarray(clamp_output(x))[0, 0, 0]
    assert out[0] == -1.0
    np.testing.assert_allclose(np.linalg.norm(out[1:4]), 1.0, atol=1e-5)
    assert out[4] == 1.0 and out[5] == 0.0


def test_train_step_decreases_loss():
    cfg = _tiny_config()
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, opt,
                               jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, criterion, opt)
    rng = np.random.RandomState(0)
    low, flow, high = _fake_clip(rng)
    losses = []
    for i in range(60):
        state, loss = step(state, low, flow, high)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # tiny 8-feature model starting at the bilinear identity: expect a
    # clear, steady descent (the random-clip loss floor is high)
    assert losses[-1] < losses[0] - 0.3, losses[::8]
    assert losses[-1] == min(losses) or losses[-1] < losses[30], losses[::8]


def test_eval_step_psnr():
    cfg = _tiny_config()
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, opt,
                               jax.random.PRNGKey(0))
    eval_step = make_eval_step(cfg, model, criterion)
    rng = np.random.RandomState(1)
    low, flow, high = _fake_clip(rng)
    loss, psnr = eval_step(state.params, state.aux_params, low, flow, high)
    assert np.isfinite(float(loss)) and np.isfinite(float(psnr))
    assert 0 < float(psnr) < 80


def test_disable_temporal_path():
    cfg = _tiny_config()
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "disable_temporal": True}))
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, opt,
                               jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, criterion, opt)
    rng = np.random.RandomState(2)
    low, flow, high = _fake_clip(rng)
    state, loss = step(state, low, flow, high)
    assert np.isfinite(float(loss))


def test_adversarial_steps_update_both_networks():
    cfg = _tiny_config(losses="l1:mask:1,adv:all:0.05",
                       discriminator="enhanceNetSmall")
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    gen_opt = make_optimizer(cfg)
    discr_opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, gen_opt,
                               jax.random.PRNGKey(0),
                               discr_optimizer=discr_opt)
    d_step, g_step = make_adv_train_steps(cfg, model, criterion, gen_opt,
                                          discr_opt)
    rng = np.random.RandomState(3)
    low, flow, high = _fake_clip(rng)

    d_before = jax.tree_util.tree_leaves(state.discr_params)[0].copy()
    g_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, d_loss, gt_s, pred_s = d_step(state, low, flow, high,
                                         jax.random.PRNGKey(1))
    assert np.isfinite(float(d_loss))
    d_after = jax.tree_util.tree_leaves(state.discr_params)[0]
    assert float(jnp.abs(d_after - d_before).max()) > 0

    # two generator steps: the zero-init output conv means upstream layers
    # only receive gradient once the output kernel is nonzero (step 2+)
    state, g_loss = g_step(state, low, flow, high)
    state, g_loss = g_step(state, low, flow, high)
    assert np.isfinite(float(g_loss))
    g_after = jax.tree_util.tree_leaves(state.params)[0]
    assert float(jnp.abs(g_after - g_before).max()) > 0


def test_lr_schedule():
    cfg = _tiny_config()
    lr0 = epoch_learning_rate(cfg, 0)
    assert lr0 == cfg.train.learning_rate
    lr_decayed = epoch_learning_rate(cfg, cfg.train.lr_step)
    np.testing.assert_allclose(lr_decayed, lr0 * cfg.train.lr_gamma)


def test_run_dir_numbering(tmp_path):
    base = str(tmp_path / "runs")
    d1 = next_run_dir(base)
    d2 = next_run_dir(base)
    assert d1.endswith("run00001")
    assert d2.endswith("run00002")
    cfg = _tiny_config()
    write_info(d1, cfg)
    assert os.path.exists(os.path.join(d1, "info.txt"))
    assert os.path.exists(os.path.join(d1, "config.json"))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_config()
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, opt,
                               jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, criterion, opt)
    rng = np.random.RandomState(4)
    low, flow, high = _fake_clip(rng)
    state, _ = step(state, low, flow, high)

    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save(1, state)
    assert mgr.latest_epoch() == 1

    fresh = create_train_state(cfg, model, criterion, opt,
                               jax.random.PRNGKey(99))
    restored, epoch = mgr.restore(fresh)
    assert epoch == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_params_npz_roundtrip(tmp_path):
    cfg = _tiny_config()
    model = create_network(cfg.model)
    from isosurfacesuperresolution_tpu.models.generators import (
        network_input_channels)
    x = jnp.zeros((1, 8, 8, network_input_channels(cfg.model)))
    params = model.init(jax.random.PRNGKey(0), x)
    path = str(tmp_path / "gen.npz")
    save_params_npz(path, params)
    params2 = model.init(jax.random.PRNGKey(5), x)
    loaded = load_params_npz(path, params2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_remat_train_step():
    """--remat path: jax.checkpoint on the frame body compiles and trains."""
    cfg = _tiny_config()
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "remat": True}))
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, opt,
                               jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, criterion, opt)
    rng = np.random.RandomState(7)
    low, flow, high = _fake_clip(rng)
    state, loss1 = step(state, low, flow, high)
    state, loss2 = step(state, low, flow, high)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) <= float(loss1) * 1.05


def test_training_learns_beyond_identity():
    """Regression test for the zero-init trap: on a target that the
    residual identity CANNOT express (permuted/nonlinear channels), training
    must descend well below the identity model's loss."""
    cfg = Config(
        model=ModelConfig(num_residual_blocks=2, num_features=16),
        loss=LossConfig(padding=2),
        train=TrainConfig(batch_size=4, crop_size=8, num_frames=2,
                          learning_rate=2e-3),
    )
    rng = np.random.RandomState(0)
    low = rng.rand(4, 2, 8, 8, 5).astype(np.float32)
    low[..., 0] = np.sign(low[..., 0] - 0.3)
    flow = np.zeros((4, 2, 8, 8, 2), np.float32)
    up = np.repeat(np.repeat(low, 4, axis=2), 4, axis=3)
    high = np.zeros((4, 2, 32, 32, 6), np.float32)
    high[..., 0] = up[..., 0]
    high[..., 1] = up[..., 2]           # swapped
    high[..., 2] = -up[..., 1]          # swapped + flipped
    high[..., 3] = np.abs(up[..., 3])
    high[..., 4] = up[..., 4] ** 2      # nonlinear
    high[..., 5] = 0.3 + 0.4 * up[..., 4]

    model = create_network(cfg.model)
    crit = LossNetUnshaded(cfg.loss, high_res=32)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, crit, opt, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, crit, opt)
    low, flow, high = jnp.asarray(low), jnp.asarray(flow), jnp.asarray(high)

    # identity reference: loss of the untrained (near-identity) model
    _, loss_identity = step(state, low, flow, high)
    losses = []
    for _ in range(250):
        state, loss = step(state, low, flow, high)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.55 * float(loss_identity), (
        float(loss_identity), losses[-1])


def test_trunk_variance_bounded_at_full_depth():
    """Regression test for the round-2 quality plateau: at the reference
    depth (10 unnormalized residual blocks) the trunk's activation variance
    at init must stay bounded.  With the reference's full-gain orthogonal
    init on both block convs the std grew ~180x over the trunk (0.17 -> 29),
    and early training resolved the explosion by driving the first
    post-upsample ReLU 99.95% dead - zero interior residual, zero trunk
    gradient, training frozen at the bilinear identity.  The 1/sqrt(N)
    branch-conv scaling keeps growth < e."""
    from isosurfacesuperresolution_tpu.models.generators import (
        network_input_channels)
    cfg = ModelConfig(num_residual_blocks=10, num_features=64)
    model = create_network(cfg)
    cin = network_input_channels(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, cin)) * 0.3
    params = model.init(jax.random.PRNGKey(0), x)
    _, state = model.apply(params, x, capture_intermediates=True,
                           mutable=["intermediates"])
    inter = state["intermediates"]
    pre_std = float(jnp.std(inter["pre"]["__call__"][0]))
    stds = {k: float(jnp.std(v["__call__"][0]))
            for k, v in inter.items() if k.startswith("block")}
    worst = max(stds.values())
    assert worst < 6.0 * pre_std, (pre_std, stds)
    # and the post-upsample gates are alive
    for gate in ("post1", "post2", "post3"):
        frac = float(jnp.mean(inter[gate]["__call__"][0] > 0))
        assert frac > 0.05, (gate, frac)


@pytest.mark.slow
def test_training_learns_beyond_identity_at_full_depth():
    """The escape-the-bilinear-fixed-point test at the REAL trunk depth
    (10 blocks): a high-frequency detail target that upsampling cannot
    express must be learnable.  The 2-block variant above stayed green
    while the 10-block production config was frozen - depth is the
    variable that triggers the explosion."""
    cfg = Config(
        model=ModelConfig(num_residual_blocks=10, num_features=32),
        loss=LossConfig(padding=2,
                        losses="l1:mask:1,l1:normal:10,l1:depth:10,l1:ao:1"),
        train=TrainConfig(batch_size=4, crop_size=8, num_frames=1,
                          learning_rate=2e-3, grad_clip=1.0),
    )
    rng = np.random.RandomState(0)
    low = rng.rand(4, 1, 8, 8, 5).astype(np.float32)
    low[..., 0] = 1.0                  # fully inside the mask
    flow = np.zeros((4, 1, 8, 8, 2), np.float32)
    up = np.repeat(np.repeat(low, 4, axis=2), 4, axis=3)
    high = np.zeros((4, 1, 32, 32, 6), np.float32)
    high[..., 0] = 1.0
    # high-frequency checkerboard detail on normal/depth that no
    # upsample-of-low can express
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    checker = ((xx + yy) % 2).astype(np.float32) * 0.2
    high[..., 1] = up[..., 1] + checker
    high[..., 2] = up[..., 2] - checker
    high[..., 3] = up[..., 3]
    high[..., 4] = np.clip(up[..., 4] + 0.5 * checker, 0, 1)
    high[..., 5] = 1.0

    model = create_network(cfg.model)
    crit = LossNetUnshaded(cfg.loss, high_res=32)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, crit, opt, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, crit, opt)
    low, flow, high = jnp.asarray(low), jnp.asarray(flow), jnp.asarray(high)

    _, loss_first = step(state, low, flow, high)
    losses = []
    for _ in range(300):
        state, loss = step(state, low, flow, high)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # the identity/bilinear point cannot remove the checkerboard; training
    # must cut the loss well below wherever it started AND keep moving
    # (the frozen-trunk failure mode plateaus to 4 decimals)
    assert losses[-1] < 0.5 * float(loss_first), (float(loss_first),
                                                  losses[-1])
    assert np.mean(losses[-50:]) < 0.9 * np.mean(losses[:50]), (
        np.mean(losses[:50]), np.mean(losses[-50:]))


def test_predict_clip_matches_naive_rollout():
    """make_predict_clip's lax.scan rollout must equal a per-frame Python
    replay of the same recurrence (shape (B, T, H*u, W*u, Cout), clamped)."""
    from isosurfacesuperresolution_tpu.train.trainer import (
        _frame_inputs, make_predict_clip)

    cfg = _tiny_config()
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, opt,
                               jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    low, flow, high = _fake_clip(rng)
    b, t, h = low.shape[:3]
    u = cfg.model.upscale_factor

    predict = make_predict_clip(cfg, model)
    out = predict(state.params, low, flow)
    assert out.shape == (b, t, h * u, h * u, 6)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert out[..., 0].min() >= -1.0 and out[..., 0].max() <= 1.0
    assert out[..., 4:].min() >= 0.0 and out[..., 4:].max() <= 1.0

    prev, prev_low = None, None
    for i in range(t):
        net_in, _, _, _ = _frame_inputs(low[:, i], flow[:, i], prev,
                                        prev_low, None, low[:, 0], cfg,
                                        i == 0)
        pred, _ = model.apply(state.params, net_in)
        prev = clamp_output(pred)
        prev_low = low[:, i]
        np.testing.assert_allclose(out[:, i], np.asarray(prev),
                                   rtol=2e-5, atol=2e-5)


def test_restore_params_only(tmp_path):
    """`restore_params` must load the generator subtree from any run's
    checkpoint - including adversarial (stage-2) checkpoints whose
    optimizer/discriminator trees differ from a fresh template (the eval
    harness loads every run dir through this path)."""
    from isosurfacesuperresolution_tpu.models.generators import (
        network_input_channels)

    cfg = _tiny_config()
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, opt,
                               jax.random.PRNGKey(3))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(1, state)
    mgr.manager.wait_until_finished()

    cin = network_input_channels(cfg.model)
    template = model.init(jax.random.PRNGKey(9),
                          jnp.zeros((1, 8, 8, cin)))
    # fresh manager: the eval harness opens run dirs cold, and a manager
    # that just saved with StandardSave pins that handler for the item
    params, epoch = CheckpointManager(str(tmp_path)).restore_params(
        template, None)
    assert epoch == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_adversarial_steps_with_sn_and_wgan_gp():
    """--useSN + --ganType wgan-gp end-to-end: spectrally normalized
    generator AND discriminators train under the WGAN-GP objective
    (reference --useSN / wgan-gp losses, lossbuilder.py:266-304)."""
    cfg = Config(
        model=ModelConfig(num_residual_blocks=1, num_features=8,
                          use_sn=True),
        loss=LossConfig(padding=2, losses="l1:mask:1,adv:all:0.05",
                        discriminator="enhanceNetSmall",
                        gan_type="wgan-gp"),
        train=TrainConfig(batch_size=2, crop_size=8, num_frames=3,
                          learning_rate=2e-3),
    )
    model = create_network(cfg.model)
    criterion = LossNetUnshaded(cfg.loss, high_res=cfg.train.crop_size * 4,
                                use_spectral_norm=True)
    gen_opt = make_optimizer(cfg)
    discr_opt = make_optimizer(cfg)
    state = create_train_state(cfg, model, criterion, gen_opt,
                               jax.random.PRNGKey(0),
                               discr_optimizer=discr_opt)
    d_step, g_step = make_adv_train_steps(cfg, model, criterion, gen_opt,
                                          discr_opt)
    rng = np.random.RandomState(3)
    low, flow, high = _fake_clip(rng)

    d_before = jax.tree_util.tree_leaves(state.discr_params)[0].copy()
    state, d_loss, _, _ = d_step(state, low, flow, high,
                                 jax.random.PRNGKey(1))
    assert np.isfinite(float(d_loss))
    assert float(jnp.abs(jax.tree_util.tree_leaves(state.discr_params)[0]
                         - d_before).max()) > 0
    state, g_loss = g_step(state, low, flow, high)
    state, g_loss = g_step(state, low, flow, high)
    assert np.isfinite(float(g_loss))
