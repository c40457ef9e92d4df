"""Volume-sharded sweep (slab decomposition + halo exchange) vs the
single-device sweep, on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.parallel.mesh import make_mesh
from isosurfacesuperresolution_tpu.parallel.sharded_sweep import (
    major_axis, render_gbuffer_sweep_sharded)
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.volume import analytic


def _mesh(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:n]), ("z",))


@pytest.mark.parametrize("eye", [(0.3, 0.8, -1.7), (1.8, 0.2, 0.3),
                                 (-0.1, -1.8, 0.4)])
def test_sharded_matches_single_device(eye):
    mesh = _mesh()
    grid = analytic.blobs_volume(64, num_blobs=5)
    cam = CameraParams.create(eye)
    cfg = RenderConfig(width=40, height=32, isovalue=0.5, ao_samples=0)

    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfg))
    got = np.asarray(render_gbuffer_sweep_sharded(grid, cam, cam, cfg,
                                                  mesh))
    assert got.shape == ref.shape == (32, 40, 12)
    # masks agree except at silhouette jitter
    assert np.mean(ref[..., 3] != got[..., 3]) < 0.01
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    for ch, tol in ((7, 1e-3), (4, 5e-3), (5, 5e-3), (6, 5e-3)):
        d = np.abs(ref[..., ch] - got[..., ch])[both]
        assert d.max() < tol, (ch, d.max())


def test_sharded_sweep_depth_divides_work():
    """Structural check: each device's scan covers K/D slice planes."""
    mesh = _mesh()
    grid = analytic.sphere_volume(64)
    cam = CameraParams.create((0.0, 0.9, -1.7))
    assert major_axis(cam) == 2
    cfg = RenderConfig(width=16, height=16, isovalue=0.5, ao_samples=0)
    out = np.asarray(render_gbuffer_sweep_sharded(grid, cam, cam, cfg,
                                                  mesh))
    assert np.isfinite(out).all()
    assert out[..., 3].max() == 1.0       # sphere visible


def test_stretch_config5_8x_sr_multicamera_sharded():
    """BASELINE config 5 (stretch): batched multi-camera rendering sharded
    over the mesh feeding an 8x SR EnhanceNet."""
    import jax.numpy as jnp
    from isosurfacesuperresolution_tpu.config import (
        Config, ModelConfig, RenderConfig)
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network, network_input_channels)
    from isosurfacesuperresolution_tpu.models.videotools import (
        flatten_high, initial_image)
    from isosurfacesuperresolution_tpu.parallel.mesh import (
        make_mesh, render_cameras_sharded)
    from isosurfacesuperresolution_tpu.render.raycast import (
        gbuffer_to_low_input)

    mesh = make_mesh(8)
    grid = analytic.sphere_volume(32)
    n_cam = 8
    angs = np.linspace(0, 2 * np.pi, n_cam, endpoint=False)
    eyes = jnp.asarray(np.stack([1.7 * np.sin(angs),
                                 np.full(n_cam, 0.7),
                                 -1.7 * np.cos(angs)], -1), jnp.float32)
    looks = jnp.zeros((n_cam, 3), jnp.float32)
    ups = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n_cam, 1))
    rcfg = RenderConfig(width=16, height=16, isovalue=0.5, ao_samples=0)
    frames = render_cameras_sharded(grid, eyes, looks, ups, rcfg, mesh)
    assert frames.shape == (n_cam, 16, 16, 12)
    assert np.isfinite(np.asarray(frames)).all()

    cfg = ModelConfig(num_residual_blocks=1, num_features=8,
                      upscale_factor=8)
    net = create_network(cfg)
    cin = network_input_channels(cfg)
    low = jax.vmap(gbuffer_to_low_input)(frames)          # (8,16,16,5)
    prev = initial_image(low, 6, "unshaded", False, 8)    # (8,128,128,6)
    net_in = jnp.concatenate([low, flatten_high(prev, 8)], axis=-1)
    assert net_in.shape[-1] == cin
    params = net.init(jax.random.PRNGKey(0), net_in[:1])
    out, _ = net.apply(params, net_in)
    assert out.shape == (n_cam, 128, 128, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_non_divisible_axis():
    """Axis length 60 on an 8-mesh: slabs are zero-padded, result matches
    the single-device sweep (the Z % D restriction is gone)."""
    mesh = _mesh()
    grid = analytic.blobs_volume(60, num_blobs=5)
    cam = CameraParams.create((0.3, 0.8, -1.7))
    cfg = RenderConfig(width=32, height=32, isovalue=0.5, ao_samples=0)
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfg))
    got = np.asarray(render_gbuffer_sweep_sharded(grid, cam, cam, cfg,
                                                  mesh))
    assert np.mean(ref[..., 3] != got[..., 3]) < 0.01
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    assert np.abs(ref[..., 7] - got[..., 7])[both].max() < 1e-3


def test_sharded_baked_ao_matches_single_device():
    """Baked-AO sharding: cfg.ao_samples > 0 + SH field sharded in slabs."""
    from isosurfacesuperresolution_tpu.render.ao_sweep import attach_baked_ao
    mesh = _mesh()
    grid = analytic.blobs_volume(64, num_blobs=5)
    grid = attach_baked_ao(grid, 0.5, 0.1)
    cam = CameraParams.create((0.3, 0.8, -1.7))
    cfg = RenderConfig(width=32, height=32, isovalue=0.5, ao_samples=64,
                       ao_mode="volume")
    ref = np.asarray(render_gbuffer_sweep(grid, cam, cam, cfg))
    got = np.asarray(render_gbuffer_sweep_sharded(grid, cam, cam, cfg,
                                                  mesh))
    both = (ref[..., 3] > 0.5) & (got[..., 3] > 0.5)
    assert both.sum() > 50
    d_ao = np.abs(ref[..., 10] - got[..., 10])[both]
    assert np.quantile(d_ao, 0.95) < 0.02, d_ao.max()


def test_sharded_combine_has_no_all_gather(monkeypatch):
    """Per-device memory must not scale with D: the first-hit combine is
    pmin/psum (all-reduce), never an all_gather that would materialize a
    (D, ...) buffer on every device."""
    def no_gather(*a, **k):
        raise AssertionError("all_gather used in sharded sweep combine")

    monkeypatch.setattr(jax.lax, "all_gather", no_gather)
    mesh = _mesh()
    grid = analytic.sphere_volume(64)
    cam = CameraParams.create((0.0, 0.9, -1.7))
    cfg = RenderConfig(width=16, height=16, isovalue=0.5, ao_samples=0)
    out = np.asarray(render_gbuffer_sweep_sharded(grid, cam, cam, cfg,
                                                  mesh))
    assert out[..., 3].max() == 1.0
