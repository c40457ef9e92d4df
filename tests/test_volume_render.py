"""Direct volume rendering: transfer function + sweep-vs-march parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.volume_render import (
    DEFAULT_TF, apply_transfer, render_volume_march, render_volume_sweep)
from isosurfacesuperresolution_tpu.volume import analytic


def test_transfer_function_nodes_and_interp():
    d = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0, 0.125, 2.0, -1.0])
    rgba = np.asarray(apply_transfer(d))
    np.testing.assert_allclose(rgba[0], [0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(rgba[1], [1, 0, 0, 0.05], atol=1e-6)
    np.testing.assert_allclose(rgba[3], [1, 1, 0, 0.15], atol=1e-6)
    np.testing.assert_allclose(rgba[5], [0.5, 0, 0, 0.025], atol=1e-6)
    np.testing.assert_allclose(rgba[6], rgba[4], atol=1e-6)   # clamp above
    np.testing.assert_allclose(rgba[7], [0, 0, 0, 0], atol=1e-6)


def _setup(n=32, wh=32):
    grid = analytic.sphere_volume(n)
    cam = CameraParams.create((0.4, 0.9, -1.6))
    cfg = RenderConfig(width=wh, height=wh, step_voxels=0.25,
                       ao_samples=0)
    return grid, cam, cfg


def test_volume_march_basics():
    grid, cam, cfg = _setup()
    img = np.asarray(render_volume_march(grid, cam, cfg))
    assert img.shape == (32, 32, 4)
    assert np.isfinite(img).all()
    a = img[..., 3]
    assert a.max() > 0.2          # volume visible
    assert a.min() >= 0.0 and a.max() <= 1.0
    # center of the image looks at the dense sphere -> more opaque than
    # the corners
    assert a[14:18, 14:18].mean() > a[:4, :4].mean() + 0.1


def test_volume_sweep_matches_march():
    grid, cam, cfg = _setup()
    sw = np.asarray(render_volume_sweep(grid, cam, cfg))
    ma = np.asarray(render_volume_march(grid, cam, cfg))
    assert sw.shape == ma.shape == (32, 32, 4)
    # compositing integrals agree to a few percent (different sample
    # lattices); compare away from the 2-px border
    d = np.abs(sw - ma)[2:-2, 2:-2]
    assert d.mean() < 0.015, d.mean()
    assert d.max() < 0.15, d.max()


def test_volume_sweep_view_angles():
    grid, _, cfg = _setup()
    for eye in ((1.8, 0.2, 0.1), (0.1, 1.8, 0.2), (-0.2, 0.3, 1.8)):
        cam = CameraParams.create(eye)
        img = np.asarray(render_volume_sweep(grid, cam, cfg))
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0.2, eye


def test_volume_alpha_scale_monotone():
    import dataclasses
    grid, cam, cfg = _setup()
    lo = np.asarray(render_volume_sweep(
        grid, cam, dataclasses.replace(cfg, volume_alpha_scale=0.5)))
    hi = np.asarray(render_volume_sweep(
        grid, cam, dataclasses.replace(cfg, volume_alpha_scale=2.0)))
    assert hi[..., 3].mean() > lo[..., 3].mean()
