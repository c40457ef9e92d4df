"""Compact volume storage (bfloat16 / uint8) parity across renderers.

Large volumes (SURVEY.md 2.1, GVDB's raison d'etre) need sub-f32 HBM
storage: 1024^3 is 4 GB at f32 but 1 GB at uint8.  These tests bound the
render-level error of quantized storage against the f32 grid on the sweep,
the Pallas march (interpret mode) and the per-ray march oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.volume import analytic
from isosurfacesuperresolution_tpu.volume.grid import BrickGrid


@pytest.fixture(scope="module")
def dense_vol():
    g = analytic.blobs_volume(48)
    return np.asarray(g.dequant(g.values))


def _cam():
    return CameraParams.create(np.array([0.8, 0.3, -0.5]), np.zeros(3),
                               np.array([0.0, 0.0, -1.0]), 45.0)


@pytest.mark.parametrize(
    "store",
    [pytest.param("bfloat16", marks=pytest.mark.slow), "uint8"])
@pytest.mark.parametrize("renderer", ["sweep", "sweep_pallas", "march"])
def test_quantized_render_parity(dense_vol, store, renderer):
    cfg = RenderConfig(width=40, height=40, isovalue=0.5, renderer=renderer,
                       ao_samples=0, step_voxels=0.5)
    g32 = BrickGrid.from_dense(dense_vol)
    gq = BrickGrid.from_dense(dense_vol, store_dtype=store)
    assert gq.values.dtype == jnp.dtype(store)
    cam = _cam()
    a = np.asarray(render_frame_gbuffer(g32, cam, cam, cfg))
    b = np.asarray(render_frame_gbuffer(gq, cam, cam, cfg))
    m_a, m_b = a[..., 3] > 0.5, b[..., 3] > 0.5
    inter = (m_a & m_b).sum()
    union = (m_a | m_b).sum()
    assert union > 50
    assert inter / union > 0.97, f"mask IoU {inter / union}"
    both = m_a & m_b
    # normals where both hit: quantization noise perturbs the gradient
    ndiff = np.abs(a[..., 4:7] - b[..., 4:7])[both]
    assert np.quantile(ndiff, 0.9) < 0.15
    ddiff = np.abs(a[..., 7] - b[..., 7])[both]
    assert np.quantile(ddiff, 0.9) < 0.01


def test_uint8_from_uchar_bytes_is_bit_exact():
    """RAW UCHAR data keeps its bytes; dequant is exactly /255."""
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, size=(16, 16, 16), dtype=np.uint8)
    g = BrickGrid.from_dense(raw, store_dtype="uint8")
    assert g.values.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(g.values), raw)
    assert g.value_scale == pytest.approx(1.0 / 255.0)
    assert g.value_offset == 0.0


def test_brick_minmax_bounds_dequantized_values(dense_vol):
    g = BrickGrid.from_dense(dense_vol, store_dtype="uint8")
    deq = np.asarray(g.dequant(g.values))
    b = g.brick_size
    bmax = np.asarray(g.brick_max)
    bmin = np.asarray(g.brick_min)
    X, Y, Z = deq.shape
    for (i, j, k) in [(0, 0, 0), (1, 2, 1), (3, 3, 3)]:
        lo = np.maximum([i * b - 1, j * b - 1, k * b - 1], 0)
        hi = np.minimum([(i + 1) * b + 1, (j + 1) * b + 1, (k + 1) * b + 1],
                        [X, Y, Z])
        blk = deq[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        assert bmax[i, j, k] >= blk.max() - 1e-6
        assert bmin[i, j, k] <= blk.min() + 1e-6


def test_cvol_roundtrip_preserves_quantization(tmp_path, dense_vol):
    from isosurfacesuperresolution_tpu.volume.importers import (
        load_cvol, save_cvol)
    g = BrickGrid.from_dense(dense_vol, store_dtype="uint8")
    p = str(tmp_path / "vol.npz")
    save_cvol(p, g)
    g2 = load_cvol(p)
    assert g2.values.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(g.values), np.asarray(g2.values))
    assert g2.value_scale == pytest.approx(g.value_scale)
    assert g2.value_offset == pytest.approx(g.value_offset)
