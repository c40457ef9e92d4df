"""Sparse packed-tile storage (volume/packed.py) + atlas-indirect tiled
march (`march_pallas_packed`) vs the dense tiled kernel, interpret mode.

GVDB-atlas parity: the reference stores only occupied leaf bricks in a
texture atlas (`Vdb2Vbx.cpp:70-324`); here the unit is a (TX, TY) slice
tile and the indirection is resolved outside the kernel (SMEM slot rows).
"""

import dataclasses

import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.volume import analytic
from isosurfacesuperresolution_tpu.volume.grid import BrickGrid
from isosurfacesuperresolution_tpu.volume.packed import (
    SparseBrickGrid, pack_axis)


def _sparse_dense(n=64, r=9):
    """Zero background with two off-center solid balls (values in (0,1])."""
    rng = np.random.default_rng(7)
    vol = np.zeros((n, n, n), np.float32)
    for c in ((0.3, 0.4, 0.55), (0.7, 0.6, 0.35)):
        idx = np.indices((n, n, n)).astype(np.float32)
        d2 = sum((idx[i] - c[i] * n) ** 2 for i in range(3))
        ball = np.maximum(0.0, 1.0 - d2 / r**2)
        vol = np.maximum(vol, ball.astype(np.float32))
    vol *= 0.5 + 0.5 * rng.random((n, n, n), dtype=np.float32)
    return vol


def test_pack_axis_roundtrip():
    vol = _sparse_dense(48)
    vzxy = np.ascontiguousarray(np.transpose(vol, (2, 0, 1)))
    pa = pack_axis(vzxy, tile=16)
    assert pa.tile_shape == (16, 16)
    assert np.asarray(pa.atlas[0]).max() == 0.0          # background slot
    np.testing.assert_array_equal(pa.to_dense_zxy(), vzxy)
    np.testing.assert_allclose(np.asarray(pa.slice_max),
                               vzxy.max(axis=(1, 2)))
    # atlas holds only occupied tiles
    occ_frac = (np.asarray(pa.slots) > 0).mean()
    assert pa.atlas.shape[0] - 1 == (np.asarray(pa.slots) > 0).sum()
    assert occ_frac < 0.5


def test_sparse_grid_roundtrip_and_storage():
    vol = _sparse_dense(64)
    sg = SparseBrickGrid.from_dense(vol, tile=16)
    back = sg.to_brick_grid()
    np.testing.assert_array_equal(np.asarray(back.values), vol)
    # storage actually shrinks (3 axes of atlases + slot tables < dense)
    assert sg.storage_bytes() < 0.5 * sg.dense_bytes()


@pytest.mark.parametrize("eye", [(0.2, 0.7, -1.6), (1.7, 0.3, 0.2)])
def test_packed_march_matches_dense_tiled(eye):
    vol = _sparse_dense(48)
    dense = BrickGrid.from_dense(vol)
    sparse = SparseBrickGrid.from_brick_grid(dense, tile=16)
    cam = CameraParams.create(eye)
    cfg = RenderConfig(width=32, height=24, isovalue=0.45, ao_samples=0,
                       sweep_dtype="float32", renderer="sweep_pallas",
                       sweep_tile=16)
    ref = np.asarray(render_gbuffer_sweep(dense, cam, cam, cfg))
    got = np.asarray(render_gbuffer_sweep(sparse, cam, cam, cfg))
    assert np.isfinite(got).all()
    # same kernel body over identical tile contents: bit-level agreement
    # up to fp reassociation in the unoccupied-tile skip
    np.testing.assert_array_equal(ref[..., 3], got[..., 3])
    both = ref[..., 3] > 0.5
    assert both.sum() >= 20
    np.testing.assert_allclose(got[both], ref[both], atol=1e-5)


def test_packed_uint8_storage():
    vol = _sparse_dense(48)
    gq = BrickGrid.from_dense(vol, store_dtype="uint8")
    sparse = SparseBrickGrid.from_brick_grid(gq, tile=16)
    assert sparse.per_axis[0].atlas.dtype == np.uint8
    cam = CameraParams.create((0.2, 0.7, -1.6))
    cfg = RenderConfig(width=32, height=24, isovalue=0.45, ao_samples=0,
                       renderer="sweep_pallas", sweep_tile=16)
    ref = np.asarray(render_gbuffer_sweep(gq, cam, cam, cfg))
    got = np.asarray(render_gbuffer_sweep(sparse, cam, cam, cfg))
    np.testing.assert_array_equal(ref[..., 3], got[..., 3])
    both = ref[..., 3] > 0.5
    assert both.sum() >= 20
    np.testing.assert_allclose(got[both], ref[both], atol=1e-5)


def test_pack_tolerance_threshold():
    """Reference threshold-to-sparse (`ExternalImporter.cpp:181`): tiles
    entirely within tolerance of background drop to exact background."""
    vol = _sparse_dense(48) + 5e-4          # smooth sub-tolerance floor
    vzxy = np.ascontiguousarray(np.transpose(vol, (2, 0, 1)))
    exact = pack_axis(vzxy, tile=16)
    tol = pack_axis(vzxy, tile=16, tolerance=1e-3)
    assert tol.atlas.shape[0] < exact.atlas.shape[0]
    back = tol.to_dense_zxy()
    np.testing.assert_array_less(np.abs(back - vzxy), 1e-3 + 1e-7)


def test_packed_requires_tiled_renderer():
    sg = SparseBrickGrid.from_dense(_sparse_dense(48), tile=16)
    cam = CameraParams.create((0.2, 0.7, -1.6))
    with pytest.raises(ValueError, match="sweep_pallas"):
        render_gbuffer_sweep(sg, cam, cam,
                             RenderConfig(width=16, height=16,
                                          renderer="sweep", ao_samples=0))
    with pytest.raises(ValueError, match="dense"):
        render_gbuffer_sweep(sg, cam, cam,
                             RenderConfig(width=16, height=16,
                                          renderer="sweep_pallas",
                                          sweep_tile=16, ao_samples=4))


def test_pack_ao_axis_roundtrip():
    """AO atlas packs only the non-zero occlusion shell and reconstructs
    it within the packing tolerance."""
    from isosurfacesuperresolution_tpu.render.ao_sweep import (
        bake_occlusion_sh)
    from isosurfacesuperresolution_tpu.volume.packed import pack_ao_axis
    vol = _sparse_dense(48)
    sh = np.asarray(bake_occlusion_sh(vol, 0.45, 4.0))   # (X, Y, Z, 4)
    ao_zcxy = np.ascontiguousarray(np.transpose(sh, (2, 3, 0, 1)))
    pa = pack_ao_axis(ao_zcxy, tile=16, tolerance=1e-3)
    assert pa.tile_shape == (16, 16)
    assert (np.asarray(pa.slots) > 0).mean() < 0.9       # something culled
    back = pa.to_dense_zcxy()
    assert np.abs(back - ao_zcxy).max() <= 1e-3 + 1e-7


def test_packed_ao_matches_dense_tiled():
    """Sparse-atlas AO capture vs the dense tiled pass-2 on the same baked
    field (full G-buffer parity incl. the AO channel)."""
    from isosurfacesuperresolution_tpu.render.ao_sweep import (
        attach_baked_ao)
    vol = _sparse_dense(64, r=14)
    g = attach_baked_ao(BrickGrid.from_dense(vol), 0.45, 0.1)
    sg = SparseBrickGrid.from_brick_grid(g, tile=16, ao_tile=16)
    assert sg.ao_per_axis is not None and sg.ao_sh is None
    cam = CameraParams.create((0.2, 0.7, -1.6))
    cfg = RenderConfig(width=32, height=24, isovalue=0.45, ao_samples=16,
                       ao_mode="volume", sweep_dtype="float32",
                       renderer="sweep_pallas", sweep_tile=16)
    ref = np.asarray(render_gbuffer_sweep(g, cam, cam, cfg))
    got = np.asarray(render_gbuffer_sweep(sg, cam, cam, cfg))
    np.testing.assert_array_equal(ref[..., 3], got[..., 3])
    both = ref[..., 3] > 0.5
    assert both.sum() >= 20
    assert ref[..., 10][both].std() > 1e-3
    d = np.abs(ref[..., 10] - got[..., 10])[both]
    assert d.max() < 2e-3, float(d.max())
