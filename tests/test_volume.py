"""Volume-core tests: trilinear sampling, brick min/max, world transforms."""

import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.volume.grid import (
    BrickGrid, compute_brick_minmax, sample_trilinear)
from isosurfacesuperresolution_tpu.volume import analytic


def test_trilinear_at_voxel_centers():
    rng = np.random.RandomState(0)
    v = rng.rand(8, 9, 10).astype(np.float32)
    vals = jnp.asarray(v)
    # sampling exactly at voxel centers returns the stored values
    idx = np.stack(np.meshgrid(np.arange(8), np.arange(9), np.arange(10),
                               indexing="ij"), axis=-1).reshape(-1, 3)
    coords = jnp.asarray(idx, jnp.float32) + 0.5
    out = sample_trilinear(vals, coords)
    np.testing.assert_allclose(np.asarray(out), v.reshape(-1), rtol=1e-6)


def test_trilinear_interpolates_linearly():
    # a volume that is linear in x interpolates exactly
    x = np.arange(16, dtype=np.float32)
    v = jnp.asarray(np.broadcast_to(x[:, None, None], (16, 4, 4)).copy())
    pts = jnp.asarray([[3.75, 2.0, 2.0], [7.25, 1.5, 3.0]], jnp.float32)
    out = sample_trilinear(v, pts)
    np.testing.assert_allclose(np.asarray(out), [3.25, 6.75], atol=1e-6)


def test_trilinear_outside_is_zero():
    v = jnp.ones((8, 8, 8), jnp.float32)
    pts = jnp.asarray([[-5.0, 4.0, 4.0], [4.0, 100.0, 4.0]], jnp.float32)
    out = sample_trilinear(v, pts)
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.0])


def test_brick_minmax_bounds_all_samples():
    rng = np.random.RandomState(1)
    v = rng.rand(24, 24, 24).astype(np.float32)
    bmin, bmax = compute_brick_minmax(jnp.asarray(v), 8)
    assert bmin.shape == (3, 3, 3)
    # every voxel (plus apron) of brick (i,j,k) is within [bmin, bmax]
    for i in range(3):
        lo = max(0, i * 8 - 1)
        hi = min(24, (i + 1) * 8 + 1)
        sub = v[lo:hi]
        assert sub.max() <= float(bmax[i].max()) + 1e-6
    # global bounds agree
    assert abs(float(bmax.max()) - v.max()) < 1e-6
    assert abs(float(bmin.min()) - v.min()) < 1e-6


def test_brick_max_is_conservative_for_trilinear():
    """Any trilinear sample inside a brick must be <= that brick's max."""
    rng = np.random.RandomState(2)
    v = rng.rand(16, 16, 16).astype(np.float32)
    g = BrickGrid.from_dense(v, brick_size=8, normalize_box=False)
    pts = jnp.asarray(rng.rand(500, 3) * 16, jnp.float32)
    samples = np.asarray(g.sample_trilinear(pts))
    bmax = np.asarray(g.brick_max_at(pts))
    assert np.all(samples <= bmax + 1e-6)


def test_unit_box_normalization():
    g = analytic.sphere_volume(32)
    np.testing.assert_allclose(np.asarray(g.bbox_min), [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(np.asarray(g.bbox_max), [0.5, 0.5, 0.5])
    # world <-> voxel round trip
    p = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    back = g.voxel_to_world(g.world_to_voxel(p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-6)


def test_sphere_volume_crosses_isovalue_at_radius():
    g = analytic.sphere_volume(64, radius=0.3)
    # sample along +x: density 0.5 at |p| = 0.3
    xs = np.linspace(0.0, 0.5, 101, dtype=np.float32)
    pts = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], axis=-1)
    vox = g.world_to_voxel(jnp.asarray(pts))
    d = np.asarray(g.sample_trilinear(vox))
    # find crossing of 0.5
    below = np.where(d < 0.5)[0]
    crossing = xs[below[0]]
    assert abs(crossing - 0.3) < 0.02


def test_skull_volume_structure():
    """CT-head analogue (mainPSNR3_AllStats.py:29-40 Skull stand-in):
    a thin bone shell with openings and a nested lower-density brain."""
    g = analytic.skull_volume(96)
    d = np.asarray(g.values)
    occ = (d >= 0.5).mean()
    # thin shell: bone occupies a small fraction of the box
    assert 0.01 < occ < 0.15
    # the brain body exists strictly below the bone isovalue: lowering
    # the threshold to 0.4 roughly doubles the occupied region
    assert (d >= 0.4).mean() > 1.7 * occ
    # eye socket: the shell is carved open on the +z face near (+-.11,.1)
    def world_density(p):
        vox = g.world_to_voxel(jnp.asarray([p], jnp.float32))
        return float(np.asarray(g.sample_trilinear(vox))[0])
    # a ray along +z through the socket center crosses no bone >= 0.5
    # outside the brain (sample the shell band radius only)
    zs = np.linspace(0.24, 0.34, 21)
    assert all(world_density((0.11, 0.10, z)) < 0.5 for z in zs)
    # ... but does cross bone off-socket (through the forehead)
    zs_hit = np.linspace(0.15, 0.40, 51)
    assert any(world_density((0.0, 0.22, z)) >= 0.5 for z in zs_hit)


def test_thorax_volume_structure():
    """CT-chest analogue: thin rib rings + spine at bone threshold,
    smooth body + lung cavities below it."""
    g = analytic.thorax_volume(96)
    d = np.asarray(g.values)
    occ_bone = (d >= 0.5).mean()
    # bone is sparse thin structure
    assert 0.001 < occ_bone < 0.05
    # soft tissue appears at isovalue 0.3 and is much larger
    assert (d >= 0.3).mean() > 5.0 * occ_bone
    # lung cavities: density at the lung centers is below soft tissue
    def world_density(p):
        vox = g.world_to_voxel(jnp.asarray([p], jnp.float32))
        return float(np.asarray(g.sample_trilinear(vox))[0])
    assert world_density((0.13, 0.05, 0.0)) < 0.2
    assert world_density((-0.13, 0.05, 0.0)) < 0.2
    # spine column is bone
    assert world_density((0.0, 0.0, -0.165)) >= 0.5
