"""Analytic test volumes with known isosurfaces.

The reference hints at a sphere test volume (commented `makeSphere`,
`CPURenderer.cpp:436-437`); here analytic volumes are first-class because the
test strategy (SURVEY.md section 4) relies on them: a sphere density field has a
closed-form hit point and normal for every ray, which turns the raycaster's
golden tests into exact math instead of stored images.

All fields return densities in roughly [0, 1] where value >= isovalue means
"inside", matching the convention of the reference datasets (isovalue ranges
per dataset in `DataGeneratorVideo2.py:99-121`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from isosurfacesuperresolution_tpu.volume.grid import BrickGrid


def _grid_coords(resolution: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cell-centered world coordinates of every voxel in the unit box.

    The unit box is [-0.5, 0.5]^3 (the normalized transform of
    `CPURenderer.cpp:448-460`); voxel i is centered at (i + 0.5)/res - 0.5.
    """
    c = (np.arange(resolution, dtype=np.float32) + 0.5) / resolution - 0.5
    return np.meshgrid(c, c, c, indexing="ij")


def sphere_volume(resolution: int = 64,
                  radius: float = 0.3,
                  center: Tuple[float, float, float] = (0.0, 0.0, 0.0),
                  sharpness: float = 8.0,
                  brick_size: int = 8) -> BrickGrid:
    """Smooth sphere density: value = sigmoid-free radial ramp.

    density(p) = clip(1 - |p - c| / radius, then linearly rescaled) so that
    density == 0.5 exactly at |p - c| == radius.  The gradient is radial, so
    expected normal at any hit is (p - c)/|p - c| (outward).
    """
    x, y, z = _grid_coords(resolution)
    cx, cy, cz = center
    r = np.sqrt((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2)
    # linear ramp through 0.5 at the radius; slope controlled by sharpness
    d = 0.5 - sharpness * (r - radius)
    d = np.clip(d, 0.0, 1.0).astype(np.float32)
    return BrickGrid.from_dense(d, brick_size=brick_size)


def torus_volume(resolution: int = 64,
                 major_radius: float = 0.3,
                 minor_radius: float = 0.12,
                 sharpness: float = 8.0,
                 brick_size: int = 8) -> BrickGrid:
    """Torus around the z axis; density ramps through 0.5 at the surface."""
    x, y, z = _grid_coords(resolution)
    q = np.sqrt(x ** 2 + y ** 2) - major_radius
    r = np.sqrt(q ** 2 + z ** 2)
    d = 0.5 - sharpness * (r - minor_radius)
    d = np.clip(d, 0.0, 1.0).astype(np.float32)
    return BrickGrid.from_dense(d, brick_size=brick_size)


def gyroid_volume(resolution: int = 64,
                  frequency: float = 4.0,
                  thickness: float = 0.15,
                  brick_size: int = 8) -> BrickGrid:
    """Triply periodic gyroid shell - a stand-in for cloud-like structures."""
    x, y, z = _grid_coords(resolution)
    w = 2.0 * np.pi * frequency
    g = (np.sin(w * x) * np.cos(w * y)
         + np.sin(w * y) * np.cos(w * z)
         + np.sin(w * z) * np.cos(w * x))
    d = np.clip(1.0 - np.abs(g) / (1.5 * thickness * frequency), 0.0, 1.0)
    # keep it inside a sphere so the silhouette is bounded
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    d = d * (r < 0.45)
    return BrickGrid.from_dense(d.astype(np.float32), brick_size=brick_size)


def blobs_volume(resolution: int = 64,
                 num_blobs: int = 6,
                 seed: int = 0,
                 brick_size: int = 8) -> BrickGrid:
    """Random metaballs: the analytic counterpart of the cloud datasets."""
    rng = np.random.RandomState(seed)
    x, y, z = _grid_coords(resolution)
    d = np.zeros_like(x)
    for _ in range(num_blobs):
        c = rng.uniform(-0.25, 0.25, size=3)
        rad = rng.uniform(0.08, 0.2)
        r2 = (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2
        d += np.exp(-r2 / (2 * (rad / 2) ** 2))
    d = np.clip(d, 0.0, 1.0).astype(np.float32)
    return BrickGrid.from_dense(d, brick_size=brick_size)
