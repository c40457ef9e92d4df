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


def _spectral_noise(resolution: int, rng: np.random.RandomState,
                    beta: float = 3.0,
                    min_period_voxels: float = 0.0) -> np.ndarray:
    """Smooth random field by spectral synthesis: white noise shaped by a
    1/f^(beta/2) amplitude spectrum (fBm-like).  Output normalized to
    zero mean, unit std.

    ``min_period_voxels`` > 0 band-limits the field: spectral content with
    period below that many voxels is zeroed.  The reference's datasets are
    real simulations (Clouds/RM/Ejecta, `mainPSNR3_AllStats.py:29-40`)
    whose surfaces are smooth at the leaf-voxel scale; a white spectral
    tail instead makes the rendered high-res normal field sub-Nyquist
    speckle that no 4x SR method can reconstruct, so quality metrics on
    such content measure smoothing luck, not super-resolution."""
    white = rng.randn(resolution, resolution, resolution)
    spec = np.fft.rfftn(white)
    kx = np.fft.fftfreq(resolution)[:, None, None]
    ky = np.fft.fftfreq(resolution)[None, :, None]
    kz = np.fft.rfftfreq(resolution)[None, None, :]
    k = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
    k[0, 0, 0] = 1.0
    shaped = spec / k ** (beta / 2.0)
    if min_period_voxels > 0:
        shaped = np.where(k > 1.0 / min_period_voxels, 0.0, shaped)
    field = np.fft.irfftn(shaped, s=(resolution,) * 3)
    field -= field.mean()
    field /= field.std() + 1e-12
    return field.astype(np.float32)


def turbulence_volume(resolution: int = 64,
                      seed: int = 0,
                      beta: float = 3.5,
                      coverage: float = 0.35,
                      min_feature_voxels: float = 6.0,
                      brick_size: int = 8) -> BrickGrid:
    """Cloud-like fBm density - the analytic analogue of the reference's
    Clouds datasets (`mainPSNR3_AllStats.py:29-33`): wispy multi-scale
    structure with soft silhouettes, bounded by a radial falloff.

    ``min_feature_voxels`` band-limits the field like the real cloud
    simulations it mimics (see `_spectral_noise`); 0 restores the legacy
    white-tail spectrum whose GT normals are voxel-scale speckle."""
    rng = np.random.RandomState(seed)
    n = _spectral_noise(resolution, rng, beta,
                        min_period_voxels=min_feature_voxels)
    x, y, z = _grid_coords(resolution)
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    falloff = np.clip(1.0 - (r / 0.45) ** 2, 0.0, 1.0)
    # shift so roughly `coverage` of the in-sphere voxels exceed 0.5
    inside = n[r < 0.45]
    thresh = np.quantile(inside, 1.0 - coverage)
    d = 0.5 + 0.35 * (n - thresh)
    d = np.clip(d * falloff, 0.0, 1.0).astype(np.float32)
    return BrickGrid.from_dense(d, brick_size=brick_size)


def ejecta_volume(resolution: int = 64,
                  num_particles: int = 400,
                  seed: int = 0,
                  brick_size: int = 8) -> BrickGrid:
    """Radial particle burst - the Ejecta-dataset analogue
    (`mainPSNR3_AllStats.py:37-40`): hundreds of small dense clumps shot
    outward from a dense core, giving high-frequency silhouettes.

    Each Gaussian clump is rasterized only inside its local window so the
    construction stays O(particles * window^3) and scales to 512^3."""
    rng = np.random.RandomState(seed)
    res = resolution
    d = np.zeros((res, res, res), np.float32)
    # dense core
    x, y, z = _grid_coords(res)
    r2c = x ** 2 + y ** 2 + z ** 2
    d += np.exp(-r2c / (2 * 0.06 ** 2)).astype(np.float32)
    coords = (np.arange(res, dtype=np.float32) + 0.5) / res - 0.5
    for _ in range(num_particles):
        dirv = rng.randn(3)
        dirv /= np.linalg.norm(dirv)
        dist = 0.12 + 0.33 * rng.uniform() ** 0.7
        c = dirv * dist
        rad = rng.uniform(0.008, 0.03) * (1.2 - dist)
        # local window of +-3 sigma
        w = 3.0 * rad
        idx = []
        for ax in range(3):
            lo = int(np.searchsorted(coords, c[ax] - w))
            hi = int(np.searchsorted(coords, c[ax] + w)) + 1
            lo, hi = max(lo, 0), min(hi, res)
            if hi <= lo:
                break
            idx.append((lo, hi))
        if len(idx) != 3:
            continue
        (x0, x1), (y0, y1), (z0, z1) = idx
        gx = coords[x0:x1, None, None] - c[0]
        gy = coords[None, y0:y1, None] - c[1]
        gz = coords[None, None, z0:z1] - c[2]
        r2 = gx ** 2 + gy ** 2 + gz ** 2
        d[x0:x1, y0:y1, z0:z1] += np.exp(-r2 / (2 * (rad / 1.5) ** 2)
                                         ).astype(np.float32)
    d = np.clip(d, 0.0, 1.0)
    return BrickGrid.from_dense(d, brick_size=brick_size)


def interface_volume(resolution: int = 64,
                     seed: int = 0,
                     roughness: float = 0.12,
                     min_feature_voxels: float = 6.0,
                     brick_size: int = 8) -> BrickGrid:
    """Crumpled-interface slab - the Richtmyer-Meshkov analogue
    (`mainPSNR3_AllStats.py:34-36`): a dense layer whose upper surface is
    displaced by multi-scale 2D noise, yielding folded, overhanging
    structures once thresholded.

    ``min_feature_voxels`` band-limits both noise fields (see
    `_spectral_noise`): the RM simulation this mimics is smooth at the
    voxel scale, and without the cut the rendered GT normal field is
    voxel-scale speckle - unreconstructable by any SR method and
    therefore useless as a quality target.  Set 0 for the legacy
    white-tail behavior."""
    rng = np.random.RandomState(seed)
    res = resolution
    # 2D spectral noise as the interface height field
    white = rng.randn(res, res)
    spec = np.fft.rfft2(white)
    kx = np.fft.fftfreq(res)[:, None]
    ky = np.fft.rfftfreq(res)[None, :]
    k = np.sqrt(kx ** 2 + ky ** 2)
    k[0, 0] = 1.0
    shaped = spec / k ** 1.5
    if min_feature_voxels > 0:
        shaped = np.where(k > 1.0 / min_feature_voxels, 0.0, shaped)
    h = np.fft.irfft2(shaped, s=(res, res))
    h = (h - h.mean()) / (h.std() + 1e-12)
    x, y, z = _grid_coords(res)
    surface = -0.05 + roughness * h[:, :, None]
    # 3D noise modulates the slab so the interface tears into blobs
    n3 = _spectral_noise(res, rng, 3.0,
                         min_period_voxels=min_feature_voxels)
    d = 0.5 + 4.0 * (surface - z) + 0.35 * n3
    # slab bottom + lateral bounds
    d = np.where(z < -0.35, 0.0, d)
    lateral = np.maximum(np.abs(x), np.abs(y))
    d = d * np.clip((0.45 - lateral) / 0.05, 0.0, 1.0)
    d = np.clip(d, 0.0, 1.0).astype(np.float32)
    return BrickGrid.from_dense(d, brick_size=brick_size)


def skull_volume(resolution: int = 64,
                 shell_thickness: float = 0.022,
                 sharpness: float = 10.0,
                 brick_size: int = 8) -> BrickGrid:
    """CT-head analogue - the Skull-dataset stand-in
    (`mainPSNR3_AllStats.py:29-40` lists Skull among the paper's eval
    volumes): a thin curved bone shell (ellipsoid cranium, y-up) carved
    by the foramen magnum, two eye sockets and a nasal opening, a lower
    jaw arc, and a lower-density brain body inside.

    Rendering characteristics this adds over the other families: large
    smooth thin shells (interpolation is strong here - a hard test for
    the net's "smooth stays smooth" behavior), sharp silhouette holes,
    and a nested second surface that appears when the isovalue drops
    below the brain density (~0.45).  Bone crosses 0.5 exactly at its
    surface; all features are smooth analytic primitives, so the GT is
    band-limited by construction.
    """
    x, y, z = _grid_coords(resolution)

    def ellipsoid_sdf(cx, cy, cz, ax, ay, az):
        # approximate signed distance: normalized radial excess scaled
        # by the smallest semi-axis (exact enough under the density ramp)
        q = np.sqrt(((x - cx) / ax) ** 2 + ((y - cy) / ay) ** 2
                    + ((z - cz) / az) ** 2)
        return (q - 1.0) * min(ax, ay, az)

    # cranium: thin shell of an ellipsoid, slightly taller than wide
    cran = ellipsoid_sdf(0.0, 0.06, 0.0, 0.27, 0.32, 0.29)
    shell = np.abs(cran) - shell_thickness

    # carve openings (smooth-subtract: shell stays outside the cutters)
    def sphere_sdf(cx, cy, cz, r):
        return np.sqrt((x - cx) ** 2 + (y - cy) ** 2
                       + (z - cz) ** 2) - r

    cutters = [
        # foramen magnum: opening at the bottom
        np.maximum(np.sqrt(x ** 2 + z ** 2) - 0.07, -(y + 0.18)),
        # eye sockets: two spheres on the +z face
        sphere_sdf(-0.11, 0.10, 0.27, 0.075),
        sphere_sdf(+0.11, 0.10, 0.27, 0.075),
        # nasal opening
        sphere_sdf(0.0, -0.02, 0.29, 0.045),
    ]
    for c in cutters:
        shell = np.maximum(shell, -c)

    # lower jaw: half-torus arc below the cranium, open to the back
    jaw_q = np.sqrt(x ** 2 + (z - 0.05) ** 2) - 0.17
    jaw = np.sqrt(jaw_q ** 2 + (y + 0.24) ** 2) - 0.025
    jaw = np.maximum(jaw, -(z + 0.02))          # keep the front arc only
    bone = np.minimum(shell, jaw)

    d = np.clip(0.5 - sharpness * bone, 0.0, 1.0)

    # brain: smooth wrinkled body inside, peak density 0.45 (below the
    # default isovalue - drops to ~0.4 reveal the nested surface)
    brain_sdf = ellipsoid_sdf(0.0, 0.08, 0.0, 0.21, 0.25, 0.23)
    w = 2.0 * np.pi * 7.0
    wrinkle = 0.012 * (np.sin(w * x) * np.sin(w * y + 1.3)
                       + np.cos(w * z + 0.7))
    brain = np.clip(0.45 * np.clip(0.5 - 9.0 * (brain_sdf + wrinkle),
                                   0.0, 1.0), 0.0, 0.45)
    d = np.maximum(d, brain).astype(np.float32)
    return BrickGrid.from_dense(d, brick_size=brick_size)


def thorax_volume(resolution: int = 64,
                  num_ribs: int = 7,
                  sharpness: float = 12.0,
                  brick_size: int = 8) -> BrickGrid:
    """CT-chest analogue - the Thorax-dataset stand-in
    (`mainPSNR3_AllStats.py:29-40`): an elliptical ribcage (y-up) of
    thin curved rib rings around two lung cavities, a vertebrae-bumped
    spine column at the back, a sternum bar at the front, and a
    low-density soft-tissue body.

    At the default isovalue 0.5 only bone is visible - many thin,
    repeated, curved structures with gaps, the classic hard case for
    super-resolution (sub-pixel ribs alias at low res).  Dropping the
    isovalue to ~0.3 shows the smooth body surface instead.  Densities:
    bone ramps through 0.5 at its surface, soft tissue plateaus at
    0.35, lungs carve it to ~0.1.
    """
    x, y, z = _grid_coords(resolution)
    res = resolution

    # soft-tissue body: superellipsoid, wide in x, shallow in z
    bq = (np.abs(x / 0.33) ** 3 + np.abs(y / 0.43) ** 3
          + np.abs(z / 0.23) ** 3)
    body = 0.35 * np.clip(1.6 * (1.0 - bq), 0.0, 1.0)
    # lungs: two ellipsoidal cavities
    for sx in (-1.0, 1.0):
        lq = (((x - sx * 0.13) / 0.11) ** 2 + ((y - 0.05) / 0.24) ** 2
              + (z / 0.13) ** 2)
        body = np.where(lq < 1.0, np.minimum(body, 0.1 + 0.25 * lq), body)

    bone = np.full_like(x, 1e9)

    # rib rings: elliptical tori following the body cross-section,
    # computed on a y-window slab each so 256^3 stays cheap
    coords = (np.arange(res, dtype=np.float32) + 0.5) / res - 0.5
    rib_r = 0.013
    for k in range(num_ribs):
        yk = -0.22 + 0.50 * (k + 0.5) / num_ribs
        # body half-axes at this height (superellipsoid cross-section)
        s = np.clip(1.0 - np.abs(yk / 0.43) ** 3, 0.0, None) ** (1.0 / 3.0)
        ax_k, az_k = 0.29 * s, 0.20 * s
        if min(ax_k, az_k) < 0.05:
            continue
        lo = int(np.searchsorted(coords, yk - 4 * rib_r))
        hi = int(np.searchsorted(coords, yk + 4 * rib_r)) + 1
        lo, hi = max(lo, 0), min(hi, res)
        xs = x[:, lo:hi, :]
        ys = y[:, lo:hi, :]
        zs = z[:, lo:hi, :]
        f = np.sqrt((xs / ax_k) ** 2 + (zs / az_k) ** 2) - 1.0
        ring = np.sqrt((f * 0.5 * (ax_k + az_k)) ** 2 + (ys - yk) ** 2)
        bone[:, lo:hi, :] = np.minimum(bone[:, lo:hi, :], ring - rib_r)

    # spine: vertical capsule at the back with vertebra bumps
    vert = 0.006 * np.cos(2.0 * np.pi * y / 0.055)
    spine = (np.sqrt(x ** 2 + (z + 0.165) ** 2) - (0.035 + vert))
    spine = np.maximum(spine, np.abs(y - 0.03) - 0.30)
    bone = np.minimum(bone, spine)

    # sternum: thin vertical bar at the front
    stern = np.maximum.reduce([np.abs(x) - 0.025,
                               np.abs(y - 0.06) - 0.17,
                               np.abs(z - 0.185) - 0.018])
    bone = np.minimum(bone, stern)

    d = np.maximum(np.clip(0.5 - sharpness * bone, 0.0, 1.0), body)
    return BrickGrid.from_dense(d.astype(np.float32),
                                brick_size=brick_size)


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
