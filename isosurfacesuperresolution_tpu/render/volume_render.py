"""Direct volume rendering (emission-absorption + transfer function).

Parity targets: the reference's second render mode - `-m volume` on both
renderers.  The GPU path composites a piecewise-linear transfer function
through GVDB's `SHADE_VOLUME` (`GPURenderer.cpp:670-689`, default TF at
`:677-680`); the CPU path uses OpenVDB's `VolumeRender` with
scattering/absorption constants (`CPURenderer.cpp:529-553`).

TPU design: the same gather-free shear-warp sweep as the isosurface path
(`render/sweep.py`), but the front-to-back scan carries premultiplied RGB +
transmittance instead of hit state - per slice the resampled density goes
through the transfer function (branchless `jnp.interp`) and composites on
the VPU.  A per-ray marching oracle (`render_volume_march`) validates it.

Output: (H, W, 4) premultiplied RGBA.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.ops.separable_warp import (
    homography_warp, interp_matrix)
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.volume.grid import (
    BrickGrid, sample_trilinear)

# default transfer function: density -> RGBA nodes, the GPU renderer's
# 4-segment ramp (GPURenderer.cpp:677-680)
DEFAULT_TF = ((0.00, 0.0, 0.0, 0.0, 0.00),
              (0.25, 1.0, 0.0, 0.0, 0.05),
              (0.50, 1.0, 0.5, 0.0, 0.10),
              (0.75, 1.0, 1.0, 0.0, 0.15),
              (1.00, 1.0, 1.0, 1.0, 0.20))

_PERMS = ((1, 2, 0), (0, 2, 1), (0, 1, 2))


def apply_transfer(density: jnp.ndarray, tf=DEFAULT_TF) -> jnp.ndarray:
    """Piecewise-linear TF lookup: density (...) -> RGBA (..., 4)."""
    nodes = jnp.asarray([n[0] for n in tf], jnp.float32)
    chans = [jnp.asarray([n[c] for c in (1, 2, 3, 4)], jnp.float32)
             for n in tf]
    vals = jnp.stack(chans)                      # (N, 4)
    return jnp.stack([jnp.interp(density, nodes, vals[:, c])
                      for c in range(4)], axis=-1)


def _composite_step(rgba: jnp.ndarray, alpha_scale: float,
                    C: jnp.ndarray, T: jnp.ndarray):
    """One front-to-back emission-absorption step (premultiplied)."""
    a = jnp.clip(rgba[..., 3] * alpha_scale, 0.0, 1.0)
    C = C + (T * a)[..., None] * rgba[..., :3]
    T = T * (1.0 - a)
    return C, T


def _volume_sweep_permuted(values, eye_p, ray_mat, flip, cfg: RenderConfig,
                           tf) -> jnp.ndarray:
    """Compositing sweep over one axis permutation.

    Geometry identical to `sweep._sweep_permuted` (base plane, intermediate
    grid, per-slice scale+translate resample, final homography); only the
    scan body differs: the carry is (premultiplied RGB, transmittance).
    """
    W, H = cfg.width, cfg.height
    X, Y, Z = values.shape
    zss = cfg.sweep_z_supersample
    K = Z * zss
    Sn = int(round(W * cfg.sweep_oversample))
    Tn = int(round(H * cfg.sweep_oversample))
    sigma = jnp.where(flip, -1.0, 1.0)

    def z_c(m):
        zc = (m + 0.5) / zss
        return jnp.where(flip, Z - zc, zc)

    k_min = 0.5
    z_entry = z_c(jnp.float32(0.0))
    z_b = eye_p[2] + sigma * jnp.maximum(sigma * (z_entry - eye_p[2]), k_min)
    kk = z_b - eye_p[2]

    corners = jnp.asarray([[0.5, 0.5, 1.0], [W - 0.5, 0.5, 1.0],
                           [0.5, H - 0.5, 1.0], [W - 0.5, H - 0.5, 1.0]],
                          jnp.float32)
    d_c = corners @ ray_mat.T
    lam_c = kk / d_c[:, 2]
    s_c = eye_p[0] + d_c[:, 0] * lam_c
    t_c = eye_p[1] + d_c[:, 1] * lam_c
    margin = 2.0
    s_min, s_max = jnp.min(s_c) - margin, jnp.max(s_c) + margin
    t_min, t_max = jnp.min(t_c) - margin, jnp.max(t_c) + margin
    ds = (s_max - s_min) / Sn
    dt = (t_max - t_min) / Tn
    s_grid = s_min + (jnp.arange(Sn, dtype=jnp.float32) + 0.5) * ds
    t_grid = t_min + (jnp.arange(Tn, dtype=jnp.float32) + 0.5) * dt

    vmax_z = jnp.max(values, axis=(0, 1))
    # cull slices whose max density maps to zero opacity: the end of the
    # leading zero-alpha plateau of the TF (alpha is nonzero immediately
    # after the LAST all-zero prefix node)
    cut = -1.0
    for node in tf:
        if node[4] != 0.0:
            break
        cut = node[0]
    d_cut = jnp.float32(cut)
    mm_dtype = jnp.dtype(cfg.sweep_dtype)
    # opacity correction: the TF alpha is defined per unit voxel; a slice
    # plane covers 1/zss voxels along the axis
    alpha_scale = float(cfg.volume_alpha_scale) / zss

    zero = jnp.zeros((Sn, Tn), jnp.float32)

    def slice_density(m):
        zc = z_c(jnp.float32(m))
        lam = (zc - eye_p[2]) / kk
        zf = jnp.clip(jnp.floor(zc - 0.5), 0, Z - 2).astype(jnp.int32)
        fz = jnp.clip(zc - 0.5 - zf, 0.0, 1.0)
        sl = ((1.0 - fz) * jax.lax.dynamic_slice_in_dim(values, zf, 1, 2)
              + fz * jax.lax.dynamic_slice_in_dim(values, zf + 1, 1, 2)
              )[:, :, 0]
        x_pos = eye_p[0] + lam * (s_grid - eye_p[0])
        y_pos = eye_p[1] + lam * (t_grid - eye_p[1])
        wx = interp_matrix(x_pos, X)
        wy = interp_matrix(y_pos, Y)
        tmp = jnp.dot(wx.astype(mm_dtype), sl.astype(mm_dtype),
                      preferred_element_type=jnp.float32)
        F = jnp.dot(tmp.astype(mm_dtype), wy.T.astype(mm_dtype),
                    preferred_element_type=jnp.float32)
        smax = jnp.maximum(vmax_z[zf], vmax_z[zf + 1])
        valid = sigma * (zc - eye_p[2]) > (k_min - 1e-3)
        return F, smax, valid

    def body(carry, m):
        C, T = carry
        F, smax, valid = slice_density(m)
        do = valid & (smax > d_cut)
        rgba = apply_transfer(jnp.where(do, F, 0.0), tf)
        rgba = jnp.where(valid, rgba, 0.0)
        C, T = _composite_step(rgba, alpha_scale, C, T)
        return (C, T), None

    C0 = jnp.zeros((Sn, Tn, 3), jnp.float32)
    T0 = jnp.ones((Sn, Tn), jnp.float32)
    (C, T), _ = jax.lax.scan(body, (C0, T0), jnp.arange(K), unroll=8)
    inter = jnp.concatenate([C, (1.0 - T)[..., None]], axis=-1)

    # homography to image space (same construction as the iso sweep)
    Hs = kk * ray_mat[0] + eye_p[0] * ray_mat[2]
    Ht = kk * ray_mat[1] + eye_p[1] * ray_mat[2]
    Hw = ray_mat[2]
    Hmat = jnp.stack([(Hs - s_min * Hw) / ds,
                      (Ht - t_min * Hw) / dt,
                      Hw])
    uc = jnp.asarray([W / 2.0, H / 2.0, 1.0], jnp.float32)
    wgt = Hmat[2] @ uc
    s_ctr = (Hmat[0] @ uc) / wgt
    t_ctr = (Hmat[1] @ uc) / wgt
    dsdu = (Hmat[0, 0] - s_ctr * Hmat[2, 0]) / wgt
    dsdv = (Hmat[0, 1] - s_ctr * Hmat[2, 1]) / wgt
    dtdu = (Hmat[1, 0] - t_ctr * Hmat[2, 0]) / wgt
    dtdv = (Hmat[1, 1] - t_ctr * Hmat[2, 1]) / wgt
    swap = jnp.abs(dsdu * dtdv) < jnp.abs(dsdv * dtdu)
    out = jax.lax.cond(
        swap,
        lambda: homography_warp(jnp.transpose(inter, (1, 0, 2)),
                                Hmat[jnp.asarray([1, 0, 2])], (W, H)),
        lambda: homography_warp(inter, Hmat, (W, H)))
    return jnp.transpose(out, (1, 0, 2))          # (H, W, 4)


@partial(jax.jit, static_argnames=("cfg", "tf"))
def render_volume_sweep(grid: BrickGrid, cam: CameraParams,
                        cfg: RenderConfig,
                        tf: Tuple = DEFAULT_TF) -> jnp.ndarray:
    """Sweep DVR: (H, W, 4) premultiplied RGBA."""
    W, H = cfg.width, cfg.height
    f_world = cam.look_at_pt - cam.eye
    f_world = f_world / jnp.linalg.norm(f_world)
    axis = jnp.argmax(jnp.abs(f_world))
    flip = jnp.take(f_world, axis) < 0

    tan_half = math.tan(math.radians(cam.fov_y_degrees) / 2.0)
    aspect = W / H
    B = jnp.asarray([
        [2.0 * tan_half * aspect / W, 0.0, -tan_half * aspect],
        [0.0, -2.0 * tan_half / H, tan_half],
        [0.0, 0.0, -1.0],
    ], jnp.float32)
    R_wv = cam.view_matrix()[:3, :3].T
    M = R_wv @ B
    eye_vox = grid.world_to_voxel(cam.eye)

    def make_branch(perm):
        def branch():
            values = jnp.transpose(grid.dequant(grid.values), perm)
            pidx = jnp.asarray(perm)
            return _volume_sweep_permuted(values, eye_vox[pidx],
                                          M[pidx, :], flip, cfg, tf)
        return branch

    return jax.lax.switch(axis, [make_branch(p) for p in _PERMS])


@partial(jax.jit, static_argnames=("cfg", "tf"))
def render_volume_march(grid: BrickGrid, cam: CameraParams,
                        cfg: RenderConfig,
                        tf: Tuple = DEFAULT_TF) -> jnp.ndarray:
    """Per-ray marching DVR oracle: same compositing at `cfg.step_voxels`
    steps (slow on TPU; used for parity tests and tiny offline runs)."""
    W, H = cfg.width, cfg.height
    xs = (jnp.arange(W) + 0.5) / W
    ys = (jnp.arange(H) + 0.5) / H
    tan_half = math.tan(math.radians(cam.fov_y_degrees) / 2.0)
    aspect = W / H
    u = (xs * 2.0 - 1.0) * tan_half * aspect
    v = (1.0 - ys * 2.0) * tan_half
    R_wv = cam.view_matrix()[:3, :3].T
    dirs_cam = jnp.stack(jnp.broadcast_arrays(
        u[None, :], v[:, None], -jnp.ones((H, W))), axis=-1)
    dirs = dirs_cam @ R_wv.T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    eye_vox = grid.world_to_voxel(cam.eye)
    vsize = grid.voxel_size[0]
    res = jnp.asarray(grid.resolution, jnp.float32)

    step = cfg.step_voxels
    # conservative ray range: eye-to-volume distance + diagonal (the eye
    # sits a few volume-sizes out in every reference configuration)
    n_steps = int(np.ceil(5.0 * max(grid.values.shape) / step)) + 4
    alpha_scale = float(cfg.volume_alpha_scale) * step

    def ray(d):
        dv = d / (vsize + 1e-30)
        dv = dv / jnp.linalg.norm(dv)

        def body(carry, i):
            C, T = carry
            p = eye_vox + dv * (i * step)
            inside = jnp.all((p >= 0.5) & (p <= res - 0.5))
            dens = jnp.where(inside,
                             sample_trilinear(grid.values, p,
                                              scale=grid.value_scale,
                                              offset=grid.value_offset),
                             0.0)
            rgba = apply_transfer(dens, tf)
            a = jnp.clip(rgba[3] * alpha_scale, 0.0, 1.0)
            C = C + T * a * rgba[:3]
            T = T * (1.0 - a)
            return (C, T), None

        (C, T), _ = jax.lax.scan(body, (jnp.zeros(3), jnp.float32(1.0)),
                                 jnp.arange(n_steps))
        return jnp.concatenate([C, jnp.asarray([1.0]) - T])

    return jax.vmap(jax.vmap(ray))(dirs)
