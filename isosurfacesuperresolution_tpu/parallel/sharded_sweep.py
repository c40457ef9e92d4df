"""Volume-sharded sweep rendering: slab decomposition + halo exchange.

The pod-scale stretch configuration (SURVEY.md section 2.5 / BASELINE
config 5): volumes too large to replicate are sharded in SLABS along the
sweep's major axis, one slab per device.  Each device marches only its own
K/D slice planes - the sequential depth of the sweep divides by the mesh
size - after a one-time halo exchange of two boundary slices over the mesh
axis (`jax.lax.ppermute`, the ICI-neighbor collective).  The per-slab
partial hit states are combined with `pmin` (the winning global slice
index - slab m-ranges are disjoint, so the minimum is unique) + `psum` of
the winner-masked payload: the front-to-back "first slab that hit wins"
rule becomes two O(image)-sized all-reduces, and NO device materializes a
device-count-sized buffer (an earlier all_gather+select combine did).

Everything runs under `shard_map` with the volume sharded
``P(None, None, 'z')`` and the camera/image replicated; the combine and the
final shading/homography are replicated work on image-sized buffers.

The axis length need NOT divide the mesh (slabs are zero-padded; padding
is empty space and march validity is clamped to the true volume), and
baked-AO rendering is supported: the SH-L1 occlusion field
(`render/ao_sweep.py`) is sharded in the same slabs and captured at the
hit plane exactly like the single-device sweep.

Testable on the CPU mesh (`XLA_FLAGS=--xla_force_host_platform_device_
count=8`); parity with the single-device sweep is exact up to fp order
(tests/test_sharded_sweep.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.ops.separable_warp import (
    homography_warp, interp_matrix)
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import shade_hits
from isosurfacesuperresolution_tpu.volume.grid import BrickGrid

_PERMS = ((1, 2, 0), (0, 2, 1), (0, 1, 2))
HALO = 2          # slices each side: resample needs floor(zc-0.5)+1


def major_axis(cam: CameraParams) -> int:
    """Static sweep-axis choice (host-side; sharding specs are static)."""
    f = np.asarray(cam.look_at_pt) - np.asarray(cam.eye)
    return int(np.argmax(np.abs(f)))


def _slab_sweep(values_halo: jnp.ndarray,    # (X, Y, Zl + 2*HALO) local
                z0: jnp.ndarray,             # traced: slab's global z start
                Z: int,                      # global axis length (unpadded)
                eye_p: jnp.ndarray, ray_mat: jnp.ndarray,
                flip: jnp.ndarray, cfg: RenderConfig,
                geom,
                ao_halo: "jnp.ndarray | None" = None,
                ) -> Tuple[jnp.ndarray, ...]:
    """March this slab's slice planes; return partial hit state.

    Geometry mirrors `render.sweep._sweep_permuted` (cited there); slice
    index m stays GLOBAL so the cross-device combine is a plain min.
    """
    (s_grid, t_grid, kk, z_b) = geom
    X, Y, Zl = (values_halo.shape[0], values_halo.shape[1],
                values_halo.shape[2] - 2 * HALO)
    zss = cfg.sweep_z_supersample
    Kl = Zl * zss
    sigma = jnp.where(flip, -1.0, 1.0)
    iso = jnp.float32(cfg.isovalue)
    Sn, Tn = s_grid.shape[0], t_grid.shape[0]
    mm_dtype = jnp.dtype(cfg.sweep_dtype)

    def z_c(m):
        zc = (m + 0.5) / zss
        return jnp.where(flip, Z - zc, zc)

    # global m-range crossing this slab: z in [z0, z0 + Zl)
    m_start = jnp.where(flip, (Z - z0 - Zl) * zss, z0 * zss)
    # padded slabs can reach outside the true volume's global slice range
    # [0, Z*zss); their out-of-range planes are invalid
    K_global = Z * zss

    vmax_z = jnp.max(values_halo, axis=(0, 1))

    # device-varying zero: keeps shard_map's replication tracking happy for
    # the scan carry (every carry component depends on the slab index)
    zero = jnp.zeros((Sn, Tn), jnp.float32) + 0.0 * z0

    def slice_F(m):
        zc = z_c(m)
        lam = (zc - eye_p[2]) / kk
        # local z index into the halo'd slab
        zf_g = jnp.clip(jnp.floor(zc - 0.5), 0, Z - 2)
        zf = (zf_g - z0 + HALO).astype(jnp.int32)
        zf = jnp.clip(zf, 0, Zl + 2 * HALO - 2)
        fz = jnp.clip(zc - 0.5 - zf_g, 0.0, 1.0)
        sl = ((1.0 - fz)
              * jax.lax.dynamic_slice_in_dim(values_halo, zf, 1, 2)
              + fz * jax.lax.dynamic_slice_in_dim(values_halo, zf + 1, 1, 2)
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
        valid = sigma * (zc - eye_p[2]) > (0.5 - 1e-3)
        valid = valid & (m > -1e-3) & (m < K_global - 1 + 1e-3)
        return F, smax, valid

    def slice_sh(m):
        """(Sn, Tn, 4) SH occlusion resample at plane m (mirror of
        `sweep.resample_ao_slice`)."""
        zc = z_c(m)
        lam = (zc - eye_p[2]) / kk
        zf_g = jnp.clip(jnp.floor(zc - 0.5), 0, Z - 2)
        zf = (zf_g - z0 + HALO).astype(jnp.int32)
        zf = jnp.clip(zf, 0, Zl + 2 * HALO - 2)
        fz = jnp.clip(zc - 0.5 - zf_g, 0.0, 1.0)
        sl = ((1.0 - fz)
              * jax.lax.dynamic_slice_in_dim(ao_halo, zf, 1, 2)
              + fz * jax.lax.dynamic_slice_in_dim(ao_halo, zf + 1, 1, 2)
              )[:, :, 0, :]                                 # (X, Y, 4)
        x_pos = eye_p[0] + lam * (s_grid - eye_p[0])
        y_pos = eye_p[1] + lam * (t_grid - eye_p[1])
        wx = interp_matrix(x_pos, X)
        wy = interp_matrix(y_pos, Y)
        tmp = jnp.einsum("sx,xyc->syc", wx, sl,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("syc,ty->stc", tmp, wy,
                          preferred_element_type=jnp.float32)

    def compute_F(m, pred):
        F, smax, valid = slice_F(m)
        do = pred & valid & (smax >= iso)
        F = jnp.where(do, F, zero)
        return jnp.where(valid, F, zero), valid

    # F of the slice just before the slab (from the halo); the device
    # holding the global first slice starts from zeros exactly like the
    # single-device scan's init
    F_entry, _ = compute_F(m_start - 1.0, True)
    F_entry = jnp.where(m_start > 0.5, F_entry, zero)

    zero4 = jnp.zeros((Sn, Tn, 4), jnp.float32) + 0.0 * z0
    use_ao = ao_halo is not None

    def body(carry, j):
        if use_ao:
            (m_hit, frac, Fm1, g_s, g_t, g_z, sh_hit) = carry
        else:
            (m_hit, frac, Fm1, g_s, g_t, g_z) = carry
        m = m_start + j
        found = m_hit >= 0.0
        F, valid = compute_F(m, True)

        crossing = (~found) & (F >= iso) & valid
        denom = jnp.where(jnp.abs(F - Fm1) > 1e-12, F - Fm1, 1e-12)
        new_frac = jnp.clip((iso - Fm1) / denom, 0.0, 1.0)
        m_hit = jnp.where(crossing, m, m_hit)
        frac = jnp.where(crossing, new_frac, frac)

        def dcen(A, axis):
            return 0.5 * (jnp.roll(A, -1, axis) - jnp.roll(A, 1, axis))

        g_s = jnp.where(crossing, dcen(Fm1, 0), g_s)
        g_t = jnp.where(crossing, dcen(Fm1, 1), g_t)
        g_z = jnp.where(crossing, F - Fm1, g_z)
        if use_ao:
            sh = jax.lax.cond(jnp.any(crossing),
                              lambda: slice_sh(m), lambda: zero4)
            sh_hit = jnp.where(crossing[..., None], sh, sh_hit)
            return (m_hit, frac, F, g_s, g_t, g_z, sh_hit), None
        return (m_hit, frac, F, g_s, g_t, g_z), None

    init = (zero - 1.0, zero, F_entry, zero, zero, zero)
    if use_ao:
        init = init + (zero4,)
    res, _ = jax.lax.scan(body, init, jnp.arange(Kl, dtype=jnp.float32),
                          unroll=4)
    m_hit, frac, _, g_s, g_t, g_z = res[:6]
    sh_hit = res[6] if use_ao else zero4
    return m_hit, frac, g_s, g_t, g_z, sh_hit


def render_gbuffer_sweep_sharded(grid: BrickGrid, cam: CameraParams,
                                 cam_flow: CameraParams,
                                 cfg: RenderConfig, mesh: Mesh,
                                 axis_name: str = "z") -> jnp.ndarray:
    """Slab-sharded sweep render -> replicated (H, W, 12) G-buffer.

    The volume is sharded along the camera's major axis over ``mesh``'s
    ``axis_name`` dimension (zero-padded to a slab multiple when the axis
    length does not divide).  With ``cfg.ao_samples > 0`` the grid must
    carry a baked SH occlusion field (`render/ao_sweep.attach_baked_ao`);
    it is sharded in the same slabs.
    """
    use_ao = cfg.ao_samples > 0
    if use_ao and grid.ao_sh is None:
        raise ValueError("sharded sweep with AO needs a baked occlusion "
                         "field; call render.ao_sweep.attach_baked_ao")
    W, H = cfg.width, cfg.height
    D = mesh.shape[axis_name]

    axis = major_axis(cam)
    perm = _PERMS[axis]
    values = jnp.transpose(grid.dequant(grid.values), perm)
    X, Y, Z = values.shape
    Zl = -(-Z // D)                    # ceil: slabs zero-padded past Z
    if Zl * D != Z:
        values = jnp.pad(values, ((0, 0), (0, 0), (0, Zl * D - Z)))
    ao_field = None
    if use_ao:
        ao_field = jnp.transpose(grid.ao_sh, perm + (3,))
        if Zl * D != Z:
            ao_field = jnp.pad(ao_field,
                               ((0, 0), (0, 0), (0, Zl * D - Z), (0, 0)))

    pidx = jnp.asarray(perm)
    f_world = cam.look_at_pt - cam.eye
    f_world = f_world / jnp.linalg.norm(f_world)
    flip = jnp.take(f_world, axis) < 0

    tan_half = math.tan(math.radians(cam.fov_y_degrees) / 2.0)
    aspect = W / H
    B = jnp.asarray([
        [2.0 * tan_half * aspect / W, 0.0, -tan_half * aspect],
        [0.0, -2.0 * tan_half / H, tan_half],
        [0.0, 0.0, -1.0],
    ], jnp.float32)
    R_wv = cam.view_matrix()[:3, :3].T
    M = (R_wv @ B)[pidx, :]
    eye_p = grid.world_to_voxel(cam.eye)[pidx]

    # global geometry (replicated; identical on every device)
    zss = cfg.sweep_z_supersample
    sigma = jnp.where(flip, -1.0, 1.0)
    z_entry = jnp.where(flip, Z - 0.5 / zss, 0.5 / zss)
    z_b = eye_p[2] + sigma * jnp.maximum(sigma * (z_entry - eye_p[2]), 0.5)
    kk = z_b - eye_p[2]
    Sn = int(round(W * cfg.sweep_oversample))
    Tn = int(round(H * cfg.sweep_oversample))
    corners = jnp.asarray([[0.5, 0.5, 1.0], [W - 0.5, 0.5, 1.0],
                           [0.5, H - 0.5, 1.0], [W - 0.5, H - 0.5, 1.0]],
                          jnp.float32)
    d_c = corners @ M.T
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
    geom = (s_grid, t_grid, kk, z_b)

    def _exchange_halo(local, d):
        """Two boundary slices to each neighbour over ICI (axis 2)."""
        lo_edge = local[:, :, :HALO]                # for the d-1 neighbour
        hi_edge = local[:, :, -HALO:]               # for the d+1 neighbour
        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]
        from_prev = jax.lax.ppermute(hi_edge, axis_name, fwd)
        from_next = jax.lax.ppermute(lo_edge, axis_name, bwd)
        # wrap-around neighbours deliver garbage at the volume boundary;
        # mask them to zero (outside-volume background)
        from_prev = jnp.where(d == 0, jnp.zeros_like(from_prev), from_prev)
        from_next = jnp.where(d == D - 1, jnp.zeros_like(from_next),
                              from_next)
        return jnp.concatenate([from_prev, local, from_next], axis=2)

    def shard_fn(values_local, ao_local):
        # device position along the mesh axis -> slab origin
        d = jax.lax.axis_index(axis_name)
        z0 = d * Zl

        values_halo = _exchange_halo(values_local, d)
        ao_halo = None
        if use_ao:
            ao_halo = _exchange_halo(ao_local, d)

        m_hit, frac, g_s, g_t, g_z, sh_hit = _slab_sweep(
            values_halo, jnp.float32(z0), Z, eye_p, M, flip, cfg, geom,
            ao_halo=ao_halo)

        # first-hit combine: slab m-ranges are disjoint, so the global
        # minimum hit index is unique; pmin finds it and psum of the
        # winner-masked payload broadcasts the winning slab's values.
        # O(image) all-reduces only - nothing device-count-sized exists.
        m_inf = jnp.where(m_hit < 0.0, jnp.inf, m_hit)
        m_min = jax.lax.pmin(m_inf, axis_name)
        win = (m_inf == m_min) & jnp.isfinite(m_min)
        winf = win.astype(jnp.float32)
        frac, g_s, g_t, g_z = [
            jax.lax.psum(p * winf, axis_name)
            for p in (frac, g_s, g_t, g_z)]
        sh_hit = jax.lax.psum(sh_hit * winf[..., None], axis_name)
        m_hit = jnp.where(jnp.isfinite(m_min), m_min, -1.0)
        return m_hit, frac, g_s, g_t, g_z, sh_hit

    spec_in = P(None, None, axis_name)
    spec_ao = P(None, None, axis_name, None)
    values_sh = jax.device_put(values, NamedSharding(mesh, spec_in))
    ao_sh_in = (jax.device_put(ao_field, NamedSharding(mesh, spec_ao))
                if use_ao else
                jax.device_put(jnp.zeros((1, 1, D), jnp.float32),
                               NamedSharding(mesh, spec_in)))
    with mesh:
        outs = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(spec_in, spec_ao if use_ao else spec_in),
            out_specs=P()))(values_sh, ao_sh_in)
    m_hit, frac, g_s, g_t, g_z, sh_hit = outs
    found = m_hit >= 0.0

    # post-processing: identical to the tail of `sweep._sweep_permuted`
    def z_c(m):
        zc = (m + 0.5) / zss
        return jnp.where(flip, Z - zc, zc)

    m_star = m_hit - 1.0 + frac
    zc_star = z_c(m_star)
    lam_star = (zc_star - eye_p[2]) / kk
    xs = eye_p[0] + lam_star * (s_grid[:, None] - eye_p[0])
    ys = eye_p[1] + lam_star * (t_grid[None, :] - eye_p[1])
    lam_safe = jnp.where(jnp.abs(lam_star) > 1e-6, lam_star, 1e-6)
    dz_dm = sigma * (1.0 / zss)
    Vx = g_s / (lam_safe * ds)
    Vy = g_t / (lam_safe * dt)
    rel_z = zc_star - eye_p[2]
    rel_z = jnp.where(jnp.abs(rel_z) > 1e-6, rel_z, 1e-6)
    Vz = (g_z / dz_dm
          - Vx * (xs - eye_p[0]) / rel_z
          - Vy * (ys - eye_p[1]) / rel_z)

    inv = [0, 0, 0]
    for i, a in enumerate(perm):
        inv[a] = i
    hit_p = jnp.stack([xs, ys, jnp.broadcast_to(zc_star, xs.shape)], -1)
    grad_p = jnp.stack([Vx, Vy, Vz], -1)
    hit_vox = hit_p[..., jnp.asarray(inv)]
    grad = grad_p[..., jnp.asarray(inv)]
    gnorm = jnp.sqrt(jnp.maximum(jnp.sum(grad * grad, -1, keepdims=True),
                                 1e-12))
    normal_w = -grad / gnorm

    hit_world = grid.voxel_to_world(hit_vox)
    flat_hit = found.reshape(-1)
    if use_ao:
        from isosurfacesuperresolution_tpu.render.ao_sweep import ao_from_sh
        ao = ao_from_sh(sh_hit, normal_w).reshape(-1)
    else:
        ao = jnp.ones_like(flat_hit, jnp.float32)
    inter = shade_hits(hit_world.reshape(-1, 3), normal_w.reshape(-1, 3),
                       flat_hit, ao, cam, cam_flow, cfg, W, H
                       ).reshape(Sn, Tn, 12)

    Hs = kk * M[0] + eye_p[0] * M[2]
    Ht = kk * M[1] + eye_p[1] * M[2]
    Hw = M[2]
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
    out = jnp.transpose(out, (1, 0, 2))

    m_bin = out[..., 3:4] > 0.5
    mvec = m_bin.astype(jnp.float32)
    msafe = jnp.maximum(out[..., 3:4], 0.5)
    nrm = out[..., 4:7] / msafe
    nlen = jnp.sqrt(jnp.maximum(jnp.sum(nrm * nrm, -1, keepdims=True),
                                1e-12))
    nrm = jnp.where(m_bin, nrm / nlen, 0.0)
    frame = jnp.concatenate([
        out[..., 0:3] / msafe * mvec,
        mvec,
        nrm,
        out[..., 7:8] / msafe * mvec,
        out[..., 8:10] / msafe * mvec,
        jnp.where(m_bin, jnp.clip(out[..., 10:11], 0.0, 1.0), 1.0),
        jnp.ones_like(mvec),
    ], axis=-1)
    return frame
