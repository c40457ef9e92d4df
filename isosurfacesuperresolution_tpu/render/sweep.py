"""Perspective shear-warp sweep renderer: gather-free isosurface raycasting.

The TPU-first re-design of the ray marcher.  XLA:TPU executes arbitrary
gathers at ~2M indices/s (measured on v5e, independent of locality), which
makes classic per-ray texture marching (`render/raycast.py`) three orders of
magnitude too slow for real time.  This module renders the SAME 12-channel
G-buffer with zero gathers by factoring the perspective view transform
(Lacroute-style shear-warp, rebuilt on matmuls):

1.  Pick the volume axis most parallel to the view direction; the volume is
    processed as regular slices along that axis (a `lax.switch` over the
    three static permutations keeps this jit-compatible; the flip along the
    axis is fully traced).
2.  Choose a *base plane* (entry-side slice plane) and a regular
    intermediate grid (s, t) on it.  Rays through the eye and the (s, t)
    grid cross every slice z_k in an axis-aligned SCALE + TRANSLATE of the
    grid - each slice is resampled with two dense 2-tap interpolation
    matrices on the MXU (`ops/separable_warp`).
3.  March front-to-back as a `lax.scan` over slice planes: isosurface test,
    first-crossing bookkeeping, inverse-lerp refinement (the analytic limit
    of the reference's binary search, `render_kernel.cu:176-187`) and
    gradient capture are all elementwise over the intermediate image.
    Slices whose max value is below the isovalue skip their resample
    (`lax.cond`) - the slab-level analogue of GVDB's node culling.
4.  Surface normals come from frustum-space finite differences pushed
    through the analytic shear Jacobian - no extra volume samples.
5.  The intermediate G-buffer maps to the final image through ONE 2D
    homography, executed as a two-pass separable resample.

Accuracy vs the marcher: samples lie on sheared slice lattices instead of
the ray lattice; with ``sweep_z_supersample=2`` the effective step is half a
voxel along the major axis and hits are refined by inverse lerp.  The parity
test (`tests/test_sweep.py`) bounds the disagreement against
`render_gbuffer`.

Constraint: every image ray must cross the slice planes monotonically
(view-to-axis angle + fov/2 < 90 degrees) - true for all the reference's
camera configurations.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.ops.separable_warp import (
    homography_warp, interp_matrix)
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import (
    compute_ao, shade_hits)
from isosurfacesuperresolution_tpu.volume.grid import BrickGrid


_PERMS = ((1, 2, 0), (0, 2, 1), (0, 1, 2))  # axis 0 / 1 / 2 as major (last)


def _sweep_permuted(values: jnp.ndarray,      # (X, Y, Z) permuted volume
                    eye_p: jnp.ndarray,       # (3,) permuted voxel-space eye
                    ray_mat: jnp.ndarray,     # (3,3): d_perm = M @ (u,v,1)
                    flip: jnp.ndarray,        # traced bool: march -z
                    grid: BrickGrid,
                    cam: CameraParams,
                    cam_flow: CameraParams,
                    cfg: RenderConfig,
                    perm: Tuple[int, int, int],
                    ao_field: "jnp.ndarray | None" = None,
                    rp=None,
                    packed_axis=None,
                    packed_ao=None) -> jnp.ndarray:
    if rp is None:
        from isosurfacesuperresolution_tpu.render.params import RenderParams
        rp = RenderParams.from_config(cfg)
    use_volume_ao = ao_field is not None or packed_ao is not None
    W, H = cfg.width, cfg.height
    if packed_axis is not None:
        # sparse packed-tile storage (volume/packed.py): values is None,
        # the per-axis atlas replaces the dense array on the tiled path
        Z, X, Y = packed_axis.shape
    else:
        X, Y, Z = values.shape

    # baked-AO field storage parameters (grid.ao_* may be per-channel
    # tuples); coarse fields (ao_downsample > 1) are sampled natively by
    # the tiled capture kernel - every other AO path gets a dequantized
    # on-device upsample here (those paths only run for small volumes
    # and CPU tests, where the fine f32 field is cheap)
    # (getattr: the packed path passes a SparseBrickGrid here, which
    # carries no dense-field affine/downsample - its atlas is packed
    # dequantized at full resolution)
    ao_scale = getattr(grid, "ao_scale", 1.0)
    ao_offset = getattr(grid, "ao_offset", 0.0)
    ao_fd = getattr(grid, "ao_downsample", 1)
    if ao_field is not None and ao_fd > 1:
        tiled_capture = (cfg.renderer == "sweep_pallas"
                         and packed_axis is None
                         and (cfg.sweep_tile > 0
                              or (cfg.sweep_tile == 0
                                  and max(X, Y) >= 512)))
        if not tiled_capture:
            f32 = ao_field.astype(jnp.float32)
            if ao_scale != 1.0:
                f32 = f32 * jnp.asarray(ao_scale, jnp.float32)
            if ao_offset != 0.0:
                f32 = f32 + jnp.asarray(ao_offset, jnp.float32)
            # jax.image.resize 'linear' uses the same half-pixel
            # (cell-centered) convention as the samplers
            ao_field = jax.image.resize(f32, (X, Y, Z, 4), "linear")
            ao_scale, ao_offset, ao_fd = 1.0, 0.0, 1
    zss = cfg.sweep_z_supersample
    K = Z * zss
    Sn = int(round(W * cfg.sweep_oversample))
    Tn = int(round(H * cfg.sweep_oversample))
    sigma = jnp.where(flip, -1.0, 1.0)
    iso = jnp.asarray(rp.isovalue, jnp.float32)

    def z_c(m):
        zc = (m + 0.5) / zss
        return jnp.where(flip, Z - zc, zc)

    # base plane: entry-side, at least half a voxel in front of the eye
    k_min = 0.5
    z_entry = z_c(jnp.float32(0.0))
    z_b = eye_p[2] + sigma * jnp.maximum(sigma * (z_entry - eye_p[2]), k_min)
    kk = z_b - eye_p[2]

    # image corners -> base-plane bounding box of the intermediate grid
    corners = jnp.asarray([[0.5, 0.5, 1.0], [W - 0.5, 0.5, 1.0],
                           [0.5, H - 0.5, 1.0], [W - 0.5, H - 0.5, 1.0]],
                          jnp.float32)
    d_c = corners @ ray_mat.T
    lam_c = kk / d_c[:, 2]
    s_c = eye_p[0] + d_c[:, 0] * lam_c
    t_c = eye_p[1] + d_c[:, 1] * lam_c
    margin = 2.0
    s_min = jnp.min(s_c) - margin
    s_max = jnp.max(s_c) + margin
    t_min = jnp.min(t_c) - margin
    t_max = jnp.max(t_c) + margin
    ds = (s_max - s_min) / Sn
    dt = (t_max - t_min) / Tn
    s_grid = s_min + (jnp.arange(Sn, dtype=jnp.float32) + 0.5) * ds
    t_grid = t_min + (jnp.arange(Tn, dtype=jnp.float32) + 0.5) * dt

    if packed_axis is not None:
        vmax_z = packed_axis.slice_max         # precomputed at pack time
    else:
        vmax_z = jnp.max(values, axis=(0, 1))  # per-slice max for culling
    # vmax_z is in STORED units (uint8 bytes / quantized floats); the
    # isovalue is physical.  Compare in stored units, otherwise uint8
    # volumes never cull (255 >= iso always) and value-floor quantized
    # volumes can cull slices whose dequantized values DO cross iso.
    iso_stored = ((iso - grid.value_offset) / grid.value_scale
                  if (grid.value_scale != 1.0 or grid.value_offset != 0.0)
                  else iso)

    zero = jnp.zeros((Sn, Tn), jnp.float32)
    inv_zss = 1.0 / zss

    def slice_meta(m):
        zc = z_c(jnp.float32(m))
        lam = (zc - eye_p[2]) / kk
        zf = jnp.clip(jnp.floor(zc - 0.5), 0, Z - 2).astype(jnp.int32)
        fz = jnp.clip(zc - 0.5 - zf, 0.0, 1.0)
        smax = jnp.maximum(vmax_z[zf], vmax_z[zf + 1])
        valid = sigma * (zc - eye_p[2]) > (k_min - 1e-3)
        return zc, lam, zf, fz, smax, valid

    def slice_weights(lam):
        x_pos = eye_p[0] + lam * (s_grid - eye_p[0])
        y_pos = eye_p[1] + lam * (t_grid - eye_p[1])
        return interp_matrix(x_pos, X), interp_matrix(y_pos, Y)

    mm_dtype = jnp.dtype(cfg.sweep_dtype)

    def resample_slice(lam, zf, fz):
        s0 = jax.lax.dynamic_slice_in_dim(values, zf, 1, 2
                                          ).astype(jnp.float32)
        s1 = jax.lax.dynamic_slice_in_dim(values, zf + 1, 1, 2
                                          ).astype(jnp.float32)
        sl = ((1.0 - fz) * s0 + fz * s1)[:, :, 0]
        # affine dequantization of compact-storage volumes (lerp commutes
        # with the affine map, so one scale+offset after the z-lerp)
        if grid.value_scale != 1.0:
            sl = sl * jnp.float32(grid.value_scale)
        if grid.value_offset != 0.0:
            sl = sl + jnp.float32(grid.value_offset)
        wx, wy = slice_weights(lam)
        tmp = jnp.dot(wx.astype(mm_dtype), sl.astype(mm_dtype),
                      preferred_element_type=jnp.float32)
        return jnp.dot(tmp.astype(mm_dtype), wy.T.astype(mm_dtype),
                       preferred_element_type=jnp.float32)

    def resample_ao_slice(lam, zf, fz):
        a0 = jax.lax.dynamic_slice_in_dim(ao_field, zf, 1, 2
                                          ).astype(jnp.float32)
        a1 = jax.lax.dynamic_slice_in_dim(ao_field, zf + 1, 1, 2
                                          ).astype(jnp.float32)
        sl = ((1.0 - fz) * a0 + fz * a1)[:, :, 0, :]       # (X, Y, 4)
        # affine dequant of uint8-quantized AO fields (lerp commutes
        # with the affine map, mirroring the density path above);
        # scale/offset may be per-channel (4,) vectors
        if ao_scale != 1.0:
            sl = sl * jnp.asarray(ao_scale, jnp.float32)
        if ao_offset != 0.0:
            sl = sl + jnp.asarray(ao_offset, jnp.float32)
        wx, wy = slice_weights(lam)
        tmp = jnp.einsum("sx,xyc->syc", wx, sl,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("syc,ty->stc", tmp, wy,
                          preferred_element_type=jnp.float32)

    zero4 = jnp.zeros((Sn, Tn, 4), jnp.float32)

    # Scan-carry budget note: every carried buffer is (Sn, Tn) and crosses
    # the scan boundary K (= Z * zss) times, so the carry size dominates the
    # sweep cost.  Gradients are therefore captured once, at the slice just
    # BEFORE the crossing (one-sided in z) - a <= half-voxel sampling offset
    # on a smooth field, bounded by the normal-parity test against the
    # marcher - instead of the two-plane lerp (which needed 7 more buffers).
    def body(carry, m):
        if use_volume_ao:
            (m_hit, frac, Fm1, g_s, g_t, g_z, sh_hit) = carry
        else:
            (m_hit, frac, Fm1, g_s, g_t, g_z) = carry
        found = m_hit >= 0.0

        zc, lam, zf, fz, smax, valid = slice_meta(m)
        # skip slices that cannot contain the isosurface
        do = valid & (smax >= iso_stored)
        F = jax.lax.cond(do, lambda: resample_slice(lam, zf, fz),
                         lambda: zero)
        F = jnp.where(valid, F, zero)

        crossing = (~found) & (F >= iso) & valid
        denom = jnp.where(jnp.abs(F - Fm1) > 1e-12, F - Fm1, 1e-12)
        new_frac = jnp.clip((iso - Fm1) / denom, 0.0, 1.0)
        m_hit = jnp.where(crossing, jnp.float32(m), m_hit)
        frac = jnp.where(crossing, new_frac, frac)

        def dcen(A, axis):
            return 0.5 * (jnp.roll(A, -1, axis) - jnp.roll(A, 1, axis))

        g_s = jnp.where(crossing, dcen(Fm1, 0), g_s)
        g_t = jnp.where(crossing, dcen(Fm1, 1), g_t)
        g_z = jnp.where(crossing, F - Fm1, g_z)   # one-sided d/dm at m-1/2

        if use_volume_ao:
            # baked SH occlusion sampled like a second density channel;
            # captured at the hit plane (AO is smooth, no sub-step lerp)
            sh = jax.lax.cond(do, lambda: resample_ao_slice(lam, zf, fz),
                              lambda: zero4)
            sh_hit = jnp.where(crossing[..., None], sh, sh_hit)
            return (m_hit, frac, F, g_s, g_t, g_z, sh_hit), None
        return (m_hit, frac, F, g_s, g_t, g_z), None

    # carry buffers cross the scan boundary K times; unrolling keeps them
    # in registers/VMEM between unrolled steps, dividing the HBM carry
    # traffic (the sweep's dominant cost) by the unroll factor
    if cfg.renderer == "sweep_pallas":
        # same march as the scan below, but as one Pallas kernel with the
        # hit state resident in VMEM (render/sweep_pallas.py); baked-AO
        # SH slabs stream through the same kernel when requested
        from isosurfacesuperresolution_tpu.render.sweep_pallas import (
            march_pallas)
        ms = jnp.arange(K, dtype=jnp.float32)
        zcs, lams, zfs, fzs, smaxs, valids = jax.vmap(slice_meta)(ms)
        flags = (valids & (smaxs >= iso_stored)).astype(jnp.float32)
        meta = jnp.stack(
            [zcs, lams, zfs.astype(jnp.float32), fzs, flags,
             jnp.full_like(zcs, iso),
             jnp.full_like(zcs, eye_p[0]),
             jnp.full_like(zcs, eye_p[1])], axis=1)
        tile = cfg.sweep_tile
        use_tiled = tile > 0 or (tile == 0 and max(X, Y) >= 512)
        if packed_axis is not None:
            # sparse storage: the atlas-indirect variant of the tiled
            # kernel; no dense (Z, X, Y) array ever materializes
            from isosurfacesuperresolution_tpu.render.sweep_pallas_tiled \
                import ao_capture_packed, march_pallas_packed
            brick_max_p = jnp.transpose(grid.brick_max, perm)
            m_hit, frac, g_s, g_t, g_z = march_pallas_packed(
                packed_axis, meta, s_grid, t_grid, Sn, Tn, brick_max_p,
                grid.brick_size, iso, dtype=mm_dtype,
                scale=grid.value_scale, offset=grid.value_offset)
            if packed_ao is not None:
                sh = ao_capture_packed(packed_ao, meta, s_grid, t_grid,
                                       Sn, Tn, m_hit, dtype=mm_dtype)
                sh_hit = jnp.transpose(sh, (1, 2, 0))
            else:
                sh_hit = zero4
        elif use_tiled:
            vol_zxy = jnp.transpose(values, (2, 0, 1))
            # large-volume path: occupancy-gated 2D-tiled streaming -
            # DMA and resample FLOPs scale with the occupied fraction
            from isosurfacesuperresolution_tpu.render.sweep_pallas_tiled \
                import ao_capture_tiled, march_pallas_tiled
            brick_max_p = jnp.transpose(grid.brick_max, perm)
            m_hit, frac, g_s, g_t, g_z = march_pallas_tiled(
                vol_zxy, meta, s_grid, t_grid, Sn, Tn, brick_max_p,
                grid.brick_size, iso,
                tile=(tile if tile > 0 else 256),
                dtype=mm_dtype,
                scale=grid.value_scale, offset=grid.value_offset)
            if use_volume_ao:
                # pass-2 AO capture from m_hit: the flat kernel's in-march
                # AO slabs (2, 4, X, Y) exceed VMEM at 1024^3; the tiled
                # capture windows the field at (2, 4, TX, TY), sampling
                # coarse (ao_downsample > 1) fields natively
                ao_zcxy = jnp.transpose(ao_field, (2, 3, 0, 1))
                sh = ao_capture_tiled(ao_zcxy, meta, s_grid, t_grid,
                                      Sn, Tn, m_hit, brick_max_p,
                                      grid.brick_size, iso,
                                      dtype=mm_dtype,
                                      ao_scale=ao_scale,
                                      ao_offset=ao_offset,
                                      field_downsample=ao_fd)
                sh_hit = jnp.transpose(sh, (1, 2, 0))
            else:
                sh_hit = zero4
        else:
            vol_zxy = jnp.transpose(values, (2, 0, 1))
            ao_deq = ao_field
            if use_volume_ao and ao_field.dtype == jnp.uint8:
                # flat (small-volume) kernel has no AO affine plumbing;
                # dequantize up front - fields below the 512^3 tiled
                # threshold are <= 0.5 GB (scale/offset may be
                # per-channel (4,) vectors)
                ao_deq = (ao_field.astype(jnp.float32)
                          * jnp.asarray(ao_scale, jnp.float32)
                          + jnp.asarray(ao_offset, jnp.float32))
            ao_zcxy = (jnp.transpose(ao_deq, (2, 3, 0, 1))
                       if use_volume_ao else None)
            res = march_pallas(
                vol_zxy, meta, s_grid, t_grid, Sn, Tn, dtype=mm_dtype,
                scale=grid.value_scale, offset=grid.value_offset,
                ao_zcxy=ao_zcxy)
            m_hit, frac, g_s, g_t, g_z = res[:5]
            sh_hit = (jnp.transpose(res[5], (1, 2, 0)) if use_volume_ao
                      else zero4)
    else:
        init = (zero - 1.0, zero, zero, zero, zero, zero)
        if use_volume_ao:
            init = init + (zero4,)
        res, _ = jax.lax.scan(body, init, jnp.arange(K), unroll=8)
        (m_hit, frac, _, g_s, g_t, g_z) = res[:6]
        sh_hit = res[6] if use_volume_ao else zero4
    found = m_hit >= 0.0

    # continuous hit position in permuted voxel coords
    m_star = m_hit - 1.0 + frac
    zc_star = z_c(m_star)
    lam_star = (zc_star - eye_p[2]) / kk
    xs = eye_p[0] + lam_star * (s_grid[:, None] - eye_p[0])
    ys = eye_p[1] + lam_star * (t_grid[None, :] - eye_p[1])
    lam_safe = jnp.where(jnp.abs(lam_star) > 1e-6, lam_star, 1e-6)

    # frustum grads -> volume gradient (chain rule through the shear)
    dz_dm = sigma * inv_zss
    Vx = g_s / (lam_safe * ds)
    Vy = g_t / (lam_safe * dt)
    rel_z = zc_star - eye_p[2]
    rel_z = jnp.where(jnp.abs(rel_z) > 1e-6, rel_z, 1e-6)
    Vz = (g_z / dz_dm
          - Vx * (xs - eye_p[0]) / rel_z
          - Vy * (ys - eye_p[1]) / rel_z)

    # un-permute to the original axis order
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
    flat_world = hit_world.reshape(-1, 3)
    flat_normal = normal_w.reshape(-1, 3)

    if use_volume_ao and cfg.ao_samples > 0:
        # baked SH-L1 occlusion captured during the sweep (ao_sweep.py):
        # AO(n) = 1 - mean - (2/3) g . n, evaluated elementwise
        from isosurfacesuperresolution_tpu.render.ao_sweep import ao_from_sh
        ao = ao_from_sh(sh_hit, normal_w).reshape(-1)
    elif cfg.ao_samples > 0:
        # hemisphere-ray gather path (reference-exact; slow on TPU - only
        # for oracle comparisons and tiny offline runs)
        tn_idx = jnp.tile(jnp.arange(Tn, dtype=jnp.int32), Sn)
        sn_idx = jnp.repeat(jnp.arange(Sn, dtype=jnp.int32), Tn)
        pix = jnp.stack([tn_idx, sn_idx], -1)
        dirs = flat_world - cam.eye
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        ao = compute_ao(grid, hit_vox.reshape(-1, 3), flat_normal, dirs,
                        flat_hit, pix, cfg, grid.voxel_size[0],
                        isovalue=rp.isovalue)
    else:
        ao = jnp.ones_like(flat_hit, jnp.float32)

    inter = shade_hits(flat_world, flat_normal, flat_hit, ao,
                       cam, cam_flow, cfg, W, H, rp=rp).reshape(Sn, Tn, 12)

    # homography (u_c, v_c, 1) -> intermediate pixel coordinates
    Hs = kk * ray_mat[0] + eye_p[0] * ray_mat[2]
    Ht = kk * ray_mat[1] + eye_p[1] * ray_mat[2]
    Hw = ray_mat[2]
    Hmat = jnp.stack([(Hs - s_min * Hw) / ds,
                      (Ht - t_min * Hw) / dt,
                      Hw])

    # two-pass warp degenerates when the homography is closer to an axis
    # swap (u driving t rather than s - e.g. side views after the axis
    # permutation): compare the center Jacobian and transpose if needed
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
        lambda: homography_warp(inter, Hmat, (W, H)))    # (W, H, 12)
    out = jnp.transpose(out, (1, 0, 2))                  # (H, W, 12)

    # post-warp fixups: binarize mask, unpremultiply nothing (channels were
    # masked pre-warp; silhouette blending is re-masked here), renormalize
    # normals, restore ao=1 outside
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

    if cfg.viewport is not None:
        x0, y0, x1, y1 = cfg.viewport
        xx = jnp.arange(W)[None, :, None]
        yy = jnp.arange(H)[:, None, None]
        in_vp = ((xx >= x0) & (yy >= y0) & (xx < x1)
                 & (yy < y1)).astype(jnp.float32)
        keep_ao = jnp.where(in_vp > 0, frame[..., 10:11], 1.0)
        frame = jnp.concatenate([frame[..., :10] * in_vp, keep_ao,
                                 frame[..., 11:12]], axis=-1)
    return frame


@partial(jax.jit, static_argnames=("cfg",))
def render_gbuffer_sweep(grid: BrickGrid, cam: CameraParams,
                         cam_flow: CameraParams,
                         cfg: RenderConfig,
                         rp=None) -> jnp.ndarray:
    """Sweep-rendered (H, W, 12) G-buffer; same contract as
    `render_gbuffer`.  Fully jit-compatible (traced cameras): the major-axis
    choice is a 3-way `lax.switch`, the axis flip is traced."""
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
    M = R_wv @ B                                   # world/voxel ray dirs
    eye_vox = grid.world_to_voxel(cam.eye)

    from isosurfacesuperresolution_tpu.volume.packed import SparseBrickGrid
    packed = isinstance(grid, SparseBrickGrid)
    has_baked = (grid.ao_per_axis is not None if packed
                 else grid.ao_sh is not None)
    use_ao_field = (cfg.ao_samples > 0 and has_baked
                    and cfg.ao_mode in ("auto", "volume"))
    if cfg.ao_mode == "volume" and cfg.ao_samples > 0 and not has_baked:
        raise ValueError("ao_mode='volume' needs a baked occlusion field; "
                         "call render.ao_sweep.attach_baked_ao(grid, cfg)"
                         + (" before packing (SparseBrickGrid.from_brick_"
                            "grid packs it per axis)" if packed else ""))

    if packed:
        if cfg.renderer != "sweep_pallas":
            raise ValueError(
                "SparseBrickGrid requires renderer='sweep_pallas' (the "
                "tiled atlas kernel); densify with grid.to_brick_grid() "
                "for the scan/march paths")
        if cfg.ao_samples > 0 and not use_ao_field:
            raise ValueError(
                "hemisphere-ray AO needs dense values; set ao_samples=0, "
                "bake AO before packing (attach_baked_ao + from_brick_"
                "grid), or densify with grid.to_brick_grid()")

    def make_branch(i, perm):
        def branch():
            pidx = jnp.asarray(perm)
            if packed:
                return _sweep_permuted(None, eye_vox[pidx], M[pidx, :],
                                       flip, grid, cam, cam_flow, cfg,
                                       perm, ao_field=None, rp=rp,
                                       packed_axis=grid.per_axis[i],
                                       packed_ao=(grid.ao_per_axis[i]
                                                  if use_ao_field
                                                  else None))
            values = jnp.transpose(grid.values, perm)
            ao_field = (jnp.transpose(grid.ao_sh, perm + (3,))
                        if use_ao_field else None)
            return _sweep_permuted(values, eye_vox[pidx], M[pidx, :], flip,
                                   grid, cam, cam_flow, cfg, perm,
                                   ao_field=ao_field, rp=rp)
        return branch

    return jax.lax.switch(axis,
                          [make_branch(i, p) for i, p in enumerate(_PERMS)])
