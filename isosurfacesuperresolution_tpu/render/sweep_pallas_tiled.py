"""Occupancy-gated tiled Pallas sweep march for large (512^3+) volumes.

The flat kernel (`render/sweep_pallas.py`) streams whole (X, Y) slices:
at 1024^3 that is ~2 GB of bf16 DMA and ~4.3 TFLOP of resample per frame
even when most of the volume is empty.  Real large volumes (Ejecta, RM -
the datasets GVDB exists for, `mainPSNR3_AllStats.py:29-40`) are sparse;
this kernel is the sweep's answer to GVDB's node culling
(`cuda_gvdb_raycast.cuh:504`):

  * the slice plane is cut into a static (NTX, NTY) grid of
    (TX, TY) tiles;
  * per slice, the brick min/max pyramid reduces to a tile-occupancy
    bitmask (in-graph - the isovalue stays a traced runtime knob);
  * occupied (xt, yt) pairs are compacted into per-slice SMEM lists;
    the kernel loops over the list, DMAs ONLY those (2, TX, TY) blocks
    (double-buffered), and accumulates the first resample factor into a
    VMEM row accumulator ``tmp[:, yt*TY:...] += wx_xt @ block``;
  * the second factor runs per occupied COLUMN tile:
    ``F += tmp[:, yt] @ wy[yt].T`` - so both DMA traffic and both
    matmul factors scale with the occupied fraction, not the volume;
  * hit state stays VMEM-resident exactly like the flat kernel.

Per frame at 1024^3 with ~10 % occupancy this is ~0.2 GB DMA + ~0.5
TFLOP instead of 2 GB + 4.3 TFLOP.

Two storage backends share the same kernel body (static ``packed`` flag):

  * **dense** (`march_pallas_tiled`): the (Z, X, Y) array lives whole in
    HBM; the per-pair DMA reads a (2, TX, TY) window of it.
  * **packed** (`march_pallas_packed`): only non-background tiles live in
    HBM, in a flat (N, TX, TY) atlas (`volume/packed.PackedAxisVolume` -
    the GVDB-atlas equivalent); the per-pair DMA reads ``atlas[slot]``
    for the two z planes.  The slot indirection (GVDB's node lookup) is
    resolved OUTSIDE the kernel into two (K, P) int32 tables, windowed
    into SMEM one slice-row at a time - so HBM *storage*, not just
    traffic, scales with occupancy.

Used when ``RenderConfig.renderer == "sweep_pallas"`` and the permuted
slice plane is at least ``_TILE_THRESHOLD`` wide; parity with the flat
kernel is bounded by tests/test_sweep_tiled.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tiled_kernel(*refs,
                  Sn: int, Tn: int, X: int, Y: int,
                  TX: int, TY: int, NTY: int, P: int, mm_dtype,
                  scale: float = 1.0, offset: float = 0.0,
                  packed: bool = False):
    if packed:
        (meta_ref,        # SMEM (1, 1, 8) f32 window (row k)
         count_ref,       # SMEM (K,) i32 occupied-pair count
         pairs_ref,       # SMEM (1, 1, P) i32 window (row k)
         slots0_ref,      # SMEM (1, 1, P) i32 slots of plane zf
         slots1_ref,      # SMEM (1, 1, P) i32 slots of plane zf+1
         ybits_ref,       # SMEM (1, 1, NTY) i32 window (row k)
         vol_hbm,         # ANY (N, TX, TY) packed atlas
         sg_ref, tg_ref,  # VMEM (1, Sn) / (1, Tn)
         mhit_ref, frac_ref, fm1_ref, gs_ref, gt_ref, gz_ref,
         tmp_ref,         # VMEM (Sn, Y) f32 row accumulator
         s0, s1, sems) = refs
    else:
        (meta_ref, count_ref, pairs_ref, ybits_ref,
         vol_hbm,         # ANY (Z, X, Y) dense volume
         sg_ref, tg_ref,
         mhit_ref, frac_ref, fm1_ref, gs_ref, gt_ref, gz_ref,
         tmp_ref, s0, s1, sems) = refs
    k = pl.program_id(0)

    lam = meta_ref[0, 0, 1]
    fz = meta_ref[0, 0, 3]
    do = meta_ref[0, 0, 4] > 0.5
    iso = meta_ref[0, 0, 5]
    eye_s = meta_ref[0, 0, 6]
    eye_t = meta_ref[0, 0, 7]
    n = count_ref[k]

    @pl.when(k == 0)
    def _():
        mhit_ref[:] = jnp.full((Sn, Tn), -1.0, jnp.float32)
        frac_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        fm1_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        gs_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        gt_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        gz_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)

    def dma_descs(i, slot_idx):
        """Copy descriptors for occupied pair i into scratch slot_idx.

        Re-constructed identically at start and wait time (the Pallas
        async-copy contract); slot_idx is static."""
        dst = (s0, s1)[slot_idx]
        if packed:
            return [
                pltpu.make_async_copy(
                    vol_hbm.at[pl.ds(slots0_ref[0, 0, i], 1)],
                    dst.at[pl.ds(0, 1)], sems.at[slot_idx, 0]),
                pltpu.make_async_copy(
                    vol_hbm.at[pl.ds(slots1_ref[0, 0, i], 1)],
                    dst.at[pl.ds(1, 1)], sems.at[slot_idx, 1]),
            ]
        pid = pairs_ref[0, 0, i]
        xt = pid // NTY
        yt = pid - xt * NTY
        zfi = meta_ref[0, 0, 2].astype(jnp.int32)
        return [pltpu.make_async_copy(
            vol_hbm.at[pl.ds(zfi, 2), pl.ds(xt * TX, TX),
                       pl.ds(yt * TY, TY)],
            dst, sems.at[slot_idx])]

    def dma_start(i, slot_idx):
        for d in dma_descs(i, slot_idx):
            d.start()

    def dma_wait(i, slot_idx):
        for d in dma_descs(i, slot_idx):
            d.wait()

    @pl.when(do & (n > 0))
    def _():
        # zero the accumulator only under occupied column tiles
        for yt in range(NTY):
            @pl.when(ybits_ref[0, 0, yt] > 0)
            def _(yt=yt):
                tmp_ref[:, yt * TY:(yt + 1) * TY] = jnp.zeros(
                    (Sn, TY), jnp.float32)

        dma_start(0, 0)

        def body(i, carry):
            @pl.when(i + 1 < n)
            def _():
                jax.lax.cond((i + 1) % 2 == 0,
                             lambda: dma_start(i + 1, 0),
                             lambda: dma_start(i + 1, 1))

            def accum(slot_idx):
                slot = (s0, s1)[slot_idx]
                # wait on the exact descriptors started for pair i
                dma_wait(i, slot_idx)
                pid = pairs_ref[0, 0, i]
                xt = pid // NTY
                yt = pid - xt * NTY
                def to_f32(x):
                    # Mosaic has no direct uint8->f32 convert; hop
                    # through int32 for integer-stored volumes
                    if jnp.issubdtype(x.dtype, jnp.integer):
                        x = x.astype(jnp.int32)
                    return x.astype(jnp.float32)

                sl = ((1.0 - fz) * to_f32(slot[0])
                      + fz * to_f32(slot[1]))               # (TX, TY)
                if scale != 1.0:
                    sl = sl * jnp.float32(scale)
                if offset != 0.0:
                    sl = sl + jnp.float32(offset)
                # wx columns for this x-tile, built in-register
                s_pos = eye_s + lam * (sg_ref[0, :] - eye_s)     # (Sn,)
                jx = (jax.lax.broadcasted_iota(jnp.int32, (Sn, TX), 1)
                      .astype(jnp.float32) + jnp.float32(0.5)
                      + (xt * TX).astype(jnp.float32))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(s_pos[:, None] - jx))
                part = jnp.dot(wx.astype(mm_dtype), sl.astype(mm_dtype),
                               preferred_element_type=jnp.float32)
                cur = tmp_ref[:, pl.ds(yt * TY, TY)]
                tmp_ref[:, pl.ds(yt * TY, TY)] = cur + part

            jax.lax.cond(i % 2 == 0, lambda: accum(0), lambda: accum(1))
            return carry

        jax.lax.fori_loop(0, n, body, 0)

        # second factor: per occupied column tile
        t_pos = eye_t + lam * (tg_ref[0, :] - eye_t)             # (Tn,)
        F = jnp.zeros((Sn, Tn), jnp.float32)
        for yt in range(NTY):
            jy = (jax.lax.broadcasted_iota(jnp.int32, (Tn, TY), 1)
                  .astype(jnp.float32) + 0.5 + yt * TY)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(t_pos[:, None] - jy))
            F = jax.lax.cond(
                ybits_ref[0, 0, yt] > 0,
                lambda F=F, yt=yt, wy=wy: F + jnp.dot(
                    tmp_ref[:, yt * TY:(yt + 1) * TY].astype(mm_dtype),
                    wy.T.astype(mm_dtype),
                    preferred_element_type=jnp.float32),
                lambda F=F: F)

        Fm1 = fm1_ref[:]
        found = mhit_ref[:] >= 0.0
        crossing = (~found) & (F >= iso)
        denom = jnp.where(jnp.abs(F - Fm1) > 1e-12, F - Fm1, 1e-12)
        new_frac = jnp.clip((iso - Fm1) / denom, 0.0, 1.0)
        mhit_ref[:] = jnp.where(crossing, jnp.float32(k), mhit_ref[:])
        frac_ref[:] = jnp.where(crossing, new_frac, frac_ref[:])

        def dcen(A, axis):
            return 0.5 * (pltpu.roll(A, Sn - 1 if axis == 0 else Tn - 1,
                                     axis)
                          - pltpu.roll(A, 1, axis))

        gs_ref[:] = jnp.where(crossing, dcen(Fm1, 0), gs_ref[:])
        gt_ref[:] = jnp.where(crossing, dcen(Fm1, 1), gt_ref[:])
        gz_ref[:] = jnp.where(crossing, F - Fm1, gz_ref[:])
        fm1_ref[:] = F

    @pl.when(~(do & (n > 0)))
    def _():
        fm1_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)


def _tile_occupancy(brick_max: jnp.ndarray, brick_size: int,
                    zfs: jnp.ndarray, iso, X: int, Y: int,
                    TX: int, TY: int):
    """(K, NTX*NTY) occupancy bits from the brick pyramid.

    brick_max is in the PERMUTED axis order (bx, by, bz); ``zfs`` are the
    K per-slice floor z indices.  A tile is occupied for a slice when any
    brick intersecting (x-tile, y-tile, {zf, zf+1}) reaches the isovalue.
    """
    b = brick_size
    NTX, NTY = X // TX, Y // TY
    bx, by, bz = brick_max.shape

    def tile_mask(nt: int, tsize: int, nb: int) -> np.ndarray:
        """(nt, nb) indicator: brick i touches tile t (conservative for
        bricks straddling tile boundaries)."""
        starts = np.arange(nb) * b
        ends = starts + b
        t0 = np.arange(nt) * tsize
        t1 = t0 + tsize
        return (starts[None, :] < t1[:, None]) & (ends[None, :] > t0[:, None])

    mx = jnp.asarray(tile_mask(NTX, TX, bx))
    my = jnp.asarray(tile_mask(NTY, TY, by))
    neg = jnp.float32(-np.inf)
    # (NTX, by, bz) then (NTX, NTY, bz)
    tx = jnp.max(jnp.where(mx[:, :, None, None], brick_max[None], neg),
                 axis=1)
    tile_max = jnp.max(jnp.where(my[None, :, :, None], tx[:, None], neg),
                       axis=2)                      # (NTX, NTY, bz)

    zb0 = jnp.clip(zfs // b, 0, bz - 1)
    zb1 = jnp.clip((zfs + 1) // b, 0, bz - 1)
    tm = jnp.maximum(tile_max[:, :, zb0], tile_max[:, :, zb1])  # (NTX,NTY,K)
    occ = (tm >= iso).transpose(2, 0, 1)            # (K, NTX, NTY)
    return occ


def _pair_lists(occ: jnp.ndarray, meta: jnp.ndarray, K: int, P: int):
    """Compact per-slice occupied-pair id lists + counts + column bits."""
    occ = occ & (meta[:, 4:5, None] > 0.5)          # invalid slices: empty
    occ_flat = occ.reshape(K, P)
    counts = jnp.sum(occ_flat, axis=1).astype(jnp.int32)
    # occupied pair ids first (order within the slice is irrelevant)
    order = jnp.argsort(~occ_flat, axis=1, stable=True)
    pairs = order.astype(jnp.int32)
    ybits = jnp.any(occ, axis=1).astype(jnp.int32)  # (K, NTY)
    return pairs, counts, ybits


def march_pallas_tiled(vol_zxy: jnp.ndarray,      # (Z, X, Y) slice-major
                      meta: jnp.ndarray,          # (K, 8) f32
                      s_grid: jnp.ndarray, t_grid: jnp.ndarray,
                      Sn: int, Tn: int,
                      brick_max_p: jnp.ndarray,   # permuted (bx, by, bz)
                      brick_size: int,
                      iso,
                      tile: int = 256,
                      interpret: "bool | None" = None,
                      dtype=jnp.bfloat16,
                      scale: float = 1.0, offset: float = 0.0):
    """Occupancy-gated tiled march; same contract as
    `sweep_pallas.march_pallas` (no AO variant - large-volume AO uses the
    ray-sampled oracle offline)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = jnp.dtype(dtype)
    store_dtype = (jnp.uint8 if vol_zxy.dtype == jnp.uint8 else dtype)
    Z, X, Y = vol_zxy.shape
    K = meta.shape[0]

    def _pick(extent: int) -> int:
        # largest divisor of the axis extent not exceeding `tile`
        # (must match volume/packed.pick_tile)
        for cand in range(min(tile, extent), 0, -1):
            if extent % cand == 0:
                return cand
        return extent
    TX, TY = _pick(X), _pick(Y)
    NTX, NTY = X // TX, Y // TY
    P = NTX * NTY

    zfs = meta[:, 2].astype(jnp.int32)
    occ = _tile_occupancy(brick_max_p, brick_size, zfs, iso, X, Y, TX,
                          TY)                       # (K, NTX, NTY)
    pairs, counts, ybits = _pair_lists(occ, meta, K, P)

    outs = pl.pallas_call(
        functools.partial(_tiled_kernel, Sn=Sn, Tn=Tn, X=X, Y=Y,
                          TX=TX, TY=TY, NTY=NTY, P=P, mm_dtype=dtype,
                          scale=scale, offset=offset, packed=False),
        grid=(K,),
        in_specs=[
            # (1, .) SMEM windows: a full (K, .) SMEM residency pads
            # every row to 128 lanes (512 B) and overflows the 1 MB
            # SMEM at K~1024 (512^3); only row k is ever read
            pl.BlockSpec((1, 1, 8), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # meta row k
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts (1-D, small)
            pl.BlockSpec((1, 1, P), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # pairs row k
            pl.BlockSpec((1, 1, NTY), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # ybits row k
            pl.BlockSpec(memory_space=pl.ANY),    # volume
            pl.BlockSpec((1, Sn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((Sn, Tn), lambda k: (0, 0),
                                memory_space=pltpu.VMEM)] * 6,
        out_shape=[jax.ShapeDtypeStruct((Sn, Tn), jnp.float32)] * 6,
        scratch_shapes=[
            pltpu.VMEM((Sn, Y), jnp.float32),        # tmp accumulator
            pltpu.VMEM((2, TX, TY), store_dtype),
            pltpu.VMEM((2, TX, TY), store_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(meta[:, None], counts, pairs[:, None], ybits[:, None],
      vol_zxy.astype(store_dtype),
      s_grid[None], t_grid[None])
    m_hit, frac, _, g_s, g_t, g_z = outs
    return m_hit, frac, g_s, g_t, g_z


def _ao_capture_kernel(*refs,
                       Sn: int, Tn: int,
                       TX: int, TY: int, NTY: int, P: int, mm_dtype,
                       packed: bool = False,
                       ao_scale=1.0, ao_offset=0.0,
                       quantized: bool = False,
                       inv_f: float = 1.0):
    """Pass-2 baked-AO capture at the hit plane (tiled).

    Runs AFTER the density march with ``m_hit`` as an input: for slice k,
    the crossing set is simply ``m_hit == k`` (pass 1 stored the slice
    index), so capture needs no ordering state - only the slices that
    contain hits get any DMA or matmul work, and only tiles near the
    surface are touched.  The second resample factor runs per PAIR (not
    per column tile): hit slices are few, so the extra (Sn,TY)x(TY,Tn)
    matmuls cost less than a (4, Sn, Y) row accumulator's VMEM.

    ``inv_f`` < 1 samples a COARSE field (stored at 1/f resolution per
    axis): with both conventions cell-centered, the fine sample position
    p maps to coarse interpolation coordinate p * inv_f exactly (coarse
    voxel j's center sits at fine (j + 0.5) * f), so the only kernel
    change is this one scale on the hit positions; the caller rewrites
    the meta z columns the same way.  ``ao_scale``/``ao_offset`` may be
    scalars or per-channel 4-tuples (compile-time constants either way).
    """
    if packed:
        (meta_ref, count_ref, pairs_ref,
         slots0_ref, slots1_ref,          # SMEM (1, 1, P) int32 windows
         ao_hbm,                          # ANY (N, 4, TX, TY) packed atlas
         mhit_ref,                        # VMEM (Sn, Tn) pass-1 hit slice
         sg_ref, tg_ref,
         sh_ref,                          # VMEM out (4, Sn, Tn)
         a0, a1, sems) = refs
    else:
        (meta_ref, count_ref, pairs_ref,
         ao_hbm,                          # ANY (Z, 4, X, Y) dense field
         mhit_ref, sg_ref, tg_ref, sh_ref,
         a0, a1, sems) = refs
    k = pl.program_id(0)

    lam = meta_ref[0, 0, 1]
    fz = meta_ref[0, 0, 3]
    eye_s = meta_ref[0, 0, 6]
    eye_t = meta_ref[0, 0, 7]
    n = count_ref[k]

    @pl.when(k == 0)
    def _():
        sh_ref[:] = jnp.zeros((4, Sn, Tn), jnp.float32)

    def dma_descs(i, slot_idx):
        dst = (a0, a1)[slot_idx]
        if packed:
            return [
                pltpu.make_async_copy(
                    ao_hbm.at[pl.ds(slots0_ref[0, 0, i], 1)],
                    dst.at[pl.ds(0, 1)], sems.at[slot_idx, 0]),
                pltpu.make_async_copy(
                    ao_hbm.at[pl.ds(slots1_ref[0, 0, i], 1)],
                    dst.at[pl.ds(1, 1)], sems.at[slot_idx, 1]),
            ]
        pid = pairs_ref[0, 0, i]
        xt = pid // NTY
        yt = pid - xt * NTY
        zfi = meta_ref[0, 0, 2].astype(jnp.int32)
        return [pltpu.make_async_copy(
            ao_hbm.at[pl.ds(zfi, 2), pl.ds(0, 4), pl.ds(xt * TX, TX),
                      pl.ds(yt * TY, TY)],
            dst, sems.at[slot_idx])]

    def dma_start(i, slot_idx):
        for d in dma_descs(i, slot_idx):
            d.start()

    def dma_wait(i, slot_idx):
        for d in dma_descs(i, slot_idx):
            d.wait()

    @pl.when(n > 0)
    def _():
        # pass-1 stored the crossing slice index as float32(k)
        cross = mhit_ref[:] == jnp.float32(k)      # (Sn, Tn)
        dma_start(0, 0)

        def body(i, carry):
            @pl.when(i + 1 < n)
            def _():
                jax.lax.cond((i + 1) % 2 == 0,
                             lambda: dma_start(i + 1, 0),
                             lambda: dma_start(i + 1, 1))

            def accum(slot_idx):
                slot = (a0, a1)[slot_idx]
                dma_wait(i, slot_idx)
                pid = pairs_ref[0, 0, i]
                xt = pid // NTY
                yt = pid - xt * NTY

                def to_f32(s):
                    # Mosaic has no direct uint8->f32 convert (same
                    # blocker as the density kernels): hop through int32
                    if quantized:
                        return s.astype(jnp.int32).astype(jnp.float32)
                    return s.astype(jnp.float32)

                asl = ((1.0 - fz) * to_f32(slot[0])
                       + fz * to_f32(slot[1]))              # (4, TX, TY)
                s_pos = (eye_s + lam * (sg_ref[0, :] - eye_s)) \
                    * jnp.float32(inv_f)
                t_pos = (eye_t + lam * (tg_ref[0, :] - eye_t)) \
                    * jnp.float32(inv_f)
                jx = (jax.lax.broadcasted_iota(jnp.int32, (Sn, TX), 1)
                      .astype(jnp.float32) + jnp.float32(0.5)
                      + (xt * TX).astype(jnp.float32))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(s_pos[:, None] - jx))
                jy = (jax.lax.broadcasted_iota(jnp.int32, (Tn, TY), 1)
                      .astype(jnp.float32) + jnp.float32(0.5)
                      + (yt * TY).astype(jnp.float32))
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(t_pos[:, None] - jy))
                scales = (ao_scale if isinstance(ao_scale, tuple)
                          else (ao_scale,) * 4)
                offs = (ao_offset if isinstance(ao_offset, tuple)
                        else (ao_offset,) * 4)
                for c in range(4):
                    a_c = asl[c]
                    if scales[c] != 1.0:
                        a_c = a_c * jnp.float32(scales[c])
                    if offs[c] != 0.0:
                        a_c = a_c + jnp.float32(offs[c])
                    tc = jnp.dot(wx.astype(mm_dtype),
                                 a_c.astype(mm_dtype),
                                 preferred_element_type=jnp.float32)
                    Fc = jnp.dot(tc.astype(mm_dtype),
                                 wy.T.astype(mm_dtype),
                                 preferred_element_type=jnp.float32)
                    sh_ref[c] = sh_ref[c] + jnp.where(cross, Fc, 0.0)

            jax.lax.cond(i % 2 == 0, lambda: accum(0), lambda: accum(1))
            return carry

        jax.lax.fori_loop(0, n, body, 0)


def _dilate_tiles(occ: jnp.ndarray) -> jnp.ndarray:
    """3x3 tile-space dilation of a (K, NTX, NTY) occupancy mask.

    A crossing pixel's 2-tap footprint can straddle one voxel into a
    density-empty neighbor tile whose baked-AO VALUE is still nonzero
    (occlusion extends ~radius into empty space); one tile of dilation is
    conservative for any tile size >= 1 voxel."""
    K, NTX, NTY = occ.shape
    p = jnp.pad(occ, ((0, 0), (1, 1), (1, 1)))
    out = jnp.zeros_like(occ)
    for dx in range(3):
        for dy in range(3):
            out = out | p[:, dx:dx + NTX, dy:dy + NTY]
    return out


def _slice_has_hit(m_hit: jnp.ndarray, K: int) -> jnp.ndarray:
    """(K,) bool: does any pixel's pass-1 hit land on slice k.

    Chunked broadcast-compare scan, NOT a scatter-max: XLA TPU lowers a
    per-pixel scatter into a small (K,) array at ~2M rows/s, which is
    ~100 ms at the 480x270-oversampled operating point; the (C, K)
    compare-and-any scan below is pure VPU work at C*K VMEM."""
    found = m_hit >= 0.0
    ki = jnp.where(found,
                   jnp.clip(m_hit.astype(jnp.int32), 0, K - 1),
                   -1).reshape(-1)
    C = 2048
    pad = (-ki.shape[0]) % C
    chunks = jnp.pad(ki, (0, pad), constant_values=-1).reshape(-1, C)
    ks = jnp.arange(K, dtype=jnp.int32)

    def body(acc, chunk):
        return acc | jnp.any(chunk[:, None] == ks[None, :], axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros((K,), jnp.bool_), chunks)
    return acc


def ao_capture_tiled(ao_zcxy: jnp.ndarray,        # (Z, 4, X, Y) baked SH
                     meta: jnp.ndarray,           # (K, 8) f32 (pass-1 meta)
                     s_grid: jnp.ndarray, t_grid: jnp.ndarray,
                     Sn: int, Tn: int,
                     m_hit: jnp.ndarray,          # (Sn, Tn) pass-1 output
                     brick_max_p: jnp.ndarray,
                     brick_size: int,
                     iso,
                     tile: int = 128,
                     interpret: "bool | None" = None,
                     dtype=jnp.bfloat16,
                     ao_scale=1.0, ao_offset=0.0,
                     field_downsample: int = 1):
    """Occupancy-gated tiled AO capture; returns sh (4, Sn, Tn) f32.

    Equivalent to the flat kernel's in-march AO path
    (`sweep_pallas._march_kernel` has_ao) but as a second pass windowing
    the dense (Z, 4, X, Y) field - DMA and matmuls run only for slices
    that contain hits and tiles near the surface, and the VMEM footprint
    is two (2, 4, TX, TY) buffers instead of two full (2, 4, X, Y) slabs
    (which exceed VMEM at 1024^3).

    ``field_downsample`` f > 1: ``ao_zcxy`` is the COARSE
    (Z/f, 4, X/f, Y/f) field straight from the half-res bake (occlusion
    is band-limited; the host upsample added no information).  The meta
    z columns are rewritten to coarse slab indices here and the kernel
    scales hit positions by 1/f; each coarse tile covers f x f fine
    tiles, so the surface band crosses ~1/f^2 the pairs per slice and
    every DMA slab is 1/f^2 the bytes - the pass-2 cost that kept
    1024^3+AO below the 30 FPS bar (r4_perf_ao1024c.log)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = jnp.dtype(dtype)
    fd = int(field_downsample)
    Z2, C, X2, Y2 = ao_zcxy.shape      # field dims (coarse when fd > 1)
    K = meta.shape[0]

    def _pick(extent: int) -> int:
        for cand in range(min(tile, extent), 0, -1):
            if extent % cand == 0:
                return cand
        return extent
    TX, TY = _pick(X2), _pick(Y2)
    NTX, NTY = X2 // TX, Y2 // TY
    P = NTX * NTY

    # occupancy runs in FINE voxel space (the brick pyramid's space)
    # against the fine footprint of each coarse tile
    zfs = meta[:, 2].astype(jnp.int32)
    occ = _tile_occupancy(brick_max_p, brick_size, zfs, iso,
                          X2 * fd, Y2 * fd, TX * fd, TY * fd)
    occ = _dilate_tiles(occ) & _slice_has_hit(m_hit, K)[:, None, None]
    if fd > 1:
        # rewrite meta z to coarse slab index + lerp weight: fine
        # cell-centered coordinate zc maps to coarse coordinate zc/f
        # (coarse voxel j's center sits at fine (j + 0.5) * f)
        zc2 = meta[:, 0] / fd
        zf2 = jnp.clip(jnp.floor(zc2 - 0.5), 0, Z2 - 2)
        fz2 = jnp.clip(zc2 - 0.5 - zf2, 0.0, 1.0)
        meta = meta.at[:, 2].set(zf2).at[:, 3].set(fz2)
    pairs, counts, ybits = _pair_lists(occ, meta, K, P)
    del ybits  # second factor runs per pair; no column-tile loop

    quantized = ao_zcxy.dtype == jnp.uint8
    # uint8 fields stay uint8 end-to-end (HBM + DMA slabs); casting the
    # whole field to bf16 here is what doubled HBM at 1024^3
    slab_dtype = ao_zcxy.dtype if quantized else dtype
    field = ao_zcxy if quantized else ao_zcxy.astype(dtype)
    sh = pl.pallas_call(
        functools.partial(_ao_capture_kernel, Sn=Sn, Tn=Tn,
                          TX=TX, TY=TY, NTY=NTY, P=P, mm_dtype=dtype,
                          packed=False, ao_scale=ao_scale,
                          ao_offset=ao_offset, quantized=quantized,
                          inv_f=1.0 / fd),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # meta row k
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts
            pl.BlockSpec((1, 1, P), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # pairs row k
            pl.BlockSpec(memory_space=pl.ANY),       # AO field
            pl.BlockSpec((Sn, Tn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),   # m_hit
            pl.BlockSpec((1, Sn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, Sn, Tn), lambda k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, Sn, Tn), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 4, TX, TY), slab_dtype),
            pltpu.VMEM((2, 4, TX, TY), slab_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(meta[:, None], counts, pairs[:, None], field, m_hit,
      s_grid[None], t_grid[None])
    return sh


def ao_capture_packed(packed_ao,                  # PackedAOAxisVolume
                      meta: jnp.ndarray,
                      s_grid: jnp.ndarray, t_grid: jnp.ndarray,
                      Sn: int, Tn: int,
                      m_hit: jnp.ndarray,
                      interpret: "bool | None" = None,
                      dtype=jnp.bfloat16):
    """Sparse-atlas AO capture; returns sh (4, Sn, Tn) f32.

    Same kernel body as `ao_capture_tiled` with the per-pair DMA reading
    ``atlas[slot]`` planes; tile occupancy comes straight from the AO
    slot table (nonzero slot = tile stores a non-background SH block), so
    no dilation step is needed - the atlas was packed with the field's
    own support."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = jnp.dtype(dtype)
    atlas = packed_ao.atlas
    Z, X, Y = packed_ao.shape
    TX, TY = packed_ao.tile_shape
    NTX, NTY = X // TX, Y // TY
    P = NTX * NTY
    K = meta.shape[0]

    zfs = meta[:, 2].astype(jnp.int32)
    z0 = jnp.clip(zfs, 0, Z - 1)
    z1 = jnp.clip(zfs + 1, 0, Z - 1)
    occ = ((packed_ao.slots[z0] > 0) | (packed_ao.slots[z1] > 0))
    occ = occ & _slice_has_hit(m_hit, K)[:, None, None]
    pairs, counts, _ = _pair_lists(occ, meta, K, P)

    xt = pairs // NTY
    yt = pairs - xt * NTY
    slots0 = packed_ao.slots[z0[:, None], xt, yt].astype(jnp.int32)
    slots1 = packed_ao.slots[z1[:, None], xt, yt].astype(jnp.int32)

    sh = pl.pallas_call(
        functools.partial(_ao_capture_kernel, Sn=Sn, Tn=Tn,
                          TX=TX, TY=TY, NTY=NTY, P=P, mm_dtype=dtype,
                          packed=True),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # meta row k
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts
            pl.BlockSpec((1, 1, P), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # pairs row k
            pl.BlockSpec((1, 1, P), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # slots0 row k
            pl.BlockSpec((1, 1, P), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # slots1 row k
            pl.BlockSpec(memory_space=pl.ANY),       # packed AO atlas
            pl.BlockSpec((Sn, Tn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),   # m_hit
            pl.BlockSpec((1, Sn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, Sn, Tn), lambda k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, Sn, Tn), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 4, TX, TY), dtype),
            pltpu.VMEM((2, 4, TX, TY), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(meta[:, None], counts, pairs[:, None], slots0[:, None],
      slots1[:, None], atlas.astype(dtype), m_hit,
      s_grid[None], t_grid[None])
    return sh


def march_pallas_packed(packed_axis,               # volume/packed axis data
                        meta: jnp.ndarray,          # (K, 8) f32
                        s_grid: jnp.ndarray, t_grid: jnp.ndarray,
                        Sn: int, Tn: int,
                        brick_max_p: jnp.ndarray,   # permuted (bx, by, bz)
                        brick_size: int,
                        iso,
                        interpret: "bool | None" = None,
                        dtype=jnp.bfloat16,
                        scale: float = 1.0, offset: float = 0.0):
    """Sparse-storage tiled march over a `volume/packed.PackedAxisVolume`.

    Same contract and kernel body as `march_pallas_tiled`; the per-pair
    DMA reads the two z planes from the packed atlas via SMEM slot rows
    instead of windowing a dense array (GVDB-atlas parity: only occupied
    tiles exist in HBM, `Vdb2Vbx.cpp:70-324`)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = jnp.dtype(dtype)
    atlas = packed_axis.atlas
    store_dtype = (jnp.uint8 if atlas.dtype == jnp.uint8 else dtype)
    Z, X, Y = packed_axis.shape
    TX, TY = packed_axis.tile_shape
    NTX, NTY = X // TX, Y // TY
    P = NTX * NTY
    K = meta.shape[0]

    zfs = meta[:, 2].astype(jnp.int32)
    occ = _tile_occupancy(brick_max_p, brick_size, zfs, iso, X, Y, TX,
                          TY)                       # (K, NTX, NTY)
    pairs, counts, ybits = _pair_lists(occ, meta, K, P)

    # resolve the atlas indirection in-graph: slot of each pair's tile at
    # the two blend planes (zf is pre-clipped to [0, Z-2] by slice_meta)
    xt = pairs // NTY
    yt = pairs - xt * NTY
    z0 = jnp.clip(zfs, 0, Z - 1)[:, None]
    z1 = jnp.clip(zfs + 1, 0, Z - 1)[:, None]
    slots0 = packed_axis.slots[z0, xt, yt].astype(jnp.int32)   # (K, P)
    slots1 = packed_axis.slots[z1, xt, yt].astype(jnp.int32)

    outs = pl.pallas_call(
        functools.partial(_tiled_kernel, Sn=Sn, Tn=Tn, X=X, Y=Y,
                          TX=TX, TY=TY, NTY=NTY, P=P, mm_dtype=dtype,
                          scale=scale, offset=offset, packed=True),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # meta row k
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts
            pl.BlockSpec((1, 1, P), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # pairs row k
            pl.BlockSpec((1, 1, P), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # slots0 row k
            pl.BlockSpec((1, 1, P), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # slots1 row k
            pl.BlockSpec((1, 1, NTY), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),   # ybits row k
            pl.BlockSpec(memory_space=pl.ANY),    # packed atlas
            pl.BlockSpec((1, Sn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tn), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((Sn, Tn), lambda k: (0, 0),
                                memory_space=pltpu.VMEM)] * 6,
        out_shape=[jax.ShapeDtypeStruct((Sn, Tn), jnp.float32)] * 6,
        scratch_shapes=[
            pltpu.VMEM((Sn, Y), jnp.float32),        # tmp accumulator
            pltpu.VMEM((2, TX, TY), store_dtype),
            pltpu.VMEM((2, TX, TY), store_dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(meta[:, None], counts, pairs[:, None], slots0[:, None],
      slots1[:, None], ybits[:, None],
      atlas.astype(store_dtype), s_grid[None], t_grid[None])
    m_hit, frac, _, g_s, g_t, g_z = outs
    return m_hit, frac, g_s, g_t, g_z
