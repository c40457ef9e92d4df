"""Pallas sweep march: the slice scan with VMEM-resident hit state.

The XLA sweep (`render/sweep.py`) carries six image-sized hit-state
buffers through a 512-step `lax.scan`; even unrolled, the carry crosses
HBM and the per-slice resample matmuls launch individually (~6.7 ms
in-context for the 480x270 frame).  This kernel runs the whole march as
ONE `pallas_call` with a sequential grid over slice planes:

  * hit state (m_hit, frac, Fm1, g_s, g_t, g_z) lives in VMEM scratch for
    the entire march - zero HBM traffic for the carry;
  * each grid step DMAs one (X, Y) volume slice (bf16, ~128 KB); slices
    are stored slice-major (Z, X, Y) so the copy is a contiguous band;
  * the interpolation matrices are built in-register from iota each step;
  * per-slice metadata (z centers, lerp offsets, culling max, validity)
    is precomputed outside and indexed by `program_id`;
  * empty slices (`smax < iso`) skip the resample matmuls and the hit
    update (`pl.when` - the GVDB node-culling analogue); the slice DMA
    itself still runs every step to keep the double-buffer/semaphore
    bookkeeping uniform, so culling saves compute, not bandwidth;
  * with a baked SH occlusion field (`render/ao_sweep.py`), the (Z,4,X,Y)
    SH slabs stream through their own double buffer and the 4-channel
    resample runs ONLY on slices where some ray crosses the isosurface
    (`pl.when(any(crossing))` - AO capture at the hit plane, parity with
    the scan path's `resample_ao_slice` gating).

Geometry, refinement and gradient capture are bit-compatible with
`sweep._sweep_permuted` (same formulas); the final shading/homography
stay in XLA.  Used when ``RenderConfig.renderer == "sweep_pallas"``;
parity bounded by tests/test_sweep_pallas.py in interpret mode.
"""

from __future__ import annotations

import functools
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _march_kernel(*refs, Sn: int, Tn: int, X: int, Y: int, mm_dtype,
                  scale: float = 1.0, offset: float = 0.0,
                  has_ao: bool = False):
    if has_ao:
        (meta_ref, vol_hbm, ao_hbm, sg_ref, tg_ref,
         mhit_ref, frac_ref, fm1_ref, gs_ref, gt_ref, gz_ref, sh_ref,
         s0, s1, sems, a0, a1, ao_sems) = refs
    else:
        (meta_ref, vol_hbm, sg_ref, tg_ref,
         mhit_ref, frac_ref, fm1_ref, gs_ref, gt_ref, gz_ref,
         s0, s1, sems) = refs
        ao_hbm = sh_ref = a0 = a1 = ao_sems = None

    k = pl.program_id(0)
    K = pl.num_programs(0)

    # metadata layout: 0 zc, 1 lam, 2 zf, 3 fz, 4 do-flag (valid and
    # smax >= iso), 5 iso, 6 eye_s, 7 eye_t
    do = meta_ref[k, 4] > 0.5
    lam = meta_ref[k, 1]
    fz = meta_ref[k, 3]
    iso = meta_ref[k, 5]
    eye_s = meta_ref[k, 6]
    eye_t = meta_ref[k, 7]

    @pl.when(k == 0)
    def _():
        mhit_ref[:] = jnp.full((Sn, Tn), -1.0, jnp.float32)
        frac_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        fm1_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        gs_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        gt_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        gz_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)
        if has_ao:
            sh_ref[:] = jnp.zeros((4, Sn, Tn), jnp.float32)

    # double-buffered DMA of the two z-lerp slices as one (2, X, Y) band;
    # started for slice k at step k-1 (and at k for k == 0)
    def dma_for(step, slot_idx):
        zfi = meta_ref[step, 2].astype(jnp.int32)
        return pltpu.make_async_copy(
            vol_hbm.at[pl.ds(zfi, 2)], (s0, s1)[slot_idx],
            sems.at[slot_idx])

    def ao_dma_for(step, slot_idx):
        zfi = meta_ref[step, 2].astype(jnp.int32)
        return pltpu.make_async_copy(
            ao_hbm.at[pl.ds(zfi, 2)], (a0, a1)[slot_idx],
            ao_sems.at[slot_idx])

    @pl.when(k == 0)
    def _():
        dma_for(0, 0).start()
        if has_ao:
            ao_dma_for(0, 0).start()

    for parity in (0, 1):
        @pl.when((k + 1 < K) & ((k + 1) % 2 == parity))
        def _(parity=parity):
            dma_for(k + 1, parity).start()
            if has_ao:
                ao_dma_for(k + 1, parity).start()

    for parity in (0, 1):
        @pl.when(k % 2 == parity)
        def _(parity=parity):
            dma_for(k, parity).wait()
            if has_ao:
                ao_dma_for(k, parity).wait()

    def update(slot, aslot):
        def to_f32(x):
            # Mosaic has no direct uint8->f32 convert; hop through int32
            # for integer-stored volumes
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x.astype(jnp.int32)
            return x.astype(jnp.float32)

        sl = (1.0 - fz) * to_f32(slot[0]) + fz * to_f32(slot[1])  # (X, Y)
        # affine dequant of compact-storage (bf16/uint8) volumes
        if scale != 1.0:
            sl = sl * jnp.float32(scale)
        if offset != 0.0:
            sl = sl + jnp.float32(offset)
        # 2-tap interpolation weights built in-register
        s_pos = eye_s + lam * (sg_ref[0, :] - eye_s)        # (Sn,)
        t_pos = eye_t + lam * (tg_ref[0, :] - eye_t)        # (Tn,)
        jx = jax.lax.broadcasted_iota(jnp.int32, (Sn, X), 1
                                      ).astype(jnp.float32) + 0.5
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(s_pos[:, None] - jx))
        jy = jax.lax.broadcasted_iota(jnp.int32, (Tn, Y), 1
                                      ).astype(jnp.float32) + 0.5
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(t_pos[:, None] - jy))
        tmp = jnp.dot(wx.astype(mm_dtype), sl.astype(mm_dtype),
                      preferred_element_type=jnp.float32)
        F = jnp.dot(tmp.astype(mm_dtype),
                    wy.T.astype(mm_dtype),
                    preferred_element_type=jnp.float32)     # (Sn, Tn)

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

        if has_ao:
            # AO capture at the hit plane: 4 extra resample pairs, run
            # only on slices where at least one ray crosses (most slices
            # have none - the gating is what keeps AO nearly free)
            @pl.when(jnp.any(crossing))
            def _():
                asl = ((1.0 - fz) * aslot[0].astype(jnp.float32)
                       + fz * aslot[1].astype(jnp.float32))  # (4, X, Y)
                for c in range(4):
                    tc = jnp.dot(wx.astype(mm_dtype),
                                 asl[c].astype(mm_dtype),
                                 preferred_element_type=jnp.float32)
                    Fc = jnp.dot(tc.astype(mm_dtype),
                                 wy.T.astype(mm_dtype),
                                 preferred_element_type=jnp.float32)
                    sh_ref[c] = jnp.where(crossing, Fc, sh_ref[c])

    @pl.when(do)
    def _():
        jax.lax.cond(k % 2 == 0, lambda: update(s0, a0),
                     lambda: update(s1, a1))

    @pl.when(~do)
    def _():
        fm1_ref[:] = jnp.zeros((Sn, Tn), jnp.float32)


def march_pallas(vol_zxy: jnp.ndarray,        # (Z, X, Y) slice-major
                 meta: jnp.ndarray,           # (K, 8) f32
                 s_grid: jnp.ndarray, t_grid: jnp.ndarray,
                 Sn: int, Tn: int,
                 interpret: "bool | None" = None,
                 dtype=jnp.bfloat16,
                 scale: float = 1.0, offset: float = 0.0,
                 ao_zcxy: "jnp.ndarray | None" = None):
    """Run the march; returns (m_hit, frac, g_s, g_t, g_z[, sh]) f32.

    ``dtype`` is the resample-matmul dtype (``RenderConfig.sweep_dtype``);
    accumulation is always f32.  A ``uint8`` volume stays uint8 in
    HBM/VMEM (quarter bandwidth) and is affine-dequantized
    (``* scale + offset``) after the z-lerp.

    ``ao_zcxy``: optional (Z, 4, X, Y) baked SH occlusion field; when
    given, the return gains ``sh`` (4, Sn, Tn) captured at the hit plane.

    Called from inside the jitted sweep; ``interpret`` defaults to True on
    the CPU backend so the whole renderer stays testable there."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = jnp.dtype(dtype)
    store_dtype = (jnp.uint8 if vol_zxy.dtype == jnp.uint8
                   else dtype)
    has_ao = ao_zcxy is not None
    Z, X, Y = vol_zxy.shape
    K = meta.shape[0]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [meta, vol_zxy.astype(store_dtype)]
    if has_ao:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(ao_zcxy.astype(dtype))
    in_specs += [
        pl.BlockSpec((1, Sn), lambda k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tn), lambda k: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [s_grid[None], t_grid[None]]

    out_specs = [pl.BlockSpec((Sn, Tn), lambda k: (0, 0),
                              memory_space=pltpu.VMEM)] * 6
    out_shape = [jax.ShapeDtypeStruct((Sn, Tn), jnp.float32)] * 6
    if has_ao:
        out_specs.append(pl.BlockSpec((4, Sn, Tn), lambda k: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((4, Sn, Tn), jnp.float32))

    scratch = [
        pltpu.VMEM((2, X, Y), store_dtype),
        pltpu.VMEM((2, X, Y), store_dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_ao:
        scratch += [
            pltpu.VMEM((2, 4, X, Y), dtype),
            pltpu.VMEM((2, 4, X, Y), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    outs = pl.pallas_call(
        functools.partial(_march_kernel, Sn=Sn, Tn=Tn, X=X, Y=Y,
                          mm_dtype=dtype, scale=scale, offset=offset,
                          has_ao=has_ao),
        grid=(K,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    m_hit, frac, _, g_s, g_t, g_z = outs[:6]
    if has_ao:
        return m_hit, frac, g_s, g_t, g_z, outs[6]
    return m_hit, frac, g_s, g_t, g_z
