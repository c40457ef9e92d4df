"""Pallas phase-conv: `conv3x3 after pixel_shuffle(2)` at minimal FLOPs.

The planar SR tail needs ``z = conv3x3(PS(y))`` expressed on the planar
(low-res, 4x-channel) tensor.  The XLA route (`infer/planar.planar_tail_
conv`) embeds the phase structure in a dense (3,3,4Cin,4Cout) kernel - 4x
the minimal FLOPs because 3/4 of the entries are structural zeros, and the
MXU multiplies them anyway (~8 ms for the 540p/256ch post3 layer).

This kernel exploits the structure directly.  For output sub-pixel block
(a, b) the taps split by low-res row offset m:

    m = 0 ("center"):  both input row-phases a' contribute -> one K=256
                       matmul over ALL four input blocks;
    m = edge(a):       only a' = 1-a contributes -> one K=128 matmul over
                       the two contiguous blocks (a', *).

Column offsets use the output-roll trick (accumulate per dx, roll once),
so per output block it is 2 dx-groups x (K256 + K128) = 4 matmuls, 768
MAC-rows vs the ideal 576 (1.33x, from zero-padding the invalid column
phase inside the K128/K256 kernels) vs dense 2304 (4x).  All channel
slices are 128-aligned thanks to the A-MAJOR block layout
(channel = (a'*2+b')*64 + c).

Skeleton (row-band grid, double-buffered halo DMA) follows
`ops/pallas_conv.py`.  Scope: factor-2 shuffle, 4*64 = 256 planar
channels, batch 1, fused bias + optional ReLU, bf16 in / bf16 or f32 out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 64          # channels per sub-pixel block
C4 = 4 * F


def _pack_weights(k3: jnp.ndarray):
    """K3 (3,3,F,F) -> phase matrices for the B-major-output scheme.

    Output layout is B-MAJOR: channel = (b*2+a)*F + c, so that the
    center-row matmuls - 2/3 of all MACs - have MXU-wide output blocks:

      dx=0: out blocks b=0 (cols [0:2F])        -> Wc0 (4F, 2F)
      dx=1: all four out blocks (cols [0:4F])   -> Wc1 (4F, 4F)
      dx=2: out blocks b=1 (cols [2F:4F])       -> Wc2 (4F, 2F)

    Edge rows (m = +-1, input pair (1-a, *)) contribute one F-wide output
    block per (a, dx, b) - packed as We (2, 4, 2F, F) indexed [a, j] with
    j enumerating (dx, b) in ((0,0),(1,0),(1,1),(2,1)).
    """
    k3 = k3.astype(jnp.float32)
    zero = jnp.zeros((F, F), jnp.float32)

    def center_block(a, b, dx):
        # rows (a', b') A-major for out block (a, b) at column offset dx
        n = dx - 1
        rows = []
        for apc in range(2):
            d0 = apc - a
            for bp in range(2):
                e = 2 * n + bp - b
                rows.append(k3[d0 + 1, e + 1] if abs(e) <= 1 else zero)
        return jnp.concatenate(rows, axis=0)               # (4F, F)

    # center: cols ordered b-major (b*2+a)
    Wc0 = jnp.concatenate([center_block(a, 0, 0) for a in range(2)], axis=1)
    Wc1 = jnp.concatenate([center_block(a, b, 1) for b in range(2)
                           for a in range(2)], axis=1)
    Wc2 = jnp.concatenate([center_block(a, 1, 2) for a in range(2)], axis=1)

    def edge_block(a, b, dx):
        m_edge = -1 if a == 0 else 1
        ap = 1 - a
        d = 2 * m_edge + ap - a
        n = dx - 1
        rows = []
        for bp in range(2):
            e = 2 * n + bp - b
            rows.append(k3[d + 1, e + 1] if abs(e) <= 1 else zero)
        return jnp.concatenate(rows, axis=0)               # (2F, F)

    We = jnp.stack([
        jnp.stack([edge_block(a, 0, 0), edge_block(a, 0, 1),
                   edge_block(a, 1, 1), edge_block(a, 1, 2)])
        for a in range(2)])                                # (2, 4, 2F, F)
    bf = jnp.bfloat16
    return Wc0.astype(bf), Wc1.astype(bf), Wc2.astype(bf), We.astype(bf)


def _kernel(x_hbm, wc0_ref, wc1_ref, wc2_ref, we_ref, b_ref, o_ref,
            s0, s1, sems, *, relu: bool, th: int, w_out: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slots = (s0, s1)

    def dma_for(band, slot_idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(band * th, th + 2)], slots[slot_idx],
            sems.at[slot_idx])

    @pl.when(i == 0)
    def _():
        dma_for(0, 0).start()

    for parity in (0, 1):
        @pl.when((i + 1 < n) & ((i + 1) % 2 == parity))
        def _(parity=parity):
            dma_for(i + 1, parity).start()

    for parity in (0, 1):
        @pl.when(i % 2 == parity)
        def _(parity=parity):
            dma_for(i, parity).wait()

    wp = s0.shape[1]

    def band_slot(slot):
        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32)
        center = slot[1:1 + th].reshape(th * wp, C4)
        # edge row for output phase a samples input blocks (1-a, *)
        ep = []
        for a in range(2):
            edge = (slot[0:th] if a == 0
                    else slot[2:2 + th]).reshape(th * wp, C4)
            lo = (1 - a) * 2 * F
            ep.append(edge[:, lo:lo + 2 * F])
        # center-row matmuls: MXU-wide outputs (B-major layout)
        c0 = dot(center, wc0_ref[:])                      # (.., 2F) b=0
        c1 = dot(center, wc1_ref[:])                      # (.., 4F)
        c2 = dot(center, wc2_ref[:])                      # (.., 2F) b=1
        # edge-row matmuls: j -> (dx, b) = (0,0),(1,0),(1,1),(2,1)
        e = [[dot(ep[a], we_ref[a, j]) for j in range(4)]
             for a in range(2)]
        zeros2f = jnp.zeros((th * wp, 2 * F), jnp.float32)
        acc0 = jnp.concatenate(
            [c0 + jnp.concatenate([e[0][0], e[1][0]], axis=1), zeros2f],
            axis=1)
        acc1 = c1 + jnp.concatenate([e[0][1], e[1][1], e[0][2], e[1][2]],
                                    axis=1)
        acc2 = jnp.concatenate(
            [zeros2f, c2 + jnp.concatenate([e[0][3], e[1][3]], axis=1)],
            axis=1)
        z = acc0.reshape(th, wp, C4)
        z = z + pltpu.roll(acc1.reshape(th, wp, C4), wp - 1, 1)
        z = z + pltpu.roll(acc2.reshape(th, wp, C4), wp - 2, 1)
        return z

    z = jax.lax.cond(i % 2 == 0, lambda: band_slot(s0),
                     lambda: band_slot(s1))
    z = z[:, :w_out, :] + b_ref[:].astype(jnp.float32)
    if relu:
        z = jnp.maximum(z, 0.0)
    o_ref[:] = z.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "th", "out_dtype",
                                             "interpret"))
def phase_conv3x3_amajor(x: jnp.ndarray, k3: jnp.ndarray, bias: jnp.ndarray,
                         relu: bool = False, th: int = 16,
                         out_dtype=jnp.bfloat16,
                         interpret: bool = False) -> jnp.ndarray:
    """conv3x3-after-shuffle on an A-MAJOR planar buffer.

    x    : (1, H, W, 256) planar, channel = (a'*2+b')*64 + c  (A-major).
    k3   : (3, 3, 64, 64) HWIO conv kernel (the post-conv weights).
    bias : (64,).
    Returns (1, H, W, 256) in B-MAJOR layout (channel = (b*2+a)*64 + c):
    the output layout that keeps the wide center-row matmuls MXU-aligned.
    Downstream kernels absorb the layout change in their own weight
    indexing (free).  Equals `infer/planar.planar_tail_conv` up to layout
    (tests/test_phase_conv.py).
    """
    _, H, W, C = x.shape
    assert C == C4, C
    Hp = -H % th
    wp_extra = 8 - 2
    xp = jnp.pad(x[0].astype(jnp.bfloat16),
                 ((1, 1 + Hp), (1, 1 + wp_extra), (0, 0)))
    wc0, wc1, wc2, we = _pack_weights(k3)
    b4 = jnp.tile(bias, 4).reshape(1, C4).astype(jnp.float32)
    n_bands = (H + Hp) // th

    out = pl.pallas_call(
        functools.partial(_kernel, relu=relu, th=th, w_out=W),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((C4, 2 * F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, 2 * F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4, 2 * F, F), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, W, C4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H + Hp, W, C4), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W + 2 + wp_extra, C4), jnp.bfloat16),
            pltpu.VMEM((th + 2, W + 2 + wp_extra, C4), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, wc0, wc1, wc2, we, b4)
    return out[None, :H]


def bmajor_from_amajor_cols() -> np.ndarray:
    """perm with x_B = x_A[..., perm] for 4x64 planar blocks."""
    perm = np.empty(C4, np.int64)
    for a in range(2):
        for b in range(2):
            src = (a * 2 + b) * F
            dst = (b * 2 + a) * F
            perm[dst:dst + F] = np.arange(src, src + F)
    return perm


# ---------------------------------------------------------------------------
# Round-4 blocked variant: VMEM-resident f32 accumulators
# ---------------------------------------------------------------------------
#
# Why the row-band kernel above disappoints on-chip (measured 5.9 ms vs
# ~6 ms dense, PERF.md): at th=16 over the full 960-wide planar row its
# three f32 accumulators are (16*968, 256) = ~15.9 MB EACH - the entire
# VMEM budget - so Mosaic spills accumulator traffic to HBM and the 3x
# MAC reduction buys nothing.  This variant blocks COLUMNS too (2-D
# grid), sizing every f32 intermediate to ~1 MB so accumulation really
# stays on-chip, which is the "fused multi-tap matmul whose f32
# accumulators never leave registers" the round-3 PERF notes called for.

def _kernel_blocked(x_hbm, wc0_ref, wc1_ref, wc2_ref, we_ref, b_ref,
                    o_ref, s0, s1, sems, *, relu: bool, th: int, wb: int,
                    nc: int):
    band = pl.program_id(0)
    col = pl.program_id(1)
    i = band * nc + col
    n = pl.num_programs(0) * nc
    slots = (s0, s1)
    wp = s0.shape[1]                    # wb + 16 (halo 2 + alignment 14)

    def dma_for(b, c, slot_idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * th, th + 2), pl.ds(c * wb, wp)],
            slots[slot_idx], sems.at[slot_idx])

    @pl.when(i == 0)
    def _():
        dma_for(0, 0, 0).start()

    nxt_band = (i + 1) // nc
    nxt_col = (i + 1) % nc
    for parity in (0, 1):
        @pl.when((i + 1 < n) & ((i + 1) % 2 == parity))
        def _(parity=parity):
            dma_for(nxt_band, nxt_col, parity).start()

    for parity in (0, 1):
        @pl.when(i % 2 == parity)
        def _(parity=parity):
            dma_for(band, col, parity).wait()

    def block_slot(slot):
        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32)
        center = slot[1:1 + th].reshape(th * wp, C4)
        ep = []
        for a in range(2):
            edge = (slot[0:th] if a == 0
                    else slot[2:2 + th]).reshape(th * wp, C4)
            lo = (1 - a) * 2 * F
            ep.append(edge[:, lo:lo + 2 * F])
        c0 = dot(center, wc0_ref[:])                     # (.., 2F) b=0
        c1 = dot(center, wc1_ref[:])                     # (.., 4F)
        c2 = dot(center, wc2_ref[:])                     # (.., 2F) b=1
        e = [[dot(ep[a], we_ref[a, j]) for j in range(4)]
             for a in range(2)]
        zeros2f = jnp.zeros((th * wp, 2 * F), jnp.float32)
        acc0 = jnp.concatenate(
            [c0 + jnp.concatenate([e[0][0], e[1][0]], axis=1), zeros2f],
            axis=1).reshape(th, wp, C4)
        acc1 = (c1 + jnp.concatenate([e[0][1], e[1][1], e[0][2], e[1][2]],
                                     axis=1)).reshape(th, wp, C4)
        acc2 = jnp.concatenate(
            [zeros2f, c2 + jnp.concatenate([e[0][3], e[1][3]], axis=1)],
            axis=1).reshape(th, wp, C4)
        # out col l (block-local) <- input halo cols l, l+1, l+2:
        # sublane-axis slices instead of the full-width rolls
        return (acc0[:, 0:wb] + acc1[:, 1:wb + 1] + acc2[:, 2:wb + 2])

    z = jax.lax.cond(i % 2 == 0, lambda: block_slot(s0),
                     lambda: block_slot(s1))
    z = z + b_ref[:].astype(jnp.float32)
    if relu:
        z = jnp.maximum(z, 0.0)
    o_ref[:] = z.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "th", "wb",
                                             "out_dtype", "interpret"))
def phase_conv3x3_amajor_blocked(x: jnp.ndarray, k3: jnp.ndarray,
                                 bias: jnp.ndarray, relu: bool = False,
                                 th: int = 8, wb: int = 160,
                                 out_dtype=jnp.bfloat16,
                                 interpret: "bool | None" = None
                                 ) -> jnp.ndarray:
    """2-D-blocked `phase_conv3x3_amajor` (same math, same layouts).

    x (1, H, W, 256) A-major planar -> (1, H, W, 256) B-major, equal to
    `infer/planar.planar_tail_conv` up to layout.  th*wb sizes the f32
    accumulators: (th*(wb+16), 256) f32 ~ 1.4 MB at the defaults, VMEM-
    resident with room for the double-buffered input slots.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _, H, W, C = x.shape
    assert C == C4, C
    n_bands = -(-H // th)
    nc = -(-W // wb)
    wp = wb + 16                       # 2 halo + 14 alignment (16 | wp)
    pad_h = n_bands * th - H
    # the last col block (origin (nc-1)*wb) DMAs wp columns; pad exactly
    # that far (a previous formula over-padded by a whole block when
    # wb | W, materializing an unread zero stripe)
    pad_w = (nc - 1) * wb + wp - 2 - W
    xp = jnp.pad(x[0].astype(jnp.bfloat16),
                 ((1, 1 + pad_h), (1, 1 + pad_w), (0, 0)))
    wc0, wc1, wc2, we = _pack_weights(k3)
    b4 = jnp.tile(bias, 4).reshape(1, 1, C4).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel_blocked, relu=relu, th=th, wb=wb,
                          nc=nc),
        grid=(n_bands, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((C4, 2 * F), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C4), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, 2 * F), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4, 2 * F, F), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C4), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, wb, C4), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bands * th, nc * wb, C4),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, C4), jnp.bfloat16),
            pltpu.VMEM((th + 2, wp, C4), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, wc0, wc1, wc2, we, b4)
    return out[None, :H, :W]
