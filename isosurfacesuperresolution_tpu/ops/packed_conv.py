"""Pallas pixel-pair-packed 3x3 conv for 64-channel trunks.

The EnhanceNet trunk convolves (270, 480, 64) tensors: 64 channels fill
only half the 128-lane vector tile, and XLA's conv runs at ~39 TFLOP/s.
Packing HORIZONTAL PIXEL PAIRS into channels - (h, w, 64) -> (h, w/2, 128)
via a memory-order-preserving reshape (free) - fills the lanes, and the
3x3 conv becomes a 1-D phase conv along the packed axis:

    out[(p, c)][j] = sum_dy sum_{m', p'} K[dy, n(p, m', p')] x[(p', c)][j+m']

For the center column (m' = 0) BOTH output parities read the full packed
input -> one K=128xN=128 matmul per row tap (2/3 of all MACs at full MXU
width).  The edge taps touch one parity half each; they are folded into
K=128 matmuls with zero halves (1.33x MAC overhead total - measured
cheaper than 64-aligned lane slicing).

Skeleton (row-band grid, double-buffered halo DMA, output-side column
rolls) follows `ops/pallas_conv.py`.  Scope: stride-1 SAME 3x3, 64->64
channels, batch 1, even width, fused bias + optional ReLU, bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 64


def pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 64) -> (B, H, W/2, 128), channel = p*64 + c.

    Memory-order preserving: flattening (w) = (w2, p) pairs into the
    channel gives index j2*128 + p*64 + c = j*64 + c - a free reshape.
    """
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W2, 128) -> (B, H, W2*2, 64): inverse of pack_pairs (free)."""
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def _pack_weights(k3: jnp.ndarray):
    """K3 (3,3,64,64) -> (Wc (3,128,128), We (3,2,128,128)) phase matrices.

    Wc[dy]: center-column tap, rows (p', c') -> cols (p, c):
      col block p=0: p'=0 <- K3[dy,1], p'=1 <- K3[dy,2]
      col block p=1: p'=0 <- K3[dy,0], p'=1 <- K3[dy,1]
    We[dy,0]: packed column j-1, only out p=0 from p'=1: rows [64:] cols [:64]
    We[dy,1]: packed column j+1, only out p=1 from p'=0: rows [:64] cols [64:]
    """
    k3 = k3.astype(jnp.float32)
    z = jnp.zeros((F, F), jnp.float32)
    Wc, We = [], []
    for dy in range(3):
        c0 = jnp.concatenate([k3[dy, 1], k3[dy, 2]], axis=0)   # col p=0
        c1 = jnp.concatenate([k3[dy, 0], k3[dy, 1]], axis=0)   # col p=1
        Wc.append(jnp.concatenate([c0, c1], axis=1))           # (128,128)
        # edge m'=-1 (out p=0 <- p'=1 via K3[dy,0]):
        left = jnp.concatenate(
            [jnp.concatenate([z, z], axis=1),
             jnp.concatenate([k3[dy, 0], z], axis=1)], axis=0)  # (128,128)
        # edge m'=+1 (out p=1 <- p'=0 via K3[dy,2]):
        right = jnp.concatenate(
            [jnp.concatenate([z, k3[dy, 2]], axis=1),
             jnp.concatenate([z, z], axis=1)], axis=0)          # (128,128)
        We.append(jnp.stack([left, right]))
    bf = jnp.bfloat16
    return jnp.stack(Wc).astype(bf), jnp.stack(We).astype(bf)


def _kernel(x_hbm, wc_ref, we_ref, b_ref, o_ref, s0, s1, sems, *,
            relu: bool, th: int, w_out: int):
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
    C2 = 2 * F

    def band_slot(slot):
        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32)
        accs = [None, None, None]         # per packed-column shift -1,0,+1
        for dy in range(3):
            tile = slot[dy:dy + th].reshape(th * wp, C2)
            t0 = dot(tile, we_ref[dy, 0])
            accs[0] = t0 if accs[0] is None else accs[0] + t0
            t1 = dot(tile, wc_ref[dy])
            accs[1] = t1 if accs[1] is None else accs[1] + t1
            t2 = dot(tile, we_ref[dy, 1])
            accs[2] = t2 if accs[2] is None else accs[2] + t2
        z = accs[0].reshape(th, wp, C2)
        z = z + pltpu.roll(accs[1].reshape(th, wp, C2), wp - 1, 1)
        z = z + pltpu.roll(accs[2].reshape(th, wp, C2), wp - 2, 1)
        return z

    z = jax.lax.cond(i % 2 == 0, lambda: band_slot(s0),
                     lambda: band_slot(s1))
    z = z[:, :w_out, :] + b_ref[:].astype(jnp.float32)
    if relu:
        z = jnp.maximum(z, 0.0)
    o_ref[:] = z.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "th",
                                             "out_dtype", "interpret"))
def packed_conv3x3(xp: jnp.ndarray, k3: jnp.ndarray, bias: jnp.ndarray,
                   relu: bool = False,
                   th: int = 16, out_dtype=jnp.bfloat16,
                   interpret: bool = False) -> jnp.ndarray:
    """3x3 SAME conv on a pixel-pair-packed (1, H, W2, 128) tensor.

    Equivalent to ``unpack -> conv3x3(64->64) [relu] -> pack``; see
    tests/test_packed_conv.py."""
    _, H, W2, C2 = xp.shape
    assert C2 == 2 * F, C2
    Hp = -H % th
    wp_extra = 8 - 2
    x0 = jnp.pad(xp[0].astype(jnp.bfloat16),
                 ((1, 1 + Hp), (1, 1 + wp_extra), (0, 0)))
    wc, we = _pack_weights(k3)
    b2 = jnp.tile(bias, 2).reshape(1, C2).astype(jnp.float32)
    n_bands = (H + Hp) // th

    out = pl.pallas_call(
        functools.partial(_kernel, relu=relu, th=th, w_out=W2),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, C2, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2, C2, C2), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, W2, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H + Hp, W2, C2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W2 + 2 + wp_extra, C2), jnp.bfloat16),
            pltpu.VMEM((th + 2, W2 + 2 + wp_extra, C2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0, wc, we, b2)
    return out[None, :H]
