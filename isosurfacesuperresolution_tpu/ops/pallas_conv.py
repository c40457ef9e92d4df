"""Pallas 3x3 convolution kernel for the EnhanceNet inference hot path.

XLA's conv on this TPU reaches ~8-14 TFLOPs for the (1080p, 64ch) 3x3 convs
that dominate the super-resolution network (measured; the chip peaks near
100 TFLOPs on large matmuls).  This kernel restructures the conv as
matmuls + output-side column rolls:

    z_dx[r, j] = sum_dy x[r+dy, j] @ W[dy, dx]       (MXU, bf16 in, f32 acc)
    out[r, j]  = z_0[r, j] + z_1[r, j+1] + z_2[r, j+2]   (f32 sublane rolls)

Mosaic constraints shaped the design: lane dims are padded to 128 so no
slice cuts a lane tile; sublane rotates only exist for 32-bit data, so the
rolls act on the f32 accumulators rather than the bf16 input; row-band DMAs
slice only the untiled leading dim and are double-buffered across grid
steps.  Zero-padded channels stay zero through conv+bias+ReLU, so a whole
network can run in padded form with padding applied once at the input.

Scope: stride-1 SAME 3x3 conv, NHWC batch-1, fused bias + optional ReLU.
Used for *inference* (the fused pipeline); training keeps XLA convs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(x_hbm, w_ref, b_ref, o_ref, s0, s1, sems, *,
            relu: bool, th: int, w_out: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slots = (s0, s1)

    def dma_for(band, slot_idx):
        # slot_idx must be a Python int (static buffer choice); band is traced
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

    C = s0.shape[2]
    Cout = o_ref.shape[2]
    wp_all = s0.shape[1]

    def band_slot(slot):
        # one tile materialization per dy, three dots per tile
        accs = [jnp.zeros((th * wp_all, Cout), jnp.float32)
                for _ in range(3)]
        for dy in range(3):
            tile = slot[dy:dy + th].reshape(th * wp_all, C)
            for dx in range(3):
                accs[dx] = accs[dx] + jnp.dot(
                    tile, w_ref[dy * 3 + dx],
                    preferred_element_type=jnp.float32)
        z = accs[0].reshape(th, wp_all, Cout)
        z = z + pltpu.roll(accs[1].reshape(th, wp_all, Cout), wp_all - 1, 1)
        z = z + pltpu.roll(accs[2].reshape(th, wp_all, Cout), wp_all - 2, 1)
        return z

    z = jax.lax.cond(i % 2 == 0, lambda: band_slot(s0),
                     lambda: band_slot(s1))
    z = z[:, :w_out, :] + b_ref[:].astype(jnp.float32)
    if relu:
        z = jnp.maximum(z, 0.0)
    o_ref[:] = z.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "th", "out_dtype"))
def conv3x3_pallas_p128(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        relu: bool = False, th: int = 16,
                        out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Padded-channel conv: x (1, H, W, 128k), w (3, 3, 128k, 128m),
    b (128m,) -> (1, H, W, 128m).  W must be a multiple of 8."""
    _, H, W, C = x.shape
    Cout = w.shape[3]
    assert C % LANE == 0 and Cout % LANE == 0, (C, Cout)
    assert W % 8 == 0, W

    Hp = -H % th
    wp = 8 - 2  # extra cols so (W + 2) rounds to a multiple of 8
    xp = jnp.pad(x[0].astype(jnp.bfloat16),
                 ((1, 1 + Hp), (1, 1 + wp), (0, 0)))
    wr = w.reshape(9, C, Cout).astype(jnp.bfloat16)
    b2 = b.reshape(1, Cout).astype(jnp.float32)
    n_bands = (H + Hp) // th

    out = pl.pallas_call(
        functools.partial(_kernel, relu=relu, th=th, w_out=W),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, C, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, W, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H + Hp, W, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W + 2 + wp, C), jnp.bfloat16),
            pltpu.VMEM((th + 2, W + 2 + wp, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, wr, b2)
    return out[None, :H]


def pad_lanes(a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Zero-pad a channel axis up to the next multiple of 128."""
    c = a.shape[axis]
    pad = -c % LANE
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis % a.ndim] = (0, pad)
    return jnp.pad(a, widths)


def pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(1, H, W, 64) -> (1, H, W/2, 128): two adjacent pixels per lane row."""
    _, H, W, C = x.shape
    return x.reshape(1, H, W // 2, 2 * C)


def unpack_pairs(x: jnp.ndarray, c_logical: int) -> jnp.ndarray:
    """(1, H, W/2, 2*Cp) -> (1, H, W, c_logical) (drops per-pixel padding)."""
    _, H, W2, C2 = x.shape
    cp = C2 // 2
    y = x.reshape(1, H, W2 * 2, cp)
    return y[..., :c_logical]


def pack_weights_pairs(w: jnp.ndarray, cin_p: int, cout_p: int
                       ) -> jnp.ndarray:
    """Transform (3, 3, Cin, Cout) conv weights for the packed-pairs layout.

    In packed form a pixel pair (even, odd) lives in one 2*cin_p lane row;
    the x-offsets -1/0/+1 of the ORIGINAL conv become pair-offsets with
    block-structured (2*cin_p, 2*cout_p) matrices:
      even output <- w0 @ prev-pair-odd, w1 @ even, w2 @ odd
      odd  output <- w0 @ even,          w1 @ odd,  w2 @ next-pair-even
    """
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 2 * cin_p, 2 * cout_p), w.dtype)
    for dy in range(3):
        w0, w1, w2 = w[dy, 0], w[dy, 1], w[dy, 2]
        # pair offset -1 (dx index 0): prev pair's odd half feeds even out
        out = out.at[dy, 0, cin_p:cin_p + cin, :cout].set(w0)
        # pair offset 0 (dx index 1)
        out = out.at[dy, 1, :cin, :cout].set(w1)
        out = out.at[dy, 1, cin_p:cin_p + cin, :cout].set(w2)
        out = out.at[dy, 1, :cin, cout_p:cout_p + cout].set(w0)
        out = out.at[dy, 1, cin_p:cin_p + cin, cout_p:cout_p + cout].set(w1)
        # pair offset +1 (dx index 2): next pair's even half feeds odd out
        out = out.at[dy, 2, :cin, cout_p:cout_p + cout].set(w2)
    return out


def conv3x3_packed(x: jnp.ndarray, w: jnp.ndarray,
                   b: Optional[jnp.ndarray] = None,
                   relu: bool = False) -> jnp.ndarray:
    """3x3 SAME conv for 64-channel activations via packed pixel pairs.

    Halves the lane-padding waste of the 128-padded kernel (each 128-lane
    row carries two real pixels).  Requires C_in = 64 and even W.
    """
    _, H, W, C = x.shape
    cout = w.shape[3]
    assert C == 64 and W % 2 == 0
    cin_p = 64
    cout_p = max(64, cout)
    xp = pack_pairs(x)
    wp = pack_weights_pairs(w, cin_p, cout_p)
    bp = jnp.zeros((2 * cout_p,), jnp.float32)
    if b is not None:
        bp = bp.at[:cout].set(b).at[cout_p:cout_p + cout].set(b)
    y = conv3x3_pallas_p128(xp, wp, bp, relu=relu, out_dtype=x.dtype)
    return unpack_pairs(y, cout) if cout_p == cout else \
        unpack_pairs(y, cout_p)[..., :cout]


def conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
            relu: bool = False) -> jnp.ndarray:
    """Backend-dispatching 3x3 SAME conv over *logical* channel counts.

    On TPU: pads channels to 128 lanes and runs the Pallas kernel (chain
    multiple convs with `pad_lanes`d tensors directly to amortize padding).
    Elsewhere: lax.conv fallback.
    """
    Cout = w.shape[3]
    if jax.default_backend() == "tpu" and x.shape[2] % 8 == 0:
        xpad = pad_lanes(x)
        wpad = pad_lanes(pad_lanes(w, axis=2), axis=3)
        bpad = pad_lanes(b if b is not None
                         else jnp.zeros((Cout,), jnp.float32))
        y = conv3x3_pallas_p128(xpad, wpad, bpad, relu=relu,
                                out_dtype=x.dtype)
        return y[..., :Cout]
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


# Status note: at 1080p/64ch the packed kernel lands at ~11 ms vs XLA conv's
# 11-18 ms - parity with XLA's best case, not yet a decisive win (the MXU
# estimate is ~2.3 ms; remaining gap is scheduling/roll overhead).  The fused
# pipeline therefore still uses XLA convs; this kernel is kept as the basis
# for further tuning (wider bands, fused layer chains, avoiding the f32
# accumulator rolls via output-offset stores).
