"""Pallas 3x3 convolution kernel for the EnhanceNet inference hot path.

XLA's conv on this TPU reaches ~8-14 TFLOPs for the (1080p, 64ch) 3x3 convs
that dominate the super-resolution network (measured; the chip peaks near
100 TFLOPs on large matmuls).  This kernel restructures the conv as nine
shifted (M, C) @ (C, Cout) matmuls accumulated in f32, with the input
row-band (plus halo) DMA'd into VMEM once per grid step.

Mosaic alignment strategy: channels are padded to 128 (a full lane tile) so
no slice ever cuts the lane dim; the x-shifts use `pltpu.roll` along the
sublane dim followed by 0-offset slices; row-band DMAs slice only the
untiled leading dim.  Zero-padded channel columns stay zero through conv +
bias + ReLU, so a whole network can run in padded form with padding applied
once at the input.

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


def _kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *,
            relu: bool, th: int, w_out: int):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * th, th + 2)], scratch,
                                sem)
    dma.start()
    dma.wait()

    C = scratch.shape[2]
    Cout = o_ref.shape[2]
    n_sub = scratch.shape[1]
    # sublane rotate needs 32-bit data: the scratch band is f32; compute
    # casts to the weight dtype (bf16) right before each matmul
    shifted = [scratch[:], pltpu.roll(scratch[:], n_sub - 1, 1),
               pltpu.roll(scratch[:], n_sub - 2, 1)]

    acc = jnp.zeros((th * w_out, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tile = shifted[dx][dy:dy + th, :w_out, :].reshape(
                th * w_out, C).astype(w_ref.dtype)
            acc = acc + jnp.dot(tile, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc.reshape(th, w_out, Cout).astype(o_ref.dtype)


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
    xp = jnp.pad(x[0].astype(jnp.float32), ((1, 1 + Hp), (1, 1 + wp), (0, 0)))
    wr = w.reshape(9, C, Cout).astype(jnp.bfloat16)
    b2 = b.reshape(1, Cout).astype(jnp.float32)
    n_bands = (H + Hp) // th

    out = pl.pallas_call(
        functools.partial(_kernel, relu=relu, th=th, w_out=W),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, C, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, W, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H + Hp, W, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W + 2 + wp, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
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
