"""Sub-pixel-planar inference engine: the 4x SR frame with ZERO interleaves.

Why: on TPU the classic SR layout (interleave to 1080p, convolve 64-channel
full-res tensors) is the worst case - 64 channels waste half the 128-lane
vector tile, pixel-shuffle transposes cost milliseconds, and full-res convs
run at 10-17 TFLOP/s where the same FLOPs at low resolution with wide
channels run at 43-100 TFLOP/s (measured, v5e).  This engine keeps every
tensor of the interactive frame in *planar* form - spatial size stays at
the renderer resolution (or 2x) and the 4x4 = 16 high-res sub-pixels live
in the channel dimension - through the network tail, residual
reconstruction, clamping, shading, the recurrent state, and the temporal
warp.  The single full-res materialization is the final RGB plane
transpose, laid out channel-first so the minor dimension is the 1920-wide
row, not 3 RGB channels.

The engine reuses the standard Flax parameter tree (`models/generators.
EnhanceNet`) unchanged; wherever a layout change would normally permute an
ACTIVATION, the permutation is folded into the neighbouring convolution
KERNEL at trace time instead (kernels are tiny; activations are not).

Layouts
-------
* ``state`` (B, h, w, 96) - "nested" channel order
  ``idx = c*16 + a2*8 + b2*4 + a1*2 + b1`` where the high-res pixel is
  (4i + 2*a1 + a2, 4j + 2*b1 + b2).  Semantic channels c stay contiguous
  16-blocks, so clamping and shading slice exactly like the interleaved
  code.  `NESTED_FROM_FLAT` converts from the reference's `flatten_high`
  order (`models/videotools.py:8-25`) for tests and interop.
* intermediate singly-planar (B, 2h, 2w, 4F): F2/post3 run at 540p with
  256 channels, phase-decomposed (`ops/fused_upsample.compose_planar_
  conv3x3` maths) in "A-major" order (sub-pixel major) so the four phase
  convs concatenate for free.

Reference parity: capability equals `mainGUI.updateImage` +
`LoadedModel.inference` (`inference/loadedmodel.py:70-120`) +
`utils/shading.py`; execution is TPU-native and shares no structure with
the reference's DLL/CUDA path.  Exactness: interior-identical to the
standard pipeline (tests/test_planar.py); borders use resize-clamp
semantics instead of conv zero padding.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import ModelConfig, ShadingConfig
from isosurfacesuperresolution_tpu.ops.fused_upsample import (
    _stencil, compose_up2x_conv3x3, up2x_conv_bias, upsample_stencil_kernel)
from isosurfacesuperresolution_tpu.ops.resize import pixel_unshuffle


# ---------------------------------------------------------------------------
# Channel-order bookkeeping (all static numpy, folded into kernels)
# ---------------------------------------------------------------------------

def _nested_coords():
    """(c?, a2, b2, a1, b1) bit meanings for one 16-block."""
    n = np.arange(16)
    a2, b2 = (n >> 3) & 1, (n >> 2) & 1
    a1, b1 = (n >> 1) & 1, n & 1
    dy, dx = 2 * a1 + a2, 2 * b1 + b2
    return dy, dx


@lru_cache(maxsize=None)
def nested_from_flat_perm(channels: int = 6) -> "np.ndarray":
    """perm with x_nested = x_flat[..., perm]; flat = (c, dy, dx) c-major
    (the `flatten_high` order), nested as documented above."""
    dy, dx = _nested_coords()
    sub_flat = dy * 4 + dx                        # flat sub-index per slot
    perm = (np.arange(channels)[:, None] * 16 + sub_flat[None, :])
    return perm.reshape(-1)


@lru_cache(maxsize=None)
def flat_from_nested_perm(channels: int = 6) -> "np.ndarray":
    p = nested_from_flat_perm(channels)
    inv = np.empty_like(p)
    inv[p] = np.arange(p.size)
    return inv


def state_to_flat(x: jnp.ndarray, channels: int = 6) -> jnp.ndarray:
    """Nested-order planar state -> reference `flatten_high` order."""
    return x[..., flat_from_nested_perm(channels)]


def state_from_flat(x: jnp.ndarray, channels: int = 6) -> jnp.ndarray:
    return x[..., nested_from_flat_perm(channels)]


def supports_planar(cfg: ModelConfig) -> bool:
    """The planar engine covers the flagship configuration."""
    return (cfg.model == "EnhanceNet" and cfg.upscale_factor == 4
            and not cfg.use_bn and cfg.recon_type == "residual"
            and cfg.upsample in ("nearest", "bilinear")
            and tuple(cfg.channel_mask) == (0, 1, 2, 3, 4)
            and cfg.output_channels == 6)


# ---------------------------------------------------------------------------
# Kernel composition (static per trace; all reorders live here)
# ---------------------------------------------------------------------------

def _conv(x, kernel, bias=None, padding="SAME", dtype=None, quant=False):
    dtype = dtype or x.dtype
    if quant:
        return _conv_int8(x, kernel, bias, padding, dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _conv_int8(x, kernel, bias, padding, dtype):
    """Post-training-quantized conv: s8 x s8 -> s32 on the MXU.

    Weights get per-output-channel symmetric scales (standard PTQ - the
    composed planar kernels have per-channel ranges spanning ~2 orders of
    magnitude, a single tensor scale wastes most of the 8 bits); the
    activation gets ONE dynamic per-tensor scale computed from this call's
    max-abs (a fused reduction, ~free next to the conv).  v5e's MXU runs
    s8 x s8 at 2x its bf16 rate, and the conv dominates HBM traffic
    halves too (int8 activations).  Kernel quantization runs per frame but
    is O(|K|) - negligible next to the conv itself.
    """
    f32 = jnp.float32
    kf = kernel.astype(f32)
    sw = jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0        # (Cout,)
    sw = jnp.maximum(sw, 1e-12)
    kq = jnp.round(kf / sw).astype(jnp.int8)

    xf = x.astype(f32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    xq = jnp.round(xf / sx).astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(f32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(f32)
    return y.astype(dtype)


def _edge_conv(x, kernel, bias=None, dtype=None, quant=False):
    """3x3 VALID conv over an edge-padded input (resize-clamp semantics)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return _conv(xp, kernel, bias, padding="VALID", dtype=dtype, quant=quant)


def _amajor_cols(cout: int) -> np.ndarray:
    """Column perm taking (c, a, b) c-major planar channels to A-major
    (a, b, c): idx_A = (a*2+b)*cout + c."""
    c = np.arange(cout)
    cols = np.empty(cout * 4, np.int64)
    for a in range(2):
        for b in range(2):
            cols[(a * 2 + b) * cout: (a * 2 + b + 1) * cout] = \
                c * 4 + a * 2 + b
    return cols


@lru_cache(maxsize=None)
def _phase_selector() -> np.ndarray:
    """T[m, a', a, d] = 1 iff the planar tap (low-res offset m-1, input
    sub-pixel a') contributes kernel row d-1 to output sub-pixel a:
    d-1 == 2*(m-1) + a' - a."""
    T = np.zeros((3, 2, 2, 3), np.float32)
    for mi in range(3):
        for ap in range(2):
            for a in range(2):
                d = 2 * (mi - 1) + ap - a
                if -1 <= d <= 1:
                    T[mi, ap, a, d + 1] = 1.0
    return T


def planar_tail_conv(z: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                     dtype, in_perm: "np.ndarray | None" = None,
                     quant: bool = False) -> jnp.ndarray:
    """conv3x3-after-shuffle as ONE dense planar conv, c-major in/out.

    z (..., H, W, 4*Cin) planar (c,a,b c-major); kernel (3,3,Cin,Cout).
    The composed (3,3,4Cin,4Cout) kernel is half structural zeros (2x the
    minimal FLOPs) but runs as a single wide conv at 75 TFLOP/s measured -
    faster end-to-end than four minimal phase convs whose narrow outputs
    and concat cost more than the wasted MACs.
    """
    T = jnp.asarray(_phase_selector())
    # K'[m,n,(c',a',b'),(c,a,b)] = sum_{d,e} T[m,a',a,d] T[n,b',b,e] K[d,e]
    kc = jnp.einsum("muad,nvbe,decf->mncuvfab", T, T, kernel)
    cin, cout = kernel.shape[2], kernel.shape[3]
    kc = kc.reshape(3, 3, 4 * cin, 4 * cout)
    if in_perm is not None:
        # input arrives channel-permuted (e.g. from the split tail conv);
        # re-index the kernel rows, never the activations
        kc = kc[:, :, np.asarray(in_perm), :]
    bias4 = jnp.repeat(bias, 4)                    # c-major
    return _conv(z, kc, bias4, padding="SAME", dtype=dtype, quant=quant)


def planar_tail_conv_split(z: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray, dtype, quant: bool = False
                           ) -> Tuple[jnp.ndarray, np.ndarray]:
    """conv3x3-after-shuffle as TWO row-phase convs at 2/3 the dense MACs.

    The dense composed kernel of `planar_tail_conv` is 3/4 structural
    zeros; splitting outputs by ROW sub-pixel a removes the all-zero
    kernel row of each half (output a only receives low-res row offsets
    {a-1, a}), giving two (2, 3, 4Cin, 2Cout) convs - 2.67x the minimal
    MACs instead of 4x, with full-128-lane outputs (the earlier
    four-way (2,2,4Cin,Cout) split lost its savings to half-empty output
    lanes, PERF.md).

    Returns ``(out, order)`` where ``out`` channels are [a=0 block,
    a=1 block] (each c-major over (c, b)) and ``order[j]`` is the c-major
    channel held at ``out`` position j: fold it into the CONSUMER's
    input-channel indexing (`planar_tail_conv(..., in_perm=order)`)
    instead of gathering activations."""
    T = jnp.asarray(_phase_selector())
    kc = jnp.einsum("muad,nvbe,decf->mncuvfab", T, T, kernel)
    cin, cout = kernel.shape[2], kernel.shape[3]
    kc = kc.reshape(3, 3, 4 * cin, 4 * cout)
    bias4 = jnp.repeat(bias, 4)

    # c-major output channel index = c*4 + a*2 + b
    ch = np.arange(4 * cout)
    cols_a = [np.nonzero((ch % 4) // 2 == a)[0] for a in (0, 1)]
    outs = []
    for a, (rows, pad_h) in enumerate((( (0, 2), (1, 0)),
                                       ((1, 3), (0, 1)))):
        ka = kc[rows[0]:rows[1]][:, :, :, cols_a[a]]     # (2,3,4Cin,2Cout)
        outs.append(_conv(z, ka, bias4[cols_a[a]],
                          padding=[pad_h, (1, 1)], dtype=dtype, quant=quant))
    out = jnp.concatenate(outs, axis=-1)
    order = np.concatenate(cols_a)                  # out position -> c-major
    return out, order


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def planar_apply(params: Dict, cfg: ModelConfig, net_in: jnp.ndarray
                 ) -> jnp.ndarray:
    """EnhanceNet forward returning the planar reconstruction (NESTED order).

    net_in : (B, h, w, 101) with channels [0:5] = low G-buffer and [5:101]
    the planar previous frame in NESTED order.  Returns (B, h, w, 96)
    nested, equal (interior) to ``state_from_flat(pixel_unshuffle(
    model.apply(params, net_in_flat)[0], 4))``.
    """
    assert supports_planar(cfg), "planar engine: unsupported config"
    p = params["params"] if "params" in params else params
    dtype = jnp.dtype(cfg.compute_dtype)
    F = cfg.num_features
    # int8 PTQ covers the FLOP-dominant middle (trunk blocks, post1-post3);
    # `pre` keeps full precision on the raw G-buffer (8-bit input depth
    # would starve the residual prediction) and `out` keeps full precision
    # into the reconstruction (the depth channel evaluates at ~59 dB).
    q8 = bool(getattr(cfg, "planar_int8", False))

    # trunk: fold the nested->flat input permutation into the pre kernel
    pre_k = p["pre"]["kernel"]
    n2f = np.concatenate([np.arange(5),
                          5 + nested_from_flat_perm(cfg.output_channels)])
    pre_k = pre_k[:, :, n2f, :]
    x = net_in.astype(dtype)
    feat = jax.nn.relu(_conv(x, pre_k, p["pre"]["bias"], dtype=dtype))
    for i in range(cfg.num_residual_blocks):
        y = _conv(feat, p[f"block{i}_conv1"]["kernel"],
                  p[f"block{i}_conv1"]["bias"], dtype=dtype, quant=q8)
        y = jax.nn.relu(y)
        y = _conv(y, p[f"block{i}_conv2"]["kernel"],
                  p[f"block{i}_conv2"]["bias"], dtype=dtype, quant=q8)
        feat = feat + y

    # F1: upsample x2 + post1 composed -> (h, w, 4F) c-major, then ONE cheap
    # shuffle to (2h, 2w, F) - the only mid-network interleave
    from isosurfacesuperresolution_tpu.ops.resize import pixel_shuffle
    k1 = compose_up2x_conv3x3(p["post1"]["kernel"], cfg.upsample)
    b1 = up2x_conv_bias(p["post1"]["bias"])
    z = jax.nn.relu(_edge_conv(feat, k1, b1, dtype=dtype, quant=q8))
    z = pixel_shuffle(z, 2)                        # (2h, 2w, F)

    # F2: upsample x2 + post2 composed, c-major planar output @540p
    k2 = compose_up2x_conv3x3(p["post2"]["kernel"], cfg.upsample)
    b2 = up2x_conv_bias(p["post2"]["bias"])
    phase_tail = (bool(getattr(cfg, "planar_phase_tail", False))
                  and cfg.num_features == 64)   # kernel is 4*64-channel
    if phase_tail:
        # fold the c-major -> A-major permutation into F2's output
        # columns (kernels are tiny; activations are not) so the Pallas
        # phase kernel's input layout is free
        amaj = np.asarray(_amajor_cols(cfg.num_features))
        k2 = k2[..., amaj]
        b2 = b2[amaj]
    z = jax.nn.relu(_edge_conv(z, k2, b2, dtype=dtype, quant=q8))

    # post3 + out: planar convs, c-major in/out, no interleaves.  The
    # split formulation does post3 at 2/3 the dense MACs with full-lane
    # outputs; its channel order folds into the out conv's kernel rows.
    if phase_tail:
        # post3 via the 2-D-blocked Pallas phase kernel: minimal-FLOP
        # matmuls with VMEM-resident f32 accumulators (ops/phase_conv).
        # A-major in (arranged above), B-major out - absorbed by the out
        # conv's kernel rows.  int8 PTQ does not apply to this path -
        # refuse the combination rather than silently benchmarking a
        # mixed configuration (round-4 advisor finding)
        if q8:
            raise ValueError(
                "planar_phase_tail and planar_int8 are mutually "
                "exclusive: the Pallas phase kernel has no int8 path, "
                "so post3 would run unquantized and the A/B would "
                "measure a mislabeled mixed configuration")
        from isosurfacesuperresolution_tpu.ops.phase_conv import (
            bmajor_from_amajor_cols, phase_conv3x3_amajor_blocked)
        z = phase_conv3x3_amajor_blocked(
            z.astype(jnp.bfloat16), p["post3"]["kernel"],
            p["post3"]["bias"], relu=True, out_dtype=dtype)
        comp = amaj[np.asarray(bmajor_from_amajor_cols())]
        z = planar_tail_conv(z, p["out"]["kernel"], p["out"]["bias"],
                             dtype, in_perm=comp)
    elif getattr(cfg, "planar_split_tail", False):
        z, order = planar_tail_conv_split(z, p["post3"]["kernel"],
                                          p["post3"]["bias"], dtype,
                                          quant=q8)
        z = jax.nn.relu(z)
        z = planar_tail_conv(z, p["out"]["kernel"], p["out"]["bias"],
                             dtype, in_perm=order)
    else:
        z = jax.nn.relu(planar_tail_conv(z, p["post3"]["kernel"],
                                         p["post3"]["bias"], dtype,
                                         quant=q8))
        z = planar_tail_conv(z, p["out"]["kernel"], p["out"]["bias"],
                             dtype)
    z = z.astype(jnp.float32)                      # (2h, 2w, 24) c-major

    # un-shuffle once: c-major 540p planar -> NESTED 270p planar (c-blocks
    # stay contiguous, so clamp/shading slice like the interleaved code)
    z = pixel_unshuffle(z, 2)                      # (h, w, 96) nested

    # residual reconstruction in planar space: fixed stencil conv whose
    # output columns are pre-permuted to nested order
    method = cfg.upsample if cfg.upsample != "pixelShuffle" else "bilinear"
    kr = upsample_stencil_kernel(5, method, 4)
    kr = kr[:, :, :, nested_from_flat_perm(5)]
    recon = _edge_conv(net_in[..., :5].astype(jnp.float32), kr,
                       dtype=jnp.float32)          # (h, w, 80) nested
    return jnp.concatenate([z[..., :80] + recon, z[..., 80:]], axis=-1)


# ---------------------------------------------------------------------------
# Planar post-processing (nested order; c-blocks are contiguous)
# ---------------------------------------------------------------------------

def clamp_output_planar(pred: jnp.ndarray) -> jnp.ndarray:
    """`train.trainer.clamp_output` on a planar (..., 96) buffer."""
    mask = jnp.clip(pred[..., 0:16], -1.0, 1.0)
    nx, ny, nz = pred[..., 16:32], pred[..., 32:48], pred[..., 48:64]
    eps = 1e-7   # matches render.shading.safe_normalize
    inv = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                     eps * eps))
    depth = jnp.clip(pred[..., 64:80], 0.0, 1.0)
    ao = jnp.clip(pred[..., 80:96], 0.0, 1.0)
    return jnp.concatenate(
        [mask, nx * inv, ny * inv, nz * inv, depth, ao], axis=-1)


def screen_space_shading_planar(buf: jnp.ndarray, cfg: ShadingConfig
                                ) -> jnp.ndarray:
    """`render.shading.screen_space_shading` on planar (..., 96) buffers
    -> planar RGB (..., 48), same sub-pixel order as the input."""
    import math
    mask = buf[..., 0:16]
    nx, ny, nz = buf[..., 16:32], buf[..., 32:48], buf[..., 48:64]
    ao_raw = jnp.clip(buf[..., 80:96], 0.0, 1.0)
    if cfg.inverse_ao:
        ao_raw = jnp.clip(1.0 - buf[..., 80:96], 0.0, 1.0)
    ao = cfg.ao_strength * ao_raw + (1.0 - cfg.ao_strength)

    light = np.asarray(cfg.light_direction, np.float32)
    light = light / np.linalg.norm(light)
    ldotn = light[0] * nx + light[1] * ny + light[2] * nz

    t = jnp.clip(mask * 0.5 + 0.5, 0.0, 1.0)
    if cfg.enable_specular:
        reflect_z = 2.0 * ldotn * nz - light[2]
        spec_factor = ((cfg.specular_exponent + 2) / (2.0 * math.pi)) * (
            jnp.clip(reflect_z, 0.0, 1.0) ** cfg.specular_exponent)
    chans = []
    for ch in range(3):
        color = (cfg.ambient_color[ch] * cfg.material_color[ch]
                 + cfg.diffuse_color[ch] * cfg.material_color[ch]
                 * jnp.abs(ldotn))
        if cfg.enable_specular:
            color = color + spec_factor * cfg.specular_color[ch]
        color = color * ao
        bg = cfg.background[ch]
        color = bg + t * (color - bg)
        chans.append(jnp.clip(color, 0.0, 1.0))
    return jnp.concatenate(chans, axis=-1)


@lru_cache(maxsize=None)
def _planes_perm(channels: int) -> np.ndarray:
    """Nested (c,a2,b2,a1,b1) -> (b1,b2,c,a1,a2) channel order."""
    idx = np.arange(channels * 16)
    c, rem = idx // 16, idx % 16
    a2, b2 = (rem >> 3) & 1, (rem >> 2) & 1
    a1, b1 = (rem >> 1) & 1, rem & 1
    tgt = (((b1 * 2 + b2) * channels + c) * 2 + a1) * 2 + a2
    perm = np.empty(idx.size, np.int64)
    perm[tgt] = idx
    return perm


def planar_rgb_to_planes(rgb_planar: jnp.ndarray) -> jnp.ndarray:
    """Planar nested RGB (B, h, w, 48) -> channel-FIRST full-res planes
    (B, 3, 4h, 4w).

    Route chosen by in-context measurement (8.3 ms -> 0.4 ms at 1080p):
    a static channel permutation puts the column sub-pixel bits (b1, b2)
    channel-major, so merging them into W is a PURE reshape (memory-order
    preserving - no transpose); the remaining row interleave is a small
    transpose whose minor dimension is the full 4w row, not 3 RGB
    channels.  A naive 8-d transpose costs ~8 ms; XLA's generic transpose
    cannot see this factorization.
    """
    b, h, w, C = rgb_planar.shape
    c = C // 16
    y = rgb_planar[..., _planes_perm(c)]           # (b,h,w,(b1,b2,c,a1,a2))
    y = y.reshape(b, h, w * 4, c * 4)              # merge (w,b1,b2): pure
    y = y.reshape(b, h, w * 4, c, 4)               # split (c, (a1,a2))
    y = y.transpose(0, 3, 1, 4, 2)                 # (b, c, h, a1a2, 4w)
    return y.reshape(b, c, 4 * h, 4 * w)


def initial_image_planar(low: jnp.ndarray, output_channels: int, mode: str,
                         ao_inverted: bool = False) -> jnp.ndarray:
    """`videotools.initial_image` directly in planar (nested) form."""
    b, h, w, _ = low.shape
    assert output_channels == 6
    if mode == "zero":
        return jnp.zeros((b, h, w, 96), jnp.float32)
    if mode == "unshaded":
        vals = ([-1.0] * 16 + [0.0] * 16 + [0.0] * 16 + [1.0] * 16
                + [0.5] * 16 + [0.0 if ao_inverted else 1.0] * 16)
        return jnp.broadcast_to(jnp.asarray(vals, jnp.float32),
                                (b, h, w, 96))
    if mode == "input":
        k = upsample_stencil_kernel(5, "bilinear", 4)
        k = k[:, :, :, nested_from_flat_perm(5)]
        up = _edge_conv(low[..., :5].astype(jnp.float32), k,
                        dtype=jnp.float32)
        ao = jnp.full((b, h, w, 16), 0.0 if ao_inverted else 1.0)
        return jnp.concatenate([up, ao], axis=-1)
    raise ValueError(f"unknown initial image mode {mode!r}")


# ---------------------------------------------------------------------------
# Planar temporal warp
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _warp_maps(axis_is_x: bool, channels: int):
    """Static channel permutations for high-res shifts in nested layout.

    For shift phase r in 0..3 returns (perm, carry) where perm maps output
    channel -> source channel with sub-pixel index shifted by +r along the
    axis, and carry[ch] = 1 where the shift wrapped into the next low-res
    pixel ((sub+r) >= 4).
    """
    dy, dx = _nested_coords()
    sub = dx if axis_is_x else dy
    oth = dy if axis_is_x else dx
    perms, carries = [], []
    for r in range(4):
        perm16 = np.empty(16, np.int64)
        for i in range(16):
            src = np.where((sub == (sub[i] + r) % 4) & (oth == oth[i]))[0]
            perm16[i] = src[0]
        carry16 = (sub + r) // 4                   # per OUTPUT slot
        perms.append((np.arange(channels)[:, None] * 16 + perm16[None, :]
                      ).reshape(-1))
        carries.append(np.tile(carry16, channels))
    return perms, carries


def _axis_warp_flat(img: jnp.ndarray, disp: jnp.ndarray, axis: int,
                    max_disp: int) -> jnp.ndarray:
    """Shift-blend along one axis on the flat nested planar buffer.

    img  : (B, h, w, C*16) nested planar.
    disp : (B, h, w, C*16) per-channel displacement in HIGH-RES pixels.

    A high-res shift k decomposes into a sub-pixel rotation r4 = k%4 and a
    low-res slice t = k//4.  To keep XLA's shift-blend fusion (channel
    gathers between taps would materialize every tap), accumulation runs in
    SOURCE-channel space - spatial slices, selects and multiply-adds only -
    and the four r4 groups are permuted back once at the end:

        out = sum_r4  P_r4( sum_t  w'_{r4,t} * S_{t + carry} (img) )
    """
    r = max_disp
    disp = jnp.clip(disp, -r, r)
    n = img.shape[axis]
    c96 = img.shape[-1]
    C = c96 // 16
    perms, carries = _warp_maps(axis == 2, C)

    lo_pad = r // 4 + 1
    pad = [(0, 0)] * 4
    pad[axis] = (lo_pad, lo_pad)
    imgp = jnp.pad(img, pad)

    def lo_slice(t):
        sl = [slice(None)] * 4
        sl[axis] = slice(lo_pad + t, lo_pad + t + n)
        return imgp[tuple(sl)]

    out = None
    for r4 in range(4):
        perm = perms[r4]
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        dispP = disp if r4 == 0 else disp[..., inv]
        carryP = np.tile((_nested_coords()[1 if axis == 2 else 0]
                          + r4) // 4, C)[inv]      # per SOURCE channel
        carry_mask = jnp.asarray(carryP == 1)
        needs_carry = bool(np.any(carryP))

        acc = None
        for t in range(-(r // 4) - 1, r // 4 + 1):
            k = 4 * t + r4
            if k < -r or k > r:
                continue
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(dispP - k))
            if needs_carry:
                shifted = jnp.where(carry_mask, lo_slice(t + 1),
                                    lo_slice(t))
            else:
                shifted = lo_slice(t)
            term = wgt * shifted
            acc = term if acc is None else acc + term
        accP = acc if r4 == 0 else acc[..., perm]
        out = accP if out is None else out + accP
    return out


def _planar_linspace(nh: int, nl: int, axis_is_x: bool) -> np.ndarray:
    """linspace(-1, 1, nh) and arange(nh) laid out in nested planar order.

    Returns (grid, index): each (nl, 16) arrays expanded per sub-pixel.
    """
    dy, dx = _nested_coords()
    sub = dx if axis_is_x else dy
    g = np.linspace(-1.0, 1.0, nh, dtype=np.float32).reshape(nl, 4)
    i = np.arange(nh, dtype=np.float32).reshape(nl, 4)
    return g[:, sub], i[:, sub]                    # (nl, 16)


def warp_planar(prev_planar: jnp.ndarray, flow_low: jnp.ndarray,
                special_mask: bool = False, max_disp: int = 8,
                compute_dtype=None) -> jnp.ndarray:
    """`ops/warp_fast.warp_upscale_fast` on the planar (nested) state.

    prev_planar : (B, h, w, 96) planar previous prediction.
    flow_low    : (B, h, w, 2) screen flow (renderer convention).
    Returns the warped planar buffer - which IS the (permuted) flattened
    network input, so `flatten_high` disappears from the frame.
    compute_dtype: bfloat16 halves the shift-blend bandwidth; safe when
    the only consumer is the bf16 network input (the fused pipeline).
    """
    b, h, w, c96 = prev_planar.shape
    C = c96 // 16
    u = 4
    hh, wh = h * u, w * u

    flow = jnp.stack([flow_low[..., 0] * -2.0, flow_low[..., 1] * 2.0],
                     axis=-1)
    # bilinear x4 flow upsample as a planar stencil conv, nested order
    kf = upsample_stencil_kernel(2, "bilinear", 4)
    kf = kf[:, :, :, nested_from_flat_perm(2)]
    flow_p = _edge_conv(flow, kf, dtype=jnp.float32)
    fx, fy = flow_p[..., 0:16], flow_p[..., 16:32]

    gx, ix = _planar_linspace(wh, w, axis_is_x=True)
    gy, iy = _planar_linspace(hh, h, axis_is_x=False)
    gx_p = jnp.asarray(gx.reshape(1, 1, w, 16))
    ix_p = jnp.asarray(ix.reshape(1, 1, w, 16))
    gy_p = jnp.asarray(gy.reshape(1, h, 1, 16))
    iy_p = jnp.asarray(iy.reshape(1, h, 1, 16))

    pos_x = ((gx_p + fx + 1.0) * wh - 1.0) * 0.5
    pos_y = ((gy_p + fy + 1.0) * hh - 1.0) * 0.5
    dt = compute_dtype or prev_planar.dtype
    disp_x = jnp.tile(pos_x - ix_p, (1, 1, 1, C)).astype(dt)
    disp_y = jnp.tile(pos_y - iy_p, (1, 1, 1, C)).astype(dt)

    img = prev_planar.astype(dt)
    if special_mask:
        img = jnp.concatenate([img[..., 0:16] * 0.5 + 0.5, img[..., 16:]],
                              axis=-1)
    out = _axis_warp_flat(img, disp_y, axis=1, max_disp=max_disp)
    out = _axis_warp_flat(out, disp_x, axis=2, max_disp=max_disp)
    if special_mask:
        out = jnp.concatenate([out[..., 0:16] * 2.0 - 1.0, out[..., 16:]],
                              axis=-1)
    return out.astype(prev_planar.dtype)
