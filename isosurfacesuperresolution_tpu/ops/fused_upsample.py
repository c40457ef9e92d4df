"""Fold `upsample x2 -> conv3x3` into `conv3x3 (4x channels) -> pixel_shuffle`.

The EnhanceNet post-block (`models/enhancenet.py:108-118` in the reference;
`models/generators.py` here) interleaves interpolation upsampling with 3x3
convolutions.  On TPU the interpolation at 1080p costs real milliseconds
(layout-shuffling resize) and the following conv runs at the HIGH
resolution - the least efficient place for it.

Because both the upsample U (a fixed 2-tap stencil per output parity) and
the conv K are linear and translation invariant *per sub-pixel parity*,
``K * U x`` equals a single 3x3 convolution at the LOW resolution producing
all four sub-pixel outputs at once:

    z[2i+a, 2j+b]  =  (K * U x)[2i+a, 2j+b]
                   =  sum_{m,n} K'_{a,b}[m, n] x[i+m, j+n],
    K'_{a,b}[m,n]  =  sum_{d,e} W[a,d,m] W[b,e,n] K[d,e],

where ``W[a,d,m]`` is the weight of ``x[i+m]`` in ``U(x)[2i+a+d]`` - a pure
function of the interpolation mode, extracted numerically from the resize
itself (so the semantics always match `ops/resize.py`, i.e. torch
``align_corners=False``).  Support stays 3x3 because the 2x stencils touch
at most 2 neighbours.

The composed conv runs at low resolution with 4x output channels: identical
FLOPs, but ~2x better MXU efficiency than the high-res conv *plus* the
resize disappears.  Composition is exact in the interior; only the 1-pixel
high-res border differs (the composed path edge-clamps where the reference's
conv zero-pads past the upsampled edge).  Losses zero a 16 px border anyway
(`lossnet_unshaded.py:170-185`), so training and metrics are unaffected.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _stencil(method: str, factor: int) -> np.ndarray:
    """W[a, d, m]: weight of x[i+m] in U(x)[factor*i + a + d].

    a in [0, factor), d in {-1, 0, 1}, m in {-1, 0, 1}.  Extracted from the
    actual 1-D resize of an identity matrix so any interpolation mode
    supported by `ops/resize.py` composes correctly.
    """
    from isosurfacesuperresolution_tpu.ops.resize import resize

    H = 9
    c = H // 2
    with jax.ensure_compile_time_eval():    # callable from inside a trace
        eye = jnp.eye(H, dtype=jnp.float32)[None, :, :, None]  # (1,H,H,1)
        # resize along axis -3 only: the second H acts as width.
        S = resize(eye, size=(H * factor, H), method=method)[0, :, :, 0]
        S = np.asarray(S)                                  # (H*f, H)
    W = np.zeros((factor, 3, 3), np.float64)
    for a in range(factor):
        for di, d in enumerate((-1, 0, 1)):
            for mi, m in enumerate((-1, 0, 1)):
                W[a, di, mi] = S[factor * c + a + d, c + m]
    return W


def compose_up2x_conv3x3(kernel: jnp.ndarray, method: str) -> jnp.ndarray:
    """Compose a 2x upsample with a 3x3 HWIO kernel.

    kernel: (3, 3, Cin, Cout) -> returns (3, 3, Cin, Cout*4) whose output
    channel ``co*4 + a*2 + b`` is sub-pixel (a, b) of channel ``co`` - the
    exact order `ops/resize.pixel_shuffle` expects.
    """
    assert kernel.shape[:2] == (3, 3), kernel.shape
    W = jnp.asarray(_stencil(method, 2), kernel.dtype)     # (2, 3, 3)
    # K'[m,n,ci,co,a,b] = sum_{d,e} W[a,d,m] W[b,e,n] K[d,e,ci,co]
    kc = jnp.einsum("adm,ben,decf->mncfab", W, W, kernel)
    c3, _, cin, cout = kernel.shape
    return kc.reshape(3, 3, cin, cout * 4)


def up2x_conv_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """Per-channel bias replicated over the 4 sub-pixels (order (co,a,b))."""
    return jnp.repeat(bias, 4)


def upsample_stencil_kernel(channels: int, method: str,
                            factor: int) -> jnp.ndarray:
    """A (3, 3, C, C*factor^2) kernel that IS the plain upsample.

    Composes the identity 1x1 conv with the interpolation stencils; running
    it at low resolution + pixel_shuffle reproduces
    ``resize(x, scale=factor, method=method)`` away from the 1-px border
    (edge-clamped there).  Used to keep the residual-reconstruction
    4x upsample gather/shuffle-free.
    """
    W = jnp.asarray(_stencil(method, factor), jnp.float32)  # (f, 3, 3)
    eye = jnp.eye(channels, dtype=jnp.float32)
    # y[f*i+a] = sum_m W[a, d=0, m] x[i+m]  (d=0 term only: no conv).
    w0 = W[:, 1, :]                                        # (f, 3)
    # kernel[m, n, ci, co*f*f + a*f + b] = w0[a, m] w0[b, n] eye[ci, co]
    k = jnp.einsum("am,bn,cf->mncfab", w0, w0, eye)
    return k.reshape(3, 3, channels, channels * factor * factor)


def compose_planar_conv3x3(kernel: jnp.ndarray
                           ) -> "list[tuple[jnp.ndarray, tuple]]":
    """Express `conv3x3 AFTER pixel_shuffle(2)` as 4 planar convs.

    ``z = conv3x3(PS(y))`` with y (..., H, W, 4*Cin) planar and kernel
    (3, 3, Cin, Cout) equals, for each output sub-pixel (a, b):

        z_{a,b}[i,j] = sum_{d,e} K[d,e] y_{(a+d)%2,(b+e)%2}[i+(a+d)//2, ...]

    i.e. a 2x2-support conv over the PLANAR channels - no interleave, and
    the conv runs at the low resolution where the MXU is ~4x more efficient
    (measured: 6.3 ms vs 15 ms for PS+conv at 1080p/64ch).

    Returns four ``(kernel (2,2,4*Cin,Cout), ((pt,pb),(pl,pr)))`` entries in
    sub-pixel order (a, b) = (0,0),(0,1),(1,0),(1,1); run each with its
    padding and interleave the 4 outputs channel-wise (cheap minor reshape)
    to recover the planar (..., H, W, 4*Cout) result.

    Planar channel order is (c, a, b) c-major: index c*4 + a*2 + b - the
    `ops/resize.pixel_shuffle` convention.
    """
    assert kernel.shape[:2] == (3, 3), kernel.shape
    cin, cout = kernel.shape[2], kernel.shape[3]
    K = kernel
    out = []
    for a in range(2):
        for b in range(2):
            kc = jnp.zeros((2, 2, 4 * cin, cout), kernel.dtype)
            m_offs = (-1, 0) if a == 0 else (0, 1)
            n_offs = (-1, 0) if b == 0 else (0, 1)
            for mi, m in enumerate(m_offs):
                for ni, n in enumerate(n_offs):
                    for ap in range(2):
                        for bp in range(2):
                            d = 2 * m + ap - a
                            e = 2 * n + bp - b
                            if abs(d) > 1 or abs(e) > 1:
                                continue
                            src = K[d + 1, e + 1]          # (Cin, Cout)
                            idx = jnp.arange(cin) * 4 + ap * 2 + bp
                            kc = kc.at[mi, ni, idx, :].set(src)
            pad_m = (1, 0) if a == 0 else (0, 1)
            pad_n = (1, 0) if b == 0 else (0, 1)
            out.append((kc, (pad_m, pad_n)))
    return out


def planar_conv_after_shuffle(y: jnp.ndarray, kernel: jnp.ndarray,
                              bias: "jnp.ndarray | None" = None,
                              dtype=None) -> jnp.ndarray:
    """Apply `conv3x3(PS(y))` in planar space (see compose_planar_conv3x3).

    y : (..., H, W, 4*Cin) planar; kernel (3, 3, Cin, Cout); returns
    (..., H, W, 4*Cout) planar, channel order (c, a, b).  Matches the
    interleaved path in the interior; the 1-px planar border sees zero
    padding on both paths but through different taps.
    """
    dtype = dtype or y.dtype
    parts = []
    for kc, (pm, pn) in compose_planar_conv3x3(kernel):
        z = jax.lax.conv_general_dilated(
            y.astype(dtype), kc.astype(dtype), (1, 1), (pm, pn),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        parts.append(z)
    z = jnp.stack(parts, axis=-1)              # (..., H, W, Cout, 4)
    z = z.reshape(*z.shape[:-2], z.shape[-2] * 4)
    if bias is not None:
        z = z + jnp.repeat(bias, 4).astype(dtype)
    return z
