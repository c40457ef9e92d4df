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
    eye = jnp.eye(H, dtype=jnp.float32)[None, :, :, None]  # (1, H, H, 1)
    # resize along axis -3 only: treat the second H as channels-like width.
    S = resize(eye, size=(H * factor, H), method=method)[0, :, :, 0]
    S = np.asarray(S)                                      # (H*f, H)
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
