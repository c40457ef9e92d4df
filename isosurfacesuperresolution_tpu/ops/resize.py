"""Image resize / pixel-(un)shuffle primitives, NHWC layout.

The framework uses NHWC throughout (TPU-friendly conv layout) whereas the
reference is NCHW torch.  Semantics follow `torch.nn.functional.interpolate`
with its default ``align_corners=False`` (half-pixel centers), which is also
what `jax.image.resize` implements - one code path serves both.

Reference counterparts: `nn.Upsample`/`F.interpolate` used by the generators
(`models/enhancenet.py:40-48`), the downsample-consistency loss
(`losses/lossbuilder.py:343-377`), and `initialImage` (`utils/initial_image.py:41`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _out_shape(x: jnp.ndarray, scale: float | None,
               size: Tuple[int, int] | None) -> Tuple[int, ...]:
    if size is not None:
        h, w = size
    else:
        h = int(round(x.shape[-3] * scale))
        w = int(round(x.shape[-2] * scale))
    return x.shape[:-3] + (h, w, x.shape[-1])


def _upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (half-pixel centers, edge clamped).

    Equivalent to torch F.interpolate(scale_factor=2, mode='bilinear') /
    jax.image.resize, but built from static shifts and fixed [1/4, 3/4]
    stencils instead of a general resize - XLA lowers this to pure VPU
    adds (no gathers), which matters inside the EnhanceNet post-block at
    1080p.
    """
    def up_axis(a, axis):
        lo = jnp.concatenate([jax.lax.slice_in_dim(a, 0, 1, axis=axis),
                              jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1,
                                                   axis=axis)], axis=axis)
        hi = jnp.concatenate([jax.lax.slice_in_dim(a, 1, a.shape[axis],
                                                   axis=axis),
                              jax.lax.slice_in_dim(a, a.shape[axis] - 1,
                                                   a.shape[axis],
                                                   axis=axis)], axis=axis)
        even = 0.75 * a + 0.25 * lo
        odd = 0.75 * a + 0.25 * hi
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(a.shape)
        new_shape[axis] *= 2
        return stacked.reshape(new_shape)

    x = up_axis(x, x.ndim - 3)
    x = up_axis(x, x.ndim - 2)
    return x


def resize(x: jnp.ndarray, *, scale: float | None = None,
           size: Tuple[int, int] | None = None,
           method: str = "bilinear") -> jnp.ndarray:
    """Resize (..., H, W, C) images; method in nearest|bilinear|bicubic."""
    # NOTE: an explicit [1/4, 3/4]-stencil 2x path (_upsample2x_bilinear)
    # was benchmarked and lost to jax.image.resize on TPU (layout shuffles
    # outweigh the gather savings); kept for reference/tests only.
    shape = _out_shape(x, scale, size)
    if method == "nearest":
        # torch 'nearest' floors source indices: src = floor(dst * in/out)
        in_h, in_w = x.shape[-3], x.shape[-2]
        out_h, out_w = shape[-3], shape[-2]
        ih = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
        iw = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
        ih = jnp.clip(ih, 0, in_h - 1)
        iw = jnp.clip(iw, 0, in_w - 1)
        return x[..., ih[:, None], iw[None, :], :]
    if method in ("bilinear", "linear"):
        return jax.image.resize(x, shape, method="linear")
    if method in ("bicubic", "cubic"):
        return jax.image.resize(x, shape, method="cubic")
    raise ValueError(f"unknown resize method {method!r}")


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(..., H, W, C*r^2) -> (..., H*r, W*r, C): torch PixelShuffle in NHWC.

    Channel order matches torch's NCHW PixelShuffle after layout conversion:
    input channel index c*r*r + dy*r + dx feeds output channel c at
    sub-pixel (dy, dx).

    TPU note: implemented as a static channel permutation (putting the
    column sub-pixel channel-major) followed by a memory-order-preserving
    reshape that merges it into W, then one small transpose for the row
    interleave.  XLA's generic 5-d transpose for the naive formulation
    costs ~8 ms at 1080p; this route measures ~0.5 ms in context.
    """
    r = factor
    *lead, h, w, c = x.shape
    cout = c // (r * r)
    # channel perm: (c, ry, rx) c-major -> (rx, c, ry)
    idx = np.arange(c)
    cc, rem = idx // (r * r), idx % (r * r)
    ry, rx = rem // r, rem % r
    tgt = (rx * cout + cc) * r + ry
    perm = np.empty(c, np.int64)
    perm[tgt] = idx
    y = x[..., perm]
    y = y.reshape(*lead, h, w * r, cout * r)       # merge (w, rx): pure
    y = y.reshape(*lead, h, w * r, cout, r)        # split (c, ry)
    y = jnp.moveaxis(y, -1, -3)                    # (..., h, ry, w*r, c)
    return y.reshape(*lead, h * r, w * r, cout)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(..., H*r, W*r, C) -> (..., H, W, C*r^2): inverse of pixel_shuffle.

    This is the reference's `VideoTools.flatten_high` (`models/videotools.py:8-25`)
    in NHWC: output channel c*r*r + dy*r + dx holds input sub-pixel (dy, dx)
    of channel c.
    """
    r = factor
    *lead, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    # inverse of the pixel_shuffle fast route: small transpose un-doing the
    # row interleave, pure reshape splitting W, static channel permutation
    y = x.reshape(*lead, h, r, wr, c)
    y = jnp.moveaxis(y, -3, -1)                    # (..., h, w*r, c, ry)
    y = y.reshape(*lead, h, w, r * c * r)          # split (w, rx): pure
    cout = c * r * r
    idx = np.arange(cout)                          # (rx, c, ry) order now
    rx, rem = idx // (c * r), idx % (c * r)
    cc, ry = rem // r, rem % r
    perm = (cc * r + ry) * r + rx                  # -> (c, ry, rx) c-major
    inv = np.empty(cout, np.int64)
    inv[perm] = idx
    return y[..., inv]
