"""Grid sampling (torch `F.grid_sample` parity) in NHWC.

The temporal warp of the frame-recurrent network is built on this op
(`models/videotools.py:81` in the reference).  Semantics implemented:
bilinear interpolation, ``zeros`` padding, ``align_corners=False`` (the torch
default used by the reference's `warp_upscale`).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = False) -> jnp.ndarray:
    """Sample ``img`` (..., H, W, C) at normalized grid locations.

    grid : (..., Hg, Wg, 2) with grid[..., 0] = x in [-1, 1] indexing width
           and grid[..., 1] = y indexing height (torch convention).
    Returns (..., Hg, Wg, C).  Out-of-range samples contribute zeros.
    """
    H, W = img.shape[-3], img.shape[-2]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        # batched fancy indexing: leading dims of img and grid must agree
        if img.ndim == 3:
            v = img[yc, xc, :]
        else:
            # (B, H, W, C) with (B, Hg, Wg) indices
            b = jnp.arange(img.shape[0]).reshape(
                (-1,) + (1,) * (yc.ndim - 1))
            v = img[b, yc, xc, :]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
