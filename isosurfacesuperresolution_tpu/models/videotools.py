"""Temporal core: inverse pixel-shuffle flattening + flow warping.

Parity target: `models/videotools.py` in the reference - `flatten_high`
(`:8-25`) and `warp_upscale` (`:51-87`) including its flow sign conventions
(flow_x scaled by -2, flow_y by +2), the [-1, 1] linspace grid offsets, and
the ``special_mask`` trick that shifts the mask channel to [0, 1] so that
zero-padding outside the frame decodes back to mask = -1 (background).

All tensors are NHWC: images (B, H, W, C), flow (B, H, W, 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from isosurfacesuperresolution_tpu.ops.resize import pixel_unshuffle, resize
from isosurfacesuperresolution_tpu.ops.sampling import grid_sample


def flatten_high(image_high: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r^2): inverse PixelShuffle.

    Channel order matches the reference's `flatten_high` after NCHW->NHWC
    conversion: output channel c*r*r + dy*r + dx holds sub-pixel (dy, dx) of
    input channel c.
    """
    return pixel_unshuffle(image_high, upscale_factor)


def _grid_offsets(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) base grid in [-1, 1]; [..., 0] = x, [..., 1] = y.

    Uses linspace(-1, 1, n) like the reference (`videotools.py:37-43`)
    even though grid_sample uses align_corners=False - this exact pairing is
    what the reference networks were trained with, so it is kept.
    """
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)          # (H, W) each
    return jnp.stack([gx, gy], axis=-1)


def warp_upscale(image_high: jnp.ndarray, flow_low: jnp.ndarray,
                 upscale_factor: int, special_mask: bool = False
                 ) -> jnp.ndarray:
    """Warp a high-res image by upsampled low-res screen-space flow.

    image_high : (B, H*r, W*r, C)
    flow_low   : (B, H, W, 2) with channels (flow_x, flow_y) as produced by
                 the renderer (0.5 * (ndc_cur - ndc_prev)).
    special_mask : treat channel 0 as the mask in [-1, 1]; it is shifted to
                 [0, 1] before sampling so the zero padding outside the frame
                 reads back as mask = -1 (`videotools.py:77-85`).
    """
    b, h, w, c2 = flow_low.shape
    assert c2 == 2

    flow = jnp.stack([flow_low[..., 0] * -2.0, flow_low[..., 1] * 2.0],
                     axis=-1)
    flow_high = resize(flow, scale=float(upscale_factor), method="bilinear")
    hh, wh = flow_high.shape[1], flow_high.shape[2]

    grid = _grid_offsets(hh, wh, flow_high.dtype)[None] + flow_high

    if special_mask:
        image_high = jnp.concatenate(
            [image_high[..., 0:1] * 0.5 + 0.5, image_high[..., 1:]], axis=-1)
    warped = grid_sample(image_high, grid)
    if special_mask:
        warped = jnp.concatenate(
            [warped[..., 0:1] * 2.0 - 1.0, warped[..., 1:]], axis=-1)
    return warped


def initial_image(current_input: jnp.ndarray, channels: int, mode: str,
                  ao_inverted: bool = False, upscaling: int = 4
                  ) -> jnp.ndarray:
    """First-frame stand-in for the recurrent previous-frame input.

    Parity: `utils/initial_image.py:5-54`.
    current_input : (B, H, W, Cin) low-res input.
    """
    b, h, w, cin = current_input.shape
    hh, wh = h * upscaling, w * upscaling
    dtype = current_input.dtype

    if mode == "zero":
        return jnp.zeros((b, hh, wh, channels), dtype)
    if mode == "unshaded":
        if channels == 5:
            defaults = [-1.0, 0.0, 0.0, 1.0, 0.5]
        elif channels == 6:
            defaults = [-1.0, 0.0, 0.0, 1.0, 0.5,
                        0.0 if ao_inverted else 1.0]
        else:
            raise ValueError(
                "for mode='unshaded', channels is expected to be 5 or 6")
        d = jnp.asarray(defaults, dtype).reshape(1, 1, 1, channels)
        return jnp.broadcast_to(d, (b, hh, wh, channels))
    if mode == "input":
        up = resize(current_input, scale=float(upscaling), method="bilinear")
        if channels == cin:
            return up
        if channels < cin:
            return up[..., :channels]
        pad = jnp.ones((b, hh, wh, channels - cin), dtype)
        return jnp.concatenate([up, pad], axis=-1)
    raise ValueError("unknown input mode: " + mode)
