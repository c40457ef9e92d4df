"""On-device flow inpainting.

The reference inpaints flow with OpenCV's Navier-Stokes inpainting over
``mask == 0`` *on the CPU*, forcing a GPU->CPU->GPU round trip every frame
(`inference/loadedmodel.py:77-82`; its necessity is documented in
`CPURenderer/FlowTest.py:66-69` - warping needs flow values in a band just
outside the rendered mask).  Here the fill runs on-device as an iterative
diffusion: each pass assigns to still-empty pixels the valid-neighbour
average of a 3x3 window, growing the filled region one pixel per pass.
A fixed pass count keeps the op jit-compatible; ``iterations`` bounds the
width of the inpainted band, which is all warping needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over 3x3 neighbourhoods (zero padded), NHWC."""
    y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return (y[:, :-2, 1:-1] + y[:, 1:-1, 1:-1] + y[:, 2:, 1:-1]
            + y[:, :-2, :-2] + y[:, 1:-1, :-2] + y[:, 2:, :-2]
            + y[:, :-2, 2:] + y[:, 1:-1, 2:] + y[:, 2:, 2:])


def inpaint_flow(flow: jnp.ndarray, mask: jnp.ndarray,
                 iterations: int = 8) -> jnp.ndarray:
    """Fill flow outside the mask by diffusion from valid pixels.

    flow : (B, H, W, 2) screen-space flow (defined where mask == 1).
    mask : (B, H, W, 1) in {0, 1} (or [0,1]; > 0.5 counts as valid).
    Returns flow with a band of ~``iterations`` pixels filled outside the
    mask; pixels farther outside keep value 0 (harmless: nothing valid is
    warped from there).
    """
    valid = (mask > 0.5).astype(flow.dtype)
    filled = flow * valid

    def body(_, state):
        filled, valid = state
        s = _box_sum(filled)
        c = _box_sum(valid)
        avg = s / jnp.maximum(c, 1.0)
        newly = (valid < 0.5) & (c > 0.5)
        filled = jnp.where(newly, avg, filled)
        valid = jnp.where(newly, 1.0, valid)
        return filled, valid

    filled, _ = jax.lax.fori_loop(0, iterations, body, (filled, valid))
    return filled
