"""Screen-space ambient occlusion post-pass (gather-free).

Parity target: `GPURenderer/ShadowFX.cpp:23-134` - the reference's CPU SSAO
used with ``--ao screen``: a hemisphere kernel around each pixel's view-space
position, depth-buffer comparisons with a range check, writing the AO
channel.

TPU-native formulation: instead of projecting a per-pixel view-space kernel
(which needs scattered depth fetches), occlusion is accumulated over a fixed
set of SCREEN-SPACE offsets at several radii - each sample is a static image
shift (pure VPU).  A neighbour occludes when it is sufficiently closer to the
camera than the center depth minus a slope-dependent bias; the range check
discards far-disconnected geometry like the reference
(`ShadowFX.cpp:96-110`).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _shift2d(img: jnp.ndarray, dy: int, dx: int, fill: float) -> jnp.ndarray:
    """Static 2D shift with constant fill: out[y, x] = img[y+dy, x+dx]."""
    h, w = img.shape[0], img.shape[1]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(img, ((py1, py0), (px1, px0)),
                     constant_values=fill)
    return padded[py0:py0 + h, px0:px0 + w]


@partial(jax.jit, static_argnames=("samples", "radius_px"))
def apply_screen_ao(frame: jnp.ndarray, samples: int = 16,
                    radius_px: int = 16, strength: float = 1.0,
                    depth_range: float = 0.02,
                    bias: float = 1e-4) -> jnp.ndarray:
    """Compute SSAO from a 12-channel G-buffer and write its AO channel.

    frame : (H, W, 12); uses NDC depth (ch 7) and mask (ch 3).
    samples offsets spiral over ``radius_px`` at golden-angle spacing.
    """
    depth = frame[..., 7]
    mask = frame[..., 3] > 0.5
    # background depth = +inf so it never occludes
    d = jnp.where(mask, depth, jnp.inf)

    occ = jnp.zeros_like(depth)
    golden = math.pi * (3.0 - math.sqrt(5.0))
    for i in range(samples):
        r = radius_px * math.sqrt((i + 0.5) / samples)
        ang = i * golden
        dy = int(round(r * math.sin(ang)))
        dx = int(round(r * math.cos(ang)))
        if dy == 0 and dx == 0:
            dx = 1
        nd = _shift2d(d, dy, dx, jnp.inf)
        diff = d - nd                    # > 0: neighbour closer to camera
        occluding = (diff > bias) & (diff < depth_range)
        occ = occ + occluding.astype(jnp.float32)
    ao = 1.0 - strength * occ / samples
    ao = jnp.clip(ao, 0.0, 1.0)
    ao = jnp.where(mask, ao, 1.0)
    return frame.at[..., 10].set(ao)
