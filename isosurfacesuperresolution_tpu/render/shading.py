"""Differentiable screen-space deferred shading.

Parity target: `utils/shading.py` in the reference - shades an unshaded
G-buffer (mask, normal, depth, AO) with ambient + two-sided diffuse + Phong
specular, constant screen-space eye direction [0, 0, 1] (the reference's
per-pixel eye-ray computation is dead code that always returns that constant,
`shading.py:123-141`), AO strength lerp with optional inversion, and
background blending by the [-1, 1] mask.

Implemented as a pure function of a :class:`ShadingConfig` so it can sit
inside jit'd loss and inference programs.  NHWC layout.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import ShadingConfig


def safe_normalize(v: jnp.ndarray, axis: int = -1,
                   epsilon: float = 1e-7) -> jnp.ndarray:
    """Zero-safe vector normalization (parity: `shading.py:193-207`).

    The max is taken *under* the square root so the gradient at exactly-zero
    vectors is zero instead of NaN (jnp.linalg.norm's gradient at 0 is NaN;
    zero vectors are guaranteed by the loss's zero-padded borders).
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    length = jnp.sqrt(jnp.maximum(sq, epsilon * epsilon))
    return v / length


def screen_space_shading(buf: jnp.ndarray, cfg: ShadingConfig) -> jnp.ndarray:
    """Shade an unshaded buffer (B, H, W, C>=5) -> RGB (B, H, W, 3).

    Channels: [0] mask in [-1, 1], [1:4] screen-space normal, [4] depth,
    [5] ambient occlusion (optional; defaults to 1).
    Parity: `utils/shading.py:148-191`.
    """
    c = buf.shape[-1]
    assert c >= 5, f"shading needs >= 5 channels, got {c}"
    mask = buf[..., 0:1]
    normal = buf[..., 1:4]
    if c >= 6:
        ao_raw = jnp.clip(buf[..., 5:6], 0.0, 1.0)
        if cfg.inverse_ao:
            ao_raw = jnp.clip(1.0 - buf[..., 5:6], 0.0, 1.0)
        ao = cfg.ao_strength * ao_raw + (1.0 - cfg.ao_strength)
    else:
        ao = jnp.ones_like(mask)

    ambient = jnp.asarray(cfg.ambient_color, buf.dtype)
    diffuse = jnp.asarray(cfg.diffuse_color, buf.dtype)
    specular = jnp.asarray(cfg.specular_color, buf.dtype)
    material = jnp.asarray(cfg.material_color, buf.dtype)
    light = jnp.asarray(cfg.light_direction, buf.dtype)
    light = light / jnp.linalg.norm(light)
    background = jnp.asarray(cfg.background, buf.dtype)

    color = jnp.broadcast_to(ambient * material,
                             buf.shape[:-1] + (3,))

    ldotn = jnp.sum(light * normal, axis=-1, keepdims=True)
    color = color + (diffuse * material) * jnp.abs(ldotn)

    if cfg.enable_specular:
        # constant screen-space eye direction [0, 0, 1] (shading.py:141)
        reflect = 2.0 * ldotn * normal - light
        spec_factor = ((cfg.specular_exponent + 2) / (2.0 * math.pi)) * (
            jnp.clip(reflect[..., 2:3], 0.0, 1.0) ** cfg.specular_exponent)
        color = color + spec_factor * specular

    color = color * ao

    # background lerp by mask moved from [-1,1] to [0,1]
    t = jnp.clip(mask * 0.5 + 0.5, 0.0, 1.0)
    color = background + t * (color - background)
    return jnp.clip(color, 0.0, 1.0)
