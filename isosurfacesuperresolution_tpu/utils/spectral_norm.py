"""Spectral normalization for discriminator layers.

Parity target: `utils/apply_sn.py` - the reference recursively wraps conv and
linear layers of its discriminators in torch's spectral_norm.  Torch keeps a
persistent power-iteration vector; in functional JAX a *stateless* power
iteration (fixed start vector, a few iterations per forward) is the idiomatic
equivalent: deterministic, jit-friendly, no mutable collections threaded
through the discriminator update.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def spectral_normalize(w: jnp.ndarray, iterations: int = 5,
                       eps: float = 1e-12) -> jnp.ndarray:
    """Divide a weight by its leading singular value (power iteration).

    Conv kernels (HWIO) are flattened to (in_features, out) like torch's
    reshape of OIHW to (O, -1) transposed.
    """
    mat = w.reshape(-1, w.shape[-1])
    u = jnp.ones((mat.shape[-1],), w.dtype) / jnp.sqrt(mat.shape[-1])

    def body(_, u):
        v = mat @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), eps)
        u = mat.T @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), eps)
        return u

    u = jax.lax.fori_loop(0, iterations, body, u)
    v = mat @ u
    sigma = jnp.linalg.norm(v)
    return w / jnp.maximum(sigma, eps)


class SNConv(nn.Conv):
    """nn.Conv with spectrally normalized kernel."""

    def param(self, name: str, init_fn, *init_args, **kw):
        p = super().param(name, init_fn, *init_args, **kw)
        if name == "kernel":
            p = spectral_normalize(p)
        return p


class SNDense(nn.Dense):
    """nn.Dense with spectrally normalized kernel."""

    def param(self, name: str, init_fn, *init_args, **kw):
        p = super().param(name, init_fn, *init_args, **kw)
        if name == "kernel":
            p = spectral_normalize(p)
        return p
