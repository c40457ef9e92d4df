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


def apply_sn_tree(params: Any) -> Any:
    """Spectrally normalize every conv/dense ``kernel`` leaf of a param tree.

    The functional analogue of the reference's ``apply_sn(model)``
    (`utils/apply_sn.py:4-13`), which recursively wraps every Conv2d/Linear
    of the *generator* in torch's spectral_norm when ``--useSN`` is set
    (`mainVideoUnshaded.py:334-339`).  Here the model stays unchanged and
    the normalization is applied to the parameters right before
    ``model.apply`` - gradients flow through the power iteration exactly as
    they do through torch's buffered u/v vectors.
    """
    def norm(path, leaf):
        name = getattr(path[-1], "key", None) if path else None
        if name == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return spectral_normalize(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(norm, params)


class SpectralNormalizedModule:
    """Proxy around a Flax generator that normalizes kernels per forward.

    Returned by ``models.create_network`` when ``ModelConfig.use_sn`` is
    set; the param tree is identical to the unwrapped module's, so
    checkpoints are interchangeable (the normalization is a pure function
    of the raw weights).
    """

    def __init__(self, inner: nn.Module):
        self.inner = inner

    def apply(self, params, *args, **kwargs):
        return self.inner.apply(apply_sn_tree(params), *args, **kwargs)

    def init(self, *args, **kwargs):
        return self.inner.init(*args, **kwargs)

    def __getattr__(self, name: str) -> Any:
        return getattr(self.inner, name)


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
