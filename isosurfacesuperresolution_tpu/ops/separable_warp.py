"""Gather-free image resampling: dense interpolation matrices + matmuls.

Why this exists: XLA:TPU lowers arbitrary gathers to ~0.5 us *per index*
(measured ~2M rows/s on v5e regardless of table size or locality), which
makes texture-style sampling three orders of magnitude too slow.  TPUs are
built for matmuls, so this module expresses 1D linear interpolation at
arbitrary positions as multiplication with a dense 2-tap weight matrix
(built with broadcast compares on the VPU, consumed by the MXU) - the
foundation of the sweep renderer (`render/sweep.py`) and the separable
homography warp that replaces per-pixel `grid_sample` in the hot path.

Out-of-range positions get zero weight, matching the volume sampler's
"outside = 0" convention.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def interp_matrix(positions: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """Dense linear-interpolation matrix W with W @ f == f(positions).

    positions : (..., P) continuous *cell-centered* sample coordinates: the
        stored value f[i] sits at coordinate i + 0.5 (the volume sampling
        convention of `volume/grid.py`).
    Returns (..., P, in_size) weights: each row has (up to) two taps
    summing to 1 inside the domain, and fades to 0 outside.
    """
    p = positions - 0.5
    i = jnp.arange(in_size, dtype=positions.dtype)
    # hat function: weight of source i for position p is max(0, 1 - |p - i|)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p[..., :, None] - i))
    return w


def resample_1d(f: jnp.ndarray, positions: jnp.ndarray,
                axis: int = -1) -> jnp.ndarray:
    """Linear resample of ``f`` along ``axis`` at shared positions (P,)."""
    f = jnp.moveaxis(f, axis, -1)
    w = interp_matrix(positions, f.shape[-1])        # (P, N)
    out = jnp.einsum("...n,pn->...p", f, w,
                     preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, -1, axis)


def scale_translate_2d(img: jnp.ndarray,
                       x_positions: jnp.ndarray,
                       y_positions: jnp.ndarray) -> jnp.ndarray:
    """Separable resample of (X, Y) at the outer product of positions.

    Returns (len(x_positions), len(y_positions)):
      out[i, j] = img(x_positions[i], y_positions[j])  (bilinear, 0 outside).
    The per-slice primitive of the perspective shear-warp sweep: every slice
    maps to the intermediate image by an axis-aligned scale + translate, so
    one (S, X) and one (T, Y) weight matrix suffice - two MXU matmuls,
    no gathers.
    """
    wx = interp_matrix(x_positions, img.shape[0])    # (S, X)
    wy = interp_matrix(y_positions, img.shape[1])    # (T, Y)
    tmp = jnp.dot(wx, img, preferred_element_type=jnp.float32)      # (S, Y)
    return jnp.dot(tmp, wy.T, preferred_element_type=jnp.float32)   # (S, T)


def rowwise_resample(f: jnp.ndarray, positions: jnp.ndarray,
                     chunk: int = 64) -> jnp.ndarray:
    """Per-row 1D resampling: out[r, j, c] = f[r, :, c](positions[r, j]).

    f : (R, N, C); positions : (R, P) cell-centered coordinates into N.
    The building block of the two-pass homography warp: each row gets its
    own dense weight matrix, shared across channels; rows are processed in
    chunks so the transient (chunk, P, N) weight tensor stays small.
    """
    r, n, c = f.shape
    p = positions.shape[1]
    pad_r = (-r) % chunk
    if pad_r:
        f = jnp.pad(f, ((0, pad_r), (0, 0), (0, 0)))
        positions = jnp.pad(positions, ((0, pad_r), (0, 0)))
    rr = f.shape[0]
    f_blocks = f.reshape(rr // chunk, chunk, n, c)
    pos_blocks = positions.reshape(rr // chunk, chunk, p)

    def one_block(args):
        fb, pb = args
        w = interp_matrix(pb, n)                      # (chunk, P, N)
        return jnp.einsum("rpn,rnc->rpc", w, fb,
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(one_block, (f_blocks, pos_blocks))
    out = out.reshape(rr, p, c)
    return out[:r]


def homography_apply(h: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a 3x3 homography to broadcastable (u, v) -> (s, t)."""
    denom = h[2, 0] * u + h[2, 1] * v + h[2, 2]
    s = (h[0, 0] * u + h[0, 1] * v + h[0, 2]) / denom
    t = (h[1, 0] * u + h[1, 1] * v + h[1, 2]) / denom
    return s, t


def homography_warp(img: jnp.ndarray, h: jnp.ndarray,
                    out_shape: Tuple[int, int],
                    chunk: int = 64) -> jnp.ndarray:
    """Warp (S, T, C) by homography (u,v) -> (s,t); returns (U, V, C).

    out[u, v] = img(s(u, v), t(u, v)) with bilinear interpolation and zero
    outside.  Two-pass separable (Catmull-Smith): pass 1 resamples each t-row
    along s at s~(u, t) (the s-coordinate where the iso-t line meets the
    iso-u line), pass 2 resamples each u-column along t at t(u, v).
    All coordinates are cell-centered (pixel i at coordinate i + 0.5).

    Degenerate configurations (near-90-degree rotations, where the two-pass
    factorization bottlenecks) are outside this renderer's use: the sweep
    geometry bounds the warp well away from them.
    """
    S, T = img.shape[0], img.shape[1]
    U, V = out_shape
    uu = jnp.arange(U, dtype=jnp.float32) + 0.5      # output u grid
    vv = jnp.arange(V, dtype=jnp.float32) + 0.5
    tt = jnp.arange(T, dtype=jnp.float32) + 0.5      # source t rows

    # pass 1: G[u, t] = img(s~(u, t), t).
    # s~(u, t): for fixed u, (s, t) traces a line as v varies:
    #   s = (a u + b v + c)/(g u + h v + i), t = (d u + e v + f)/(...)
    # solve v from t, substitute into s.
    a, b, c = h[0, 0], h[0, 1], h[0, 2]
    d, e, f = h[1, 0], h[1, 1], h[1, 2]
    g, hh_, i_ = h[2, 0], h[2, 1], h[2, 2]
    # t * (g u + h v + i) = d u + e v + f  =>  v = (t(g u + i) - d u - f) /
    #                                               (e - t h)
    den_v = e - tt[None, :] * hh_                     # (1, T)
    v_of_ut = ((tt[None, :] * (g * uu[:, None] + i_)
                - d * uu[:, None] - f) / den_v)       # (U, T)
    den_s = g * uu[:, None] + hh_ * v_of_ut + i_
    s_of_ut = (a * uu[:, None] + b * v_of_ut + c) / den_s   # (U, T)

    # resample along s for each t-row: img[:, t, :] at positions s_of_ut[:, t]
    img_t_first = jnp.moveaxis(img, 1, 0)             # (T, S, C)
    G = rowwise_resample(img_t_first, s_of_ut.T, chunk=chunk)  # (T, U, C)
    G = jnp.moveaxis(G, 0, 1)                         # (U, T, C)

    # pass 2: out[u, v] = G[u, :](t(u, v))
    den = g * uu[:, None] + hh_ * vv[None, :] + i_
    t_of_uv = (d * uu[:, None] + e * vv[None, :] + f) / den   # (U, V)
    return rowwise_resample(G, t_of_uv, chunk=chunk)  # (U, V, C)
