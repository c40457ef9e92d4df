"""Baked directional-occlusion ambient occlusion (gather-free).

The reference computes AO by casting up to 512 hemisphere rays per pixel
through GVDB per frame (`render_kernel.cu:109-146`).  On TPU that path
(`raycast.compute_ao`) is gather-bound and only practical for tiny tests;
generating one 512^2 training frame with 256 AO samples would take hours.

This module bakes the occlusion *once per (volume, isovalue)* into a
spherical-harmonics-L1 field and lets the sweep renderer sample it like a
second density channel - fully regular, ~zero per-frame cost:

1.  For D Fibonacci-sphere directions d, the per-voxel occlusion along d is
        occ_d(v) = max_k inside(v + t_k d) * (1 - f(t_k)),
    with f(t) = smoothstep(1, 0, radius / t) - the exact value the
    reference's AO ray returns for a first hit at distance t_k (the max
    realizes "first hit" because 1 - f decreases with distance).
    Each step is a GLOBAL translation of the volume (trilinear shift by
    t_k * d): three 1-D lerps of rolled arrays - no gathers.
2.  The D occlusion fields project onto SH-L1:
        mean(v)  = E_d[occ_d(v)],   g(v) = 3 E_d[occ_d(v) d]
    so occ(v, d) ~= mean + g . d.
3.  The cosine-weighted hemisphere integral around surface normal n has the
    closed form  AO(v, n) = 1 - mean(v) - (2/3) g(v) . n,
    which the renderer evaluates elementwise from the captured fields.

Accuracy: SH-L1 is the standard low-order approximation of directional
visibility; `tests/test_ao_sweep.py` bounds the error against the exact
hemisphere-ray AO on analytic volumes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.volume.grid import BrickGrid


def fibonacci_sphere(n: int) -> np.ndarray:
    """n roughly-uniform unit directions."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], -1).astype(np.float32)


def _shift_volume(v: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of v at (grid + offset): value(p) = v(p + offset).

    offset (3,) in voxels; implemented as three axis lerps of rolled/padded
    arrays (regular memory access).  Out-of-range reads are 0.
    """
    out = v
    for axis in range(3):
        o = offset[axis]
        i0 = jnp.floor(o).astype(jnp.int32)
        frac = o - i0

        def shift_int(a, k, axis=axis):
            # a shifted by integer k along axis with zero fill:
            # out[i] = a[i + k]
            n = a.shape[axis]
            rolled = jnp.roll(a, -k, axis)
            idx = jnp.arange(n) + k
            valid = (idx >= 0) & (idx < n)
            shape = [1, 1, 1]
            shape[axis] = n
            return rolled * valid.reshape(shape)

        out = ((1.0 - frac) * shift_int(out, i0)
               + frac * shift_int(out, i0 + 1))
    return out


def _smoothstep_1_0(x: jnp.ndarray) -> jnp.ndarray:
    t = jnp.clip(1.0 - x, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


@partial(jax.jit, static_argnames=("num_dirs", "num_steps"))
def bake_occlusion_sh(values: jnp.ndarray, isovalue: float | jnp.ndarray,
                      ao_radius_voxels: float | jnp.ndarray,
                      num_dirs: int = 32, num_steps: int = 16,
                      max_range_factor: float = 8.0) -> jnp.ndarray:
    """Bake SH-L1 occlusion fields: (X, Y, Z, 4) = [mean, gx, gy, gz].

    values : dense (X, Y, Z) volume; isovalue/radius as in the renderer
    (radius in voxel units here).  Sample distances are log-spaced from the
    CONTACT range (max(0.75 voxel, radius/16) - occluders touching the
    surface dominate AO) out to ``max_range_factor * radius / 2``; the
    reference marches the full secondary ray (`render_kernel.cu:109-146`)
    and its smoothstep falloff makes far hits negligible.  An earlier
    revision started at radius/2, which skipped every occluder nearer than
    half a radius and flattened AO to ~1 at large radii.
    """
    dirs = jnp.asarray(fibonacci_sphere(num_dirs))
    iso = jnp.asarray(isovalue, jnp.float32)
    radius = jnp.asarray(ao_radius_voxels, jnp.float32)

    # log-spaced sample distances: contact range -> a few radii.  The max
    # over steps realizes "first hit", so dense near sampling is safe.  The
    # 2-voxel floor is the bake's analogue of the oracle's ao_bias surface
    # offset: occ is evaluated at voxel centers (including voxels just
    # inside the material, which the surface trilerp mixes in), so
    # sub-2-voxel samples read the surface's own material as a full
    # occluder in every direction and AO collapses.  Radius-scaled floors
    # fail the other way: radius/2 (the original) skipped every occluder
    # nearer than half a radius and flattened AO to ~1 at large radii.
    t0 = jnp.maximum(jnp.asarray(2.0, jnp.float32), radius / 16.0)
    t1 = jnp.maximum(radius * max_range_factor / 2.0, t0 * 1.5)
    ks = jnp.arange(1, num_steps + 1, dtype=jnp.float32) / num_steps
    ts = t0 * (t1 / t0) ** ks

    def occ_for_dir(d):
        def step(occ, t):
            shifted = _shift_volume(values, d * t)
            inside = (shifted >= iso).astype(jnp.float32)
            w = 1.0 - _smoothstep_1_0(radius / jnp.maximum(t, 1e-6))
            return jnp.maximum(occ, inside * w), None

        occ, _ = jax.lax.scan(step, jnp.zeros_like(values), ts)
        return occ

    def accumulate(carry, d):
        mean, g = carry
        occ = occ_for_dir(d)
        return (mean + occ / num_dirs,
                g + 3.0 * occ[..., None] * d / num_dirs), None

    (mean, g), _ = jax.lax.scan(
        accumulate,
        (jnp.zeros_like(values), jnp.zeros(values.shape + (3,))), dirs)
    return jnp.concatenate([mean[..., None], g], axis=-1)


def ao_from_sh(sh: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Evaluate AO from captured SH fields (..., 4) and normals (..., 3).

    AO(n) = clip(1 - mean - (2/3) g . n): the cosine-weighted hemisphere
    integral of the SH-L1 visibility.
    """
    ao = 1.0 - sh[..., 0] - (2.0 / 3.0) * jnp.sum(sh[..., 1:4] * normal, -1)
    return jnp.clip(ao, 0.0, 1.0)


def _upsample1d_linear(a: "np.ndarray", axis: int, n_out: int,
                       factor: int) -> "np.ndarray":
    """Host-side linear upsampling along one axis (cell-center aligned:
    coarse center j+0.5 maps to fine (j+0.5)*factor)."""
    import numpy as np
    if factor == 2 and n_out == 2 * a.shape[axis]:
        # Specialized factor-2 path: fixed 0.25/0.75 weights as pure
        # slice arithmetic.  The general np.take gather below walks a
        # 17 GB array with axis-strided fancy indexing at 1024^3 and
        # took ~40 min of 1-core host time (r4_perf_ao1024b.log); this
        # formulation is plain contiguous passes (~minutes).
        #   even fine i=2j: pos=j-0.25 -> 0.25*a[j-1] + 0.75*a[j]
        #   odd  fine i=2j+1: pos=j+0.25 -> 0.75*a[j] + 0.25*a[j+1]
        # with clamped (constant) extrapolation at both edges.
        sl = [slice(None)] * a.ndim

        def ax(s):
            t = list(sl)
            t[axis] = s
            return tuple(t)

        prev = np.concatenate([a[ax(slice(0, 1))],
                               a[ax(slice(None, -1))]], axis=axis)
        nxt = np.concatenate([a[ax(slice(1, None))],
                              a[ax(slice(-1, None))]], axis=axis)
        even = 0.25 * prev + 0.75 * a
        odd = 0.75 * a + 0.25 * nxt
        out_shape = list(a.shape)
        out_shape[axis] = n_out
        out = np.empty(out_shape, np.float32)
        out[ax(slice(0, None, 2))] = even
        out[ax(slice(1, None, 2))] = odd
        return out
    pos = (np.arange(n_out, dtype=np.float64) + 0.5) / factor - 0.5
    # Clamp the sample position BEFORE deriving index/weight: for fine
    # positions below the first coarse center (pos < 0) the unclamped
    # weight stayed ~0.75 with i0 == i1 - 1 == 0, blending 75% of the
    # SECOND coarse cell into the first factor/2 boundary layers (the
    # edge was non-monotonic).  With pos clamped both edges degrade to
    # constant extrapolation.
    pos = np.clip(pos, 0.0, a.shape[axis] - 1.0)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.clip(i0 + 1, 0, a.shape[axis] - 1)
    w = (pos - i0).astype(np.float32)
    shape = [1] * a.ndim
    shape[axis] = n_out
    w = w.reshape(shape)
    return (np.take(a, i0, axis) * (1.0 - w)
            + np.take(a, i1, axis) * w)


def attach_baked_ao(grid: BrickGrid, isovalue: float, ao_radius_world: float,
                    num_dirs: int = 32, num_steps: int = 12,
                    downsample: int = 1,
                    out_dtype=None,
                    keep_coarse: bool = False) -> BrickGrid:
    """Return a copy of ``grid`` carrying the baked SH occlusion field.

    ``ao_radius_world`` is the renderer's world-space AO radius
    (RenderConfig.ao_radius); it converts to voxels via the grid transform.

    ``downsample`` > 1 bakes at reduced resolution: occlusion is a
    hemisphere integral, inherently low-frequency, so a half-res bake
    loses almost nothing while cutting the bake's dense-f32 working set
    8x.  This is what makes 1024^3 + AO fit on one chip (the full-res
    bake carries ~6 dense f32 copies = 26 GB there).  By default the
    coarse field is linearly upsampled back on the host;
    ``keep_coarse=True`` instead attaches the coarse field itself with
    ``ao_downsample=f`` - the tiled capture kernel samples it directly
    (quarter the pass-2 work and 1/f^3 the field HBM at f=2, with
    byte-identical information content: the upsample added none).
    ``out_dtype`` (e.g. jnp.bfloat16) quantizes the attached field; the
    sweep kernels stream it at their matmul dtype anyway.
    """
    import jax
    import numpy as np

    radius_vox = float(ao_radius_world) / float(grid.voxel_size[0])
    f = int(downsample)

    def quantize_u8(sh_np):
        """Per-channel affine uint8 quantization of the SH field (mirror
        of the volume's value_scale storage): physical[..., c] =
        q[..., c] * scale[c] + offset[c].  Per-channel because the
        directional coefficients g have a much smaller dynamic range
        than the mean channel - one global scale wastes most of their
        uint8 steps (round-4 advisor finding).  SH-L1 fields are bounded
        and smooth, so the <= step/2 error is far below the bake's own
        SH-L1 approximation error (tests bound it)."""
        lo = sh_np.min(axis=(0, 1, 2))
        hi = sh_np.max(axis=(0, 1, 2))
        scale = np.maximum((hi - lo) / 255.0, 1e-8)
        q = np.clip(np.round((sh_np - lo) / scale), 0, 255).astype(
            np.uint8)
        return q, tuple(float(s) for s in scale), tuple(float(v)
                                                        for v in lo)

    if f <= 1:
        sh = bake_occlusion_sh(grid.dequant(grid.values), isovalue,
                               radius_vox, num_dirs=num_dirs,
                               num_steps=num_steps)
        if out_dtype is not None and np.dtype(out_dtype) == np.uint8:
            q, scale, lo = quantize_u8(np.asarray(sh, np.float32))
            return dataclasses.replace(grid, ao_sh=jnp.asarray(q),
                                       ao_scale=scale, ao_offset=lo,
                                       ao_downsample=1)
        if out_dtype is not None:
            sh = sh.astype(out_dtype)
        return dataclasses.replace(grid, ao_sh=sh,
                                   ao_scale=1.0, ao_offset=0.0,
                                   ao_downsample=1)

    X, Y, Z = grid.values.shape
    if X % f or Y % f or Z % f:
        raise ValueError(f"downsample {f} must divide the volume shape "
                         f"{(X, Y, Z)} (volumes are brick-padded)")

    # Pool on the HOST.  The previous on-device
    #   reshape(X//f, f, Y//f, f, Z//f, f).mean((1, 3, 5))
    # dies at 1024^3: the trailing dim of 2 is tile-padded to 128 under
    # the TPU (8, 128) layout, turning a 4 GiB temp into a 256 GiB
    # allocation (same bug class as the round-2 brick-pyramid reshape;
    # log: artifacts/logs/r3_perf_ao.log).  numpy slab-pooling keeps the
    # host working set < ~0.5 GiB and the affine dequant commutes with
    # the mean, so it is applied to the pooled result.
    v_np = np.asarray(grid.values)
    Xc, Yc, Zc = X // f, Y // f, Z // f
    ds_np = np.empty((Xc, Yc, Zc), np.float32)
    slab = max(1, 128 // f)
    for x0 in range(0, Xc, slab):
        x1 = min(Xc, x0 + slab)
        blk = v_np[x0 * f:x1 * f].astype(np.float32)
        ds_np[x0:x1] = blk.reshape(x1 - x0, f, Yc, f, Zc, f).mean((1, 3, 5))
    if grid.value_scale != 1.0:
        ds_np *= np.float32(grid.value_scale)
    if grid.value_offset != 0.0:
        ds_np += np.float32(grid.value_offset)
    ds = jnp.asarray(ds_np)
    sh = bake_occlusion_sh(ds, isovalue, radius_vox / f,
                           num_dirs=num_dirs, num_steps=num_steps)
    sh_np = np.asarray(sh, np.float32)
    del sh, ds
    if not keep_coarse:
        for axis, n in ((0, X), (1, Y), (2, Z)):
            sh_np = _upsample1d_linear(sh_np, axis, n, f)
    fd = f if keep_coarse else 1
    if out_dtype is not None and np.dtype(out_dtype) == np.uint8:
        q, scale, lo = quantize_u8(sh_np)
        return dataclasses.replace(grid, ao_sh=jnp.asarray(q),
                                   ao_scale=scale, ao_offset=lo,
                                   ao_downsample=fd)
    if out_dtype is not None:
        sh_np = sh_np.astype(np.dtype(out_dtype))  # bf16 via ml_dtypes
    return dataclasses.replace(grid, ao_sh=jnp.asarray(sh_np),
                               ao_scale=1.0, ao_offset=0.0,
                               ao_downsample=fd)
