"""Bricked volume grid: the TPU-native stand-in for GVDB / OpenVDB.

The reference stores sparse volumes in GVDB's pool+atlas structure
(`third-party/include/gvdb`, fed by `Vdb2Vbx.cpp:70-324`) or OpenVDB trees
(`CPURenderer/IsoVolumeRayTracer.h`).  On TPU, random pointer-chasing through
a tree is hostile to the vector units, so the design is:

* one dense, padded 3D array of values in HBM (XYZ order, channels of one),
* a per-brick min/max summary grid used for empty-space skipping during the
  ray march (the analogue of GVDB's node-level DDA), and
* a world transform that normalizes the volume into a unit box, matching the
  reference's grid normalization (`CPURenderer.cpp:448-460`,
  `GPURenderer.cpp:464-488`).

Brick min/max (instead of a boolean occupancy at a fixed isovalue) keeps the
skip structure valid for *any* isovalue, which the interactive app changes per
frame (`GPURendererDirect.cpp:411-412`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


DEFAULT_BRICK_SIZE = 8  # voxels per brick side (GVDB leaf bricks are 8^3:
                        # 5-4-3 config in Vdb2Vbx.cpp:72)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BrickGrid:
    """A dense volume with a brick-level min/max pyramid.

    Attributes
    ----------
    values : (X, Y, Z) float32 array of densities.
    brick_min / brick_max : (X/b, Y/b, Z/b) float32 per-brick value bounds
        (over the brick's voxels *plus a one-voxel apron*, so trilinear
        samples taken inside a brick are bounded even when the stencil
        straddles the boundary - the analogue of GVDB's atlas apron,
        `Vdb2Vbx.cpp:150`).
    bbox_min / bbox_max : (3,) world-space axis-aligned bounds of the volume.
    brick_size : static int, voxels per brick side.
    """

    values: jnp.ndarray
    brick_min: jnp.ndarray
    brick_max: jnp.ndarray
    bbox_min: jnp.ndarray
    bbox_max: jnp.ndarray
    brick_size: int = DEFAULT_BRICK_SIZE
    # optional baked SH-L1 occlusion field (X, Y, Z, 4) for fast AO
    # (see render/ao_sweep.py); None = not baked
    ao_sh: "jnp.ndarray | None" = None
    # compact-storage dequantization: physical = stored * scale + offset.
    # ``values`` may be float32 (scale 1), bfloat16, or uint8 (the RAW
    # importer's native dtype, `ExternalImporter.cpp:94-118`); uint8 at
    # 1024^3 is 1 GB of HBM instead of 4.  Static so XLA folds the
    # constants into the sampling code.
    value_scale: float = 1.0
    value_offset: float = 0.0
    # same affine compact storage for the baked AO field: ``ao_sh`` may
    # be uint8 (physical = stored * ao_scale + ao_offset).  At 1024^3
    # the bf16 field is 8.6 GB and the renderer's per-axis transpose
    # copy pushed the render compile out of HBM (r4_perf_ao1024b.log);
    # uint8 halves both, with the dequant applied per-slice/tile in the
    # samplers exactly like value_scale.  ``ao_scale``/``ao_offset`` may
    # be scalars (one affine map for all 4 SH channels) or length-4
    # tuples (per-channel quantization: the directional coefficients
    # have a much smaller dynamic range than the mean channel, so a
    # global scale wastes most of the uint8 steps on them).
    ao_scale: "float | tuple" = 1.0
    ao_offset: "float | tuple" = 0.0
    # >1: ``ao_sh`` is stored at 1/f resolution per axis (occlusion is a
    # hemisphere integral, inherently band-limited; the half-res bake at
    # 1024^3 was ALREADY the field's true content - the full-res copy
    # was a host-upsampled blow-up of it).  The tiled capture kernel
    # samples the coarse field directly (quarter the pass-2 DMA+matmul
    # work at f=2); non-tiled paths upsample on device at render time.
    ao_downsample: int = 1

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        children = (self.values, self.brick_min, self.brick_max,
                    self.bbox_min, self.bbox_max, self.ao_sh)
        return children, (self.brick_size, self.value_scale,
                          self.value_offset, self.ao_scale,
                          self.ao_offset, self.ao_downsample)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:5], brick_size=aux[0], ao_sh=children[5],
                   value_scale=aux[1], value_offset=aux[2],
                   ao_scale=aux[3], ao_offset=aux[4],
                   ao_downsample=aux[5] if len(aux) > 5 else 1)

    # -- compact storage -----------------------------------------------------
    def dequant(self, stored: jnp.ndarray) -> jnp.ndarray:
        """Stored-dtype values -> physical float32 densities."""
        x = stored.astype(jnp.float32)
        if self.value_scale != 1.0:
            x = x * jnp.float32(self.value_scale)
        if self.value_offset != 0.0:
            x = x + jnp.float32(self.value_offset)
        return x

    # -- derived quantities --------------------------------------------------
    @property
    def resolution(self) -> Tuple[int, int, int]:
        return tuple(self.values.shape)

    @property
    def voxel_size(self) -> jnp.ndarray:
        """World-space size of one voxel (3,)."""
        res = jnp.asarray(self.values.shape, jnp.float32)
        return (self.bbox_max - self.bbox_min) / res

    def world_to_voxel(self, p: jnp.ndarray) -> jnp.ndarray:
        """Map world positions (..., 3) to continuous voxel coordinates.

        Voxel coordinate v means a position v voxels from the bbox minimum;
        the sample stored at integer index i sits at voxel coordinate i + 0.5
        (cell-centered, like GVDB's atlas sampling in `render_kernel.cu:69-71`).
        """
        res = jnp.asarray(self.values.shape, jnp.float32)
        return (p - self.bbox_min) / (self.bbox_max - self.bbox_min) * res

    def voxel_to_world(self, v: jnp.ndarray) -> jnp.ndarray:
        res = jnp.asarray(self.values.shape, jnp.float32)
        return v / res * (self.bbox_max - self.bbox_min) + self.bbox_min

    # -- sampling ------------------------------------------------------------
    def sample_trilinear(self, vox: jnp.ndarray) -> jnp.ndarray:
        """Trilinear sample at continuous voxel coordinates (..., 3).

        Out-of-bounds samples return 0 (empty space), matching GVDB's
        behaviour outside allocated nodes (`render_kernel.cu:60-66`).
        """
        return sample_trilinear(self.values, vox,
                                scale=self.value_scale,
                                offset=self.value_offset)

    def sample_nearest(self, vox: jnp.ndarray) -> jnp.ndarray:
        shape = jnp.asarray(self.values.shape, jnp.int32)
        idx = jnp.floor(vox).astype(jnp.int32)
        inside = jnp.all((idx >= 0) & (idx < shape), axis=-1)
        idx = jnp.clip(idx, 0, shape - 1)
        v = self.dequant(self.values[idx[..., 0], idx[..., 1], idx[..., 2]])
        return jnp.where(inside, v, 0.0)

    def brick_max_at(self, vox: jnp.ndarray) -> jnp.ndarray:
        """Max value of the brick containing voxel coordinate (..., 3).

        Out-of-bounds positions report -inf so empty space outside the volume
        is always skippable.
        """
        b = self.brick_size
        bshape = jnp.asarray(self.brick_max.shape, jnp.int32)
        idx = jnp.floor(vox / b).astype(jnp.int32)
        inside = jnp.all((idx >= 0) & (idx < bshape), axis=-1)
        idx = jnp.clip(idx, 0, bshape - 1)
        v = self.brick_max[idx[..., 0], idx[..., 1], idx[..., 2]]
        return jnp.where(inside, v, -jnp.inf)

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_dense(cls,
                   values: np.ndarray | jnp.ndarray,
                   brick_size: int = DEFAULT_BRICK_SIZE,
                   normalize_box: bool = True,
                   bbox: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                   store_dtype: str = "float32",
                   ) -> "BrickGrid":
        """Build a BrickGrid from a dense (X, Y, Z) array.

        With ``normalize_box=True`` the volume is scaled uniformly so its
        longest side spans 1 world unit, centered at the origin - parity with
        the unit-box normalization of `CPURenderer.cpp:448-460`.

        ``store_dtype``: HBM storage of the density array - ``float32``
        (exact), ``bfloat16`` (half the footprint, ~3e-3 relative error) or
        ``uint8`` (quarter footprint, affine-dequantized over the value
        range - the dtype RAW UCHAR datasets arrive in anyway).
        """
        raw_in = values
        # Preprocessing (quantization + skip pyramid) runs host-side in
        # numpy: a device-side brick reshape of a 1024^3 volume tile-pads
        # the trailing brick dim 8 -> 128 under the TPU (8,128) layout, a
        # 16x HBM blowup (observed: 64 GiB for a 4 GiB volume).  Only the
        # final stored array + small pyramid are transferred.
        values = np.asarray(values, np.float32)
        if values.ndim != 3:
            raise ValueError(f"expected 3D volume, got shape {values.shape}")
        res = np.asarray(values.shape, np.float32)
        if bbox is not None:
            bbox_min = jnp.asarray(bbox[0], jnp.float32)
            bbox_max = jnp.asarray(bbox[1], jnp.float32)
        elif normalize_box:
            longest = float(res.max())
            half = res / longest / 2.0
            bbox_min = jnp.asarray(-half, jnp.float32)
            bbox_max = jnp.asarray(half, jnp.float32)
        else:
            bbox_min = jnp.zeros(3, jnp.float32)
            bbox_max = jnp.asarray(res, jnp.float32)

        scale, offset = 1.0, 0.0
        if store_dtype == "float32":
            stored = values
        elif store_dtype == "bfloat16":
            import ml_dtypes
            stored = values.astype(ml_dtypes.bfloat16)
        elif store_dtype == "uint8":
            if (isinstance(raw_in, np.ndarray) and raw_in.dtype == np.uint8):
                # RAW UCHAR data: keep the importer's bytes bit-exact with
                # the conventional /255 normalization
                stored = raw_in
                scale = 1.0 / 255.0
            else:
                vmin = float(values.min())
                vmax = float(values.max())
                span = max(vmax - vmin, 1e-12)
                q = np.round((values - vmin) / span * 255.0)
                stored = np.clip(q, 0, 255).astype(np.uint8)
                scale = span / 255.0
                offset = vmin
        else:
            raise ValueError(f"unknown store_dtype {store_dtype!r}")
        # the skip pyramid bounds the DEQUANTIZED physical values (what the
        # renderer actually samples) so culling stays conservative after
        # quantization
        physical = stored.astype(np.float32) * np.float32(scale) \
            + np.float32(offset)
        brick_min, brick_max = compute_brick_minmax(physical, brick_size)
        stored = jnp.asarray(stored)
        return cls(values=stored, brick_min=brick_min, brick_max=brick_max,
                   bbox_min=bbox_min, bbox_max=bbox_max,
                   brick_size=brick_size,
                   value_scale=scale, value_offset=offset)


def sample_trilinear(values: jnp.ndarray, vox: jnp.ndarray,
                     scale: float = 1.0, offset: float = 0.0) -> jnp.ndarray:
    """Trilinear interpolation of a dense (X, Y, Z) volume.

    ``vox`` holds continuous voxel coordinates (..., 3) where the voxel stored
    at integer index i is centered at coordinate i + 0.5.  Samples outside the
    volume return 0 (empty space), the same convention as GVDB returning 0 for
    unallocated nodes (`render_kernel.cu:60-66`).

    The gather is expressed through flat dynamic indexing, which XLA lowers to
    a single gather op - the TPU analogue of the reference's `tex3D` hardware
    fetches (`render_kernel.cu:172`).
    """
    shape = values.shape
    X, Y, Z = shape
    p = vox - 0.5  # shift so integer coords hit voxel centers
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)

    # validity of the 8 stencil corners is handled by clamping + zero weight
    # outside: a corner outside the volume contributes (physical) value 0.
    def corner(dx, dy, dz):
        idx = i0 + jnp.array([dx, dy, dz], jnp.int32)
        inside = ((idx[..., 0] >= 0) & (idx[..., 0] < X)
                  & (idx[..., 1] >= 0) & (idx[..., 1] < Y)
                  & (idx[..., 2] >= 0) & (idx[..., 2] < Z))
        ic = jnp.clip(idx, 0, jnp.asarray([X - 1, Y - 1, Z - 1], jnp.int32))
        flat = (ic[..., 0] * Y + ic[..., 1]) * Z + ic[..., 2]
        v = jnp.take(values.reshape(-1), flat).astype(jnp.float32)
        if scale != 1.0:
            v = v * jnp.float32(scale)
        if offset != 0.0:
            v = v + jnp.float32(offset)
        return jnp.where(inside, v, 0.0)

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c000 = corner(0, 0, 0); c100 = corner(1, 0, 0)
    c010 = corner(0, 1, 0); c110 = corner(1, 1, 0)
    c001 = corner(0, 0, 1); c101 = corner(1, 0, 1)
    c011 = corner(0, 1, 1); c111 = corner(1, 1, 1)

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def compute_brick_minmax(values: jnp.ndarray, brick_size: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-brick min/max with a one-voxel apron on every side.

    The apron makes the bounds conservative for trilinear interpolation at
    brick boundaries: a sample inside brick B interpolates voxels up to one
    index outside B, so B's bounds must include them.
    """
    b = brick_size
    # Host-side numpy: a device pool would reshape the volume into
    # (X/b, b, Y/b, b, Z/b, b), whose trailing brick dim the TPU (8,128)
    # layout pads 8 -> 128, a 16x HBM blowup (64 GiB at 1024^3 f32).
    # The pyramid is one-time preprocessing, so it belongs on the host.
    values = np.asarray(values, np.float32)
    X, Y, Z = values.shape
    px = (-X) % b
    py = (-Y) % b
    pz = (-Z) % b
    # pad with edge values so padding never widens the true range
    v = np.pad(values, ((0, px), (0, py), (0, pz)), mode="edge")

    def pool(v, op, pad_val):
        # min/max over (b+2)^3 windows positioned at brick starts - 1
        # (brick core + one-voxel apron).  Separable: sliding window of
        # length b+2 with stride b along each axis in turn; the apron
        # pad value is the op's identity so it never widens the range.
        out = np.pad(v, 1, mode="constant", constant_values=pad_val)
        for ax in range(3):
            nb = v.shape[ax] // b
            acc = None
            sl = [slice(None)] * 3
            for d in range(b + 2):
                sl[ax] = slice(d, d + (nb - 1) * b + 1, b)
                part = out[tuple(sl)]
                if acc is None:
                    acc = part.copy()
                else:
                    op(acc, part, out=acc)
            out = acc
        return out

    bmin = pool(v, np.minimum, np.inf)
    bmax = pool(v, np.maximum, -np.inf)
    return jnp.asarray(bmin), jnp.asarray(bmax)
