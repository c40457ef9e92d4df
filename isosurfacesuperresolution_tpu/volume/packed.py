"""Sparse packed-tile volume storage: the TPU-native GVDB atlas.

GVDB's whole point is that real volumes (Ejecta, RM - the reference's
evaluation datasets, `mainPSNR3_AllStats.py:29-40`) are sparse: it stores
only occupied leaf bricks in a texture atlas and walks a node tree to find
them (`third-party/include/gvdb/gvdb_volume_gvdb.h`, built by
`Vdb2Vbx.cpp:70-324`).  The dense `BrickGrid` + occupancy-gated tiled sweep
(`render/sweep_pallas_tiled.py`) already culls *compute* to the occupied
fraction; this module makes the *storage* sparse too.

TPU-shaped design - no trees, no per-ray pointer chasing:

* The sweep consumes the volume as (Z, X, Y) slice-major planes cut into
  static (TX, TY) tiles, so the natural sparse unit is one slice tile:
  a (TX, TY) plane of one z.  All tiles that differ from the background
  value are packed into a flat ``atlas`` of shape (N, TX, TY); a dense
  int32 ``slots`` table of shape (Z, NTX, NTY) maps each tile to its atlas
  slot, with slot 0 reserved for the all-background tile.
* The Pallas kernel's per-pair DMA then reads ``atlas[slot]`` instead of a
  dense window - a scalar-prefetched indirection, the moral equivalent of
  GVDB's node lookup, but resolved OUTSIDE the kernel as two small SMEM
  index rows per slice (see `sweep_pallas_tiled.march_pallas_packed`).
* The sweep's major axis follows the camera (3 static permutations,
  `render/sweep.py:_PERMS`), so the volume is packed once per axis at
  build time.  Three atlases cost 3x the occupied bytes - still far below
  dense for real volumes (Ejecta at ~8 % slice-tile occupancy: 0.24x
  dense), and they also delete the per-frame whole-volume transpose the
  dense path pays inside the camera switch.

Occupancy here means "any voxel in the tile differs from the background
STORED value" (0 for float storage; stored byte 0 for uint8) - independent
of the runtime isovalue, so one packing serves every isovalue the
interactive app sweeps through (`GPURendererDirect.cpp:411-412`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.volume.grid import (
    DEFAULT_BRICK_SIZE, BrickGrid, compute_brick_minmax)

# permutations taking the original (X, Y, Z) axes to sweep order with the
# major axis LAST; must match render/sweep.py:_PERMS
SWEEP_PERMS = ((1, 2, 0), (0, 2, 1), (0, 1, 2))


def pick_tile(extent: int, tile: int) -> int:
    """Largest divisor of ``extent`` not exceeding ``tile`` - must match
    `sweep_pallas_tiled.march_pallas_tiled._pick` so packed tiles line up
    with the kernel's DMA blocks."""
    for cand in range(min(tile, extent), 0, -1):
        if extent % cand == 0:
            return cand
    return extent


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedAxisVolume:
    """One axis order's packed tiles.

    atlas : (N, TX, TY) stored-dtype tile planes; slot 0 is all background.
    slots : (Z, NTX, NTY) int32 atlas slot per (z, x-tile, y-tile).
    slice_max : (Z,) float32 per-plane max of the stored values - what the
        dense sweep computes as ``values.max(axis=(0, 1))`` for its
        per-slice culling flags (`render/sweep.py` slice_meta).
    shape : static (Z, X, Y) extents of the permuted slice-major volume.
    """

    atlas: jnp.ndarray
    slots: jnp.ndarray
    slice_max: jnp.ndarray
    shape: Tuple[int, int, int]

    def tree_flatten(self):
        return (self.atlas, self.slots, self.slice_max), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])

    @property
    def tile_shape(self) -> Tuple[int, int]:
        return tuple(self.atlas.shape[1:])

    def to_dense_zxy(self) -> np.ndarray:
        """Reassemble the dense (Z, X, Y) stored-dtype volume (tests)."""
        atlas = np.asarray(self.atlas)
        slots = np.asarray(self.slots)
        Z, X, Y = self.shape
        TX, TY = atlas.shape[1:]
        NTX, NTY = X // TX, Y // TY
        tiles = atlas[slots]                     # (Z, NTX, NTY, TX, TY)
        return (tiles.transpose(0, 1, 3, 2, 4)
                .reshape(Z, X, Y))


def pack_axis(vol_zxy: np.ndarray, tile: int = 256,
              background: float = 0,
              tolerance: float = 0.0) -> PackedAxisVolume:
    """Pack one slice-major (Z, X, Y) stored-dtype array.

    ``tolerance`` is the reference importer's threshold-to-sparse knob
    (`ExternalImporter.cpp:181`, default 0.001 there): a tile whose values
    all sit within ``tolerance`` of the background is dropped entirely
    (reconstructs as exact background).  Default 0 = lossless packing.
    """
    Z, X, Y = vol_zxy.shape
    TX, TY = pick_tile(X, tile), pick_tile(Y, tile)
    NTX, NTY = X // TX, Y // TY
    view = (vol_zxy.reshape(Z, NTX, TX, NTY, TY)
            .transpose(0, 1, 3, 2, 4))           # (Z, NTX, NTY, TX, TY)
    if tolerance > 0.0 and not np.issubdtype(vol_zxy.dtype, np.integer):
        occ = (np.abs(view.astype(np.float32) - background)
               > tolerance).any(axis=(3, 4))     # (Z, NTX, NTY)
    else:
        occ = (view != background).any(axis=(3, 4))
    n_occ = int(occ.sum())
    atlas = np.empty((n_occ + 1, TX, TY), dtype=vol_zxy.dtype)
    atlas[0] = background
    atlas[1:] = view[occ]
    slots = np.zeros((Z, NTX, NTY), np.int32)
    slots[occ] = np.arange(1, n_occ + 1, dtype=np.int32)
    slice_max = vol_zxy.max(axis=(1, 2)).astype(np.float32)
    return PackedAxisVolume(jnp.asarray(atlas), jnp.asarray(slots),
                            jnp.asarray(slice_max), (Z, X, Y))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedAOAxisVolume:
    """Packed baked-AO (SH-L1) tiles for one sweep axis.

    The baked occlusion field (`render/ao_sweep.bake_occlusion_sh`) is zero
    everywhere far from the surface (mean = 0, g = 0 -> AO = 1), so only
    the surface shell needs storage.  Tiles whose 4 SH channels are all
    within ``tolerance`` of zero are dropped; slot 0 is the all-zero
    background tile, exactly like the density atlas.

    atlas : (N, 4, TX, TY) SH tiles ([mean, gx, gy, gz] channel-major so
        the kernel's per-pair DMA is one contiguous-band copy per plane).
    slots : (Z, NTX, NTY) int32 atlas slot per (z, x-tile, y-tile).
    shape : static (Z, X, Y) extents of the permuted field.
    """

    atlas: jnp.ndarray
    slots: jnp.ndarray
    shape: Tuple[int, int, int]

    def tree_flatten(self):
        return (self.atlas, self.slots), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def tile_shape(self) -> Tuple[int, int]:
        return tuple(self.atlas.shape[2:])

    def to_dense_zcxy(self) -> np.ndarray:
        """Reassemble the dense (Z, 4, X, Y) field (tests)."""
        atlas = np.asarray(self.atlas)
        slots = np.asarray(self.slots)
        Z, X, Y = self.shape
        TX, TY = atlas.shape[2:]
        tiles = atlas[slots]              # (Z, NTX, NTY, 4, TX, TY)
        return (tiles.transpose(0, 3, 1, 4, 2, 5)
                .reshape(Z, 4, X, Y))


def pack_ao_axis(ao_zcxy: np.ndarray, tile: int = 128,
                 tolerance: float = 1e-3,
                 dtype=np.float32) -> PackedAOAxisVolume:
    """Pack one slice-major (Z, 4, X, Y) baked-AO field.

    Occupancy is self-describing - "any SH channel differs from zero by
    more than ``tolerance`` somewhere in the tile" - so the packing needs
    no isovalue and stays valid for any camera.  AO tiles default to a
    finer tile than the density atlas: the shell of non-zero occlusion
    hugs the surface, and at 256-wide tiles a 512^3 volume has only 2x2
    tiles per slice (nothing to cull).
    """
    Z, C, X, Y = ao_zcxy.shape
    assert C == 4, f"expected 4 SH channels, got {C}"
    TX, TY = pick_tile(X, tile), pick_tile(Y, tile)
    NTX, NTY = X // TX, Y // TY
    view = (ao_zcxy.reshape(Z, C, NTX, TX, NTY, TY)
            .transpose(0, 2, 4, 1, 3, 5))       # (Z, NTX, NTY, 4, TX, TY)
    occ = (np.abs(view.astype(np.float32))
           > tolerance).any(axis=(3, 4, 5))     # (Z, NTX, NTY)
    n_occ = int(occ.sum())
    atlas = np.zeros((n_occ + 1, C, TX, TY), dtype=dtype)
    atlas[1:] = view[occ].astype(dtype)
    slots = np.zeros((Z, NTX, NTY), np.int32)
    slots[occ] = np.arange(1, n_occ + 1, dtype=np.int32)
    return PackedAOAxisVolume(jnp.asarray(atlas), jnp.asarray(slots),
                              (Z, X, Y))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseBrickGrid:
    """Sparse-storage drop-in for `BrickGrid` on the tiled sweep path.

    Keeps the brick min/max pyramid (small, dense - the skip structure)
    and the world transform, but replaces the dense value array with one
    `PackedAxisVolume` per sweep axis.  Only ``renderer='sweep_pallas'``
    (tiled) can render it; the march/scan paths need dense values - use
    :meth:`to_brick_grid` for oracles and tests.
    """

    per_axis: Tuple[PackedAxisVolume, PackedAxisVolume, PackedAxisVolume]
    brick_min: jnp.ndarray
    brick_max: jnp.ndarray
    bbox_min: jnp.ndarray
    bbox_max: jnp.ndarray
    resolution: Tuple[int, int, int]
    brick_size: int = DEFAULT_BRICK_SIZE
    value_scale: float = 1.0
    value_offset: float = 0.0
    # dense baked AO is never stored here; a packed per-axis AO atlas is
    # (see `attach_packed_ao` / `pack_ao_axis`)
    ao_sh: Optional[jnp.ndarray] = None
    ao_per_axis: Optional[Tuple[PackedAOAxisVolume, ...]] = None

    def tree_flatten(self):
        children = (self.per_axis, self.brick_min, self.brick_max,
                    self.bbox_min, self.bbox_max, self.ao_sh,
                    self.ao_per_axis)
        aux = (self.resolution, self.brick_size, self.value_scale,
               self.value_offset)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(per_axis=children[0], brick_min=children[1],
                   brick_max=children[2], bbox_min=children[3],
                   bbox_max=children[4], ao_sh=children[5],
                   ao_per_axis=children[6],
                   resolution=aux[0], brick_size=aux[1],
                   value_scale=aux[2], value_offset=aux[3])

    # -- BrickGrid-compatible world transform -------------------------------
    @property
    def voxel_size(self) -> jnp.ndarray:
        res = jnp.asarray(self.resolution, jnp.float32)
        return (self.bbox_max - self.bbox_min) / res

    def world_to_voxel(self, p: jnp.ndarray) -> jnp.ndarray:
        res = jnp.asarray(self.resolution, jnp.float32)
        return (p - self.bbox_min) / (self.bbox_max - self.bbox_min) * res

    def voxel_to_world(self, v: jnp.ndarray) -> jnp.ndarray:
        res = jnp.asarray(self.resolution, jnp.float32)
        return v / res * (self.bbox_max - self.bbox_min) + self.bbox_min

    def dequant(self, stored: jnp.ndarray) -> jnp.ndarray:
        x = stored.astype(jnp.float32)
        if self.value_scale != 1.0:
            x = x * jnp.float32(self.value_scale)
        if self.value_offset != 0.0:
            x = x + jnp.float32(self.value_offset)
        return x

    # -- storage accounting ---------------------------------------------------
    def storage_bytes(self) -> int:
        """Bytes of the packed value storage (all 3 axes + slot tables,
        including the packed AO atlases when attached)."""
        total = 0
        for pa in self.per_axis:
            total += pa.atlas.size * pa.atlas.dtype.itemsize
            total += pa.slots.size * 4
        for pa in (self.ao_per_axis or ()):
            total += pa.atlas.size * pa.atlas.dtype.itemsize
            total += pa.slots.size * 4
        return total

    def dense_bytes(self) -> int:
        X, Y, Z = self.resolution
        return X * Y * Z * self.per_axis[0].atlas.dtype.itemsize

    # -- conversions ----------------------------------------------------------
    @classmethod
    def from_brick_grid(cls, grid: BrickGrid, tile: int = 256,
                        tolerance: float = 0.0,
                        ao_tile: int = 128) -> "SparseBrickGrid":
        """Pack a dense BrickGrid's stored values (host-side, numpy).

        When the grid carries a baked AO field (``grid.ao_sh`` from
        `render/ao_sweep.attach_baked_ao`), the field is packed per axis
        too (`pack_ao_axis`) so the sparse renderer keeps the full
        reference G-buffer without a dense (Z, 4, X, Y) array in HBM."""
        stored = np.asarray(grid.values)
        per_axis = []
        ao_per_axis = [] if grid.ao_sh is not None else None
        ao = (np.asarray(grid.ao_sh) if grid.ao_sh is not None else None)
        if ao is not None and ao.dtype == np.uint8:
            # quantized field (grid.ao_scale/ao_offset, possibly
            # per-channel (4,) vectors): dequantize on the host before
            # packing - the packed-atlas kernels stream at their matmul
            # dtype and carry no affine
            ao = (ao.astype(np.float32)
                  * np.asarray(grid.ao_scale, np.float32)
                  + np.asarray(grid.ao_offset, np.float32))
        if ao is not None and grid.ao_downsample > 1:
            # the packed AO atlas indexes tiles in fine voxel space;
            # upsample a coarse bake back to full resolution first
            # (cell-center aligned, matching ao_sweep's host upsample)
            from isosurfacesuperresolution_tpu.render.ao_sweep import (
                _upsample1d_linear)
            ao = ao.astype(np.float32)
            for axis, n in enumerate(stored.shape):
                ao = _upsample1d_linear(ao, axis, n, grid.ao_downsample)
        for perm in SWEEP_PERMS:
            vol_p = np.transpose(stored, perm)          # (X', Y', Z')
            vol_zxy = np.ascontiguousarray(
                np.transpose(vol_p, (2, 0, 1)))          # (Z', X', Y')
            per_axis.append(pack_axis(vol_zxy, tile=tile,
                                      tolerance=tolerance))
            if ao is not None:
                ao_p = np.transpose(ao, perm + (3,))     # (X', Y', Z', 4)
                ao_zcxy = np.ascontiguousarray(
                    np.transpose(ao_p, (2, 3, 0, 1)))    # (Z', 4, X', Y')
                ao_per_axis.append(pack_ao_axis(ao_zcxy, tile=ao_tile))
        return cls(per_axis=tuple(per_axis),
                   brick_min=grid.brick_min, brick_max=grid.brick_max,
                   bbox_min=grid.bbox_min, bbox_max=grid.bbox_max,
                   resolution=tuple(int(s) for s in grid.values.shape),
                   brick_size=grid.brick_size,
                   value_scale=grid.value_scale,
                   value_offset=grid.value_offset,
                   ao_per_axis=(tuple(ao_per_axis)
                                if ao_per_axis is not None else None))

    @classmethod
    def from_dense(cls, values, tile: int = 256, tolerance: float = 0.0,
                   **kw) -> "SparseBrickGrid":
        """`BrickGrid.from_dense` arguments + packing."""
        return cls.from_brick_grid(BrickGrid.from_dense(values, **kw),
                                   tile=tile, tolerance=tolerance)

    def to_brick_grid(self) -> BrickGrid:
        """Reassemble a dense BrickGrid (tests / march-oracle paths)."""
        # axis 2's perm is identity: (Z, X, Y) -> (X, Y, Z)
        dense_zxy = self.per_axis[2].to_dense_zxy()
        values = jnp.asarray(np.transpose(dense_zxy, (1, 2, 0)))
        ao_sh = self.ao_sh
        if ao_sh is None and self.ao_per_axis is not None:
            ao_zcxy = self.ao_per_axis[2].to_dense_zcxy()  # (Z, 4, X, Y)
            ao_sh = jnp.asarray(np.transpose(ao_zcxy, (2, 3, 0, 1)))
        return BrickGrid(values=values, brick_min=self.brick_min,
                         brick_max=self.brick_max, bbox_min=self.bbox_min,
                         bbox_max=self.bbox_max, brick_size=self.brick_size,
                         value_scale=self.value_scale,
                         value_offset=self.value_offset, ao_sh=ao_sh)
