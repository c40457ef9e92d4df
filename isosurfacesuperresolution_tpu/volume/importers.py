"""Volume ingestion: .dat/RAW descriptors, npy/npz volumes, cvol brick files.

Parity target: `CPURenderer/ExternalImporter.cpp:25-232` - a ``.dat``
descriptor (ObjectFileName / Resolution / Format) pointing at a raw
UCHAR/USHORT/BYTE/FLOAT volume; values normalized to [0, 1], optional
box-filter downsampling, a lower threshold zeroing near-empty voxels (the
sparsification step; tolerance 0.001 at `ExternalImporter.cpp:181`), and the
unit-box world transform (`CPURenderer.cpp:448-460`).

A native C++ fast path (`native/volumeio.cpp`, built via
``python -m isosurfacesuperresolution_tpu.native.build``) accelerates the
decode + box-filter for multi-GB volumes; the numpy path is the always-
available fallback producing identical results.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from isosurfacesuperresolution_tpu.volume.grid import BrickGrid

_DTYPES = {
    "UCHAR": (np.uint8, 255.0),
    "BYTE": (np.uint8, 255.0),
    "USHORT": (np.uint16, 65535.0),
    "FLOAT": (np.float32, 1.0),
}


def parse_dat_descriptor(path: str) -> Tuple[str, Tuple[int, int, int], str]:
    """Parse a ``.dat`` descriptor (parity: `ExternalImporter.cpp:34-84`)."""
    object_file = ""
    resolution = (0, 0, 0)
    fmt = ""
    with open(path) as f:
        for line in f:
            tokens = line.split()
            if not tokens:
                continue
            key = tokens[0]
            if key == "ObjectFileName:":
                object_file = tokens[1]
            elif key == "Resolution:":
                resolution = (int(tokens[1]), int(tokens[2]), int(tokens[3]))
            elif key == "Format:":
                fmt = tokens[1].upper()
    if not object_file or resolution[0] == 0 or not fmt:
        raise ValueError(
            "Descriptor file does not contain ObjectFileName, Resolution "
            "and Format")
    if fmt not in _DTYPES:
        raise ValueError(f"Unknown format {fmt}")
    return object_file, resolution, fmt


def _load_raw_numpy(bfile: str, resolution: Tuple[int, int, int],
                    fmt: str) -> np.ndarray:
    """Read the raw payload, skipping any leading header
    (parity: `ExternalImporter.cpp:99-110`)."""
    dtype, scale = _DTYPES[fmt]
    rx, ry, rz = resolution
    count = rx * ry * rz
    payload = count * np.dtype(dtype).itemsize
    filesize = os.path.getsize(bfile)
    header = filesize - payload
    if header < 0:
        raise ValueError(f"File is too small, {-header} bytes missing")
    with open(bfile, "rb") as f:
        f.seek(header)
        data = np.fromfile(f, dtype=dtype, count=count)
    vol = data.reshape(rz, ry, rx).astype(np.float32) / scale
    # stored z-major (slice by slice); convert to (X, Y, Z)
    return vol.transpose(2, 1, 0)


def box_downsample(vol: np.ndarray, factor: int) -> np.ndarray:
    """Box-filter downsampling (parity: `ExternalImporter.cpp:135-176`,
    which averages over downsampling^3 blocks)."""
    if factor == 1:
        return vol
    x, y, z = vol.shape
    xs, ys, zs = x // factor, y // factor, z // factor
    v = vol[:xs * factor, :ys * factor, :zs * factor]
    v = v.reshape(xs, factor, ys, factor, zs, factor)
    return v.mean(axis=(1, 3, 5))


def import_raw(path: str, downsampling: int = 1,
               lower_threshold: float = 0.001,
               brick_size: int = 8,
               use_native: bool = True,
               store_dtype: str = "float32") -> BrickGrid:
    """Import a ``.dat``+raw volume into a BrickGrid.

    Values below ``lower_threshold`` are zeroed (the sparsity threshold of
    `CPURenderer.cpp` `--threshold` / `ExternalImporter.cpp:153`).
    """
    if path.endswith(".raw"):
        raise ValueError("pass the .dat descriptor, not the .raw payload "
                         "(parity with the reference CLI)")
    if not path.endswith(".dat"):
        raise ValueError("Filename does not point to the .dat file")
    object_file, resolution, fmt = parse_dat_descriptor(path)
    bfile = os.path.join(os.path.dirname(os.path.abspath(path)), object_file)

    vol = None
    if use_native:
        try:
            from isosurfacesuperresolution_tpu.native import volumeio
            vol = volumeio.load_raw(bfile, resolution, fmt, downsampling,
                                    lower_threshold)
        except (ImportError, OSError):
            vol = None
    if vol is None:
        vol = _load_raw_numpy(bfile, resolution, fmt)
        vol = box_downsample(vol, downsampling)
        vol[vol < lower_threshold] = 0.0
    return BrickGrid.from_dense(vol, brick_size=brick_size,
                                store_dtype=store_dtype)


def import_npy(path: str, brick_size: int = 8,
               lower_threshold: float = 0.0,
               store_dtype: str = "float32") -> BrickGrid:
    """Load a dense (X, Y, Z) volume from .npy/.npz."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            vol = data[list(data.keys())[0]]
    else:
        vol = np.load(path)
    vol = np.asarray(vol, np.float32)
    if lower_threshold > 0:
        vol = np.where(vol < lower_threshold, 0.0, vol)
    return BrickGrid.from_dense(vol, brick_size=brick_size,
                                store_dtype=store_dtype)


# ---------------------------------------------------------------------------
# cvol: this framework's native brick-volume interchange format
# (the analogue of GVDB's .vbx produced by `Vdb2Vbx.cpp` / `-m convert`)
# ---------------------------------------------------------------------------

def save_cvol(path: str, grid: BrickGrid) -> None:
    """Save a BrickGrid (incl. any baked AO field) as a compressed npz."""
    payload = dict(
        values=np.asarray(grid.values),
        brick_min=np.asarray(grid.brick_min),
        brick_max=np.asarray(grid.brick_max),
        bbox_min=np.asarray(grid.bbox_min),
        bbox_max=np.asarray(grid.bbox_max),
        brick_size=np.asarray(grid.brick_size),
        value_scale=np.asarray(grid.value_scale),
        value_offset=np.asarray(grid.value_offset))
    if grid.ao_sh is not None:
        payload["ao_sh"] = np.asarray(grid.ao_sh)
    np.savez_compressed(path, **payload)


def load_cvol(path: str) -> BrickGrid:
    import jax.numpy as jnp
    with np.load(path) as d:
        return BrickGrid(
            values=jnp.asarray(d["values"]),
            brick_min=jnp.asarray(d["brick_min"]),
            brick_max=jnp.asarray(d["brick_max"]),
            bbox_min=jnp.asarray(d["bbox_min"]),
            bbox_max=jnp.asarray(d["bbox_max"]),
            brick_size=int(d["brick_size"]),
            ao_sh=jnp.asarray(d["ao_sh"]) if "ao_sh" in d else None,
            value_scale=(float(d["value_scale"])
                         if "value_scale" in d else 1.0),
            value_offset=(float(d["value_offset"])
                          if "value_offset" in d else 0.0))
