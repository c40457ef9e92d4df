"""ctypes wrapper over the native volume-IO library.

The native analogue of the reference's C++ importer layer
(`ExternalImporter.cpp`); see ``volumeio.cpp`` for the exported C ABI.
Importing this module raises if the shared library cannot be built/loaded -
callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

from isosurfacesuperresolution_tpu.native.build import ensure_built

_FMT = {"UCHAR": 0, "BYTE": 0, "USHORT": 1, "FLOAT": 2}
_ITEMSIZE = {"UCHAR": 1, "BYTE": 1, "USHORT": 2, "FLOAT": 4}

_lib = ctypes.CDLL(ensure_built())
_lib.load_raw.argtypes = [
    ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ctypes.POINTER(ctypes.c_float)]
_lib.load_raw.restype = ctypes.c_int
_lib.brick_minmax.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_float)]
_lib.brick_minmax.restype = ctypes.c_int


def load_raw(path: str, resolution: Tuple[int, int, int], fmt: str,
             downsampling: int = 1,
             lower_threshold: float = 0.001) -> np.ndarray:
    """Decode + box-filter a raw volume natively -> (X, Y, Z) float32."""
    fmt = fmt.upper()
    rx, ry, rz = resolution
    payload = rx * ry * rz * _ITEMSIZE[fmt]
    header = os.path.getsize(path) - payload
    if header < 0:
        raise ValueError(f"File is too small, {-header} bytes missing")
    ox, oy, oz = rx // downsampling, ry // downsampling, rz // downsampling
    out = np.empty((ox, oy, oz), np.float32)
    rc = _lib.load_raw(
        path.encode(), header, rx, ry, rz, _FMT[fmt], downsampling,
        lower_threshold, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise OSError(f"native load_raw failed with code {rc} for {path}")
    return out


def brick_minmax(values: np.ndarray, brick_size: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Native apron-conservative brick min/max (same contract as
    `volume.grid.compute_brick_minmax`)."""
    values = np.ascontiguousarray(values, np.float32)
    X, Y, Z = values.shape
    b = brick_size
    shape = ((X + b - 1) // b, (Y + b - 1) // b, (Z + b - 1) // b)
    out_min = np.empty(shape, np.float32)
    out_max = np.empty(shape, np.float32)
    rc = _lib.brick_minmax(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), X, Y, Z, b,
        out_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise OSError(f"native brick_minmax failed with code {rc}")
    return out_min, out_max
