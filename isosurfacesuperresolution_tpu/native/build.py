"""Build the native extensions.

Usage: ``python -m isosurfacesuperresolution_tpu.native.build``
Produces ``_volumeio.so`` (raw volume decode, OpenMP) and ``_vdbio.so``
(OpenVDB file-format decode, zlib) next to this file (g++ shared libs
consumed through ctypes - no pybind11 in this image).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "volumeio.cpp")
OUT = os.path.join(HERE, "_volumeio.so")
VDB_SRC = os.path.join(HERE, "vdbio.cpp")
VDB_OUT = os.path.join(HERE, "_vdbio.so")


def _compile(src: str, out: str, extra, verbose: bool) -> str:
    cmd = (["g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", src, "-o", out] + list(extra))
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def build(verbose: bool = True) -> str:
    _compile(SRC, OUT, ["-fopenmp"], verbose)
    _compile(VDB_SRC, VDB_OUT, ["-lz"], verbose)
    return OUT


def _ensure(src: str, out: str, extra) -> str:
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        _compile(src, out, extra, verbose=False)
    return out


def ensure_built() -> str:
    """Build the raw-volume library if missing/stale; returns the path."""
    return _ensure(SRC, OUT, ["-fopenmp"])


def ensure_vdb_built() -> str:
    """Build the .vdb decode library if missing/stale; returns the path."""
    return _ensure(VDB_SRC, VDB_OUT, ["-lz"])


if __name__ == "__main__":
    build()
    print("built", OUT, "and", VDB_OUT)
