"""Build the native volume-IO extension.

Usage: ``python -m isosurfacesuperresolution_tpu.native.build``
Produces ``_volumeio.so`` next to this file (g++ -O3 -fopenmp shared lib,
consumed through ctypes - no pybind11 in this image).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "volumeio.cpp")
OUT = os.path.join(HERE, "_volumeio.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-std=c++17", SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


def ensure_built() -> str:
    """Build if missing or stale; returns the .so path."""
    if (not os.path.exists(OUT)
            or os.path.getmtime(OUT) < os.path.getmtime(SRC)):
        build(verbose=False)
    return OUT


if __name__ == "__main__":
    build()
    print("built", OUT)
