"""Renderer dispatch: one entry point over the two G-buffer backends.

- ``sweep``  (default): gather-free shear-warp sweep - the TPU fast path
  (`render/sweep.py`), ~150x faster than marching on TPU.
- ``march``: per-ray lattice marching (`render/raycast.py`) - the
  reference-faithful oracle; also what the AO hemisphere rays use.

Both are jit-compatible with traced cameras and produce the same 12-channel
G-buffer contract (parity bounded by `tests/test_sweep.py`).
"""

from __future__ import annotations

import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import render_gbuffer
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.volume.grid import BrickGrid


def render_frame_gbuffer(grid: BrickGrid, cam: CameraParams,
                         cam_flow: CameraParams,
                         cfg: RenderConfig, rp=None) -> jnp.ndarray:
    """Render one (H, W, 12) G-buffer with the backend picked by
    ``cfg.renderer``.

    ``rp`` (`render/params.RenderParams`) carries the TRACED per-frame
    knobs (isovalue, material, light): pass it to change them at runtime
    without recompiling (pipe-protocol/GUI-slider/data-generation parity,
    `GPURendererDirect.cpp:395-428`); None freezes the config values."""
    if cfg.renderer in ("sweep", "sweep_pallas"):
        # "sweep_pallas" = same geometry with the Pallas march kernel
        # (render/sweep_pallas.py) for the slice scan
        return render_gbuffer_sweep(grid, cam, cam_flow, cfg, rp)
    if cfg.renderer == "march":
        return render_gbuffer(grid, cam, cam_flow, cfg, rp)
    raise ValueError(f"unknown renderer {cfg.renderer!r}")
