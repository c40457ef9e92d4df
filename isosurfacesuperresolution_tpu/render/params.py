"""Traced per-frame render parameters.

`RenderConfig` is a STATIC (hashable) jit argument: anything in it is baked
into the compiled program, so changing it recompiles.  That is right for
shapes and mode switches, but the reference treats isovalue, material and
light as *runtime* state - the pipe/DLL protocol updates them per frame
(`GPURendererDirect.cpp:395-428`: `setParameter("isovalue", ...)`), the GUI
has sliders, and data generation randomizes them per sequence
(`DataGeneratorVideo.py:135-151`).  Recompiling the renderer for every
slider step or training sequence costs ~30-60 s each.

`RenderParams` carries those numeric knobs as traced arrays; every renderer
entry point takes an optional instance and falls back to the values frozen
in the config (`RenderParams.from_config`) - bitwise-identical behavior,
zero recompiles when only numbers change.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import RenderConfig


class RenderParams(NamedTuple):
    isovalue: jnp.ndarray           # ()
    light_direction: jnp.ndarray    # (3,) used when not cfg.camera_light
    ambient_color: jnp.ndarray      # (3,)
    diffuse_color: jnp.ndarray      # (3,)
    specular_color: jnp.ndarray     # (3,)
    specular_exponent: jnp.ndarray  # ()

    @classmethod
    def from_config(cls, cfg: RenderConfig) -> "RenderParams":
        return cls(
            isovalue=jnp.float32(cfg.isovalue),
            light_direction=jnp.asarray(cfg.light_direction, jnp.float32),
            ambient_color=jnp.asarray(cfg.ambient_color, jnp.float32),
            diffuse_color=jnp.asarray(cfg.diffuse_color, jnp.float32),
            specular_color=jnp.asarray(cfg.specular_color, jnp.float32),
            specular_exponent=jnp.float32(cfg.specular_exponent),
        )

    def replace(self, **kw) -> "RenderParams":
        return self._replace(**{k: jnp.asarray(v, jnp.float32)
                                for k, v in kw.items()})
