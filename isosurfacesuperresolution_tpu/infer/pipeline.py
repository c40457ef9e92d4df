"""Fused interactive inference: raycast -> warp -> network -> shade, one jit.

Parity target: the `mainGUI.updateImage` loop (`mainGUI.py:642-877`) +
`LoadedModel.inference` (`inference/loadedmodel.py:70-120`).  The reference
crosses a DLL boundary for the raycast, hops to the CPU for cv2 flow
inpainting, then back to the GPU for warp + network + shading.  Here the
whole frame is ONE XLA program: the renderer output never leaves the device,
inpainting is the on-device diffusion fill, and the recurrent high-res state
is donated buffer-to-buffer between frames.

The BASELINE.json target ("fused end-to-end inference ... >30 FPS at 1080p
from 480x270 raycasts") is this module's `InferencePipeline.frame`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import (
    Config, RenderConfig, ShadingConfig)
from isosurfacesuperresolution_tpu.models.videotools import (
    flatten_high, initial_image, warp_upscale)
from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
from isosurfacesuperresolution_tpu.ops.resize import pixel_shuffle, resize
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
from isosurfacesuperresolution_tpu.render.raycast import gbuffer_to_low_input
from isosurfacesuperresolution_tpu.render.shading import screen_space_shading
from isosurfacesuperresolution_tpu.train.trainer import clamp_output
from isosurfacesuperresolution_tpu.volume.grid import BrickGrid


class FrameState(NamedTuple):
    """Recurrent state carried between frames."""

    prev_high: jnp.ndarray        # (1, H, W, 6) previous prediction
    has_prev: jnp.ndarray         # scalar bool (first frame -> initial image)


def make_fused_frame(model, cfg: Config, render_cfg: RenderConfig,
                     upscale_mode: str = "network",
                     donate: bool = True,
                     shading_cfg: Optional[ShadingConfig] = None,
                     fast_warp: bool = True,
                     planar: str = "auto"):
    """Build the jit'd fused frame function.

    Returns ``frame(params, grid, cam, cam_prev, state) ->
    (rgb (Hh, Wh, 3), low_gbuffer, new_state)``.

    upscale_mode: network | nearest | bilinear | bicubic | input
    (parity: the mode switch of `mainGUI.py:732-754`).
    fast_warp: use the gather-free shift-blend warp (`ops/warp_fast.py`,
    ~10x faster at 1080p, displacement clamped to 8 px) instead of the exact
    gather warp used in training.
    planar: "auto" | "on" | "off" - run the sub-pixel-planar engine
    (`infer/planar.py`: the SR tail, shading, warp, and recurrent state stay
    at low resolution with the 16 sub-pixels in channels; the only
    interleave is the final RGB shuffle).  "auto" enables it whenever the
    model configuration supports it.  The planar state has a different
    shape, so `initial_state` must be built with the same setting.
    """
    from isosurfacesuperresolution_tpu.infer.planar import supports_planar
    from isosurfacesuperresolution_tpu.ops.warp_fast import warp_upscale_fast
    m = cfg.model
    u = m.upscale_factor
    shading_cfg = shading_cfg if shading_cfg is not None else cfg.shading
    warp_fn = (partial(warp_upscale_fast, max_disp=8) if fast_warp
               else warp_upscale)
    use_planar = resolve_planar(cfg, upscale_mode, planar)

    def frame(params, grid: BrickGrid, cam: CameraParams,
              cam_prev: CameraParams, state: FrameState, rp=None):
        from isosurfacesuperresolution_tpu.infer.planar import (
            clamp_output_planar, initial_image_planar, planar_apply,
            screen_space_shading_planar, warp_planar)
        fr = render_frame_gbuffer(grid, cam, cam_prev, render_cfg, rp)
        low = gbuffer_to_low_input(fr)[None]                  # (1,h,w,5)
        flow = fr[None, ..., 8:10]
        mask = fr[None, ..., 3:4]
        flow = inpaint_flow(flow, mask, iterations=8)

        if upscale_mode == "network" and use_planar:
            from isosurfacesuperresolution_tpu.infer.planar import (
                planar_rgb_to_planes)
            init_prev = initial_image_planar(low, m.output_channels,
                                             "unshaded", False)
            prev = jnp.where(state.has_prev, state.prev_high, init_prev)
            # bf16 shift-blend: the only consumer is the bf16 network input
            warped = warp_planar(prev, flow, special_mask=True, max_disp=8,
                                 compute_dtype=jnp.dtype(m.compute_dtype))
            net_in = jnp.concatenate([low, warped], axis=-1)
            if m.use_sn:
                # the planar engine consumes raw kernels, so the --useSN
                # transform (a pure function of the params) applies here;
                # the non-planar path gets it from create_network's wrapper
                from isosurfacesuperresolution_tpu.utils.spectral_norm import (
                    apply_sn_tree)
                params = apply_sn_tree(params)
            pred = planar_apply(params, m, net_in)
            out_planar = clamp_output_planar(pred)
            # NOTE: channel-FIRST (3, Hh, Wh) - the plane transpose is ~5x
            # cheaper than HWC at 1080p; hosts moveaxis after the fetch
            rgb = planar_rgb_to_planes(
                screen_space_shading_planar(out_planar, shading_cfg))[0]
            new_state = FrameState(prev_high=out_planar,
                                   has_prev=jnp.ones((), bool))
            return rgb, fr, new_state

        if upscale_mode == "network":
            init_prev = initial_image(low, m.output_channels,
                                      "unshaded", False, u)
            prev = jnp.where(state.has_prev, state.prev_high, init_prev)
            warped = warp_fn(prev, flow, u, special_mask=True)
            net_in = jnp.concatenate([low, flatten_high(warped, u)], axis=-1)
            pred, _ = model.apply(params, net_in)
            out_high = clamp_output(pred)
        elif upscale_mode in ("nearest", "bilinear", "bicubic"):
            out_high = resize(low, scale=float(u), method=upscale_mode)
            ao = jnp.ones_like(out_high[..., :1])
            out_high = jnp.concatenate([out_high, ao], axis=-1)
        else:
            raise ValueError(f"unknown upscale mode {upscale_mode!r}")

        rgb = screen_space_shading(out_high, shading_cfg)[0]
        new_state = FrameState(prev_high=out_high,
                               has_prev=jnp.ones((), bool))
        return rgb, fr, new_state

    donate_args = (4,) if donate else ()
    return jax.jit(frame, donate_argnums=donate_args)


def resolve_planar(cfg: Config, upscale_mode: str, planar: str) -> bool:
    from isosurfacesuperresolution_tpu.infer.planar import supports_planar
    if planar == "off" or upscale_mode != "network":
        return False
    ok = supports_planar(cfg.model)
    if planar == "on" and not ok:
        raise ValueError("planar engine does not support this model config")
    return ok


def initial_state(cfg: Config, render_cfg: RenderConfig,
                  upscale_mode: str = "network",
                  planar: str = "auto") -> FrameState:
    m = cfg.model
    u = m.upscale_factor
    h, w = render_cfg.height, render_cfg.width
    if resolve_planar(cfg, upscale_mode, planar):
        prev = jnp.zeros((1, h, w, m.output_channels * u * u), jnp.float32)
    else:
        prev = jnp.zeros((1, h * u, w * u, m.output_channels), jnp.float32)
    return FrameState(prev_high=prev, has_prev=jnp.zeros((), bool))


@dataclasses.dataclass
class InferencePipeline:
    """Stateful convenience wrapper around the fused frame function.

    The reference analogue is `LoadedModel` + the GUI render loop; camera
    history is tracked here so each frame's flow is computed against the
    previous camera (`GPURendererDirect.cpp:436-442`).
    """

    model: Any
    params: Any
    cfg: Config
    render_cfg: RenderConfig
    upscale_mode: str = "network"
    shading_cfg: Optional[ShadingConfig] = None
    render_params: Any = None      # traced RenderParams (isovalue, ...)

    def __post_init__(self):
        self._use_planar = resolve_planar(self.cfg, self.upscale_mode,
                                          "auto")
        self._frame = make_fused_frame(self.model, self.cfg, self.render_cfg,
                                       self.upscale_mode,
                                       shading_cfg=self.shading_cfg)
        self._state = initial_state(self.cfg, self.render_cfg,
                                    self.upscale_mode)
        self._last_cam: Optional[CameraParams] = None

    def reset(self):
        self._state = initial_state(self.cfg, self.render_cfg,
                                    self.upscale_mode)
        self._last_cam = None

    def set_render_params(self, **kw):
        """Update traced per-frame knobs (isovalue, material, light)
        WITHOUT recompiling - the GUI-slider / pipe `setParameter` path
        (`GPURendererDirect.cpp:395-428`)."""
        from isosurfacesuperresolution_tpu.render.params import RenderParams
        rp = (self.render_params if self.render_params is not None
              else RenderParams.from_config(self.render_cfg))
        self.render_params = rp.replace(**kw)

    def frame(self, grid: BrickGrid, cam: CameraParams) -> jnp.ndarray:
        """Render + super-resolve + shade one frame; returns (Hh, Wh, 3)."""
        from isosurfacesuperresolution_tpu.render.params import RenderParams
        cam_prev = self._last_cam if self._last_cam is not None else cam
        rp = self.render_params
        if rp is None:
            rp = RenderParams.from_config(self.render_cfg)
        rgb, _, self._state = self._frame(self.params, grid, cam, cam_prev,
                                          self._state, rp)
        self._last_cam = cam
        if self._use_planar:       # planar path emits (3, Hh, Wh) planes
            rgb = jnp.moveaxis(rgb, 0, -1)
        return rgb
