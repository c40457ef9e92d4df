"""Interactive viewer: live raycast + super-resolution + shading.

Parity target: `mainGUI.py` - orbit camera, isovalue control, render-mode
switch (trained models / nearest / bilinear / bicubic / ground truth),
channel selection (color / mask / normal / depth / AO / flow), AO controls,
focus-of-context (ground truth re-rendered in a viewport around the cursor
and blended with a radial mask, `mainGUI.py:541-570,765-798`), temporal
post-smoothing by warping the previous RGB frame (`:835-849`), rolling-FPS
display (`:860-873`), and screenshots with a JSON metadata sidecar
(`:879-930`).

The compute core is the fused one-jit frame of `infer/pipeline.py` (the
reference's DLL hop + cv2 CPU inpainting round trip are gone).  The
:class:`Viewer` class is fully headless-scriptable; ``--tk`` attaches the
interactive Tk frontend when a display exists, ``--frames N`` renders an
orbit fly-around to PNG files instead.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np


class Viewer:
    """Headless-scriptable interactive viewer core."""

    CHANNELS = ("color", "mask", "normal", "depth", "ao", "flow")

    def __init__(self, grid, models: Dict[str, "LoadedModel"],
                 res_x: int = 320, res_y: int = 240, upscale: int = 4,
                 isovalue: float = 0.5, step_voxels: float = 0.5,
                 renderer: str = "sweep"):
        import jax

        from isosurfacesuperresolution_tpu.config import (
            Config, RenderConfig, ShadingConfig)
        from isosurfacesuperresolution_tpu.render.camera import OrbitCamera

        self.grid = grid
        self.models = models
        self.upscale = upscale
        self.camera = OrbitCamera(res_x, res_y)
        self.render_cfg = RenderConfig(width=res_x, height=res_y,
                                       isovalue=isovalue,
                                       step_voxels=step_voxels,
                                       ao_samples=0, renderer=renderer)
        self.shading_cfg = ShadingConfig(
            ambient_color=(0.1, 0.1, 0.1), diffuse_color=(1.0, 1.0, 1.0),
            specular_color=(0.0, 0.0, 0.0), enable_specular=True,
            light_direction=(0.0, 0.0, 1.0), material_color=(1.0, 0.3, 0.0))
        self.mode = next(iter(models)) if models else "bilinear"
        self.channel = "color"
        self.ao_samples = 0
        self.ao_radius = 0.1
        self.temporal_smoothing = 0.0      # 0..1 blend with warped prev RGB
        self.foc_enabled = False
        self.foc_center = (res_x * upscale // 2, res_y * upscale // 2)
        self.foc_window_size = 96          # half-width in high-res pixels
        self.foc_blur_radius = 32
        self._frame_times = deque(maxlen=10)
        self._pipelines: Dict[str, object] = {}
        self._extra_render_params: Dict[str, object] = {}
        self._last_cam = None
        self._prev_rgb = None
        self.last_frame_ms = 0.0
        self.input_name = "volume"

    # -- controls ------------------------------------------------------------
    def set_isovalue(self, v: float, reset_temporal: bool = True):
        # traced parameter: existing compiled pipelines update in place
        # (no recompile per slider step; render/params.py).
        # reset_temporal=True matches the reference GUI (slider moves
        # clear previous_raw_frame, mainGUI.py:647); scripted isovalue
        # sweeps pass False to keep the recurrence across the sweep like
        # mainComparisonVideo3's render loop.
        self.render_cfg = self.render_cfg.replace(isovalue=float(v))
        for p in self._pipelines.values():
            p.set_render_params(isovalue=float(v))
        if reset_temporal:
            self.reset_temporal()

    def set_material(self, **kw):
        """Traced material/light knobs (diffuse_color, ambient_color,
        specular_color, light_direction, ...): applied to every existing
        pipeline and remembered for lazily created ones - no recompiles
        (`setParameter` parity, GPURendererDirect.cpp:395-428)."""
        self._extra_render_params.update(kw)
        for p in self._pipelines.values():
            p.set_render_params(**kw)
        self.reset_temporal()

    def set_shading(self, shading_cfg):
        """Change shading constants; model pipelines are rebuilt because the
        fused frame bakes the (static) shading config into its jit program."""
        self.shading_cfg = shading_cfg
        self._pipelines.clear()
        self.reset_temporal()

    def set_mode(self, mode: str):
        self.mode = mode
        self.reset_temporal()

    def reset_temporal(self):
        for p in self._pipelines.values():
            p.reset()
        self._prev_rgb = None
        self._last_cam = None

    def _pipeline(self, mode: str):
        from isosurfacesuperresolution_tpu.config import Config
        from isosurfacesuperresolution_tpu.infer.pipeline import (
            InferencePipeline)
        key = mode
        if key not in self._pipelines:
            if mode in self.models:
                lm = self.models[mode]
                self._pipelines[key] = InferencePipeline(
                    model=lm.model, params=lm.params, cfg=lm.cfg,
                    render_cfg=self.render_cfg,
                    shading_cfg=self.shading_cfg)
                self._pipelines[key].set_render_params(
                    isovalue=self.render_cfg.isovalue,
                    **self._extra_render_params)
            else:
                from isosurfacesuperresolution_tpu.models.generators import (
                    create_network, network_input_channels)
                import jax
                import jax.numpy as jnp
                cfg = Config()
                model = create_network(cfg.model)
                params = model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8, network_input_channels(cfg.model))))
                self._pipelines[key] = InferencePipeline(
                    model=model, params=params, cfg=cfg,
                    render_cfg=self.render_cfg, upscale_mode=mode,
                    shading_cfg=self.shading_cfg)
                self._pipelines[key].set_render_params(
                    isovalue=self.render_cfg.isovalue,
                    **self._extra_render_params)
        return self._pipelines[key]

    def _render_params(self):
        from isosurfacesuperresolution_tpu.render.params import RenderParams
        return RenderParams.from_config(self.render_cfg)

    # -- focus of context ----------------------------------------------------
    def _foc_bounds_and_mask(self) -> Tuple[Tuple[int, int, int, int],
                                            np.ndarray]:
        """Viewport + radial blending mask in high-res pixels
        (parity: `mainGUI.py:541-570`)."""
        w = self.render_cfg.width * self.upscale
        h = self.render_cfg.height * self.upscale
        half = self.foc_window_size
        fx, fy = self.foc_center
        viewport = (max(0, fx - half), max(0, fy - half),
                    min(w, fx + half), min(h, fy + half))
        outer = self.foc_window_size
        inner = max(0, self.foc_window_size - self.foc_blur_radius)
        ys = np.arange(h, dtype=np.float32)[:, None]
        xs = np.arange(w, dtype=np.float32)[None, :]
        r = np.sqrt((xs - fx) ** 2 + (ys - fy) ** 2)
        mask = np.clip((r - outer) / (inner - outer), 0, 1)
        return viewport, mask[..., None]

    # -- frame ---------------------------------------------------------------
    def render_frame(self) -> np.ndarray:
        """Render one frame with all display features -> (H, W, 3) float."""
        import jax
        import jax.numpy as jnp

        from isosurfacesuperresolution_tpu.models.videotools import (
            warp_upscale)
        from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
        from isosurfacesuperresolution_tpu.ops.resize import resize
        from isosurfacesuperresolution_tpu.render.api import (
            render_frame_gbuffer)
        from isosurfacesuperresolution_tpu.render.shading import (
            screen_space_shading)

        t0 = time.time()
        cam = self.camera.params()

        if self.mode == "gt":
            high_cfg = self.render_cfg.replace(
                width=self.render_cfg.width * self.upscale,
                height=self.render_cfg.height * self.upscale,
                ao_samples=self.ao_samples, ao_radius=self.ao_radius)
            fr = render_frame_gbuffer(self.grid, cam,
                                      self._last_cam or cam, high_cfg,
                                      self._render_params())
            from isosurfacesuperresolution_tpu.render.raycast import (
                gbuffer_to_high_target)
            out_high = gbuffer_to_high_target(fr)[None]
            rgb = screen_space_shading(out_high, self.shading_cfg)[0]
            low_fr = None
        else:
            pipe = self._pipeline(self.mode)
            cam_prev = pipe._last_cam if pipe._last_cam is not None else cam
            rgb1, low_fr, pipe._state = pipe._frame(
                pipe.params, self.grid, cam, cam_prev, pipe._state,
                self._render_params())
            pipe._last_cam = cam
            out_high = pipe._state.prev_high
            if hasattr(rgb1, "ndim") and rgb1.ndim == 3 and \
                    rgb1.shape[0] == 3:
                # planar engine: channel-first planes + planar state
                from isosurfacesuperresolution_tpu.infer.planar import (
                    state_to_flat)
                from isosurfacesuperresolution_tpu.ops.resize import (
                    pixel_shuffle)
                rgb1 = jnp.moveaxis(rgb1, 0, -1)
                out_high = pixel_shuffle(state_to_flat(out_high), 4)
            rgb = rgb1

        # channel selection (parity: mainGUI.py:803-828)
        if self.channel != "color":
            rgb = self._select_channel(out_high, low_fr)

        # focus-of-context GT blending
        if self.foc_enabled and self.mode != "gt" and self.channel == "color":
            viewport, mask = self._foc_bounds_and_mask()
            foc_cfg = self.render_cfg.replace(
                width=self.render_cfg.width * self.upscale,
                height=self.render_cfg.height * self.upscale,
                ao_samples=self.ao_samples, ao_radius=self.ao_radius,
                viewport=viewport)
            fr = render_frame_gbuffer(self.grid, cam,
                                      self._last_cam or cam, foc_cfg)
            from isosurfacesuperresolution_tpu.render.raycast import (
                gbuffer_to_high_target)
            foc_rgb = screen_space_shading(
                gbuffer_to_high_target(fr)[None], self.shading_cfg)[0]
            rgb = jnp.asarray(mask) * foc_rgb + (1 - jnp.asarray(mask)) * rgb

        # temporal post-smoothing (parity: mainGUI.py:835-849)
        if (self.temporal_smoothing > 0 and self._prev_rgb is not None
                and self.mode != "gt" and low_fr is not None):
            flow = inpaint_flow(low_fr[None, ..., 8:10],
                                low_fr[None, ..., 3:4], iterations=8)
            prev_warped = warp_upscale(self._prev_rgb[None], flow,
                                       self.upscale)[0]
            f = self.temporal_smoothing
            rgb = f * prev_warped + (1 - f) * rgb

        rgb = jnp.clip(rgb, 0.0, 1.0)
        jax.block_until_ready(rgb)
        self._prev_rgb = rgb
        self._last_cam = cam
        dt = time.time() - t0
        self._frame_times.append(dt)
        self.last_frame_ms = dt * 1000.0
        return np.asarray(rgb)

    def _select_channel(self, out_high, low_fr):
        import jax.numpy as jnp
        buf = out_high[0]
        if self.channel == "mask":
            v = buf[..., 0:1] * 0.5 + 0.5
            return jnp.repeat(v, 3, -1)
        if self.channel == "normal":
            return buf[..., 1:4] * 0.5 + 0.5
        if self.channel == "depth":
            return jnp.repeat(jnp.clip(buf[..., 4:5], 0, 1), 3, -1)
        if self.channel == "ao":
            return jnp.repeat(jnp.clip(buf[..., 5:6], 0, 1), 3, -1)
        if self.channel == "flow":
            if low_fr is None:
                return jnp.zeros(buf.shape[:2] + (3,))
            from isosurfacesuperresolution_tpu.ops.resize import resize
            f = resize(low_fr[None, ..., 8:10] * 10 + 0.5,
                       scale=float(self.upscale), method="nearest")[0]
            return jnp.concatenate(
                [jnp.clip(f, 0, 1), jnp.zeros(f.shape[:2] + (1,))], -1)
        raise ValueError(self.channel)

    @property
    def fps(self) -> float:
        if not self._frame_times:
            return 0.0
        return len(self._frame_times) / sum(self._frame_times)

    # -- screenshots ---------------------------------------------------------
    def save_screenshot(self, directory: str = "screenshots") -> str:
        """PNG + JSON metadata sidecar (parity: `mainGUI.py:879-930`)."""
        import imageio
        os.makedirs(directory, exist_ok=True)
        rgb = self.render_frame()
        info = {
            "model": self.mode,
            "channel": self.channel,
            "data": self.input_name,
            "timestamp": time.strftime("%mm%dd-%Hh%Mm%Ss"),
            "iso": self.render_cfg.isovalue,
            "shading": {
                "ambient_light": list(self.shading_cfg.ambient_color),
                "diffuse_light": list(self.shading_cfg.diffuse_color),
                "specular_light": list(self.shading_cfg.specular_color),
                "specular_exponent": self.shading_cfg.specular_exponent,
                "material_color": list(self.shading_cfg.material_color),
            },
            "ao": {"samples": self.ao_samples, "radius": self.ao_radius,
                   "strength": self.shading_cfg.ao_strength},
        }
        name = ".".join([info["data"], info["model"], info["channel"],
                         info["timestamp"]]) + ".png"
        path = os.path.join(directory, name)
        imageio.imwrite(path, (rgb * 255).astype(np.uint8))
        with open(path + ".json", "w") as f:
            json.dump(info, f, indent=4, sort_keys=True)
        return path


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--volume", type=str, default="analytic:blobs")
    p.add_argument("--models", nargs="*", default=[],
                   help="run dirs of trained models")
    p.add_argument("--resX", type=int, default=320)
    p.add_argument("--resY", type=int, default=240)
    p.add_argument("--isovalue", type=float, default=0.5)
    p.add_argument("--renderer", type=str, default="sweep",
                   choices=["sweep", "sweep_pallas", "march"],
                   help="sweep_pallas = Pallas march (fastest on TPU)")
    p.add_argument("--tk", action="store_true", help="interactive Tk UI")
    p.add_argument("--frames", type=int, default=0,
                   help="headless: render an N-frame orbit to PNGs")
    p.add_argument("--output", type=str, default="gui_out")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel

    grid, vol_name = load_volume(args.volume)
    models = {os.path.basename(m.rstrip("/")): LoadedModel.from_run_dir(m)
              for m in args.models}
    viewer = Viewer(grid, models, res_x=args.resX, res_y=args.resY,
                    isovalue=args.isovalue, renderer=args.renderer)
    viewer.input_name = vol_name
    if not models:
        viewer.set_mode("bilinear")

    if args.tk:
        _tk_main(viewer)
        return

    import imageio
    os.makedirs(args.output, exist_ok=True)
    n = args.frames or 8
    for i in range(n):
        viewer.camera.start_move()
        viewer.camera.move(20 * i, 0)
        rgb = viewer.render_frame()
        out = os.path.join(args.output, f"frame_{i:04d}.png")
        imageio.imwrite(out, (rgb * 255).astype(np.uint8))
        print(f"{out}  ({viewer.fps:.1f} FPS)")


def _tk_main(viewer: Viewer):
    import tkinter as tk

    from PIL import Image, ImageTk

    root = tk.Tk()
    label = tk.Label(root)
    label.pack(side=tk.LEFT)
    panel = tk.Frame(root)
    panel.pack(side=tk.RIGHT, fill=tk.Y)

    iso = tk.Scale(panel, from_=0.05, to=0.95, resolution=0.01,
                   orient=tk.HORIZONTAL, label="isovalue",
                   command=lambda v: viewer.set_isovalue(float(v)))
    iso.set(viewer.render_cfg.isovalue)
    iso.pack(fill=tk.X)
    smooth = tk.Scale(panel, from_=0, to=100, orient=tk.HORIZONTAL,
                      label="temporal smoothing %",
                      command=lambda v: setattr(viewer, "temporal_smoothing",
                                                float(v) / 100.0))
    smooth.pack(fill=tk.X)

    mode_var = tk.StringVar(value=viewer.mode)
    for m in list(viewer.models) + ["nearest", "bilinear", "bicubic", "gt"]:
        tk.Radiobutton(panel, text=m, variable=mode_var, value=m,
                       command=lambda: viewer.set_mode(mode_var.get())
                       ).pack(anchor=tk.W)
    chan_var = tk.StringVar(value="color")
    for c in Viewer.CHANNELS:
        tk.Radiobutton(panel, text=c, variable=chan_var, value=c,
                       command=lambda: setattr(viewer, "channel",
                                               chan_var.get())
                       ).pack(anchor=tk.W)
    tk.Button(panel, text="screenshot",
              command=viewer.save_screenshot).pack(fill=tk.X)

    drag = {"x": 0, "y": 0}

    def on_press(e):
        drag["x"], drag["y"] = e.x, e.y
        viewer.camera.start_move()

    def on_drag(e):
        viewer.camera.move(e.x - drag["x"], e.y - drag["y"])

    def on_wheel(e):
        viewer.camera.zoom(-1 if e.delta > 0 else 1)

    label.bind("<ButtonPress-1>", on_press)
    label.bind("<B1-Motion>", on_drag)
    label.bind("<MouseWheel>", on_wheel)

    def tick():
        rgb = viewer.render_frame()
        img = ImageTk.PhotoImage(
            Image.fromarray((rgb * 255).astype(np.uint8)))
        label.configure(image=img)
        label.image = img
        root.title(f"isosr-tpu viewer - {viewer.fps:.1f} FPS "
                   f"({viewer.last_frame_ms:.1f} ms)")
        root.after(1, tick)

    tick()
    root.mainloop()


if __name__ == "__main__":
    main()
