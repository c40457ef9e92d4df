"""Paper-figure "lens" tool: side-by-side crops with magnified insets.

Parity target: `mainImageVis.py` - renders ground truth and each model's
output for a fixed camera, then assembles a figure per model: the full frame
with a highlighted lens rectangle plus the magnified inset, for visual
comparison of fine structure.

Usage:
  python -m isosurfacesuperresolution_tpu.apps.image_vis \
      --volume analytic:blobs --models bilinear gt --lens 0.5,0.5,0.15 \
      --output figures/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _draw_rect(img: np.ndarray, y0: int, x0: int, y1: int, x1: int,
               color=(1.0, 0.2, 0.2), width: int = 2) -> np.ndarray:
    img = img.copy()
    c = np.asarray(color, img.dtype)
    img[y0:y0 + width, x0:x1] = c
    img[y1 - width:y1, x0:x1] = c
    img[y0:y1, x0:x0 + width] = c
    img[y0:y1, x1 - width:x1] = c
    return img


def make_lens_figure(rgb: np.ndarray, lens_cx: float, lens_cy: float,
                     lens_size: float, zoom: int = 3) -> np.ndarray:
    """Frame with lens rectangle + magnified inset appended to the right."""
    h, w = rgb.shape[:2]
    s = int(lens_size * min(h, w) / 2)
    cy, cx = int(lens_cy * h), int(lens_cx * w)
    y0, y1 = max(0, cy - s), min(h, cy + s)
    x0, x1 = max(0, cx - s), min(w, cx + s)
    inset = rgb[y0:y1, x0:x1]
    inset = np.kron(inset, np.ones((zoom, zoom, 1), rgb.dtype))
    # letterbox the inset to the frame height
    ih, iw = inset.shape[:2]
    canvas = np.zeros((h, iw, 3), rgb.dtype)
    off = max(0, (h - ih) // 2)
    canvas[off:off + min(ih, h)] = inset[:min(ih, h)]
    canvas = _draw_rect(canvas, max(0, off), 0,
                        min(h, off + ih), iw)
    marked = _draw_rect(rgb, y0, x0, y1, x1)
    return np.concatenate([marked, canvas], axis=1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--volume", type=str, default="analytic:blobs")
    p.add_argument("--models", nargs="+", default=["bilinear", "gt"])
    p.add_argument("--lowRes", type=int, default=120)
    p.add_argument("--isovalue", type=float, default=0.5)
    p.add_argument("--lens", type=str, default="0.5,0.5,0.2",
                   help="cx,cy,size (fractions of the frame)")
    p.add_argument("--zoom", type=int, default=3)
    p.add_argument("--eye", type=str, default="0,0.9,-1.7")
    p.add_argument("--output", type=str, default="figures")
    args = p.parse_args(argv)

    import imageio

    from isosurfacesuperresolution_tpu.apps.main_gui import Viewer
    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel

    cx, cy, size = (float(v) for v in args.lens.split(","))
    eye = tuple(float(v) for v in args.eye.split(","))
    grid, vol_name = load_volume(args.volume)
    models = {os.path.basename(m.rstrip("/")): LoadedModel.from_run_dir(m)
              for m in args.models
              if m not in ("nearest", "bilinear", "bicubic", "gt")}
    os.makedirs(args.output, exist_ok=True)

    viewer = Viewer(grid, models, res_x=args.lowRes, res_y=args.lowRes,
                    isovalue=args.isovalue)
    d, pitch, yaw = viewer.camera.to_angles(eye)
    viewer.camera.current_distance = d
    viewer.camera.current_pitch = pitch
    viewer.camera.current_yaw = yaw

    for mode in args.models:
        name = (mode if mode in ("nearest", "bilinear", "bicubic", "gt")
                else os.path.basename(mode.rstrip("/")))
        viewer.set_mode(name if name in list(models) + [
            "nearest", "bilinear", "bicubic", "gt"] else name)
        rgb = viewer.render_frame()
        fig = make_lens_figure(np.asarray(rgb), cx, cy, size, args.zoom)
        path = os.path.join(args.output, f"{vol_name}_{name}_lens.png")
        imageio.imwrite(path, (np.clip(fig, 0, 1) * 255).astype(np.uint8))
        print("wrote", path)


if __name__ == "__main__":
    main()
