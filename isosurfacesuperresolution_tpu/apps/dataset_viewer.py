"""Dataset viewer: browse / export previews of clip datasets.

Parity target: `mainDatasetViewer.py` (Tk npy browser with shading preview).
This environment is headless, so the default mode exports PNG contact sheets
(per clip: shaded color, mask, normal, depth, AO, flow magnitude for low and
high); ``--tk`` launches an interactive browser when a display exists.

Usage:
  python -m isosurfacesuperresolution_tpu.apps.dataset_viewer <clip-dir> \
      --output preview_out
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def clip_preview(seq, shading_cfg=None) -> np.ndarray:
    """Render a contact sheet (rows = frames, cols = channels) as uint8."""
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.config import ShadingConfig
    from isosurfacesuperresolution_tpu.render.shading import (
        screen_space_shading)

    cfg = shading_cfg or ShadingConfig(diffuse_color=(1.0, 1.0, 1.0),
                                       material_color=(1.0, 0.3, 0.0))
    rows = []
    T = seq["high"].shape[0]
    for t in range(T):
        hi = jnp.asarray(seq["high"][t:t + 1])
        color = np.asarray(screen_space_shading(hi, cfg))[0]
        mask = np.repeat((seq["high"][t, ..., 0:1] * 0.5 + 0.5), 3, -1)
        normal = seq["high"][t, ..., 1:4] * 0.5 + 0.5
        depth = np.repeat(np.clip(seq["high"][t, ..., 4:5], 0, 1), 3, -1)
        ao = np.repeat(np.clip(seq["high"][t, ..., 5:6], 0, 1), 3, -1)
        H = color.shape[0]
        flow_mag = np.linalg.norm(seq["flow"][t], axis=-1, keepdims=True)
        flow_img = np.repeat(np.clip(flow_mag * 20, 0, 1), 3, -1)
        flow_img = np.kron(flow_img, np.ones((H // flow_img.shape[0],
                                              H // flow_img.shape[0], 1)))
        rows.append(np.concatenate(
            [color, mask, normal, depth, ao, flow_img[:H, :H]], axis=1))
    sheet = np.concatenate(rows, axis=0)
    return (np.clip(sheet, 0, 1) * 255).astype(np.uint8)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path", help="clip directory or index file")
    p.add_argument("--output", type=str, default="preview_out")
    p.add_argument("--maxClips", type=int, default=8)
    p.add_argument("--tk", action="store_true")
    args = p.parse_args(argv)

    from isosurfacesuperresolution_tpu.data.dataset import (
        load_reference_npy_dir)
    sequences = load_reference_npy_dir(args.path)[:args.maxClips]

    if args.tk:
        _tk_browser(sequences)
        return

    import imageio
    os.makedirs(args.output, exist_ok=True)
    for i, seq in enumerate(sequences):
        sheet = clip_preview(seq)
        out = os.path.join(args.output, f"clip_{i:03d}.png")
        imageio.imwrite(out, sheet)
        print("wrote", out)


def _tk_browser(sequences):
    import tkinter as tk

    from PIL import Image, ImageTk

    root = tk.Tk()
    root.title("Dataset viewer")
    state = {"clip": 0}
    label = tk.Label(root)
    label.pack()

    def show():
        sheet = clip_preview(sequences[state["clip"]])
        img = ImageTk.PhotoImage(Image.fromarray(sheet))
        label.configure(image=img)
        label.image = img
        root.title(f"clip {state['clip'] + 1}/{len(sequences)}")

    def nxt(_=None):
        state["clip"] = (state["clip"] + 1) % len(sequences)
        show()

    def prev(_=None):
        state["clip"] = (state["clip"] - 1) % len(sequences)
        show()

    root.bind("<Right>", nxt)
    root.bind("<Left>", prev)
    show()
    root.mainloop()


if __name__ == "__main__":
    main()
