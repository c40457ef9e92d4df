"""Line-oriented renderer pipe protocol (reference interop).

Parity target: the PIPE mode of the reference renderers
(`CPURenderer.cpp:688-787`, `GPURenderer.cpp:858-966`): text commands on
stdin (``key=value`` and ``render``), binary float32 frames on **stderr**
(channel-major ``[12][H][W]`` + one trailing float with the render seconds),
as consumed by `inference/renderer.py:16-76` and exercised by
`DataGenerator/PipeTest.py`.

Inside this framework the process boundary is gone (renderer and network
fuse into one XLA program), but the protocol is kept for drop-in
compatibility with reference-style clients and as the remote-renderer
transport.

Commands (parity: `GPURendererDirect.cpp:395-428`, `CPURenderer.cpp:750-785`):
  cameraOrigin=x,y,z   cameraLookAt=x,y,z   cameraUp=x,y,z   fov=v
  resolution=w,h       isovalue=v           aosamples=n      aoradius=v
  viewport=x0,y0,x1,y1 render               exit

Usage:
  python -m isosurfacesuperresolution_tpu.apps.render_server \
      --volume analytic:blobs
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--volume", type=str, default="analytic:blobs")
    p.add_argument("--renderer", type=str, default=None,
                   help="override sweep|march")
    args = p.parse_args(argv)

    # stderr carries the BINARY frames (reference protocol); route all
    # logging/warnings to stdout so jax's stderr logs cannot corrupt it
    import logging
    import warnings
    logging.basicConfig(stream=sys.stdout, force=True)
    warnings.filterwarnings("ignore")

    import numpy as np

    # honor JAX_PLATFORMS even though the image's sitecustomize re-pins the
    # tunneled-TPU platform after import
    import jax
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)

    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
    from isosurfacesuperresolution_tpu.render.camera import CameraParams

    # jax installs its own stderr StreamHandlers on non-root loggers at
    # import time; move every one of them to stdout
    for name in list(logging.root.manager.loggerDict) + [""]:
        lg = logging.getLogger(name) if name else logging.getLogger()
        for h in lg.handlers:
            if (isinstance(h, logging.StreamHandler)
                    and getattr(h, "stream", None) is sys.stderr):
                h.setStream(sys.stdout)

    grid, _ = load_volume(args.volume)
    state = {
        "origin": (0.0, 1.0, -1.7), "look_at": (0.0, 0.0, 0.0),
        "up": (0.0, 1.0, 0.0), "fov": 45.0,
        "cfg": RenderConfig(width=320, height=240, ao_samples=0,
                            **({"renderer": args.renderer}
                               if args.renderer else {})),
        "last_cam": None,
    }

    out = sys.stderr.buffer   # binary frames on stderr (CPURenderer parity)
    print("Enter Pipe mode and wait for commands", flush=True)

    for line in sys.stdin:
        command = line.strip()
        if not command:
            continue
        if command == "exit":
            print("Exit program", flush=True)
            return
        if command == "render":
            cfg = state["cfg"]
            cam = CameraParams.create(state["origin"], state["look_at"],
                                      state["up"], state["fov"])
            cam_prev = state["last_cam"] or cam
            t0 = time.time()
            from isosurfacesuperresolution_tpu.render.params import (
                RenderParams)
            rp = RenderParams.from_config(cfg)
            frame = np.asarray(render_frame_gbuffer(grid, cam, cam_prev,
                                                    cfg, rp))
            seconds = time.time() - t0
            state["last_cam"] = cam
            # channel-major layout + trailing render time
            payload = frame.transpose(2, 0, 1).astype("<f4").tobytes()
            out.write(payload)
            out.write(np.float32(seconds).tobytes())
            out.flush()
            continue

        if "=" not in command:
            print(f"Unknown command format: {command}, exit", flush=True)
            return
        cmd, value = command.split("=", 1)
        try:
            if cmd == "cameraOrigin":
                state["origin"] = tuple(map(float, value.split(",")))
            elif cmd == "cameraLookAt":
                state["look_at"] = tuple(map(float, value.split(",")))
            elif cmd == "cameraUp":
                state["up"] = tuple(map(float, value.split(",")))
            elif cmd in ("fov", "cameraFoV"):
                state["fov"] = float(value)
            elif cmd == "resolution":
                w, h = map(int, value.split(","))
                state["cfg"] = state["cfg"].replace(width=w, height=h)
            elif cmd == "isovalue":
                state["cfg"] = state["cfg"].replace(isovalue=float(value))
            elif cmd == "aosamples":
                state["cfg"] = state["cfg"].replace(ao_samples=int(value))
            elif cmd == "aoradius":
                state["cfg"] = state["cfg"].replace(ao_radius=float(value))
            elif cmd == "viewport":
                vp = tuple(map(int, value.split(",")))
                state["cfg"] = state["cfg"].replace(
                    viewport=None if min(vp) < 0 else vp)
            elif cmd == "unshaded":
                pass   # output always carries both shaded + unshaded channels
            else:
                print(f"Unknown command: '{cmd}', exit", flush=True)
                return
        except ValueError as e:
            print(f"Bad value for {cmd}: {e}", flush=True)
            return


if __name__ == "__main__":
    main()
