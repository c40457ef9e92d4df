"""Pipe-protocol renderer client.

Parity target: `inference/renderer.py:16-76` - the subprocess wrapper the
reference's GUI and data tools use to talk to a renderer process: spawn,
send ``key=value`` commands on stdin, read binary channel-major float frames
(+ trailing render seconds) from stderr.

Works against this framework's `apps/render_server.py` or any
reference-compatible renderer binary.  (The in-process fused pipeline is the
fast path; this exists for interop and for running the renderer out of
process, e.g. on another host.)
"""

from __future__ import annotations

import struct
import subprocess
import sys
from typing import Optional, Sequence

import numpy as np


class PipeRenderer:
    """Client for the line-oriented renderer pipe protocol."""

    def __init__(self, command: Sequence[str],
                 width: int = 320, height: int = 240):
        self.proc = subprocess.Popen(
            list(command), stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE)
        self.width = width
        self.height = height
        self.last_time: float = 0.0
        self.send_command("resolution", f"{width},{height}")

    @classmethod
    def local_server(cls, volume: str, width: int = 320, height: int = 240,
                     renderer: Optional[str] = None) -> "PipeRenderer":
        cmd = [sys.executable, "-m",
               "isosurfacesuperresolution_tpu.apps.render_server",
               "--volume", volume]
        if renderer:
            cmd += ["--renderer", renderer]
        return cls(cmd, width, height)

    def send_command(self, key: str, value: str) -> None:
        """(parity: `inference/renderer.py:49-57`)"""
        if key == "resolution":
            w, h = value.split(",")
            self.width, self.height = int(w), int(h)
        self.proc.stdin.write(f"{key}={value}\n".encode())
        self.proc.stdin.flush()

    def render(self) -> np.ndarray:
        """Request one frame -> (H, W, 12) float32; time in `last_time`.

        (parity: `inference/renderer.py:58-71`)"""
        self.proc.stdin.write(b"render\n")
        self.proc.stdin.flush()
        n = 12 * self.height * self.width * 4 + 4
        data = b""
        while len(data) < n:
            chunk = self.proc.stderr.read(n - len(data))
            if not chunk:
                raise RuntimeError("renderer process closed the pipe")
            data += chunk
        frame = np.frombuffer(data[:-4], "<f4").reshape(
            12, self.height, self.width)
        self.last_time = struct.unpack("<f", data[-4:])[0]
        return frame.transpose(1, 2, 0).copy()

    def close(self) -> None:
        try:
            self.proc.stdin.write(b"exit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=5)
        except Exception:
            self.proc.kill()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
