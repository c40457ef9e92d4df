"""Interop tests: renderer pipe protocol (PipeTest parity), volume
converter, descriptor-file datasets."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest


def test_render_server_pipe_protocol(tmp_path):
    """Drive the pipe server end-to-end like DataGenerator/PipeTest.py."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "isosurfacesuperresolution_tpu.apps.render_server",
         "--volume", "analytic:sphere"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        w, h = 32, 24
        cmds = (f"resolution={w},{h}\n"
                "cameraOrigin=0,1,-1.7\n"
                "cameraLookAt=0,0,0\n"
                "cameraUp=0,1,0\n"
                "fov=45\n"
                "isovalue=0.5\n"
                "render\n"
                "exit\n")
        proc.stdin.write(cmds.encode())
        proc.stdin.flush()
        proc.stdin.close()

        expect = 12 * h * w * 4 + 4
        data = b""
        while len(data) < expect:
            chunk = proc.stderr.read(expect - len(data))
            if not chunk:
                break
            data += chunk
        assert len(data) == expect, len(data)
        frame = np.frombuffer(data[:-4], "<f4").reshape(12, h, w)
        seconds = struct.unpack("<f", data[-4:])[0]
        assert seconds > 0
        mask = frame[3]
        assert mask.max() == 1.0 and mask.min() == 0.0
        # 12-channel layout: ao=1 (no AO), shadow=1
        np.testing.assert_allclose(frame[10][mask < 0.5], 1.0)
        np.testing.assert_allclose(frame[11], 1.0)
        out = proc.stdout.read().decode()
        assert "Pipe mode" in out
    finally:
        proc.kill()


def test_convert_volume_roundtrip(tmp_path):
    from isosurfacesuperresolution_tpu.apps.convert_volume import main
    from isosurfacesuperresolution_tpu.volume.importers import load_cvol
    rng = np.random.RandomState(0)
    vol_zyx = (rng.rand(8, 8, 16) * 255).astype(np.uint8)
    raw = tmp_path / "v.raw"
    raw.write_bytes(vol_zyx.tobytes())
    dat = tmp_path / "v.dat"
    dat.write_text("ObjectFileName: v.raw\nResolution: 16 8 8\n"
                   "Format: UCHAR\n")
    out = str(tmp_path / "v.cvol.npz")
    main([str(dat), out, "--threshold", "0.0"])
    g = load_cvol(out)
    assert g.resolution == (16, 8, 8)
    assert g.ao_sh is None


def test_convert_volume_with_baked_ao(tmp_path):
    from isosurfacesuperresolution_tpu.apps.convert_volume import main
    from isosurfacesuperresolution_tpu.volume.importers import load_cvol
    vol = np.zeros((16, 16, 16), np.float32)
    vol[4:12, 4:12, 4:12] = 1.0
    np.save(tmp_path / "cube.npy", vol)
    out = str(tmp_path / "cube.cvol.npz")
    main([str(tmp_path / "cube.npy"), out, "--bakeAO",
          "--isovalue", "0.5", "--aoRadius", "0.1"])
    g = load_cvol(out)
    assert g.ao_sh is not None
    assert g.ao_sh.shape == (16, 16, 16, 4)


def test_descriptor_dataset(tmp_path):
    from isosurfacesuperresolution_tpu.apps.main_video_unshaded import (
        build_parser, load_sequences, make_config)
    vol = np.zeros((32, 32, 32), np.float32)
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, 32)] * 3, indexing="ij")
    vol = np.clip(1.2 - np.sqrt(x**2 + y**2 + z**2) * 1.5, 0, 1
                  ).astype(np.float32)
    np.save(tmp_path / "ball.npy", vol)
    desc = tmp_path / "volumes.txt"
    desc.write_text("ball.npy 0.4 0.6\n")
    args = build_parser().parse_args(
        ["--dataset", f"descriptor:{desc}", "--numberOfImages", "1",
         "--numFrames", "2", "--cropSize", "8"])
    cfg = make_config(args)
    seqs = load_sequences(args, cfg)
    assert len(seqs) == 1
    assert seqs[0]["low"].shape == (2, 32, 32, 5)


def test_pipe_client_roundtrip():
    from isosurfacesuperresolution_tpu.infer.pipe_client import PipeRenderer
    env_backup = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        with PipeRenderer.local_server("analytic:sphere", 24, 16) as r:
            r.send_command("cameraOrigin", "0,1,-1.7")
            r.send_command("isovalue", "0.5")
            frame = r.render()
            assert frame.shape == (16, 24, 12)
            assert frame[..., 3].max() == 1.0
            assert r.last_time > 0
            # second frame reuses the process
            r.send_command("cameraOrigin", "0.1,1,-1.7")
            frame2 = r.render()
            assert frame2.shape == (16, 24, 12)
    finally:
        if env_backup is not None:
            os.environ["JAX_PLATFORMS"] = env_backup
