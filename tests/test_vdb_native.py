"""Native `.vdb` decode (no OpenVDB library): reader/writer roundtrips.

The reader (`native/vdbio.cpp`) and the writer (`volume/vdb_write.py`)
were implemented independently from the OpenVDB file-format spec (the
reference always links the library instead: `CPURenderer.cpp:448-460`,
`Vdb2Vbx.cpp:70-324`); these tests cross-check one against the other over
every compression mode, multi-node topologies, and the end-to-end
BrickGrid ingestion path.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from isosurfacesuperresolution_tpu.volume.vdb_write import write_vdb

try:
    from isosurfacesuperresolution_tpu.native import vdbio
except (OSError, subprocess.CalledProcessError):  # no g++/zlib
    vdbio = None

pytestmark = pytest.mark.skipif(vdbio is None,
                                reason="native vdbio not buildable")


def _random_volume(shape, density=0.4, seed=0):
    rng = np.random.RandomState(seed)
    v = np.zeros(shape, np.float32)
    m = rng.rand(*shape) > (1 - density)
    v[m] = rng.rand(m.sum()).astype(np.float32) + 0.05
    return v


@pytest.mark.parametrize("compression", ["zip", "none"])
@pytest.mark.parametrize("half", [False, True])
def test_roundtrip_modes(tmp_path, compression, half):
    v = _random_volume((20, 17, 33), seed=1)
    path = str(tmp_path / "t.vdb")
    write_vdb(path, v, compression=compression, half=half,
              voxel_size=0.25, origin=(-5, 3, 0))
    assert vdbio.grid_names(path) == ["density"]
    bbox, vox = vdbio.probe(path)
    assert vox == (0.25, 0.25, 0.25)
    out, _ = vdbio.load(path)
    x0, y0, z0 = bbox[0] + 5, bbox[1] - 3, bbox[2]
    exp = v[x0:x0 + out.shape[0], y0:y0 + out.shape[1],
            z0:z0 + out.shape[2]]
    if half:
        np.testing.assert_allclose(out, exp, atol=1e-3)
    else:
        np.testing.assert_array_equal(out, exp)


def test_multi_internal_node_topology(tmp_path):
    """A volume spanning several 128^3 internal-1 nodes (and a negative
    origin crossing the 4096-aligned root key) exercises child ordering."""
    v = np.zeros((160, 140, 130), np.float32)
    rng = np.random.RandomState(3)
    # sparse clusters in different octants
    for c in [(10, 10, 10), (150, 130, 120), (20, 130, 10), (150, 10, 120)]:
        sl = tuple(slice(a, a + 8) for a in c)
        v[sl] = rng.rand(8, 8, 8).astype(np.float32) + 0.1
    path = str(tmp_path / "multi.vdb")
    write_vdb(path, v, origin=(-64, -64, -64))
    out, _ = vdbio.load(path)
    bbox, _ = vdbio.probe(path)
    x0, y0, z0 = bbox[0] + 64, bbox[1] + 64, bbox[2] + 64
    exp = v[x0:x0 + out.shape[0], y0:y0 + out.shape[1], z0:z0 + out.shape[2]]
    np.testing.assert_array_equal(out, exp)


def test_background_fill(tmp_path):
    """Inactive voxels inside the active bbox come back as background."""
    v = np.full((16, 16, 16), 0.5, np.float32)
    v[5:10, 5:10, 5:10] = 0.5              # same as background -> inactive
    v[0, 0, 0] = 1.0
    v[15, 15, 15] = 2.0
    path = str(tmp_path / "bg.vdb")
    write_vdb(path, v, background=0.5)
    out, _ = vdbio.load(path)
    assert out.shape == (16, 16, 16)
    np.testing.assert_array_equal(out, v)


def test_error_messages(tmp_path):
    bad = str(tmp_path / "bad.vdb")
    with open(bad, "wb") as f:
        f.write(b"not a vdb file at all")
    with pytest.raises(OSError, match="not a .vdb"):
        vdbio.probe(bad)
    # blosc flag in per-grid compression -> clear rejection
    v = _random_volume((8, 8, 8), seed=2)
    path = str(tmp_path / "b.vdb")
    write_vdb(path, v, compression="zip")
    data = bytearray(open(path, "rb").read())
    # per-grid compression u32 sits right after the descriptor block; find
    # it via the known flag value (zip|active_mask = 3) following topology
    # offsets - patch the first occurrence after the 3 stream offsets
    names_len = len(b"density")
    # descriptor: str name, str type, str "", 3x i64
    off = 8 + 4 + 8 + 1 + 36 + 4
    off += 4 + names_len
    off += 4 + len(b"Tree_float_5_4_3")
    off += 4 + 0
    off += 24
    flags = struct.unpack_from("<I", data, off)[0]
    assert flags == 0x3
    struct.pack_into("<I", data, off, flags | 0x4)  # add blosc bit
    open(path, "wb").write(bytes(data))
    with pytest.raises(OSError, match="blosc"):
        vdbio.load(path)


def test_load_vdb_brickgrid_path(tmp_path):
    """volume.vdb.load_vdb uses the native decoder (no bindings in this
    image) and normalizes into a BrickGrid."""
    from isosurfacesuperresolution_tpu.volume.vdb import load_vdb
    v = _random_volume((24, 16, 16), density=0.8, seed=5)
    path = str(tmp_path / "g.vdb")
    write_vdb(path, v, grid_name="density")
    grid, name = load_vdb(path)
    assert name == "density"
    bbox, _ = vdbio.probe(path)
    assert grid.resolution == (bbox[3] - bbox[0] + 1, bbox[4] - bbox[1] + 1,
                               bbox[5] - bbox[2] + 1)


def test_convert_volume_vdb_cycle(tmp_path):
    """convert_volume: .npy -> .vdb -> .cvol.npz end-to-end."""
    from isosurfacesuperresolution_tpu.apps.convert_volume import main
    v = _random_volume((16, 16, 16), density=0.9, seed=7)
    npy = str(tmp_path / "v.npy")
    np.save(npy, v)
    vdb_path = str(tmp_path / "v.vdb")
    cvol = str(tmp_path / "v.cvol.npz")
    main([npy, vdb_path])
    main([vdb_path, cvol])
    assert os.path.exists(cvol)
