"""Volume ingestion tests: .dat/RAW parsing, native C++ fast path, cvol."""

import os

import numpy as np
import pytest

from isosurfacesuperresolution_tpu.volume.importers import (
    box_downsample, import_npy, import_raw, load_cvol, parse_dat_descriptor,
    save_cvol)
from isosurfacesuperresolution_tpu.volume import analytic


def _write_dat(tmp_path, vol_zyx: np.ndarray, fmt="UCHAR",
               header_bytes: int = 0):
    rz, ry, rx = vol_zyx.shape
    raw = tmp_path / "vol.raw"
    with open(raw, "wb") as f:
        f.write(b"\x00" * header_bytes)
        f.write(vol_zyx.tobytes())
    dat = tmp_path / "vol.dat"
    dat.write_text(f"ObjectFileName: vol.raw\n"
                   f"Resolution: {rx} {ry} {rz}\n"
                   f"Format: {fmt}\n")
    return str(dat)


def test_parse_dat_descriptor(tmp_path):
    vol = np.zeros((4, 6, 8), np.uint8)
    dat = _write_dat(tmp_path, vol)
    obj, res, fmt = parse_dat_descriptor(dat)
    assert obj == "vol.raw"
    assert res == (8, 6, 4)
    assert fmt == "UCHAR"


def test_parse_dat_missing_fields(tmp_path):
    dat = tmp_path / "bad.dat"
    dat.write_text("Resolution: 8 8 8\n")
    with pytest.raises(ValueError):
        parse_dat_descriptor(str(dat))


@pytest.mark.parametrize("use_native", [False, True])
def test_import_raw_uchar(tmp_path, use_native):
    rng = np.random.RandomState(0)
    vol_zyx = (rng.rand(8, 12, 16) * 255).astype(np.uint8)
    dat = _write_dat(tmp_path, vol_zyx)
    grid = import_raw(dat, lower_threshold=0.0, use_native=use_native)
    assert grid.values.shape == (16, 12, 8)
    expected = (vol_zyx.astype(np.float32) / 255.0).transpose(2, 1, 0)
    np.testing.assert_allclose(np.asarray(grid.values), expected, atol=1e-6)
    # unit-box normalization: longest side spans 1
    ext = np.asarray(grid.bbox_max) - np.asarray(grid.bbox_min)
    np.testing.assert_allclose(ext.max(), 1.0)


def test_import_raw_header_skip_and_threshold(tmp_path):
    vol_zyx = np.full((4, 4, 4), 10, np.uint8)   # value 10/255 ~ 0.039
    dat = _write_dat(tmp_path, vol_zyx, header_bytes=100)
    grid = import_raw(dat, lower_threshold=0.05, use_native=False)
    np.testing.assert_allclose(np.asarray(grid.values), 0.0)
    grid2 = import_raw(dat, lower_threshold=0.01, use_native=False)
    assert float(np.asarray(grid2.values).max()) > 0.03


def test_import_raw_ushort_downsample(tmp_path):
    rng = np.random.RandomState(1)
    vol_zyx = (rng.rand(8, 8, 8) * 65535).astype(np.uint16)
    dat = _write_dat(tmp_path, vol_zyx, fmt="USHORT")
    g1 = import_raw(dat, downsampling=2, lower_threshold=0.0,
                    use_native=False)
    assert g1.values.shape == (4, 4, 4)
    try:
        g2 = import_raw(dat, downsampling=2, lower_threshold=0.0,
                        use_native=True)
        np.testing.assert_allclose(np.asarray(g1.values),
                                   np.asarray(g2.values), atol=1e-5)
    except OSError:
        pytest.skip("native toolchain unavailable")


def test_native_matches_numpy_path(tmp_path):
    pytest.importorskip(
        "isosurfacesuperresolution_tpu.native.volumeio")
    rng = np.random.RandomState(2)
    vol_zyx = (rng.rand(16, 12, 8) * 255).astype(np.uint8)
    dat = _write_dat(tmp_path, vol_zyx)
    a = import_raw(dat, lower_threshold=0.1, use_native=True)
    b = import_raw(dat, lower_threshold=0.1, use_native=False)
    np.testing.assert_allclose(np.asarray(a.values), np.asarray(b.values),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.brick_max),
                               np.asarray(b.brick_max), atol=1e-6)


def test_box_downsample():
    v = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    out = box_downsample(v, 2)
    np.testing.assert_allclose(out, [[[3.5]]])


def test_npy_import(tmp_path):
    vol = np.random.RandomState(3).rand(8, 8, 8).astype(np.float32)
    p = str(tmp_path / "v.npy")
    np.save(p, vol)
    grid = import_npy(p)
    np.testing.assert_allclose(np.asarray(grid.values), vol)


def test_cvol_roundtrip(tmp_path):
    grid = analytic.sphere_volume(32)
    p = str(tmp_path / "s.cvol.npz")
    save_cvol(p, grid)
    g2 = load_cvol(p)
    np.testing.assert_allclose(np.asarray(grid.values),
                               np.asarray(g2.values))
    np.testing.assert_allclose(np.asarray(grid.brick_max),
                               np.asarray(g2.brick_max))
    assert g2.brick_size == grid.brick_size


def test_vdb_loader_error_without_file():
    """load_vdb tries the native from-spec decoder first; a missing file
    must surface a clear OSError naming the native failure (and, absent
    OpenVDB python bindings, saying so) rather than crashing opaquely."""
    import pytest
    from isosurfacesuperresolution_tpu.volume.vdb import load_vdb
    with pytest.raises(OSError, match="native .vdb decode failed|No such"):
        load_vdb("/nonexistent.vdb")
