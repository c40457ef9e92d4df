"""Self-contained EXR codec: round trips, predictor parity, dataset glue."""

import numpy as np
import pytest

from isosurfacesuperresolution_tpu.data.exr import (
    NO_COMPRESSION, ZIP_COMPRESSION, ZIPS_COMPRESSION, _predict_decode,
    _predict_encode, read_exr, write_exr)


def _img(h=13, w=17, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "R": rng.rand(h, w).astype(np.float32),
        "G": (rng.rand(h, w) * 2 - 1).astype(np.float32),
        "B": np.zeros((h, w), np.float32),
        "Z": rng.rand(h, w).astype(np.float32) * 100,
    }


@pytest.mark.parametrize("comp", [NO_COMPRESSION, ZIPS_COMPRESSION,
                                  ZIP_COMPRESSION])
def test_roundtrip_float(tmp_path, comp):
    chans = _img()
    p = str(tmp_path / "t.exr")
    write_exr(p, chans, compression=comp)
    back = read_exr(p)
    assert set(back) == set(chans)
    for k in chans:
        np.testing.assert_array_equal(back[k], chans[k])


def test_roundtrip_half(tmp_path):
    chans = _img()
    p = str(tmp_path / "h.exr")
    write_exr(p, chans, half=True)
    back = read_exr(p)
    for k in chans:
        np.testing.assert_allclose(
            back[k], chans[k].astype(np.float16).astype(np.float32))


def test_predictor_matches_openexr_reference():
    """Bit-exact check against a straight port of ImfZip.cpp's loops."""
    rng = np.random.RandomState(3)
    raw = rng.randint(0, 256, 999, dtype=np.uint8).tobytes()

    # reference: interleave-split then serial delta (ImfZip.cpp compress)
    b = bytearray(raw)
    n = len(b)
    tmp = bytearray(n)
    t1, t2 = 0, (n + 1) // 2
    for i, v in enumerate(b):
        if i % 2 == 0:
            tmp[t1] = v
            t1 += 1
        else:
            tmp[t2] = v
            t2 += 1
    p = tmp[0]
    for i in range(1, n):
        d = (int(tmp[i]) - p + (128 + 256)) & 0xFF
        p = tmp[i]
        tmp[i] = d
    assert bytes(tmp) == _predict_encode(raw)
    assert _predict_decode(_predict_encode(raw)) == raw


def test_incompressible_block_fallback(tmp_path):
    rng = np.random.RandomState(4)
    chans = {"N": rng.randint(0, 2 ** 32 - 1, (20, 16), np.uint32)
             .view(np.float32)}
    chans["N"] = np.nan_to_num(chans["N"])        # keep values comparable
    p = str(tmp_path / "r.exr")
    write_exr(p, chans, compression=ZIP_COMPRESSION)
    np.testing.assert_array_equal(read_exr(p)["N"], chans["N"])


def test_dataset_read_exr_uses_builtin(tmp_path):
    """data/dataset._read_exr reads files from the built-in codec without
    OpenEXR/cv2 (legacy EXR clips become loadable in this environment)."""
    from isosurfacesuperresolution_tpu.data.dataset import _read_exr
    chans = {"R": np.full((4, 6), 0.25, np.float32),
             "G": np.full((4, 6), 0.5, np.float32),
             "B": np.full((4, 6), 0.75, np.float32),
             "A": np.ones((4, 6), np.float32)}
    p = str(tmp_path / "rgba.exr")
    write_exr(p, chans)
    arr = _read_exr(p)
    assert arr.shape[:2] == (4, 6) and arr.shape[2] >= 3
    np.testing.assert_allclose(arr[..., 0], 0.25)
    np.testing.assert_allclose(arr[..., 1], 0.5)
    np.testing.assert_allclose(arr[..., 2], 0.75)


def test_legacy_exr_dir_roundtrip(tmp_path):
    """Write a reference-layout EXR clip with the built-in codec and load
    it through the legacy loader (datasetVideo.py:172-258 parity)."""
    from isosurfacesuperresolution_tpu.data.dataset import (
        load_legacy_exr_dir)
    rng = np.random.RandomState(0)
    h = w = 16
    H = W = 32
    for j in range(3):
        def rand(hh, ww):
            return rng.rand(hh, ww).astype(np.float32)
        mask_hi = (rand(H, W) > 0.4).astype(np.float32)
        write_exr(str(tmp_path / ("high_tmp_%05d.exr" % j)),
                  {"R": rand(H, W), "G": rand(H, W), "B": rand(H, W),
                   "A": mask_hi})
        write_exr(str(tmp_path / ("high_tmp_%05d_depth.exr" % j)),
                  {"R": rand(H, W), "G": rand(H, W), "B": rand(H, W),
                   "A": rand(H, W)})
        write_exr(str(tmp_path / ("high_tmp_%05d_fx.exr" % j)),
                  {"R": rand(H, W), "G": rand(H, W), "B": rand(H, W),
                   "A": np.ones((H, W), np.float32)})
        mask_lo = (rand(h, w) > 0.4).astype(np.float32)
        write_exr(str(tmp_path / ("low_tmp_%05d.exr" % j)),
                  {"R": rand(h, w), "G": rand(h, w), "B": rand(h, w),
                   "A": mask_lo})
        write_exr(str(tmp_path / ("low_tmp_%05d_depth.exr" % j)),
                  {"R": rand(h, w), "G": rand(h, w), "B": rand(h, w),
                   "A": rand(h, w)})
        write_exr(str(tmp_path / ("low_tmp_%05d_flow.exr" % j)),
                  {"R": (rand(h, w) - 0.5), "G": (rand(h, w) - 0.5),
                   "B": np.zeros((h, w), np.float32)})
    seqs = load_legacy_exr_dir(str(tmp_path), num_frames=3)
    assert len(seqs) == 1
    assert seqs[0]["high"].shape == (3, H, W, 6)
    assert seqs[0]["low"].shape == (3, h, w, 5)
    assert seqs[0]["flow"].shape == (3, h, w, 2)
    assert set(np.unique(seqs[0]["high"][..., 0])) <= {-1.0, 1.0}
