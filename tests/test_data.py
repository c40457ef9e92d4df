"""Data pipeline tests: sequence generation, crop sampling, augmentation,
batching, reference-npy interchange."""

import os

import numpy as np
import pytest

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.data.dataset import (
    DatasetFromSamples, Sample, VideoDataset, augment_clip,
    load_reference_npy_dir)
from isosurfacesuperresolution_tpu.data.generation import (
    SequenceConfig, generate_sequences, random_camera_path, render_sequence)
from isosurfacesuperresolution_tpu.volume import analytic


@pytest.fixture(scope="module")
def small_sequences():
    grid = analytic.sphere_volume(48)
    seq_cfg = SequenceConfig(num_frames=3, high_res=64, ao_samples=0,
                             distance_range=(1.4, 1.8))
    base = RenderConfig(isovalue=0.5, step_voxels=0.5)
    return generate_sequences([(grid, (0.5, 0.5))], 2, seq_cfg,
                              base_render_cfg=base, seed=0)


def test_sequence_shapes_and_ranges(small_sequences):
    seq = small_sequences[0]
    assert seq["low"].shape == (3, 16, 16, 5)
    assert seq["high"].shape == (3, 64, 64, 6)
    assert seq["flow"].shape == (3, 16, 16, 2)
    # mask in [-1, 1]
    assert set(np.unique(seq["low"][..., 0])).issubset({-1.0, 1.0})
    assert set(np.unique(seq["high"][..., 0])).issubset({-1.0, 1.0})
    # ao in [0, 1]
    assert seq["high"][..., 5].min() >= 0 and seq["high"][..., 5].max() <= 1
    # frame 0 flow is zero (flow wrt previous camera; no previous)
    np.testing.assert_allclose(seq["flow"][0], 0.0, atol=1e-6)
    # later frames have some motion
    assert np.abs(seq["flow"][1:]).max() > 0


def test_camera_path_is_short(small_sequences):
    rng = np.random.RandomState(1)
    cfg = SequenceConfig(num_frames=5)
    cams = random_camera_path(rng, cfg)
    assert len(cams) == 5
    e0 = np.asarray(cams[0].eye)
    e4 = np.asarray(cams[-1].eye)
    assert np.linalg.norm(e4 - e0) < cfg.max_dist + 1e-5


def test_crop_sampling_fill_rate(small_sequences):
    ds = VideoDataset(small_sequences)
    samples = ds.collect_samples(8, crop_size=8, min_fill_rate=0.3,
                                 rng=np.random.RandomState(0))
    assert len(samples) == 8
    # samples sorted by sequence index
    idx = [s.index for s in samples]
    assert idx == sorted(idx)
    for s in samples:
        lo, fl, hi = ds.get_clip(s, 8)
        assert lo.shape == (3, 8, 8, 5)
        assert hi.shape == (3, 32, 32, 6)
        assert (lo[0, ..., 0] > 0).sum() >= 0.3 * 64


def test_crop_sampling_rejects_impossible_fill(small_sequences):
    ds = VideoDataset(small_sequences)
    with pytest.raises(RuntimeError):
        ds.collect_samples(4, crop_size=8, min_fill_rate=1.0,
                           rng=np.random.RandomState(0), max_tries=200)


def test_train_test_split_and_batches(small_sequences):
    ds = VideoDataset(small_sequences)
    samples = ds.collect_samples(10, crop_size=8, min_fill_rate=0.2,
                                 rng=np.random.RandomState(0))
    train = DatasetFromSamples(ds, samples, 8, test=False, test_fraction=0.2)
    test = DatasetFromSamples(ds, samples, 8, test=True, test_fraction=0.2)
    assert len(train) == 8 and len(test) == 2
    batches = list(train.batches(4, rng=np.random.RandomState(1)))
    assert len(batches) == 2
    low, flow, high = batches[0]
    assert low.shape == (4, 3, 8, 8, 5)
    assert flow.shape == (4, 3, 8, 8, 2)
    assert high.shape == (4, 3, 32, 32, 6)


def test_augmentation_sign_fixes():
    rng = np.random.RandomState(2)
    low = rng.randn(2, 6, 6, 5).astype(np.float32)
    high = rng.randn(2, 24, 24, 6).astype(np.float32)
    flow = rng.randn(2, 6, 6, 2).astype(np.float32)
    lo2, hi2, fl2 = augment_clip(low.copy(), high.copy(), flow.copy(), 1)
    # width flip: x-mirrored, normal-x and flow-x negated
    np.testing.assert_allclose(lo2[..., 0], low[:, :, ::-1, 0])
    np.testing.assert_allclose(lo2[..., 1], -low[:, :, ::-1, 1])
    np.testing.assert_allclose(fl2[..., 0], -flow[:, :, ::-1, 0])
    np.testing.assert_allclose(fl2[..., 1], flow[:, :, ::-1, 1])
    # double flip x then undo
    lo3, hi3, fl3 = augment_clip(lo2, hi2, fl2, 1)
    np.testing.assert_allclose(lo3, low)
    np.testing.assert_allclose(hi3, high)
    np.testing.assert_allclose(fl3, flow)


def test_npy_interchange_roundtrip(tmp_path, small_sequences):
    grid = analytic.sphere_volume(48)
    seq_cfg = SequenceConfig(num_frames=3, high_res=64, ao_samples=0,
                             distance_range=(1.4, 1.8))
    base = RenderConfig(isovalue=0.5, step_voxels=0.5)
    out_dir = str(tmp_path / "clips")
    seqs = generate_sequences([(grid, (0.5, 0.5))], 2, seq_cfg,
                              base_render_cfg=base, seed=0, out_dir=out_dir)
    assert os.path.exists(os.path.join(out_dir, "low_00000.npy"))
    # reference layout: (T, C, H, W)
    raw = np.load(os.path.join(out_dir, "low_00000.npy"))
    assert raw.shape == (3, 5, 16, 16)
    loaded = load_reference_npy_dir(out_dir)
    assert len(loaded) == 2
    np.testing.assert_allclose(loaded[0]["low"], seqs[0]["low"])
    np.testing.assert_allclose(loaded[1]["high"], seqs[1]["high"])


def test_npy_index_file(tmp_path, small_sequences):
    grid = analytic.sphere_volume(48)
    seq_cfg = SequenceConfig(num_frames=2, high_res=32, ao_samples=0,
                             distance_range=(1.4, 1.8))
    base = RenderConfig(isovalue=0.5, step_voxels=0.5)
    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    generate_sequences([(grid, (0.5, 0.5))], 1, seq_cfg,
                       base_render_cfg=base, seed=0, out_dir=d1)
    generate_sequences([(grid, (0.5, 0.5))], 1, seq_cfg,
                       base_render_cfg=base, seed=1, out_dir=d2)
    index = tmp_path / "index.txt"
    index.write_text("a\nb\n")
    loaded = load_reference_npy_dir(str(index))
    assert len(loaded) == 2
