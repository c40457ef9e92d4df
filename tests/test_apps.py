"""Application smoke tests: CLI trainer, stats harness, comparison harness,
dataset viewer, model loading - all with tiny settings."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """Train a micro-model for 2 epochs via the CLI and return its run dir."""
    tmp = tmp_path_factory.mktemp("runs")
    from isosurfacesuperresolution_tpu.apps.main_video_unshaded import main
    run_base = str(tmp)
    main(["--dataset", "analytic:sphere", "--numberOfImages", "2",
          "--numFrames", "2", "--samples", "8", "--cropSize", "8",
          "--batchSize", "2", "--epochs", "2", "--numResidualLayers", "1",
          "--lossBorderPadding", "2", "--aoSamples", "0",
          "--cameraDistance", "0.8,1.2",
          "--runDir", run_base])
    runs = sorted(os.listdir(run_base))
    assert runs == ["run00001"]
    return os.path.join(run_base, "run00001")


def test_camera_distance_flag():
    from isosurfacesuperresolution_tpu.apps.main_video_unshaded import (
        _camera_distance, build_parser)
    p = build_parser()
    assert _camera_distance(p.parse_args([])) == (0.95, 1.3)
    assert _camera_distance(
        p.parse_args(["--cameraDistance", "0.6,1.3"])) == (0.6, 1.3)
    with pytest.raises(SystemExit):
        _camera_distance(p.parse_args(["--cameraDistance", "1.3,0.6"]))


def test_cli_trainer_outputs(trained_run):
    assert os.path.exists(os.path.join(trained_run, "info.txt"))
    assert os.path.exists(os.path.join(trained_run, "config.json"))
    assert os.path.isdir(os.path.join(trained_run, "checkpoints"))
    assert os.path.isdir(os.path.join(trained_run, "tensorboard"))


def test_loaded_model_from_run_dir(trained_run):
    import jax.numpy as jnp
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    lm = LoadedModel.from_run_dir(trained_run)
    assert lm.unshaded
    low = jnp.zeros((1, 8, 8, 5))
    flow = jnp.zeros((1, 8, 8, 2))
    pred = lm.inference(low, None, flow)
    assert pred.shape == (1, 32, 32, 6)
    prev = jnp.zeros((1, 32, 32, 6))
    pred2 = lm.inference(low, prev, flow)
    assert pred2.shape == (1, 32, 32, 6)


def test_artifact_run_dir_npz_fallback(trained_run, tmp_path):
    """A git-committable artifact run dir (config.json + params.npz, no
    orbax tree) restores through the same LoadedModel.from_run_dir and
    yields the exact orbax-checkpointed params.  Exists because the host
    VM is recycled between sessions: orbax trees are too heavy to commit,
    params.npz is not."""
    import shutil

    import jax
    from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
    assert os.path.exists(os.path.join(trained_run, "params.npz"))
    art = str(tmp_path / "artifact_run")
    os.makedirs(art)
    for name in ("config.json", "params.npz"):
        shutil.copy(os.path.join(trained_run, name), os.path.join(art, name))
    lm_full = LoadedModel.from_run_dir(trained_run)
    lm_art = LoadedModel.from_run_dir(art)
    for a, b in zip(jax.tree_util.tree_leaves(lm_full.params),
                    jax.tree_util.tree_leaves(lm_art.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_restore_continues_training(trained_run, tmp_path):
    from isosurfacesuperresolution_tpu.apps.main_video_unshaded import main
    run_base = str(tmp_path / "runs2")
    main(["--dataset", "analytic:sphere", "--numberOfImages", "2",
          "--numFrames", "2", "--samples", "8", "--cropSize", "8",
          "--batchSize", "2", "--epochs", "3", "--numResidualLayers", "1",
          "--lossBorderPadding", "2", "--aoSamples", "0",
          "--runDir", run_base, "--restore", trained_run])


def test_pretrained_adversarial_stage2(trained_run, tmp_path):
    """Stage-2 handoff: --pretrained restores ONLY the generator from a
    stage-1 run while the adversarial stage's discriminator/optimizers
    (structurally absent from the stage-1 checkpoint) start fresh -
    reference --pretrained + trainAdv_v2."""
    from isosurfacesuperresolution_tpu.apps.main_video_unshaded import main
    run_base = str(tmp_path / "runs_adv")
    main(["--dataset", "analytic:sphere", "--numberOfImages", "2",
          "--numFrames", "2", "--samples", "8", "--cropSize", "8",
          "--batchSize", "2", "--epochs", "1", "--numResidualLayers", "1",
          "--lossBorderPadding", "2", "--aoSamples", "0",
          "--runDir", run_base, "--pretrained", trained_run, "--advTraining",
          "--losses", "l1:mask:1,l1:color:1,adv:all:0.1"])
    run = os.path.join(run_base, "run00001")
    assert os.path.exists(os.path.join(run, "checkpoints"))


def test_stats_harness(tmp_path, trained_run):
    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import main
    out = str(tmp_path / "stats")
    main(["--volumes", "analytic:sphere", "--models", "bilinear",
          trained_run, "--output", out, "--numSequences", "1",
          "--numFrames", "2", "--highRes", "256", "--aoSamples", "0"])
    tsv = os.path.join(out, "stats_sphere.tsv")
    assert os.path.exists(tsv)
    lines = open(tsv).read().strip().split("\n")
    assert len(lines) == 3  # header + 2 models
    assert lines[0].startswith("Model\tPSNR-normal")
    # bilinear row has sane PSNR values
    vals = lines[1].split("\t")
    assert float(vals[1]) > 5.0  # PSNR-normal
    # per-sequence uncertainty companion table (round-4: error bars)
    err = os.path.join(out, "stats_sphere_err.tsv")
    lines = open(err).read().strip().split("\n")
    assert lines[0] == "Model\tField\tMean\tStd\tMin\tMax\tNseq"
    assert len(lines) > 1
    row = dict(zip(lines[0].split("\t"), lines[1].split("\t")))
    assert int(row["Nseq"]) == 1 and float(row["Std"]) == 0.0


def test_statistics_sequence_spread():
    """mark_sequence segments the accumulators: per-seq means recover the
    exact per-segment averages and seq_spread reports their spread."""
    import numpy as np
    from isosurfacesuperresolution_tpu.bench.stats import Statistics
    s = Statistics()
    # drive the accumulators directly (frames are expensive): two
    # sequences of 2 and 3 "frames" with known psnr_normal values
    for v in (10.0, 20.0):
        s.psnr_normal += v
        s.n += 1
    s.mark_sequence()
    for v in (30.0, 30.0, 30.0):
        s.psnr_normal += v
        s.n += 1
    s.mark_sequence()
    s.mark_sequence()                      # empty segment: dropped
    spread = s.seq_spread()["psnr_normal"]
    assert spread["nseq"] == 2
    assert spread["mean"] == 22.5          # (15 + 30) / 2
    assert spread["min"] == 15.0 and spread["max"] == 30.0
    assert abs(spread["std"] - np.std([15.0, 30.0], ddof=1)) < 1e-12
    # the global means are untouched by segmentation
    assert abs(s.means()["psnr_normal"] - 24.0) < 1e-12


def test_comparison_harness(tmp_path):
    from isosurfacesuperresolution_tpu.apps.main_comparison import main
    out = str(tmp_path / "cmp")
    main(["--volume", "analytic:sphere", "--models", "bilinear",
          "--output", out, "--width", "128", "--height", "128",
          "--warmup", "1", "--timed", "2"])
    csv = os.path.join(out, "timings.csv")
    assert os.path.exists(csv)
    lines = open(csv).read().strip().split("\n")
    assert lines[0].startswith("Model,Rendering-Time (sec),Network-Time")
    assert len(lines) == 2


def test_dataset_viewer_export(tmp_path):
    from isosurfacesuperresolution_tpu.apps.dataset_viewer import main
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.data.generation import (
        SequenceConfig, generate_sequences)
    from isosurfacesuperresolution_tpu.volume import analytic
    clips = str(tmp_path / "clips")
    grid = analytic.sphere_volume(32)
    generate_sequences(
        [(grid, (0.5, 0.5))], 1,
        SequenceConfig(num_frames=2, high_res=64, ao_samples=0,
                       distance_range=(1.4, 1.8)),
        base_render_cfg=RenderConfig(isovalue=0.5, step_voxels=0.5),
        seed=0, out_dir=clips)
    out = str(tmp_path / "preview")
    main([clips, "--output", out])
    assert os.path.exists(os.path.join(out, "clip_000.png"))
