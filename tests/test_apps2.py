"""Smoke tests for the second wave of applications: shaded trainer,
all-angles harness, scripted videos, VGG analysis, run cleanup,
single-image dataset, profiling utils."""

import os

import numpy as np
import pytest


def test_shaded_trainer(tmp_path):
    from isosurfacesuperresolution_tpu.apps.main_video_shaded import main
    run_base = str(tmp_path / "runs")
    main(["--dataset", "analytic:sphere", "--numberOfImages", "2",
          "--numFrames", "2", "--samples", "6", "--cropSize", "8",
          "--batchSize", "2", "--epochs", "2", "--numResidualLayers", "1",
          "--lossBorderPadding", "2", "--losses", "l1:1,temp-l2:0.1",
          "--aoSamples", "0", "--runDir", run_base])
    run = os.path.join(run_base, "run00001")
    assert os.path.isdir(os.path.join(run, "checkpoints"))


def test_shade_clip_shapes():
    import jax.numpy as jnp
    from isosurfacesuperresolution_tpu.config import ShadingConfig
    from isosurfacesuperresolution_tpu.train.trainer_shaded import shade_clip
    rng = np.random.RandomState(0)
    low = jnp.asarray(rng.rand(2, 3, 8, 8, 5).astype(np.float32))
    high = jnp.asarray(rng.rand(2, 3, 32, 32, 6).astype(np.float32))
    lo, hi = shade_clip(low, high, ShadingConfig())
    assert lo.shape == (2, 3, 8, 8, 8)
    assert hi.shape == (2, 3, 32, 32, 3)
    assert float(hi.min()) >= 0 and float(hi.max()) <= 1


def test_allangles_harness(tmp_path):
    from isosurfacesuperresolution_tpu.apps.main_psnr_allangles import main
    out = str(tmp_path / "aa")
    main(["--volume", "analytic:sphere", "--models", "bilinear",
          "--cameras", "2", "--rolls", "2", "--lowRes", "16",
          "--output", out])
    tsv = os.path.join(out, "allangles_sphere.tsv")
    lines = open(tsv).read().strip().split("\n")
    assert len(lines) == 2
    vals = lines[1].split("\t")
    assert vals[0] == "bilinear"
    assert 5.0 < float(vals[3]) < 80.0    # mean normal PSNR sane
    assert 5.0 < float(vals[7]) < 80.0    # mean color PSNR sane
    assert int(vals[11]) == 0             # no NaN frames


def test_allangles_harness_ao(tmp_path):
    # AO-enabled variant: bakes the SH occlusion field up front (the
    # hemisphere-ray oracle at 4x GT res crashed the real chip) and
    # shades with strength 0.8
    from isosurfacesuperresolution_tpu.apps.main_psnr_allangles import main
    out = str(tmp_path / "aa_ao")
    main(["--volume", "analytic:sphere", "--models", "bilinear",
          "--cameras", "1", "--rolls", "1", "--lowRes", "16",
          "--aoSamples", "8", "--output", out])
    tsv = os.path.join(out, "allangles_sphere.tsv")
    vals = open(tsv).read().strip().split("\n")[1].split("\t")
    assert 5.0 < float(vals[7]) < 80.0
    assert int(vals[11]) == 0


def test_comparison_video_pngs(tmp_path):
    from isosurfacesuperresolution_tpu.apps.main_comparison_video import main
    out = str(tmp_path / "vid")
    main(["--volume", "analytic:sphere", "--models", "bilinear",
          "--script", "rotation", "--frames", "3", "--lowRes", "16",
          "--output", out, "--pngs"])
    d = os.path.join(out, "sphere_rotation_bilinear_color")
    assert os.path.exists(os.path.join(d, "0000.png"))


def test_comparison_video_isovalue_script():
    from isosurfacesuperresolution_tpu.apps.main_comparison_video import (
        SCRIPTS)
    base = {"distance": 1.7, "height": 0.9, "isovalue": 0.5, "fov": 45.0,
            "eye": (0, 0.9, -1.7), "camera_light": True}
    isos = [SCRIPTS["isovalue"](i, 8, base)["isovalue"] for i in range(8)]
    assert min(isos) >= 0.25 and max(isos) <= 0.7
    assert isos[0] < isos[3]          # sweeps up
    fovs = [SCRIPTS["zoom"](i, 8, base)["fov"] for i in range(8)]
    assert min(fovs) >= 20.0 and fovs[0] == 45.0


def test_vgg_analysis(capsys):
    from isosurfacesuperresolution_tpu.apps.vgg_analysis import main
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        main(["--volume", "analytic:sphere", "--images", "2",
              "--res", "32", "--layers", "3"])
    out = capsys.readouterr().out
    assert "--perceptualLossLayers" in out
    assert "conv_3" in out


def test_delete_empty_runs(tmp_path):
    from isosurfacesuperresolution_tpu.apps.delete_empty_runs import (
        find_empty_runs, main)
    base = tmp_path / "runs"
    (base / "run00001" / "checkpoints" / "3").mkdir(parents=True)
    (base / "run00002").mkdir()
    (base / "run00002" / "info.txt").write_text("x")
    empty = find_empty_runs(str(base))
    assert [os.path.basename(e) for e in empty] == ["run00002"]
    main([str(base)])
    assert not (base / "run00002").exists()
    assert (base / "run00001").exists()


def test_single_image_dataset():
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.data.dataset_single import (
        SingleImageDataset, collect_samples_rendered, render_single_frames)
    from isosurfacesuperresolution_tpu.volume import analytic
    grid = analytic.sphere_volume(32)
    cfg = RenderConfig(width=16, height=16, isovalue=0.5, ao_samples=0)
    low, high = render_single_frames(grid, 2, cfg, ao_samples=0)
    assert low.shape == (2, 16, 16, 5)
    assert high.shape == (2, 64, 64, 6)
    samples = collect_samples_rendered(low, high, 4, 8, min_fill_rate=0.1,
                                       rng=np.random.RandomState(0))
    ds = SingleImageDataset(low, high, samples, 8)
    batches = list(ds.batches(2))
    lo, flow, hi = batches[0]
    assert lo.shape == (2, 1, 8, 8, 5)
    assert flow.shape == (2, 1, 8, 8, 2)
    assert hi.shape == (2, 1, 32, 32, 6)


def test_frame_timer_and_timed_chain():
    import jax.numpy as jnp
    from isosurfacesuperresolution_tpu.utils.profiling import (
        FrameTimer, timed_chain)
    t = FrameTimer(window=4)
    for _ in range(3):
        t.start()
        x = jnp.ones((8, 8)) * 2
        t.stop(x)
    assert t.fps > 0 and t.ms >= 0

    dt = timed_chain(lambda c: c * 0.999 + 0.001, jnp.ones((64, 64)), n=4)
    assert dt > 0


def test_main_psnr_crops_batched(tmp_path):
    """Crop-PSNR harness (mainPSNR1 parity: shaded-color protocol) runs on
    a generated clip dir and reports bilinear > 10 dB."""
    import numpy as np
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.data.generation import (
        SequenceConfig, generate_sequences)
    from isosurfacesuperresolution_tpu.volume import analytic

    seq_cfg = SequenceConfig(num_frames=3, high_res=96, ao_samples=0)
    generate_sequences([(analytic.sphere_volume(32), (0.5, 0.5))], 2,
                       seq_cfg, base_render_cfg=RenderConfig(
                           step_voxels=0.5),
                       seed=0, out_dir=str(tmp_path))
    import contextlib, io
    from isosurfacesuperresolution_tpu.apps.main_psnr_crops import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--dataset", str(tmp_path), "--models", "bilinear",
              "--samples", "16", "--cropSize", "16", "--testFraction",
              "0.5"])
    out = buf.getvalue()
    assert "bilinear" in out
    row = [l for l in out.splitlines() if l.startswith("bilinear")][0]
    vals = [float(x) for x in row.split()[1:]]
    assert len(vals) == 6 and all(np.isfinite(vals)) and vals[0] > 10


def test_adv_evidence_harness(tmp_path):
    """GAN-evidence harness (texture/sharpness metrics + panels) runs on
    a generated clip dir; gradient ratio of bilinear must be < 1 (it
    smooths) and all metrics finite; the panel PNG is written."""
    import numpy as np
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.data.generation import (
        SequenceConfig, generate_sequences)
    from isosurfacesuperresolution_tpu.volume import analytic

    seq_cfg = SequenceConfig(num_frames=3, high_res=96, ao_samples=0)
    generate_sequences([(analytic.sphere_volume(32), (0.5, 0.5))], 2,
                       seq_cfg, base_render_cfg=RenderConfig(
                           step_voxels=0.5),
                       seed=0, out_dir=str(tmp_path / "clips"))
    import contextlib, io
    from isosurfacesuperresolution_tpu.apps.adv_evidence import main
    out_dir = tmp_path / "ev"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--dataset", str(tmp_path / "clips"), "--models",
              "bilinear", "--samples", "16", "--cropSize", "16",
              "--testFraction", "0.5", "--numPanels", "2",
              "--output", str(out_dir)])
    out = buf.getvalue()
    row = [l for l in out.splitlines() if l.startswith("bilinear")][0]
    vals = [float(x) for x in row.split()[1:]]
    # 6th column (tex-lrn, round 5) is NaN when the committed texenc
    # weights are absent, finite when artifacts/texenc/texenc.npz exists
    assert len(vals) == 6 and all(np.isfinite(vals[:5]))
    if os.path.exists("artifacts/texenc/texenc.npz"):
        assert np.isfinite(vals[5])
    assert 0.0 < vals[1] < 1.0          # bilinear smooths: grad ratio < 1
    assert (out_dir / "panels.png").exists()
    assert (out_dir / "adv_evidence.tsv").exists()
