"""Render CLI + SSAO tests."""

import os

import numpy as np
import pytest


def test_render_cli_single(tmp_path):
    from isosurfacesuperresolution_tpu.apps.render_cli import main
    out = str(tmp_path / "r")
    main(["--volume", "analytic:sphere", "--res", "32,24",
          "--isovalue", "0.5", "--output", out, "--saveGbuffer"])
    assert os.path.exists(os.path.join(out, "sphere.png"))
    g = np.load(os.path.join(out, "sphere.npz"))["gbuffer"]
    assert g.shape == (24, 32, 12)
    assert g[..., 3].max() == 1.0


def test_render_cli_animation_with_downscale(tmp_path):
    from isosurfacesuperresolution_tpu.apps.render_cli import main
    out = str(tmp_path / "r")
    main(["--volume", "analytic:sphere", "--res", "32,32",
          "--isovalue", "0.5", "--animation", "2",
          "--origin", "0,1,-1.7,0.2,1,-1.68",
          "--downscale_factor", "4", "--output", out])
    assert os.path.exists(os.path.join(out, "sphere_00000.png"))
    assert os.path.exists(os.path.join(out, "sphere_00001_low.png"))


def test_render_cli_screen_ao(tmp_path):
    from isosurfacesuperresolution_tpu.apps.render_cli import main
    out = str(tmp_path / "r")
    main(["--volume", "analytic:torus", "--res", "48,48",
          "--isovalue", "0.5", "--ao", "screen", "--aosamples", "8",
          "--output", out, "--saveGbuffer"])
    g = np.load(os.path.join(out, "torus.npz"))["gbuffer"]
    mask = g[..., 3] > 0.5
    ao = g[..., 10]
    assert np.all(ao[~mask] == 1.0)
    assert ao[mask].min() < 1.0        # SSAO produced some occlusion


def test_ssao_flat_plane_unoccluded():
    import jax.numpy as jnp
    from isosurfacesuperresolution_tpu.render.ssao import apply_screen_ao
    frame = np.zeros((32, 32, 12), np.float32)
    frame[..., 3] = 1.0
    frame[..., 7] = 0.7                 # constant depth: nothing occludes
    out = np.asarray(apply_screen_ao(jnp.asarray(frame), samples=8,
                                     radius_px=4))
    np.testing.assert_allclose(out[..., 10], 1.0)


def test_ssao_step_edge_occludes():
    import jax.numpy as jnp
    from isosurfacesuperresolution_tpu.render.ssao import apply_screen_ao
    frame = np.zeros((32, 32, 12), np.float32)
    frame[..., 3] = 1.0
    frame[..., 7] = 0.7
    frame[:, :16, 7] = 0.695            # left half a bit closer
    out = np.asarray(apply_screen_ao(jnp.asarray(frame), samples=16,
                                     radius_px=4, depth_range=0.02))
    ao = out[..., 10]
    # pixels just right of the step are occluded by the closer left half
    assert ao[16, 17] < 1.0
    # far from the edge: unoccluded
    assert ao[16, 28] == 1.0


def test_image_vis_lens_figure(tmp_path):
    from isosurfacesuperresolution_tpu.apps.image_vis import (
        main, make_lens_figure)
    rgb = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    fig = make_lens_figure(rgb, 0.5, 0.5, 0.3, zoom=2)
    assert fig.shape[0] == 32 and fig.shape[1] > 32
    out = str(tmp_path / "figs")
    main(["--volume", "analytic:sphere", "--models", "bilinear", "gt",
          "--lowRes", "16", "--output", out])
    assert os.path.exists(os.path.join(out, "sphere_bilinear_lens.png"))
    assert os.path.exists(os.path.join(out, "sphere_gt_lens.png"))


def test_render_cli_volume_mode(tmp_path):
    from isosurfacesuperresolution_tpu.apps.render_cli import main
    out = tmp_path / "dvr"
    main(["--volume", "analytic:sphere", "--res", "24,24",
          "-m", "volume", "--output", str(out)])
    import imageio
    imgs = list(out.glob("*.png"))
    assert len(imgs) == 1
    img = imageio.imread(imgs[0])
    assert img.shape[-1] == 4            # RGBA
    assert img[..., 3].max() > 30        # volume visible


def test_render_cli_volume_custom_tf(tmp_path):
    from isosurfacesuperresolution_tpu.apps.render_cli import main
    out = tmp_path / "dvr2"
    main(["--volume", "analytic:sphere", "--res", "16,16", "-m", "volume",
          "--tf", "0,0,0,0,0;1,0,0,1,0.5", "--alphaScale", "2.0",
          "--output", str(out)])
    import imageio
    img = imageio.imread(list(out.glob("*.png"))[0])
    # blue-ramp TF: blue channel dominates where opaque
    op = img[..., 3] > 60
    assert op.any()
    assert img[..., 2][op].mean() > img[..., 0][op].mean()


def test_render_cli_save_exr(tmp_path):
    from isosurfacesuperresolution_tpu.apps.render_cli import main
    from isosurfacesuperresolution_tpu.data.exr import read_exr
    out = tmp_path / "exr"
    main(["--volume", "analytic:sphere", "--res", "24,24",
          "--saveExr", "--output", str(out)])
    files = sorted(p.name for p in out.glob("*.exr"))
    assert files == ["sphere.exr", "sphere_depth.exr", "sphere_flow.exr",
                     "sphere_fx.exr"]
    rgba = read_exr(str(out / "sphere.exr"))
    assert rgba["A"].max() == 1.0          # mask present
