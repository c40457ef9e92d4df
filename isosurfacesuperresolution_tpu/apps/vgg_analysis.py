"""VGG layer-response analysis: derive perceptual-loss layer weights.

Parity target: `VGGAnalysis.py` - computes the mean response magnitude of
each VGG-19 conv layer over a dataset of (shaded) images; the reciprocals
normalize the perceptual loss so every layer contributes comparably, which
is where the reference's hard-coded defaults come from
(`VGGAnalysis.py:119-135` -> `mainVideoUnshaded.py:75-78`).

Usage:
  python -m isosurfacesuperresolution_tpu.apps.vgg_analysis \
      --volume analytic:blobs --images 16 --layers 12
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--volume", type=str, default="analytic:blobs")
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--isovalue", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.apps.main_psnr_stats import load_volume
    from isosurfacesuperresolution_tpu.config import (
        RenderConfig, ShadingConfig)
    from isosurfacesuperresolution_tpu.losses.vgg import (
        VGG19Features, load_vgg19_params)
    from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
    from isosurfacesuperresolution_tpu.render.camera import (
        random_sphere_camera)
    from isosurfacesuperresolution_tpu.render.raycast import (
        gbuffer_to_high_target)
    from isosurfacesuperresolution_tpu.render.shading import (
        screen_space_shading)

    grid, _ = load_volume(args.volume)
    cfg = RenderConfig(width=args.res, height=args.res,
                       isovalue=args.isovalue, ao_samples=0)
    shading = ShadingConfig(diffuse_color=(1.0,) * 3,
                            material_color=(1.0, 0.3, 0.0))

    vgg = VGG19Features(max_conv=args.layers)
    params, pretrained = load_vgg19_params(args.layers)
    print("pretrained VGG:", pretrained)
    apply = jax.jit(lambda x: vgg.apply(params, x))

    rng = np.random.RandomState(args.seed)
    acc = {f"conv_{i}": 0.0 for i in range(1, args.layers + 1)}
    for _ in range(args.images):
        cam = random_sphere_camera(rng)
        fr = render_frame_gbuffer(grid, cam, cam, cfg)
        rgb = screen_space_shading(
            gbuffer_to_high_target(fr)[None], shading)
        feats = apply(rgb)
        for k, v in feats.items():
            acc[k] += float(jnp.mean(jnp.abs(v)))

    print("\nlayer\tmean|response|\tsuggested weight (1/response)")
    weights = []
    for i in range(1, args.layers + 1):
        k = f"conv_{i}"
        mean = acc[k] / args.images
        w = 1.0 / max(mean, 1e-8)
        weights.append((k, w))
        print(f"{k}\t{mean:.4f}\t{w:.4f}")
    spec = ",".join(f"{k}:{w:.3g}" for k, w in weights)
    print("\n--perceptualLossLayers", spec)


if __name__ == "__main__":
    main()
