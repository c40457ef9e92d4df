"""One-shot validation of the bake_occlusion_sh contact-sampling fix.

Compares baked SH-L1 AO against the hemisphere-ray oracle
(`render/raycast.compute_ao`) on the torus at data-generation-relevant
radii, and reports the AO-signal strength (rmse of the AO channel vs the
constant 1.0 that interpolation baselines produce).  Run on CPU or TPU:

    JAX_PLATFORMS=cpu python scripts/validate_ao_fix.py
"""

import numpy as np
from scipy import ndimage

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.ao_sweep import attach_baked_ao
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import render_gbuffer
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.volume import analytic


def main() -> None:
    grid = analytic.torus_volume(64)
    cam = CameraParams.create((0, 1.2, -0.25))
    for radius in (0.1, 0.2, 0.5):
        cfg_ray = RenderConfig(width=40, height=40, isovalue=0.5,
                               step_voxels=0.5, ao_samples=32,
                               ao_radius=radius, ao_ray_steps=256,
                               ao_mode="ray", renderer="march")
        ref = np.asarray(render_gbuffer(grid, cam, cam, cfg_ray))
        gb = attach_baked_ao(grid, 0.5, radius, num_dirs=48)
        got = np.asarray(render_gbuffer_sweep(
            gb, cam, cam, cfg_ray.replace(ao_mode="volume",
                                          renderer="sweep")))
        both = ndimage.binary_erosion(
            (ref[..., 3] > 0.5) & (got[..., 3] > 0.5), iterations=2)
        a, b = ref[..., 10][both], got[..., 10][both]
        occ_ref, occ_bake = 1 - a, 1 - b
        corr = np.corrcoef(occ_ref, occ_bake)[0, 1]
        print(f"radius {radius:4.2f}: |err| mean {np.abs(a - b).mean():.4f} "
              f"p95 {np.percentile(np.abs(a - b), 95):.4f}  "
              f"occ corr {corr:.3f}  "
              f"rmse_vs_1 ray {np.sqrt((occ_ref ** 2).mean()):.4f} "
              f"bake {np.sqrt((occ_bake ** 2).mean()):.4f}  "
              f"min_ao ray {a.min():.3f} bake {b.min():.3f}")


if __name__ == "__main__":
    main()
