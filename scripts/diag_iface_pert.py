"""Per-sequence, per-frame interface-normals diagnostic.

Finding to explain: net normal PSNR declines t0->t9 (25.9->20.3) on the
interface volume even WITHOUT temporal recurrence, while bilinear stays
flat.  Camera distance is ~constant within a clip, so print per-sequence
trajectories plus correlates (cam distance, mask fill, GT normal
roughness) to find what drives the decline.
Result (2026-08-19, run00005, 4 seqs x 10 frames at the eval harness's
0.6-1.0 camera distances): fill ~1.0 (the slab fills the frame), the
error is INTERIOR (not silhouette), and PSNR tracks GT screen-space
normal roughness, which grows as the camera path grazes the slab.
Training zoos rendered at 0.95-1.3 (commit 10f746c) while the reference
generates data at 0.6-1.0 (DataGeneratorVideo.py:120-123) - the
eval/train camera-distance domain gap behind the interface weak spot;
see --cameraDistance and queue v14.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.bench.stats import Statistics
from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.data.generation import (
    SequenceConfig, generate_sequences, random_camera_path)
from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
from isosurfacesuperresolution_tpu.volume import analytic
from isosurfacesuperresolution_tpu.train.trainer import clamp_output

grid = analytic.interface_volume(256)
seq_cfg = SequenceConfig(num_frames=10, high_res=256, ao_samples=0,
                         iso_range=(0.5, 0.5))
base = RenderConfig(step_voxels=0.5)
sequences = generate_sequences([(grid, (0.5, 0.5))], 4, seq_cfg,
                               base_render_cfg=base, seed=0)

# reproduce the camera paths for correlates (same seed stream ordering)
loaded = LoadedModel.from_run_dir("runs/run00005")

for si, seq in enumerate(sequences):
    T = seq["low"].shape[0]
    rows = []
    for t in range(T):
        low = jnp.asarray(seq["low"][t:t + 1])
        gt = jnp.asarray(seq["high"][t:t + 1])
        pred = clamp_output(loaded.inference(low, None,
                                             jnp.asarray(seq["flow"][t:t+1])))
        s = Statistics(); s.add_timestep_sample(pred, gt, low)
        psnr = s.means().get("psnr_normal", float("nan")) if s.n else float("nan")
        gtm = np.asarray(gt[0])
        mask = gtm[..., 0] > 0
        fill = float(mask.mean())
        # GT normal roughness: mean |grad| of nx inside the mask
        nx = gtm[..., 1]
        gx = np.abs(np.diff(nx, axis=0))[:, :-1]
        gy = np.abs(np.diff(nx, axis=1))[:-1, :]
        inm = mask[:-1, :-1]
        rough = float(((gx + gy) * inm).sum() / max(inm.sum(), 1))
        # error map split: interior vs silhouette band (2px dilation boundary)
        pn = np.asarray(pred[0])[..., 1:4]
        gn = gtm[..., 1:4]
        err = ((pn - gn) ** 2).sum(-1)
        from scipy import ndimage
        er = ndimage.binary_erosion(mask, iterations=3)
        band = mask & ~er
        e_int = float(err[er].mean()) if er.any() else float("nan")
        e_band = float(err[band].mean()) if band.any() else float("nan")
        rows.append((t, psnr, fill, rough, e_int, e_band))
    print(f"seq{si}:")
    for t, psnr, fill, rough, ei, eb in rows:
        print(f"  t{t}: psnr={psnr:5.2f} fill={fill:.3f} rough={rough:.4f} "
              f"err_interior={ei:.5f} err_band={eb:.5f}")
