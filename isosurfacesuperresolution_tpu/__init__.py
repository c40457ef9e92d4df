"""TPU-native isosurface super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
shamanDevel/IsosurfaceSuperresolution (TVCG 2019): volumetric isosurface
rendering with deep-learning-based 4x super-resolution.

Pipeline: ray-cast an isosurface at low resolution into an unshaded G-buffer
(mask, normal, depth, flow, AO), run a 4x super-resolution CNN with a
frame-recurrent temporal path, then shade in screen space.  Unlike the
reference (C++/CUDA renderers talking to PyTorch over pipes/DLLs), the whole
per-frame pipeline here - raycast -> warp -> network -> shading - compiles to
a single XLA program.

Subpackages
-----------
volume    : bricked volume grids, analytic SDF volumes, RAW/.dat/npy/cvol
            ingestion (+ .vdb via the OpenVDB bindings when installed)
render    : camera, ray-march G-buffer renderer (jnp + Pallas), AO, shading
models    : generator zoo (EnhanceNet, RCAN, TecoGAN, SubpixelNet), video tools
ops       : resize / grid-sample / inpainting / metrics primitives
losses    : loss DSL, perceptual + adversarial losses, discriminators
data      : dataset generation (renderer-in-the-loop) and npy clip loading
train     : recurrent training loop, checkpointing, logging
infer     : fused interactive inference pipeline
parallel  : device-mesh sharding helpers (pjit / shard_map)
"""

__version__ = "0.1.0"

from isosurfacesuperresolution_tpu import config as config  # noqa: F401
