"""Pallas sweep march vs XLA scan at the bench operating point."""
import os, sys, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain
from isosurfacesuperresolution_tpu.volume import analytic

def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    grid = analytic.blobs_volume(256, num_blobs=8)
    base = RenderConfig(width=480, height=270, isovalue=0.5, ao_samples=0,
                        sweep_oversample=1.25, sweep_dtype="bfloat16")

    def cam_at(ang):
        eye = jnp.stack([1.7 * jnp.sin(ang), jnp.float32(0.9),
                         -1.7 * jnp.cos(ang)])
        return CameraParams(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]),
                            45.0)

    for name, cfg in (("XLA scan", base),
                      ("Pallas march",
                       dataclasses.replace(base, renderer="sweep_pallas"))):
        def step(c):
            ang, fr = c
            f = render_gbuffer_sweep(grid, cam_at(ang), cam_at(ang - .03),
                                     cfg)
            return (ang + 0.03, f)
        fr0 = jnp.zeros((270, 480, 12), jnp.float32)
        dt = timed_chain(step, (jnp.float32(0.0), fr0), n=10,
                         fetch=lambda c: jnp.sum(c[1][::32, ::32]))
        print(f"{name:16s} {1000 * dt:8.2f} ms", flush=True)

if __name__ == "__main__":
    main()
