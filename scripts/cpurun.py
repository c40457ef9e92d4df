"""Run any package app module pinned to the CPU backend.

The image's sitecustomize registers the tunneled-TPU "axon" PJRT plugin in
every Python process and re-sets jax_platforms after import, so exporting
JAX_PLATFORMS=cpu is NOT enough — and a second TPU client wedges the tunnel
for whatever is already using the chip (the serial work queue).  This wrapper
hard-pins the CPU platform before any package import, then executes the
requested module exactly like `python -m <module> <args...>`.

Usage:
    python scripts/cpurun.py <module> [args...]
    python scripts/cpurun.py isosurfacesuperresolution_tpu.apps.render_cli \
        --volume analytic:torus --res 64,64 --output /tmp/img
"""
import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) < 2:
    sys.exit(__doc__)
target = sys.argv[1]
sys.argv = sys.argv[1:]
if target.endswith(".py") or os.path.sep in target:
    runpy.run_path(target, run_name="__main__")
else:
    runpy.run_module(target, run_name="__main__", alter_sys=True)
