"""Extract one epoch's generator params from a run's orbax checkpoints
into a standalone eval dir (config.json + params.npz) that every harness
accepts via LoadedModel.from_run_dir.

Mirrors the reference's per-epoch `model_epoch_N.pth` access pattern
(`mainVideoUnshaded.py:345-375`): our run dirs keep epoch-numbered orbax
checkpoints but params.npz always tracks the LATEST state; this tool
materializes any saved epoch for A/B evaluation (e.g. comparing an early
checkpoint against the final one when a loss change shifts the optimum).

Usage: python scripts/extract_params.py <run_dir> <epoch|latest> <out_dir>
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) != 4:
    sys.exit(__doc__)
run_dir, epoch_s, out_dir = sys.argv[1:4]
epoch = None if epoch_s == "latest" else int(epoch_s)

import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.infer.loadedmodel import config_from_json
from isosurfacesuperresolution_tpu.models.generators import (
    create_network, network_input_channels)
from isosurfacesuperresolution_tpu.train.checkpoint import (
    CheckpointManager, save_params_npz)

cfg = config_from_json(os.path.join(run_dir, "config.json"))
model = create_network(cfg.model)
cin = network_input_channels(cfg.model)
template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, cin)))

mgr = CheckpointManager(run_dir)
params, got = mgr.restore_params(template, epoch)
os.makedirs(out_dir, exist_ok=True)
shutil.copy(os.path.join(run_dir, "config.json"),
            os.path.join(out_dir, "config.json"))
save_params_npz(os.path.join(out_dir, "params.npz"),
                jax.device_get(params))
print(f"extracted epoch {got} of {run_dir} -> {out_dir}")
