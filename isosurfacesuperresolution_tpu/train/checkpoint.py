"""Checkpointing + run directories.

Parity target: the reference saves a dict of the whole model + optimizers +
arg namespace per epoch (`mainVideoUnshaded.py:799-811`), restores by
scanning ``model_epoch_N.pth`` (`:345-375`), and numbers run directories
``runNNNNN`` (`:181-195`) with an ``info.txt`` arg dump (`:385-386`).

Here: orbax checkpoints of {params, opt_state, discr state, config} under
``<run_dir>/checkpoints/<epoch>``, the same runNNNNN numbering, and the
config flattened into ``info.txt``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from isosurfacesuperresolution_tpu.config import Config, flatten_config


def next_run_dir(base: str, prefix: str = "run") -> str:
    """Allocate the next ``runNNNNN`` directory (parity:
    `mainVideoUnshaded.py:181-195`).

    Numbers already used by the durable snapshot directory (``artifacts/``
    next to ``base``) are skipped too: the ephemeral ``runs/`` dir is
    wiped when the host VM is recycled, and restarting at run00001 would
    make the artifact watcher overwrite historical committed checkpoints
    of the same name."""
    os.makedirs(base, exist_ok=True)
    pattern = re.compile(rf"^{prefix}(\d{{5}})$")
    next_num = 1
    artifacts = os.path.join(os.path.dirname(os.path.abspath(base)),
                             "artifacts")
    for d in (base, artifacts):
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            m = pattern.match(name)
            if m:
                next_num = max(next_num, int(m.group(1)) + 1)
    run_dir = os.path.join(base, f"{prefix}{next_num:05d}")
    os.makedirs(run_dir)
    return run_dir


def write_info(run_dir: str, cfg: Config) -> None:
    """Dump the flattened config (parity: info.txt,
    `mainVideoUnshaded.py:385-386`)."""
    flat = flatten_config(cfg)
    with open(os.path.join(run_dir, "info.txt"), "w") as f:
        for k, v in sorted(flat.items()):
            f.write(f"{k}: {v}\n")
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump({k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in flat.items()}, f, indent=2)


class CheckpointManager:
    """Epoch-numbered orbax checkpoints of the full train state."""

    def __init__(self, run_dir: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(os.path.join(run_dir, "checkpoints"))
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state, extra: Optional[Dict[str, Any]] = None):
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "discr_params": state.discr_params,
            "discr_opt_state": state.discr_opt_state,
            "step": state.step,
        }
        if extra:
            payload["extra"] = extra
        self.manager.save(epoch, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_params(self, params_template, epoch: Optional[int] = None):
        """Restore ONLY the generator params (the reference's
        ``--pretrained``, `mainVideoUnshaded.py:317-327`): stage-2
        adversarial fine-tunes start from a stage-1 generator while the
        optimizer/discriminator state - whose structure differs between
        the stages - starts fresh."""
        epoch = epoch if epoch is not None else self.manager.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        # partial StandardRestore: only the params subtree is materialized,
        # onto the template's devices (a raw restore would resolve the
        # sharding the checkpoint was SAVED under - a TPU checkpoint then
        # fails to load in a CPU process)
        template = {"params": params_template}
        restored = self.manager.restore(
            epoch, args=ocp.args.PyTreeRestore(
                item=template,
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    template),
                partial_restore=True))
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r, dtype=t.dtype),
            params_template, restored["params"])
        return params, epoch

    def restore_discr_params(self, discr_template,
                             epoch: Optional[int] = None):
        """Restore ONLY the discriminator params (the reference's
        ``--pretrainedDiscr``, `mainVideoUnshaded.py:323-331`)."""
        epoch = epoch if epoch is not None else self.manager.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {"discr_params": discr_template}
        restored = self.manager.restore(
            epoch, args=ocp.args.PyTreeRestore(
                item=template,
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    template),
                partial_restore=True))
        import jax.numpy as jnp
        return jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r, dtype=t.dtype),
            discr_template, restored["discr_params"]), epoch

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into the structure of ``state`` (parity with
        `--restore`/`--restoreEpoch`, `mainVideoUnshaded.py:345-375`)."""
        epoch = epoch if epoch is not None else self.manager.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "discr_params": state.discr_params,
            "discr_opt_state": state.discr_opt_state,
            "step": state.step,
        }
        restored = self.manager.restore(
            epoch, args=ocp.args.StandardRestore(template))
        return state._replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            discr_params=restored["discr_params"],
            discr_opt_state=restored["discr_opt_state"],
            step=restored["step"]), epoch


def save_params_npz(path: str, params) -> None:
    """Flat npz export of generator params (the analogue of the reference's
    `--pretrained` state-dict files, `mainVideoUnshaded.py:317-327`)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(path: str, template):
    """Load an npz produced by :func:`save_params_npz` into ``template``'s
    structure."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for keypath, leaf in leaves:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        arr = data[key]
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(f"shape mismatch for {key}: "
                             f"{arr.shape} vs {np.asarray(leaf).shape}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves)
