"""Device-mesh utilities: data-parallel training + batched multi-camera
rendering over `jax.sharding`.

The reference is strictly single-GPU (SURVEY.md section 2.5 - no
torch.distributed anywhere); its inter-process transports (pipe protocol,
DLL device-pointer handoff) are what multi-chip sharding replaces here.
Design (BASELINE.json config 5): the *volume is replicated* on every chip
(it is read-only during training/rendering) and the batch/camera axis is
sharded over the mesh's ``data`` axis; gradients are averaged with a psum
that XLA lays onto ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a pytree of (B, ...) arrays with B sharded over the mesh."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, volume) on every mesh device."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def make_sharded_train_step(train_step: Callable, mesh: Mesh,
                            axis_name: str = "data") -> Callable:
    """Wrap a jit'd train step for data-parallel execution.

    The step is already pure jax; under shardings, XLA inserts the gradient
    all-reduce automatically from the replicated-params/sharded-batch layout
    (the "let the compiler insert collectives" recipe).  The wrapper only
    pins the shardings.
    """
    state_sharding = NamedSharding(mesh, P())

    def wrapped(state, low, flow, high):
        low, flow, high = shard_batch(mesh, (low, flow, high), axis_name)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, state_sharding)
            if isinstance(x, jax.Array) else x, state)
        return train_step(state, low, flow, high)
    return wrapped


def render_cameras_sharded(grid, eyes: jnp.ndarray, look_ats: jnp.ndarray,
                           ups: jnp.ndarray, render_cfg, mesh: Mesh,
                           fov_y_degrees: float = 45.0,
                           axis_name: str = "data") -> jnp.ndarray:
    """Render a batch of cameras sharded over the mesh -> (N, H, W, 12).

    The multi-camera analogue of the reference's one-frame-at-a-time
    benchmark loops (`mainPSNR2_AllAngles.py:145-151`), laid out so each
    chip raycasts its own camera subset with the volume replicated.
    """
    from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
    from isosurfacesuperresolution_tpu.render.camera import CameraParams

    @partial(jax.jit, static_argnames=("cfg",))
    def render_one(grid, eye, look_at, up, cfg):
        cam = CameraParams(eye, look_at, up, fov_y_degrees)
        return render_frame_gbuffer(grid, cam, cam, cfg)

    def render_batch(grid, eyes, look_ats, ups):
        return jax.vmap(lambda e, l, u: render_one(grid, e, l, u,
                                                   render_cfg))(
            eyes, look_ats, ups)

    grid_r = replicate(mesh, grid)
    eyes, look_ats, ups = shard_batch(mesh, (eyes, look_ats, ups), axis_name)
    return jax.jit(render_batch)(grid_r, eyes, look_ats, ups)
