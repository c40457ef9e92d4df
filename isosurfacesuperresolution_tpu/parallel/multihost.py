"""Multi-host (multi-slice) scaffolding: distributed init, DCN x ICI
hybrid meshes, hierarchical data parallelism, per-process data feeding.

The reference is strictly single-GPU (SURVEY.md section 2.5); this module
is the TPU-native scale-out path beyond one host: N pod slices connected
over DCN, each slice an ICI domain.  The layout recipe ("How to Scale
Your Model"): the *outer* mesh axis spans slices (gradient all-reduce
crosses DCN once per step - bandwidth-light), the *inner* axis spans the
chips of a slice (everything latency/bandwidth-hungry - here the batch
psum, optionally the volume-slab exchange of `parallel/sharded_sweep` -
rides ICI).  Under `jit`, sharding a batch over the flattened
``("dcn", "ici")`` axes makes XLA lower the gradient reduction as a
reduce-scatter/all-gather on ICI followed by a small cross-DCN
all-reduce - no hand-written collectives.

Single-process (tests, one chip, the CPU virtual mesh) everything here
degrades gracefully: `initialize_distributed` is a no-op,
`make_hybrid_mesh` reshapes the local devices, and
`process_local_batch` returns a normally-sharded array.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> Tuple[int,
                                                                      int]:
    """Initialize `jax.distributed` when running multi-process.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, as set by TPU pod launchers);
    with no coordinator configured this is a no-op (single process).
    Returns ``(process_index, process_count)``.
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    # `jax.distributed.is_initialized()`, NOT `jax.process_count()`, as
    # the already-initialized guard: process_count() initializes the XLA
    # backend, after which jax.distributed.initialize() hard-errors -
    # the guard itself would have made multi-process init impossible
    # (caught by the real 2-process test, test_multiprocess_distributed).
    if coordinator_address and not jax.distributed.is_initialized():
        # `is not None`, not truthiness: process_id=0 (the coordinator
        # host itself) is falsy and must not be overridden by a stale
        # JAX_PROCESS_ID in the environment
        num = (num_processes if num_processes is not None
               else int(os.environ.get("JAX_NUM_PROCESSES", "1")))
        pid = (process_id if process_id is not None
               else int(os.environ.get("JAX_PROCESS_ID", "0")))
        if num > 1:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num, process_id=pid)
    return jax.process_index(), jax.process_count()


def make_hybrid_mesh(num_dcn: Optional[int] = None,
                     devices: Optional[Sequence] = None,
                     axis_names: Tuple[str, str] = (DCN_AXIS, ICI_AXIS)
                     ) -> Mesh:
    """A 2-D ``(dcn, ici)`` mesh: outer axis across slices/hosts, inner
    axis across the chips of a slice.

    Multi-process: delegates to `mesh_utils.create_hybrid_device_mesh`
    so the outer axis really follows slice boundaries.  Single-process
    (tests, virtual CPU mesh): reshapes the flat device list, which has
    the same SPMD semantics (the DCN/ICI split is then only a layout
    convention, exercised end-to-end by the virtual 8-device suite).
    """
    devices = list(devices if devices is not None else jax.devices())
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    have_slice_topology = (jax.process_count() > 1
                           and None not in slice_ids
                           and len(slice_ids) > 1)
    if num_dcn is None:
        # Prefer real slice metadata over process count: on pods with
        # several hosts per slice (e.g. 4 processes over 2 slices) a
        # process-count default would split hosts WITHIN one ICI slice
        # across the outer "dcn" axis (round-3 advisor finding).
        num_dcn = (len(slice_ids) if have_slice_topology
                   else max(1, jax.process_count()))
    if len(devices) % num_dcn != 0:
        raise ValueError(f"{len(devices)} devices do not split into "
                         f"{num_dcn} DCN groups")
    per = len(devices) // num_dcn
    if have_slice_topology and len(slice_ids) == num_dcn:
        from jax.experimental import mesh_utils
        dev_grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per), dcn_mesh_shape=(num_dcn, 1),
            devices=devices)
    elif jax.process_count() > 1:
        # No usable slice topology (multi-process CPU reports one slice;
        # some backends report none): group by process so the outer axis
        # still follows the host/DCN boundary.  If slice metadata DOES
        # exist but contradicts the requested num_dcn, say so loudly -
        # the outer axis will then cut through ICI slices.
        if have_slice_topology:
            import warnings
            warnings.warn(
                f"make_hybrid_mesh: num_dcn={num_dcn} does not match the "
                f"{len(slice_ids)} detected ICI slices; falling back to "
                f"per-process grouping whose outer axis may split hosts "
                f"within a slice", stacklevel=2)
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
        dev_grid = np.asarray(devices).reshape(num_dcn, per)
    else:
        dev_grid = np.asarray(devices).reshape(num_dcn, per)
    return Mesh(dev_grid, axis_names)


def hierarchical_batch_spec(ndim: int,
                            axis_names: Tuple[str, str] = (DCN_AXIS,
                                                           ICI_AXIS)) -> P:
    """PartitionSpec sharding dim 0 over BOTH mesh axes (hierarchical DP).

    XLA lowers the matching gradient all-reduce as ICI-first then a
    cross-DCN combine of one gradient shard per slice.
    """
    return P(tuple(axis_names), *([None] * (ndim - 1)))


def shard_batch_hybrid(mesh: Mesh, batch,
                       axis_names: Tuple[str, str] = (DCN_AXIS, ICI_AXIS)):
    """Place (B, ...) pytree leaves with B sharded over dcn x ici."""
    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, hierarchical_batch_spec(x.ndim,
                                                           axis_names)))
    return jax.tree_util.tree_map(put, batch)


def make_hybrid_train_step(train_step, mesh: Mesh,
                           axis_names: Tuple[str, str] = (DCN_AXIS,
                                                          ICI_AXIS)):
    """Wrap a pure jit'd train step for hierarchical data parallelism.

    Params/opt-state replicate everywhere; the batch shards over
    ``dcn x ici``.  Same "let the compiler insert collectives" recipe as
    `mesh.make_sharded_train_step`, just over the 2-D mesh.
    """
    state_sharding = NamedSharding(mesh, P())

    def wrapped(state, low, flow, high):
        low, flow, high = shard_batch_hybrid(mesh, (low, flow, high),
                                             axis_names)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, state_sharding)
            if isinstance(x, jax.Array) else x, state)
        return train_step(state, low, flow, high)
    return wrapped


def process_local_batch(mesh: Mesh, local_batch,
                        axis_names: Tuple[str, str] = (DCN_AXIS, ICI_AXIS)):
    """Assemble a GLOBAL batch from per-process local data.

    Multi-host data loading: each host loads/generates only its own
    ``B_global / process_count`` clips (the dataset pipeline is pure
    numpy on the host) and this stitches them into one global jax.Array
    sharded over ``dcn x ici`` without any cross-host copy of the data
    itself.  Single-process it is equivalent to `shard_batch_hybrid`.
    """
    def put(x):
        spec = hierarchical_batch_spec(np.ndim(x), axis_names)
        if jax.process_count() == 1:
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))
    return jax.tree_util.tree_map(put, local_batch)
