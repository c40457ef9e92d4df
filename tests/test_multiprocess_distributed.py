"""Real 2-process `jax.distributed` exercise of parallel/multihost.py.

`tests/test_multihost.py` covers the single-process degradation paths;
this module actually spawns two coordinator-connected processes (CPU
backend, 2 virtual devices each -> 4 global) and runs the multi-host
path end-to-end: `initialize_distributed`, the hybrid (dcn, ici) mesh
built with `mesh_utils.create_hybrid_device_mesh` (the branch only
reachable with process_count > 1), `process_local_batch`'s
`make_array_from_process_local_data` branch, and a jit'd global
reduction whose cross-process collective must agree in both processes.

Marked slow: distributed init + 2x jax startup is ~30-60 s.
"""

import os
import socket
import subprocess
import sys

import pytest

DRIVER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

addr, pid = sys.argv[1], int(sys.argv[2])
from isosurfacesuperresolution_tpu.parallel import multihost

idx, cnt = multihost.initialize_distributed(addr, 2, pid)
assert (idx, cnt) == (pid, 2), (idx, cnt)
assert len(jax.local_devices()) == 2
assert len(jax.devices()) == 4, jax.devices()

mesh = multihost.make_hybrid_mesh()          # num_dcn = process_count = 2
assert mesh.devices.shape == (2, 2)
# the outer (dcn) axis must follow process boundaries: every row of the
# device grid lives on one process
rows = [{d.process_index for d in row} for row in mesh.devices]
assert all(len(r) == 1 for r in rows), rows

# each process contributes its own half of a global batch of 8
local = (np.arange(4, dtype=np.float32) + 4.0 * idx).reshape(4, 1)
arr = multihost.process_local_batch(mesh, local)
assert arr.shape == (8, 1)

total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, P()))(arr)
# sum over the global batch 0..7 = 28, identical in both processes
assert float(total) == 28.0, float(total)
print(f"process {idx}: distributed hybrid-mesh reduction OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_hybrid_mesh(tmp_path):
    drv = tmp_path / "driver.py"
    drv.write_text(DRIVER)
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, PYTHONPATH="/root/repo")
    env.pop("JAX_PROCESS_ID", None)
    procs = [subprocess.Popen(
        [sys.executable, str(drv), addr, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo") for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "distributed hybrid-mesh reduction OK" in out
