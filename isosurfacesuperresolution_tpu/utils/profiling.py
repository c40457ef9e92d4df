"""Tracing / profiling utilities.

Parity targets (SURVEY.md section 5): the reference brackets kernel launches
with `cudaDeviceSynchronize` + chrono (`GPURendererDirect.cpp:368-387`),
returns render time in-band, times the network with
`torch.cuda.synchronize()` (`mainComparisonImages.py:268-272`), and has
GVDB's PERF_PUSH/POP scopes.  TPU equivalents here:

* :class:`FrameTimer` - rolling per-frame wall-clock with a *forced device
  fetch*: through the tunneled-TPU transport `block_until_ready` does not
  reliably block (measured), so honest timing fetches a scalar.
* :func:`trace` - context manager around `jax.profiler` for XLA traces
  viewable in TensorBoard/Perfetto.
* :func:`timed_chain` - the in-graph chained-execution measurement used by
  bench.py (warmup with the same program, carry-dependent iterations so XLA
  cannot hoist the work).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


class FrameTimer:
    """Rolling FPS/ms statistics (parity: the GUI's 10-frame rolling mean,
    `mainGUI.py:860-873`)."""

    def __init__(self, window: int = 10):
        self.times = deque(maxlen=window)
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result=None) -> float:
        """Stop timing; fetches a scalar from ``result`` to force device
        completion.  Returns the frame time in seconds."""
        if result is not None:
            arr = jax.tree_util.tree_leaves(result)[0]
            _ = float(jnp.asarray(arr).ravel()[0])
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    @property
    def fps(self) -> float:
        return len(self.times) / sum(self.times) if self.times else 0.0

    @property
    def ms(self) -> float:
        return 1000.0 * sum(self.times) / len(self.times) if self.times \
            else 0.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """XLA profiler trace scope; open the directory with TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_chain(step: Callable, carry0, n: int = 10,
                fetch=lambda c: jnp.sum(jax.tree_util.tree_leaves(c)[0])
                ) -> float:
    """Honest per-iteration wall time of ``step`` (carry -> carry).

    Chains ``n`` iterations in one jit'd scan with a *carried dependency*
    (defeats loop-invariant hoisting) and fetches a scalar (defeats the
    non-blocking tunnel transport).  Compiles with the same ``n`` first so
    compilation is excluded.  Returns seconds per iteration.
    """
    @partial(jax.jit, static_argnums=(0,))
    def chain(k, c0):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=k)
        return fetch(c)

    float(chain(n, carry0))           # compile + warm
    t0 = time.time()
    float(chain(n, carry0))
    return (time.time() - t0) / n
