"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests emulate devices via
XLA_FLAGS=--xla_force_host_platform_device_count (SURVEY.md section 4); real-TPU
benchmarking happens in bench.py, not in the unit-test suite.
"""
import os
import sys

import pytest

# hard override: the image's sitecustomize registers the tunneled-TPU "axon"
# PJRT plugin in every process and re-sets jax_platforms after import, so the
# env var alone is not enough - update the jax config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The gate's wall clock is dominated by XLA:CPU *compile* time (hundreds of
# small programs on a 1-core box).  Skipping the expensive backend
# optimization passes keeps HLO semantics identical while cutting the gate
# ~27%; set ISOSR_TEST_FULL_OPT=1 to run the suite at full optimization
# (bench.py and all on-TPU paths never see this flag).
if not os.environ.get("ISOSR_TEST_FULL_OPT"):
    os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """Apply the `slow` marker from the measured list (tests/_slow_tests.py)
    so `pytest -m "not slow"` is a <3-minute gate; explicit
    @pytest.mark.slow decorations are honored as well."""
    import pytest

    from tests._slow_tests import SLOW_TESTS
    for item in items:
        base = item.nodeid.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_memory_between_modules():
    """Clear jax's compiled-executable caches after each test module.

    A full slow-suite run accumulates every module's XLA:CPU executables
    in one process and eventually segfaults inside a late big compile
    (observed at test_train's adversarial step, ~100 slow tests in);
    per-module cache clearing bounds the growth.  Cross-module cache
    reuse is negligible (modules jit their own functions)."""
    yield
    jax.clear_caches()
