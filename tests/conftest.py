"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware.

Note: the environment may pin ``JAX_PLATFORMS=axon`` (a tunneled TPU backend)
and re-assert it from sitecustomize, so an env-var setdefault is not enough —
we must update jax.config after import, before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: op compiles in this environment cost ~0.7s
# each, which dominates test time without a cross-run cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# the env vars above are NOT honored by this jax build — the explicit
# config updates in jaxcache.enable() are what actually turn the cache on
from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)


_TESTS_RUN = {"n": 0}


def pytest_runtest_setup(item):
    """jaxlib on this box segfaults inside compile-cache reads once a
    process has accumulated ~200 tests of live executables (reproduced at
    the same POSITION across different tests; every module passes in
    shorter runs). Dropping jax's in-memory executable caches periodically
    keeps the process young; the warm disk cache makes re-loads cheap."""
    _TESTS_RUN["n"] += 1
    if _TESTS_RUN["n"] % 100 == 0:
        jax.clear_caches()
