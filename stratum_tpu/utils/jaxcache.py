"""Persistent XLA compilation cache setup.

The reference persists its Vulkan pipeline cache to disk across runs
(src/Core/Device.cpp:83-99, 164-172); the TPU analog is JAX's persistent
compilation cache. In this environment the ``JAX_COMPILATION_CACHE_DIR``
env var is NOT honored by the installed jax build (verified: config stays
None and no entries get written) — only explicit ``jax.config.update``
calls work, so every entry point must call :func:`enable` after importing
jax and before the first compilation.
"""

from __future__ import annotations

import hashlib
import os

DEFAULT_DIR = "/tmp/stratum_jax_cache"


def _host_key() -> str:
    """Short hash of the host CPU flags. XLA:CPU AOT cache entries are
    HOST-SPECIFIC (compiled with -march=native-equivalent feature sets);
    after a VM migration, stale entries log 'Machine type used for XLA:CPU
    compilation doesn't match' and can return WRONG results or abort inside
    compilation_cache.get_executable_and_time (observed both). Same trick
    utils/native.py uses for .so files."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nohost"


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent). Honors an
    explicit argument, then $JAX_COMPILATION_CACHE_DIR, then DEFAULT_DIR.
    The directory is suffixed with a host-CPU key so a VM migration starts
    a fresh cache instead of loading incompatible XLA:CPU AOT entries
    (TPU entries are host-independent but cheap to recompile next to the
    correctness risk)."""
    import jax

    path = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or DEFAULT_DIR
    )
    path = f"{path.rstrip('/')}-{_host_key()}"
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: per-op compiles here cost ~0.7s, and the big
    # renderer programs are 20s+ — always worth a disk entry
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
