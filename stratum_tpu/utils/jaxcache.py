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

import os

DEFAULT_DIR = "/tmp/stratum_jax_cache"


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent). Honors an
    explicit argument, then $JAX_COMPILATION_CACHE_DIR, then DEFAULT_DIR."""
    import jax

    path = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or DEFAULT_DIR
    )
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: per-op compiles here cost ~0.7s, and the big
    # renderer programs are 20s+ — always worth a disk entry
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
