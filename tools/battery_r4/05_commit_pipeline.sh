#!/bin/bash
# THE round-4 decision measurement: is the closest kernel's 0.65-0.72 us
# per-commit cost serialization Mosaic can overlap (epi_x2 / ring beat
# epi_while) or a hard MXU+VPU floor? Drives the deferred-merge kernel
# restructure.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 1800 python tools/perf_commit_pipeline.py --iters=256 --k=1024
echo "=== K=512 ==="
timeout 900 python tools/perf_commit_pipeline.py --iters=256 --k=512
