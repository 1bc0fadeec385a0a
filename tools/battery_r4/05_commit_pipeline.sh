#!/bin/bash
# THE round-4 decision measurement: is the closest kernel's per-commit
# cost serialization Mosaic can overlap (epi_x2 / ring beat epi_while) or
# a hard MXU+VPU floor? Drives the deferred-merge kernel restructure.
# iters=256 measured launch-overhead-dominated (every variant 0.02-0.05ms
# TOTAL); 8192 iterations make the loop dominate by ~100x.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3000 python tools/perf_commit_pipeline.py --iters=8192 --k=1024
echo "=== K=512 ==="
timeout 1500 python tools/perf_commit_pipeline.py --iters=8192 --k=512
echo "=== K=1024 iters=2048 (overhead cross-check) ==="
timeout 1500 python tools/perf_commit_pipeline.py --iters=2048 --k=1024
