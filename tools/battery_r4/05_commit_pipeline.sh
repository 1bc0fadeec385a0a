#!/bin/bash
# THE round-4 decision measurement: per-commit marginal cost by variant
# (runtime operands + marginal-iters timing; the first two tables were
# constant-folded garbage — see CLAUDE.md microbench trap).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3000 python tools/perf_commit_pipeline.py --base_iters=512 --iters=2048 --k=1024
echo "=== K=512 ==="
timeout 1500 python tools/perf_commit_pipeline.py --base_iters=512 --iters=2048 --k=512
