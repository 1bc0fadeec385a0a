#!/bin/bash
# VERDICT item 5 (the BASELINE.json quality metric): 1k-spp cross-
# estimator convergence artifact. Long; resumable via /tmp/r4_convergence
# checkpoints, so rerunning after a tunnel drop continues. Runs LAST.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 9000 python tools/convergence_bench.py --spp=1024 --ckpt=64
