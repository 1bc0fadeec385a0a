#!/bin/bash
# VERDICT item 3: per-op attribution of the Cornell/MXU non-trace tail.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3000 python tools/profile_cornell_ops.py
