#!/bin/bash
# Re-baseline the per-bucket budget (closest / NEE / overhead) on the
# current code before this round's levers land.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3000 python tools/profile_budget.py
