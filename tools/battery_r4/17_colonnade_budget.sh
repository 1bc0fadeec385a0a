#!/bin/bash
# The textured-scene "tax" turned out not to be textures (battery 15:
# taps ~18 ms/2M, no-texture ablation confounded by albedo-driven RR).
# Attribute the real colonnade-vs-atrium gap: trace vs NEE vs overhead.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3600 python tools/profile_budget.py --scene=colonnade
