#!/bin/bash
# Group streaming (GS) A/B with the lane-major SMEM AABB fix. Waves first
# (fast signal); e2e only at the wave-winning configs. gs*subs unrolled
# commit bodies make compiles heavy - keep configs lean.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3600 python tools/perf_gs.py --ks=64,128 --gss=4,8
timeout 2400 python tools/perf_gs.py --ks=256 --gss=4
