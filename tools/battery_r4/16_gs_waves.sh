#!/bin/bash
# Group streaming (GS) A/B: the roofline memo's named lever. Small K
# slabs with per-visit fixed costs amortized over GS id-consecutive
# leaves per DMA. Waves via perf_group-style harness at (K, gs) combos.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3600 python tools/perf_gs.py --ks=64,128,256 --gss=2,4,8
echo "=== e2e ==="
timeout 3600 python tools/perf_gs.py --ks=128,256 --gss=4,8 --e2e
