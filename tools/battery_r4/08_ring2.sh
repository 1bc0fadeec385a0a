#!/bin/bash
# ring=2 (sub-pair MXU/VPU interleave) vs ring=1 vs serialized, waves+e2e.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3600 python tools/perf_ring.py --e2e --spp=3
