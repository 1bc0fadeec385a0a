#!/bin/bash
# e2e for the wave-level winners: ring + g=1 at K in {256, 512} vs the
# K=1024 default (06_ring measured ring=1 K=1024 e2e 1227.1 ms/spp).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3600 python tools/perf_group.py --ring --ks=256,512 --groups=1 --e2e
