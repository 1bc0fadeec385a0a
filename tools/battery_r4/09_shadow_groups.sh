#!/bin/bash
# Shadow-only entry groups (the r4-s1 sweep only measured them confounded
# with primary groups): the deferred occluded wave is 5x wider than a
# closest wave, so its ~105 ms prep is the biggest prep item. Measured
# with ring on (gated expanded visits ride the carried-word path).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3600 python tools/perf_eg_e2e.py --ring --ks=1024 --cfgs=1:1:1,1:1:4,1:1:8,1:1:16 --spp=3
