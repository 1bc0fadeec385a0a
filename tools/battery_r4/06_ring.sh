#!/bin/bash
# The r4 kernel restructure A/B: deferred-merge (ring) commits vs the
# serialized path, isolated waves + full e2e on the bench config.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3000 python tools/perf_ring.py --e2e --spp=3
