#!/bin/bash
# VERDICT item 6: record the 1080p chunked BDPT number for BASELINE.md.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3000 python tools/profile_bdpt.py --hd
