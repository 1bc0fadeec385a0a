#!/bin/bash
# VERDICT item 6: record the 1080p chunked BDPT number for BASELINE.md.
# 960x540 unchunked OOMed (518K px > the ~500K line) — run the variant
# comparison at 640x360 and the HD number chunked.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3000 python tools/profile_bdpt.py --width=640 --height=360 --hd \
  || timeout 3000 python tools/profile_bdpt.py --width=640 --height=360 --hd --chunks=16
