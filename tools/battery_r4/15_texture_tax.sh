#!/bin/bash
# VERDICT item 4: attribute the textured-scene tax on the colonnade.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3600 python tools/profile_texture_tax.py --spp=3
