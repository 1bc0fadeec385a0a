#!/bin/bash
# Composition sweep: ring (hides the per-visit pretest drain) x
# entry_group (prep at L/g width) x small K (cheaper slab streams).
# Hypothesis: entry groups measured negative in r3/r4-s1 BECAUSE each
# expanded gated visit paid a serialized pretest drain (~0.3us); ring
# carries the gate word a visit ahead, so gated visits should now cost
# ~nothing and small-K kernels get cheap prep.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3000 python tools/perf_group.py --ring --ks=128,256,512 --groups=1,4,16
echo "=== e2e best combos ==="
timeout 3000 python tools/perf_group.py --ring --ks=256 --groups=4,8 --e2e
