#!/bin/bash
# Per-wave gs split e2e at K=256: gs=4 on primary + deferred-shadow waves
# (coherent - measured big wins), gs=1 on sorted secondary (measured
# negative). Against gs=4-everywhere (1153 ms/spp) and gs=1 (1205).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/stratum_jax_cache
timeout 3600 python - <<'EOF'
import os, sys, time, dataclasses
sys.path.insert(0, "/root/repo")
from stratum_tpu.utils import jaxcache
jaxcache.enable()
import numpy as np
from stratum_tpu.ops import packet as spacket
from stratum_tpu.ops import pallas_trace as spallas
from stratum_tpu.render import camera, integrator
from stratum_tpu.scene import builtin, flatten

g = builtin.atrium()
scene0, _ = flatten.flatten(g.root)
node, cam = flatten.find_camera(g.root)
view = camera.make_view(node.to_world(), cam.fovy, 1920, 1080)
pos = np.asarray(scene0.geo.positions); idx = np.asarray(scene0.geo.indices)
valid = np.asarray(scene0.geo.tri_material) >= 0
fat = spacket.build_fat_bvh_sah(pos, idx, valid, leaf_size=256)
feat = spallas.pack_leaf_features(fat)
scene = flatten.replace_bvh(scene0, fat, feat)
base = integrator.RenderConfig(
    width=1920, height=1080, max_bounces=4, bsdf="disney",
    presample_lights=4096, coherent_tiles=16, tracer="pallas",
)
for name, kw in (
    ("gs=1 all", dict(gs=1)),
    ("gs=4 all", dict(gs=4)),
    ("gs: prim=4 sec=1 shadow=4", dict(gs=1, gs_primary=4, gs_shadow=4)),
    ("gs: prim=4 sec=1 shadow=1", dict(gs=1, gs_primary=4, gs_shadow=1)),
):
    cfg = dataclasses.replace(base, **kw)
    img, n = integrator.render_path_with_counts(scene, view, cfg, 0)
    float(np.asarray(n))
    t0 = time.time(); tot = 0
    for s in range(1, 4):
        img, n = integrator.render_path_with_counts(scene, view, cfg, s)
        tot += int(np.asarray(n))
    dt = (time.time() - t0) / 3
    print(f"  {name:28s}: {dt*1e3:8.1f} ms/spp {tot/3/dt/1e6:6.2f} Mrays/s "
          f"(img mean {float(np.asarray(img).mean()):.4f})", flush=True)
EOF
