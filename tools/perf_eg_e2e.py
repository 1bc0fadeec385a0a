"""End-to-end (K, per-wave entry_group) A/B on the bench atrium config.

entry_group now rides RenderConfig (static jit key), one field per wave
kind: sorted secondary closest / unsorted primary peel / occlusion. The
(K, g) wave sweep (tools/perf_group.py) measured coherent waves wanting
coarse groups (primary K=256: g=4 -17%) and incoherent sorted waves
wanting g=1; this tool measures the real composition on the full bench
config (disney + presample + coherent tiles + deferred shadows).

python tools/perf_eg_e2e.py [--ks=512,256] [--spp=3]
    [--cfgs=1:1:1,1:4:4,1:4:8]   (entry_group : primary : shadow)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def main():
    import dataclasses

    import numpy as np

    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    spp = opts.get_int("spp", 3)
    ring = 1 if opts.has("ring") else -1
    ks = [int(k) for k in opts.get_str("ks", "512,256").split(",")]
    cfgs = [
        tuple(int(x) for x in c.split(":"))
        for c in opts.get_str("cfgs", "1:1:1,1:4:4,1:4:8").split(",")
    ]
    width, height = 1920, 1080
    g = builtin.atrium()
    scene0, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    base = integrator.RenderConfig(
        width=width, height=height, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )
    pos_np = np.asarray(scene0.geo.positions)
    idx_np = np.asarray(scene0.geo.indices)
    valid = np.asarray(scene0.geo.tri_material) >= 0

    for k in ks:
        fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid, leaf_size=k)
        scene = flatten.replace_bvh(scene0, fat)
        print(f"K={k}: leaves={fat.num_leaves}", flush=True)
        for egc, egp, egs in cfgs:
            cfg = dataclasses.replace(
                base, entry_group=egc, entry_group_primary=egp,
                entry_group_shadow=egs, ring=ring,
            )
            img, n_rays = integrator.render_path_with_counts(
                scene, view, cfg, 0
            )
            float(np.asarray(n_rays))
            t0 = time.time()
            tot = 0
            for s in range(1, spp + 1):
                img, n_rays = integrator.render_path_with_counts(
                    scene, view, cfg, s
                )
                tot += int(np.asarray(n_rays))
            dt = (time.time() - t0) / spp
            print(
                f"  eg=({egc},{egp},{egs}): {dt*1e3:8.1f} ms/spp "
                f"{tot/spp/dt/1e6:7.2f} Mrays/s "
                f"(img mean {float(np.asarray(img).mean()):.4f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
