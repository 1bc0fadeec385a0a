"""Sweep fill-aware SAH leaf packing (ops/packet.pack_leaf_segments) on
the atrium bench waves: the Pallas tracer charges a visited leaf the full
K-slab regardless of fill, so fuller leaves = fewer visits — if the box
growth (false-positive visits) doesn't eat the gain.

Measured stats at K=1024 on the atrium (CPU, structural):
  base      leaves=215 fill=0.603 total_area=1.11e4
  greedy    leaves=135 fill=0.961 total_area=1.57e4 (+41% area)
  alpha=3   leaves=154 fill=0.843 total_area=1.21e4 (+9% area)

Usage: python tools/sweep_leafpack.py [--alphas=0,-1,3,2] [--spp=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def main():
    import numpy as np

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import packet
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    spp = opts.get_int("spp", 3)
    alphas = [
        float(x) for x in opts.get_str("alphas", "0,-1,3,2").split(",")
    ]
    g = builtin.atrium()
    node, cam = flatten.find_camera(g.root)
    cfg = integrator.RenderConfig(
        width=1920, height=1080, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )
    for a in alphas:
        packet.SAH_PACK_ALPHA = a
        scene, _ = flatten.flatten(g.root)
        view = camera.make_view(node.to_world(), cam.fovy, 1920, 1080)
        tri = np.asarray(scene.fat_bvh.leaf_tri)
        fill = (tri >= 0).mean()
        img, n_rays = integrator.render_path_with_counts(scene, view, cfg, 0)
        float(np.asarray(n_rays))
        t0 = time.time()
        total = 0
        for s in range(1, spp + 1):
            img, n_rays = integrator.render_path_with_counts(
                scene, view, cfg, s
            )
            total += int(np.asarray(n_rays))
        dt = time.time() - t0
        print(
            f"alpha={a:5.1f} leaves={scene.fat_bvh.num_leaves:4d} "
            f"fill={fill:.3f}: {total / dt / 1e6:7.3f} Mrays/s "
            f"{dt / spp * 1e3:7.1f} ms/spp",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
