"""Sweep shadow-ray Russian roulette (cfg.shadow_rr) on the atrium bench
config: rays killed vs throughput vs image-mean drift.

Usage: python tools/sweep_shadowrr.py [--taus=0,0.02,0.05,0.2] [--spp=3]
"""

from __future__ import annotations

import dataclasses
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
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    spp = opts.get_int("spp", 3)
    taus = [float(x) for x in opts.get_str("taus", "0,0.02,0.05,0.2").split(",")]
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 1920, 1080)
    base_cfg = integrator.RenderConfig(
        width=1920, height=1080, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )
    for tau in taus:
        cfg = dataclasses.replace(base_cfg, shadow_rr=tau)
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
            f"tau={tau:5.3f}: {total / dt / 1e6:7.3f} Mrays/s "
            f"{dt / spp * 1e3:7.1f} ms/spp  rays/spp={total / spp / 1e6:.2f}M "
            f"(img mean {float(np.asarray(img).mean()):.4f})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
