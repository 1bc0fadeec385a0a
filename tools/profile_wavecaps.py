"""A/B the wave_caps compaction schedule on the atrium e2e bench config.

Usage: python tools/profile_wavecaps.py [--caps=1,1,0.6,0.082,0.031] [--spp=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def run(scene, view, cfg, spp, integrator):
    import numpy as np

    img, n_rays = integrator.render_path_with_counts(scene, view, cfg, 0)
    float(np.asarray(n_rays))
    t0 = time.time()
    total = 0
    for s in range(1, spp + 1):
        img, n_rays = integrator.render_path_with_counts(scene, view, cfg, s)
        total += int(np.asarray(n_rays))
    dt = time.time() - t0
    return total / dt / 1e6, dt / spp * 1e3


def main():
    import dataclasses

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    spp = opts.get_int("spp", 3)
    caps = tuple(
        float(x) for x in opts.get_str(
            "caps", "1,1,0.6,0.082,0.031"
        ).split(",") if x.strip()
    )
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 1920, 1080)
    cfg = integrator.RenderConfig(
        width=1920, height=1080, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )
    mr, ms = run(scene, view, cfg, spp, integrator)
    print(f"baseline      : {mr:7.3f} Mrays/s  {ms:7.1f} ms/spp")
    cfg_c = dataclasses.replace(cfg, wave_caps=caps)
    mr_c, ms_c = run(scene, view, cfg_c, spp, integrator)
    print(f"caps={caps}: {mr_c:7.3f} Mrays/s  {ms_c:7.1f} ms/spp")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
