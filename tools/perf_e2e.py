"""End-to-end config sweep on the atrium: isolate what the bounce loop costs.

python tools/perf_e2e.py [--width=] [--height=] [--cpu]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    variants = {
        "b0 primary only": dict(max_bounces=0, use_nee=False),
        "b0 +nee(shadow)": dict(max_bounces=0, use_nee=True),
        "b2 no-nee": dict(max_bounces=2, use_nee=False),
        "b2 no-nee sorted": dict(max_bounces=2, use_nee=False, sort_rays=True),
        "b4 nee sorted": dict(max_bounces=4, use_nee=True, sort_rays=True),
        "b4 nee sorted disney": dict(
            max_bounces=4, use_nee=True, sort_rays=True, bsdf="disney"
        ),
    }
    for name, kw in variants.items():
        cfg = integrator.RenderConfig(width=width, height=height, **kw)
        img, n_rays = integrator.render_path_with_counts(scene, view, cfg, 0)
        fetch(n_rays)  # compile
        t0 = time.time()
        reps = 2
        tot = 0
        for s in range(1, reps + 1):
            img, n_rays = integrator.render_path_with_counts(
                scene, view, cfg, s
            )
            tot += int(fetch(n_rays))
        dt = (time.time() - t0) / reps
        print(
            f"{name:26s}: {dt*1e3:8.1f} ms/spp  "
            f"{tot/2/dt/1e6:7.2f} Mrays/s", flush=True,
        )


if __name__ == "__main__":
    main()
