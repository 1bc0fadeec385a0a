"""Measure alive-lane fraction per bounce for a scene — the input for
choosing a wave_caps compaction schedule (integrator.RenderConfig).

Usage: python tools/probe_alive.py [--scene=atrium|cornell|colonnade]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    name = opts.get_str("scene", "atrium")

    import numpy as np

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    if name == "colonnade":
        from stratum_tpu.scene import sample_assets

        g, _ = sample_assets.load_colonnade("/tmp/stratum_colonnade_bench")
    else:
        g = getattr(builtin, name if name != "cornell" else "cornell_box")()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height

    # n_rays with use_nee=False counts exactly sum(alive at bounce start):
    # the delta between max_bounces=b and b-1 is the alive count at bounce b
    prev = 0
    fracs = []
    for mb in range(0, 6):
        cfg = integrator.RenderConfig(
            width=width, height=height, max_bounces=mb, bsdf="disney",
            use_nee=False, use_mis=False,
        )
        _, cnt = integrator.render_path_with_counts(scene, view, cfg, 1)
        cnt = int(np.asarray(cnt))
        frac = (cnt - prev) / n
        fracs.append(frac)
        print(f"bounce {mb}: alive {cnt - prev:9d}  ({frac*100:5.1f}% of wave)")
        prev = cnt
    print("suggested wave_caps (1.5x alive, 256-rounded):",
          tuple(round(min(1.0, f * 1.5), 3) for f in fracs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
