"""Time adaptive rounds vs uniform samples on the atrium bench config:
is the top_k + coordinate gather overhead small next to the trace?

Usage: python tools/profile_adaptive.py [--frac=0.25]
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
    import jax
    import numpy as np

    from stratum_tpu.render import adaptive, camera, integrator
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    frac = opts.get_float("frac", 0.25)
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 1920, 1080)
    cfg = integrator.RenderConfig(
        width=1920, height=1080, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )
    n = cfg.width * cfg.height
    st = adaptive.init_state(n)
    a, sq, c = st.accum, st.accum_sq, st.count

    def uni(seed):
        return adaptive._uniform_round(scene, view, cfg, a, sq, c, seed)

    def ada(seed, L):
        return adaptive._adaptive_round(scene, view, cfg, a, sq, c, L, seed)

    a, sq, c = jax.block_until_ready(uni(0))
    t0 = time.time()
    out = uni(1)
    jax.block_until_ready(out)
    t_uni = time.time() - t0

    L = max(int(round(n * frac)), 1)
    jax.block_until_ready(ada(2, L))
    t0 = time.time()
    out = ada(3, L)
    jax.block_until_ready(out)
    t_ada = time.time() - t0
    print(
        f"uniform round: {t_uni*1e3:7.1f} ms   adaptive round (L={L}, "
        f"frac={frac}): {t_ada*1e3:7.1f} ms   "
        f"efficiency vs frac*uniform: {frac * t_uni / t_ada:.2f}x",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
