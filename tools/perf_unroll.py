"""A/B the bounce-scan unroll factor (cfg.unroll_bounces) on the bench
config. Every scan iteration boundary materializes the wavefront carry
(~20 [N] arrays) + stacked shadow ys; unrolling lets XLA fuse bounce b's
epilogue into b+1's prologue. Bit-identical results (asserted on the
first sample).

python tools/perf_unroll.py [--unrolls=1,2,4] [--spp=3] [--cpu]
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
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    spp = opts.get_int("spp", 3)
    unrolls = [int(x) for x in opts.get_str("unrolls", "1,2,4").split(",")]

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    ref = None
    for ur in unrolls:
        cfg = integrator.RenderConfig(
            width=width, height=height, max_bounces=4, bsdf="disney",
            presample_lights=4096, coherent_tiles=16,
            unroll_bounces=ur,
        )
        img = jax.block_until_ready(
            integrator.render_path(scene, view, cfg, 0)
        )
        a = np.asarray(img)
        if ref is None:
            ref = a
        else:
            same = np.array_equal(ref, a)
            print(f"  unroll={ur} bit-identical to unroll="
                  f"{unrolls[0]}: {same}")
        t0 = time.time()
        for s in range(1, spp + 1):
            img = integrator.render_path(scene, view, cfg, s)
        jax.block_until_ready(img)
        dt = (time.time() - t0) / spp
        print(f"unroll={ur}: {dt*1e3:8.1f} ms/spp "
              f"(img mean {float(a.mean()):.4f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
