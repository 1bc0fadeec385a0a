"""Measure BDPT on the atrium (STATUS perf step: LVC + presampled tiles at
scale): paired connections vs LVC reservoir connections, with the Pallas
tracer + trace-local sorting.

Usage: python tools/profile_bdpt.py [--width=960] [--height=540]
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
    width = opts.get_int("width", 960)
    height = opts.get_int("height", 540)

    import jax

    from stratum_tpu.render import bdpt, camera, integrator
    from stratum_tpu.scene import builtin, flatten

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    import numpy as np

    def timed(cfg, reps=2):
        img = bdpt.render_bdpt(scene, view, cfg, 0)
        jax.block_until_ready(img)
        t0 = time.time()
        for s in range(1, reps + 1):
            img = bdpt.render_bdpt(scene, view, cfg, s)
        jax.block_until_ready(img)
        dt = (time.time() - t0) / reps
        # fetching the mean both validates the render and defeats any
        # async-dispatch measurement artifact
        return dt, float(np.asarray(img).mean())

    base = dict(width=width, height=height, max_bounces=3, bsdf="disney",
                sort_rays=True)
    for name, kw in (
        ("paired connections", {}),
        ("lvc_connections=4", dict(lvc_connections=4)),
        ("lvc=4 + presample", dict(lvc_connections=4, presample_lights=4096)),
    ):
        cfg = integrator.RenderConfig(**{**base, **kw})
        dt, mean = timed(cfg)
        print(f"bdpt atrium {width}x{height} {name:20s}: {dt*1e3:8.1f} ms/spp"
              f" (img mean {mean:.4f})", flush=True)

    if opts.has("hd"):
        # the VERDICT r2 deliverable: 1080p BDPT+LVC on a 16G chip via
        # chunked subpath storage (render_bdpt_chunked) — record for
        # BASELINE.md
        cfg = integrator.RenderConfig(
            **{**base, **dict(width=1920, height=1080, lvc_connections=4,
                              presample_lights=4096)}
        )
        view_hd = camera.make_view(node.to_world(), cam.fovy, 1920, 1080)
        chunks = opts.get_int("chunks", 0) or None
        img = bdpt.render_bdpt_chunked(scene, view_hd, cfg, 0, chunks=chunks)
        jax.block_until_ready(img)
        t0 = time.time()
        img = bdpt.render_bdpt_chunked(scene, view_hd, cfg, 1, chunks=chunks)
        jax.block_until_ready(img)
        dt = time.time() - t0
        print(f"bdpt atrium 1920x1080 chunked lvc=4+presample: "
              f"{dt*1e3:8.1f} ms/spp (img mean "
              f"{float(np.asarray(img).mean()):.4f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
