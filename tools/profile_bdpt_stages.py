"""BDPT attribution profile (VERDICT r4 item 7): where do the 7.5-8 s/spp
of BDPT-HD go?

Part 1 — stage cuts of trace_bdpt (camwalk -> lightwalk -> s0 -> s1 ->
connect -> full) on the atrium at --width x --height, for paired
connections and lvc=4 (+presample). Cumulative wall times; deltas
attribute camera-subpath trace, light-subpath trace, emitter/env
strategies, NEE (incl. its occlusion waves), s>=2 connections (incl.
LVC reservoir ops), and the t=1 splat.

Part 2 — HD chunk-count sweep (render_bdpt_chunked at 1080p,
--hdchunks list): the per-chunk re-dispatch + prep overhead is the slope
of wall time vs chunk count.

python tools/profile_bdpt_stages.py [--width=640] [--height=360]
    [--hd] [--hdchunks=16,24,32] [--cpu]
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
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax
    import numpy as np

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from functools import partial

    from stratum_tpu.render import bdpt, camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 640)
    height = opts.get_int("height", 360)
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    base = dict(width=width, height=height, max_bounces=3, bsdf="disney",
                sort_rays=True)
    stages = ["camwalk", "lightwalk", "s0", "s1", "connect", None]

    for name, kw in (
        ("paired", {}),
        ("lvc=4+presample",
         dict(lvc_connections=4, presample_lights=4096)),
    ):
        cfg = integrator.RenderConfig(**{**base, **kw})
        print(f"=== {name} {width}x{height} ===", flush=True)
        prev = 0.0
        for stage in stages:
            @partial(jax.jit, static_argnums=(2,))
            def run(scene, view, cfg, seed, stage=stage):
                rad, splat = bdpt.trace_bdpt(
                    scene, view, cfg, seed, stage=stage
                )
                return rad.sum() + splat.sum()

            t0 = time.time()
            jax.block_until_ready(run(scene, view, cfg, 0))
            comp = time.time() - t0
            t0 = time.time()
            for s in range(1, 3):
                r = run(scene, view, cfg, s)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / 2 * 1e3
            sname = stage or "full"
            print(
                f"  cum {sname:9s}: {dt:8.1f} ms  (delta {dt - prev:+8.1f})"
                f"  [compile {comp:.0f}s]",
                flush=True,
            )
            prev = dt

    if opts.has("hd"):
        cfg = integrator.RenderConfig(
            width=1920, height=1080, max_bounces=3, bsdf="disney",
            sort_rays=True, lvc_connections=4, presample_lights=4096,
        )
        for ch in [
            int(c) for c in opts.get_str("hdchunks", "16,24").split(",")
        ]:
            if (1920 * 1080) % ch:
                print(f"  hd chunks={ch}: skipped (not a divisor)",
                      flush=True)
                continue
            img = bdpt.render_bdpt_chunked(scene, view, cfg, 0, ch)
            jax.block_until_ready(img)
            t0 = time.time()
            img = bdpt.render_bdpt_chunked(scene, view, cfg, 1, ch)
            jax.block_until_ready(img)
            dt = time.time() - t0
            print(
                f"  hd 1080p chunks={ch}: {dt*1e3:8.1f} ms/spp "
                f"mean={float(np.asarray(img).mean()):.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
