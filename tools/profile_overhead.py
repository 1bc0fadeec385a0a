"""Isolate the integrator's non-trace overhead with the null tracer:
time trace_path ablations (sort, NEE, bsdf, defer) at 1080p on the atrium
geometry. (end-to-end - null) = pure traversal; the null numbers themselves
are the shading/NEE/bookkeeping budget to attack.

Usage: python tools/profile_overhead.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def timed(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    width, height = 1920, 1080

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    base = dict(width=width, height=height, max_bounces=4, bsdf="disney",
                tracer="null")
    variants = [
        ("null full (sort+nee+defer)", dict(sort_rays=True)),
        ("null no-sort", dict(sort_rays=False)),
        ("null no-sort no-defer", dict(sort_rays=False, defer_shadows=False)),
        ("null no-sort no-nee", dict(sort_rays=False, use_nee=False)),
        ("null no-sort lambert", dict(sort_rays=False, bsdf="lambert")),
        ("null no-sort presample", dict(sort_rays=False,
                                        presample_lights=4096)),
    ]
    for name, kw in variants:
        cfg = integrator.RenderConfig(**{**base, **kw})
        dt = timed(
            lambda s, cfg=cfg: integrator.render_path(scene, view, cfg, s), 1,
            reps=2,
        )
        print(f"{name:34s}: {dt*1e3:8.1f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
