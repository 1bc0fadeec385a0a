"""Decompose the NEE non-trace overhead (r4 session 4: 358.6 ms/spp of
the atrium bench's 1165 — the null-tracer delta between bench and
use_nee=False — vs only ~144 ms for the deferred occluded WAVE itself).

All variants run the NULL tracer so trace + candidate prep are zero and
the deltas name integrator-side ops: emission-side MIS gathers
(light_pdf_area by hit tri), granule keying + tile gather
(coherent_tiles), Disney eval/sample, deferred-batch assembly, and the
residual light-sample geometry. Wavefront shapes are static, so dead
lanes (every ray misses under the null tracer) still pay full per-op
cost — representative of the real per-lane budget.

python tools/profile_nee.py [--width=] [--height=] [--reps=3]
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

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    reps = opts.get_int("reps", 3)

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    def timed(fn, *args):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    base = dict(
        width=width, height=height, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16, tracer="null",
    )
    variants = [
        ("null bench (all on)", dict()),
        ("  - emission MIS (use_mis=0)", dict(use_mis=False)),
        ("  - granule keying (coherent=0)", dict(coherent_tiles=0)),
        ("  - disney (lambert)", dict(bsdf="lambert")),
        ("  - batch assembly (defer=0)", dict(defer_shadows=False)),
        ("  - presample (CDF sampling)", dict(presample_lights=0,
                                              coherent_tiles=0)),
        ("  - NEE entirely", dict(use_nee=False, use_mis=False)),
    ]
    res = {}
    for name, kw in variants:
        cfg = integrator.RenderConfig(**{**base, **kw})
        dt = timed(
            lambda s, cfg=cfg: integrator.render_path(scene, view, cfg, s), 1
        )
        res[name] = dt * 1e3
        print(f"{name:34s}: {dt*1e3:8.1f} ms/spp", flush=True)
    b = res.get("null bench (all on)")
    if b:
        print("deltas vs null bench (the op's share):")
        for name, v in res.items():
            if not name.startswith("  "):
                continue
            print(f"{name:34s}: {v - b:+8.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
