"""Decompose the bench config's ms/spp into closest waves / shadow wave /
overhead by toggling cfg knobs (null tracer isolates non-trace overhead;
use_nee=False drops NEE+shadows; defer on/off and coherent on/off isolate
the deferred wave's share).

Usage: python tools/profile_budget.py [--width=] [--height=] [--scene=atrium|cornell]
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
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    scene_name = opts.get_str("scene", "atrium")
    if scene_name == "cornell":
        g = builtin.cornell_box()
    elif scene_name == "colonnade":
        from stratum_tpu.scene import sample_assets

        g, _info = sample_assets.load_colonnade("/tmp/stratum_colonnade_bench")
    else:
        g = getattr(builtin, scene_name)()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    base = dict(
        width=width, height=height, max_bounces=4, bsdf="disney",
        presample_lights=4096,
    )
    variants = [
        ("bench (coherent=16)", dict(coherent_tiles=16)),
        ("coherent=0", dict()),
        ("coherent=16 nosort", dict(coherent_tiles=16, sort_rays=False)),
        ("no NEE", dict(use_nee=False, use_mis=False)),
        ("NEE inline (no defer)", dict(defer_shadows=False)),
        ("NEE inline coherent", dict(defer_shadows=False, coherent_tiles=16)),
        # null variants keep coherent_tiles=16 so they subtract cleanly
        # from the bench row: without it the null row pays the INCOHERENT
        # tile gather the bench never runs (measured +207 ms/spp, r4 s4 —
        # the old rows attributed that to "NEE overhead")
        ("null tracer (overhead)", dict(tracer="null", coherent_tiles=16)),
        ("null tracer no NEE", dict(tracer="null", use_nee=False,
                                    use_mis=False)),
    ]
    for name, kw in variants:
        cfg = integrator.RenderConfig(**{**base, **kw})
        dt = timed(
            lambda s, _c=cfg: integrator.render_path(scene, view, _c, s), 1
        )
        print(f"{name:28s}: {dt*1e3:8.1f} ms/spp")

    if scene.textures.resolution > 1:
        # texture share: same bench config on the scene with the sentinel
        # (resolution-1) stack — the integrator's texture block compiles out
        from stratum_tpu.render.texture import build_texture_stack

        scene_nt = scene._replace(textures=build_texture_stack([]))
        cfg = integrator.RenderConfig(**{**base, "coherent_tiles": 16})
        dt = timed(
            lambda s: integrator.render_path(scene_nt, view, cfg, s), 1
        )
        print(f"{'bench, textures stripped':28s}: {dt*1e3:8.1f} ms/spp")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
