"""Slim-carry A/B (VERDICT r4 item 8): interleaved on/off rows on the
atrium bench config and its null-tracer variant (the null rows isolate
the non-trace overhead the carry diet attacks; bench rows show the e2e
effect). Bit-identical images are asserted as a side effect.

python tools/perf_slim.py [--spp=3] [--rounds=2] [--width=1920]
    [--height=1080] [--cpu]
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
    import dataclasses

    import numpy as np

    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    spp = opts.get_int("spp", 3)
    rounds = opts.get_int("rounds", 2)
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    base = integrator.RenderConfig(
        width=width, height=height, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )
    variants = []
    for name, kw in (
        ("null", dict(tracer="null", coherent_tiles=16)),
        ("null no-NEE", dict(tracer="null", use_nee=False,
                             coherent_tiles=16)),
        ("bench", dict()),
    ):
        for slim in (False, True):
            variants.append(
                (
                    f"{name:12s} slim={int(slim)}",
                    dataclasses.replace(base, slim_carry=slim, **kw),
                )
            )

    imgs = {}
    for name, cfg in variants:
        t0 = time.time()
        img, nr = integrator.render_path_with_counts(scene, view, cfg, 0)
        jax.block_until_ready(img)
        imgs[name] = np.asarray(img)
        print(f"  compiled {name}: {time.time()-t0:.0f}s", flush=True)
    # slim must be bit-identical per pair
    for i in range(0, len(variants), 2):
        a, b = variants[i][0], variants[i + 1][0]
        same = (imgs[a] == imgs[b]).all()
        print(f"  bit-identical {a.strip()} vs {b.strip()}: {bool(same)}",
              flush=True)

    best = {name: 1e9 for name, _ in variants}
    for r in range(rounds):
        for name, cfg in variants:
            tot = 0.0
            for s in range(spp):
                t0 = time.time()
                img, _ = integrator.render_path_with_counts(
                    scene, view, cfg, s + 1
                )
                jax.block_until_ready(img)
                tot += time.time() - t0
            dt = tot / spp
            best[name] = min(best[name], dt)
            print(f"  round {r}: {name} {dt*1e3:8.1f} ms/spp", flush=True)
    print("--- best of rounds ---")
    for name, _ in variants:
        print(f"  {name} {best[name]*1e3:8.1f} ms/spp", flush=True)


if __name__ == "__main__":
    main()
