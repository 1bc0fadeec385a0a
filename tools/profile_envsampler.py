"""A/B the environment sampler (2D CDF tables vs hierarchical mip descent,
render/lights.ENV_SAMPLER) on a textured env-lit scene end-to-end: the mip
variant is the reference's sample_texel (bdpt_util.hlsli:85-180) and the
candidate VERDICT fix for the env-NEE shadow-candidate blowup.

Usage: python tools/profile_envsampler.py [--spp=3]
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
    import numpy as np

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.render import lights as slights
    from stratum_tpu.scene import flatten, sample_assets
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    spp = opts.get_int("spp", 3)
    g, _info = sample_assets.load_colonnade("/tmp/stratum_colonnade_bench")
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 1920, 1080)
    cfg = integrator.RenderConfig(
        width=1920, height=1080, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )
    import jax

    for sampler in ("dist2d", "mip"):
        slights.ENV_SAMPLER = sampler
        # ENV_SAMPLER is read at TRACE time: a cached jit would ignore the
        # switch, so build a fresh jit per sampler
        render = jax.jit(
            lambda sc, v, seed: integrator.render_path_with_counts.__wrapped__(
                sc, v, cfg, seed
            )
        )
        img, n_rays = render(scene, view, 0)
        float(np.asarray(n_rays))
        t0 = time.time()
        total = 0
        for s in range(1, spp + 1):
            img, n_rays = render(scene, view, s)
            total += int(np.asarray(n_rays))
        dt = time.time() - t0
        mean = float(np.asarray(img).mean())
        print(
            f"env={sampler:7s}: {total / dt / 1e6:7.3f} Mrays/s "
            f"{dt / spp * 1e3:7.1f} ms/spp  (img mean {mean:.4f})",
            flush=True,
        )
    slights.ENV_SAMPLER = "dist2d"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
