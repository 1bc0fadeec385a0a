"""Quality benchmark: RMSE vs sample budget for the three sampling modes
(independent pcg4d, Kronecker lattice, adaptive allocation) against a
converged reference — the BASELINE.json quality metric is image RMSE at
equal spp, and this is the artifact substantiating the repo's
beyond-reference claims.

Usage: python tools/quality_bench.py [--cpu] [--size=48] [--budgets=4,16,64]
       [--scene=cornell|colonnade] [--refspp=512]

--scene=colonnade runs the same table on the textured 110K-tri scene
(OBJ+MTL+PNG+HDR ingestion path, env importance sampling) so the sampler
claims are not Cornell-only; meant for TPU (a BVH-scale scene at 512
reference spp is slow on the CPU tier).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")
    from stratum_tpu.utils import jaxcache

    jaxcache.enable()

    import numpy as np

    from stratum_tpu.core import rng as srng
    from stratum_tpu.render import adaptive, camera, integrator
    from stratum_tpu.scene import builtin, flatten

    size = opts.get_int("size", 48)
    budgets = [
        int(x) for x in opts.get_str("budgets", "4,16,64").split(",")
    ]
    ref_spp = opts.get_int("refspp", 512)
    scene_name = opts.get_str("scene", "cornell")
    if scene_name == "colonnade":
        from stratum_tpu.scene import sample_assets

        g, _info = sample_assets.load_colonnade("/tmp/stratum_colonnade_bench")
        mb = 4
    else:
        g = builtin.cornell_box()
        mb = 3
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, size, size)
    cfg = integrator.RenderConfig(
        width=size, height=size, max_bounces=mb, bsdf="disney"
    )

    def render_uniform(spp, seed0):
        f = jax.jit(
            lambda sc, v, s0: integrator.render_path_batched.__wrapped__(
                sc, v, cfg, spp, s0
            )
        )
        return np.asarray(f(scene, view, seed0)[0])

    ref = render_uniform(ref_spp, 9000)

    def rmse(a):
        return float(np.sqrt(((a - ref) ** 2).mean()))

    print(f"{scene_name} {size}x{size} disney mb={mb}; ref={ref_spp}spp")
    print(f"{'budget':>6} {'rand':>8} {'kron':>8} {'adaptive':>9} "
          f"{'kron+ada':>9} {'best x':>7}")
    for b in budgets:
        srng.QMC = "rand"
        r_rand = rmse(render_uniform(b, 0))
        srng.QMC = "kron"
        r_kron = rmse(render_uniform(b, 0))
        srng.QMC = "rand"
        pilot = max(2, b // 4)
        ada, _ = adaptive.render_adaptive(
            scene, view, cfg, b, pilot=pilot, frac=0.25, seed0=0
        )
        r_ada = rmse(np.asarray(ada))
        srng.QMC = "kron"
        both, _ = adaptive.render_adaptive(
            scene, view, cfg, b, pilot=pilot, frac=0.25, seed0=0
        )
        srng.QMC = "rand"
        r_both = rmse(np.asarray(both))
        best = min(r_kron, r_ada, r_both)
        print(
            f"{b:>6} {r_rand:8.4f} {r_kron:8.4f} {r_ada:9.4f} "
            f"{r_both:9.4f} {r_rand / best:6.2f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
