"""Leaf-size (K) sweep for the Pallas tracer on the atrium.

Measures primary closest, shadow occluded (any-hit kernel), and full
4-bounce path trace at K in {256, 512, 1024}.

python tools/perf_ksweep.py [--ks=256,512,1024] [--block=512]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax
    import jax.numpy as jnp

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    block = opts.get_int("block", 512)
    ks = [int(k) for k in opts.get_str("ks", "256,512,1024").split(",")]
    g = builtin.atrium()
    scene0, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    px, py = camera.pixel_grid(width, height)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = camera.generate_rays(view, px, py, u, width, height)
    import numpy as np

    pos_np = np.asarray(scene0.geo.positions)
    idx_np = np.asarray(scene0.geo.indices)
    valid = np.asarray(scene0.geo.tri_material) >= 0

    for k in ks:
        fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid, leaf_size=k)
        feat = spallas.pack_leaf_features(fat)
        scene = flatten.replace_bvh(scene0, fat, feat)
        print(f"K={k}: leaves={fat.num_leaves}", flush=True)

        @jax.jit
        def closest(o, d):
            h = spallas.pallas_closest(fat, feat, o, d, block=block)
            return h.t.sum()

        @jax.jit
        def shadow(o, d):
            # shadow toward the sky light from primary hits
            h = spallas.pallas_closest(fat, feat, o, d, block=block)
            hp = o + d * jnp.minimum(h.t, 100.0)[:, None]
            target = jnp.asarray([0.0, 8.8, 0.0])
            to_l = target - hp
            dist = jnp.linalg.norm(to_l, axis=-1)
            wi = to_l / jnp.maximum(dist, 1e-9)[:, None]
            occ = spallas.pallas_occluded(
                fat, feat, hp - d * 1e-3, wi, dist, block=block
            )
            return occ.sum().astype(jnp.float32)

        reps = 3
        for name, fn in (("closest", closest), ("closest+shadow", shadow)):
            fetch(fn(origin, direction))
            t0 = time.time()
            for _ in range(reps):
                s = fn(origin, direction)
            fetch(s)
            dt = (time.time() - t0) / reps
            rays = n if name == "closest" else 2 * n
            print(
                f"  {name:15s}: {dt*1e3:8.1f} ms  {rays/dt/1e6:7.2f} Mrays/s",
                flush=True,
            )

        cfg = integrator.RenderConfig(
            width=width, height=height, max_bounces=4, sort_rays=True,
            tracer="pallas",
        )
        img, n_rays = integrator.render_path_with_counts(scene, view, cfg, 0)
        fetch(n_rays)
        t0 = time.time()
        tot = 0
        for s in range(1, 3):
            img, n_rays = integrator.render_path_with_counts(
                scene, view, cfg, s
            )
            tot += int(fetch(n_rays))
        dt = (time.time() - t0) / 2
        print(
            f"  e2e b4 sorted  : {dt*1e3:8.1f} ms  {tot/2/dt/1e6:7.2f} "
            "Mrays/s", flush=True,
        )


if __name__ == "__main__":
    main()
