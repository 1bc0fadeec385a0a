"""Consolidated post-c48 constant sweep: (K, block, pixel order) on the
bench config — primary wave, sorted secondary, and full e2e ms/spp.

Usage: python tools/sweep_c48_config.py [--ks=256,512] [--blocks=1024,2048]
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
    width, height = 1920, 1080
    ks = [int(x) for x in opts.get_str("ks", "256,512").split(",")]
    blocks = [int(x) for x in opts.get_str("blocks", "2048").split(",")]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.ops.intersect import ray_offset
    from stratum_tpu.ops.bvh import morton3

    g = builtin.atrium()
    scene0, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    pos_np = np.asarray(scene0.geo.positions)
    idx_np = np.asarray(scene0.geo.indices)
    valid = np.asarray(scene0.geo.tri_material) >= 0
    u = jnp.full((n, 2), 0.5, jnp.float32)

    grids = {
        "tiled8x64": camera.pixel_grid_tiled(width, height, 8, 64),
        "rowmajor": camera.pixel_grid(width, height),
    }

    for k in ks:
        fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid, leaf_size=k)
        feat = jax.block_until_ready(spallas.pack_leaf_features(fat))
        scene = scene0._replace(fat_bvh=fat, leaf_feat_packed=feat)
        for blk in blocks:
            for gname, (px, py) in grids.items():
                o0, d0 = camera.generate_rays(view, px, py, u, width, height)
                f = jax.jit(
                    lambda o, d, _k=k, _b=blk: spallas.pallas_closest(
                        fat, feat, o, d, block=_b
                    )
                )
                dt_p, = (timed(f, o0, d0),)
                # sorted secondary
                h = f(o0, d0)
                sp = make_shading_point(scene0.geo, h.tri, h.bary, d0)
                st = srng.rng_init(px, py, 7)
                uu, _ = srng.next_floats(st, 2)
                wl = smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1])
                d1 = smath.to_world(wl, sp.shading_normal)
                o1 = ray_offset(sp.position, sp.geom_normal)
                alive = h.tri >= 0
                d1 = jnp.where(alive[:, None], d1, jnp.ones_like(d1))
                lo = jnp.min(scene0.geo.positions, axis=0)
                hi = jnp.max(scene0.geo.positions, axis=0)
                q = (o1 - lo) / jnp.maximum(hi - lo, 1e-9)
                octant = (
                    (d1[..., 0] > 0).astype(jnp.uint32)
                    | ((d1[..., 1] > 0).astype(jnp.uint32) << 1)
                    | ((d1[..., 2] > 0).astype(jnp.uint32) << 2)
                )
                key = (octant << jnp.uint32(29)) | (
                    morton3(q) >> jnp.uint32(3)
                )
                key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
                order = jnp.argsort(key)
                dt_s = timed(f, o1[order], d1[order])
                print(
                    f"K={k} blk={blk} {gname:9s}: primary {dt_p*1e3:7.1f} ms"
                    f"  sorted-2nd {dt_s*1e3:7.1f} ms",
                    flush=True,
                )
        # e2e at the bench config
        cfg = integrator.RenderConfig(
            width=width, height=height, max_bounces=4, bsdf="disney",
            presample_lights=4096, coherent_tiles=16,
        )
        dt = timed(
            lambda s: integrator.render_path(scene, view, cfg, s), 1, reps=2
        )
        print(f"K={k} e2e bench cfg: {dt*1e3:8.1f} ms/spp", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
