"""A/B the c48 slab layout: [L,32,4K] + per-visit in-kernel third-band
concatenate (a [16,4K] VMEM copy per visit) vs c48w's pre-banded
[L,48,4K] (1.5x DMA bytes, zero in-kernel copies). Asserts bit-identical
hits (same products, same commits).

python tools/sweep_c48w.py [--block=2048] [--subs=16]
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
    import jax.numpy as jnp
    import numpy as np

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.intersect import T_MAX

    width, height = 1920, 1080
    block = opts.get_int("block", 2048)
    subs = opts.get_int("subs", 16)
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    fat = scene.fat_bvh
    print(f"L={fat.num_leaves} K={fat.leaf_size} block={block} subs={subs}")

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    feats = {
        m: jax.block_until_ready(spallas.pack_leaf_features(fat, mode=m))
        for m in ("c48", "c48w")
    }

    def timed(f, *a, reps=5):
        out = jax.block_until_ready(f(*a))
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps, out

    def closest(mode):
        @jax.jit
        def f(o, d):
            spallas_mode = mode

            rays, geom, cand, centry, ncand, _ = spallas._prepare(
                fat, o, d, 1e-4, jnp.full((n,), T_MAX, jnp.float32), block
            )
            return spallas._run_blocks(
                rays, geom, cand, centry, ncand,
                spallas.pack_leaf_aabbs(fat, 1), feats[spallas_mode],
                block=block, mode=spallas_mode, subs=subs,
            )

        return f

    def occluded(mode):
        @jax.jit
        def f(o, d, tmax):
            rays, geom, cand, centry, ncand, _ = spallas._prepare(
                fat, o, d, 1e-4, tmax, block
            )
            return spallas._run_blocks(
                rays, geom, cand, centry, ncand,
                spallas.pack_leaf_aabbs(fat, 1), feats[mode],
                block=block, mode=mode, subs=subs, kernel_name="occluded",
            )

        return f

    # primary wave
    outs = {}
    for m in ("c48", "c48w"):
        dt, out = timed(closest(m), o0, d0)
        outs[m] = np.asarray(out[:, :2])
        print(f"primary   {m:5s}: {dt*1e3:7.1f} ms ({n/dt/1e6:5.1f} Mr/s)")
    same = (outs["c48"] == outs["c48w"]).mean()
    print(f"  bit-identical fraction: {same:.6f}")

    # sorted secondary (cosine bounce)
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat, feats[spallas.MT_MODE if spallas.MT_MODE in feats else "c48"],
            o, d, block=block
        )
    )(o0, d0)
    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.ops.intersect import ray_offset
    from stratum_tpu.ops import raysort

    sp = make_shading_point(scene.geo, h.tri, h.bary, d0)
    st = srng.rng_init(px, py, 7)
    uu, _ = srng.next_floats(st, 2)
    wi_local = smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1])
    d1 = smath.to_world(wi_local, sp.shading_normal)
    o1 = ray_offset(sp.position, sp.geom_normal)
    alive = h.tri >= 0
    d1 = jnp.where(alive[:, None], d1, jnp.ones_like(d1))
    slo = jnp.min(scene.geo.positions, axis=0)
    shi = jnp.max(scene.geo.positions, axis=0)
    key = raysort.ray_key(o1, d1, jnp.where(alive, T_MAX, 0.0), slo, shi)
    order = jnp.argsort(key)
    o1s, d1s = o1[order], d1[order]
    outs = {}
    for m in ("c48", "c48w"):
        dt, out = timed(closest(m), o1s, d1s)
        outs[m] = np.asarray(out[:, :2])
        print(f"secondary {m:5s}: {dt*1e3:7.1f} ms ({n/dt/1e6:5.1f} Mr/s)")
    same = (outs["c48"] == outs["c48w"]).mean()
    print(f"  bit-identical fraction: {same:.6f}")

    # occluded wave toward a fixed point (shadow-like)
    target = (slo + shi) * 0.5 + jnp.asarray([0.0, 0.45, 0.0]) * (shi - slo)
    to_l = target[None, :] - o1
    dist = smath.length(to_l)
    wi = to_l / jnp.maximum(dist, 1e-20)[:, None]
    tmax = jnp.where(alive, dist, 0.0)
    outs = {}
    for m in ("c48", "c48w"):
        dt, out = timed(occluded(m), o1, wi, tmax)
        outs[m] = np.asarray(out[:, 0])
        print(f"occluded  {m:5s}: {dt*1e3:7.1f} ms ({n/dt/1e6:5.1f} Mr/s)")
    same = (outs["c48"] == outs["c48w"]).mean()
    print(f"  bit-identical fraction: {same:.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
