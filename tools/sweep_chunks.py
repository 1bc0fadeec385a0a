"""A/B the intra-leaf chunk gating: primary + sorted-secondary closest
waves and a deferred-style shadow wave, for chunks x subs x block combos.
Each config repacks the slab (chunk-major layout differs per chunk count).

Usage: python tools/sweep_chunks.py [--block=2048] [--quick]
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
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    width, height = 1920, 1080
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    fat = scene.fat_bvh
    print(f"L={fat.num_leaves} leaves of K={fat.leaf_size}, {n} rays")

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    # secondary rays: diffuse bounce off primary hits (same recipe as
    # profile_e2e), sorted by octant+morton
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat, scene.leaf_feat_packed, o, d, block=512
        )
    )(o0, d0)
    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.ops.intersect import ray_offset
    from stratum_tpu.ops.bvh import morton3

    sp = make_shading_point(scene.geo, h.tri, h.bary, d0)
    st = srng.rng_init(px, py, 7)
    uu, _ = srng.next_floats(st, 2)
    wi_local = smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1])
    d1 = smath.to_world(wi_local, sp.shading_normal)
    o1 = ray_offset(sp.position, sp.geom_normal)
    alive = h.tri >= 0
    d1 = jnp.where(alive[:, None], d1, jnp.ones_like(d1))
    lo = jnp.min(scene.geo.positions, axis=0)
    hi = jnp.max(scene.geo.positions, axis=0)
    q = (o1 - lo) / jnp.maximum(hi - lo, 1e-9)
    octant = (
        (d1[..., 0] > 0).astype(jnp.uint32)
        | ((d1[..., 1] > 0).astype(jnp.uint32) << 1)
        | ((d1[..., 2] > 0).astype(jnp.uint32) << 2)
    )
    key = (octant << jnp.uint32(29)) | (morton3(q) >> jnp.uint32(3))
    key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    o1s, d1s = jax.block_until_ready(o1[order]), d1[order]

    # shadow rays toward scene center (profile_e2e recipe)
    center = (lo + hi) * 0.5
    dvec = center - o1
    dist = jnp.linalg.norm(dvec, axis=-1)
    dsh = dvec / jnp.maximum(dist[:, None], 1e-9)
    tsh = jnp.where(alive, dist, 0.0)

    packs = {}

    def feat_for(chunks):
        if chunks not in packs:
            packs[chunks] = jax.block_until_ready(
                spallas.pack_leaf_features(fat, chunks=chunks)
            )
        return packs[chunks]

    quick = opts.has("quick")
    blocks = [opts.get_int("block", 2048)] if opts.has("block") else [512, 2048]
    chunk_opts = [1, 8] if quick else [1, 2, 4, 8]
    for block in blocks:
        for chunks in chunk_opts:
            subs_opts = [max(1, block // 128)] if quick else sorted(
                {1, 4, block // 128, 2 * block // 128}
            )
            for subs in subs_opts:
                if subs < 1 or block % subs:
                    continue
                feat = feat_for(chunks)

                def cl(o, d):
                    return spallas.pallas_closest(
                        fat, feat, o, d, block=block, subs=subs,
                        chunks=chunks,
                    ).t.sum()

                def oc(o, d, t):
                    return spallas.pallas_occluded(
                        fat, feat, o, d, t, block=block, subs=subs,
                        chunks=chunks,
                    ).sum()

                clj = jax.jit(cl)
                ocj = jax.jit(oc)
                tp = timed(clj, o0, d0)
                ts = timed(clj, o1s, d1s)
                tsh_t = timed(ocj, o1, dsh, tsh)
                print(
                    f"block={block:4d} chunks={chunks} subs={subs:2d}: "
                    f"primary {tp*1e3:6.1f} ms ({n/tp/1e6:5.1f} Mr/s)  "
                    f"secondary-sorted {ts*1e3:6.1f} ms ({n/ts/1e6:4.1f}) "
                    f"shadow {tsh_t*1e3:6.1f} ms ({n/tsh_t/1e6:5.1f})",
                    flush=True,
                )


if __name__ == "__main__":
    main()
