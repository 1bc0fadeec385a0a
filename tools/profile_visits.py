"""Per-block visit statistics for the Pallas closest kernel: how many
candidate iterations run and how many survive the per-ray AABB pretest
(matmul visits), for a coherent primary wave vs a sorted secondary wave.
Decides whether the kernel is bound by per-iteration overhead or by the
[K,B] visit work.

Usage: python tools/profile_visits.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def main():
    width, height = 1920, 1080

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.intersect import T_MAX

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    geo = scene.geo
    fat = scene.fat_bvh
    nc_eff = spallas._effective_chunks(fat.leaf_size)
    print(f"L={fat.num_leaves} leaves of K={fat.leaf_size}")

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    @jax.jit
    def run_raw(o, d):
        tm = jnp.full((n,), T_MAX, jnp.float32)
        rays, geom, cand, centry, ncand, _ = spallas._prepare(
            fat, o, d, 1e-4, tm, 2048
        )
        out = spallas._run_blocks(
            rays, geom, cand, centry, ncand,
            spallas.pack_leaf_aabbs(fat, nc_eff), scene.leaf_feat_packed,
            block=2048, mode=spallas.MT_MODE, subs=16, chunks=nc_eff,
        )
        return out, ncand

    def report(name, o, d):
        out, ncand = run_raw(o, d)
        iters = np.asarray(out[:, 2, 0])
        execs = np.asarray(out[:, 3, 0])
        nc = np.asarray(ncand).reshape(-1)
        print(
            f"{name}: cand/block mean {nc.mean():6.1f} p95 "
            f"{np.percentile(nc, 95):6.0f}   iters mean {iters.mean():6.1f} "
            f"p95 {np.percentile(iters, 95):6.0f}   execs mean "
            f"{execs.mean():6.1f} p95 {np.percentile(execs, 95):6.0f} "
            f"max {execs.max():5.0f}"
        )

    report("primary          ", o0, d0)

    # sorted secondary
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat, scene.leaf_feat_packed, o, d, block=2048
        )
    )(o0, d0)
    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.ops.intersect import ray_offset
    from stratum_tpu.ops.bvh import morton3

    sp = make_shading_point(geo, h.tri, h.bary, d0)
    st = srng.rng_init(px, py, 7)
    uu, _ = srng.next_floats(st, 2)
    wi_local = smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1])
    d1 = smath.to_world(wi_local, sp.shading_normal)
    o1 = ray_offset(sp.position, sp.geom_normal)
    alive = h.tri >= 0
    d1 = jnp.where(alive[:, None], d1, jnp.ones_like(d1))
    lo = jnp.min(geo.positions, axis=0)
    hi = jnp.max(geo.positions, axis=0)
    q = (o1 - lo) / jnp.maximum(hi - lo, 1e-9)
    octant = (
        (d1[..., 0] > 0).astype(jnp.uint32)
        | ((d1[..., 1] > 0).astype(jnp.uint32) << 1)
        | ((d1[..., 2] > 0).astype(jnp.uint32) << 2)
    )
    key = (octant << jnp.uint32(29)) | (morton3(q) >> jnp.uint32(3))
    key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    report("secondary sorted ", o1[order], d1[order])
    report("secondary unsorted", o1, d1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
