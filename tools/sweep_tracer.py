"""Sweep fat-BVH leaf size K and ray-block size B for the Pallas tracer on
coherent (primary) and incoherent (secondary) waves. Drives the perf work on
the secondary-bounce bottleneck (STATUS.md perf next steps #1).

Usage: python tools/sweep_tracer.py [--width=1920] [--height=1080]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")


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

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops import pallas_trace as spallas

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    geo = scene.geo
    print(f"atrium {geo.num_triangles} tris, {n} rays")

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    # secondary rays: diffuse bounce off primary hits, sorted by
    # (octant, morton) like the integrator does
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(
            scene.fat_bvh, scene.leaf_feat_packed, o, d, block=512
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
    o1s, d1s = o1[order], d1[order]

    pos_np = np.asarray(geo.positions)
    idx_np = np.asarray(geo.indices)
    valid_np = np.asarray(geo.tri_material >= 0)

    for leaf_k in (64, 128, 256):
        fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid_np, leaf_size=leaf_k)
        if fat is None:
            print(f"K={leaf_k}: native builder unavailable")
            continue
        packed = spallas.pack_leaf_features(fat)
        packed = jax.device_put(packed)
        print(f"K={leaf_k}: L={fat.num_leaves} leaves, slab "
              f"{packed.shape[1]}x{packed.shape[2]} "
              f"({packed.nbytes/1e6:.0f} MB total)")
        for block in (256, 512):
            f = jax.jit(
                lambda o, d, fat=fat, packed=packed, block=block:
                spallas.pallas_closest(fat, packed, o, d, block=block).t.sum()
            )
            dt_p = timed(f, o0, d0)
            dt_s = timed(f, o1s, d1s)
            print(
                f"  B={block}: primary {dt_p*1e3:7.1f} ms ({n/dt_p/1e6:5.1f} Mr/s)"
                f"   secondary(sorted) {dt_s*1e3:7.1f} ms ({n/dt_s/1e6:5.1f} Mr/s)"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
