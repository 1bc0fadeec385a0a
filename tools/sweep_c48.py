"""Measure MT_MODE "c48" (one C=48 bf16-banded pass) vs "x3" (three bf16
split passes) in the Pallas tracer: time + hit parity on atrium primary and
sorted-secondary waves, plus the occlusion kernel.

Usage: python tools/sweep_c48.py [block] [subs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    return (time.time() - t0) / reps, out


def main():
    width, height = 1920, 1080
    block = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    subs = int(sys.argv[2]) if len(sys.argv) > 2 else None

    import jax
    import jax.numpy as jnp

    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import pallas_trace as spallas

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    geo = scene.geo
    fat = scene.fat_bvh

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    packs = {
        m: jax.block_until_ready(spallas.pack_leaf_features(fat, m))
        for m in ("x3", "c48")
    }

    save = spallas.MT_MODE
    spallas.MT_MODE = "x3"
    try:
        h = jax.jit(
            lambda o, d: spallas.pallas_closest(
                fat, packs["x3"], o, d, block=512
            )
        )(o0, d0)
    finally:
        spallas.MT_MODE = save
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
    # occlusion wave: shadow rays toward a fixed point light
    lpos = (lo + hi) * 0.5 + jnp.asarray([0.0, 0.0, 0.0])
    to_l = lpos[None, :] - o1
    dist = jnp.sqrt(jnp.sum(to_l * to_l, axis=-1))
    wo = to_l / jnp.maximum(dist, 1e-9)[:, None]
    dist = jnp.where(alive, dist, 0.0)

    results = {}
    for m in ("x3", "c48"):
        save = spallas.MT_MODE
        spallas.MT_MODE = m
        try:
            f = jax.jit(
                lambda o, d, _m=m: spallas.pallas_closest(
                    fat, packs[_m], o, d, block=block, subs=subs
                )
            )
            focc = jax.jit(
                lambda o, d, t, _m=m: spallas.pallas_occluded(
                    fat, packs[_m], o, d, t, block=block, subs=subs
                )
            )
            dt_p, hp = timed(f, o0, d0)
            dt_s, hs = timed(f, o1s, d1s)
            dt_o, ho = timed(focc, o1, wo, dist)
            results[m] = (hp, hs, ho)
            print(
                f"{m:4s}: primary {dt_p*1e3:7.1f} ms ({n/dt_p/1e6:5.1f} Mr/s)"
                f"  secondary {dt_s*1e3:7.1f} ms ({n/dt_s/1e6:5.1f} Mr/s)"
                f"  occluded {dt_o*1e3:7.1f} ms ({n/dt_o/1e6:5.1f} Mr/s)"
            )
        finally:
            spallas.MT_MODE = save

    ap, as_, ao = results["x3"]
    bp, bs, bo = results["c48"]
    for label, a, b in (("primary", ap, bp), ("secondary", as_, bs)):
        tri_mismatch = float(jnp.mean((a.tri != b.tri).astype(jnp.float32)))
        both = (a.tri >= 0) & (b.tri >= 0)
        t_rel = jnp.where(
            both, jnp.abs(a.t - b.t) / jnp.maximum(a.t, 1e-6), 0.0
        )
        print(
            f"c48 vs x3 {label}: tri mismatch {tri_mismatch*100:.4f}%  "
            f"max t rel-err {float(jnp.max(t_rel)):.2e}"
        )
    occ_mismatch = float(jnp.mean((ao != bo).astype(jnp.float32)))
    print(f"c48 vs x3 occluded: mismatch {occ_mismatch*100:.4f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
