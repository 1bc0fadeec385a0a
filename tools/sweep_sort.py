"""Measure (a) the raw cost of sorting a 2M-ray wave (argsort + gathers +
result scatter-back), (b) how direction-bit count in the sort key changes
secondary-wave traversal time. Decides the trace-local sort design.

Usage: python tools/sweep_sort.py
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
    return (time.time() - t0) / reps, out


def main():
    width, height = 1920, 1080

    import jax
    import jax.numpy as jnp

    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.bvh import morton3

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

    closest = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat, scene.leaf_feat_packed, o, d, block=512
        )
    )
    h = closest(o0, d0)

    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.ops.intersect import ray_offset

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

    # --- raw sort machinery cost -------------------------------------------
    @jax.jit
    def sort_cost(o, d, t, amask):
        q = (o - lo) / jnp.maximum(hi - lo, 1e-9)
        octant = (
            (d[..., 0] > 0).astype(jnp.uint32)
            | ((d[..., 1] > 0).astype(jnp.uint32) << 1)
            | ((d[..., 2] > 0).astype(jnp.uint32) << 2)
        )
        key = (octant << jnp.uint32(29)) | (morton3(q) >> jnp.uint32(3))
        key = jnp.where(amask, key, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(key)
        os_, ds_, ts_ = o[order], d[order], t[order]
        # fake per-ray results to scatter back (t, tri, bary)
        res_t = ts_ * 2.0
        res_tri = order.astype(jnp.int32)
        res_uv = ds_[:, :2]
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(n, dtype=order.dtype)
        )
        return res_t[inv], res_tri[inv], res_uv[inv]

    tmax = jnp.full((n,), 1e30, jnp.float32)
    dt, _ = timed(sort_cost, o1, d1, tmax, alive)
    print(f"sort machinery (key+argsort+3 gathers+3 scatter-backs): {dt*1e3:7.1f} ms")

    @jax.jit
    def argsort_only(d, amask):
        octant = (
            (d[..., 0] > 0).astype(jnp.uint32)
            | ((d[..., 1] > 0).astype(jnp.uint32) << 1)
        )
        key = jnp.where(amask, octant, jnp.uint32(0xFFFFFFFF))
        return jnp.argsort(key)

    dt, _ = timed(argsort_only, d1, alive)
    print(f"argsort 2M u32 alone: {dt*1e3:7.1f} ms")

    # --- direction bits in the key vs traversal time ------------------------
    def make_order(dir_bits):
        @jax.jit
        def f(o, d, amask):
            q = (o - lo) / jnp.maximum(hi - lo, 1e-9)
            m = morton3(q)
            if dir_bits == 0:
                key = m
            else:
                # direction bucket: face (3b = octant) + quantized u,v on
                # the dominant-axis cube face
                octant = (
                    (d[..., 0] > 0).astype(jnp.uint32)
                    | ((d[..., 1] > 0).astype(jnp.uint32) << 1)
                    | ((d[..., 2] > 0).astype(jnp.uint32) << 2)
                )
                extra = dir_bits - 3
                if extra > 0:
                    half = extra // 2
                    ax = jnp.abs(d)
                    dom = jnp.argmax(ax, axis=-1)
                    denom = jnp.maximum(jnp.max(ax, axis=-1), 1e-9)
                    u1 = jnp.take_along_axis(
                        d, ((dom + 1) % 3)[:, None], axis=-1
                    )[:, 0] / denom
                    v1 = jnp.take_along_axis(
                        d, ((dom + 2) % 3)[:, None], axis=-1
                    )[:, 0] / denom
                    qb = lambda x, b: jnp.clip(
                        ((x * 0.5 + 0.5) * (1 << b)).astype(jnp.uint32),
                        0, (1 << b) - 1,
                    )
                    dbits = (
                        (octant << jnp.uint32(extra))
                        | (qb(u1, extra - half) << jnp.uint32(half))
                        | qb(v1, half)
                    )
                else:
                    dbits = octant
                key = (dbits << jnp.uint32(29 - (dir_bits - 3))) | (
                    m >> jnp.uint32(3 + (dir_bits - 3))
                )
            key = jnp.where(amask, key, jnp.uint32(0xFFFFFFFF))
            return jnp.argsort(key)

        return f

    for bits in (0, 3, 5, 7, 9):
        order = make_order(bits)(o1, d1, alive)
        o1s, d1s = o1[order], d1[order]
        dt, _ = timed(closest, o1s, d1s)
        print(f"secondary closest, dir_bits={bits}: {dt*1e3:7.1f} ms "
              f"({n/dt/1e6:5.1f} Mr/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
