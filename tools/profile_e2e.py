"""Where does the atrium end-to-end time go? Times bounce-depth sweeps and
isolated waves (primary closest, incoherent secondary closest, shadow) so
perf work targets the real hot spot. Not part of the test suite.

Usage: python tools/profile_e2e.py [--width=1920] [--height=1080]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def timed(fn, *args, reps=3, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)

    import jax
    import jax.numpy as jnp

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    print(f"atrium {scene.geo.num_triangles} tris, {width}x{height} = {n} rays")

    # --- bounce-depth sweep: marginal cost of each bounce ------------------
    base = dict(width=width, height=height, bsdf="disney", sort_rays=True,
                presample_lights=4096)
    prev = 0.0
    for mb in (0, 1, 2, 4):
        cfg = integrator.RenderConfig(max_bounces=mb, **base)
        dt = timed(
            lambda s: integrator.render_path(scene, view, cfg, s), 1, reps=2
        )
        print(f"max_bounces={mb}: {dt*1e3:8.1f} ms  (marginal {((dt-prev))*1e3:7.1f} ms)")
        prev = dt

    # --- no-sort variant ----------------------------------------------------
    cfg = integrator.RenderConfig(max_bounces=4, width=width, height=height,
                                  bsdf="disney", sort_rays=False,
                                  presample_lights=4096)
    dt = timed(lambda s: integrator.render_path(scene, view, cfg, s), 1, reps=2)
    print(f"max_bounces=4 sort_rays=False: {dt*1e3:8.1f} ms")

    # --- isolated waves -----------------------------------------------------
    from stratum_tpu.ops import pallas_trace as spallas

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    @jax.jit
    def closest(o, d):
        h = spallas.pallas_closest(
            scene.fat_bvh, scene.leaf_feat_packed, o, d, block=512
        )
        return h.t, h.tri, h.bary

    dt = timed(closest, o0, d0)
    print(f"primary closest wave: {dt*1e3:8.1f} ms ({n/dt/1e6:.1f} Mrays/s)")

    # prep alone (entries + argsort + packing)
    @jax.jit
    def prep(o, d):
        tm = jnp.full((n,), 3.0e38 * 0 + 1e30, jnp.float32)
        rays, geom, cand, centry, ncand, _ = spallas._prepare(
            scene.fat_bvh, o, d, 1e-4, tm, 512
        )
        return rays.sum(), geom.sum(), cand.sum(), centry.sum(), ncand.sum()

    dt = timed(prep, o0, d0)
    print(f"prep alone (primary): {dt*1e3:8.1f} ms")

    # realistic secondary rays: bounce the primaries off their hits with a
    # deterministic pseudo-random diffuse direction
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(
            scene.fat_bvh, scene.leaf_feat_packed, o, d, block=512
        )
    )(o0, d0)
    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath
    from stratum_tpu.render.shading import make_shading_point

    sp = make_shading_point(scene.geo, h.tri, h.bary, d0)
    st = srng.rng_init(px, py, 7)
    uu, _ = srng.next_floats(st, 2)
    wi_local = smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1])
    d1 = smath.to_world(wi_local, sp.shading_normal)
    from stratum_tpu.ops.intersect import ray_offset

    o1 = ray_offset(sp.position, sp.geom_normal)
    alive = h.tri >= 0
    d1 = jnp.where(alive[:, None], d1, jnp.ones_like(d1))

    dt = timed(closest, o1, d1)
    print(f"secondary closest (unsorted): {dt*1e3:8.1f} ms ({n/dt/1e6:.1f} Mrays/s)")

    # sorted secondary
    from stratum_tpu.ops.bvh import morton3

    lo = jnp.min(scene.geo.positions, axis=0)
    hi = jnp.max(scene.geo.positions, axis=0)

    @jax.jit
    def sortkeys(o, d, alive):
        q = (o - lo) / jnp.maximum(hi - lo, 1e-9)
        octant = (
            (d[..., 0] > 0).astype(jnp.uint32)
            | ((d[..., 1] > 0).astype(jnp.uint32) << 1)
            | ((d[..., 2] > 0).astype(jnp.uint32) << 2)
        )
        key = (octant << jnp.uint32(29)) | (morton3(q) >> jnp.uint32(3))
        key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
        return jnp.argsort(key)

    order = sortkeys(o1, d1, alive)
    o1s, d1s = o1[order], d1[order]
    dt = timed(closest, o1s, d1s)
    print(f"secondary closest (octant+morton sorted): {dt*1e3:8.1f} ms ({n/dt/1e6:.1f} Mrays/s)")

    # shadow wave toward a fixed light region
    target = (lo + hi) * 0.5 + jnp.asarray([0.0, 0.0, 0.0])
    tv = target[None, :] - o1
    dist = jnp.sqrt(jnp.sum(tv * tv, axis=-1))
    wsh = tv / jnp.maximum(dist, 1e-9)[:, None]

    @jax.jit
    def occl(o, d, t):
        return spallas.pallas_occluded(
            scene.fat_bvh, scene.leaf_feat_packed, o, d, t, block=512
        )

    dt = timed(occl, o1, wsh, dist)
    print(f"shadow wave (to scene center): {dt*1e3:8.1f} ms ({n/dt/1e6:.1f} Mrays/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
