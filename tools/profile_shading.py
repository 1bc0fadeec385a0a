"""Dissect the per-bounce non-trace overhead (the null-tracer 257 ms base,
tools/profile_overhead.py): time each stage in isolation at 2M lanes.

Usage: python tools/profile_shading.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def timed(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    width, height = 1920, 1080

    import jax
    import jax.numpy as jnp

    from stratum_tpu.render import camera
    from stratum_tpu.render.shading import load_material, make_shading_point
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    geo = scene.geo

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)
    tri = (jnp.arange(n, dtype=jnp.int32) % geo.num_triangles)
    bary = jnp.full((n, 2), 0.3, jnp.float32)

    @jax.jit
    def f_shadept(tri, bary, d):
        sp = make_shading_point(geo, tri, bary, d)
        return sp.position.sum() + sp.shading_normal.sum() + sp.uv.sum()

    print(f"make_shading_point: {timed(f_shadept, tri, bary, d0)*1e3:7.1f} ms")

    @jax.jit
    def f_mat(tri, bary, d):
        sp = make_shading_point(geo, tri, bary, d)
        mat = load_material(scene.materials, sp.material)
        return mat.base_color.sum() + mat.roughness.sum()

    print(f"  + load_material:  {timed(f_mat, tri, bary, d0)*1e3:7.1f} ms")

    from stratum_tpu.render import disney

    @jax.jit
    def f_disney(tri, bary, d):
        sp = make_shading_point(geo, tri, bary, d)
        mat = load_material(scene.materials, sp.material)
        wo = smath.to_local(-d, sp.shading_normal)
        st = srng.rng_init(px, py, 3)
        uu, _ = srng.next_floats(st, 3)
        bs = disney.disney_sample(mat, wo, uu)
        ev = disney.disney_eval(mat, wo, bs.wi)
        return bs.f.sum() + ev.f.sum()

    print(f"  + disney smp+evl: {timed(f_disney, tri, bary, d0)*1e3:7.1f} ms")

    @jax.jit
    def f_rng():
        st = srng.rng_init(px, py, 3)
        total = jnp.zeros((n,), jnp.float32)
        for _ in range(4):
            uu, st = srng.next_floats(st, 3)
            total = total + uu.sum(-1)
        return total.sum()

    print(f"rng 4x3 floats:     {timed(f_rng)*1e3:7.1f} ms")

    from stratum_tpu.render import lights as slights

    @jax.jit
    def f_light(tri, bary, d):
        st = srng.rng_init(px, py, 5)
        uu, _ = srng.next_floats(st, 3)
        ls = slights.sample_light(scene, uu[..., 0], uu[..., 1], uu[..., 2])
        return ls.position.sum() + ls.radiance.sum() + ls.pdf_area.sum()

    print(f"sample_light (CDF): {timed(f_light, tri, bary, d0)*1e3:7.1f} ms")

    @jax.jit
    def f_env(d):
        return (
            slights.eval_environment(scene, d).sum()
            + slights.env_pdf_w_mis(scene, d).sum()
        )

    print(f"env eval + pdf:     {timed(f_env, d0)*1e3:7.1f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
