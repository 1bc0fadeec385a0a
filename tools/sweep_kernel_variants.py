"""Sweep Pallas-kernel MT matmul modes (fast bf16 / x3 emulation / f32) and
block sizes on primary/secondary atrium waves, with hit parity vs the f32
path. Run on an otherwise idle box — concurrent CPU load corrupts timings.

Usage: python tools/sweep_kernel_variants.py
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

    spallas.MT_MODE = "f32"
    base_f = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat, scene.leaf_feat_packed, o, d, block=512
        )
    )
    h = base_f(o0, d0)

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

    ref = {}
    for name, mode, block, subs in (
        ("f32 s1 b512", "f32", 512, 1),
        ("x3 s1 b512", "x3", 512, 1),
        ("x3 s2 b512", "x3", 512, 2),
        ("x3 s4 b512", "x3", 512, 4),
        ("x3 s8 b1024", "x3", 1024, 8),
        ("x3 s16 b2048", "x3", 2048, 16),
    ):
        spallas.MT_MODE = mode
        f = jax.jit(
            lambda o, d, _tag=name: spallas.pallas_closest(
                fat, scene.leaf_feat_packed, o, d, block=block, subs=subs
            )
        )
        dt_p, hp = timed(f, o0, d0)
        dt_s, hs = timed(f, o1s, d1s)
        print(f"{name:12s}: primary {dt_p*1e3:7.1f} ms ({n/dt_p/1e6:5.1f} Mr/s)"
              f"   secondary {dt_s*1e3:7.1f} ms ({n/dt_s/1e6:5.1f} Mr/s)")
        if name == "f32 s1 b512":
            ref = {"p": hp, "s": hs}
        else:
            for lbl, a, b in (("p", ref["p"], hp), ("s", ref["s"], hs)):
                mm = float(jnp.mean((a.tri != b.tri).astype(jnp.float32)))
                both = (a.tri >= 0) & (b.tri >= 0)
                t_rel = jnp.where(
                    both, jnp.abs(a.t - b.t) / jnp.maximum(a.t, 1e-6), 0.0
                )
                print(f"   parity {lbl}: tri mismatch {mm*100:.4f}%  "
                      f"max t rel-err {float(jnp.max(t_rel)):.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
