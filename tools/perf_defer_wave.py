"""Measure the REAL deferred NEE wave shape: 5 bounces x 2.07M lanes of
coherent-tile shadow rays (C=16 groups), with the atrium's measured alive
schedule (1, 1, .6, .082, .031) zeroing dead lanes, through the public
pallas_occluded at the CURRENT defaults (gs=4, K=256). Splits the cost
into prep (order/entries/ncand only) vs full wave, and compares gs=1.

python tools/perf_defer_wave.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

ALIVE = (1.0, 1.0, 0.6, 0.082, 0.031)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.core import math as smath
    from stratum_tpu.core import rng as srng
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.bvh import morton3
    from stratum_tpu.ops.intersect import T_MAX, ray_offset
    from stratum_tpu.render import camera
    from stratum_tpu.render import lights as slights
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.scene import builtin, flatten

    width, height = 1920, 1080
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    geo = scene.geo
    fat = scene.fat_bvh
    feat = scene.leaf_feat_packed

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(fat, feat, o, d, block=2048)
    )(o0, d0)
    hitrec = spallas.finalize_hit(scene.slot_payload, o0, d0, h)
    sp = make_shading_point(geo, hitrec.tri, hitrec.bary, d0)
    origin = ray_offset(sp.position, sp.geom_normal)
    alive0 = hitrec.tri >= 0

    # coherent C=16 targets like the integrator's presample tile
    t_tile = 4096
    st_tile = srng.rng_init(
        jnp.arange(t_tile, dtype=jnp.uint32), np.uint32(0x1EA51E57), 0
    )
    ut, _ = srng.next_floats(st_tile, 3)
    tl = slights.sample_light(scene, ut[..., 0], ut[..., 1], ut[..., 2])
    lo = jnp.min(geo.positions, axis=0)
    hi = jnp.max(geo.positions, axis=0)
    qq = jnp.where(
        tl.is_env[:, None], tl.position * 0.5 + 0.5,
        (tl.position - lo) / jnp.maximum(hi - lo, 1e-9),
    )
    tkey = morton3(jnp.clip(qq, 0.0, 1.0)) | (
        tl.is_env.astype(jnp.uint32) << jnp.uint32(31)
    )
    torder = jnp.argsort(tkey)
    pos_s, env_s = tl.position[torder], tl.is_env[torder]

    blk = jnp.arange(n, dtype=jnp.uint32) // np.uint32(2048)
    parts_o, parts_w, parts_t = [], [], []
    for b, frac in enumerate(ALIVE):
        gbits = srng.pcg4d(
            jnp.stack(
                [blk, jnp.full_like(blk, b), jnp.zeros_like(blk),
                 jnp.full_like(blk, 0x1D1E5)], axis=-1
            )
        )[..., 0]
        u_grp = srng._bits_to_float(gbits)
        st = srng.rng_init(px, py, 11 + b)
        uu, _ = srng.next_floats(st, 2)
        n_groups = t_tile // 16
        base = jnp.minimum(
            (u_grp * n_groups).astype(jnp.int32), n_groups - 1
        ) * 16
        idx = base + jnp.minimum((uu[..., 0] * 16).astype(jnp.int32), 15)
        l_pos, l_env = pos_s[idx], env_s[idx]
        to_l = jnp.where(l_env[:, None], l_pos, l_pos - origin)
        dist = jnp.where(l_env, T_MAX * 0.5, smath.length(to_l))
        wi = jnp.where(
            l_env[:, None], l_pos, to_l / jnp.maximum(dist, 1e-20)[:, None]
        )
        alive = alive0 & (uu[..., 1] < frac)
        parts_o.append(origin)
        parts_w.append(wi)
        parts_t.append(jnp.where(alive, dist, 0.0))
    o_f = jnp.concatenate(parts_o)
    w_f = jnp.concatenate(parts_w)
    t_f = jnp.concatenate(parts_t)
    nf = o_f.shape[0]
    print(f"deferred wave: {nf/1e6:.1f}M rays, "
          f"alive {float(jnp.mean((t_f > 0).astype(jnp.float32))):.2f}")

    def timed(fn, *args, reps=3):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    for gs in (4, 1):
        occ = jax.jit(
            lambda o, d, t, gs=gs: spallas.pallas_occluded(
                fat, feat, o, d, t, block=2048, gs=gs
            ).sum()
        )
        dt = timed(occ, o_f, w_f, t_f)
        print(f"gs={gs}: full deferred wave {dt*1e3:7.1f} ms "
              f"({nf/dt/1e6:5.1f} Mr/s)", flush=True)
        prep = jax.jit(
            lambda o, d, t, gs=gs: spallas._prepare(
                fat, o, d, 1e-4, t * np.float32(1 - 1e-3), 2048,
                gs if gs > 1 else None, expand=False,
            )[2:5]
        )
        dtp = timed(prep, o_f, w_f, t_f)
        print(f"gs={gs}: prep (no pack)      {dtp*1e3:7.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
