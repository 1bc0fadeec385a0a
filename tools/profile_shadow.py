"""Profile the deferred shadow wave: build realistic NEE shadow rays
(primary+secondary hit points toward presampled light-tile entries, env
lanes get long rays) and measure the any-hit kernel + iteration stats and
the effect of sorting / env share.

Usage: python tools/profile_shadow.py
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
    import numpy as np

    from stratum_tpu.render import camera
    from stratum_tpu.render import lights as slights
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.intersect import T_MAX, ray_offset
    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.ops import raysort

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    geo = scene.geo
    fat = scene.fat_bvh
    nc_eff = spallas._effective_chunks(fat.leaf_size)

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat, scene.leaf_feat_packed, o, d, block=2048
        )
    )(o0, d0)
    sp = make_shading_point(geo, h.tri, h.bary, d0)

    # presampled tile like the integrator
    t_tile = 4096
    st_tile = srng.rng_init(
        jnp.arange(t_tile, dtype=jnp.uint32), np.uint32(0x1EA51E57), 0
    )
    ut, _ = srng.next_floats(st_tile, 3)
    tl = slights.sample_light(scene, ut[..., 0], ut[..., 1], ut[..., 2])
    frac_env = float(jnp.mean(tl.is_env.astype(jnp.float32)))
    print(f"presampled tile: {t_tile} entries, env fraction {frac_env:.2f}")

    st = srng.rng_init(px, py, 11)
    uu, _ = srng.next_floats(st, 1)
    idx = jnp.minimum((uu[..., 0] * t_tile).astype(jnp.int32), t_tile - 1)
    l_pos = tl.position[idx]
    l_env = tl.is_env[idx]
    origin = ray_offset(sp.position, sp.geom_normal)
    to_l = jnp.where(l_env[:, None], l_pos, l_pos - origin)
    dist = jnp.where(l_env, T_MAX * 0.5, smath.length(to_l))
    wi = jnp.where(
        l_env[:, None], l_pos, to_l / jnp.maximum(dist, 1e-20)[:, None]
    )
    alive = h.tri >= 0
    dist = jnp.where(alive, dist, 0.0)

    def stats(name, o, d, t):
        @jax.jit
        def run(o, d, t):
            limit = t * np.float32(1.0 - 1e-3)
            rays, geom, cand, centry, ncand, _ = spallas._prepare(
                fat, o, d, 1e-4, limit, 2048
            )
            out = spallas._run_blocks(
                rays, geom, cand, centry, ncand,
                spallas.pack_leaf_aabbs(fat, nc_eff), scene.leaf_feat_packed,
                block=2048, kernel_name="occluded",
                mode=spallas.MT_MODE, subs=16, chunks=nc_eff,
            )
            return out, ncand

        dt, (out, ncand) = timed(run, o, d, t)
        iters = np.asarray(out[:, 2, 0])
        nc = np.asarray(ncand).reshape(-1)
        print(f"{name}: {dt*1e3:7.1f} ms ({n/dt/1e6:5.1f} Mr/s)  "
              f"cand/blk mean {nc.mean():6.1f}  iters mean {iters.mean():6.1f} "
              f"p95 {np.percentile(iters,95):5.0f}")

    stats("shadow unsorted      ", origin, wi, dist)
    lo = jnp.min(geo.positions, axis=0)
    hi = jnp.max(geo.positions, axis=0)
    key = raysort.ray_key(origin, wi, dist, lo, hi)
    order = jnp.argsort(key)
    stats("shadow sorted (5bit) ", origin[order], wi[order], dist[order])

    # block-coherent tile groups (integrator cfg.coherent_tiles): sort the
    # tile by direction/position morton, then every 2048-lane block draws
    # from ONE shared group of C consecutive rows
    from stratum_tpu.ops.bvh import morton3

    q_area = (tl.position - lo) / jnp.maximum(hi - lo, 1e-9)
    q_env = tl.position * 0.5 + 0.5
    qq = jnp.where(tl.is_env[:, None], q_env, q_area)
    tkey = morton3(jnp.clip(qq, 0.0, 1.0)) | (
        tl.is_env.astype(jnp.uint32) << jnp.uint32(31)
    )
    torder = jnp.argsort(tkey)
    pos_s, env_s = tl.position[torder], tl.is_env[torder]
    blk = jnp.arange(n, dtype=jnp.uint32) // np.uint32(2048)
    gbits = srng.pcg4d(
        jnp.stack(
            [blk, jnp.zeros_like(blk), jnp.zeros_like(blk),
             jnp.full_like(blk, 0x1D1E5)], axis=-1
        )
    )[..., 0]
    u_grp = srng._bits_to_float(gbits)
    for c_sz in (8, 16, 64):
        n_groups = t_tile // c_sz
        base = jnp.minimum(
            (u_grp * n_groups).astype(jnp.int32), n_groups - 1
        ) * c_sz
        idx2 = base + jnp.minimum(
            (uu[..., 0] * c_sz).astype(jnp.int32), c_sz - 1
        )
        l_pos2, l_env2 = pos_s[idx2], env_s[idx2]
        to_l2 = jnp.where(l_env2[:, None], l_pos2, l_pos2 - origin)
        dist2 = jnp.where(l_env2, T_MAX * 0.5, smath.length(to_l2))
        wi2 = jnp.where(
            l_env2[:, None], l_pos2,
            to_l2 / jnp.maximum(dist2, 1e-20)[:, None],
        )
        dist2 = jnp.where(alive, dist2, 0.0)
        stats(f"coherent C={c_sz:<4d}      ", origin, wi2, dist2)

    # split: area-light rays only vs env rays only
    area = alive & ~l_env
    env = alive & l_env
    stats("area-only            ", origin, wi, jnp.where(area, dist, 0.0))
    stats("env-only             ", origin, wi, jnp.where(env, dist, 0.0))

    # prep-only cost (entries pass + argsort + packing) and the
    # hierarchical-prep variants on the coherent C=16 wave
    @jax.jit
    def prep_only(o, d, t, eg=1):
        limit = t * np.float32(1.0 - 1e-3)
        rays, geom, cand, centry, ncand, _ = spallas._prepare(
            fat, o, d, 1e-4, limit, 2048, eg
        )
        return cand.sum() + ncand.sum() + rays.sum()

    n_groups = t_tile // 16
    base = jnp.minimum(
        (u_grp * n_groups).astype(jnp.int32), n_groups - 1
    ) * 16
    idx2 = base + jnp.minimum((uu[..., 0] * 16).astype(jnp.int32), 15)
    l_pos2, l_env2 = pos_s[idx2], env_s[idx2]
    to_l2 = jnp.where(l_env2[:, None], l_pos2, l_pos2 - origin)
    dist2 = jnp.where(l_env2, T_MAX * 0.5, smath.length(to_l2))
    wi2 = jnp.where(
        l_env2[:, None], l_pos2, to_l2 / jnp.maximum(dist2, 1e-20)[:, None]
    )
    dist2 = jnp.where(alive, dist2, 0.0)
    dt, _ = timed(prep_only, origin, wi2, dist2)
    print(f"prep only (C=16 wave): {dt*1e3:7.1f} ms")

    def stats_eg(name, o, d, t, eg):
        @jax.jit
        def run(o, d, t):
            return spallas.pallas_occluded(
                fat, scene.leaf_feat_packed, o, d, t, block=2048,
                entry_group=eg,
            ).sum()

        dt, _ = timed(run, o, d, t)
        print(f"{name}: {dt*1e3:7.1f} ms ({n/dt/1e6:5.1f} Mr/s)")

    for eg in (1, 8, 16):
        stats_eg(f"coherent C=16 eg={eg:<3d}  ", origin, wi2, dist2, eg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
